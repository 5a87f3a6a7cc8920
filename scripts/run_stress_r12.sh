#!/bin/bash
# Drives graph_stress_session.py one phase+sf per process (fresh JVM
# frees shuffle dirs between phases — the r12 disk lesson). Results
# merge into STRESS_r12.json. Usage: run_stress_r12.sh [phase ...]
set -u
cd "$(dirname "$0")/.."
phases=("$@")
[ ${#phases[@]} -eq 0 ] && phases=(a0 a:sf1 a:sf10 b:sf1 b:sf10 c:sf1 c:sf10)
export SPARK_GRAFT_EXTRA_CONF="spark.io.compression.codec=zstd"
for ph in "${phases[@]}"; do
  echo "=== phase $ph ==="
  python scripts/graph_stress_session.py "$ph" || echo "phase $ph FAILED ($?)"
  # Reap orphaned shuffle dirs of a CRASHED phase JVM — but never
  # while any other Spark JVM is alive (the r12 pytest run lost its
  # live shuffle dirs to an unguarded version of this line).
  pgrep -x java >/dev/null 2>&1 || rm -rf /tmp/blockmgr-* 2>/dev/null
  df -h / | tail -1
done
