"""Pre-snapshot gate (r6 verdict #4): refuse a round snapshot unless a
FRESH, FULL-SURFACE sweep artifact exists.

Round 6 registered 9 new queries but never ran the committed full
sweep — SWEEP_r6.json did not exist until the judge's own run wrote
it. This gate makes that impossible to repeat silently: it exits
non-zero (with the exact command to run) unless SWEEP_r{N}.json

  1. exists,
  2. records zero failures,
  3. covers the ENTIRE registered query surface (n_queries equals
     len(registry.QUERIES) — a stale sweep from before the round's
     additions fails here), and
  4. is NEWER than every source file in the package and the entry
     module (a sweep that predates a code edit proves nothing).

Run it as the last step before the end-of-round commit:

    SPARK_GRAFT_ROUND=7 python scripts/snapshot_check.py
"""

from __future__ import annotations

import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "7")
    sweep_path = REPO / f"SWEEP_r{rnd}.json"
    cmd = f"SPARK_GRAFT_ROUND={rnd} python scripts/oracle_sweep.py /root/testdata/sf0.01"
    if not sweep_path.exists():
        print(f"GATE FAIL: {sweep_path.name} missing — run:\n  {cmd}")
        return 1

    import json

    doc = json.loads(sweep_path.read_text())
    if doc.get("failures"):
        print(f"GATE FAIL: {sweep_path.name} records failures: {doc['failures']}")
        return 1

    from alexandria_pipeline_spark import register_all
    from alexandria_pipeline_spark.registry import QUERIES

    register_all()
    registered = len(QUERIES)
    if doc.get("n_queries") != registered:
        print(
            f"GATE FAIL: {sweep_path.name} covers {doc.get('n_queries')} "
            f"queries but {registered} are registered — the sweep predates "
            f"this round's additions. Re-run:\n  {cmd}"
        )
        return 1

    sweep_mtime = sweep_path.stat().st_mtime
    newest: tuple[float, str] = (0.0, "")
    for src in [REPO / "__spark_entry__.py", *(REPO / "alexandria_pipeline_spark").rglob("*.py")]:
        m = src.stat().st_mtime
        if m > newest[0]:
            newest = (m, str(src.relative_to(REPO)))
    if newest[0] > sweep_mtime:
        print(
            f"GATE FAIL: {newest[1]} is newer than {sweep_path.name} — the "
            f"sweep predates a code edit. Re-run:\n  {cmd}"
        )
        return 1

    print(
        f"GATE OK: {sweep_path.name} is fresh, full-surface "
        f"({registered} queries), zero failures."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
