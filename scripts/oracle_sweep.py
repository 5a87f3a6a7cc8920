"""Full oracle sweep at an arbitrary scale factor (default sf0.01 —
the scale the correctness driver actually uses, vs the sf0.001 the
fast test suite runs at). Replicates the driver's t2 check locally so
sampling blind spots are caught before the driver finds them.

Usage: python scripts/oracle_sweep.py [sf_dir] [query_substr ...]
Optional query_substr args restrict the sweep to queries whose name
contains any of the substrings (fast iteration on one operator).
Prints one line per query and a final summary; exit code 1 on any
failure.

A FULL sweep (no substr filter, default sf_dir) also writes
SWEEP_rN.json next to the repo root (N from SPARK_GRAFT_ROUND, default
"5") — the committed record that every registered query, not just the
driver's ~50-query sample, was oracle-checked this round (ADVICE r4:
the recorded coverage must match the registered surface).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Correctness path: a non-UTC session would make event-time calendar
# extractions silently diverge from the naive-UTC DuckDB oracle, so
# upgrade catalog's timezone warning to a hard error for this process.
os.environ.setdefault("SPARK_GRAFT_REQUIRE_UTC", "1")

from alexandria_pipeline_spark import ORACLES, QUERIES, register_all
from alexandria_pipeline_spark.registry import release_persisted
from alexandria_pipeline_spark.session import get_spark
from tests.oracle import compare, duck_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    substrs = sys.argv[2:]
    register_all()
    names = sorted(
        n for n in QUERIES if not substrs or any(s in n for s in substrs)
    )
    spark = get_spark("oracle-sweep")
    # Materialize the shingle-sketch relation first so the sweep
    # hash-checks the READ path (what bench/production run), not only
    # the inline fallback. DuckDB oracles always recompute from the
    # raw documents table, so a sketch/inline divergence would fail
    # the hash here.
    try:
        from alexandria_pipeline_spark.sketch import run_sketch_build_job

        run_sketch_build_job(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001 - queries fall back inline
        print(f"sketch build failed (inline fallback): {exc!r}")
    con = duck_connection(sf_dir)
    failures: list[str] = []
    results: dict[str, str] = {}
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            df = QUERIES[name](spark, sf_dir)
            if name in ORACLES:
                compare(df, con, ORACLES[name], name)
                status = "ok"
            else:
                n = df.count()
                status = f"rows-only ({n})"
        except Exception as exc:  # noqa: BLE001 - sweep must not stop
            status = f"FAIL {type(exc).__name__}"
            failures.append(name)
            traceback.print_exc()
        results[name] = status
        # persist-lifecycle contract (r7 verdict #4): queries persist
        # frames their returned DataFrame references; release them now
        # that this query's materialization is done, so session
        # storage stays flat across the 343-query sweep.
        release_persisted()
        print(f"{name:45s} {status:18s} {time.time() - t0:6.2f}s", flush=True)
    wall = round(time.time() - t_all, 1)
    print(
        f"\n{len(names) - len(failures)}/{len(names)} passed at {sf_dir} "
        f"in {wall}s"
    )
    if failures:
        print("FAILED:", ", ".join(failures))
    if not substrs and sf_dir == "/root/testdata/sf0.01":
        rnd = os.environ.get("SPARK_GRAFT_ROUND", "7")
        out = pathlib.Path(__file__).resolve().parent.parent / f"SWEEP_r{rnd}.json"
        out.write_text(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(names),
                    "n_oracle_checked": sum(1 for n in names if n in ORACLES),
                    "n_passed": len(names) - len(failures),
                    "failures": failures,
                    "wall_s": wall,
                    "results": results,
                },
                indent=1,
            )
        )
        print(f"wrote {out.name}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
