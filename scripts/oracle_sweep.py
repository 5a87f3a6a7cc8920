"""Full oracle sweep at an arbitrary scale factor (default sf0.01 —
the scale the correctness driver actually uses, vs the sf0.001 the
fast test suite runs at). Replicates the driver's t2 check locally so
sampling blind spots are caught before the driver finds them.

Usage: python scripts/oracle_sweep.py [sf_dir] [query_substr ...]
Optional query_substr args restrict the sweep to queries whose name
contains any of the substrings (fast iteration on one operator).
Prints one line per query and a final summary; exit code 1 on any
failure.
"""

from __future__ import annotations

import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from alexandria_pipeline_spark import ORACLES, QUERIES, register_all
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
    con = duck_connection(sf_dir)
    failures: list[str] = []
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
        print(f"{name:45s} {status:18s} {time.time() - t0:6.2f}s", flush=True)
    print(
        f"\n{len(names) - len(failures)}/{len(names)} passed at {sf_dir} "
        f"in {time.time() - t_all:.1f}s"
    )
    if failures:
        print("FAILED:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
