"""ONE-session graph-family stress measurement (r10 verdict #4).

STRESS_r10's graph numbers spanned 91.6-252.8 s for the same LPA plan
across sessions, and triangle's 362 s vs its r6 230.9 s record was
attributed to host vintage by analogy only. This script settles
host-vintage vs plan-cost: ONE fresh session, the four graph queries
plus a stable control (q1) and the one other r11-rewritten plan
(curation_quality_train), interleaved min-of-3 passes back-to-back at
sf1 and sf10, every run listed.

Phases:
  A  inline jaccard (SPARK_GRAFT_JACCARD_SIG_DISABLE) — the literal
     r10 plans, so the numbers are comparable to prior rounds;
  B  jaccard signature build jobs (timed, per sf);
  C  jaccard read path, min-of-3 — the steady-state production path.

Ordering bias note: phase C runs after A, so the page cache is warm
with lineitem; the build in between (phase B) rewrites the relevant
inputs (edge/sig parquet), which C then reads for the first time —
the first C run is the cold-ish read, the min is steady-state.

Writes STRESS_r11.json. Non-graph rows are NOT re-measured: every
other query's plan is unchanged from r10 (see STRESS_r10.json).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from alexandria_pipeline_spark import QUERIES, get_spark, register_all
from alexandria_pipeline_spark.registry import release_persisted

RUNS = 3
GRAPH = [
    "graph_label_propagation",
    "graph_lpa_modularity",
    "graph_triangle_count",
    "graph_jaccard_neighbors",
]
EXTRA = ["curation_quality_train"]  # r11 plan change (QT collect-per-step)
CONTROL = "q1_pricing_summary"
SF_DIRS = [("sf1", ".stress/sf1"), ("sf10", ".stress/sf10")]
OUT = pathlib.Path(__file__).resolve().parent.parent / "STRESS_r11.json"


def timed(spark, name: str, sf_dir: str) -> float:
    t0 = time.monotonic()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.monotonic() - t0, 2)
    release_persisted()
    spark.catalog.clearCache()
    return dt


def main() -> int:
    register_all()
    spark = get_spark("graph-stress-session", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    doc = {
        # stress_run.py --all-new appends into "timings"; seeded here
        # with phase A's literal-plan minima (comparable to r10 rows)
        "timings": {},
        "method": (
            "ONE fresh session, interleaved min-of-%d passes back-to-back "
            "(pass 1 runs every query, then pass 2, ...), control row %s; "
            "phase A times the literal plans with the jaccard signature "
            "relation DISABLED (comparable to r10 records), phase C times "
            "the jaccard read path after the phase-B build. All runs "
            "listed; min is the comparison number." % (RUNS, CONTROL)
        ),
        "phase_a_inline": {},
        "phase_b_jsig_build_sec": {},
        "phase_c_jsig_read": {},
    }

    def flush():
        OUT.write_text(json.dumps(doc, indent=1))

    # ---- phase A: literal plans, jaccard inline ----
    os.environ["SPARK_GRAFT_JACCARD_SIG_DISABLE"] = "1"
    names = [CONTROL] + GRAPH + EXTRA
    for sf_label, sf_dir in SF_DIRS:
        timed(spark, CONTROL, sf_dir)  # warm-up, untimed
        rows = doc["phase_a_inline"].setdefault(sf_label, {})
        for p in range(RUNS):
            for name in names:
                dt = timed(spark, name, sf_dir)
                rows.setdefault(name, {"runs": []})["runs"].append(dt)
                rows[name]["min"] = min(rows[name]["runs"])
                doc["timings"].setdefault(name, {})[sf_label] = rows[name]["min"]
                print(f"A {sf_label} pass{p + 1} {name:35s} {dt:9.2f}s", flush=True)
                flush()
    del os.environ["SPARK_GRAFT_JACCARD_SIG_DISABLE"]

    # ---- phase B: signature builds ----
    from alexandria_pipeline_spark.operators.graph import run_jaccard_sig_build_job

    for sf_label, sf_dir in SF_DIRS:
        t0 = time.monotonic()
        run_jaccard_sig_build_job(spark, sf_dir, force=True)
        doc["phase_b_jsig_build_sec"][sf_label] = round(time.monotonic() - t0, 2)
        print(f"B {sf_label} jsig build {doc['phase_b_jsig_build_sec'][sf_label]:.2f}s", flush=True)
        flush()

    # ---- phase C: jaccard read path ----
    for sf_label, sf_dir in SF_DIRS:
        rows = doc["phase_c_jsig_read"].setdefault(sf_label, {"runs": []})
        for p in range(RUNS):
            dt = timed(spark, "graph_jaccard_neighbors", sf_dir)
            rows["runs"].append(dt)
            rows["min"] = min(rows["runs"])
            print(f"C {sf_label} pass{p + 1} jaccard-read {dt:9.2f}s", flush=True)
            flush()

    flush()
    print(f"wrote {OUT.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
