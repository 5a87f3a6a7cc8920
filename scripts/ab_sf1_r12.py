"""A/B the round-12 plan rewrites at sf1 (10x the bench data).

The round-12 optimization writeup claims most rewrites are UNGATED
(single-scan sweep deltas, dedup-first LPA layout, one-pass moment
algebra, persisted shared subtrees) and therefore win MORE where real
bytes move. This script times one panel of touched queries — plus the
q1 control and the three gate-routed graph queries, which at sf1 are
ABOVE RA_ADJ_BROADCAST_LIMIT / KCORE_DRIVER_EDGE_LIMIT and must match
the before-tree — in ONE fresh session per tree, interleaved
min-of-3, noop sink, release_persisted() outside the timed span
(bench.py methodology). Jaccard/sketch materializations are disabled
so both trees run their literal inline plans against the same
self-generated .stress/sf1 data (scripts/make_stress_sf.py).

Usage: python scripts/ab_sf1_r12.py <repo_root> <tag> [sf_dir] [passes]
Emits one JSON line: {tag, sf_dir, passes, runs: {q: [..]}, min: {q: ..}}
Run once from the round-start checkout (git worktree at the
bench_before commit) and once from HEAD; compare the two lines.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["SPARK_GRAFT_JACCARD_SIG_DISABLE"] = "1"
os.environ["SPARK_GRAFT_SKETCH_DISABLE"] = "1"

PANEL = [
    "q1_pricing_summary",  # control — untouched plan, flags host drift
    "graph_label_propagation",
    "graph_lpa_modularity",
    "graph_degree_assortativity",
    "graph_kcore_summary",
    "orders_theilsen_trend",
    "events_peak_concurrency_daily",
    "orders_open_backlog_daily",
    "events_asof_join",
    "dedup_edit_distance",
    "join_fuzzy_deletion_neighborhood",
    "corpus_dedup_rate_by_source",
    "dq_referential_integrity",
    "events_markov_stationary",
    "knn_mutual_topk",
    "q21_waiting_suppliers",
    # gate-routed at sf1 (above the broadcast/driver gates): the r12
    # below-gate rewrites must NOT change these walls.
    "graph_local_clustering",
    "graph_resource_allocation",
    "graph_triangle_count",
]


def main() -> int:
    repo = sys.argv[1]
    tag = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else ".stress/sf1"
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sys.path.insert(0, repo)

    from alexandria_pipeline_spark import QUERIES, get_spark, register_all
    from alexandria_pipeline_spark.registry import release_persisted

    register_all()
    spark = get_spark(f"ab-sf1-{tag}", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(QUERIES["q1_pricing_summary"](spark, sf_dir))  # warmup
    release_persisted()

    runs: dict[str, list[float]] = {q: [] for q in PANEL}
    for p in range(passes):
        for q in PANEL:
            spark.sparkContext.setJobDescription(f"ab[{tag}] pass{p} {q}")
            t0 = time.perf_counter()
            force(QUERIES[q](spark, sf_dir))
            runs[q].append(round(time.perf_counter() - t0, 3))
            release_persisted()

    print(
        json.dumps(
            {
                "tag": tag,
                "sf_dir": sf_dir,
                "passes": passes,
                "runs": runs,
                "min": {q: min(v) for q, v in runs.items()},
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
