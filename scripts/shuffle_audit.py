"""Measure ACTUAL shuffle traffic per query — the runtime evidence for
SCALE.md's shuffle-budget claims (plan-audit counts exchanges; this
records the bytes/records that really crossed them).

Each query's executed plan is run directly (plan.execute().count() —
full materialization, no driver collect) and its SQLMetrics tree is
walked: scan output rows, shuffle bytes/records written, and broadcast
data size are summed across nodes. A query whose shuffleRecords ≈ its
scan rows is shuffling the fact table (bad at 100 TB unless it is a
true fact-fact join); the healthy pattern — map-side combine collapsing
the exchange — shows records orders of magnitude below the scan.

Usage: python scripts/shuffle_audit.py [sf_dir] [query_substr ...]
Defaults: /root/testdata/sf0.1, the bench HEADLINE set. Writes
SHUFFLE_AUDIT_r5.json (round from SPARK_GRAFT_ROUND).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from alexandria_pipeline_spark import QUERIES, get_spark, register_all


def plan_metrics(df) -> dict[str, int]:
    """Execute df's own physical plan and sum the interesting metrics."""
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()
    agg = {
        "scan_rows": 0,
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "broadcast_bytes": 0,
        "spill_bytes": 0,
    }

    def walk(node):
        cn = node.getClass().getName()
        if "AdaptiveSparkPlan" in cn:
            walk(node.executedPlan())
            return
        if "QueryStage" in cn:
            walk(node.plan())
            return
        name = node.nodeName()
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            k, v = kv._1(), kv._2().value()
            if not v:
                continue
            if name == "ColumnarToRow" and k == "numOutputRows":
                agg["scan_rows"] += v
            elif name == "Exchange" and k == "shuffleBytesWritten":
                agg["shuffle_bytes"] += v
            elif name == "Exchange" and k == "shuffleRecordsWritten":
                agg["shuffle_records"] += v
            elif name == "BroadcastExchange" and k == "dataSize":
                agg["broadcast_bytes"] += v
            elif k == "spillSize":
                agg["spill_bytes"] += v
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(plan)
    return agg


def main() -> int:
    register_all()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    substrs = sys.argv[2:]
    if substrs:
        names = sorted(n for n in QUERIES if any(s in n for s in substrs))
    else:
        from bench import HEADLINE

        names = [n for n in HEADLINE if n in QUERIES]
    spark = get_spark("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, int]] = {}
    t0 = time.time()
    for name in names:
        try:
            m = plan_metrics(QUERIES[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 - audit must not stop
            print(f"{name:45s} FAILED {exc!r}", file=sys.stderr)
            continue
        out[name] = m
        print(
            f"{name:45s} scan={m['scan_rows']:>10} "
            f"shuffleB={m['shuffle_bytes']:>12} "
            f"shuffleRec={m['shuffle_records']:>10} "
            f"bcastB={m['broadcast_bytes']:>10} "
            f"spillB={m['spill_bytes']:>8}",
            flush=True,
        )
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "5")
    path = pathlib.Path(__file__).resolve().parent.parent / f"SHUFFLE_AUDIT_r{rnd}.json"
    path.write_text(
        json.dumps({"sf_dir": sf_dir, "n_queries": len(out), "metrics": out}, indent=1)
    )
    print(f"\n{len(out)} queries audited in {time.time() - t0:.1f}s -> {path.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
