"""Measure ACTUAL data movement per query — the runtime evidence for
SCALE.md's shuffle-budget claims (plan-audit counts exchanges; this
records the bytes/records that really crossed them).

r11 rebuild (r10 verdict #1): metrics now come from STAGE-LEVEL totals
over the WHOLE query callable, not from walking the final executed
plan's SQLMetrics tree. The plan walk could not see any stage that ran
to materialize a `scoped_persist` cache (InMemoryTableScan is a leaf
node), so persisted iterative queries (LPA, quality_train, modularity)
reported scan_rows=0 and their cache-build shuffles/spills vanished
from the record. Here we snapshot the Spark status store (the same
AppStatusStore the UI serves, via its REST API) before the query
callable runs, materialize the result, and sum input / shuffle-write /
spill across every NEW stage — cache builds, plan-time gate actions,
and driver-side collects inside the callable all included.

Semantics of the emitted keys (schema kept from the r5-r10 artifacts,
measurement basis upgraded):
  scan_rows        sum of stage inputRecords — records read by ALL
                   stages, parquet scans AND cache reads (so a query
                   that builds then re-reads a cache counts both; the
                   honest whole-query number)
  shuffle_bytes    sum of stage shuffleWriteBytes
  shuffle_records  sum of stage shuffleWriteRecords
  broadcast_bytes  BroadcastExchange dataSize from the final plan walk
                   (broadcasts are driver-side; stages can't see them)
  spill_bytes      sum of stage diskBytesSpilled
  spill_mem_bytes  sum of stage memoryBytesSpilled
  n_stages         number of (non-skipped) stages the query ran

Usage: python scripts/shuffle_audit.py [sf_dir] [query_substr ...]
Defaults: /root/testdata/sf0.1, the bench HEADLINE set. Writes
SHUFFLE_AUDIT_r{N}.json (round from SPARK_GRAFT_ROUND).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from alexandria_pipeline_spark import QUERIES, get_spark, register_all
from alexandria_pipeline_spark.registry import release_persisted


def _stages(spark) -> list[dict]:
    """All stage attempts the status store currently retains."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages"
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read())


def _settle(spark, floor: int) -> list[dict]:
    """Wait for the listener bus to drain: no ACTIVE/PENDING stage above
    `floor` and two consecutive stable reads. The materializing count()
    already blocked on job completion — this only absorbs the async lag
    between task end and status-store update."""
    prev = None
    for _ in range(100):
        st = _stages(spark)
        busy = any(
            s["stageId"] > floor and s["status"] in ("ACTIVE", "PENDING")
            for s in st
        )
        key = sorted(
            (s["stageId"], s["attemptId"], s["status"], s.get("numCompleteTasks", 0))
            for s in st
            if s["stageId"] > floor
        )
        if not busy and key == prev:
            return st
        prev = key
        time.sleep(0.1)
    return st


def _broadcast_bytes(plan) -> int:
    """Walk the final executed plan (already run — this reads metrics,
    it does not execute) for BroadcastExchange dataSize, the one number
    stage-level metrics cannot carry."""
    total = 0

    def walk(node):
        nonlocal total
        cn = node.getClass().getName()
        if "AdaptiveSparkPlan" in cn:
            walk(node.executedPlan())
            return
        if "QueryStage" in cn:
            walk(node.plan())
            return
        if node.nodeName() == "BroadcastExchange":
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "dataSize" and kv._2().value():
                    total += kv._2().value()
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(plan)
    return total


def query_metrics(spark, fn, sf_dir: str) -> dict[str, int]:
    """Whole-query stage deltas: snapshot BEFORE the callable (so
    cache-builds and plan-time gate actions inside it are counted),
    materialize via the plan's own RDD (no driver collect), then sum
    every stage with id above the snapshot floor, all attempts."""
    floor = max((s["stageId"] for s in _stages(spark)), default=-1)
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()
    stages = _settle(spark, floor)
    new = [s for s in stages if s["stageId"] > floor]
    agg = {
        "scan_rows": sum(s.get("inputRecords", 0) for s in new),
        "input_bytes": sum(s.get("inputBytes", 0) for s in new),
        "shuffle_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "shuffle_records": sum(s.get("shuffleWriteRecords", 0) for s in new),
        "broadcast_bytes": _broadcast_bytes(plan),
        "spill_bytes": sum(s.get("diskBytesSpilled", 0) for s in new),
        "spill_mem_bytes": sum(s.get("memoryBytesSpilled", 0) for s in new),
        "n_stages": sum(1 for s in new if s["status"] != "SKIPPED"),
    }
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
    if spark.sparkContext.uiWebUrl is None:
        print("Spark UI disabled — stage-level audit needs spark.ui.enabled")
        return 2
    out: dict[str, dict[str, int]] = {}
    t0 = time.time()
    for name in names:
        try:
            m = query_metrics(spark, QUERIES[name], sf_dir)
        except Exception as exc:  # noqa: BLE001 - audit must not stop
            print(f"{name:45s} FAILED {exc!r}", file=sys.stderr)
            release_persisted()
            continue
        # queries persist frames their result references; release after
        # each materialization so (a) session storage stays flat and
        # (b) a leaked cache can't absorb the next query's stages.
        release_persisted()
        out[name] = m
        print(
            f"{name:45s} scan={m['scan_rows']:>10} "
            f"shuffleB={m['shuffle_bytes']:>12} "
            f"shuffleRec={m['shuffle_records']:>10} "
            f"bcastB={m['broadcast_bytes']:>10} "
            f"spillB={m['spill_bytes']:>8} "
            f"stages={m['n_stages']:>4}",
            flush=True,
        )
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "5")
    path = pathlib.Path(__file__).resolve().parent.parent / f"SHUFFLE_AUDIT_r{rnd}.json"
    path.write_text(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "basis": "whole-query stage-level deltas (status store); "
                "sees cache-build stages the r5-r10 final-plan walk missed",
                "n_queries": len(out),
                "metrics": out,
            },
            indent=1,
        )
    )
    print(f"\n{len(out)} queries audited in {time.time() - t0:.1f}s -> {path.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
