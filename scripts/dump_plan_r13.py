#!/usr/bin/env python
"""Dump .explain('formatted') for named queries into plans/r13/.

Usage: python scripts/dump_plan_r13.py <tag> <query> [<query> ...]
Writes plans/r13/<query>_<tag>.txt and prints a one-line plan-shape
summary (scans / exchanges / joins / python nodes) per query.
"""

from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from alexandria_pipeline_spark import QUERIES, get_spark, register_all
from alexandria_pipeline_spark.plans.explain import formatted_plan
from alexandria_pipeline_spark.registry import release_persisted

SF = "/root/testdata/sf0.1"
OUT = pathlib.Path(__file__).resolve().parent.parent / "plans" / "r13"


def shape(plan: str) -> str:
    # Each node appears twice in explain('formatted') (tree + details);
    # count the numbered tree lines only, like scale_audit does.
    tree = [l for l in plan.splitlines() if re.match(r"^[\s:+\-*]*\(\d+\)", l)]
    n = lambda pat: sum(1 for l in tree if pat in l)
    return (
        f"scans={n('Scan parquet')} exchanges={n('Exchange')} "
        f"bhj={n('BroadcastHashJoin')} smj={n('SortMergeJoin')} "
        f"shj={n('ShuffledHashJoin')} agg={n('HashAggregate')} "
        f"py={n('EvalPython') + n('MapInArrow') + n('MapInPandas') + n('FlatMapGroupsInPandas')}"
    )


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    register_all()
    spark = get_spark("plan-dump-r13")
    spark.sparkContext.setLogLevel("ERROR")
    OUT.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF)
        plan = formatted_plan(df)
        release_persisted()
        path = OUT / f"{name}_{tag}.txt"
        path.write_text(plan)
        print(f"{name}: {shape(plan)} -> {path.name}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
