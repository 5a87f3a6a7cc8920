"""Regenerate the SCALE.md plan-audit table.

Usage: python scripts/scale_audit.py  (prints the markdown table;
hand-written notes in the existing SCALE.md are preserved by name).
Streaming / side-effecting / iterative queries are skipped (executing
them is the only way to see their micro-batch plans) and marked
audited-in-tests.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from alexandria_pipeline_spark import get_spark, register_all
from alexandria_pipeline_spark.registry import QUERIES
from alexandria_pipeline_spark.plans.explain import formatted_plan

SF = "/root/testdata/sf0.001"
SKIP = {"sharded_sink_roundtrip", "source_text_formats_roundtrip"}
SKIP_NOTE = {
    "sharded_sink_roundtrip": "sink op: audited in tests",
    "source_text_formats_roundtrip": "format roundtrip: audited in tests",
}


def existing_notes(path: str = "SCALE.md") -> dict[str, str]:
    notes = {}
    try:
        for ln in open(path):
            m = re.match(r"\| (\S+) \| \S+ \| \S+ \| \S+ \| (.*) \|$", ln.strip())
            if m and m.group(2).strip():
                notes[m.group(1)] = m.group(2).strip()
    except FileNotFoundError:
        pass
    return notes


def main() -> None:
    register_all()
    notes = existing_notes()
    spark = get_spark("scale-audit", cpus="8")
    rows = []
    for name in sorted(QUERIES):
        if name.startswith("stream_"):
            rows.append((name, "—", "—", "—", "streaming/stateful/ML: audited in tests"))
            continue
        if name in SKIP:
            rows.append((name, "—", "—", "—", SKIP_NOTE[name]))
            continue
        plan = formatted_plan(QUERIES[name](spark, SF))
        # Each node appears twice in explain('formatted') — once in the
        # tree, once as a "(N) NodeName" detail header; count headers.
        heads = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
        bcast = heads.count("BroadcastExchange")
        shuffles = heads.count("Exchange")
        py = (
            "yes"
            if any(k in plan for k in ("EvalPython", "MapInPandas", "ArrowEval", "FlatMapGroupsInPandas"))
            else "no"
        )
        rows.append((name, str(shuffles), str(bcast), py, notes.get(name, "")))
    print("| query | shuffles | bcast | py | scale note |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]} |")


if __name__ == "__main__":
    main()
