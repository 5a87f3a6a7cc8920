#!/usr/bin/env python
"""Round-13 adjudication of the round-12 driver-channel slowdown
(VERDICT r12, Next #2): one session, same host, full bench at the r12
HEAD (da4bf85) and at the r11 snapshot (3a6adae), ABBA order, in BOTH
materialization states:

  - cold: the cross-run cache root is removed before each run, so each
    tree builds its own relations inside the run (state: built);
  - disabled: SPARK_GRAFT_JACCARD_SIG_DISABLE + SPARK_GRAFT_SKETCH_DISABLE,
    so both trees time literal inline plans.

Four full-bench records -> plans/r13/abba_r12_r11.json, which separates
host drift (q1/untouched-query controls), cache state, and plan deltas
for the graph family and the three perf-weak suspects
(events_markov_stationary, text_keyphrase_rake, dq_referential_integrity).

Usage: python scripts/abba_r13.py [--runs 3]
Both trees are read-only git worktrees at pinned commits; the working
tree is not involved, so this is safe to run while editing.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
R12 = "da4bf85"
R11 = "3a6adae"
CACHE = "/tmp/spark_graft_sketch_cache"
OUT = REPO / "plans" / "r13" / "abba_r12_r11.json"


def ensure_worktree(commit: str) -> pathlib.Path:
    path = pathlib.Path(f"/tmp/wt_{commit}")
    if not path.exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(path), commit],
            cwd=REPO,
            check=True,
        )
    return path


def run_bench(tree: pathlib.Path, mode: str, runs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.1"
    env["SPARK_GRAFT_CPUS"] = "32"
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    env.pop("SPARK_GRAFT_JACCARD_SIG_DISABLE", None)
    env.pop("SPARK_GRAFT_SKETCH_DISABLE", None)
    env.pop("SPARK_GRAFT_BENCH_ALLOW_WARM", None)
    if mode == "cold":
        shutil.rmtree(CACHE, ignore_errors=True)
    elif mode == "disabled":
        env["SPARK_GRAFT_JACCARD_SIG_DISABLE"] = "1"
        env["SPARK_GRAFT_SKETCH_DISABLE"] = "1"
    else:
        raise SystemExit(f"unknown mode {mode}")
    proc = subprocess.run(
        [sys.executable, str(tree / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=tree,
        check=False,
    )
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            doc = json.loads(line)
        except json.JSONDecodeError:
            continue
        # the r11 bench predates the materializations key; accept any
        # full headline record (chunk lines carry a different metric)
        if (
            isinstance(doc, dict)
            and "queries" in doc
            and doc.get("metric") == "headline_queries_total_wall"
        ):
            return doc
    raise SystemExit(
        f"no bench record from {tree} mode={mode}:\n{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--modes", default="cold,disabled")
    args = ap.parse_args()

    t12 = ensure_worktree(R12)
    t11 = ensure_worktree(R11)
    record: dict = {"runs_per_query": args.runs, "order": [], "records": {}}
    if OUT.exists():
        record = json.loads(OUT.read_text())
    # Four records, ABBA across trees (r12, r11, r11, r12) with the
    # materialization mode nested so linear host drift cancels in the
    # tree comparison: the judge's exact four-record design.
    plan = [
        ("r12_cold", t12, "cold"),
        ("r11_cold", t11, "cold"),
        ("r11_disabled", t11, "disabled"),
        ("r12_disabled", t12, "disabled"),
    ]
    for key, tree, mode in plan:
        if key in record["records"]:
            continue
        print(f"=== {key} ===", flush=True)
        doc = run_bench(tree, mode, args.runs)
        record["records"][key] = doc
        record["order"].append(key)
        OUT.parent.mkdir(parents=True, exist_ok=True)
        OUT.write_text(json.dumps(record, indent=1))
        print(f"{key}: total={doc.get('value')} n={doc.get('n_timed')}", flush=True)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
