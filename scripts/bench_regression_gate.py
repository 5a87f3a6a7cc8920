"""Per-query round-over-round bench regression gate (r5 verdict #4).

Round 5 shipped two per-query regressions (+40% graph_jaccard_neighbors,
+18% graph_triangle_count) that no artifact recorded — they were found
by diffing BENCH_HOST files by hand. This script makes that diff a
first-class artifact: it runs bench.py (or reads an existing bench
JSON), compares every shared query against the previous round's
per-query min-of-N, and writes BENCH_HOST_r{N}.json with a
`regressions` section flagging any shared query slower than
REGRESSION_RATIO. Flagged queries REQUIRE an annotation (why the
regression is real/acceptable/a trade) before the artifact is
considered complete — unannotated entries carry "annotation": null so
a reviewer can see exactly what hasn't been explained.

Usage:
  python scripts/bench_regression_gate.py \
      [--prev BENCH_HOST_r5.json] [--cur bench_output.json] \
      [--out BENCH_HOST_r6.json] [--annotations notes.json]

With no --cur, runs `python bench.py` at $SPARK_GRAFT_SF_DIR (default
sf0.1) and uses its per-query timings. --annotations points at a JSON
object {query_name: "explanation"} merged into flagged entries.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
REGRESSION_RATIO = 1.5
# Queries faster than this are skipped by the ratio gate: at ~0.2s the
# host's multi-second noise bursts dominate and every diff is noise.
MIN_PREV_SEC = 0.3


def _per_query(doc: dict) -> dict[str, float]:
    """Extract the per-query map from a bench line or a BENCH_HOST doc
    (which nests bench records under r{N}_bench-style keys)."""
    if "queries" in doc:
        return dict(doc["queries"])
    best: dict[str, float] = {}
    for v in doc.values():
        if isinstance(v, dict) and "queries" in v:
            # prefer the record covering the most queries (the final
            # full-surface bench, not a shared-subset re-measure)
            if len(v["queries"]) > len(best):
                best = dict(v["queries"])
    return best


def run_bench() -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=False,
    )
    lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
    for line in lines:  # first parseable line with per-query timings
        doc = json.loads(line)
        if "queries" in doc:
            return doc
    raise SystemExit(f"bench.py produced no per-query JSON:\n{proc.stdout[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", default=str(REPO / "BENCH_HOST_r5.json"))
    ap.add_argument("--cur", default=None, help="existing bench JSON; else run bench.py")
    ap.add_argument("--out", default=str(REPO / "BENCH_HOST_r6.json"))
    ap.add_argument("--annotations", default=None)
    args = ap.parse_args()

    prev_doc = json.loads(pathlib.Path(args.prev).read_text())
    prev_q = _per_query(prev_doc)
    cur_bench = (
        json.loads(pathlib.Path(args.cur).read_text()) if args.cur else run_bench()
    )
    cur_q = _per_query(cur_bench)
    notes: dict[str, str] = (
        json.loads(pathlib.Path(args.annotations).read_text())
        if args.annotations
        else {}
    )

    shared = sorted(set(prev_q) & set(cur_q))
    regressions = []
    for name in shared:
        p, c = prev_q[name], cur_q[name]
        if p >= MIN_PREV_SEC and c > p * REGRESSION_RATIO:
            regressions.append(
                {
                    "query": name,
                    "prev_sec": p,
                    "cur_sec": c,
                    "ratio": round(c / p, 2),
                    "annotation": notes.get(name),
                }
            )
    improvements = sorted(
        (
            {"query": n, "prev_sec": prev_q[n], "cur_sec": cur_q[n],
             "ratio": round(cur_q[n] / prev_q[n], 2)}
            for n in shared
            if prev_q[n] >= MIN_PREV_SEC and cur_q[n] < prev_q[n] / REGRESSION_RATIO
        ),
        key=lambda r: r["ratio"],
    )

    out = {
        "what": (
            "Per-query round-over-round bench gate: current bench vs "
            f"{pathlib.Path(args.prev).name}; a shared query is flagged when "
            f"cur > {REGRESSION_RATIO}x prev (prev >= {MIN_PREV_SEC}s). "
            "Every flagged entry must carry an annotation explaining the "
            "regression; null annotation = unexplained."
        ),
        "prev_file": pathlib.Path(args.prev).name,
        "n_shared": len(shared),
        "shared_total_prev_sec": round(sum(prev_q[n] for n in shared), 3),
        "shared_total_cur_sec": round(sum(cur_q[n] for n in shared), 3),
        "regressions": regressions,
        "improvements_beyond_ratio": improvements,
        "bench": cur_bench,
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
    print(
        f"{len(shared)} shared, {len(regressions)} regressions "
        f"({sum(1 for r in regressions if not r['annotation'])} unannotated), "
        f"{len(improvements)} >1.5x improvements -> {args.out}"
    )
    for r in regressions:
        print(f"  REGRESSION {r['query']}: {r['prev_sec']} -> {r['cur_sec']} ({r['ratio']}x)")
    return 1 if any(not r["annotation"] for r in regressions) else 0


if __name__ == "__main__":
    raise SystemExit(main())
