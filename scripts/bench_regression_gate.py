"""Per-query bench regression gate vs ALL prior rounds (r6 verdict #3).

Round 5's gate diffed only against the PREVIOUS round's per-query
table, so queries added late in a round were ungated on their first
re-measure (concretely: dedup_lsh_recall_eval went 0.765s in the r5
driver bench -> 4.98s in r6 and `regressions` stayed empty). This
version builds the baseline as the UNION of every prior artifact —
all BENCH_HOST_r*.json per-query tables plus the driver BENCH_r*.json
tails — and flags each current query against its EARLIEST recorded
time, so a query is gated from the first round it ever appeared in.

A flagged query REQUIRES an annotation (why the regression is
real/acceptable/a measurement artifact); unannotated entries carry
"annotation": null and the exit code is 1 so the ritual can't be
waved through. Known adjudications live in ADJUDICATIONS below so the
explanation ships with the artifact, not a commit message.

Usage:
  python scripts/bench_regression_gate.py \
      [--cur bench_output.json] [--out BENCH_HOST_r7.json] \
      [--annotations notes.json]

With no --cur, runs `python bench.py` at $SPARK_GRAFT_SF_DIR (default
sf0.1) and uses its per-query timings.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
REGRESSION_RATIO = 1.5
# Queries faster than this are skipped by the ratio gate: at ~0.2s the
# host's multi-second noise bursts dominate and every diff is noise.
MIN_PREV_SEC = 0.3
# A flag must ALSO exceed the baseline by this many absolute seconds.
# Calibrated r7: the same unchanged plan measured 0.55s and 0.99s in
# two same-day idle sessions (dedup_incremental_minhash), i.e. the
# host cannot resolve sub-0.75s wall deltas — while any regression
# that matters at 100 TB shows up as whole seconds at sf0.1.
NOISE_FLOOR_SEC = 0.75

# Standing adjudications for flags whose story is already settled —
# merged under any --annotations overrides.
# r8 measurement-honesty note shared by the four queries whose
# pre-r8 baselines were cache-warmed artifacts: bench.py now calls
# release_persisted() after every timed query (the r7-verdict-#4
# persist-lifecycle contract), so pass 2 of min-of-2 recomputes the
# sketch/shingle intermediates instead of silently reading pass 1's
# retained caches. The r3-r5 baselines (and the r7 walls) for
# persist-heavy queries measured a warm-cache second run; the r8
# numbers are the honest per-invocation cost of the SAME plans. The
# same class as the dedup_lsh_recall_eval r5 adjudication.
_R8_RELEASE_NOTE = (
    "Measurement-environment change, not a plan change (git: these "
    "queries' plans are untouched this round). Pre-r8 bench sessions "
    "accumulated every query's retained persisted frames for the "
    "whole 150-query run — Spark substitutes cached subtrees into any "
    "later plan with a matching canonical subplan, so shingle-family "
    "walls were timed inside a session holding dozens of warm "
    "sketch/scan caches. r8's persist-lifecycle contract (r7 verdict "
    "#4) releases after every timed query, so these are the first "
    "cold-per-invocation measurements. Verified by same-session A/B: "
    "decontam_ngram_overlap measures 3.7s with releases applied, but "
    "0.64-1.01s when the dedup family's persisted frames are left "
    "accumulated first, reproducing r7's 0.435s record. Cohort "
    "session drift this round is additionally 1.21x."
)

ADJUDICATIONS = {
    "dedup_lsh_recall_eval": (
        "r5's 0.765s was a cache-leak-warmed artifact: the pre-r6 code "
        "leaked its persisted frames so run 2 of min-of-2 read warm "
        "caches. ~5s was the honest SF-invariant cost after the leak "
        "fix; r7 cuts the exact-ground-truth pass with a Jaccard size "
        "prefix-filter (2*min(|A|,|B|) >= max at tau=0.5) before the "
        "shingle intersection."
    ),
    "merge_embeddings": (
        "Baseline-vintage artifact, not drift: the 0.995s record is from "
        "round 1, when the bench ran 35 queries in a near-empty session. "
        "The query has been flat at 1.57-1.64s for four consecutive "
        "rounds (r4 host 1.93, r5 1.568, r6 1.607, r7 1.598) under the "
        "108+-query session; the plan is unchanged since r1 (broadcast "
        "keyed merge join + scaled concat)."
    ),
    "embed_documents": (
        "Baseline-vintage artifact, not drift: the 0.617s record is from "
        "round 1's near-empty 35-query session. Under the full 131-query "
        "session the wall bounces in a 0.83-1.76s noise band (r4 host "
        "1.761, r5 0.827, r6 1.030, r7 1.092) with the plan unchanged "
        "since r1 (Arrow pandas-UDF featurizer over documents)."
    ),
    "corpus_dedup_rate_by_source": (_R8_RELEASE_NOTE),
    "decontam_ngram_overlap": (_R8_RELEASE_NOTE),
    "dedup_incremental_minhash": (_R8_RELEASE_NOTE),
    "split_leakage_audit": (_R8_RELEASE_NOTE),
    "graph_jaccard_neighbors": (
        "r4-r5 used a collect_set adjacency sketch that KILLED the 16g "
        "JVM at sf10 (GCLocker 128MB array retries); r6 rebuilt it "
        "array-free (64 scalar min-aggregates). The sf0.1 wall roughly "
        "doubled but sf10 went from OOM-crash to 209.97s (43x wall for "
        "100x data) — a deliberate scale-over-small-SF trade. r8 "
        "recovered what is recoverable: the gate bound now comes from "
        "an array-free per-order ROW-count aggregate instead of a "
        "second collect_set pass (-0.4s at sf0.1, far more at sf10) "
        "and the sketch path's signature slots stay primitive columns "
        "(no interpreted zip_with fold). The 1.561s r4 record itself "
        "is not reproducible on the current host: re-running the "
        "LITERAL r4 plan (edges-first, double broadcast) in a fresh r8 "
        "session measures 3.7-3.9s warm, i.e. the residual gap vs "
        "baseline is host/session vintage, not plan regression."
    ),
}

# Re-baselined queries (r9 verdict #2): when a flag has been
# adjudicated as host-vintage (the historical record is not
# reproducible by the LITERAL historical plan on the current host),
# carrying the dead record forward re-raises the same flag every
# round. The fix the verdict prescribes is a FRESH same-host
# min-of-4 record at current HEAD, which becomes the earliest-vintage
# baseline from here on; the retired record stays visible in the
# entry for auditability.
REBASELINES = {
    "graph_jaccard_neighbors": {
        "sec": 3.089,
        "round": 10,
        "src": "same-host min-of-4 at r10 HEAD (2026-08-16, "
        "SPARK_GRAFT_BENCH_RUNS=4), replacing the adjudicated "
        "host-vintage 1.561s r4 record — the literal r4 plan "
        "measures 3.7-3.9s on this host (see ADJUDICATIONS)",
    },
}


def _round_key(path: str) -> int:
    m = re.search(r"_r0*(\d+)", path)
    return int(m.group(1)) if m else 0


_META_KEYS = {"metric", "value", "unit", "n_timed", "n_failed", "sf", "n", "rc", "cpus"}


def _per_query(doc: dict) -> dict[str, float]:
    """Extract the per-query map from a bench line, a BENCH_HOST doc
    (which nests bench records under keys holding {'queries': ...}),
    or a driver BENCH_rN doc (whose per-query timings survive only in
    the raw-stdout `tail` string — regex them out, r6 verdict #3)."""
    if "queries" in doc:
        return dict(doc["queries"])
    best: dict[str, float] = {}
    for v in doc.values():
        if isinstance(v, dict) and isinstance(v.get("queries"), dict):
            # prefer the record covering the most queries (the final
            # full-surface bench, not a shared-subset re-measure)
            if len(v["queries"]) > len(best):
                best = dict(v["queries"])
    if best:
        return best
    tail = doc.get("tail")
    if isinstance(tail, str):
        for name, sec in re.findall(r'"([a-z][a-z0-9_]*)":\s*([0-9]+(?:\.[0-9]+)?)', tail):
            if name not in _META_KEYS and "_" in name:
                best[name] = float(sec)
    return best


def build_baseline(
    exclude: str | None = None,
) -> tuple[dict[str, float], dict[str, str], dict[str, float], dict[str, str]]:
    """Per-query baselines across every prior artifact, host tables
    taking precedence over driver tables within a round. Returns BOTH
    vintages (r8 verdict #6 — every r8 flag was ultimately a stale-
    vintage baseline, burning a round of adjudication each):

      earliest — first time a query was ever recorded (the historical
        best; catches slow cumulative drift but carries host vintage);
      latest   — the most recent PRIOR round's record (same-host-est
        comparator; a flag that clears against this is a vintage
        artifact, not a plan change).

    Returns (earliest, earliest_prov, latest, latest_prov)."""
    candidates = sorted(
        glob.glob(str(REPO / "BENCH_r*.json"))
        + glob.glob(str(REPO / "BENCH_HOST_r*.json")),
        key=lambda p: (_round_key(p), "HOST" not in p),
    )
    times: dict[str, float] = {}
    prov: dict[str, str] = {}
    latest: dict[str, float] = {}
    latest_prov: dict[str, str] = {}
    # post-rebaseline minima: for a rebaselined query, records from
    # rounds NEWER than the rebaseline round may re-tighten the
    # baseline (r10 ADVICE: an unconditional overwrite would pin the
    # gate at the rebaseline forever, loosening it past any genuine
    # later improvement).
    post_rb: dict[str, tuple[float, str]] = {}
    for path in candidates:
        if exclude and pathlib.Path(path).name == exclude:
            continue
        try:
            doc = json.loads(pathlib.Path(path).read_text())
        except (json.JSONDecodeError, OSError):
            continue
        rnd = _round_key(path)
        for name, sec in _per_query(doc).items():
            if not isinstance(sec, (int, float)):
                continue
            if name not in times:
                times[name] = float(sec)
                prov[name] = pathlib.Path(path).name
            latest[name] = float(sec)
            latest_prov[name] = pathlib.Path(path).name
            rb = REBASELINES.get(name)
            # "round" is REQUIRED on every rebaseline entry (ADVICE r11):
            # defaulting it to 0 would treat every historical record as
            # post-rebaseline and re-tighten the baseline back to the
            # exact record the rebaseline retired. KeyError is the
            # correct failure for a malformed entry.
            if rb and rnd > rb["round"]:
                cur = post_rb.get(name)
                if cur is None or float(sec) < cur[0]:
                    post_rb[name] = (float(sec), pathlib.Path(path).name)
    for name, rb in REBASELINES.items():
        # the retired record stays visible in the provenance string
        retired = (
            f" [retired: {times[name]}s from {prov[name]}]"
            if name in times
            else ""
        )
        # floor-replacement: the rebaseline retires only records OLDER
        # than its round; a faster measurement from a later round
        # re-tightens the baseline.
        post = post_rb.get(name)
        if post is not None and post[0] < rb["sec"]:
            times[name] = post[0]
            prov[name] = f"{post[1]} (post-rebaseline min){retired}"
        else:
            times[name] = rb["sec"]
            prov[name] = rb["src"] + retired
    return times, prov, latest, latest_prov


def run_bench(only: list[str] | None = None, runs: int | None = None) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(only)
    if runs:
        env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=False,
    )
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:  # a Spark log fragment can start with '{' — skip, don't die
            doc = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(doc, dict) and "queries" in doc:
            return doc
    raise SystemExit(f"bench.py produced no per-query JSON:\n{proc.stdout[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cur", default=None, help="existing bench JSON; else run bench.py")
    ap.add_argument("--out", default=str(REPO / "BENCH_HOST_r7.json"))
    ap.add_argument("--annotations", default=None)
    args = ap.parse_args()

    base_q, base_src, late_q, late_src = build_baseline(
        exclude=pathlib.Path(args.out).name
    )
    cur_bench = (
        json.loads(pathlib.Path(args.cur).read_text()) if args.cur else run_bench()
    )
    cur_q = _per_query(cur_bench)
    notes = dict(ADJUDICATIONS)
    if args.annotations:
        notes.update(json.loads(pathlib.Path(args.annotations).read_text()))

    shared = sorted(set(base_q) & set(cur_q))

    # Session-drift normalization: this host shows sustained (not just
    # bursty) neighbor steal — whole sessions run 20-40% slower than the
    # same code did hours earlier, and under a raw 1.5x threshold every
    # such window flags a fresh handful of sub-second queries. A real
    # plan regression is a query slowing RELATIVE TO ITS SESSION COHORT,
    # so the gate scales the threshold by the median cur/baseline ratio
    # across all gated shared queries (floored at 1.0: a fast session
    # never loosens the bar, only a provably slow host tightens-out
    # global drift). The drift factor ships in the artifact.
    gated = [n for n in shared if base_q[n] >= MIN_PREV_SEC]
    ratios = sorted(cur_q[n] / base_q[n] for n in gated)
    session_drift = ratios[len(ratios) // 2] if ratios else 1.0
    # Cap the drift multiplier: uncapped, a GENUINE across-the-board
    # regression (a session.py/catalog change slowing every query
    # ~uniformly) would raise the bar proportionally and never flag.
    # Host-steal windows on this box measure <= ~1.3x; anything beyond
    # that is treated as a real uniform slowdown and surfaced as a
    # first-class gate signal below (uniform_slowdown_suspected).
    SESSION_DRIFT_CAP = 1.3
    capped_drift = min(max(1.0, session_drift), SESSION_DRIFT_CAP)
    uniform_slowdown_suspected = session_drift > SESSION_DRIFT_CAP
    bar = REGRESSION_RATIO * capped_drift

    def flagged() -> list[str]:
        return [
            n
            for n in gated
            if cur_q[n] > base_q[n] * bar
            and cur_q[n] - base_q[n] > NOISE_FLOOR_SEC
        ]

    # Targeted noise-retry: this host's ambient CPU steal arrives in
    # multi-second bursts, so a min-of-2 over the full 130+-query session
    # flags a different handful of sub-second queries every run. Before
    # declaring a regression, re-measure ONLY the flagged queries in a
    # fresh session with more passes and keep the per-query minimum — a
    # real plan regression survives 6 samples; a neighbor's burst doesn't.
    retried: list[str] = []
    to_retry = [n for n in flagged() if n not in notes]
    if to_retry and not args.cur:
        retry_q = _per_query(run_bench(only=to_retry, runs=4))
        for name, sec in retry_q.items():
            if name in cur_q and sec < cur_q[name]:
                cur_q[name] = sec
        retried = to_retry

    regressions = []
    for name in flagged():
        p, c = base_q[name], cur_q[name]
        entry = {
            "query": name,
            "baseline_sec": p,
            "baseline_src": base_src[name],
            "cur_sec": c,
            "ratio": round(c / p, 2),
            "latest_baseline_sec": late_q.get(name),
            "latest_baseline_src": late_src.get(name),
            "annotation": notes.get(name),
        }
        # Vintage rule (r8 verdict #6): a flag that clears against the
        # most recent prior round's record of the same query is a
        # baseline-vintage artifact, not a plan change — the earliest
        # record was measured on a different host window (or under the
        # pre-r8 cache-leak regime). Auto-annotate so the flag ships
        # explained instead of burning an adjudication round. Flags
        # that regress against BOTH vintages are actionable plan
        # changes and still require a manual annotation.
        lp = late_q.get(name)
        if (
            entry["annotation"] is None
            and lp is not None
            and lp >= MIN_PREV_SEC
            and not (c > lp * bar and c - lp > NOISE_FLOOR_SEC)
        ):
            entry["annotation"] = (
                f"auto(vintage rule): within the gate bar of the most "
                f"recent prior record ({lp}s in {late_src.get(name)}, "
                f"ratio {round(c / lp, 2)}x) — the {entry['ratio']}x "
                f"flag is against a {base_src[name]} record of "
                f"different host/session vintage, not a plan change "
                f"this round."
            )
            entry["vintage_artifact"] = True
        regressions.append(entry)
    improvements = sorted(
        (
            {"query": n, "baseline_sec": base_q[n], "baseline_src": base_src[n],
             "cur_sec": cur_q[n], "ratio": round(cur_q[n] / base_q[n], 2)}
            for n in shared
            if base_q[n] >= MIN_PREV_SEC and cur_q[n] < base_q[n] / REGRESSION_RATIO
        ),
        key=lambda r: r["ratio"],
    )

    if retried and "queries" in cur_bench:
        # fold the retry minima into the shipped bench record so future
        # rounds baseline against the de-noised numbers
        cur_bench["queries"].update(
            {n: cur_q[n] for n in retried if n in cur_bench["queries"]}
        )

    out = {
        "what": (
            "Per-query bench gate vs the union of ALL prior rounds' "
            "artifacts (earliest recorded time per query, host tables "
            f"preferred within a round): flagged when cur > "
            f"{REGRESSION_RATIO}x baseline (baseline >= {MIN_PREV_SEC}s) "
            f"AND the absolute excess tops {NOISE_FLOOR_SEC}s (the "
            "host's measured same-day wall resolution). Unannotated "
            "flags get one targeted min-of-4 re-measure in a fresh "
            "session (noise_retry) before they stand. Each flag is "
            "ALSO diffed against the most recent prior round's record "
            "(latest_baseline_*): clearing that bar auto-annotates the "
            "flag as a baseline-vintage artifact (r8 verdict #6). "
            "Every surviving flagged entry must carry an annotation; "
            "null annotation = unexplained."
        ),
        "noise_retry": {"queries": retried, "runs": 4},
        "session_drift_median_ratio": round(session_drift, 3),
        "session_drift_cap": SESSION_DRIFT_CAP,
        "uniform_slowdown_suspected": uniform_slowdown_suspected,
        "effective_flag_ratio": round(bar, 3),
        "n_shared": len(shared),
        "n_new_unbaselined": len(set(cur_q) - set(base_q)),
        "shared_total_baseline_sec": round(sum(base_q[n] for n in shared), 3),
        "shared_total_cur_sec": round(sum(cur_q[n] for n in shared), 3),
        "regressions": regressions,
        "improvements_beyond_ratio": improvements,
        "bench": cur_bench,
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
    print(
        f"{len(shared)} shared (of {len(cur_q)} timed; "
        f"{out['n_new_unbaselined']} new/unbaselined), "
        f"{len(regressions)} regressions "
        f"({sum(1 for r in regressions if not r['annotation'])} unannotated), "
        f"{len(improvements)} >1.5x improvements -> {args.out}"
    )
    for r in regressions:
        print(
            f"  REGRESSION {r['query']}: {r['baseline_sec']} "
            f"({r['baseline_src']}) -> {r['cur_sec']} ({r['ratio']}x)"
        )
    if uniform_slowdown_suspected:
        print(
            f"  UNIFORM SLOWDOWN: session median cur/baseline ratio "
            f"{session_drift:.2f} exceeds the {SESSION_DRIFT_CAP}x host-"
            f"steal cap — either the host is badly loaded or a global "
            f"code change slowed everything; investigate before trusting "
            f"this run."
        )
        return 1
    return 1 if any(not r["annotation"] for r in regressions) else 0


if __name__ == "__main__":
    raise SystemExit(main())
