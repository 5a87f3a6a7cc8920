"""Bounds-check oracles for the two sketch-based aggregates.

Their outputs are engine-specific (HLL++ / t-digest internals), so the
driver records rows-only — but sketches still carry PUBLISHED error
guarantees, and those ARE checkable against DuckDB's exact values:

  - approx_count_distinct(rsd=0.01): relative standard deviation 1%;
    assert within 5 sigma (5%) of the exact distinct count.
  - percentile_approx(accuracy=10000): rank error <= 1/accuracy;
    assert the approx value lies between the exact quantiles at
    rank +/- 5/accuracy (value-space bracketing of the rank bound).

This upgrades "no_oracle" to "checked within published error" without
demanding bit equality across engines.
"""

from __future__ import annotations

import pytest

from alexandria_pipeline_spark.registry import QUERIES
from tests.oracle import duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


def test_approx_distinct_within_hll_error(spark, duck):
    got = {
        r["o_orderstatus"]: r["approx_custs"]
        for r in QUERIES["agg_approx_distinct"](spark, SF_DIR).collect()
    }
    exact = dict(
        duck.sql(
            "SELECT o_orderstatus, count(DISTINCT o_custkey) FROM orders"
            " GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for status, n_exact in exact.items():
        rel_err = abs(got[status] - n_exact) / n_exact
        assert rel_err <= 0.05, (
            f"{status}: approx {got[status]} vs exact {n_exact}"
            f" ({rel_err:.2%} > 5x rsd)"
        )


def test_approx_percentiles_within_rank_error(spark, duck):
    rows = QUERIES["agg_approx_percentiles"](spark, SF_DIR).collect()
    assert rows
    # value-space bracket for each quantile from DuckDB exact quantiles
    # at rank p +/- 5/accuracy (accuracy=10000 in the query)
    slack = 5.0 / 10_000
    for r in rows:
        flag = r["l_returnflag"]
        for p, col in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
            lo_q, hi_q = max(0.0, p - slack), min(1.0, p + slack)
            lo, hi = duck.sql(
                f"SELECT quantile_disc(l_extendedprice, {lo_q}),"
                f"       quantile_disc(l_extendedprice, {hi_q})"
                f" FROM lineitem WHERE l_returnflag = '{flag}'"
            ).fetchone()
            assert lo <= r[col] <= hi, (
                f"{flag}.{col}: {r[col]} outside exact bracket"
                f" [{lo}, {hi}] (rank +/-{slack})"
            )


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """The pure-sketch estimator (n_match/8) must track the exact
    Jaccard of the same candidate pairs: k=8 permutations give
    std ~ sqrt(J(1-J)/8) <= 0.18, so an exact-verified pair
    (J >= 0.5) estimating below 0.125 (~2 sigma + slack) means the
    signature arithmetic is broken, not noisy."""
    from alexandria_pipeline_spark import QUERIES

    from tests.conftest import SF_SMOKE

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    }
    est = {
        (r["doc_a"], r["doc_b"]): r["jaccard_est"]
        for r in QUERIES["dedup_minhash_jaccard_estimate"](spark, SF_SMOKE).collect()
    }
    assert exact, "expected near-dup pairs in the smoke corpus"
    # every exact-verified pair must appear among sketch candidates
    # (identical banding) with a sane estimate
    for pair, j in exact.items():
        assert pair in est, pair
        assert est[pair] >= 0.125, (pair, j, est[pair])
