"""ANSI-overflow regression net: run the arithmetic-heavy queries
against a micro-dataset whose VALUES sit near the int64 danger zone
(prices ~1e11, so cent-sums reach ~1e13 and any `sum*1e6` in BIGINT
explodes exactly like orders_abc_classification did at sf1 — the
round-4 ADVICE class). Row counts stay tiny, so this smokes the
high-SF arithmetic paths in seconds: a query that survives here in
ANSI mode has headroom for the 100-TB magnitudes its docstring
claims. (DuckDB parity is NOT checked here — magnitudes this size are
about not THROWING; the value oracles cover exactness at normal
scale.)"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

from alexandria_pipeline_spark import QUERIES, register_all
from tests.conftest import SF_SMOKE

# price multiplier: sf0.001 totals ~1e7 cents; x3e6 lands class sums
# near 3e13 cents — the magnitude where sum(rev)*1e6 broke r4's ABC
PRICE_MULT = 3_000_000

EXTREME_QUERIES = [
    "orders_abc_classification",
    "orders_pareto_8020",
    "orders_cusum_changepoint",
    "orders_linreg_trend",
    "orders_theilsen_trend",
    "orders_benford_first_digit",
    "orders_runs_test",
    "orders_rolling_median_7d",
    "orders_priority_mix_shift",
    "orders_seasonal_index",
    "orders_fulfillment_latency_percentiles",
    "events_power_user_curve",
    "events_markov2_transitions",
    "events_type_affinity",
    "events_dau_mau_stickiness",
    "events_time_weighted_avg",
    "agg_correlation_matrix",
    "diagnose_join_cardinality",
    "doc_length_gini",
    "customer_rfm_segments",
    # round-9 additions (r8 verdict #8): the two orders-based r8
    # queries; the four text-based ones live in test_round9_invariants
    "orders_mann_kendall_trend",
    "sample_priority_weighted",
]


@pytest.fixture(scope="module")
def extreme_dir(tmp_path_factory) -> str:
    """sf0.001 clone with orders/lineitem prices scaled into the
    ~1e11-per-row range (schemas preserved via DuckDB COPY of a
    modified SELECT over the original parquet)."""
    out = tmp_path_factory.mktemp("extreme_sf")
    src = pathlib.Path(SF_SMOKE)
    con = duckdb.connect()
    for f in sorted(src.glob("*.parquet")):
        t = f.stem
        if t == "orders":
            sel = (
                "SELECT * REPLACE (o_totalprice * "
                f"{PRICE_MULT} AS o_totalprice) FROM '{f}'"
            )
        elif t == "lineitem":
            sel = (
                "SELECT * REPLACE (l_extendedprice * "
                f"{PRICE_MULT} AS l_extendedprice) FROM '{f}'"
            )
        elif t == "events":
            sel = f"SELECT * REPLACE (value * {PRICE_MULT} AS value) FROM '{f}'"
        else:
            sel = f"SELECT * FROM '{f}'"
        con.sql(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    return str(out)


@pytest.mark.parametrize("name", EXTREME_QUERIES)
def test_no_overflow_at_extreme_magnitudes(spark, extreme_dir, name):
    register_all()
    rows = QUERIES[name](spark, extreme_dir).collect()
    assert rows is not None  # full materialization without ANSI overflow
