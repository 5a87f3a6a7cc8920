"""Invariant tests for the round-4 operators — properties the DuckDB
oracles can't express (they check equality, not internal consistency):
compaction bin-packing bounds, snapshot-diff partition algebra, WAV
encode/decode round-trip under hypothesis, Pareto coverage guarantees,
and feature-matrix non-negativity."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from alexandria_pipeline_spark import QUERIES, register_all
from tests.conftest import SF_SMOKE


def test_compaction_plan_bin_packing_bounds(spark):
    register_all()
    from alexandria_pipeline_spark.operators.maintenance import TARGET_BYTES

    rows = QUERIES["maintenance_compaction_plan"](spark, SF_SMOKE).collect()
    by_part: dict[str, list] = {}
    for r in rows:
        by_part.setdefault(r["part_key"], []).append(r)
    for part, groups in by_part.items():
        groups.sort(key=lambda r: r["group_id"])
        # greedy exclusive-cumsum packing: every group except possibly the
        # last must have been CLOSED by crossing the target, so its bytes
        # plus anything before it stays < target + its own last file; the
        # coarse invariant: all non-final groups reach >= some content and
        # group ids are contiguous from 0
        assert [g["group_id"] for g in groups] == list(range(len(groups))), part
        for g in groups[:-1]:
            # a non-final group ends because cumulative crossed a target
            # boundary: it can never be empty
            assert g["n_files"] >= 1 and g["group_bytes"] > 0
        # no group (except via one oversized file) wildly exceeds target
        for g in groups:
            max_file = TARGET_BYTES  # files are far smaller than target here
            assert g["group_bytes"] < TARGET_BYTES + max_file, (part, g)


def test_snapshot_diff_partition_algebra(spark):
    register_all()
    rows = {r["change_type"]: r for r in QUERIES["snapshot_diff"](spark, SF_SMOKE).collect()}
    import duckdb

    n_orders = duckdb.sql(
        f"select count(*), count(*) filter (where o_orderkey % 10 = 7),"
        f" count(*) filter (where o_orderkey % 10 = 4),"
        f" count(*) filter (where o_orderkey % 10 = 3)"
        f" from '{SF_SMOKE}/orders.parquet'"
    ).fetchone()
    total, k7, k4, k3 = n_orders
    assert rows["added"]["n"] == k7
    assert rows["deleted"]["n"] == k4
    assert rows["changed"]["n"] == k3
    assert rows["unchanged"]["n"] == total - k7 - k4 - k3


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_samples_roundtrip(samples, rate):
    from alexandria_pipeline_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav_pcm16,
    )

    rate2, out = decode_wav_samples(encode_wav_pcm16(rate, samples))
    assert rate2 == rate
    assert out.tolist() == samples


def test_pareto_coverage_guarantee(spark):
    register_all()
    row = QUERIES["orders_pareto_8020"](spark, SF_SMOKE).collect()[0]
    assert 0 < row["n_cust_for_80pct"] <= row["n_customers"]
    # taking the top n_cust_for_80pct customers must reach >= 80% revenue:
    import duckdb

    got = duckdb.sql(
        f"""
        WITH per_cust AS (
          SELECT o_custkey,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
          FROM '{SF_SMOKE}/orders.parquet' GROUP BY 1
        ), tot AS (SELECT sum(rev) AS t FROM per_cust)
        SELECT sum(rev) FROM (
          SELECT rev FROM per_cust ORDER BY rev DESC, o_custkey
          LIMIT {row['n_cust_for_80pct']}
        ), tot GROUP BY t HAVING sum(rev) * 100 >= t * 80
        """
    ).fetchall()
    assert got, "top-k customers do not cover 80% of revenue"


def test_feature_matrix_domains(spark):
    register_all()
    rows = QUERIES["events_user_feature_matrix"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["frequency"] > 0
        assert r["monetary_cents"] >= 0
        assert 1 <= r["n_types"] <= 5
        assert r["recency_days"] >= 0
        assert r["tenure_days"] >= 0
        assert 0 < r["active_days"] <= r["frequency"]
