"""Salted-join semantics: identical results to the plain join, with
the shuffle key widened to (key, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.operators.skew import salted_join, top_frequent_keys

from tests.conftest import SF_SMOKE


def _norm(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    c = load_table(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    plain = o.join(c, "custkey").select("o_orderkey", "custkey", "c_mktsegment")
    salted = salted_join(o, c, "custkey", salt_buckets=4).select(
        "o_orderkey", "custkey", "c_mktsegment"
    )
    cols = ["o_orderkey", "custkey", "c_mktsegment"]
    assert _norm(salted, cols) == _norm(plain, cols)


def test_salted_left_join_preserves_unmatched(spark):
    c = load_table(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    o = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    plain = c.join(o, "custkey", "left").select("custkey", "o_orderkey")
    salted = salted_join(c, o, "custkey", salt_buckets=4, how="left").select(
        "custkey", "o_orderkey"
    )
    cols = ["custkey", "o_orderkey"]
    assert _norm(salted, cols) == _norm(plain, cols)


def test_top_frequent_keys_orders(spark):
    e = load_table(spark, SF_SMOKE, "events")
    hot = top_frequent_keys(e, "user_id", n=5).collect()
    assert len(hot) == 5
    counts = [r["cnt"] for r in hot]
    assert counts == sorted(counts, reverse=True)


def test_banded_range_join_matches_nonequi(spark):
    from alexandria_pipeline_spark.operators.skew import banded_range_join

    e = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    # intervals around each part's retail price window
    p = load_table(spark, SF_SMOKE, "part").select(
        "p_partkey",
        (F.col("p_retailprice") / 10 - 3).alias("lo"),
        (F.col("p_retailprice") / 10 + 3).alias("hi"),
    )
    naive = e.join(
        p, (e.value >= p.lo) & (e.value <= p.hi)
    ).select("event_id", "p_partkey")
    banded = banded_range_join(e, p, "value", "lo", "hi", band_width=5.0).select(
        "event_id", "p_partkey"
    )
    cols = ["event_id", "p_partkey"]
    assert _norm(banded, cols) == _norm(naive, cols)
    assert banded.count() > 0  # non-degenerate
