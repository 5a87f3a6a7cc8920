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


def test_jaccard_df_cap_drops_stop_shingles(spark):
    """The Σdf² valve: with a df cap, stop-shingles (shared by the
    whole corpus) vanish from the inverted index BEFORE the join, the
    per-doc code counts shrink consistently, and docs whose only
    overlap was the stop-shingle contribute no index rows for it."""
    from pyspark.sql import functions as F

    from alexandria_pipeline_spark.operators.dedup import jaccard_exploded_codes

    # 40 docs all share code 999 (the stop-shingle); docs 0/1 also
    # share three rare codes (the true near-dup signal).
    rows = []
    for i in range(40):
        codes = [999] + ([1, 2, 3] if i < 2 else [100 + i])
        rows.append((i, "en", 10, codes))
    sh = spark.createDataFrame(
        rows, "doc_id long, lang string, n_toks int, codes array<int>"
    )

    uncapped = jaccard_exploded_codes(sh, df_cap=0)
    capped = jaccard_exploded_codes(sh, df_cap=10)

    assert uncapped.filter(F.col("code") == 999).count() == 40
    assert capped.filter(F.col("code") == 999).count() == 0
    # candidate volume for the hot code: 40² join rows gone entirely
    assert capped.count() == uncapped.count() - 40
    # n_codes is recomputed over surviving codes (2 for doc 0, not 4)
    n0 = capped.filter(F.col("doc_id") == 0).select("n_codes").first()["n_codes"]
    assert n0 == 3
    # the true near-dup signal (rare codes) is untouched
    assert capped.filter(F.col("code").isin(1, 2, 3)).count() == 6
