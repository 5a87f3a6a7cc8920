"""Skew-handling join utilities.

At 100 TB the single biggest silent killer is a skewed shuffle key
(one user_id with 10^8 events lands on one reducer). Two mitigations
ship here:

  1. AQE skew-join splitting — already ON in session.py
     (spark.sql.adaptive.skewJoin.enabled): Spark splits oversized
     post-shuffle partitions at runtime. Zero code, first line of
     defense, works for sort-merge joins.

  2. salted_join — for the cases AQE can't fix (aggregation-free
     joins where one KEY, not one partition, is hot): replicate the
     small side R times, scatter the big side's hot keys across R
     salt buckets. Classic MapReduce-era technique; R bounds the
     per-reducer share of any key at 1/R.

Salting changes no results — only the partitioning — so it needs no
oracle; tests assert result-equality against the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key` with the big side salted.

    big gets a uniform random salt in [0, R); small is exploded ×R so
    every (key, salt) pair exists. The shuffle key becomes (key, salt)
    — any hot key now spreads over R reducers. Cost: small side ×R
    (choose R << big/small size ratio).

    Salt uses a hash of monotonically_increasing_id, not rand(), so
    retried tasks produce identical output (determinism under
    speculative execution matters for exactly-once sinks)."""
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def top_frequent_keys(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """Skew diagnosis: the hot-key report you run before choosing R."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(n)
    )


def repartition_for_join(df: DataFrame, key: str | Column, partitions: int) -> DataFrame:
    """Pre-shuffle a fact table on its join key once, so N downstream
    joins/aggs on the same key reuse the exchange (Catalyst recognizes
    the co-partitioning and elides the extra shuffles). The batch
    analog of bucketing when you can't control the table layout."""
    return df.repartition(partitions, key)


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    band_width: float,
    how: str = "inner",
) -> DataFrame:
    """Range join (l.point BETWEEN r.lo AND r.hi) as a banded EQUI
    join — the scale path for interval/range predicates.

    A naive non-equi join plans a broadcast-nested-loop: O(|L|·|R|)
    compares, broadcast-sized right side only. Banding quantizes the
    range dimension into fixed-width bands: points join their band,
    intervals are replicated into every band they overlap, and the
    exact predicate re-filters band-local pairs. The join becomes a
    hash/sort-merge on the band id — shuffle-partitioned, no
    broadcast-size limit, cost O(pairs-in-band) instead of O(all
    pairs). band_width should approximate the typical interval length
    (one-ish bands per interval).

    Result-parity with the naive non-equi join is asserted in
    tests/test_skew.py."""
    lo_band = (F.col(right_lo) / band_width).cast("long")
    hi_band = (F.col(right_hi) / band_width).cast("long")
    r_banded = right.withColumn(
        "_band", F.explode(F.sequence(lo_band, hi_band))
    )
    l_banded = left.withColumn(
        "_band", (F.col(left_point) / band_width).cast("long")
    )
    out = l_banded.join(r_banded, "_band", how).filter(
        (F.col(left_point) >= F.col(right_lo))
        & (F.col(left_point) <= F.col(right_hi))
    )
    return out.drop("_band")
