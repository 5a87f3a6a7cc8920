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

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.registry import query


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


BALANCE_PARTITIONS = 32


@query(
    "diagnose_partition_balance",
    oracle=f"""
    WITH assigned AS (
      SELECT user_id % {BALANCE_PARTITIONS} AS partition_id
      FROM events
    ),
    per_part AS (
      SELECT partition_id, CAST(count(*) AS BIGINT) AS n_rows
      FROM assigned GROUP BY partition_id
    ),
    tot AS (
      SELECT CAST(sum(n_rows) AS BIGINT) AS total,
             CAST(max(n_rows) AS BIGINT) AS mx
      FROM per_part
    )
    SELECT partition_id, n_rows,
           CAST(n_rows * 1000000 // total AS BIGINT) AS share_ppm,
           CAST(n_rows * {BALANCE_PARTITIONS} * 1000 // total AS BIGINT)
             AS balance_milli,
           CAST(mx * {BALANCE_PARTITIONS} * 1000 // total AS BIGINT)
             AS worst_balance_milli
    FROM per_part, tot
    ORDER BY partition_id
    """,
)
def diagnose_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-partition balance report for a candidate key layout:
    rows per partition under a deterministic user_id % 32 partitioner,
    each partition's share, and its balance factor (1000 = perfectly
    even; the worst factor is the straggler multiplier your stage wall
    inherits). THE pre-flight you run before repartition(col) on a
    100-TB shuffle — if worst_balance_milli >> 1000 the key needs
    salting (operators/skew.py) or AQE skew-split will be doing the
    work at runtime. Modulo (not engine hash) keeps the assignment
    cross-engine exact; the real hash partitioner's balance tracks the
    modulo layout for id-like keys. One fact shuffle on a 32-value
    key, everything after is 32 rows."""
    e = load_table(spark, sf_dir, "events")
    per_part = e.groupBy(
        (F.col("user_id") % BALANCE_PARTITIONS).alias("partition_id")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = per_part.agg(
        F.sum("n_rows").alias("total"), F.max("n_rows").alias("mx")
    )
    return (
        per_part.crossJoin(F.broadcast(tot))
        .select(
            F.col("partition_id").cast("long").alias("partition_id"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.expr("CAST(n_rows * 1000000 div total AS BIGINT)").alias("share_ppm"),
            F.expr(
                f"CAST(n_rows * {BALANCE_PARTITIONS} * 1000 div total AS BIGINT)"
            ).alias("balance_milli"),
            F.expr(
                f"CAST(mx * {BALANCE_PARTITIONS} * 1000 div total AS BIGINT)"
            ).alias("worst_balance_milli"),
        )
        .orderBy("partition_id")
    )
