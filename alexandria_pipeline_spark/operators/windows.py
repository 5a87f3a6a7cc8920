"""Window functions: ranking, lag/lead, moving frames, running totals.

Absent in the reference (SURVEY §2.6 note) but required for as-of
joins, keep-first dedup, and sessionization. All rankings carry a
unique-key tiebreaker so results are deterministic across engines.

Scale notes: a window partitioned by a key is one shuffle on that key;
frames are evaluated with a single sort within the partition. Skewed
partition keys (one user with 10^9 events) are the hazard at 100 TB —
AQE can't split a window partition, so keys are chosen to be natural
entity keys (custkey, user_id) whose per-key cardinality is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.registry import query


@query(
    "window_rank_topn_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rk
    FROM (
      SELECT
        c_custkey, o_orderkey, o_totalprice,
        row_number() OVER (
          PARTITION BY c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
        ) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rk <= 3
    """,
)
def window_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via row_number — the keep-first pattern the
    reference's shard cutoff (process.py:147-149) approximated by
    truncation."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rk",
        )
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT
      user_id,
      event_id,
      lag(event_type)  OVER w AS prev_type,
      lead(event_type) OVER w AS next_type,
      round(value - coalesce(lag(value) OVER w, 0), 2) + 0 AS delta_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (
            F.round(
                F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2
            )
            + 0.0  # normalize -0.0: engines disagree on signed zero
        ).alias("delta_value"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT
      user_id,
      event_id,
      round(avg(value) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
      ), 4) AS moving_avg3
    FROM events
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg3"),
    )


@query(
    "window_running_total",
    oracle="""
    SELECT
      user_id,
      event_id,
      round(sum(value) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ), 2) AS running_value
    FROM events
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT
      p_brand,
      p_partkey,
      rank()       OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS size_rank,
      dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)            AS size_dense_rank,
      CAST(ntile(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS INT) AS price_quartile
    FROM part
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w_size = Window.partitionBy("p_brand").orderBy(F.desc("p_size"), F.asc("p_partkey"))
    w_dense = Window.partitionBy("p_brand").orderBy(F.desc("p_size"))
    w_price = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w_size).alias("size_rank"),
        F.dense_rank().over(w_dense).alias("size_dense_rank"),
        F.ntile(4).over(w_price).cast("int").alias("price_quartile"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER w AS BIGINT)            AS n_recent,
           CAST(CAST(sum(cents) OVER w AS BIGINT) AS BIGINT) / 100.0 AS recent_total
    FROM (
      SELECT o_orderkey, o_custkey,
             epoch_us(o_orderdate) // 1000000 AS ord_s,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ) t
    WINDOW w AS (PARTITION BY o_custkey ORDER BY ord_s
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame — the one frame type rowsBetween can't
    express: all of the customer's orders in the 30 days ending at this
    order, HOWEVER many rows that is (same-day peers are all included,
    identically in both engines). Ordering is epoch seconds (long) —
    range frames need numeric order keys; money is exact cents."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        "o_custkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").alias(
            "ord_s"
        ),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ord_s")
        .rangeBetween(-2592000, Window.currentRow)
    )
    return t.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_recent"),
        (F.sum("cents").over(w) / F.lit(100.0)).alias("recent_total"),
    )
