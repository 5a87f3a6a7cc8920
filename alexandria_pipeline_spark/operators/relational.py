"""Relational core: scans, projections, filters, joins, aggregations,
sorts/top-k, set ops, scalar functions.

Reference parity (SURVEY.md §2): P1-P5 projections/filters, J1-J3
joins (done key-based, not positional — the reference's positional
zip-join and anti-join are order-fragile, `process.py:93-107`), A1-A3
aggregations, O1-O3 sorts/limits, U1-U2 set ops — plus the Spark-native
additions the reference lacks (broadcast/semi/anti/non-equi joins,
distinct + grouping-set aggregates, intersect/except).

Scale notes (100 TB):
  - fact-to-fact joins (lineitem ⋈ orders) shuffle on the join key —
    both sides arrive hash-partitioned, AQE splits skewed partitions;
  - dimension joins (nation, region, customer at most SFs) are
    broadcast-hash: `F.broadcast` pins the strategy so a 1000-executor
    plan never shuffles the fact table for a 25-row dimension;
  - every aggregate below is a partial (map-side) + final hash
    aggregate — Catalyst does this automatically for algebraic aggs;
  - filters/projections sit directly on the Parquet scan (verified in
    tests/test_plans.py via PushedFilters/ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.functions.exact import trunc_div
from alexandria_pipeline_spark.registry import query


# --------------------------------------------------------------------------
# Flagship aggregation (TPC-H Q1 style). Reference analog: the grouped
# reconciliation counts of process.py:131-149 generalized to a full
# partial+final hash aggregate.
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                    AS sum_qty,
      round(sum(l_extendedprice), 2)                               AS sum_base_price,
      CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) // 100 AS BIGINT) / 100.0 AS sum_disc_price,
      CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) // 10000 AS BIGINT) / 100.0 AS sum_charge,
      CAST(CAST(sum(l_quantity) AS BIGINT) * 10000 // count(*) AS BIGINT) / 10000.0 AS avg_qty,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 100 // count(*) AS BIGINT) / 10000.0 AS avg_price,
      CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) * 100 // count(*) AS BIGINT) / 10000.0 AS avg_disc,
      count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.expr("timestamp'1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # e4/e6-scaled charges accumulate in decimal(38,0): the
            # BIGINT sum overflows near 1e18 total — reachable at very
            # high SF with normal prices, not just the extreme suite
            trunc_div(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
                    ).cast("decimal(38,0)")
                ),
                F.lit(100),
                100.0,
            ).alias("sum_disc_price"),
            trunc_div(
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * (1 + F.col("l_tax"))
                        * 1_000_000,
                        0,
                    ).cast("decimal(38,0)")
                ),
                F.lit(10_000),
                100.0,
            ).alias("sum_charge"),
            trunc_div(
                F.sum("l_quantity").cast("long") * 10000, F.count(F.lit(1)), 10_000.0
            ).alias("avg_qty"),
            trunc_div(
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) * 100,
                F.count(F.lit(1)),
                10_000.0,
            ).alias("avg_price"),
            trunc_div(
                F.sum(F.round(F.col("l_discount") * 100, 0).cast("long")) * 100,
                F.count(F.lit(1)),
                10_000.0,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Projection + rename (P1, run.py:29-37) and predicate filters
# (P2, script512.py:20-24 — the >512-token filter, done as a pushed-down
# column predicate instead of a row loop).
# --------------------------------------------------------------------------
@query(
    "project_rename",
    oracle="SELECT doc_id AS id, text AS content FROM documents",
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(F.col("doc_id").alias("id"), F.col("text").alias("content"))


@query(
    "filter_long_docs",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE n_chars > 256
    """,
)
def filter_long_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """script512.py analog on the pure-SQL length column: the predicate
    is pushed into the Parquet scan (no Python in the loop)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("n_chars") > 256).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "filter_token_threshold",
    oracle="""
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
    FROM documents
    WHERE len(string_split(text, ' ')) > 64
    """,
)
def filter_token_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-token variant of the >512-token filter
    (script512.py:21-23). The HF-tokenizer flavor lives in
    functions/text.py as a pandas UDF with identical plan shape."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return d.select("doc_id", n_tokens.alias("n_tokens")).filter(
        F.col("n_tokens") > 64
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k (O1-O3 + Spark-native top-k).
# --------------------------------------------------------------------------
@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — each partition keeps
    a k-heap, driver merges k*numPartitions rows. No global sort even
    at 100 TB. Unique-key tiebreaker keeps the result deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "limit_scan",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20
    """,
)
def limit_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Limit/crop (P3, run.py:23-24) made deterministic via key order."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").limit(20)


# --------------------------------------------------------------------------
# Joins (J-series + Spark-native additions).
# --------------------------------------------------------------------------
@query(
    "join_star_revenue",
    oracle="""
    SELECT
      r_name,
      n_name,
      round(sum(o_totalprice), 2) AS revenue,
      count(*)                    AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup. customer/nation/region are broadcast so the
    orders fact table is never shuffled for the dimension hops; the
    only exchange is the final group-by (and AQE usually collapses
    that to a partial-agg-dominated plan)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "join_fact_fact",
    oracle="""
    SELECT
      o_orderpriority,
      CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) // 100 AS BIGINT) / 100.0 AS revenue,
      count(*)                                          AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact equi join: shuffle-hash/sort-merge on l_orderkey.
    The o_orderstatus filter is pushed below the join into the orders
    scan, shrinking the shuffled side before the exchange."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o.filter(F.col("o_orderstatus") == "F"), l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            trunc_div(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
                    ).cast("long")
                ),
                F.lit(100),
                100.0,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 200000
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_totalprice > 200000),
            "left",
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 300000
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_totalprice") > 300000),
        c.c_custkey == o.o_custkey,
        "left_semi",
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-based anti-join — the correct form of the reference's
    order-fragile positional missing-id scan (J2, process.py:93-107)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_range_nonequi",
    oracle="""
    SELECT p_partkey, p_size, s_suppkey
    FROM part
    JOIN supplier ON s_suppkey BETWEEN p_size - 2 AND p_size + 2
    WHERE p_size <= 12
    """,
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: no equi keys, so Spark plans a broadcast
    nested-loop with the tiny side broadcast. At scale a range join
    should be banded into an equi join on a bucket key (see
    operators/events.py as-of join for the banded pattern)."""
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    return (
        p.filter(F.col("p_size") <= 12)
        .join(
            F.broadcast(s),
            (s.s_suppkey >= p.p_size - 2) & (s.s_suppkey <= p.p_size + 2),
        )
        .select("p_partkey", "p_size", "s_suppkey")
    )


@query(
    "join_alignment_check",
    oracle="""
    SELECT
      count(*) FILTER (WHERE o_orderkey IS NULL) AS only_in_lineitem,
      count(*) FILTER (WHERE l_orderkey IS NULL) AS only_in_orders
    FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
    FULL OUTER JOIN (SELECT o_orderkey FROM orders) o
      ON l_orderkey = o_orderkey
    """,
)
def join_alignment_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 done right: the reference's verify_pickles asserts doi==doi
    against itself (tautological, process.py:21-23); a full-outer join
    with null counts actually verifies key alignment."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    joined = l.join(o, l.l_orderkey == o.o_orderkey, "full_outer")
    return joined.agg(
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("only_in_lineitem"),
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("only_in_orders"),
    )


# --------------------------------------------------------------------------
# Aggregations (A-series + distinct / grouping sets / approx).
# --------------------------------------------------------------------------
@query(
    "agg_segment_stats",
    oracle="""
    SELECT
      c_mktsegment,
      count(*)                        AS n_customers,
      count(DISTINCT c_nationkey)     AS n_nations,
      round(sum(c_acctbal), 2)        AS sum_bal,
      CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) * 100 // count(*) AS BIGINT) / 10000.0 AS avg_bal,
      round(min(c_acctbal), 2)        AS min_bal,
      round(max(c_acctbal), 2)        AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        trunc_div(
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")) * 100,
            F.count(F.lit(1)),
            10_000.0,
        ).alias("avg_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      count(*)                    AS n_orders,
      round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets / rollup — absent in the reference, required by
    the north star's relational coverage (SURVEY §2.5)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query("agg_approx_distinct")  # no oracle: HLL sketches differ across engines
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). Sketch values are
    engine-specific so this is a rows-only check — INTENTIONALLY
    registered without an oracle as the native-HLL twin of
    `agg_distinct_kmv` (relational_ext.py), which implements the same
    mergeable distinct-sketch idea in engine-neutral arithmetic and IS
    hash-checked; `agg_segment_stats.n_nations` covers the exact
    version. ε-bounds tests in tests/ bound this query's estimates."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_custs")
    )


# --------------------------------------------------------------------------
# Set operations (U-series + intersect/except).
# --------------------------------------------------------------------------
@query(
    "setop_union_distinct_intersect",
    oracle="""
    WITH big_spenders AS (
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
    ),
    auto_seg AS (
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    )
    SELECT
      (SELECT count(*) FROM (SELECT DISTINCT custkey FROM (SELECT * FROM big_spenders UNION ALL SELECT * FROM auto_seg))) AS n_union,
      (SELECT count(*) FROM (SELECT DISTINCT custkey FROM big_spenders INTERSECT SELECT DISTINCT custkey FROM auto_seg)) AS n_intersect,
      (SELECT count(*) FROM (SELECT DISTINCT custkey FROM big_spenders EXCEPT SELECT DISTINCT custkey FROM auto_seg))   AS n_except
    """,
)
def setop_union_distinct_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all (U1 shard concat analog), intersect, and except (U2
    missing-ids analog) over the same pair of keysets."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        o.filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    auto = (
        c.filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("custkey"))
    )
    n_union = big.unionByName(auto).distinct().count()
    n_intersect = big.distinct().intersect(auto.distinct()).count()
    n_except = big.distinct().exceptAll(auto.distinct()).count()
    return spark.createDataFrame(
        [(n_union, n_intersect, n_except)], "n_union long, n_intersect long, n_except long"
    )


# --------------------------------------------------------------------------
# Scalar functions: string / date / math / json.
# --------------------------------------------------------------------------
@query(
    "scalar_string_math",
    oracle="""
    SELECT
      p_partkey,
      upper(p_brand)                       AS brand_uc,
      substr(p_type, 1, 5)                 AS type_prefix,
      length(p_name)                       AS name_len,
      round(p_retailprice * 1.1, 2)        AS taxed_price,
      CAST(p_size % 5 AS INT)              AS size_mod
    FROM part
    WHERE p_name LIKE '%ol%'
    """,
)
def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%ol%")).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("taxed_price"),
        (F.col("p_size") % 5).cast("int").alias("size_mod"),
    )


@query(
    "scalar_dates",
    oracle="""
    SELECT
      CAST(year(o_orderdate) AS INT)    AS o_year,
      CAST(month(o_orderdate) AS INT)   AS o_month,
      count(*)                          AS n_orders,
      round(sum(o_totalprice), 2)       AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.month("o_orderdate").cast("int").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "scalar_json_extract",
    oracle="""
    SELECT
      CAST(props->>'k' AS INT)      AS k,
      count(*)                      AS n,
      round(sum(value), 2)          AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json over events.props (SURVEY §2.10 date/json row)."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("props_s", F.from_json("props", "k INT"))
    return (
        parsed.groupBy(F.col("props_s.k").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "setop_all_variants",
    oracle="""
    WITH a AS (SELECT o_orderpriority AS pri FROM orders
               WHERE o_orderkey % 3 = 0),
         b AS (SELECT o_orderpriority AS pri FROM orders
               WHERE o_orderkey % 2 = 0)
    SELECT pri, CAST(count(*) AS BIGINT) AS n, 'union_all' AS op
    FROM (SELECT pri FROM a UNION ALL SELECT pri FROM b) GROUP BY pri
    UNION ALL
    SELECT pri, CAST(count(*) AS BIGINT), 'except_all'
    FROM (SELECT pri FROM a EXCEPT ALL SELECT pri FROM b) GROUP BY pri
    UNION ALL
    SELECT pri, CAST(count(*) AS BIGINT), 'intersect_all'
    FROM (SELECT pri FROM a INTERSECT ALL SELECT pri FROM b) GROUP BY pri
    """,
)
def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (UNION ALL / EXCEPT ALL /
    INTERSECT ALL) — the multiplicity-preserving variants the
    DISTINCT forms in setop_union_distinct_intersect don't cover.
    EXCEPT ALL / INTERSECT ALL hash-partition both sides on the full
    row and reconcile multiplicities per key (Spark plans a single
    shuffle each under AQE); the summary aggregate bounds the output
    at |priority-domain| x 3 rows."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderpriority").alias("pri")
    )
    b = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderpriority").alias("pri")
    )

    def counted(df: DataFrame, op: str) -> DataFrame:
        return df.groupBy("pri").agg(F.count(F.lit(1)).alias("n")).select(
            "pri", "n", F.lit(op).alias("op")
        )

    return (
        counted(a.unionAll(b), "union_all")
        .unionByName(counted(a.exceptAll(b), "except_all"))
        .unionByName(counted(a.intersectAll(b), "intersect_all"))
    )


@query(
    "scalar_null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_orderpriority END AS pri,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE round(o_totalprice, 2) END AS price
      FROM orders
    )
    SELECT
      CAST(count(*) AS BIGINT)                          AS n_rows,
      CAST(count(pri) AS BIGINT)                        AS n_pri_nonnull,
      CAST(count(*) FILTER (WHERE pri IS DISTINCT FROM 'URGENT')
           AS BIGINT)                                   AS n_not_urgent_nullsafe,
      CAST(count(*) FILTER (WHERE pri IS NOT DISTINCT FROM NULL)
           AS BIGINT)                                   AS n_pri_null_nullsafe,
      CAST(count(*) FILTER (WHERE coalesce(price, 0.0) = 0.0)
           AS BIGINT)                                   AS n_price_defaulted,
      CAST(count(*) FILTER (WHERE nullif(pri, 'URGENT') IS NULL)
           AS BIGINT)                                   AS n_urgent_or_null,
      round(sum(coalesce(price, 0.0)), 2) + 0           AS total_defaulted
    FROM t
    """,
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics battery: COUNT vs COUNT(col), null-safe
    comparison (Spark's <=> / SQL IS [NOT] DISTINCT FROM), COALESCE
    defaulting, NULLIF collapsing — the three-valued-logic corners
    that silently reshape aggregates when a pipeline's upstream
    starts emitting nulls. Single wide-aggregate scan, map-side
    combined, seven scalar outputs."""
    o = load_table(spark, sf_dir, "orders")
    pri = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    price = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.round("o_totalprice", 2)
    )
    t = o.select(pri.alias("pri"), price.alias("price"))
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("pri").alias("n_pri_nonnull"),
        F.count(F.when(~F.col("pri").eqNullSafe("URGENT"), 1)).alias(
            "n_not_urgent_nullsafe"
        ),
        F.count(F.when(F.col("pri").eqNullSafe(F.lit(None)), 1)).alias(
            "n_pri_null_nullsafe"
        ),
        F.count(F.when(F.coalesce("price", F.lit(0.0)) == 0.0, 1)).alias(
            "n_price_defaulted"
        ),
        F.count(F.when(F.nullif("pri", F.lit("URGENT")).isNull(), 1)).alias(
            "n_urgent_or_null"
        ),
        (F.round(F.sum(F.coalesce("price", F.lit(0.0))), 2) + 0.0).alias(
            "total_defaulted"
        ),
    )
