"""Remaining TPC-H query shapes, adapted to the driver's trimmed star
schema (no partsupp table; part/supplier/customer/orders/lineitem carry
a column subset — see TESTDATA.md). Where the official query needs
ps_supplycost we derive unit economics from lineitem itself; where it
needs a column that doesn't exist (l_shipmode, c_phone, o_comment) we
substitute the closest available predicate and say so in the docstring.

Together with relational.py / relational_ext.py (q1/3/4/5/6/10/12/18)
this completes the 22-query dashboard: multi-nation join trees (q7),
market-share ratio (q8), profit decomposition (q9), outer-join
histogram (q13), conditional-aggregate ratio (q14), scalar-subquery max
(q15), disjunctive predicate pushdown (q19), correlated subqueries
(q2/q11/q17/q20), exists/not-exists (q21/q22), and distinct-count
anti-join (q16).

Scale notes (100 TB): every dimension side (nation, supplier, part,
filtered customer) is broadcast; the only shuffles are the fact-table
aggregations on their natural grouping keys. Money is integer-scaled
per row (exact int64) so partial aggregation order can never perturb
the output hash — see functions/exact.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.functions.exact import int_div, trunc_div
from alexandria_pipeline_spark.registry import query, scoped_persist


def _vol_s() -> F.Column:
    """Revenue l_extendedprice*(1-l_discount), integer-scaled by 1e4.

    round() of the per-row product is safe cross-engine (2-decimal
    price x 2-decimal discount factor -> exact 4-decimal grid)."""
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")


_VOL_S_SQL = "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(vol_s) // 100 AS BIGINT) / 100.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             {_VOL_S_SQL} AS vol_s
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.
    The five-way join tree keeps lineitem as the only fact input: the
    nation-filtered supplier and customer sides are broadcast, so the
    sole shuffle is the final 3-key aggregation."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n_small = n.filter(F.col("n_name").isin(*pair))
    supp = F.broadcast(
        s.join(n_small, s.s_nationkey == n_small.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = F.broadcast(
        c.join(n_small, c.c_nationkey == n_small.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        l.filter(
            (F.col("l_shipdate") >= F.expr("timestamp'1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("timestamp'1998-01-01 00:00:00'"))
        )
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(trunc_div(F.sum(_vol_s()), F.lit(100), 100.0).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol_s ELSE 0 END)
                * 10000 // sum(vol_s) AS BIGINT) / 10000.0 AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {_VOL_S_SQL} AS vol_s,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_7's share of PROMO-part revenue sold into ASIA,
    by order year. The share is a ratio of two int64 sums computed in
    one conditional aggregation pass; truncating integer division keeps
    the 4-decimal output bit-identical across engines (never round a
    float quotient — functions/exact.py)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    asia_cust = F.broadcast(
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r.filter(F.col("r_name") == "ASIA"), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    promo = F.broadcast(p.filter(F.col("p_type") == "PROMO").select("p_partkey"))
    vol = (
        l.join(promo, l.l_partkey == promo.p_partkey)
        .join(supp_nation, l.l_suppkey == supp_nation.s_suppkey)
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.expr("timestamp'1996-01-01 00:00:00'"))
                & (F.col("o_orderdate") < F.expr("timestamp'1998-01-01 00:00:00'"))
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(asia_cust, o.o_custkey == asia_cust.c_custkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _vol_s().alias("vol_s"),
            "supp_nation",
        )
    )
    agg = vol.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("vol_s")).otherwise(F.lit(0))).alias("num_s"),
        F.sum("vol_s").alias("den_s"),
    )
    return agg.select(
        "o_year",
        (
            int_div(F.col("num_s").cast("decimal(38,0)") * 10000, F.col("den_s"))
            / F.lit(10000.0)
        ).alias("mkt_share"),
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT nation, o_year,
           CAST(sum(profit_s) // 100 AS BIGINT) / 100.0 AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             {_VOL_S_SQL}
               - CAST(round(p_retailprice * 100) AS BIGINT)
                 * CAST(l_quantity AS BIGINT) * 10 AS profit_s
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_type = 'ECONOMY'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: with no partsupp.ps_supplycost, supply cost is
    modeled as 10% of p_retailprice per unit. profit = revenue - cost,
    both integer-scaled (revenue at 1e4 via round; cost exactly, since
    retail cents x integral quantity x 10 is already on the 1e4 grid).
    Grouped by supplier nation x order year."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    econ = F.broadcast(
        p.filter(F.col("p_type") == "ECONOMY").select("p_partkey", "p_retailprice")
    )
    supp_nation = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    cost_s = (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.col("l_quantity").cast("long")
        * F.lit(10)
    )
    return (
        l.join(econ, l.l_partkey == econ.p_partkey)
        .join(supp_nation, l.l_suppkey == supp_nation.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(trunc_div(F.sum(_vol_s() - cost_s), F.lit(100), 100.0).alias("sum_profit"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 adapted: order-count histogram over a filtered LEFT
    OUTER join (the o_comment NOT LIKE filter becomes an
    o_orderpriority filter — same join-with-residual-condition shape,
    customers with zero qualifying orders must still appear).

    Two aggregations, both on keys the data is already clustered by
    after the join shuffle; count columns are exact int64."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN vol_s ELSE 0 END)
                * 1000000 // sum(vol_s) AS BIGINT) / 10000.0 AS promo_revenue
    FROM (
      SELECT p_type, {_VOL_S_SQL} AS vol_s
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    ) monthly
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO parts.
    Single-pass conditional aggregation over the date-pruned lineitem
    scan with part broadcast; the percent (4 decimals) comes from
    truncating integer division of the two int64 sums."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    agg = (
        l.filter(
            (F.col("l_shipdate") >= F.expr("timestamp'1996-09-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("timestamp'1996-10-01 00:00:00'"))
        )
        .join(F.broadcast(p.select("p_partkey", "p_type")), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", _vol_s()).otherwise(F.lit(0))
            ).alias("num_s"),
            F.sum(_vol_s()).alias("den_s"),
        )
    )
    return agg.select(
        (
            int_div(
                F.col("num_s").cast("decimal(38,0)") * 1000000, F.col("den_s")
            )
            / F.lit(10000.0)
        ).alias(
            "promo_revenue"
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_VOL_S_SQL}) AS total_s
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_s // 100 AS BIGINT) / 100.0 AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_s = (SELECT max(total_s) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue —
    the scalar-subquery-against-a-derived-view shape. The revenue
    aggregate is computed once and reused for both the max and the
    equality filter (Spark caches nothing here, but the recompute is a
    map-side-combined agg over a date-pruned scan; the max is a 1-row
    broadcast). Ties kept, matching the SQL."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= F.expr("timestamp'1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("timestamp'1996-04-01 00:00:00'"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_vol_s()).alias("total_s"))
    )
    max_rev = revenue.agg(F.max("total_s").alias("max_s"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_s == max_rev.max_s)
        .join(F.broadcast(s), revenue.supplier_no == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            trunc_div(F.col("total_s"), F.lit(100), 100.0).alias("total_revenue"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(sum({_VOL_S_SQL}) // 100 AS BIGINT) / 100.0 AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of three conjunctive predicate groups
    across both join sides (the l_shipmode/l_shipinstruct legs don't
    exist in this schema and are dropped). Catalyst extracts the
    common l_quantity <= 30 / p_size >= 1 bounds for pushdown and
    evaluates the residual OR post-join; part is broadcast so the OR
    never forces a shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(trunc_div(F.sum(_vol_s()), F.lit(100), 100.0).alias("revenue"))
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    euro AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM part
    JOIN cost ON p_partkey = cost.l_partkey
    JOIN euro ON cost.l_suppkey = euro.s_suppkey
    WHERE p_size = 15 AND p_type = 'LARGE'
      AND unit_cost = (
        SELECT min(c2.unit_cost)
        FROM cost c2 JOIN euro e2 ON c2.l_suppkey = e2.s_suppkey
        WHERE c2.l_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted: with no partsupp, a supplier's cost for a part
    is its observed minimum unit price (l_extendedprice / l_quantity)
    in lineitem. For LARGE size-15 parts, keep the EUROPE supplier(s)
    hitting the per-part minimum — the correlated-scalar-subquery shape
    expressed as one window min over the part partition (no second
    self-join, one shuffle on l_partkey). The quotient is never
    rounded: both engines compute the identical IEEE double."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    from pyspark.sql import Window

    euro = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r.filter(F.col("r_name") == "EUROPE"), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
        .join(euro, F.col("l_suppkey") == euro.s_suppkey)
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    target = F.broadcast(
        p.filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE")).select(
            "p_partkey", "p_name"
        )
    )
    return (
        best.join(target, best.l_partkey == target.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH natline AS (
      SELECT l_partkey, {_VOL_S_SQL} AS v_s
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    )
    SELECT l_partkey AS p_partkey,
           CAST(sum(v_s) // 100 AS BIGINT) / 100.0 AS part_value
    FROM natline
    GROUP BY l_partkey
    HAVING sum(v_s) * 1000 > (SELECT sum(v_s) FROM natline)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: a part's "stock value" for a nation is its
    lineitem revenue through that nation's suppliers; keep parts
    holding > 0.1% of the nation total. The HAVING-against-scalar-
    subquery is a 1-row broadcast cross join; the share test is exact
    int64 (sum*1000 > total — no float quotient)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nat_supp = F.broadcast(
        s.join(n.filter(F.col("n_name") == "NATION_7"), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey")
    )
    natline = l.join(nat_supp, l.l_suppkey == nat_supp.s_suppkey).select(
        "l_partkey", _vol_s().alias("v_s")
    )
    per_part = natline.groupBy("l_partkey").agg(F.sum("v_s").alias("sum_s"))
    total = per_part.agg(F.sum("sum_s").alias("total_s"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("sum_s") * 1000 > F.col("total_s"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            trunc_div(F.col("sum_s"), F.lit(100), 100.0).alias("part_value"),
        )
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: how many distinct suppliers ship each
    (brand, type, size) bucket, excluding "complaint" suppliers (the
    comment-LIKE filter becomes negative account balance). The NOT IN
    is a broadcast left-anti join; the distinct count shuffles once on
    the 3-part grouping key with partial distinct upstream."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    sizes = [1, 3, 9, 14, 19, 23, 36, 45]
    parts = F.broadcast(
        p.filter(
            (F.col("p_brand") != "Brand#45")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(sizes)
        ).select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = F.broadcast(s.filter(F.col("s_acctbal") < 0.0).select("s_suppkey"))
    return (
        l.join(parts, l.l_partkey == parts.p_partkey)
        .join(bad_supp, l.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pstats AS (
      SELECT l_partkey AS sp_partkey,
             sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) // 7
           AS BIGINT) / 100.0 AS avg_yearly
    FROM lineitem
    JOIN part   ON p_partkey = l_partkey
    JOIN pstats ON sp_partkey = p_partkey
    WHERE p_brand = 'Brand#23'
      AND CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue that would vanish without small-quantity
    orders (quantity < 20% of the part's average). The correlated AVG
    subquery is decorrelated into one per-part aggregate joined back
    (broadcast — it's |part| rows); the 20% test is exact integer
    (qty * 5 * cnt < sum_qty), never a float average. Output is
    trunc(sum_cents / 7) / 100, deterministic in both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pstats = F.broadcast(
        l.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.count("*").alias("cnt"),
        )
    )
    brand = F.broadcast(p.filter(F.col("p_brand") == "Brand#23").select("p_partkey"))
    return (
        l.join(brand, l.l_partkey == brand.p_partkey)
        .join(pstats, F.col("l_partkey") == F.col("sp_partkey"))
        .filter(F.col("l_quantity").cast("long") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            trunc_div(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")),
                F.lit(7),
                100.0,
            ).alias("avg_yearly")
        )
    )


@query(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 200
      )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: NATION_3 suppliers who moved > 200 units of
    PROMO parts in 1996 (the partsupp availability comparison becomes a
    shipped-quantity threshold; the nested IN-subquery chain is kept).
    The inner aggregate is a left-semi broadcast join back onto the
    nation-filtered supplier scan."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    promo = F.broadcast(p.filter(F.col("p_type") == "PROMO").select("p_partkey"))
    heavy = (
        l.filter(
            (F.col("l_shipdate") >= F.expr("timestamp'1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("timestamp'1997-01-01 00:00:00'"))
        )
        .join(promo, l.l_partkey == promo.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 200)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_3")), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
      )
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_4'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted: "late" is shipping > 90 days after the order
    date (no l_commitdate/l_receiptdate in this schema). Suppliers from
    NATION_4 who were the ONLY late supplier on a multi-supplier
    finished order. The EXISTS / NOT EXISTS pair is decorrelated into
    ONE per-order aggregate (distinct suppliers, distinct late
    suppliers) joined back — two scans of lineitem instead of three,
    and the per-order stats shuffle replaces both correlated probes.
    Ranked output carries s_name as the deterministic tiebreaker."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    f_orders = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    # projected to the three columns both consumers need and
    # scoped-persisted (r12): the per-order aggregate AND the late-row
    # probe read this join, and without the persist each replanned the
    # full lineitem⋈orders subtree (the only two fact scans in the
    # plan were each duplicated).
    ll = scoped_persist(
        l.join(f_orders, l.l_orderkey == f_orders.o_orderkey)
        .withColumn(
            "late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
        )
        .select("l_orderkey", "l_suppkey", "late"),
        StorageLevel.MEMORY_AND_DISK,
    )
    per_order = ll.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    nat_supp = F.broadcast(
        s.join(n.filter(F.col("n_name") == "NATION_4"), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    return (
        ll.filter(F.col("late"))
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)),
            F.col("l_orderkey") == F.col("po_orderkey"),
        )
        .join(nat_supp, F.col("l_suppkey") == nat_supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH bal AS (
      SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_cents,
             CAST(count(*) AS BIGINT) AS cnt
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(bal_cents) AS BIGINT) / 100.0 AS totacctbal
    FROM (
      SELECT n_name AS cntrycode,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1','NATION_3','NATION_5','NATION_7',
                       'NATION_9','NATION_11','NATION_13')
        AND CAST(round(c_acctbal * 100) AS BIGINT) * (SELECT cnt FROM bal)
            > (SELECT sum_cents FROM bal)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ) custsale
    GROUP BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: rich-but-inactive customers per nation (the
    phone-prefix country code becomes n_name). Above-average balance is
    tested in exact integer space (cents * count > sum_cents — never a
    float average); the NOT EXISTS is a left-anti join against orders,
    and the 1-row balance stats broadcast-cross-join everywhere."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    nations = [f"NATION_{i}" for i in (1, 3, 5, 7, 9, 11, 13)]
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents).alias("sum_cents"), F.count("*").alias("cnt")
    )
    return (
        c.join(F.broadcast(n.filter(F.col("n_name").isin(nations))), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(bal))
        .filter(cents * F.col("cnt") > F.col("sum_cents"))
        .join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(cents) / F.lit(100.0)).alias("totacctbal"),
        )
    )
