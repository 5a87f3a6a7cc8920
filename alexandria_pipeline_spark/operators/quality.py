"""Declarative data-quality constraint checking (Deequ-style): a rule
set evaluated in as few passes as the rules allow, emitting one row
per rule with its violation count. This is the validation stage a
100 TB ingest runs BEFORE publishing a snapshot — uniqueness,
completeness, domain, range, and referential integrity — expressed so
that per-table rules collapse into ONE wide aggregate scan per table
(not one scan per rule) and the referential check is the only join.

Reference analog: the reference's ad-hoc reconciliation counts
(process.py:131-149, §2.5 A3) are the hand-rolled version of exactly
this; here the rules are data, not code paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.registry import query

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "dq_constraint_check",
    oracle=f"""
    WITH o AS (
      SELECT
        count(*) - count(DISTINCT o_orderkey)              AS unique_orderkey,
        count(*) FILTER (WHERE o_totalprice <= 0)          AS positive_totalprice,
        count(*) FILTER (WHERE o_custkey IS NULL)          AS custkey_complete
      FROM orders
    ),
    l AS (
      SELECT
        count(*) FILTER (WHERE l_quantity <= 0 OR l_quantity > 100)
          AS quantity_in_range,
        count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
          AS discount_in_range
      FROM lineitem
    ),
    e AS (
      SELECT
        count(*) FILTER (WHERE event_type NOT IN
          ({", ".join(f"'{t}'" for t in EVENT_TYPES)}))    AS event_type_domain,
        count(*) FILTER (WHERE ts IS NULL)                 AS ts_complete
      FROM events
    ),
    ri AS (
      SELECT count(*) AS orders_custkey_fk
      FROM orders ANTI JOIN customer ON o_custkey = c_custkey
    )
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations FROM (
      SELECT 'orders.o_orderkey unique' AS rule, unique_orderkey AS n_violations FROM o
      UNION ALL SELECT 'orders.o_totalprice > 0', positive_totalprice FROM o
      UNION ALL SELECT 'orders.o_custkey not null', custkey_complete FROM o
      UNION ALL SELECT 'lineitem.l_quantity in (0,100]', quantity_in_range FROM l
      UNION ALL SELECT 'lineitem.l_discount in [0,1]', discount_in_range FROM l
      UNION ALL SELECT 'events.event_type in domain', event_type_domain FROM e
      UNION ALL SELECT 'events.ts not null', ts_complete FROM e
      UNION ALL SELECT 'orders.o_custkey references customer', orders_custkey_fk FROM ri
    )
    """,
)
def dq_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight constraints over three tables in THREE wide-aggregate
    scans plus one anti join — rules over the same table share a
    single pass (conditional counts in one agg), so adding a rule
    costs an expression, not a scan. Violation counts (not booleans)
    so a failing snapshot quantifies how bad. At 100 TB the
    uniqueness rule is the only one that shuffles (count distinct);
    the rest are map-side conditional sums, and the FK check
    broadcasts the dimension."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")

    def cnt(cond):
        return F.count(F.when(cond, 1))

    o_agg = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "unique_orderkey"
        ),
        cnt(F.col("o_totalprice") <= 0).alias("positive_totalprice"),
        cnt(F.col("o_custkey").isNull()).alias("custkey_complete"),
    )
    l_agg = l.agg(
        cnt((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 100)).alias(
            "quantity_in_range"
        ),
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "discount_in_range"
        ),
    )
    e_agg = e.agg(
        cnt(~F.col("event_type").isin(EVENT_TYPES)).alias("event_type_domain"),
        cnt(F.col("ts").isNull()).alias("ts_complete"),
    )
    fk = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orders_custkey_fk"))
    )

    def rows(agg: DataFrame, rules: dict[str, str]) -> DataFrame:
        stack = ", ".join(f"'{label}', {col}" for col, label in rules.items())
        return agg.selectExpr(
            f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
        )

    out = (
        rows(o_agg, {
            "unique_orderkey": "orders.o_orderkey unique",
            "positive_totalprice": "orders.o_totalprice > 0",
            "custkey_complete": "orders.o_custkey not null",
        })
        .unionByName(rows(l_agg, {
            "quantity_in_range": "lineitem.l_quantity in (0,100]",
            "discount_in_range": "lineitem.l_discount in [0,1]",
        }))
        .unionByName(rows(e_agg, {
            "event_type_domain": "events.event_type in domain",
            "ts_complete": "events.ts not null",
        }))
        .unionByName(rows(fk, {
            "orders_custkey_fk": "orders.o_custkey references customer",
        }))
    )
    return out.select("rule", F.col("n_violations").cast("long"))


@query(
    "dq_profile_drift",
    oracle="""
    WITH halves AS (
      SELECT doc_id % 2 AS snap,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) FILTER (WHERE text IS NULL OR text = '')
                  AS BIGINT) AS n_empty_text,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars
      FROM documents GROUP BY doc_id % 2
    )
    SELECT a.n_rows  AS n_rows_old,  b.n_rows  AS n_rows_new,
           a.n_empty_text AS empty_old, b.n_empty_text AS empty_new,
           a.n_sources AS sources_old, b.n_sources AS sources_new,
           a.mean_chars AS mean_chars_old, b.mean_chars AS mean_chars_new,
           CAST(abs(b.mean_chars - a.mean_chars) * 1000000
                // a.mean_chars AS BIGINT) AS mean_chars_drift_ppm
    FROM halves a, halves b
    WHERE a.snap = 0 AND b.snap = 1
    """,
)
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile drift between two corpus snapshots (row counts,
    empty-text rate, source cardinality, mean length) — the schema-
    stability check an ingest runs BEFORE dq_constraint_check's rule
    evaluation: rules catch known-bad values, profile drift catches
    the unknown-unknowns (a feed that silently halved its lengths).
    One conditional wide-aggregate scan to 2 profile rows, self-joined
    driver-side-free; integer ppm drift. Pairs with corpus_lang_drift
    (per-language distribution) as the generic-column counterpart."""
    d = load_table(spark, sf_dir, "documents")
    halves = d.groupBy((F.col("doc_id") % 2).alias("snap")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(
            F.when(F.col("text").isNull() | (F.col("text") == ""), 1)
        ).alias("n_empty_text"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.expr("sum(n_chars) div count(1)").alias("mean_chars"),
    )
    a = halves.filter(F.col("snap") == 0).select(
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_empty_text").alias("empty_old"),
        F.col("n_sources").alias("sources_old"),
        F.col("mean_chars").alias("mean_chars_old"),
    )
    b = halves.filter(F.col("snap") == 1).select(
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_empty_text").alias("empty_new"),
        F.col("n_sources").alias("sources_new"),
        F.col("mean_chars").alias("mean_chars_new"),
    )
    return a.crossJoin(b).select(
        "n_rows_old",
        "n_rows_new",
        "empty_old",
        "empty_new",
        "sources_old",
        "sources_new",
        "mean_chars_old",
        "mean_chars_new",
        F.expr(
            "abs(mean_chars_new - mean_chars_old) * 1000000 "
            "div mean_chars_old"
        ).alias("mean_chars_drift_ppm"),
    )


# Freshness SLA: a feed whose latest event lags the corpus high-water
# mark by more than this is stale (its producer stopped or stalled).
FRESHNESS_SLA_S = 6 * 3600


@query(
    "dq_freshness_lag",
    oracle=f"""
    WITH per_type AS (
      SELECT event_type,
             CAST(max(epoch_us(ts)) AS BIGINT) AS latest_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    ),
    hwm AS (SELECT CAST(max(latest_us) AS BIGINT) AS global_us FROM per_type)
    SELECT event_type, n_events,
           CAST((global_us - latest_us) // 1000000 AS BIGINT) AS lag_s,
           CAST((global_us - latest_us) // 1000000 > {FRESHNESS_SLA_S}
             AS INT) AS stale_flag
    FROM per_type, hwm
    ORDER BY event_type
    """,
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed FRESHNESS monitoring — the first page of every data-ops
    dashboard: how far does each event type's latest event lag the
    corpus high-water mark, and which feeds violate the 6h SLA (a
    stale feed means its producer died, and every downstream join
    silently loses that type's rows). One map-side-combined max/count
    aggregate per type plus a 1-row broadcast high-water mark; exact
    integer seconds.""".replace("{H}", str(FRESHNESS_SLA_S // 3600))
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.expr("CAST(max(unix_micros(ts)) AS BIGINT)").alias("latest_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    hwm = per_type.agg(F.max("latest_us").alias("global_us"))
    lag_s = F.expr("(global_us - latest_us) div 1000000")
    return (
        per_type.crossJoin(F.broadcast(hwm))
        .select(
            "event_type",
            "n_events",
            lag_s.cast("long").alias("lag_s"),
            (lag_s > FRESHNESS_SLA_S).cast("int").alias("stale_flag"),
        )
        .orderBy("event_type")
    )


_FK_EDGES = (
    # (edge label, child table, fk col, parent table, pk col)
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


@query(
    "dq_referential_integrity",
    oracle="""
    """
    + "\nUNION ALL\n".join(
        f"""
    SELECT '{label}' AS fk_edge,
           CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child_rows,
           CAST((SELECT count(*) FROM {child} c
                 WHERE c.{fk} IS NULL OR NOT EXISTS
                   (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}))
                AS BIGINT) AS n_orphans
        """
        for label, child, fk, parent, pk in _FK_EDGES
    )
    + "\nORDER BY fk_edge",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity matrix over every FK edge of the schema —
    the one-screen answer to 'can I trust my joins': per edge, child
    row count and orphans (NULL or dangling FK). dq_constraint_check
    spot-checks one edge as a rule; this is the exhaustive version a
    lakehouse runs after every backfill, because a single orphaned
    partition silently turns inner joins into row loss downstream.
    Shape: edges sharing a child table fuse into ONE scan whose
    chained LEFT joins against each parent's distinct keys yield the
    child count and every edge's orphan count in a single aggregate
    (no separate driver-side count action) — dimension parents
    broadcast, fact parents (orders, customer) co-partition with the
    child in a shuffle join AQE sizes at runtime; the per-child 1-row
    aggregates unpivot in-row and union into a bounded read-out.
    Counts are exact integers; no windows anywhere."""
    # r12: edges sharing a CHILD table fuse into one scan — lineitem
    # (the fact table, three FK edges) was scanned and aggregated three
    # times. All of a child's parents chain as left joins against
    # distinct keys (each child row matches <= 1 parent row per join,
    # so row counts are join-invariant), one aggregate counts every
    # edge's orphans, and an in-row explode unpivots to the same
    # one-row-per-edge read-out. 7 child scans -> 5; at 100 TB the
    # fact table crosses the plan once instead of three times.
    by_child: dict[str, list[tuple[str, str, str, str]]] = {}
    for label, child, fk, parent, pk in _FK_EDGES:
        by_child.setdefault(child, []).append((label, fk, parent, pk))
    out = None
    for child, edges in by_child.items():
        j = load_table(spark, sf_dir, child).select(
            *[F.col(fk).alias(f"__fk{i}") for i, (_, fk, _, _) in enumerate(edges)]
        )
        for i, (_, _, parent, pk) in enumerate(edges):
            p = (
                load_table(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"__pk{i}"))
                .distinct()
            )
            j = j.join(p, F.col(f"__fk{i}") == F.col(f"__pk{i}"), "left")
        agg = j.agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            *[
                F.count(F.when(F.col(f"__pk{i}").isNull(), 1))
                .cast("long")
                .alias(f"__o{i}")
                for i in range(len(edges))
            ],
        )
        rows = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(label).alias("fk_edge"),
                            F.col("__n").alias("n_child_rows"),
                            F.col(f"__o{i}").alias("n_orphans"),
                        )
                        for i, (label, _, _, _) in enumerate(edges)
                    ]
                )
            ).alias("z")
        ).select("z.fk_edge", "z.n_child_rows", "z.n_orphans")
        out = rows if out is None else out.unionByName(rows)
    return out.orderBy("fk_edge")
