"""Lakehouse-maintenance & snapshot operators: the jobs a 100 TB
table needs BETWEEN queries — snapshot diffing for audit/CDC
validation, small-file compaction planning, data-layout (zone-map)
effectiveness diagnostics, exact dedup that keeps the BEST record
rather than the first, and corpus-distribution drift monitoring.

Reference analog: the reference's pipeline re-runs and reconciliation
counts (process.py:131-149) are the manual version of snapshot_diff;
its fixed 2k-row shard sink (run.py:96-102, SURVEY §2.1 S5) is what
maintenance_compaction_plan exists to clean up after.

All plans here are single-digit-shuffle with bounded group counts:
snapshot diff is one co-partitioned full-outer join on the primary
key; the compaction planner's window runs over per-partition FILE
lists (bounded by files-per-partition, not rows); drift and zone-map
stats aggregate to dimension-sized outputs with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.registry import query

# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

# Two deterministic snapshots derived from orders:
#   snapshot A drops keys ≡7 (mod 10)  -> those appear "added" in B
#   snapshot B drops keys ≡4 (mod 10)  -> those appear "deleted"
#   snapshot B bumps totalprice on ≡3  -> those appear "changed"


@query(
    "snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
      FROM orders WHERE o_orderkey % 10 <> 7
    ),
    b AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 = 3
                  THEN round(o_totalprice + 1.00, 2)
                  ELSE round(o_totalprice, 2) END AS price
      FROM orders WHERE o_orderkey % 10 <> 4
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n,
           CAST(min(k) AS BIGINT) AS min_key, CAST(max(k) AS BIGINT) AS max_key
    FROM (
      SELECT
        CASE
          WHEN a.o_orderkey IS NULL THEN 'added'
          WHEN b.o_orderkey IS NULL THEN 'deleted'
          WHEN a.price <> b.price OR a.o_orderstatus <> b.o_orderstatus
            THEN 'changed'
          ELSE 'unchanged'
        END AS change_type,
        coalesce(a.o_orderkey, b.o_orderkey) AS k
      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    )
    GROUP BY change_type
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit diff between two table snapshots (added / deleted /
    changed / unchanged) — the validation a pipeline runs after a
    backfill or a CDC replay to prove the new snapshot differs only
    where expected. One full-outer sort-merge join on the primary
    key: both sides shuffle once on o_orderkey and AQE coalesces the
    result; with bucketed snapshot storage (sources/bucketed.py) the
    exchange disappears entirely. The summary aggregate is 4 rows."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("a_status"),
        F.round("o_totalprice", 2).alias("a_price"),
    )
    b = o.filter(F.col("o_orderkey") % 10 != 4).select(
        F.col("o_orderkey").alias("b_orderkey"),
        F.col("o_orderstatus").alias("b_status"),
        F.when(
            F.col("o_orderkey") % 10 == 3, F.round(F.col("o_totalprice") + 1.00, 2)
        )
        .otherwise(F.round("o_totalprice", 2))
        .alias("b_price"),
    )
    j = a.join(b, a.o_orderkey == b.b_orderkey, "full_outer")
    classified = j.select(
        F.when(F.col("o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b_orderkey").isNull(), F.lit("deleted"))
        .when(
            (F.col("a_price") != F.col("b_price"))
            | (F.col("a_status") != F.col("b_status")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        F.coalesce("o_orderkey", "b_orderkey").alias("k"),
    )
    return classified.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# maintenance_compaction_plan
# ---------------------------------------------------------------------------

N_FILES_PER_PART = 40  # modeled small files per table partition
BYTES_PER_ROW = 128  # modeled on-disk bytes per row
TARGET_BYTES = 100_000  # compaction target output size


@query(
    "maintenance_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT l_returnflag AS part_key,
             l_orderkey % {N_FILES_PER_PART} AS file_id,
             CAST(count(*) * {BYTES_PER_ROW} AS BIGINT) AS bytes
      FROM lineitem GROUP BY 1, 2
    ),
    planned AS (
      SELECT part_key, file_id, bytes,
             (sum(bytes) OVER (PARTITION BY part_key ORDER BY file_id
                               ROWS UNBOUNDED PRECEDING) - bytes)
               // {TARGET_BYTES} AS grp
      FROM files
    )
    SELECT part_key, CAST(grp AS BIGINT) AS group_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS group_bytes
    FROM planned GROUP BY part_key, grp
    """,
)
def maintenance_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: per table-partition, greedily
    bin-pack files (in file-id order) into rewrite groups of
    ~TARGET_BYTES via an exclusive running sum — exactly how a
    lakehouse OPTIMIZE job plans rewrites. The only window runs over
    per-partition FILE LISTS (≤ N_FILES_PER_PART rows each), never
    over data rows, so the plan step costs the same at 100 TB as at
    1 GB; the file-stats aggregate underneath is one map-side-combined
    shuffle on (partition, file)."""
    li = load_table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.col("l_returnflag").alias("part_key"),
        (F.col("l_orderkey") % N_FILES_PER_PART).alias("file_id"),
    ).agg((F.count(F.lit(1)) * BYTES_PER_ROW).alias("bytes"))
    w = (
        Window.partitionBy("part_key")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = files.withColumn(
        "grp",
        ((F.sum("bytes").over(w) - F.col("bytes")) / TARGET_BYTES).cast("long"),
    )
    return planned.groupBy("part_key", F.col("grp").alias("group_id")).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("group_bytes"),
    )


# ---------------------------------------------------------------------------
# files_zone_map_skipping
# ---------------------------------------------------------------------------

PRED_LO, PRED_HI = "1994-01-01", "1994-12-31"
N_ZONE_FILES = 64


@query(
    "files_zone_map_skipping",
    oracle=f"""
    WITH hashed AS (
      SELECT l_orderkey % {N_ZONE_FILES} AS file_id,
             min(l_shipdate) AS lo, max(l_shipdate) AS hi
      FROM lineitem GROUP BY 1
    ),
    clustered AS (
      SELECT (year(l_shipdate) * 12 + month(l_shipdate)) AS file_id,
             min(l_shipdate) AS lo, max(l_shipdate) AS hi
      FROM lineitem GROUP BY 1
    ),
    tagged AS (
      SELECT 'hashed' AS layout, * FROM hashed
      UNION ALL SELECT 'clustered', * FROM clustered
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(count(*) FILTER (
             WHERE hi < DATE '{PRED_LO}' OR lo > DATE '{PRED_HI}'
           ) AS BIGINT) AS n_skippable
    FROM tagged GROUP BY layout
    """,
)
def files_zone_map_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout effectiveness diagnostic: build per-file zone maps
    (min/max l_shipdate) under two layouts — ingestion-hash file
    assignment vs shipdate-clustered (what the in-repo Z-order sink
    produces) — and count how many files a one-year predicate could
    skip outright. The answer motivates clustering at 100 TB: hashed
    layouts skip ~nothing because every file spans the full date
    range; clustered layouts skip every out-of-range month. Two
    map-side-combined aggregates to file-count-sized outputs; no
    windows, no joins."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hashed = li.groupBy(
        (F.col("l_orderkey") % N_ZONE_FILES).alias("file_id")
    ).agg(F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi"))
    clustered = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("file_id")
    ).agg(F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi"))
    tagged = hashed.select(F.lit("hashed").alias("layout"), "*").unionByName(
        clustered.select(F.lit("clustered").alias("layout"), "*")
    )
    skippable = (F.col("hi") < F.lit(PRED_LO).cast("date")) | (
        F.col("lo") > F.lit(PRED_HI).cast("date")
    )
    return tagged.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.count(F.when(skippable, 1)).alias("n_skippable"),
    )


# ---------------------------------------------------------------------------
# dedup_exact_keep_best
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_keep_best",
    oracle="""
    WITH normed AS (
      SELECT doc_id, lang, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
      FROM documents
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, h AS text_hash
    FROM normed
    QUALIFY row_number() OVER (
      PARTITION BY h ORDER BY n_chars DESC, doc_id
    ) = 1
    """,
)
def dedup_exact_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup that keeps the BEST record per duplicate group
    (longest text, then lowest doc_id) instead of an arbitrary first —
    the policy real corpus dedup uses so the retained copy is the
    highest-quality one. Expressed as max(struct(quality, -doc_id))
    over the normalized-text hash: an ordinary aggregate, so map-side
    partial aggregation collapses each duplicate group to one candidate
    per input partition BEFORE the exchange — the shuffle carries one
    row per group, not per duplicate. Contrast dedup_exact_keep_first
    (dedup.py:87), which is the min-key policy."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    best = (
        d.select("doc_id", "lang", "n_chars", h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.max(
                F.struct(
                    F.col("n_chars"),
                    (-F.col("doc_id")).alias("neg_id"),
                    F.col("lang"),
                )
            ).alias("m")
        )
    )
    return best.select(
        (-F.col("m.neg_id")).alias("doc_id"),
        F.col("m.lang").alias("lang"),
        F.col("m.n_chars").alias("n_chars"),
        F.col("text_hash"),
    )


# ---------------------------------------------------------------------------
# corpus_lang_drift
# ---------------------------------------------------------------------------


@query(
    "corpus_lang_drift",
    oracle="""
    WITH halves AS (
      SELECT lang, doc_id % 2 AS snap FROM documents
    ),
    per AS (
      SELECT lang,
             count(*) FILTER (WHERE snap = 0) AS n_old,
             count(*) FILTER (WHERE snap = 1) AS n_new
      FROM halves GROUP BY lang
    ),
    tot AS (
      SELECT sum(n_old) AS t_old, sum(n_new) AS t_new FROM per
    )
    SELECT lang, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
           CAST(n_old * 10000 // t_old AS BIGINT) AS old_per_10k,
           CAST(n_new * 10000 // t_new AS BIGINT) AS new_per_10k,
           CAST(abs(n_new * 10000 // t_new - n_old * 10000 // t_old) AS BIGINT)
             AS drift_per_10k
    FROM per, tot
    """,
)
def corpus_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between two corpus snapshots
    (deterministically split by doc_id parity): per-language share in
    parts-per-10k for each snapshot plus the absolute drift — the
    check a training-data pipeline runs before mixing a new crawl into
    the corpus. Integer rate math (x*10000 div total) keeps the hash
    cross-engine-exact. One conditional-count aggregate to a
    language-sized output; the totals are a 1-row cross join broadcast
    back — nothing here scales with corpus size except the first
    map-side-combined scan."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.count(F.when(F.col("doc_id") % 2 == 0, 1)).alias("n_old"),
        F.count(F.when(F.col("doc_id") % 2 == 1, 1)).alias("n_new"),
    )
    tot = per.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    j = per.crossJoin(F.broadcast(tot))
    old_rate = F.expr("n_old * 10000 div t_old")
    new_rate = F.expr("n_new * 10000 div t_new")
    return j.select(
        "lang",
        "n_old",
        "n_new",
        old_rate.alias("old_per_10k"),
        new_rate.alias("new_per_10k"),
        F.abs(new_rate - old_rate).alias("drift_per_10k"),
    )


# ---------------------------------------------------------------------------
# merge_upsert_apply
# ---------------------------------------------------------------------------

# Deterministic change batch derived from orders:
#   keys ≡0 (mod 7): UPDATE  (status -> 'X', price +10)
#   keys ≡1 (mod 7): DELETE
#   synthetic keys max+1..max+500: INSERT


@query(
    "merge_upsert_apply",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
      FROM orders
    ),
    mx AS (SELECT max(o_orderkey) AS mk FROM orders),
    changes AS (
      SELECT o_orderkey, 'U' AS op, 'X' AS new_status,
             round(o_totalprice + 10.00, 2) AS new_price
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 'D', NULL, NULL
      FROM orders WHERE o_orderkey % 7 = 1
      UNION ALL
      SELECT mk + i, 'I', 'N', round(i * 1.25, 2)
      FROM mx, range(1, 501) t(i)
    ),
    merged AS (
      SELECT
        coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
        CASE WHEN c.op IN ('U', 'I') THEN c.new_status
             ELSE b.o_orderstatus END AS status,
        CASE WHEN c.op IN ('U', 'I') THEN c.new_price
             ELSE b.price END AS price
      FROM base b FULL OUTER JOIN changes c USING (o_orderkey)
      WHERE c.op IS NULL OR c.op <> 'D'
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(price), 2) + 0 AS total_price
    FROM merged GROUP BY status
    """,
)
def merge_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a batch operator: apply a change batch
    (updates / deletes / inserts) to a base snapshot in ONE full-outer
    join on the key — the lakehouse upsert that pairs with
    snapshot_diff (detect) and events_cdc_latest_state (compact).
    Both sides shuffle once on the primary key; with bucketed base
    storage the base side's exchange disappears. The summary
    aggregates to status-cardinality rows; sums are round()ed in both
    engines so partial-agg order can't leak into the hash."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status0"),
        F.round("o_totalprice", 2).alias("price0"),
    )
    mk = o.agg(F.max("o_orderkey").alias("mk"))
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("c_key"),
        F.lit("U").alias("op"),
        F.lit("X").alias("new_status"),
        F.round(F.col("o_totalprice") + 10.00, 2).alias("new_price"),
    )
    deletes = o.filter(F.col("o_orderkey") % 7 == 1).select(
        F.col("o_orderkey").alias("c_key"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("new_status"),
        F.lit(None).cast("double").alias("new_price"),
    )
    inserts = (
        spark.range(1, 501)
        .crossJoin(F.broadcast(mk))
        .select(
            (F.col("mk") + F.col("id")).alias("c_key"),
            F.lit("I").alias("op"),
            F.lit("N").alias("new_status"),
            F.round(F.col("id") * 1.25, 2).alias("new_price"),
        )
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    merged = (
        base.join(changes, base.o_orderkey == changes.c_key, "full_outer")
        .filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.when(F.col("op").isin("U", "I"), F.col("new_status"))
            .otherwise(F.col("status0"))
            .alias("status"),
            F.when(F.col("op").isin("U", "I"), F.col("new_price"))
            .otherwise(F.col("price0"))
            .alias("price"),
        )
    )
    return merged.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.round(F.sum("price"), 2) + 0.0).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# ivm_merge_aggregate
# ---------------------------------------------------------------------------


@query(
    "ivm_merge_aggregate",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders WHERE o_orderkey % 10 < 8 GROUP BY 1
    ),
    delta AS (
      SELECT o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders WHERE o_orderkey % 10 >= 8 GROUP BY 1
    ),
    merged AS (
      SELECT coalesce(b.pri, d.pri) AS pri,
             coalesce(b.n, 0) + coalesce(d.n, 0) AS n,
             coalesce(b.cents, 0) + coalesce(d.cents, 0) AS cents
      FROM base b FULL OUTER JOIN delta d ON b.pri = d.pri
    ),
    full_recompute AS (
      SELECT o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    )
    SELECT m.pri, m.n AS n_merged, m.cents AS cents_merged,
           CASE WHEN m.n = f.n AND m.cents = f.cents THEN 1 ELSE 0 END
             AS matches_full
    FROM merged m JOIN full_recompute f ON m.pri = f.pri
    """,
)
def ivm_merge_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: refresh a materialized aggregate
    by MERGING yesterday's partial state with today's delta batch
    instead of recomputing over the full history — the only viable
    refresh policy when history is 100 TB and the delta is gigabytes.
    Works because count/sum are commutative monoids: the merge is a
    full-outer join on the group key + coalesced addition, costing
    O(|state| + |delta|), not O(|history|). The query also recomputes
    from scratch and emits a matches_full bit per group, proving the
    incremental path exact (in integer cents, so no float drift can
    hide in the comparison). At scale only base/delta/merged run —
    the audit recompute is this oracle-pairing's proof obligation."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")

    def agg_of(df):  # mergeable partial state: (count, sum)
        return df.groupBy(F.col("o_orderpriority").alias("pri")).agg(
            F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents")
        )

    base = agg_of(o.filter(F.col("o_orderkey") % 10 < 8))
    delta = agg_of(o.filter(F.col("o_orderkey") % 10 >= 8)).select(
        F.col("pri").alias("d_pri"),
        F.col("n").alias("d_n"),
        F.col("cents").alias("d_cents"),
    )
    merged = base.join(
        delta, base.pri == delta.d_pri, "full_outer"
    ).select(
        F.coalesce("pri", "d_pri").alias("pri"),
        (
            F.coalesce(F.col("n"), F.lit(0))
            + F.coalesce(F.col("d_n"), F.lit(0))
        ).alias("n_merged"),
        (
            F.coalesce(F.col("cents"), F.lit(0))
            + F.coalesce(F.col("d_cents"), F.lit(0))
        ).alias("cents_merged"),
    )
    full = agg_of(o).select(
        F.col("pri").alias("f_pri"),
        F.col("n").alias("f_n"),
        F.col("cents").alias("f_cents"),
    )
    return merged.join(full, merged.pri == full.f_pri).select(
        "pri",
        "n_merged",
        "cents_merged",
        F.when(
            (F.col("n_merged") == F.col("f_n"))
            & (F.col("cents_merged") == F.col("f_cents")),
            1,
        )
        .otherwise(0)
        .alias("matches_full"),
    )


# ANALYZE-style stats for the lineitem table: the 11 physical columns.
_STATS_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]


@query(
    "maintenance_column_stats",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS ndv
        FROM lineitem
        """
        for c in _STATS_COLS
    )
    + "\nORDER BY column_name",
)
def maintenance_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style per-column statistics (row count, null
    count, exact NDV) for the fact table — the numbers a cost-based
    optimizer, a zone-map designer, or a bucketing advisor reads first
    (diagnose_bucket_advisor's input, materialized as a query). Shape:
    ONE aggregate pass computes every column's count/count(col)/
    count_distinct simultaneously (Spark plans multi-distinct via
    expand — still a single scan), then a stack() unpivot emits the
    11-row catalog. At 100 TB swap exact NDV for approx_count_distinct
    per column without changing the output contract (agg_distinct_kmv
    documents the sketch's mergeability)."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _STATS_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{c}"))
        aggs.append(F.count_distinct(c).alias(f"ndv_{c}"))
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nulls_{c}, ndv_{c}" for c in _STATS_COLS
    )
    return (
        one.select(
            "n_rows",
            F.expr(
                f"stack({len(_STATS_COLS)}, {stack_args}) AS (column_name, n_nulls, ndv)"
            ),
        )
        .select(
            "column_name",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_nulls").cast("long").alias("n_nulls"),
            F.col("ndv").cast("long").alias("ndv"),
        )
        .orderBy("column_name")
    )


# Conservative in-memory row-width estimates (bytes) by logical type —
# the planner-style numbers a broadcast decision needs BEFORE reading
# data. Variable-width columns use the catalog's known generator
# bounds; the point is a deterministic, engine-shared constant.
_WIDTHS = {
    "long": 8, "integer": 4, "double": 8, "float": 8, "date": 4,
    "timestamp": 8, "timestamp_ntz": 8, "string": 32, "array": 264,
    "binary": 64,
}
BROADCAST_THRESHOLD_BYTES = 10 * 1024 * 1024  # Spark's default 10 MB


def _est_width(df) -> int:
    return sum(
        _WIDTHS.get(f.dataType.typeName(), 16) for f in df.schema.fields
    )


_ADVISOR_TABLES = (
    "region", "nation", "supplier", "customer", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# Precomputed from the generator's fixed parquet schemas with the
# _WIDTHS map; the Spark side re-derives the width from the LOADED
# schema at plan time and asserts it equals this hint, so a silent
# generator schema drift fails loudly instead of diverging engines.
TABLE_WIDTH_HINTS = {
    "region": 36, "nation": 40, "supplier": 52, "customer": 84,
    "part": 116, "orders": 96, "lineitem": 132, "events": 96,
    "documents": 112, "embeddings": 276,
}


def _duck_advisor_sql() -> str:
    legs = []
    for t in _ADVISOR_TABLES:
        w = TABLE_WIDTH_HINTS[t]
        legs.append(f"""
        SELECT '{t}' AS table_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) * {w} AS BIGINT) AS est_bytes,
               CAST(CASE WHEN count(*) * {w} <= {BROADCAST_THRESHOLD_BYTES}
                    THEN 1 ELSE 0 END AS BIGINT) AS broadcastable
        FROM {t}""")
    return "\nUNION ALL\n".join(legs) + "\nORDER BY table_name"


@query("diagnose_broadcast_advisor", oracle=_duck_advisor_sql())
def diagnose_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-eligibility report across the whole catalog: rows,
    estimated in-memory bytes (schema-derived width constants, the
    planner-style numbers a join strategy needs BEFORE reading data),
    and whether the table fits Spark's default 10 MB broadcast
    threshold — the table you consult before writing F.broadcast() in
    a new query or raising autoBroadcastJoinThreshold on a cluster.
    Ten metadata-cheap count aggregates, unioned; the width constants
    are verified at plan time against the loaded schemas so generator
    drift fails loudly rather than desyncing the oracle."""
    legs = []
    for t in _ADVISOR_TABLES:
        df = load_table(spark, sf_dir, t)
        w = _est_width(df)
        assert w == TABLE_WIDTH_HINTS[t], (t, w, TABLE_WIDTH_HINTS[t])
        legs.append(
            df.agg(F.count(F.lit(1)).alias("n_rows")).select(
                F.lit(t).alias("table_name"),
                F.col("n_rows").cast("long").alias("n_rows"),
                (F.col("n_rows") * w).cast("long").alias("est_bytes"),
                (
                    (F.col("n_rows") * w <= BROADCAST_THRESHOLD_BYTES).cast("long")
                ).alias("broadcastable"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("table_name")


@query(
    "maintenance_partition_skew_report",
    oracle="""
    WITH per_day AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT CAST(n AS BIGINT) AS median_n
      FROM (
        SELECT n, row_number() OVER (ORDER BY n, day) AS rk,
               count(*) OVER () AS tot
        FROM per_day
      ) WHERE rk = (tot + 1) // 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_partitions,
           CAST(sum(n) AS BIGINT) AS total_rows,
           CAST(min(n) AS BIGINT) AS min_rows,
           CAST(max(n) AS BIGINT) AS max_rows,
           CAST(max(median_n) AS BIGINT) AS median_rows,
           CAST(max(n) * 1000000 // max(median_n) AS BIGINT)
             AS max_over_median_ppm,
           CAST(count(*) FILTER (WHERE n > 2 * median_n) AS BIGINT)
             AS n_hot_partitions
    FROM per_day, med
    """,
)
def maintenance_partition_skew_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition-size skew report over the table's natural date
    partitioning — the input to every repartition/salting decision:
    max/median row ratio (a healthy layout sits near 1e6 ppm; 3e6+
    means one straggler partition gates every downstream stage) and
    the count of hot partitions above 2x the median (lower-median
    convention on even counts — identical rank arithmetic in both
    engines). The per-day frame is CALENDAR-bounded, so the exact
    median rides one tiny ordered window, never a data-sized sort;
    the fact table contributes exactly one map-side-combined groupBy.
    At 100 TB this is the report you run BEFORE choosing
    spark.sql.files.maxPartitionBytes / AQE skew thresholds."""
    e = load_table(spark, sf_dir, "events")
    per_day = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_rk = Window.orderBy("n", "day")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        per_day.select(
            "n",
            F.row_number().over(w_rk).alias("rk"),
            F.count(F.lit(1)).over(w_all).alias("tot"),
        )
        .filter(F.expr("rk = (tot + 1) div 2"))
        .select(F.col("n").alias("median_n"))
    )
    return per_day.crossJoin(F.broadcast(med)).agg(
        F.count(F.lit(1)).cast("long").alias("n_partitions"),
        F.sum("n").cast("long").alias("total_rows"),
        F.min("n").cast("long").alias("min_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.max("median_n").cast("long").alias("median_rows"),
        F.expr(
            "CAST(max(n) * 1000000 div max(median_n) AS BIGINT)"
        ).alias("max_over_median_ppm"),
        F.sum((F.col("n") > 2 * F.col("median_n")).cast("long"))
        .cast("long")
        .alias("n_hot_partitions"),
    )
