"""The reference's pipeline semantics, re-expressed as lazy Spark plans.

Covers SURVEY §3's three entry points:
  3.1 run.py        -> embed_documents (scan → project → embed UDF)
  3.2 run_extra.py  -> chunk_embed_pool (split → chunk → embed → pool)
  3.3 process.py    -> merge_embeddings (J1 join + M9 scaled concat),
                       missing_docs_anti_join (J2 done key-based),
                       embedding_weighted_mean (M8/A2 grouped pooling)

The documents table stands in for arxiv2M.parquet (FIXTURES.md A1);
the deterministic featurizer stands in for InstructorXL (M7) so every
value is oracle-checkable. The real-model slot is
functions.featurizer.embed_pandas_udf (same interface).

Scale notes: the only shuffles are the explode→groupBy pooling (§3.2,
inherent to the semantics) and merge joins keyed on doc_id. The
reference instead materialized the whole corpus in pandas per loader
worker (run.py:20-21, ×4 processes) and zipped shards positionally
(process.py:123) — here everything is keyed, partitioned, and lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from alexandria_pipeline_spark.catalog import load_table, spread_to_cores
from alexandria_pipeline_spark.functions.exact import int_div
from alexandria_pipeline_spark.functions.featurizer import (
    FEATURE_DIM,
    duck_featurize,
    featurize,
)
from alexandria_pipeline_spark.registry import query

CHUNK_TOKENS = 16  # run_extra.py:64-71 chunks at 512 model tokens; 16 here
TITLE_WEIGHT = 0.2  # process.py:119
TITLE_TOKENS = 8  # "title" stand-in = first 8 tokens of the doc


# --------------------------------------------------------------------------
# §3.1  run.py — scan → project/rename → embed → (sink)
# --------------------------------------------------------------------------
@query(
    "embed_documents",
    oracle=f"""
    SELECT doc_id, CAST(d AS INT) AS dim, emb[d] AS value
    FROM (SELECT doc_id, {duck_featurize('text')} AS emb FROM documents)
    CROSS JOIN LATERAL (SELECT unnest(range(1, {FEATURE_DIM} + 1)) AS d)
    """,
)
def embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """run.py:126-156 as one lazy plan: parquet scan (column-pruned to
    doc_id,text) → featurize. No shuffle at all — embarrassingly
    parallel over parquet splits, which is why the reference's 2.25M-row
    job becomes a single narrow stage here.

    Output is exploded to one (doc_id, dim, value) row per element:
    registered queries never emit array columns (harness canonicalizers
    sort/hash outputs and choke on lists); the array-valued form is
    the internal API (`featurize`), this is the exchange format."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", featurize("text").alias("emb"))
        .select("doc_id", F.posexplode("emb").alias("dim0", "value"))
        .select("doc_id", (F.col("dim0") + 1).cast("int").alias("dim"), "value")
    )


# --------------------------------------------------------------------------
# §3.2  run_extra.py — sentence/chunk split → per-chunk embed → pooling
# --------------------------------------------------------------------------
@query(
    "chunk_embed_pool",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ),
    chunks AS (
      SELECT
        doc_id,
        CAST(i AS INT) AS chunk_idx,
        array_to_string(tokens[i * {CHUNK_TOKENS} + 1 : (i + 1) * {CHUNK_TOKENS}], ' ') AS chunk_text
      FROM toks
      CROSS JOIN LATERAL (
        SELECT unnest(range(0, CAST(ceil(len(tokens) / {CHUNK_TOKENS}.0) AS BIGINT))) AS i
      )
    ),
    feats AS (
      SELECT
        doc_id,
        CAST(len(string_split(chunk_text, ' ')) AS DOUBLE) AS w,
        {duck_featurize('chunk_text')} AS f
      FROM chunks
    ),
    dims AS (
      SELECT doc_id, CAST(d AS INT) AS dim, CAST(w AS BIGINT) AS w,
             CAST(round(f[d] * 1000000) AS BIGINT) AS x_e6
      FROM feats CROSS JOIN LATERAL (SELECT unnest(range(1, {FEATURE_DIM} + 1)) AS d)
    ),
    pooled AS (
      SELECT doc_id, dim,
             CAST(sum(w * x_e6) // (100 * sum(w)) AS BIGINT) / 10000.0 AS v
      FROM dims GROUP BY doc_id, dim
    )
    SELECT doc_id, dim, v FROM pooled
    """,
)
def chunk_embed_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """run_extra.py:50-87 re-expressed: token-window chunking (M5) →
    explode → per-chunk featurize (M7) → token-count-weighted mean
    pooling (M8, np.average analog run_extra.py:46-48) → reassemble.

    Plan shape: chunking is a narrow transform (no pre-explode
    shuffle); the weighted mean runs as posexplode(8 dims) →
    partial+final agg on (doc_id, dim). Per-doc state is O(dim), never
    O(chunks), which is what keeps a 100 TB corpus poolable. Output is
    the pooled (doc_id, dim, v) rows directly — no array column leaves
    a registered query, and skipping the per-doc reassembly groupBy
    drops a whole shuffle from the plan."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tokens"))
    n_chunks = F.ceil(F.size("tokens") / F.lit(float(CHUNK_TOKENS)))
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks.cast("int") - 1),
                lambda i: F.struct(
                    i.cast("int").alias("chunk_idx"),
                    F.array_join(
                        F.slice(F.col("tokens"), i * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
                    ).alias("chunk_text"),
                ),
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.chunk_idx"), F.col("c.chunk_text"))
    feats = chunks.select(
        "doc_id",
        F.size(F.split("chunk_text", " ")).cast("double").alias("w"),
        featurize("chunk_text").alias("f"),
    )
    # Weighted mean in exact int64 at 1e-6 resolution, truncated to 4
    # decimals — round(sum(w*x)/sum(w), 4) lands on exact round-half
    # boundaries ~1/(50·W) of the time (S sits on the 1e-6 grid), where
    # the engines' round() implementations disagree (functions.exact).
    dims = feats.select(
        "doc_id",
        F.col("w").cast("long").alias("w"),
        F.posexplode("f").alias("dim0", "x"),
    ).select(
        "doc_id",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        "w",
        F.round(F.col("x") * 1_000_000, 0).cast("long").alias("x_e6"),
    )
    return dims.groupBy("doc_id", "dim").agg(
        (
            int_div(F.sum(F.col("w") * F.col("x_e6")), 100 * F.sum("w")) / 10_000.0
        ).alias("v")
    )


# --------------------------------------------------------------------------
# §3.3  process.py — aligned merge + anti-join reconciliation
# --------------------------------------------------------------------------
@query(
    "merge_embeddings",
    oracle=f"""
    WITH titles AS (
      SELECT doc_id,
             {duck_featurize(f"array_to_string(string_split(text, ' ')[1:{TITLE_TOKENS}], ' ')")} AS emb
      FROM documents
    ),
    abstracts AS (
      SELECT doc_id, {duck_featurize('text')} AS emb FROM documents
    )
    SELECT doc_id, CAST(d AS INT) AS dim, merged[d] AS value
    FROM (
      SELECT
        t.doc_id AS doc_id,
        list_transform(
          list_concat(
            list_transform(t.emb, x -> x * {TITLE_WEIGHT!r}),
            list_transform(a.emb, x -> x * {1 - TITLE_WEIGHT!r})
          ), x -> round(x, 6)
        ) AS merged
      FROM titles t JOIN abstracts a ON t.doc_id = a.doc_id
    )
    CROSS JOIN LATERAL (SELECT unnest(range(1, 2 * {FEATURE_DIM} + 1)) AS d)
    """,
)
def merge_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """process.py:119-129's M9 scaled concat:
    concat(title*0.2, abstract*0.8) doubles the dim (process.py:126),
    replacing the positional zip whose alignment assert was
    tautological (process.py:21-23). 'title' = first 8 tokens,
    'abstract' = full text — BOTH embeddings derive from the same row
    of the same scan, so the plan is one map-only pass with zero
    joins. (An earlier form self-joined the two projections on doc_id;
    at scale that shuffles a fact table against itself to recombine
    columns that never left the row. The genuinely two-source keyed
    merge — J1 — is exercised by embed_prompt_pairs and the
    join_alignment_check/missing_docs_anti_join queries.)

    Plan shape matters here: the scale/round merge happens AFTER the
    posexplode, on the generated scalar, never on the arrays. Wrapping
    featurize() in F.transform HOFs re-evaluated the title expression
    per element (interpreted HOFs don't subexpression-eliminate), and
    an element_at unrolling triggered SimplifyExtractValueOps to
    inline the whole featurize tree once per dim (405 split() nodes in
    the optimized plan). Exploding concat(t_emb, a_emb) first makes
    the Generate node evaluate each featurize exactly once per row —
    nothing downstream can duplicate it. Output is (doc_id, dim,
    value) rows — registered queries emit scalar columns only.

    The scan is spread_to_cores'd (r10): the double featurize +
    2*FEATURE_DIM-row Generate is the per-row CPU the byte-sized
    partition knobs can't see, and the fixture's single-row-group
    parquet scans as ONE task — measured 9.6 -> 4.1 s at sf1 (and
    1.25 -> 0.75 s warm at sf0.1). On a real multi-file input the
    spread is a no-op (plan-time partition-count gate)."""
    d = spread_to_cores(load_table(spark, sf_dir, "documents"))
    title_text = F.array_join(
        F.slice(F.split("text", " "), 1, TITLE_TOKENS), " "
    )
    raw = d.select(
        "doc_id",
        F.posexplode(
            F.concat(featurize(title_text), featurize("text"))
        ).alias("dim0", "rawval"),
    )
    weight = F.when(
        F.col("dim0") < FEATURE_DIM, F.lit(TITLE_WEIGHT)
    ).otherwise(F.lit(1 - TITLE_WEIGHT))
    return raw.select(
        "doc_id",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        F.round(F.col("rawval") * weight, 6).alias("value"),
    )


@query(
    "missing_docs_anti_join",
    oracle="""
    SELECT d.doc_id, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents p
      WHERE p.n_chars <= 384 AND p.doc_id = d.doc_id
    )
    """,
)
def missing_docs_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/U2: raw − processed via a true key-based left-anti join. The
    reference's find_and_save_missing_dois (process.py:69-117) compares
    positionally and mislabels everything after one gap (SURVEY §4.3.4);
    a keyed anti-join is order-independent and shuffle-partitioned on
    the key at scale."""
    d = load_table(spark, sf_dir, "documents")
    processed = d.filter(F.col("n_chars") <= 384).select("doc_id")
    return d.join(processed, "doc_id", "left_anti").select("doc_id", "n_chars")


@query(
    "embedding_weighted_mean",
    oracle="""
    WITH dims AS (
      SELECT
        label,
        CAST(d AS INT)                      AS dim,
        CAST(vec_id % 7 + 1 AS BIGINT)      AS w,
        CAST(round(CAST(embedding[d] AS DOUBLE) * 1000000) AS BIGINT) AS x_e6
      FROM embeddings
      CROSS JOIN LATERAL (SELECT unnest(range(1, 65)) AS d)
    ),
    pooled AS (
      SELECT label, dim,
             CAST(sum(w * x_e6) // (100 * sum(w)) AS BIGINT) / 10000.0 + 0 AS v
      FROM dims GROUP BY label, dim
    )
    SELECT label, dim, v FROM pooled
    """,
)
def embedding_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8/A2 over the embeddings table: per-label weighted elementwise
    mean (weight = deterministic vec_id%7+1, standing in for chunk
    length run_extra.py:47). posexplode → two-level agg keeps per-group
    state at O(dim) — the pattern that pools 10^9 chunk vectors without
    collecting any group into memory. Output stays in the exploded
    (label, dim, v) exchange format — scalar columns only."""
    e = load_table(spark, sf_dir, "embeddings")
    # Values quantized to 1e-6 per element, pooled in exact int64 with
    # truncating division (see chunk_embed_pool / functions.exact for
    # the round-half rationale). +0.0 still normalizes signed zero.
    dims = e.select(
        "label",
        ((F.col("vec_id") % 7) + 1).cast("long").alias("w"),
        F.posexplode("embedding").alias("dim0", "xf"),
    ).select(
        "label",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        "w",
        F.round(F.col("xf").cast("double") * 1_000_000, 0).cast("long").alias("x_e6"),
    )
    return dims.groupBy("label", "dim").agg(
        (
            int_div(F.sum(F.col("w") * F.col("x_e6")), 100 * F.sum("w")) / 10_000.0
            + 0.0
        ).alias("v")
    )


# --------------------------------------------------------------------------
# §2.10 grouped-map (applyInPandas) face of the pooling UDAF — same
# semantics as chunk_embed_pool's built-in aggregation, for workloads
# where the pooling math needs numpy (reference: np.average,
# run_extra.py:46-48). Parity asserted in tests/test_jobs.py.
# --------------------------------------------------------------------------
def pool_embeddings_pandas(chunk_feats: DataFrame) -> DataFrame:
    """Length-weighted mean pooling via applyInPandas over doc_id
    groups. Input schema: (doc_id long, w double, f array<double>).

    The grouped-map form holds ONE document's chunks in memory per
    group (bounded by max chunks/doc, not corpus size) and runs real
    numpy — the escape hatch for pooling math the built-in aggregate
    DSL can't express (e.g. attention-weighted pooling). For plain
    weighted means the built-in two-level aggregate in chunk_embed_pool
    is preferred: no Python workers in the path."""
    import numpy as np
    import pandas as pd

    def pool(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf["f"].to_numpy())
        pooled = np.average(mat, axis=0, weights=pdf["w"].to_numpy())
        return pd.DataFrame(
            {"doc_id": [pdf["doc_id"].iloc[0]], "embedding": [pooled.tolist()]}
        )

    return chunk_feats.groupBy("doc_id").applyInPandas(
        pool, "doc_id long, embedding array<double>"
    )


@query(
    "embed_prompt_pairs",
    oracle="""
    SELECT
      doc_id,
      'Represent the document for retrieval:' AS prompt,
      text AS content,
      len(string_split(text, ' ')) AS n_tokens
    FROM documents
    """,
)
def embed_prompt_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 prompt-prefix constructor (run.py:139 wraps each text as
    [PROMPT, content]; prompts per type run.py:84-92). The instruction
    pair is the model-input IR the embedding UDF consumes; emitted as
    two scalar columns (prompt, content) — the array form is assembled
    inside the UDF, never in a registered query's output."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("Represent the document for retrieval:").alias("prompt"),
        F.col("text").alias("content"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )


@query("sharded_sink_roundtrip")  # rows-only: side-effecting sink op
def sharded_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6 as a driver-visible op: embed → sharded parquet sink
    (maxRecordsPerFile, the 100k-rows/shard contract process.py:55) →
    read back. Returns per-shard-file row counts, proving the cap and
    the data-encoded ordering (no filename parsing — §2.1 S3 note)."""
    import tempfile

    from alexandria_pipeline_spark.sources.parquet import write_sharded

    d = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="apspark_q_shards_")
    result = d.select("doc_id", featurize("text").alias("embedding"))
    write_sharded(result, out, rows_per_shard=200, order_col="doc_id")
    back = spark.read.parquet(out)
    return (
        back.groupBy("shard_id")
        .count()
        .select("shard_id", F.col("count").alias("rows_in_shard"))
    )


@query(
    "corpus_curation_funnel",
    oracle="""
    WITH quality AS (
      SELECT doc_id, lang,
             array_to_string(string_split(text, ' ')[1:10], ' ') AS prefix_key
      FROM documents
      WHERE len(list_distinct(string_split(text, ' '))) * 2 >= len(string_split(text, ' '))
        AND len(string_split(text, ' ')) >= 32
    ),
    deduped AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY prefix_key ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    )
    SELECT
      d.lang,
      count(*)                                                        AS n_total,
      (SELECT count(*) FROM quality q WHERE q.lang = d.lang)          AS n_quality,
      (SELECT count(*) FROM deduped x WHERE x.lang = d.lang)          AS n_curated
    FROM documents d
    GROUP BY d.lang
    """,
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation story in one plan — what this engine is
    FOR: raw corpus -> quality gate (lexical diversity >= 0.5 and
    length >= 32 tokens, the C4/Gopher-style rules) -> near-dup
    removal (keep-first on the content prefix key) -> per-language
    survivor counts at each stage. Narrow filters, then one window
    shuffle on the dedup key, then a grouped count: the whole funnel
    is two exchanges regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    quality = d.filter(
        (F.size(F.array_distinct(toks)) * 2 >= F.size(toks)) & (F.size(toks) >= 32)
    ).select(
        "doc_id",
        "lang",
        F.array_join(F.slice(toks, 1, 10), " ").alias("prefix_key"),
    )
    w = Window.partitionBy("prefix_key").orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
    )
    totals = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    n_q = quality.groupBy("lang").agg(F.count(F.lit(1)).alias("n_quality"))
    n_c = deduped.groupBy("lang").agg(F.count(F.lit(1)).alias("n_curated"))
    return (
        totals.join(n_q, "lang", "left")
        .join(n_c, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_curated", F.lit(0)).alias("n_curated"),
        )
    )


# --------------------------------------------------------------------------
CHUNK_WINDOW_TOKENS = 32
CHUNK_STRIDE_TOKENS = 24  # 8-token overlap between consecutive chunks


@query(
    "doc_chunk_overlap_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(i * {CHUNK_STRIDE_TOKENS} AS BIGINT) AS start_tok,
           array_to_string(
             t[i * {CHUNK_STRIDE_TOKENS} + 1 :
               i * {CHUNK_STRIDE_TOKENS} + {CHUNK_WINDOW_TOKENS}], ' '
           ) AS chunk_text
    FROM toks
    CROSS JOIN LATERAL (
      SELECT unnest(range(0, (n - 1) // {CHUNK_STRIDE_TOKENS} + 1)) AS i
    )
    """,
)
def doc_chunk_overlap_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking WITH OVERLAP — the RAG-prep primitive
    (window 32 tokens, stride 24, so consecutive chunks share 8
    tokens and no boundary sentence is ever lost to a hard cut;
    chunk_embed_pool's disjoint split is the no-overlap special
    case). Map-only: tokenize once, explode one start-offset per
    stride via sequence(), slice the token array per window. The
    explode fan-out is n_toks/stride ≈ 1.04 rows per 24 input tokens
    — linear, no shuffle, payload text never leaves its partition.
    Chunk ids are (doc_id, chunk_idx), reproducible across engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select(
        "doc_id", toks.alias("t"), F.size(toks).alias("n")
    )
    starts = F.explode(
        F.sequence(
            F.lit(0),
            F.floor((F.col("n") - 1) / CHUNK_STRIDE_TOKENS).cast("int"),
        )
    ).alias("i")
    return base.select("doc_id", "t", starts).select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        (F.col("i").cast("long") * CHUNK_STRIDE_TOKENS).alias("start_tok"),
        F.array_join(
            F.slice(
                "t",
                F.col("i") * CHUNK_STRIDE_TOKENS + 1,
                F.lit(CHUNK_WINDOW_TOKENS),
            ),
            " ",
        ).alias("chunk_text"),
    )
