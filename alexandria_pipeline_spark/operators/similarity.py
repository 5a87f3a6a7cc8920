"""Similarity search over the embeddings table (array<float>, dim 64).

North-star ops (BASELINE.json): brute-force cosine top-k as the exact
baseline, and an IVF-style cluster-pruned variant as the scale path.
Vector math is pure `zip_with`/`aggregate` (JVM codegen, no UDF) from
functions.vectors; a Pandas-UDF variant of the same dot product is
unit-tested for parity in tests/test_functions.py (the slot where a
BLAS batch kernel would go at very high dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.functions.exact import int_div
from alexandria_pipeline_spark.functions.vectors import dot, duck_dot
from alexandria_pipeline_spark.registry import query

TOP_K = 5
QUERY_IDS = (0, 1, 2)
N_CENTROIDS = 8


@query(
    "knn_brute_force",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id IN {QUERY_IDS}
    ),
    scored AS (
      SELECT
        q.query_id,
        e.vec_id AS neighbor_id,
        {duck_dot('q.q_emb', 'e.embedding')} AS score
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, round(score, 6) + 0 AS cos_sim, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id
      ) AS rk
      FROM scored
    )
    WHERE rk <= {TOP_K}
    """,
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN: broadcast the (tiny) query set against the corpus,
    score with a codegen'd dot-product fold, take top-k per query via
    window rank. At scale the broadcast-nested-loop scores N·Q pairs in
    one narrow stage and only k·Q rows survive to the (single) shuffle —
    the standard exact-ANN baseline. Vectors are unit-norm so
    dot == cosine."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot("q_emb", "embedding").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            (F.round("score", 6) + 0.0).alias("cos_sim"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


@query(
    "knn_ivf_pruned",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS c_id, embedding AS c_emb
      FROM embeddings WHERE vec_id < {N_CENTROIDS}
    ),
    assigned AS (
      SELECT vec_id, embedding, c_id AS cluster_id
      FROM (
        SELECT
          e.vec_id, e.embedding, c.c_id,
          row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY {duck_dot('e.embedding', 'c.c_emb')} DESC, c.c_id
          ) AS rn
        FROM embeddings e CROSS JOIN centroids c
      )
      WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS q_emb, cluster_id AS q_cluster
      FROM assigned WHERE vec_id IN {QUERY_IDS}
    ),
    scored AS (
      SELECT
        q.query_id,
        a.vec_id AS neighbor_id,
        a.cluster_id,
        {duck_dot('q.q_emb', 'a.embedding')} AS score
      FROM q JOIN assigned a
        ON a.cluster_id = q.q_cluster AND a.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, CAST(cluster_id AS BIGINT) AS cluster_id,
           round(score, 6) + 0 AS cos_sim, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id
      ) AS rk FROM scored
    )
    WHERE rk <= {TOP_K}
    """,
)
def knn_ivf_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate k-NN: vectors are assigned to the nearest
    of 8 fixed centroids (deterministically seeded as the first 8
    vectors — a stand-in for k-means, which isn't oracle-expressible),
    and each query searches only its own cluster.

    Scale path: centroid assignment is a broadcast NLJ (centroid table
    is always tiny) + argmax window; the search join hits 1/n_clusters
    of the corpus per query. At 100 TB this is the layout you'd persist
    — corpus parquet *bucketed by cluster_id* — so a query reads one
    bucket: partition pruning does the IVF probe."""
    e = load_table(spark, sf_dir, "embeddings")
    c = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("c_score"), F.asc("c_id")
    )
    assigned = (
        e.crossJoin(F.broadcast(c))
        .withColumn("c_score", dot("embedding", "c_emb"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("c_id").alias("cluster_id"))
    )
    q = assigned.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cluster_id").alias("q_cluster"),
    )
    scored = (
        F.broadcast(q)
        .join(
            assigned,
            (assigned.cluster_id == F.col("q_cluster"))
            & (assigned.vec_id != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cluster_id",
            dot("q_emb", "embedding").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("cluster_id").cast("long").alias("cluster_id"),
            (F.round("score", 6) + 0.0).alias("cos_sim"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


NPROBE = 3  # clusters searched per query in the multi-probe variant


@query(
    "knn_ivf_multiprobe",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS c_id, embedding AS c_emb
      FROM embeddings WHERE vec_id < {N_CENTROIDS}
    ),
    assigned AS (
      SELECT vec_id, embedding, c_id AS cluster_id
      FROM (
        SELECT
          e.vec_id, e.embedding, c.c_id,
          row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY {duck_dot('e.embedding', 'c.c_emb')} DESC, c.c_id
          ) AS rn
        FROM embeddings e CROSS JOIN centroids c
      )
      WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id IN {QUERY_IDS}
    ),
    probes AS (
      SELECT query_id, q_emb, c_id AS probe_cluster
      FROM (
        SELECT
          q.query_id, q.q_emb, c.c_id,
          row_number() OVER (
            PARTITION BY q.query_id
            ORDER BY {duck_dot('q.q_emb', 'c.c_emb')} DESC, c.c_id
          ) AS rn
        FROM q CROSS JOIN centroids c
      )
      WHERE rn <= {NPROBE}
    ),
    scored AS (
      SELECT
        p.query_id,
        a.vec_id AS neighbor_id,
        a.cluster_id,
        {duck_dot('p.q_emb', 'a.embedding')} AS score
      FROM probes p JOIN assigned a
        ON a.cluster_id = p.probe_cluster AND a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, CAST(cluster_id AS BIGINT) AS cluster_id,
           round(score, 6) + 0 AS cos_sim, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id
      ) AS rk FROM scored
    )
    WHERE rk <= {TOP_K}
    """,
)
def knn_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF k-NN: each query searches its NPROBE(=3) nearest
    clusters instead of one — the standard recall remedy when true
    neighbors sit just across a Voronoi boundary (single-probe IVF on
    isotropic data recalls ~0.13 here; multi-probe on clustered data
    clears 0.9 — measured in tests/test_similarity_recall.py and
    SCALE.md). Costs nprobe/n_clusters of the corpus per query instead
    of 1/n_clusters.

    Scale shape is unchanged from knn_ivf_pruned: tiny centroid table
    broadcast for assignment; the probe fan-out is a broadcast join of
    (query × nprobe) rows against the cluster-bucketed corpus, so with
    the corpus parquet bucketed by cluster_id a query reads exactly
    nprobe buckets — partition pruning IS the probe."""
    e = load_table(spark, sf_dir, "embeddings")
    c = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("c_score"), F.asc("c_id")
    )
    assigned = (
        e.crossJoin(F.broadcast(c))
        .withColumn("c_score", dot("embedding", "c_emb"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("c_id").alias("cluster_id"))
    )
    q = e.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("p_score"), F.asc("c_id")
    )
    probes = (
        q.crossJoin(F.broadcast(c))
        .withColumn("p_score", dot("q_emb", "c_emb"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= NPROBE)
        .select("query_id", "q_emb", F.col("c_id").alias("probe_cluster"))
    )
    scored = (
        F.broadcast(probes)
        .join(
            assigned,
            (assigned.cluster_id == F.col("probe_cluster"))
            & (assigned.vec_id != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cluster_id",
            dot("q_emb", "embedding").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("cluster_id").cast("long").alias("cluster_id"),
            (F.round("score", 6) + 0.0).alias("cos_sim"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


@query("knn_ivf_kmeans")  # rows-only: k-means training is not SQL-expressible
def knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with REAL trained centroids: Spark ML KMeans (k=8, fixed
    seed) fits on the corpus, vectors are assigned to their cluster,
    and each query searches only its own cluster — the full IVF-Flat
    recipe (Sivic & Zisserman '03 vocabulary trees / FAISS IVF family).

    knn_ivf_pruned is the oracle-checkable twin with formula-seeded
    centroids; this variant shows the MLlib integration (ArrayType ->
    VectorUDT only at the library boundary, back to arrays after).
    Driver check is rows-only; determinism within one Spark version is
    covered by the fixed seed.

    Measured recall vs exact top-5 on the testdata is ~0.13 — expected,
    not a bug: the synthetic vectors are isotropic random, so true
    neighbors scatter across Voronoi cells and single-probe IVF prunes
    most of them. Real embedding corpora cluster (that's why IVF
    works); the scale remedies are multi-probe (search nprobe nearest
    cells) and larger k trained on a sample."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    with_vec = e.withColumn("features", array_to_vector("embedding"))
    model = KMeans(k=N_CENTROIDS, seed=42, featuresCol="features").fit(with_vec)
    assigned = model.transform(with_vec).select(
        "vec_id", "embedding", F.col("prediction").alias("cluster_id")
    )
    q = assigned.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cluster_id").alias("q_cluster"),
    )
    scored = (
        F.broadcast(q)
        .join(
            assigned,
            (assigned.cluster_id == F.col("q_cluster"))
            & (assigned.vec_id != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot("q_emb", "embedding").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            (F.round("score", 6) + 0.0).alias("cos_sim"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


@query(
    "vector_stats",
    oracle=f"""
    SELECT
      vec_id,
      CAST(list_max(embedding) AS DOUBLE)                       AS max_elem,
      CAST(list_position(embedding, list_max(embedding)) AS INT) AS argmax_dim,
      round({duck_dot('embedding', 'embedding')}, 6)            AS sq_norm
    FROM embeddings
    """,
)
def vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector analytics: max element, its (first) dimension, and
    squared L2 norm — all codegen array expressions; argmax ties break
    to the first occurrence in both engines."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.array_max("embedding").cast("double").alias("max_elem"),
        F.array_position(F.col("embedding"), F.array_max("embedding"))
        .cast("int")
        .alias("argmax_dim"),
        F.round(dot("embedding", "embedding"), 6).alias("sq_norm"),
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH m AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))) AS max_abs
      FROM embeddings
    )
    SELECT vec_id, max_abs,
           array_to_string(list_transform(embedding,
             x -> CAST(CAST(round(CAST(x AS DOUBLE) * 127.0 / max_abs) AS INT)
                       AS VARCHAR)), ',')
             AS emb_q,
           CAST(list_sum(list_transform(embedding,
             x -> abs(CAST(round(CAST(x AS DOUBLE) * 127.0 / max_abs) AS BIGINT))))
             AS BIGINT) AS l1_q
    FROM m
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (scale = 127/max|x|) —
    the standard ANN-index compression step (4x memory, SIMD int8 dot
    products downstream). Map-only: no shuffle, no UDF; both engines
    evaluate the identical double expression per element, and round()
    on continuous values is cross-engine safe (never lands on exact
    halves — unlike quotients of small ints, see functions/exact.py).
    l1_q is an exact-int checksum of the quantized vector. The int8
    vector is emitted as a comma-joined string: integer→string renders
    identically in every engine (no float-format hazard) and keeps the
    query output scalar-only for canonicalizers."""
    e = load_table(spark, sf_dir, "embeddings")
    max_abs = F.array_max(
        F.transform("embedding", lambda x: F.abs(x.cast("double")))
    )
    with_m = e.select("vec_id", "embedding", max_abs.alias("max_abs"))
    emb_q = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * 127.0 / F.col("max_abs")).cast("int"),
    )
    return with_m.select(
        "vec_id",
        "max_abs",
        F.array_join(F.transform(emb_q, lambda q: q.cast("string")), ",").alias(
            "emb_q"
        ),
        F.aggregate(
            emb_q,
            F.lit(0).cast("long"),
            lambda acc, q: acc + F.abs(q.cast("long")),
        ).alias("l1_q"),
    )


RRF_CANDIDATES = 200  # per-leg candidate pool — constant, not corpus-sized


@query(
    "hybrid_search_rrf",
    oracle=f"""
    WITH kw_cand AS (
      SELECT doc_id, kw_score
      FROM (
        SELECT doc_id,
               3 * len(list_filter(string_split(text, ' '), x -> x = 'data'))
             + 2 * len(list_filter(string_split(text, ' '), x -> x = 'spark'))
             +     len(list_filter(string_split(text, ' '), x -> x = 'table'))
               AS kw_score
        FROM documents
      ) scored_kw
      ORDER BY kw_score DESC, doc_id
      LIMIT {RRF_CANDIDATES}
    ),
    kw AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY kw_score DESC, doc_id) AS INT)
               AS kw_rk
      FROM kw_cand
    ),
    qv AS (
      SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0
    ),
    vec_cand AS (
      SELECT vec_id, {duck_dot('embedding', 'q_emb')} AS score
      FROM embeddings CROSS JOIN qv
      ORDER BY score DESC, vec_id
      LIMIT {RRF_CANDIDATES}
    ),
    vec AS (
      SELECT vec_id,
             CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS INT)
               AS vec_rk
      FROM vec_cand
    )
    SELECT COALESCE(kw.doc_id, vec.vec_id) AS doc_id, kw_rk, vec_rk,
           CAST(COALESCE(1000000 // (60 + kw_rk), 0)
              + COALESCE(1000000 // (60 + vec_rk), 0) AS BIGINT)
             AS rrf_micro
    FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.vec_id
    ORDER BY rrf_micro DESC, doc_id
    LIMIT 20
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: weighted keyword term-frequency ranking fused
    with vector-similarity ranking by Reciprocal Rank Fusion
    (1/(60+rank), the standard RRF constant). The fused score is kept
    in exact integer micro-units (1e6 // (60+rk)) — unit fractions
    would otherwise be float quotients of small ints, the classic
    cross-engine rounding trap.

    Scale shape: each leg first takes its top-N candidates (N=200)
    via orderBy+limit, which Spark plans as TakeOrderedAndProject —
    per-partition top-k merged on one node, NO corpus-sized global
    sort. Only the ≤N candidate rows pass through a rank window, so
    the single-partition window input is constant-bounded. Fusion is
    a full-outer join of the two candidate lists: a doc missing from
    one leg's pool contributes 0 from that leg — the standard
    candidate-set RRF semantics at scale (a doc outside both pools
    can't reach the fused top-20 anyway)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")

    toks = F.split("text", " ")

    def tf(term: str) -> F.Column:
        return F.size(F.filter(toks, lambda x: x == term))

    kw_score = (3 * tf("data") + 2 * tf("spark") + tf("table")).alias("kw_score")
    kw_cand = (
        d.select("doc_id", kw_score)
        .orderBy(F.desc("kw_score"), "doc_id")
        .limit(RRF_CANDIDATES)
    )
    w_kw = Window.orderBy(F.desc("kw_score"), "doc_id")
    kw = kw_cand.withColumn("kw_rk", F.row_number().over(w_kw).cast("int")).select(
        "doc_id", "kw_rk"
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    vec_cand = (
        e.crossJoin(F.broadcast(qv))
        .select("vec_id", dot("embedding", "q_emb").alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(RRF_CANDIDATES)
    )
    w_vec = Window.orderBy(F.desc("score"), "vec_id")
    vec = vec_cand.withColumn(
        "vec_rk", F.row_number().over(w_vec).cast("int")
    ).select("vec_id", "vec_rk")
    rrf = F.coalesce(
        int_div(F.lit(1000000), F.lit(60) + F.col("kw_rk")), F.lit(0)
    ) + F.coalesce(int_div(F.lit(1000000), F.lit(60) + F.col("vec_rk")), F.lit(0))
    return (
        kw.join(vec, kw.doc_id == vec.vec_id, "full_outer")
        .select(
            F.coalesce(kw.doc_id, vec.vec_id).alias("doc_id"),
            "kw_rk",
            "vec_rk",
            rrf.cast("long").alias("rrf_micro"),
        )
        .orderBy(F.desc("rrf_micro"), "doc_id")
        .limit(20)
    )
