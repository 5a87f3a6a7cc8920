"""Persist-lifecycle contract (r7 verdict #4).

Sketch-style queries persist intermediates (MinHash signatures,
adjacency frames, exploded shingle indexes) that the RETURNED
DataFrame still references, so the query body cannot unpersist them
itself. The registry's scoped_persist/release_persisted pair is the
contract: every such frame is recorded at persist time and released
by the materializing caller after each query's action. These tests
prove the contract actually keeps executor storage flat — the failure
mode it closes is a service-style session whose storage memory grows
monotonically with every dedup/graph query it serves.
"""

from __future__ import annotations

from alexandria_pipeline_spark import QUERIES
from alexandria_pipeline_spark.registry import _SCOPED, release_persisted
from tests.conftest import SF_SMOKE

# Queries that exercise scoped_persist (dedup + graph sketch family)
# plus self-managed-lifecycle siblings (iterative ops that rotate
# their own caches) — 20 consecutive materializations, the verdict's
# done-bar scenario.
FAMILY = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_jaccard_estimate",
    "dedup_threshold_sensitivity",
    "dedup_lsh_recall_eval",
    "dedup_connected_components",
    "dedup_incremental_minhash",
    "dedup_exact_keep_first",
    "graph_pagerank_copurchase",
    "graph_triangle_count",
    "graph_jaccard_neighbors",
    "graph_degree_distribution",
    "graph_kcore_summary",
    "dedup_token_savings",
    "dedup_cluster_size_histogram",
    "dedup_exact_keep_best",
    "dedup_passage_level",
    "dedup_incremental_antijoin",
]


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_storage_flat_across_20_consecutive_queries(spark):
    """Run 20 dedup/graph-family queries back to back with the caller
    contract (materialize, then release_persisted) and assert cached
    RDD count returns to the baseline after EVERY query — i.e. session
    storage does not grow monotonically across a long run."""
    spark.catalog.clearCache()
    release_persisted()
    baseline = _n_cached(spark)
    for name in FAMILY:
        assert name in QUERIES, name
        QUERIES[name](spark, SF_SMOKE).count()
        release_persisted()
        after = _n_cached(spark)
        assert after <= baseline, (
            f"{name}: {after} cached RDDs outlive release "
            f"(baseline {baseline}) — persist leak"
        )
    assert not _SCOPED


def test_release_is_idempotent_and_safe_before_materialization(spark):
    """release_persisted on a never-materialized plan must not break
    the plan: the frames are simply recomputed when the caller finally
    acts. Also: double release is a no-op."""
    spark.catalog.clearCache()
    release_persisted()
    df = QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE)
    n_scoped = release_persisted()
    assert n_scoped >= 1  # the signature/docs sketches were recorded
    assert release_persisted() == 0
    # the plan still evaluates correctly post-release (recompute path)
    assert df.count() >= 0


def test_scoped_queries_record_their_sketches(spark):
    """Every converted call site actually routes through the scope:
    building (not running) each sketch query must add >=1 scoped frame."""
    for name in (
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "graph_pagerank_copurchase",
        "graph_triangle_count",
        "graph_jaccard_neighbors",
    ):
        release_persisted()
        QUERIES[name](spark, SF_SMOKE)
        assert release_persisted() >= 1, f"{name} no longer scopes its persists"
    spark.catalog.clearCache()
