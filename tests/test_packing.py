"""Packing-operator tests: bin-assignment invariants on a crafted
corpus (capacity boundaries actually crossed), content-hash split
stability under duplication and re-sharding, and the plan shapes the
packing queries promise (bounded window partitions, broadcast totals,
map-side-only tagging)."""

from __future__ import annotations

from pyspark.sql import functions as F

from alexandria_pipeline_spark import QUERIES
from alexandria_pipeline_spark.functions.text import rolling_fingerprint
from alexandria_pipeline_spark.operators.packing import (
    PACK_BUCKETS,
    PACK_CAPACITY,
)
from alexandria_pipeline_spark.plans.explain import formatted_plan

from tests.conftest import SF_SMOKE


def test_pack_bins_conserve_docs_and_tokens(spark):
    """Packing must move no document and drop no token: totals across
    bins equal totals across the corpus, and within every (lang,
    bucket) stream the bin ids form a dense 0..max range (contiguous
    fill can skip a bin only if a document were lost)."""
    from alexandria_pipeline_spark.catalog import load_table

    out = QUERIES["pack_sequences_contiguous"](spark, SF_SMOKE)
    d = load_table(spark, SF_SMOKE, "documents")
    n_docs, n_toks = d.select(
        F.count(F.lit(1)), F.sum(F.size(F.split("text", " ")))
    ).first()
    got_docs, got_toks = out.select(
        F.sum("n_docs"), F.sum("bin_tokens")
    ).first()
    assert (got_docs, got_toks) == (n_docs, n_toks)

    for lang, bucket, bins in (
        out.groupBy("lang", "bucket")
        .agg(F.sort_array(F.collect_list(F.struct("bin_id", "bin_tokens"))).alias("b"))
        .collect()
    ):
        ids = [r.bin_id for r in bins]
        assert ids == list(range(len(ids))), (lang, bucket, ids)
        assert all(r.bin_tokens > 0 for r in bins)


def test_pack_bin_boundaries_on_crafted_stream(spark):
    """Five 200-token docs at capacity 512: prefixes 0,200,400,600,800
    → bins 0,0,0,1,1. Exercises the exact boundary arithmetic the
    oracle re-derives."""
    rows = [(i, "w " * 199 + "w") for i in range(5)]  # 200 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pyspark.sql import Window

    from alexandria_pipeline_spark.functions.exact import int_div

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    n_tok = F.size(F.split("text", " ")).cast("long")
    got = (
        df.select(
            "doc_id",
            int_div(
                F.coalesce(F.sum(n_tok).over(w), F.lit(0)),
                F.lit(PACK_CAPACITY),
            ).alias("bin_id"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r.bin_id for r in got] == [0, 0, 0, 1, 1]


def test_split_is_content_addressed(spark):
    """Byte-identical texts must land in the same split regardless of
    doc_id — the anti-leakage property the row-number split lacks."""
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(50)]
        + [(1000 + i, f"unique doc number {i} text body") for i in range(50)],
        "doc_id long, text string",
    )
    slot = rolling_fingerprint(F.split("text", " ")) % 100
    got = df.select("text", slot.alias("slot")).distinct().groupBy("text").count()
    assert got.filter(F.col("count") > 1).count() == 0


def test_split_fractions_roughly_90_5_5(spark):
    out = {
        r.split: r.n
        for r in QUERIES["split_train_eval_hash"](spark, SF_SMOKE)
        .groupBy("split")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    }
    total = sum(out.values())
    assert set(out) <= {"train", "val", "test"}
    assert out["train"] / total > 0.7  # fingerprints are not uniform-perfect at tiny SF


def test_pack_window_never_single_partition(spark):
    plan = formatted_plan(QUERIES["pack_sequences_contiguous"](spark, SF_SMOKE))
    assert "SinglePartition" not in plan, plan


def test_mix_weights_totals_broadcast(spark):
    plan = formatted_plan(QUERIES["corpus_mix_weights"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_split_tagging_is_map_side(spark):
    """The only Exchange in the split plan feeds the final small
    groupBy — the fingerprint tagging itself must not shuffle."""
    plan = formatted_plan(QUERIES["split_train_eval_hash"](spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_mix_apply_weights_broadcast_onto_fact(spark):
    """The weight table joins the fact scan via broadcast — the corpus
    is never shuffled to meet a table whose cardinality is n_langs."""
    plan = formatted_plan(QUERIES["corpus_mix_apply"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan


def test_mix_apply_never_keeps_more_than_orig(spark):
    for r in QUERIES["corpus_mix_apply"](spark, SF_SMOKE).collect():
        assert 0 <= r.kept_docs <= r.orig_docs
        assert r.keep_ppm <= 1_000_000


def test_mix_weights_sum_to_one_million(spark):
    out = QUERIES["corpus_mix_weights"](spark, SF_SMOKE).collect()
    share = sum(r.share_ppm for r in out)
    assert 1_000_000 - len(out) <= share <= 1_000_000  # truncation loses < 1 ppm per lang
