"""Bloom-join primitives: the filter must be false-negative-free (every
inserted key probes true) and actually selective (most absent keys
probe false at the sized m/k/n operating point)."""

from __future__ import annotations

from pyspark.sql import functions as F

from alexandria_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
)


def test_bloom_no_false_negatives_and_selective(spark):
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k")

    probes = spark.range(0, 4000).select(F.col("id").alias("k"))
    hit = (
        probes.join(F.broadcast(bloom))
        .select("k", bloom_might_contain(F.col("k"), F.col("bloom")).alias("hit"))
    )
    present = hit.filter((F.col("k") < 2000) & ~F.col("hit")).count()
    assert present == 0, f"{present} false negatives — structurally impossible"

    # 2000 absent keys, m=2^20, k=3, n=2000 -> fp rate ~(nk/m)^k ~ 2e-7;
    # allow a generous margin.
    fp = hit.filter((F.col("k") >= 2000) & F.col("hit")).count()
    assert fp <= 20, f"false-positive rate too high: {fp}/2000"


def test_bloom_filter_is_compact(spark):
    """The broadcast payload is bounded by m/64 words regardless of
    key count — the whole point vs broadcasting the key set."""
    from alexandria_pipeline_spark.operators.bloom import BLOOM_BITS

    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    row = bloom_build(keys, "k").collect()[0]
    assert len(row["bloom"]) <= BLOOM_BITS // 64
