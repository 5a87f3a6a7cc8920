"""Custom Python DataSource: partitioned distributed reads with
retry-stable output, and composition with the rest of the engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from alexandria_pipeline_spark.functions.featurizer import featurize
from alexandria_pipeline_spark.sources.custom_source import SyntheticDocsSource


def _read(spark, rows=2000, parts=8):
    spark.dataSource.register(SyntheticDocsSource)
    return (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
    )


def test_partitioned_generation(spark):
    df = _read(spark)
    assert df.count() == 2000
    assert df.rdd.getNumPartitions() == 8
    parts = {r["part_id"] for r in df.select("part_id").distinct().collect()}
    assert parts == set(range(8))
    # all ids present exactly once (partition ranges tile the keyspace)
    assert df.select("doc_id").distinct().count() == 2000


def test_deterministic_across_reads(spark):
    a = {r["doc_id"]: r["text"] for r in _read(spark).collect()}
    b = {r["doc_id"]: r["text"] for r in _read(spark, parts=3).collect()}
    # same rows regardless of partitioning (the retry-stability contract)
    assert a == b


def test_composes_with_engine_operators(spark):
    df = _read(spark, rows=500, parts=4)
    embedded = df.select("doc_id", featurize("text").alias("emb"))
    row = embedded.limit(1).collect()[0]
    assert len(row["emb"]) == 8
    counts = df.groupBy("part_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r["n"] for r in counts) == 500
