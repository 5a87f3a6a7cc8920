"""Multi-format sink/source round-trips: Parquet is the system of
record, but a complete engine exports/imports CSV, JSON, and ORC with
schema fidelity (CSV/JSON need explicit schemas on read — inference is
both slow at scale and lossy on types)."""

from __future__ import annotations

import tempfile

from alexandria_pipeline_spark.catalog import load_table

from tests.conftest import SF_SMOKE


def _norm(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_orc_round_trip(spark):
    src = load_table(spark, SF_SMOKE, "customer")
    out = tempfile.mkdtemp(prefix="apspark_orc_")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    cols = ["c_custkey", "c_name", "c_acctbal"]
    assert _norm(back, cols) == _norm(src, cols)


def test_csv_round_trip_with_schema(spark):
    src = load_table(spark, SF_SMOKE, "nation")
    out = tempfile.mkdtemp(prefix="apspark_csv_")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(src.schema).option("header", True).csv(out)
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    assert _norm(back, cols) == _norm(src, cols)


def test_json_round_trip_with_schema(spark):
    src = load_table(spark, SF_SMOKE, "region")
    out = tempfile.mkdtemp(prefix="apspark_json_")
    src.write.mode("overwrite").json(out)
    back = spark.read.schema(src.schema).json(out)
    cols = ["r_regionkey", "r_name"]
    assert _norm(back, cols) == _norm(src, cols)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A dataset whose later shards gained a column must read as ONE
    unified schema under mergeSchema, with the old shards' missing
    column null — the append-only schema-evolution path every
    long-lived ingest hits. Also pins the sharper footgun: WITHOUT
    mergeSchema Spark picks an arbitrary footer, so the new column may
    silently vanish — the test documents that both behaviors are what
    they claim."""
    import pyspark.sql.functions as F

    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(base + "/shard=old")
    spark.createDataFrame(
        [(3, "c", 30), (4, "d", 40)], "id long, name string, score int"
    ).write.parquet(base + "/shard=new")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "name", "score", "shard"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[3]["score"] == 30

    # evolved column is usable in plans immediately (nulls flow)
    out = merged.agg(
        F.count(F.lit(1)).alias("n"), F.sum("score").alias("s")
    ).collect()[0]
    assert out["n"] == 4 and out["s"] == 70
