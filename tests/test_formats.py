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
