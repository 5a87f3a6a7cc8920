"""Table loading over the driver testdata star schema.

Reference analog: the reference materializes whole Parquet files into
pandas (`run.py:20-21`, `process.py:64-67`); here every load is a lazy
`spark.read.parquet` scan so Catalyst gets column pruning + predicate
pushdown for free and nothing is materialized until an action runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor — a
# region/nation table never grows with the fact data, so joins against
# them must always be broadcast-hash, never shuffle.
BROADCAST_DIMS = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily read one testdata table.

    events.ts is stored as timestamp[ns], which Spark's Parquet reader
    only accepts as a raw int64 via `spark.sql.legacy.parquet.nanosAsLong`.
    That conf is set HERE, at runtime, not only in our session factory:
    callers (the correctness driver, a notebook, spark-submit) construct
    their own SparkSession and never see session.py, so the read must be
    self-sufficient in a bare session. The conf is runtime-settable, so
    `spark.conf.set` before the scan is enough. We then convert to a
    microsecond timestamp with *integer* division — ns-since-epoch
    (~1.7e18) exceeds double's 53-bit mantissa, so float division would
    corrupt the low microseconds. DuckDB 1.0 reads the same column as a
    microsecond TIMESTAMP, so both engines see identical values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
