"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the same fact-fact join (lineitem ⋈ orders on orderkey) runs
daily; paying its shuffle every run is waste. Bucketing persists the
hash-partitioning INTO the table layout: both sides bucketed by the
join key into the same bucket count join with ZERO exchange — the
sort-merge join reads co-located buckets directly (verified in
tests/test_bucketed.py by asserting no Exchange under the join).

Spark bucketing needs the session catalog (saveAsTable), which in
local mode lives in spark-warehouse/ — same API on a real metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
) -> None:
    """Persist df bucketed (and sorted) by the join key. Sorting within
    buckets lets the sort-merge join skip its sort step too."""
    import shutil

    spark = df.sparkSession
    # A managed table whose catalog entry died with a previous session
    # leaves an orphaned warehouse dir that blocks re-creation
    # (LOCATION_ALREADY_EXISTS) — drop both halves first.
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, l[key_left] == r[key_right])
