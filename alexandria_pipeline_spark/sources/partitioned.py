"""Hive-style partitioned layout: directory partitioning by a derived
key, so date/key predicates become partition PRUNING (the scan never
lists, let alone reads, non-matching directories).

At 100 TB this is the first-order win for any time-ranged workload:
a day's query over a date-partitioned events table touches 1/365 of
the files before a single row is read. Partition columns should be
low-cardinality (day, not µs timestamp) or the file count explodes —
the classic small-files failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_partitioned_by_day(df: DataFrame, ts_col: str, path: str) -> None:
    (
        df.withColumn("event_day", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("event_day")
        .parquet(path)
    )


def read_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Predicate on the partition column — resolves to PartitionFilters
    (pruning), not a data filter. Asserted in tests/test_partitioned.py."""
    return spark.read.parquet(path).filter(F.col("event_day") == day)
