"""SparkSession factory.

Tuned for the driver environment (local[N] single JVM) but every
setting is the one we'd want on a real multi-executor cluster at
100 TB: AQE with skew-join handling, Arrow-batched Python UDFs, and
UTC session time so results are timezone-stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "alexandria-pipeline-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    cpus defaults to $SPARK_GRAFT_CPUS, else all cores. Shuffle
    partitions default to 32 to match the driver's local[32]; on a
    real cluster AQE coalesces/splits post-shuffle partitions anyway.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, and dynamic join-strategy switching. At 100 TB this
        # is what turns a skewed 1000-way shuffle into a balanced one.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # The driver testdata's events table stores timestamp[ns];
        # Spark's Parquet reader rejects TIMESTAMP(NANOS) unless read as
        # raw int64 (catalog.load_table converts to a real timestamp).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow transfer for every pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.showConsoleProgress", "false")
        # local[N] runs driver+executor in ONE JVM: size the heap for
        # N parallel tasks (default JVM 1g starves 32 threads). On a
        # real cluster this maps to spark.executor.memory instead.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    )
    return builder.getOrCreate()
