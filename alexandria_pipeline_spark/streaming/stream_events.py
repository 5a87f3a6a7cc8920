"""Structured Streaming over the events table.

SURVEY §2.9: the reference's hand-rolled cursor/flush loop
(run.py:121-153 — whose checkpoint races its flush, §4.3.6) maps to
readStream + checkpointLocation + foreachBatch, where offset tracking
and exactly-once sink commits are engine-managed.

Batch-mode twins of these queries (operators/events.py) are the
oracle-checked versions; here the same logic runs through the
streaming engine with trigger(availableNow) so results are
deterministic and comparable. The parquet dir doubles as a file-stream
source (FIXTURES.md mapping note).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from alexandria_pipeline_spark.registry import query

# File-stream sources need an explicit schema (no inference at stream
# start); ts arrives as raw int64 nanos (see catalog.load_table).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream sources monitor a DIRECTORY (new files = new data),
    so the single events.parquet file is staged into a temp dir via
    symlink — exactly how a live pipeline would tail a landing dir."""
    import os

    stage = tempfile.mkdtemp(prefix="apspark_stream_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(stage, "events-0000.parquet"),
    )
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Drain a stream with trigger(availableNow) into an in-memory
    table and return the final result. availableNow = process all
    currently-available input then stop — the batch-parity trigger
    (the reference's whole run loop is this trigger, hand-rolled)."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="apspark_ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT
      (epoch_us(ts) // 1000000 // 3600) * 3600 AS window_start_s,
      event_type,
      count(*)             AS n_events,
      round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregate executed BY THE STREAMING
    ENGINE (readStream → watermark → window agg → availableNow →
    memory sink). With all input available, the final complete-mode
    result equals the batch query — which is exactly what the oracle
    checks. At scale this query runs unchanged against a live file/
    Kafka source with the watermark bounding state eviction."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return _run_to_memory(agg, "complete")


@query("stream_dedup_watermark")  # rows-only: which duplicate survives
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: dropDuplicatesWithinWatermark on
    (user_id, event_type) with a 1-day watermark — the streaming twin
    of events_dedup_keep_first. Surviving-row choice is arrival-order
    dependent, so the driver records the (deterministic) row count
    only."""
    events = read_events_stream(spark, sf_dir)
    deduped = events.withWatermark("ts", "1 day").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    out = deduped.select("user_id", "event_type", "event_id")
    return _run_to_memory(out, "append")
