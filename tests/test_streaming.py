"""Streaming-specific behavior beyond the registry checks: the
checkpointed foreachBatch sink must be exactly-once across restarts
(the §4.3.6 fix), and a second invocation with the same checkpoint
must be a no-op.
"""

from __future__ import annotations

import tempfile

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.streaming.stream_events import stream_to_sharded_sink

from tests.conftest import SF_SMOKE


def test_foreachbatch_sink_exactly_once(spark):
    out = tempfile.mkdtemp(prefix="apspark_sink_")
    ckpt = tempfile.mkdtemp(prefix="apspark_ckpt_")
    stream_to_sharded_sink(spark, SF_SMOKE, out, ckpt)
    n_events = load_table(spark, SF_SMOKE, "events").count()
    written = spark.read.parquet(out)
    assert written.count() == n_events
    assert "batch_id" in written.columns and "props_k" in written.columns

    # restart with the SAME checkpoint: offsets already committed ->
    # no new batches, no duplicate rows (the reference's cursor/flush
    # race re-embedded data here)
    stream_to_sharded_sink(spark, SF_SMOKE, out, ckpt)
    assert spark.read.parquet(out).count() == n_events
