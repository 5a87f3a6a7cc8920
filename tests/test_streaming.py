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


def test_transform_with_state_env_blocker_is_reproducible():
    """transformWithStateInPandas (Spark 4 StatefulProcessor) remains
    blocked by the container, not by design: the streaming state
    runner's serializer chain imports the generated protobuf module,
    and this environment has no google.protobuf (and installing
    packages is out of scope). This test pins the EXACT failing import
    so the blocker is reproducible from the suite itself; if the
    environment ever gains protobuf the skip vanishes and the assert
    below demands the real twin be built (round-4 verdict item #6).
    applyInPandasWithState is the stateful streaming seam meanwhile
    (stream_stateful_user_stats, streaming/stream_events.py)."""
    import pytest

    try:
        # pyspark 4.1.2: stateful_processor_api_client -> proto.StateMessage_pb2
        # -> google.protobuf; the LAST hop is what the worker dies on.
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401
    except ModuleNotFoundError as exc:
        assert exc.name in ("google", "google.protobuf"), exc
        pytest.skip(
            "transformWithStateInPandas blocked by environment: "
            f"`import pyspark.sql.streaming.proto.StateMessage_pb2` -> {exc!r} "
            "(pyspark 4.1.2, python "
            "%d.%d; google.protobuf absent, installs disallowed)"
            % __import__("sys").version_info[:2]
        )
    # Environment changed under us: protobuf is importable now, so the
    # transformWithState twin of stream_stateful_user_stats is
    # buildable — surface that instead of silently passing.
    pytest.fail(
        "google.protobuf is now importable: build the "
        "transformWithStateInPandas twin (streaming/stream_events.py NOTE)"
    )
