"""RDD-level checkpoint storage accounting for iterative queries.

localCheckpoint(eager=True) persists its data through an INTERNAL
RDD that DataFrame.unpersist() cannot reach (it belongs to the
checkpoint, not the CacheManager), so iterative loops that checkpoint
per round must rotate superseded rounds' blocks BY RDD ID or pile up
one stale snapshot per iteration for the life of the session. These
two helpers are the shared mechanism (first built for
graph_kcore_summary, r6 advice; reused by the connected-components
core, r7 verdict #4).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every block-holding RDD in the session, INCLUDING
    localCheckpoint internals invisible to DataFrame-level APIs."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def unpersist_rdd_ids(spark: SparkSession, ids: set[int]) -> None:
    """Free the given RDDs' blocks (non-blocking); missing ids are
    skipped, so double-release is safe."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        if jmap.containsKey(i):
            jmap.get(i).unpersist(False)
