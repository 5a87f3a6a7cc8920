"""Query + oracle registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 registers here:
  - a callable (spark, sf_dir) -> DataFrame  (the Spark-native plan)
  - optionally an ANSI-SQL string DuckDB can run on the same Parquet
    tables (the correctness oracle). Omitted only for genuinely
    non-SQL-expressible ops (streaming state, approx sketches), which
    the driver checks rows-only.

Cross-engine determinism rules used throughout the query library:
  - every computed column is aliased identically in Spark and SQL
    (the driver sorts columns by name before hashing values);
  - non-associative float aggregates (sum/avg over double) are
    round()ed in BOTH engines so partial-aggregation order can't leak
    into the hash;
  - top-k / window rankings always carry a unique-key tiebreaker;
  - timestamps are emitted as epoch seconds or formatted strings,
    never raw timestamp values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_REGISTERED = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def register_all() -> None:
    """Import every operator module for its registration side effects."""
    global _REGISTERED
    if _REGISTERED:
        return
    # Imports deferred so `import alexandria_pipeline_spark` stays cheap.
    from alexandria_pipeline_spark.operators import (  # noqa: F401
        anomaly,
        bloom,
        relational,
        relational_ext,
        tpch_full,
        windows,
        events,
        pipeline,
        dedup,
        similarity,
        text_analysis,
        multimodal,
        graph,
        curation,
        packing,
        quality,
        retrieval,
        maintenance,
        stats,
        skew,
    )
    from alexandria_pipeline_spark.sources.text_formats import (
        register_text_format_queries,
    )
    from alexandria_pipeline_spark.streaming import stream_events  # noqa: F401

    register_text_format_queries()
    _REGISTERED = True
