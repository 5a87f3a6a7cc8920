"""Physical-plan assertions used by the performance tests.

The scale contract (SURVEY §4.1): filters reach the Parquet scan
(PushedFilters), projections prune columns (ReadSchema), dimension
joins broadcast, and hot paths stay inside WholeStageCodegen. These
helpers make those properties testable instead of aspirational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    # df.explain fetches the string from the JVM and print()s it in
    # Python, so capturing stdout is version-stable across PySpark.
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    plan = formatted_plan(df)
    return any(
        fragment in line
        for line in plan.splitlines()
        if "PushedFilters" in line
    )


def read_schema_columns(df: DataFrame, table_fragment: str = "") -> list[str]:
    """Columns actually read from the (first matching) parquet scan."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line and (not table_fragment or table_fragment in plan):
            inner = line.split("struct<", 1)
            if len(inner) == 2:
                body = inner[1].rsplit(">", 1)[0]
                cols.extend(f.split(":")[0] for f in body.split(",") if ":" in f)
            break
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return sum(1 for line in plan.splitlines() if "WholeStageCodegen" in line)
