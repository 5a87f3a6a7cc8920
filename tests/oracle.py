"""Local replica of the driver's correctness gate: run a registered
Spark query and its DuckDB oracle on the same parquet tables, compare
row count, column names, and order-insensitive values.

Comparison is EXACT on the normalized string form (floats repr'd after
the queries' own explicit rounding) — stricter than a tolerance
compare on purpose: if this passes, any reasonable value-hash the
driver computes passes too.
"""

from __future__ import annotations

import math

import duckdb

from alexandria_pipeline_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round explicitly; 12 significant digits absorbs any
        # residual float64 repr noise without masking real mismatches
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if hasattr(v, "tolist"):  # numpy scalars/arrays from duckdb
        return _norm(v.tolist())
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rows_to_multiset(rows, col_order):
    return sorted(
        "|".join(_norm(row[i]) for i in col_order) for row in rows
    )


def compare(spark_df, con, sql: str, name: str = "?", collected=None) -> None:
    """collected=(cols, rows) skips the Spark collect — used by the
    sweep to time engine materialization separately from the oracle."""
    if collected is not None:
        scols, srows = collected
    else:
        scols = list(spark_df.columns)
        srows = [tuple(r) for r in spark_df.collect()]

    rel = con.sql(sql)
    dcols = list(rel.columns)
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={scols} duck={dcols}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}"
    )
    s_order = [scols.index(c) for c in sorted(scols)]
    d_order = [dcols.index(c) for c in sorted(dcols)]
    s_set = _rows_to_multiset(srows, s_order)
    d_set = _rows_to_multiset(drows, d_order)
    if s_set != d_set:
        diffs = [
            (a, b) for a, b in zip(s_set, d_set) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duck): {diffs}"
        )
