"""Exact cross-engine arithmetic helpers.

Why these exist: Spark's round() rounds the exact decimal expansion of
the double (BigDecimal HALF_UP) while DuckDB multiplies by 10^d first
and rounds the product — for values within an ulp of a half boundary
the two disagree. Quotients of small integers (averages, ratios,
Jaccard) and rounded-then-combined values hit exact halves often
enough to flip a value hash. The fix is to never round a float at
all: keep numerators/denominators in int64, truncate with integer
division (toward zero — matches DuckDB's `//`), and divide by the
decimal scale only at the very end, where the division of an exact
integer by a power of ten is deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def int_div(a: Column, b: Column) -> Column:
    """Integer division truncating toward zero on long columns —
    matches DuckDB `//` (measured: -7 // 2 = -3, i.e. truncation, NOT
    floor). Uses Spark's IntegralDivide (`a div b`), which runs in pure
    JVM long arithmetic: the earlier ((a - a%b)/b).cast('long') form
    went through a double divide and silently lost exactness once the
    numerator exceeded 2^53 (div(9007199254740995, 3) came back one
    low). Result cast keeps the long dtype even for int32 inputs."""
    return F.call_function("div", a, b).cast("long")


def trunc_div(numer: Column, denom: Column, out_scale: float) -> Column:
    """trunc(numer/denom) / out_scale — the deterministic replacement
    for round(numer/denom/k, d). numer must be an exact int64 column
    (e.g. a sum of integer-scaled values)."""
    return int_div(numer, denom) / F.lit(float(out_scale))


def duck_trunc_div(numer: str, denom: str, out_scale: float) -> str:
    return f"CAST({numer} // {denom} AS BIGINT) / {float(out_scale)!r}"
