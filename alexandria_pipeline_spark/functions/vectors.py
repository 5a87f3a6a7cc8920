"""Vector math over ArrayType(Float/Double) columns.

Reference parity: M8 weighted-average pooling (run_extra.py:46-48),
M9 scaled-concat merge (process.py:126), cosine scoring for the
north-star similarity search.

Everything stays in `pyspark.sql.functions` lambda expressions
(`transform`/`zip_with`/`aggregate`), which execute JVM-side inside
whole-stage codegen — no Python in the hot path, no UDF serialization.
Elements are cast to double *before* arithmetic: float32 inputs would
otherwise accumulate in float32 in Spark but float64 in most SQL
engines, breaking cross-engine comparability (and precision at 100 TB
reduction widths).

The duck_* twins emit DuckDB SQL computing the identical left-to-right
fold, so double results are bitwise-equal across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column | str) -> Column:
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left fold: 0.0 + a1*b1 + a2*b2 + ... (deterministic)."""
    a, b = as_double(a), as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def l2_dist2(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance, same deterministic left fold as dot():
    0.0 + (a1-b1)^2 + (a2-b2)^2 + ... — pairs with duck_l2_dist2."""
    a, b = as_double(a), as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def scale(vec: Column | str, s: float) -> Column:
    return F.transform(as_double(vec), lambda x: x * F.lit(float(s)))


def weighted_concat(a: Column | str, b: Column | str, w_a: float, w_b: float) -> Column:
    """M9: concat(a*w_a, b*w_b) — process.py:126 with title_weight=0.2."""
    return F.concat(scale(a, w_a), scale(b, w_b))


# ---------------------------------------------------------------- DuckDB twins
def duck_dot(a: str, b: str) -> str:
    """Same fold as dot(): list_reduce is a left fold whose seed is the
    first element; Spark's 0.0-seeded fold adds 0.0+x1 first, which is
    exact, so both engines produce bitwise-identical doubles."""
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


def duck_l2_norm(a: str) -> str:
    return f"sqrt({duck_dot(a, a)})"


def duck_l2_dist2(a: str, b: str) -> str:
    """list_reduce left fold of squared component differences — seed is
    the first element (0.0 + x1 on the Spark side is exact), so the
    doubles are bitwise-equal to l2_dist2()."""
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def duck_cosine(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / ({duck_l2_norm(a)} * {duck_l2_norm(b)}))"


def duck_scale(vec: str, s: float) -> str:
    return f"list_transform({vec}, x -> CAST(x AS DOUBLE) * {float(s)!r})"


def duck_weighted_concat(a: str, b: str, w_a: float, w_b: float) -> str:
    return f"list_concat({duck_scale(a, w_a)}, {duck_scale(b, w_b)})"
