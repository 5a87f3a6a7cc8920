"""Deterministic text featurizer — the oracle-checkable stand-in for
the reference's model-inference UDF (M7, run.py:40-48 `model.encode`).

Strategy (SURVEY §5.2 / FIXTURES.md): correctness tests need Spark and
DuckDB to agree on every embedding value, so the "model" is a pure
arithmetic feature map both engines can compute exactly:

  dim 0  n_chars
  dim 1  n_tokens           (whitespace split)
  dim 2  n_distinct tokens
  dim 3  mean token length  (round 6)
  dim 4  count of token 'spark'
  dim 5  count of token 'join'
  dim 6  count of token 'data'
  dim 7  count of token 'the'

All dims are exact integers except dim 3, whose division is rounded
identically in both engines. Output: array<double> length 8.

The *real* model UDF shares this interface (see embed_pandas_udf) so
swapping a SentenceTransformer in is a one-line change; the reference
loads its model once per process (run.py:9-10) — the pandas-UDF
iterator form below does the per-executor equivalent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

FEATURE_DIM = 8
_KEYWORDS = ["spark", "join", "data", "the"]


def featurize(text: Column | str) -> Column:
    """Spark-native (codegen, no UDF) deterministic embedding."""
    text = F.col(text) if isinstance(text, str) else text
    toks = F.split(text, " ")
    n_tokens = F.size(toks)
    tok_len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dims = [
        F.length(text).cast("double"),
        n_tokens.cast("double"),
        F.size(F.array_distinct(toks)).cast("double"),
        F.round(tok_len_sum / n_tokens.cast("double"), 6),
    ] + [
        F.size(F.filter(toks, lambda t: t == F.lit(k))).cast("double")
        for k in _KEYWORDS
    ]
    return F.array(*dims)


def duck_featurize(text: str) -> str:
    """DuckDB twin of featurize() — identical arithmetic and rounding."""
    toks = f"string_split({text}, ' ')"
    tok_len_sum = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform({toks}, t -> CAST(length(t) AS DOUBLE))), (a, x) -> a + x)"
    )
    kw = ", ".join(
        f"CAST(len(list_filter({toks}, t -> t = '{k}')) AS DOUBLE)" for k in _KEYWORDS
    )
    return (
        f"[CAST(length({text}) AS DOUBLE), "
        f"CAST(len({toks}) AS DOUBLE), "
        f"CAST(len(list_distinct({toks})) AS DOUBLE), "
        f"round({tok_len_sum} / CAST(len({toks}) AS DOUBLE), 6), "
        f"{kw}]"
    )


# DataType object (not a DDL string): DDL parsing would require an
# active SparkSession at import time.
@pandas_udf(ArrayType(DoubleType()))
def embed_pandas_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched iterator pandas UDF with the same semantics as
    featurize(). This is the slot where a real model goes: the iterator
    form initializes heavyweight state (tokenizer/model — reference:
    run.py:9-10) ONCE per executor python worker, then streams Arrow
    batches through it (reference batches by hand at 32 rows,
    run.py:130-148; here Arrow batching is config-driven)."""
    # model = load_model_once()   <- real-model slot (per-executor init)
    for batch in batches:
        def one(text: str) -> list[float]:
            toks = text.split(" ")
            n = len(toks)
            mean_len = round(sum(len(t) for t in toks) / n, 6) if n else 0.0
            return [
                float(len(text)),
                float(n),
                float(len(set(toks))),
                mean_len,
                *(float(sum(1 for t in toks if t == k)) for k in _KEYWORDS),
            ]

        yield batch.map(one)
