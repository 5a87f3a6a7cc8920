"""Deterministic text featurizer — the oracle-checkable stand-in for
the reference's model-inference UDF (M7, run.py:40-48 `model.encode`).

Strategy (SURVEY §5.2 / FIXTURES.md): correctness tests need Spark and
DuckDB to agree on every embedding value, so the "model" is a pure
arithmetic feature map both engines can compute exactly:

  dim 0  n_chars
  dim 1  n_tokens           (whitespace split)
  dim 2  n_distinct tokens
  dim 3  mean token length, truncated to 6 decimals
  dim 4  count of token 'spark'
  dim 5  count of token 'join'
  dim 6  count of token 'data'
  dim 7  count of token 'the'

All dims are exact integers except dim 3, computed as
(sum_len * 10^6) DIV n / 10^6 — truncating INTEGER division, not
round(): engines disagree on round()'s half-point behavior at the
last ulp (Spark rounds the exact decimal expansion of the double,
DuckDB rounds after multiplying by 10^d), and small-denominator
quotients land exactly on halves often enough to flip hashes.
Integer div is bit-identical everywhere. Output: array<double> len 8.

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
    """Spark-native (codegen, no UDF) deterministic embedding.

    Deliberately HOF-free: higher-order functions (aggregate / filter
    with lambdas) evaluate interpreted, per-element, outside
    whole-stage codegen, and were the measured bulk of this
    expression's cost (~30% of embed_documents' map stage). Instead:

    - token-length sum via the single-char-delimiter split identity
      length(text) = Σ len(tok) + (n_tokens - 1) — exact for every
      input including empty strings and repeated spaces (empty tokens
      contribute 0), so the value matches the oracle's list_reduce.
    - keyword counts as n_tokens - size(array_remove(toks, k)) —
      array_remove is a codegen-capable native.
    """
    text = F.col(text) if isinstance(text, str) else text
    toks = F.split(text, " ")
    n_tokens = F.size(toks)
    tok_len_sum = (F.length(text) - (n_tokens - F.lit(1))).cast("long")
    # integer div then exact /1e6 — see module docstring. (a - a%n)/n
    # stays in exact int64 until the final exact-integer double divide.
    scaled = tok_len_sum * 1_000_000
    mean_len = ((scaled - scaled % n_tokens) / n_tokens).cast("long") / F.lit(
        1_000_000.0
    )
    dims = [
        F.length(text).cast("double"),
        n_tokens.cast("double"),
        F.size(F.array_distinct(toks)).cast("double"),
        mean_len,
    ] + [
        (n_tokens - F.size(F.array_remove(toks, k))).cast("double")
        for k in _KEYWORDS
    ]
    return F.array(*dims)


def duck_featurize(text: str) -> str:
    """DuckDB twin of featurize() — identical integer arithmetic."""
    toks = f"string_split({text}, ' ')"
    tok_len_sum = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({toks}, t -> CAST(length(t) AS BIGINT))), (a, x) -> a + x)"
    )
    mean_len = (
        f"CAST(({tok_len_sum} * 1000000) // len({toks}) AS BIGINT) / 1000000.0"
    )
    kw = ", ".join(
        f"CAST(len(list_filter({toks}, t -> t = '{k}')) AS DOUBLE)" for k in _KEYWORDS
    )
    return (
        f"[CAST(length({text}) AS DOUBLE), "
        f"CAST(len({toks}) AS DOUBLE), "
        f"CAST(len(list_distinct({toks})) AS DOUBLE), "
        f"{mean_len}, "
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
            mean_len = (sum(len(t) for t in toks) * 1_000_000 // n) / 1e6 if n else 0.0
            return [
                float(len(text)),
                float(n),
                float(len(set(toks))),
                mean_len,
                *(float(sum(1 for t in toks if t == k)) for k in _KEYWORDS),
            ]

        yield batch.map(one)


def make_predict_batch_udf(batch_size: int = 64):
    """M7 via the modern Spark ML serving API: predict_batch_udf
    (SURVEY §2.3 M7 mapping; reference run.py:40-48 model.encode).

    Where embed_pandas_udf hand-rolls the iterator protocol, this is
    the API a production model ships through: make_predict_fn runs
    ONCE per python worker (the model-load slot — on a GPU cluster
    this is where stage-level scheduling pins one model per GPU), and
    Spark feeds it numpy batches of `batch_size` rows. The fake model
    is the same deterministic featurizer, so parity with featurize()
    and embed_pandas_udf is exact and asserted in tests.
    """
    import numpy as np

    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql.types import ArrayType, DoubleType

    def make_predict_fn():
        # model = load_model_once()   <- real-model slot (per-worker init)
        def predict(texts: np.ndarray) -> np.ndarray:
            out = np.empty((len(texts), FEATURE_DIM), dtype=np.float64)
            for i, text in enumerate(texts):
                toks = text.split(" ")
                n = len(toks)
                mean_len = (
                    (sum(len(t) for t in toks) * 1_000_000 // n) / 1e6 if n else 0.0
                )
                out[i] = [
                    float(len(text)),
                    float(n),
                    float(len(set(toks))),
                    mean_len,
                    *(float(sum(1 for t in toks if t == k)) for k in _KEYWORDS),
                ]
            return out

        return predict

    return predict_batch_udf(
        make_predict_fn,
        return_type=ArrayType(DoubleType()),
        batch_size=batch_size,
    )
