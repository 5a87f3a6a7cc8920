"""Unit tests for the functions layer: the pandas-UDF featurizer must
agree exactly with the codegen featurize() expression (they are two
faces of one contract — M7's model slot), and vector ops must match
numpy ground truth.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.functions import vectors
from alexandria_pipeline_spark.functions.featurizer import embed_pandas_udf, featurize

from tests.conftest import SF_SMOKE


def test_pandas_udf_matches_builtin_featurizer(spark):
    d = load_table(spark, SF_SMOKE, "documents").limit(100)
    both = d.select(
        featurize("text").alias("builtin"),
        embed_pandas_udf("text").alias("udf"),
    ).collect()
    for row in both:
        assert row["builtin"] == row["udf"], (row["builtin"], row["udf"])


def test_dot_and_norm_match_numpy(spark):
    import numpy as np

    e = load_table(spark, SF_SMOKE, "embeddings").limit(20)
    rows = e.select(
        "vec_id",
        "embedding",
        vectors.dot("embedding", "embedding").alias("self_dot"),
        vectors.l2_norm("embedding").alias("norm"),
    ).collect()
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        assert math.isclose(r["self_dot"], float(v @ v), rel_tol=1e-9)
        assert math.isclose(r["norm"], float(np.linalg.norm(v)), rel_tol=1e-9)


def test_weighted_concat_dims_and_scaling(spark):
    e = load_table(spark, SF_SMOKE, "embeddings").limit(5)
    rows = e.select(
        "embedding",
        vectors.weighted_concat("embedding", "embedding", 0.2, 0.8).alias("merged"),
    ).collect()
    for r in rows:
        assert len(r["merged"]) == 2 * len(r["embedding"])
        # M9 semantics: first half scaled by 0.2, second by 0.8
        assert math.isclose(
            r["merged"][0], float(r["embedding"][0]) * 0.2, rel_tol=1e-6
        )
        assert math.isclose(
            r["merged"][len(r["embedding"])],
            float(r["embedding"][0]) * 0.8,
            rel_tol=1e-6,
        )


def test_cosine_of_unit_vectors_bounded(spark):
    e = load_table(spark, SF_SMOKE, "embeddings").limit(10)
    a = e.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    rows = (
        a.crossJoin(b)
        .select(vectors.cosine("ea", "eb").alias("cos"), "ia", "ib")
        .collect()
    )
    for r in rows:
        assert -1.0 - 1e-9 <= r["cos"] <= 1.0 + 1e-9
        if r["ia"] == r["ib"]:
            assert math.isclose(r["cos"], 1.0, rel_tol=1e-9)
