"""Parity check for the distributed-Gram PCA against numpy's exact
eigendecomposition of the same matrix: identical up to float summation
order, so the top axis must align with cosine > 0.9999 and the
eigenvalue to 1e-6 relative."""

from __future__ import annotations

import numpy as np

from alexandria_pipeline_spark import QUERIES, register_all
from tests.conftest import SF_SMOKE


def test_power_iteration_matches_numpy(spark):
    register_all()
    out = (
        QUERIES["embedding_pca_top_component"](spark, SF_SMOKE)
        .orderBy("dim")
        .collect()
    )
    v = np.array([r["component"] for r in out])
    lam = out[0]["eigenvalue"]

    emb = np.array(
        [
            r["embedding"]
            for r in QUERIES["vector_stats"].__globals__["load_table"](
                spark, SF_SMOKE, "embeddings"
            )
            .select("embedding")
            .collect()
        ]
    )
    gram = emb.T @ emb
    w, vecs = np.linalg.eigh(gram)
    top = vecs[:, -1]
    cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos > 0.9999, cos
    # same Gram, same eigensolve — only float summation order differs
    assert abs(lam - w[-1]) / w[-1] < 1e-6, (lam, w[-1])
