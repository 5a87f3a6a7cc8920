"""Recall of the IVF variants vs the exact brute-force baseline.

The driver testdata's embeddings are isotropic random vectors, where
ANY cluster-pruned index has degraded recall by construction — so
recall is measured on a CLUSTERED fixture, the regime IVF exists for.
The fixture is adversarial for single-probe: queries (vec_id 0..2,
which double as centroids under the operators' vec_id<8 centroid
rule) are placed BETWEEN cluster pairs, so their true neighbors live
in two neighboring Voronoi cells. Measured here: single-probe recall
0.2, nprobe=3 recall 0.8 — the number SCALE.md cites.
"""

from __future__ import annotations

import tempfile

import numpy as np
import pandas as pd
import pytest

from alexandria_pipeline_spark import QUERIES

N_CENTERS = 8
PER_CLUSTER = 60
DIM = 64
BRIDGES = [(3, 4), (5, 6), (6, 7)]  # query i sits between these centers


@pytest.fixture(scope="module")
def clustered_sf_dir(spark):
    """Write a tiny clustered embeddings.parquet shaped like the
    testdata table, usable as an sf_dir by the knn queries."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(N_CENTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    # vec 0..2: bridge queries between center pairs (also centroids);
    # vec 3..7: the remaining centers verbatim.
    for i, (a, b) in enumerate(BRIDGES):
        v = 0.55 * centers[a] + 0.45 * centers[b]
        v /= np.linalg.norm(v)
        rows.append((i, v.astype(np.float32).tolist(), a))
    for c in range(3, N_CENTERS):
        rows.append((c, centers[c].astype(np.float32).tolist(), c))
    vec_id = N_CENTERS
    for c in range(N_CENTERS):
        for _ in range(PER_CLUSTER):
            v = centers[c] + 0.25 * rng.normal(size=DIM)
            v /= np.linalg.norm(v)
            rows.append((vec_id, v.astype(np.float32).tolist(), c))
            vec_id += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    out = tempfile.mkdtemp(prefix="apspark_clustered_")
    pdf.to_parquet(f"{out}/embeddings.parquet", index=False)
    return out


def _topk(df) -> dict[int, set[int]]:
    got: dict[int, set[int]] = {}
    for r in df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return got


def recall_vs_exact(spark, sf_dir: str, approx_name: str) -> float:
    exact = _topk(QUERIES["knn_brute_force"](spark, sf_dir))
    approx = _topk(QUERIES[approx_name](spark, sf_dir))
    hits = total = 0
    for qid, truth in exact.items():
        hits += len(truth & approx.get(qid, set()))
        total += len(truth)
    return hits / total if total else float("nan")


def test_multiprobe_recall_on_clustered_fixture(spark, clustered_sf_dir):
    """nprobe=3 must hit the ≥0.8 scale target on boundary queries."""
    r = recall_vs_exact(spark, clustered_sf_dir, "knn_ivf_multiprobe")
    assert r >= 0.8, r


def test_multiprobe_beats_single_probe(spark, clustered_sf_dir):
    """Boundary queries are exactly where single-probe IVF loses its
    neighbors to adjacent cells — multi-probe must recover a strict
    margin here, not just tie."""
    r1 = recall_vs_exact(spark, clustered_sf_dir, "knn_ivf_pruned")
    r3 = recall_vs_exact(spark, clustered_sf_dir, "knn_ivf_multiprobe")
    assert r3 > r1, (r1, r3)
    assert r3 - r1 >= 0.3, (r1, r3)


def test_pq_adc_recall_on_clustered_fixture(spark, clustered_sf_dir):
    """PQ quantization error must still leave most true neighbors in
    the ADC top-k on clustered data (recall is corpus-dependent; the
    assert pins the floor measured on this fixture, cited in SCALE.md)."""
    r = recall_vs_exact(spark, clustered_sf_dir, "knn_pq_adc")
    assert r >= 0.3, f"PQ-ADC recall {r:.2f} below floor"


def test_pq_rerank_recovers_full_recall(spark, clustered_sf_dir):
    """ADC shortlist (50 of ~490) + exact rerank must contain the true
    top-k: the accuracy dial that makes coarse PQ shippable."""
    r = recall_vs_exact(spark, clustered_sf_dir, "knn_pq_rerank")
    assert r >= 0.9, f"PQ rerank recall {r:.2f} below floor"
