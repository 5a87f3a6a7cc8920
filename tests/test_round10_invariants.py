"""Round-10 invariants: curation_quality_train (verdict item #4) and
graph_lpa_modularity (the LPA-composition read-out).

The trained linear quality classifier must actually LEARN —

  - the training trajectory must descend (MSE strictly decreasing
    over the unrolled steps, population constant);
  - the trained weights must beat the uniform-weight baseline on
    ROC-AUC against the same label (the verdict's required check) —
    and not vacuously: trained AUC must clear 0.6 on its own;
  - the sign structure must be learned, not assumed: on this corpus
    the type/token-ratio feature anti-correlates with the stopword
    label, so a correctly-trained model carries a NEGATIVE w_uniq
    (the uncentered variant measurably fails this — AUC 0.19).

AUC here is computed directly in the test (pandas midranks over the
exact integer scores) rather than through curation_quality_auc, whose
scorer/label are the fixed published weights vs the lang tag; the
rank identity is the same one that query implements.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from alexandria_pipeline_spark import QUERIES, register_all

from tests.conftest import SF_SMOKE


def _auc(scores: np.ndarray, y: np.ndarray) -> float:
    rr = pd.Series(scores).rank(method="average").values
    n_pos = y.sum()
    n_neg = (1 - y).sum()
    assert n_pos > 0 and n_neg > 0
    return float((rr[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def _features(sf_dir: str):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rel = con.sql(
        """
        WITH feats AS (
          SELECT list_contains(string_split(text, ' '), 'the')
                   AND list_contains(string_split(text, ' '), 'a') AS y,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   AS n_uniq,
                 CAST(list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split(text, ' '),
                                    t -> CAST(length(t) AS BIGINT))),
                   (a, b) -> a + b) AS BIGINT) AS sum_len
          FROM documents
        )
        SELECT CASE WHEN y THEN 1 ELSE 0 END AS y,
               least(n_toks, 512) * 1000000 // 512 AS x1,
               n_uniq * 1000000 // n_toks AS x2,
               least(abs(sum_len * 1000000 // n_toks - 4500000), 4500000)
                 * 1000000 // 4500000 AS x3
        FROM feats WHERE n_toks > 0
        """
    ).fetchnumpy()
    y = rel["y"].astype(np.int64)
    X = np.stack([rel["x1"], rel["x2"], rel["x3"]], axis=1).astype(np.int64)
    return y, X


def test_quality_train_trajectory_descends(spark):
    register_all()
    rows = (
        QUERIES["curation_quality_train"](spark, SF_SMOKE)
        .orderBy("step")
        .collect()
    )
    assert [r.step for r in rows] == [1, 2, 3]
    assert len({r.n_docs for r in rows}) == 1
    mses = [r.mse_e6 for r in rows]
    assert mses[0] > mses[1] > mses[2], mses


def test_quality_train_beats_uniform_auc_and_learns_signs(spark):
    register_all()
    final = (
        QUERIES["curation_quality_train"](spark, SF_SMOKE)
        .orderBy("step")
        .collect()[-1]
    )
    y, X = _features(SF_SMOKE)
    # Bias shifts every score equally — rank metrics ignore it, so
    # score with the learned feature weights on the (rank-equivalent)
    # uncentered features.
    w = np.array([final.w_len_e6, final.w_uniq_e6, final.w_awl_e6])
    auc_trained = _auc((X @ w).astype(float), y)
    auc_uniform = _auc(X.sum(axis=1).astype(float), y)
    assert auc_trained > 0.6, (auc_trained, auc_uniform)
    assert auc_trained > auc_uniform, (auc_trained, auc_uniform)
    # Learned sign structure: TTR anti-correlates with the label here.
    assert final.w_uniq_e6 < 0


def test_lpa_modularity_reconciles_with_lpa_partition(spark):
    """graph_lpa_modularity composes the SAME edge build and unrolled
    LPA iterations in-plan; its community count must equal the
    distinct community count of the registered LPA query, its edge
    total must be even (both orientations present), and Q must lie in
    Newman's range (-1, 1) — here as ppm."""
    register_all()
    row = QUERIES["graph_lpa_modularity"](spark, SF_SMOKE).collect()[0]
    lpa = QUERIES["graph_label_propagation"](spark, SF_SMOKE)
    n_comms = lpa.select("community").distinct().count()
    assert row.n_communities == n_comms
    assert row.t_directed_edges % 2 == 0 and row.t_directed_edges > 0
    assert -1_000_000 < row.q_ppm < 1_000_000
