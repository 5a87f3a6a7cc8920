"""Round-12 session-2 invariants: the one-pass modularity read-out
(graph_lpa_modularity — d_c/e_in/t all from a single annotated edge
pass) and the shared persisted degree frame threaded through
_tri_closed_bcast / graph_local_clustering.

Value identity across gate branches is the bar: the broadcast and
shuffle-join label attachments must produce the same moments, and the
below-gate closure stream must agree with the above-gate edge-iterator
under the shared deg frame.
"""

from __future__ import annotations

import pytest

from alexandria_pipeline_spark import QUERIES
from alexandria_pipeline_spark.operators import graph as G
from alexandria_pipeline_spark.registry import release_persisted
from tests.conftest import SF_SMOKE


def test_modularity_gate_paths_value_identical(spark, monkeypatch):
    """The one-pass per-label aggregate must yield identical
    (n_communities, t_directed_edges, q_ppm) whether the label frames
    broadcast (below LPA_LABEL_BROADCAST_LIMIT) or attach via shuffle
    joins (above it) — the gate changes the join strategy, never the
    moments."""
    base = [tuple(r) for r in QUERIES["graph_lpa_modularity"](spark, SF_SMOKE).collect()]
    release_persisted()
    monkeypatch.setattr(G, "LPA_LABEL_BROADCAST_LIMIT", 0)
    above = [tuple(r) for r in QUERIES["graph_lpa_modularity"](spark, SF_SMOKE).collect()]
    release_persisted()
    assert above == base and base, "gate must not change the moments"
    n_comm, t_edges, q_ppm = base[0]
    assert t_edges % 2 == 0 and t_edges > 0
    assert 0 < n_comm <= t_edges
    assert -1_000_000 < q_ppm < 1_000_000


def test_lcc_gate_paths_value_identical(spark, monkeypatch):
    """graph_local_clustering must return the same top-20 rows from the
    below-gate broadcast-closure stream and the above-gate edge-iterator
    — both now fed by the one scoped-persisted shared degree frame."""
    base = [tuple(r) for r in QUERIES["graph_local_clustering"](spark, SF_SMOKE).collect()]
    release_persisted()
    monkeypatch.setattr(G, "RA_ADJ_BROADCAST_LIMIT", 0)
    above = [tuple(r) for r in QUERIES["graph_local_clustering"](spark, SF_SMOKE).collect()]
    release_persisted()
    assert above == base and base, "gate must not change the rows"
