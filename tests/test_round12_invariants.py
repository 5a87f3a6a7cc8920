"""Round-12 invariants: the degree-oriented triangle triple stream
(operators/graph.py _tri_triples_deg) shared by the rascores/ntri
written-once relations, the resource-allocation above-gate iterator
plan (replacing the r11 shuffle-equi-join fallback), the new
graph_local_clustering query, the packed-key overflow guards (ADVICE
r11), and the materialization format stamps (ADVICE r11).

Value identity is the bar everywhere: the iterator plan must equal the
broadcast wedge plan bitwise, the materialized read paths must equal
the inline plans bitwise, and a format-stamp mismatch must read as
'no materialization', never as stale values served warm.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from alexandria_pipeline_spark import QUERIES
from alexandria_pipeline_spark.operators import graph as G
from alexandria_pipeline_spark.registry import release_persisted
from tests.conftest import SF_SMOKE


@pytest.fixture()
def jsig_env(tmp_path, monkeypatch):
    """Isolated cache root + a writable copy of the smoke lineitem
    (same fixture shape as round 11's)."""
    cache = tmp_path / "cache"
    monkeypatch.setenv("SPARK_GRAFT_SKETCH_CACHE", str(cache))
    monkeypatch.delenv("SPARK_GRAFT_JACCARD_SIG_DISABLE", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_RA_FORCE_ITER", raising=False)
    sf_copy = tmp_path / "sf"
    sf_copy.mkdir()
    src = os.path.join(SF_SMOKE, "lineitem.parquet")
    dst = sf_copy / "lineitem.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)
    return str(sf_copy)


def _adj_deg(spark):
    edges = [
        (r["a"], r["b"]) for r in G._jaccard_edges(spark, SF_SMOKE).collect()
    ]
    release_persisted()
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return edges, adj, {n: len(ns) for n, ns in adj.items()}


def test_tri_triples_match_bruteforce(spark):
    """Every triangle of the smoke co-purchase graph appears in the
    triple stream EXACTLY once, with the exact degree of each corner
    embedded — against an independent driver-side enumeration."""
    edges, adj, deg = _adj_deg(spark)
    expected: dict[frozenset, int] = {}
    for a, b in edges:
        for z in adj[a] & adj[b]:
            if z > b:  # each triangle once from its sorted (a<b<z) edge
                expected[frozenset((a, b, z))] = 1
    ef = G._jaccard_edges(spark, SF_SMOKE)
    rows = G._tri_triples_deg(ef, broadcast_deg=True).collect()
    release_persisted()
    assert len(rows) == len(expected), "each triangle surfaces exactly once"
    for r in rows:
        tri = frozenset((r["u"], r["v"], r["z"]))
        assert tri in expected and len(tri) == 3
        for n, d in ((r["u"], r["du"]), (r["v"], r["dv"]), (r["z"], r["dz"])):
            assert deg[n] == d, "packed degree must be the exact degree"


def test_ra_iterator_matches_broadcast_plan(spark, monkeypatch):
    """SPARK_GRAFT_RA_FORCE_ITER routes resource-allocation through
    the triangle edge-iterator (the above-gate plan); its output must
    be bitwise the broadcast wedge plan's."""
    monkeypatch.delenv("SPARK_GRAFT_RA_FORCE_ITER", raising=False)
    base = [
        tuple(r)
        for r in QUERIES["graph_resource_allocation"](spark, SF_SMOKE).collect()
    ]
    release_persisted()
    monkeypatch.setenv("SPARK_GRAFT_RA_FORCE_ITER", "1")
    it = [
        tuple(r)
        for r in QUERIES["graph_resource_allocation"](spark, SF_SMOKE).collect()
    ]
    release_persisted()
    assert it == base and base, "iterator plan must be value-identical"


def test_local_clustering_matches_bruteforce(spark):
    """graph_local_clustering vs an independent driver-side recompute:
    exact truncating ppm, deg >= 2 population, (lcc_ppm DESC, node)
    total order, explicit 0 for triangle-free nodes."""
    edges, adj, deg = _adj_deg(spark)
    ntri: dict[int, int] = {}
    for a, b in edges:
        for z in adj[a] & adj[b]:
            if z > b:
                for n in (a, b, z):
                    ntri[n] = ntri.get(n, 0) + 1
    expected = sorted(
        (
            (n, d, ntri.get(n, 0), ntri.get(n, 0) * 2_000_000 // (d * (d - 1)))
            for n, d in deg.items()
            if d >= 2
        ),
        key=lambda r: (-r[3], r[0]),
    )[: G.LCC_TOP_N]
    got = [
        (r["node"], r["deg"], r["n_tri"], r["lcc_ppm"])
        for r in QUERIES["graph_local_clustering"](spark, SF_SMOKE).collect()
    ]
    release_persisted()
    assert got == expected and got


def test_pack_guards_raise_on_overflow(spark):
    """Node ids >= 2^32 must RAISE from both packed-key helpers, never
    silently alias two different pairs onto one join key (ADVICE
    r11)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    big = spark.createDataFrame([(1 << 32, 7)], "a long, b long")
    with pytest.raises(SparkRuntimeException, match="overflow"):
        big.select(G._packed_pair(F.col("a"), F.col("b")).alias("k")).collect()
    with pytest.raises(SparkRuntimeException, match="overflow"):
        big.select(G._pack_deg_node(F.col("b"), F.col("a")).alias("k")).collect()
    # in-range values round-trip exactly
    ok = spark.createDataFrame([(5, 3)], "a long, b long").select(
        G._pack_deg_node(F.col("a"), F.col("b")).alias("k")
    )
    assert ok.collect()[0]["k"] == (5 << 32) | 3


def test_format_stamp_invalidates_jsig(spark, jsig_env, monkeypatch):
    """A warm cache written under a DIFFERENT format stamp must read
    as absent — consumers fall back inline instead of serving
    pre-change scores (ADVICE r11)."""
    monkeypatch.setattr(G, "BROADCAST_EDGE_LIMIT", 0)
    loc = G.run_jaccard_sig_build_job(spark, jsig_env)
    assert G.jaccard_sig_meta(jsig_env) is not None
    meta_path = os.path.join(loc, "_jsig_meta.json")
    doc = json.load(open(meta_path))
    assert doc["format"] == G._JSIG_FORMAT
    doc["format"] = "v0:obsolete"
    json.dump(doc, open(meta_path, "w"))
    assert G.jaccard_sig_meta(jsig_env) is None
    df = QUERIES["graph_resource_allocation"](spark, jsig_env)
    assert not any(loc in f for f in df.inputFiles()), "must not serve stale"
    release_persisted()
    # a rebuild under the current format restores the read path
    G.run_jaccard_sig_build_job(spark, jsig_env)
    assert G.jaccard_sig_meta(jsig_env)["format"] == G._JSIG_FORMAT


def test_format_stamp_invalidates_sketch(spark, jsig_env, monkeypatch, tmp_path):
    from alexandria_pipeline_spark import sketch as S

    docs_src = os.path.join(SF_SMOKE, "documents.parquet")
    dstd = os.path.join(jsig_env, "documents.parquet")
    if os.path.isdir(docs_src):
        shutil.copytree(docs_src, dstd)
    else:
        shutil.copy2(docs_src, dstd)
    loc = S.run_sketch_build_job(spark, jsig_env)
    assert S.sketch_is_fresh(jsig_env)
    meta_path = os.path.join(loc, "_sketch_meta.json")
    doc = json.load(open(meta_path))
    doc["format"] = "v0:obsolete"
    json.dump(doc, open(meta_path, "w"))
    assert not S.sketch_is_fresh(jsig_env)


def test_materialized_read_paths_value_identical(spark, jsig_env, monkeypatch):
    """With a fresh above-gate materialization, resource-allocation,
    triangle-count, and local-clustering must serve the written
    relations (rascores / ntri / edges in inputFiles) with values
    bitwise-identical to their inline plans."""
    names = (
        "graph_resource_allocation",
        "graph_triangle_count",
        "graph_local_clustering",
    )
    monkeypatch.setenv("SPARK_GRAFT_JACCARD_SIG_DISABLE", "1")
    inline = {}
    for n in names:
        inline[n] = [tuple(r) for r in QUERIES[n](spark, jsig_env).collect()]
        release_persisted()
    monkeypatch.delenv("SPARK_GRAFT_JACCARD_SIG_DISABLE")
    monkeypatch.setattr(G, "BROADCAST_EDGE_LIMIT", 0)
    loc = G.run_jaccard_sig_build_job(spark, jsig_env)
    for rel in ("edges", "escores", "rascores", "ntri"):
        assert os.path.isdir(os.path.join(loc, rel)), rel
    meta = json.load(open(os.path.join(loc, "_jsig_meta.json")))
    assert set(meta["build_sec"]) == {"edges", "escores", "rascores", "ntri"}
    for n in names:
        df = QUERIES[n](spark, jsig_env)
        assert any(loc in f for f in df.inputFiles()), f"{n} must read cache"
        assert [tuple(r) for r in df.collect()] == inline[n], n
        release_persisted()


# ---------------------------------------------------------------------------
# r11 verdict #6 growth queries: incremental IVF maintenance, span-
# corruption packing stats, multimodal e2e twin. Each gets a
# driver-side replication or a cross-query reconciliation on top of
# its DuckDB oracle (which covers exact values at sf0.01).
# ---------------------------------------------------------------------------


def test_ivf_incremental_matches_numpy_replication(spark):
    """knn_ivf_incremental_assign vs an independent numpy replication
    of the whole pipeline at smoke scale: same frozen-centroid
    training (2 Lloyd iterations, exact integer-micro updates,
    lowest-c_id tie-break), same assignment, same micro-exact report."""
    import numpy as np

    from alexandria_pipeline_spark.catalog import load_table
    from alexandria_pipeline_spark.operators import similarity as S

    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])  # centroid c_id order = vec_id order
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cutoff = ids.max() * S.IVF_CUTOFF_PCT // 100
    base_m, new_m = ids <= cutoff, ids > cutoff

    def assign(xs, cents):
        # argmin squared-L2 via the same left-fold float32-promoted
        # arithmetic magnitude; ties to lowest c_id via argmin order
        d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1), d2.min(axis=1)

    cents = X[base_m][ids[base_m] < S.N_CENTROIDS]
    for _ in range(S.KMEANS_ITERS):
        lab, _ = assign(X[base_m], cents)
        nxt = []
        for c in range(len(cents)):
            mem = X[base_m][lab == c]
            if len(mem):
                s = np.round(mem * 1_000_000).astype(np.int64).sum(axis=0)
                q, r = np.divmod(s, len(mem))
                q = np.where((r != 0) & (s < 0), q + 1, q)  # truncating div
                nxt.append(q / 1e6)
        cents = np.array(nxt)

    def report(xs):
        lab, d2 = assign(xs, cents)
        out = {}
        for c in range(len(cents)):
            m = lab == c
            if m.any():
                sq = int(np.round(d2[m] * 1_000_000).astype(np.int64).sum())
                out[c] = (int(m.sum()), sq)
        return out

    b, n = report(X[base_m]), report(X[new_m])
    expected = []
    for c in sorted(b):
        nb, sqb = b[c]
        nn, sqn = n.get(c, (0, 0))
        expected.append(
            (
                c,
                nb,
                nn,
                nn * 1_000_000 // nb,
                sqb // nb,
                sqn // nn if nn else 0,
            )
        )
    got = [
        tuple(r)
        for r in QUERIES["knn_ivf_incremental_assign"](spark, SF_SMOKE).collect()
    ]
    release_persisted()
    assert got == expected and got


def test_span_corruption_reconciles_with_packing(spark):
    """Same bins, same doc/token counts as pack_sequences_contiguous;
    encoder + target token identity; boundary count = n_docs - 1."""
    from alexandria_pipeline_spark.operators import packing as P

    pack = {
        (r["lang"], r["bucket"], r["bin_id"]): (r["n_docs"], r["bin_tokens"])
        for r in QUERIES["pack_sequences_contiguous"](spark, SF_SMOKE).collect()
    }
    release_persisted()
    rows = QUERIES["pack_span_corruption_stats"](spark, SF_SMOKE).collect()
    release_persisted()
    assert rows
    got = {(r["lang"], r["bucket"], r["bin_id"]) for r in rows}
    assert got == set(pack)
    for r in rows:
        key = (r["lang"], r["bucket"], r["bin_id"])
        assert (r["n_docs"], r["bin_tokens"]) == pack[key]
        # every masked token and every sentinel is accounted exactly once
        assert (
            r["enc_tokens"] + r["tgt_tokens"]
            == r["bin_tokens"] + 2 * r["n_spans"]
        )
        assert r["n_boundaries"] == r["n_docs"] - 1
        assert 0 <= r["masked_tokens"] <= r["bin_tokens"] * P.SPAN_MASK_PCT // 100
        # ceil grouping: spans never exceed masked count, never under 1/len
        assert r["n_spans"] * P.SPAN_MEAN_LEN >= r["masked_tokens"]


def test_multimodal_e2e_reconciles(spark):
    """Split rows partition the gated corpus: raw-image total equals
    the driver-side gate population, clusters are disjoint, and
    dedup savings are exact."""
    from alexandria_pipeline_spark.catalog import load_table
    from alexandria_pipeline_spark.operators import multimodal as M

    doc_ids = [
        r["doc_id"]
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id").collect()
    ]
    gate_pop = 0
    gated_seeds = set()
    for did in doc_ids:
        seed = did % M.AHASH_SEEDS
        w, h = seed % 13 + 4, seed % 9 + 4
        if w * h >= M.MM_MIN_PX:
            gate_pop += 1
            gated_seeds.add(seed)
    rows = QUERIES["multimodal_e2e_training_prep"](spark, SF_SMOKE).collect()
    release_persisted()
    assert rows
    assert sum(r["n_raw_images"] for r in rows) == gate_pop
    # distinct payload formulas bound the cluster count from below:
    # identical seeds MUST collapse (aHash is deterministic in seed)
    assert sum(r["n_clusters"] for r in rows) <= len(gated_seeds)
    for r in rows:
        assert r["split"] in ("train", "val", "test")
        assert r["n_raw_images"] >= r["n_clusters"] >= 1
        assert (
            r["dup_savings_ppm"]
            == (r["n_raw_images"] - r["n_clusters"]) * 1_000_000 // r["n_raw_images"]
        )


def test_kcore_driver_peel_matches_distributed(spark, monkeypatch):
    """The r12 driver-side numpy peel (below KCORE_DRIVER_EDGE_LIMIT)
    must produce the EXACT summary row of the distributed peel — same
    fixpoint counts AND the same n_iterations — at both a pinned k
    that keeps a nonempty core and the adaptive mean-degree default
    (which cascades the smoke graph empty)."""
    for env_k in ("60", None):
        if env_k is None:
            monkeypatch.delenv("SPARK_GRAFT_KCORE_K", raising=False)
        else:
            monkeypatch.setenv("SPARK_GRAFT_KCORE_K", env_k)
        monkeypatch.delenv("SPARK_GRAFT_KCORE_FORCE_DIST", raising=False)
        drv = [tuple(r) for r in QUERIES["graph_kcore_summary"](spark, SF_SMOKE).collect()]
        release_persisted()
        monkeypatch.setenv("SPARK_GRAFT_KCORE_FORCE_DIST", "1")
        dist = [tuple(r) for r in QUERIES["graph_kcore_summary"](spark, SF_SMOKE).collect()]
        release_persisted()
        assert drv == dist and drv, f"k={env_k}: driver peel must be value-identical"
    monkeypatch.delenv("SPARK_GRAFT_KCORE_FORCE_DIST", raising=False)
