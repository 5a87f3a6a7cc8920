"""Round-11 invariants: the written-once jaccard signature relation
(operators/graph.py run_jaccard_sig_build_job — r10 verdict #3, the
shingle-sketch economics applied to the graph family's only >10x
scaler) and the stage-level shuffle-audit rebuild's metric source.

Value identity is the bar everywhere: the materialized read path must
be bitwise the inline plan's output, below-gate metas must not change
the exact path, and stale sources must fall back inline.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from alexandria_pipeline_spark import QUERIES
from alexandria_pipeline_spark.operators import graph as G
from alexandria_pipeline_spark.registry import release_persisted
from tests.conftest import SF_SMOKE


@pytest.fixture()
def jsig_env(tmp_path, monkeypatch):
    """Isolated cache root + a writable copy of the smoke lineitem so
    the stale test can mutate the source without touching testdata."""
    cache = tmp_path / "cache"
    monkeypatch.setenv("SPARK_GRAFT_SKETCH_CACHE", str(cache))
    monkeypatch.delenv("SPARK_GRAFT_JACCARD_SIG_DISABLE", raising=False)
    sf_copy = tmp_path / "sf"
    sf_copy.mkdir()
    src = os.path.join(SF_SMOKE, "lineitem.parquet")
    dst = sf_copy / "lineitem.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)
    return str(sf_copy)


def _rows(spark, sf_dir):
    out = [tuple(r) for r in QUERIES["graph_jaccard_neighbors"](spark, sf_dir).collect()]
    release_persisted()
    return out


def test_below_gate_build_writes_meta_only_and_exact_path_unchanged(
    spark, jsig_env
):
    base = _rows(spark, jsig_env)
    loc = G.run_jaccard_sig_build_job(spark, jsig_env)
    meta = json.load(open(os.path.join(loc, "_jsig_meta.json")))
    assert meta["below_gate"] is True
    assert meta["raw_pairs"] > 0
    assert not os.path.exists(os.path.join(loc, "edges"))
    # the fresh meta supplies raw_pairs; the exact plan and its values
    # are unchanged
    assert G.jaccard_sig_meta(jsig_env)["raw_pairs"] == meta["raw_pairs"]
    assert _rows(spark, jsig_env) == base


def test_above_gate_read_path_is_value_identical_to_inline(
    spark, jsig_env, monkeypatch
):
    monkeypatch.setattr(G, "BROADCAST_EDGE_LIMIT", 0)
    monkeypatch.setenv("SPARK_GRAFT_JACCARD_SIG_DISABLE", "1")
    inline = _rows(spark, jsig_env)
    monkeypatch.delenv("SPARK_GRAFT_JACCARD_SIG_DISABLE")
    loc = G.run_jaccard_sig_build_job(spark, jsig_env)
    meta = json.load(open(os.path.join(loc, "_jsig_meta.json")))
    assert meta["K"] in (G.JACCARD_SKETCH_K, G.JACCARD_SKETCH_K // 2)
    assert os.path.isdir(os.path.join(loc, "edges"))
    assert os.path.isdir(os.path.join(loc, "sigs"))
    # the read path really serves the materialization...
    df = QUERIES["graph_jaccard_neighbors"](spark, jsig_env)
    assert any(loc in f for f in df.inputFiles())
    # ...and is bitwise the inline sketch plan's output
    assert [tuple(r) for r in df.collect()] == inline
    release_persisted()
    # the parquet signature columns match the inline frame's names and
    # types (a type drift would change downstream overflow semantics
    # silently; parquet round-trips relax nullability, which is fine)
    sigs = spark.read.parquet(os.path.join(loc, "sigs"))
    inline_sigs = G._jaccard_sigs(G._jaccard_edges(spark, jsig_env), meta["K"])
    assert [(f.name, f.dataType) for f in sigs.schema] == [
        (f.name, f.dataType) for f in inline_sigs.schema
    ]


def test_stale_lineitem_falls_back_inline(spark, jsig_env, monkeypatch):
    monkeypatch.setattr(G, "BROADCAST_EDGE_LIMIT", 0)
    loc = G.run_jaccard_sig_build_job(spark, jsig_env)
    assert G.jaccard_sig_meta(jsig_env) is not None
    # regenerate the source: rewrite lineitem.parquet (new mtime/size)
    src = os.path.join(jsig_env, "lineitem.parquet")
    df = spark.read.parquet(src).limit(100)
    tmp_out = jsig_env + "_regen"
    df.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    shutil.rmtree(src) if os.path.isdir(src) else os.remove(src)
    shutil.move(tmp_out, src)
    # digest moved -> meta no longer fresh; the query must not read the
    # stale materialization (its digest-keyed location no longer matches)
    assert G.jaccard_sig_meta(jsig_env) is None
    df2 = QUERIES["graph_jaccard_neighbors"](spark, jsig_env)
    assert not any(loc in f for f in df2.inputFiles())
    df2.collect()
    release_persisted()


def test_disable_env_forces_inline(spark, jsig_env, monkeypatch):
    monkeypatch.setattr(G, "BROADCAST_EDGE_LIMIT", 0)
    loc = G.run_jaccard_sig_build_job(spark, jsig_env)
    monkeypatch.setenv("SPARK_GRAFT_JACCARD_SIG_DISABLE", "1")
    df = QUERIES["graph_jaccard_neighbors"](spark, jsig_env)
    assert not any(loc in f for f in df.inputFiles())
    release_persisted()


def test_build_job_is_idempotent_when_fresh(spark, jsig_env, monkeypatch):
    monkeypatch.setattr(G, "BROADCAST_EDGE_LIMIT", 0)
    loc = G.run_jaccard_sig_build_job(spark, jsig_env)
    meta_path = os.path.join(loc, "_jsig_meta.json")
    mtime = os.stat(meta_path).st_mtime_ns
    assert G.run_jaccard_sig_build_job(spark, jsig_env) == loc
    assert os.stat(meta_path).st_mtime_ns == mtime  # no rebuild
