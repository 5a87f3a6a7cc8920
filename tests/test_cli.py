"""CLI surface: the reference's script entry points as
`python -m alexandria_pipeline_spark <cmd>` (run in-process via main()
to reuse the session fixture — each subprocess would pay ~15s JVM
boot)."""

from __future__ import annotations

import tempfile

import pytest

from tests.conftest import SF_SMOKE


def _run(argv):
    from alexandria_pipeline_spark.__main__ import main

    return main(argv)


@pytest.fixture(autouse=True)
def _keep_session(spark, monkeypatch):
    """main() stops the session on exit; keep the shared fixture alive
    by making stop a no-op inside CLI tests."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    yield


def test_cli_embed_test_mode(spark, capsys):
    out = tempfile.mkdtemp(prefix="apspark_cli_")
    rc = _run(["--sf-dir", SF_SMOKE, "embed", "--out", out, "--test"])
    assert rc == 0
    assert "embedded rows=64" in capsys.readouterr().out


def test_cli_filter_long(spark, capsys):
    out = tempfile.mkdtemp(prefix="apspark_cli_f_")
    rc = _run(["--sf-dir", SF_SMOKE, "filter-long", "--out", out, "--min-tokens", "64"])
    assert rc == 0
    assert "kept rows=" in capsys.readouterr().out


def test_cli_query_known_and_unknown(spark, capsys):
    rc = _run(["--sf-dir", SF_SMOKE, "query", "q1_pricing_summary"])
    assert rc == 0
    assert "l_returnflag" in capsys.readouterr().out
    rc = _run(["--sf-dir", SF_SMOKE, "query", "nope_not_real"])
    assert rc == 2
    assert "unknown query" in capsys.readouterr().out


def test_cli_embed_chunked_and_consolidate(spark, capsys):
    out_c = tempfile.mkdtemp(prefix="apspark_cli_c_")
    rc = _run(["--sf-dir", SF_SMOKE, "embed-chunked", "--out", out_c])
    assert rc == 0
    assert "pooled rows=500" in capsys.readouterr().out

    out_t = tempfile.mkdtemp(prefix="apspark_cli_t_")
    out_a = tempfile.mkdtemp(prefix="apspark_cli_a_")
    out_m = tempfile.mkdtemp(prefix="apspark_cli_m_")
    assert _run(["--sf-dir", SF_SMOKE, "embed", "--out", out_t, "--test"]) == 0
    assert _run(["--sf-dir", SF_SMOKE, "embed", "--out", out_a, "--test"]) == 0
    capsys.readouterr()
    rc = _run(
        ["consolidate", "--titles", out_t, "--abstracts", out_a, "--out", out_m]
    )
    assert rc == 0
    assert "merged rows=64" in capsys.readouterr().out
