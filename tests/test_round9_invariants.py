"""Extreme-fixture net for the six round-8-added queries (r8 verdict
#8): the Mann-Kendall trunc-vs-round divergence the builder caught at
sf0.001 (commit db18aab) is exactly the class these exist for — the
driver testdata never exercises the magnitudes/shapes where encodings
and ANSI arithmetic break.

The two orders-based queries (orders_mann_kendall_trend,
sample_priority_weighted) ride the price-scaled extreme net in
test_extreme_values.py; the four text queries get a handcrafted
corpus here with the shapes that broke (or would have broken) them:

  - a >1e6-token document, so the boilerplate representative key's
    old doc_id*1e6+pos packing would bleed position into doc_id
    (the ADVICE-r8 finding the SPAN_REP_MULT=2^32 fix addressed) —
    the test asserts the reconstructed span TEXT is byte-correct at a
    position > 1e6;
  - empty / single-token / all-identical-token documents (degenerate
    splitter and window inputs);
  - exact window-boundary lengths for MATTR (24/25/26 tokens).
"""

from __future__ import annotations

import pytest

from alexandria_pipeline_spark import QUERIES, register_all

from tests.conftest import SF_SMOKE

BIG_POS = 1_000_123  # 0-based token index of the planted span: > 1e6


@pytest.fixture(scope="module")
def extreme_docs_dir(tmp_path_factory, spark) -> str:
    register_all()
    out = str(tmp_path_factory.mktemp("extreme_docs"))
    # Planted span: tokens with DISTINCT word_codes ("q" block, len 3)
    # whose sequence can never occur in the filler (filler varies c1
    # fastest; this varies c3 with c1c2 fixed).
    span = ["q" + "a" + chr(97 + i) for i in range(10)]
    # doc 1: ~1.05M filler tokens, the planted span at 0-based BIG_POS.
    # word_code() is a coarse feature hash (first 3 chars + length), so
    # "unique" tokens like f{i} collide wholesale and filler spans
    # repeat ~1e5 times (measured). Instead the filler token's CODE is
    # a bijection of (i mod 17576, i mod 41) — 3 base-26 letters plus a
    # suffix of i%41 'z's. word_code's length coefficient is 1 with a
    # c3 stride of only 10, so (c3, len) still alias — the residual
    # filler period is ~123k and the collision ceilings are documented
    # at the doc list below.
    def tok(i: int) -> str:
        letters = (
            chr(97 + i % 26)
            + chr(97 + (i // 26) % 26)
            + chr(97 + (i // 676) % 26)
        )
        return letters + "z" * (i % 41)

    big = [tok(i) for i in range(1_050_000)]
    big[BIG_POS : BIG_POS + 10] = span
    # Two ceilings bound the filler counts: each filler 10-gram repeats
    # <= ceil(1.05M / 123,032) = 9 times, and the span code lives in a
    # ~1e9 universe where ~123k distinct filler codes yield a handful
    # of 2-way collisions (measured: a merged bucket reached 17), so
    # the worst filler bucket is <= 18. The planted span occurs 31
    # times (30 in doc 2 with unique separators that break overlap
    # spans, 1 in doc 1 at BIG_POS) — strictly the corpus max, with
    # the arg-min representative in doc 1 (smallest doc_id).
    doc2 = []
    for k in range(30):
        doc2 += span + ["z" + chr(97 + k % 26) + chr(97 + k // 26)]
    docs = [
        (1, " ".join(big), "en", "big", len(" ".join(big))),
        (2, " ".join(doc2), "en", "small", 0),
        (3, "", "en", "empty", 0),
        (4, "solo", "en", "one", 4),
        (5, " ".join(["same"] * 26), "en", "mono", 0),
        (6, " ".join([f"u{i}" for i in range(24)]), "fr", "w24", 0),
        (7, " ".join([f"v{i}" for i in range(25)]), "fr", "w25", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_boilerplate_rep_decodes_past_1e6_tokens(spark, extreme_docs_dir):
    from alexandria_pipeline_spark.operators.text_analysis import SPAN_REP_MULT

    assert SPAN_REP_MULT > 1_200_000  # the packing bound the fix widened
    rows = QUERIES["text_boilerplate_spans"](spark, extreme_docs_dir).collect()
    assert rows, "planted span must be detected"
    top = rows[0]
    # the planted span: 30 in doc 2 + 1 deep past 1e6 in doc 1
    assert top["n_occurrences"] == 31
    assert top["n_docs"] == 2
    # rep = min(doc_id, pos) = doc 1 at BIG_POS — under the old 1e6
    # multiplier this decoded into the WRONG document and offset; the
    # reconstructed text proves the decode end-to-end.
    assert top["span_text"] == " ".join("qa" + chr(97 + i) for i in range(10))


def test_mattr_window_boundaries_and_mono_doc(spark, extreme_docs_dir):
    rows = {
        r["lang"]: r
        for r in QUERIES["text_mattr_lexical_diversity"](
            spark, extreme_docs_dir
        ).collect()
    }
    # fr: the 24-token doc is below the 25-token window and EXCLUDED;
    # the 25-token all-distinct doc has exactly one window, mattr = 1.0
    assert rows["fr"]["n_docs"] == 1
    assert rows["fr"]["avg_mattr_milli"] == 1000
    # en: the 26-token monotone doc (2 windows of 1 distinct ->
    # per-doc mattr_milli = 2*1000 // (2*25) = 40), the 1.05M-token
    # doc, and the 330-token planted doc; empty and solo excluded.
    assert rows["en"]["n_docs"] == 3


def test_sentence_stats_degenerate_docs(spark, extreme_docs_dir):
    rows = {
        r["lang"]: r
        for r in QUERIES["text_sentence_split_stats"](
            spark, extreme_docs_dir
        ).collect()
    }
    en = rows["en"]
    # every non-null doc contributes; the empty doc still forms one
    # (empty) chunk row group per the chunking arithmetic in both
    # engines — the assertion is cross-field consistency, not a magic
    # number: milli-average must equal its exact integer definition.
    assert en["avg_sent_tokens_milli"] == en["sum_tokens"] * 1000 // en["n_sentences"]
    assert en["n_docs"] >= 4
    assert en["n_exclaim"] + en["n_question"] <= en["n_sentences"]


def test_rake_mono_corpus_scores_exact(spark, extreme_docs_dir):
    rows = QUERIES["text_keyphrase_rake"](spark, extreme_docs_dir).collect()
    # no stopwords planted -> every phrase is a full stopword-free run
    # capped at RAKE_MAX_PLEN; scores must be positive exact micros and
    # the ordering key must be internally consistent.
    assert rows
    scores = [r["phrase_score_micro"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_rake_score_arithmetic_survives_9e12_degree(spark):
    """The ADVICE-r8 overflow class, tested at the expression level:
    deg*1e6 for deg near 9.2e12 overflows int64 (DuckDB raises,
    non-ANSI Spark wraps) — the widened DECIMAL(38,0)/HUGEINT forms
    must agree exactly at that magnitude. Driving 3e12 phrase
    occurrences through the full query is infeasible; the formula is
    what diverges, so the formula is what's pinned."""
    import duckdb
    from pyspark.sql import functions as F

    deg, freq = 9_200_000_000_000, 7
    spark_val = (
        spark.range(1)
        .select(
            F.expr(
                f"CAST(CAST({deg} AS DECIMAL(38,0)) * 1000000 div {freq}"
                " AS BIGINT)"
            ).alias("v")
        )
        .collect()[0]["v"]
    )
    duck_val = duckdb.sql(
        f"SELECT CAST(CAST({deg} AS HUGEINT) * 1000000 // {freq} AS BIGINT)"
    ).fetchone()[0]
    assert spark_val == duck_val == deg * 1_000_000 // freq


# --------------------------------------------------------------------------
# Round-9 surface additions: graph_label_propagation and
# corpus_source_overlap_matrix.


@pytest.fixture(scope="module")
def two_clique_dir(tmp_path_factory) -> str:
    """A lineitem fixture whose co-purchase graph is two triangles
    {1,2,3} and {4,5,6} bridged by one edge (3,4): orders 1 and 2 are
    the cliques, order 3 is the bridge. Hand-simulating 4 synchronous
    LPA iterations with min-label tie-break gives communities
    {1,2,3}->1 and {4,5,6}->3 (the bridge never flips a triangle)."""
    import duckdb

    out = tmp_path_factory.mktemp("two_clique")
    rows = [(1, p) for p in (1, 2, 3)] + [(2, p) for p in (4, 5, 6)] + [
        (3, 3),
        (3, 4),
    ]
    con = duckdb.connect()
    con.sql(
        "COPY (SELECT CAST(c0 AS BIGINT) AS l_orderkey, CAST(c1 AS BIGINT)"
        " AS l_partkey FROM (VALUES "
        + ", ".join(f"({o}, {p})" for o, p in rows)
        + ") t(c0, c1)) TO '"
        + str(out)
        + "/lineitem.parquet' (FORMAT PARQUET)"
    )
    return str(out)


def test_lpa_two_cliques_known_communities(spark, two_clique_dir):
    """LPA on the hand-simulable bridged-triangles graph lands exactly
    on the pen-and-paper fixpoint: community 1 for {1,2,3}, community 3
    for {4,5,6} — exercising BOTH tie-break arms (most-frequent wins on
    the bridge nodes, smallest-label wins inside each triangle)."""
    register_all()
    got = {
        r.part_id: r.community
        for r in QUERIES["graph_label_propagation"](spark, two_clique_dir).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_lpa_one_label_per_node_and_label_closure(spark):
    """Every co-purchase node gets exactly one community, and every
    community id is itself a node id (labels only propagate, never
    invent)."""
    register_all()
    rows = QUERIES["graph_label_propagation"](spark, SF_SMOKE).collect()
    nodes = {r.part_id for r in rows}
    assert len(rows) == len(nodes)  # one row per node
    assert {r.community for r in rows} <= nodes


def test_source_overlap_matrix_accounts_every_pair(spark):
    """The syndication matrix is a complete partition of the MinHash
    pair graph: n_pairs sums to the pair count, keys are ordered
    (source_a <= source_b), and cross_source is exactly the
    off-diagonal flag."""
    register_all()
    rows = QUERIES["corpus_source_overlap_matrix"](spark, SF_SMOKE).collect()
    n_pairs_total = QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).count()
    assert sum(r.n_pairs for r in rows) == n_pairs_total
    assert all(r.source_a <= r.source_b for r in rows)
    assert all(r.cross_source == (r.source_a != r.source_b) for r in rows)
