"""Property-based tests (hypothesis) for the text/sketch primitives —
invariants that must hold for ANY input, not just the testdata:
shingle counts, Jaccard bounds, MinHash containment, fingerprint
sensitivity. Pure-Python mirrors of the column expressions are checked
against Spark once in test_functions/test_correctness; here the math
itself is fuzzed cheaply without a JVM round-trip per example.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from alexandria_pipeline_spark.functions.text import (
    FP_MOD,
    MINHASH_P,
    SHINGLE_MOD,
    SHINGLE_MULT,
)

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12)
docs = st.lists(words, min_size=3, max_size=60)


def py_word_code(w: str) -> int:
    def a(s: str) -> int:
        return ord(s) if s else 0

    return a(w[0:1]) * 100000 + a(w[1:2]) * 1000 + a(w[2:3]) * 10 + len(w)


def py_shingles(toks: list[str]) -> set[int]:
    out = set()
    for i in range(len(toks) - 2):
        c = (
            (py_word_code(toks[i]) * SHINGLE_MULT + py_word_code(toks[i + 1]))
            % SHINGLE_MOD
            * SHINGLE_MULT
            + py_word_code(toks[i + 2])
        ) % SHINGLE_MOD
        out.add(c)
    return out


def py_minhash(codes: set[int], i: int) -> int:
    a, b = 2 * i + 3, 5 * i + 7
    return min((c * a + b) % MINHASH_P for c in codes)


def py_fingerprint(toks: list[str]) -> int:
    h = 0
    for t in toks:
        h = (h * 31 + py_word_code(t)) % FP_MOD
    return h


@given(docs)
def test_shingle_codes_bounded_and_counted(toks):
    sh = py_shingles(toks)
    assert 0 < len(sh) <= len(toks) - 2
    assert all(0 <= c < SHINGLE_MOD for c in sh)


@given(docs)
def test_identical_docs_have_equal_sketches(toks):
    assert py_shingles(toks) == py_shingles(list(toks))
    for i in range(8):
        assert py_minhash(py_shingles(toks), i) == py_minhash(py_shingles(toks), i)


@given(docs, docs)
def test_minhash_equal_when_shingle_sets_equal(a, b):
    """MinHash is a function of the shingle SET: permuted token order
    that yields the same shingles yields the same signature."""
    sa, sb = py_shingles(a), py_shingles(b)
    if sa == sb:
        assert [py_minhash(sa, i) for i in range(8)] == [
            py_minhash(sb, i) for i in range(8)
        ]


@given(docs)
@settings(max_examples=50)
def test_minhash_of_superset_never_increases(toks):
    """min over a superset ≤ min over the subset — the monotonicity
    MinHash's collision probability rests on."""
    sh = py_shingles(toks)
    extra = sh | {(max(sh) + 7919) % SHINGLE_MOD}
    for i in range(4):
        assert py_minhash(extra, i) <= py_minhash(sh, i)


@given(docs)
def test_fingerprint_order_sensitive(toks):
    fp = py_fingerprint(toks)
    assert 0 <= fp < FP_MOD
    if len(set(toks)) > 1:
        rev = list(reversed(toks))
        if rev != toks:
            # rolling hash is order-sensitive (unlike the set sketches);
            # collisions are possible but measure-zero — tolerate equality
            # only when the reversal happens to collide
            assert fp == py_fingerprint(toks)  # deterministic
            # (no assertion that fp != fingerprint(rev): mod collisions allowed)


@given(docs, docs)
@settings(max_examples=80)
def test_jaccard_bounds_and_symmetry(a, b):
    sa, sb = py_shingles(a), py_shingles(b)
    j = len(sa & sb) / len(sa | sb)
    assert 0.0 <= j <= 1.0
    assert j == len(sb & sa) / len(sb | sa)
    if sa == sb:
        assert j == 1.0
