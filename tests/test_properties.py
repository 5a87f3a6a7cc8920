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


# --------------------------------------------------------------------------
# Round-3 primitives: pure-Python mirrors of the codec + sketch math,
# fuzzed without a JVM round trip.
# --------------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_any_image(w, h, seed):
    """encode→inflate→decode is the identity on stats for ANY gray8
    image, any dimensions."""
    import numpy as np

    from alexandria_pipeline_spark.operators.multimodal import (
        decode_png_gray8,
        encode_png_gray8,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    ww, hh, s, lo, hi = decode_png_gray8(encode_png_gray8(w, h, px))
    assert (ww, hh) == (w, h)
    assert s == int(px.sum()) and lo == int(px.min()) and hi == int(px.max())


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=14),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_any_image(w, h, seed):
    import numpy as np

    from alexandria_pipeline_spark.operators.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64)
    data = encode_bmp24(w, h, lambda x, y: tuple(int(v) for v in px[y, x]))
    ww, hh, sr, sg, sb = decode_bmp24(data)
    assert (ww, hh) == (w, h)
    assert (sr, sg, sb) == tuple(int(px[:, :, i].sum()) for i in range(3))


@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=0, max_size=200))
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_any_samples(samples):
    from alexandria_pipeline_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rate, n, sum_abs, sum_sq, peak = decode_wav_pcm16(
        encode_wav_pcm16(16000, samples)
    )
    assert n == len(samples)
    assert sum_abs == sum(abs(s) for s in samples)
    assert sum_sq == sum(s * s for s in samples)
    assert peak == max((abs(s) for s in samples), default=0)


def _py_zvalue(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.integers(min_value=0, max_value=2**16 - 1),
    st.integers(min_value=0, max_value=2**16 - 1),
    st.integers(min_value=0, max_value=2**16 - 1),
    st.integers(min_value=0, max_value=2**16 - 1),
)
@settings(max_examples=200, deadline=None)
def test_zvalue_is_monotone_per_dimension(a1, b1, a2, b2):
    """Morton order preserves dominance: if a1<=a2 AND b1<=b2 then
    z(a1,b1) <= z(a2,b2) — the property that makes min/max file stats
    usable for 2-D pruning."""
    if a1 <= a2 and b1 <= b2:
        assert _py_zvalue(a1, b1) <= _py_zvalue(a2, b2)


@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=500))
@settings(max_examples=60, deadline=None)
def test_kmv_estimate_error_bound(keys):
    """Pure-Python KMV mirror: estimate within 4/sqrt(k) of the true
    distinct count for any key multiset (generous vs the 1/sqrt(k)
    typical error)."""
    from alexandria_pipeline_spark.operators.relational_ext import (
        KMV_K,
        _KMV_A,
        _KMV_B,
        _KMV_M,
    )

    hs = sorted({((k * _KMV_A + _KMV_B) % _KMV_M * _KMV_A + _KMV_B) % _KMV_M
                 for k in keys})
    n = len(set(keys))
    if len(hs) < KMV_K:
        est = len(hs)
    else:
        est = (KMV_K - 1) * _KMV_M // hs[KMV_K - 1]
    assert abs(est - n) <= max(2, 4 / (KMV_K ** 0.5) * n)
