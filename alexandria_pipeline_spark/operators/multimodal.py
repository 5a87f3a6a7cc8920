"""Multimodal columns: opaque binary payloads + typed metadata.

Design (north-star spec): image/audio/video payloads travel as
`binary` columns next to typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched functions over
`mapInPandas`, so the JVM never interprets the bytes and Python sees
them zero-copy per batch.

The container has no image/audio libs, but three formats need none:
24-bit BMP, gray8 PNG (stdlib zlib inflate), and PCM16 WAV are parsed
for real by the in-repo pure-Python codecs, and real-mode
decode_image_features routes through them by magic sniff. Only
genuinely absent codecs (JPEG, MP3, …) raise NotImplementedError at
the seam; fake mode computes deterministic pseudo-metadata from the
bytes for payloads of any format, keeping the Spark-side plumbing
(schema, batch iteration, partitioning) testable either way
(tests/test_multimodal.py).

The oracle-checked query below exercises the binary column path that
IS computable without codecs: payload length, magic prefix, content
digest.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from alexandria_pipeline_spark.catalog import load_table, spread_to_cores
from alexandria_pipeline_spark.registry import query

# Canonical multimodal record: payload + typed metadata. At 100 TB the
# payload column dominates — keep it OUT of any shuffle by extracting
# features first, then joining features back by key if needed.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _decode_real_features(b: bytes) -> tuple[int, int, list[float]]:
    """Real-mode dispatch over the in-repo codecs by magic sniff:

    - BMP (24-bit)   → (width, height, [sum_r, sum_g, sum_b])
    - PNG (gray8)    → (width, height, [sum_lum, min_lum, max_lum])
    - WAV (PCM16)    → (n_samples, 1,  [sum_abs, sum_sq, peak])

    Raises NotImplementedError ONLY for formats with no in-repo codec
    (JPEG, MP3, …) — that is the true external-library seam. A
    recognized container that fails to parse raises ValueError, which
    the batch loop maps to drop-row (the same drop-vs-fail contract as
    the per-format decoders)."""
    if b[:2] == b"BM":
        w, h, sr, sg, sb = decode_bmp24(b)
        return w, h, [float(sr), float(sg), float(sb)]
    if b[:8] == _PNG_SIG:
        w, h, s, lo, hi = decode_png_gray8(b)
        return w, h, [float(s), float(lo), float(hi)]
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        _rate, n, sa, sq, pk = decode_wav_pcm16(b)
        return n, 1, [float(sa), float(sq), float(pk)]
    raise NotImplementedError(
        f"no in-repo codec for magic {bytes(b[:4])!r}; BMP/PNG/WAV decode "
        "natively — install pillow/soundfile for JPEG, MP3, etc."
    )


def decode_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract over mapInPandas.

    Real mode routes through the in-repo pure-Python codecs (24-bit
    BMP, gray8 PNG, PCM16 WAV — see _decode_real_features) and raises
    NotImplementedError only for genuinely absent codecs (JPEG, …).
    Fake mode derives deterministic pseudo width/height/features from
    the raw bytes so the distributed plumbing is testable on payloads
    of ANY format.

    mapInPandas (not a scalar UDF) because decode is 1-row→1-row but
    wants per-batch library state and may drop undecodable rows —
    an iterator of DataFrames models that; Arrow moves the binary
    column without copies.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                rows = {
                    k: []
                    for k in ("media_id", "n_bytes", "width", "height", "features")
                }
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    b = bytes(payload)
                    try:
                        w, h, feats = _decode_real_features(b)
                    except ValueError:
                        continue  # recognized container, corrupt body: drop
                    rows["media_id"].append(mid)
                    rows["n_bytes"].append(len(b))
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["features"].append(feats)
                yield pd.DataFrame(rows)
                continue
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": (pdf["payload"].map(len) % 640 + 16).astype("int32"),
                    "height": (pdf["payload"].map(len) % 480 + 16).astype("int32"),
                    "features": pdf["payload"].map(
                        lambda b: [float(len(b)), float(b[0]) if len(b) else 0.0,
                                   float(b[-1]) if len(b) else 0.0]
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling stub: 1 row → n rows (one per pseudo-frame).
    Real codec goes at the same seam; the explode-shaped output and
    per-batch iteration are the actual contract."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_offset", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_offset": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // every_n_bytes)
                for i in range(n_frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(i * every_n_bytes)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema)


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT
      doc_id,
      octet_length(encode(text))  AS n_bytes,
      substring(text, 1, 4)       AS magic,
      md5(text)                   AS digest
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata path (documents.text cast to binary as
    the payload stand-in — the testdata ships no true media table):
    size, magic-prefix sniff, content digest. These are the operations
    that must NOT require decode at scale — they run on the raw bytes
    in codegen."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.substring("text", 1, 4).alias("magic"),
        F.md5(payload).alias("digest"),
    )


@query("multimodal_decode_features")  # rows-only: decode stub is not SQL
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing on the binary stand-in payloads:
    binary column → mapInPandas decode (deterministic fake) → typed
    feature rows. Rows-only driver check (Arrow/mapInPandas is not
    oracle-SQL); values are still deterministic and unit-tested.

    The decode API returns an array<double> feature column (internal
    format); the registered query unpacks it to scalar f0/f1/f2 so the
    output is canonicalizable by any harness."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
    decoded = decode_image_features(media, fake=True)
    return decoded.select(
        "media_id",
        "n_bytes",
        "width",
        "height",
        F.element_at("features", 1).alias("f_len"),
        F.element_at("features", 2).alias("f_first_byte"),
        F.element_at("features", 3).alias("f_last_byte"),
    )


# --------------------------------------------------------------------------
# REAL decode seam: uncompressed 24-bit BMP, parsed in pure Python.
# The container ships no codec libraries, but BMP needs none — so this
# path is decode-for-real end to end: synthesize bytes -> mapInPandas
# parse (file header, DIB header, 4-byte row padding) -> exact channel
# sums, verified against an arithmetic oracle (the pixel formula is
# deterministic in doc_id, so DuckDB can compute the expected sums
# without ever seeing the bytes).
# --------------------------------------------------------------------------
import struct

import numpy as np


def encode_bmp24(width: int, height: int, pixel) -> bytes:
    """Minimal BITMAPINFOHEADER 24-bit BMP writer. `pixel(x, y)` returns
    (r, g, b); rows are bottom-up and padded to 4 bytes per the spec."""
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    img_size = (row_raw + pad) * height
    off = 14 + 40
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    out += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 0, 0, 0, 0)
    for y in range(height - 1, -1, -1):  # bottom-up row order
        for x in range(width):
            r, g, b = pixel(x, y)
            out += bytes((b, g, r))  # BGR on disk
        out += b"\x00" * pad
    return bytes(out)


def decode_bmp24(data: bytes) -> tuple[int, int, int, int, int]:
    """Parse a 24-bit BMP: returns (width, height, sum_r, sum_g, sum_b)
    with exact integer channel sums. Raises ValueError on anything that
    isn't an uncompressed 24-bit BMP — the caller decides drop vs fail.

    Channel sums are numpy `frombuffer` + strided reshape, not a
    per-byte Python loop: inside a mapInPandas batch the decode cost
    is one vectorized pass per payload (~100× the byte loop this
    replaced — decode was the priciest non-dedup bench query)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    try:
        off = struct.unpack_from("<I", data, 10)[0]
        width, height = struct.unpack_from("<ii", data, 18)[0:2]
        bpp = struct.unpack_from("<H", data, 28)[0]
        compression = struct.unpack_from("<I", data, 30)[0]
    except struct.error as exc:  # truncated header
        raise ValueError("truncated BMP header") from exc
    if bpp != 24 or compression != 0 or height <= 0 or width <= 0:
        raise ValueError("unsupported BMP variant")
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    if len(data) < off + stride * height:
        raise ValueError("truncated BMP body")
    px = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=off)
    px = px.reshape(height, stride)[:, :row_raw].reshape(height, width, 3)
    sb, sg, sr = px.sum(axis=(0, 1), dtype=np.int64)  # BGR on disk
    return width, height, int(sr), int(sg), int(sb)


def bmp_formula_payload(did: int) -> bytes:
    """Deterministic 24-bit BMP for doc `did` (pixel channels are
    modular formulas in doc_id/x/y — the oracle recomputes the sums
    from the formula). Vectorized twin of encode_bmp24: the per-pixel
    Python callback was the bench hot spot; numpy builds the whole BGR
    plane in three broadcast expressions."""
    w, h = did % 13 + 4, did % 9 + 4
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (did * 7 + x * 3 + y * 5) % 256
    g = (did * 11 + x + y * 2) % 256
    b = (did * 13 + x * 2 + y) % 256
    bgr = np.stack(
        [b, g, r], axis=-1
    ).astype(np.uint8)[::-1]  # BGR on disk, bottom-up rows
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    rows = bgr.reshape(h, row_raw)
    if pad:
        rows = np.concatenate(
            [rows, np.zeros((h, pad), dtype=np.uint8)], axis=1
        )
    off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", off + rows.size, 0, 0, off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, rows.size, 0, 0, 0, 0
    )
    return header + rows.tobytes()


BMP_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def decode_bmp_stats(df: DataFrame) -> DataFrame:
    """REAL-mode decode over mapInPandas: per batch, parse each BMP
    payload and emit exact channel statistics. Undecodable payloads are
    dropped (the batch iterator shape makes row-dropping natural —
    exactly why decode is mapInPandas, not a 1:1 scalar UDF)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "width", "height", "sum_r", "sum_g", "sum_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, sr, sg, sb = decode_bmp24(bytes(payload))
                except ValueError:
                    continue
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(sr)
                rows["sum_g"].append(sg)
                rows["sum_b"].append(sb)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, BMP_STATS_SCHEMA)


@query(
    "multimodal_decode_bmp",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(doc_id % 13 + 4 AS INT) AS width,
             CAST(doc_id % 9 + 4 AS INT)  AS height
      FROM documents
    ),
    px AS (
      SELECT doc_id, width, height,
             CAST((doc_id * 7 + x * 3 + y * 5) % 256 AS BIGINT) AS r,
             CAST((doc_id * 11 + x + y * 2) % 256 AS BIGINT)    AS g,
             CAST((doc_id * 13 + x * 2 + y) % 256 AS BIGINT)    AS b
      FROM dims
      CROSS JOIN LATERAL (SELECT unnest(range(0, width)) AS x)
      CROSS JOIN LATERAL (SELECT unnest(range(0, height)) AS y)
    )
    SELECT doc_id AS media_id, width, height,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, width, height
    """,
)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END real decode: deterministic 24-bit BMPs are
    synthesized per document (pixel channels are modular formulas in
    doc_id/x/y), shipped as binary payloads, and decoded back by
    parsing actual BMP bytes — headers, BGR order, bottom-up rows,
    4-byte padding. The oracle computes the same channel sums from the
    pixel FORMULA, so a hash match proves the byte round-trip, not
    just the plumbing. Both hops are mapInPandas (Arrow moves the
    binary column zero-copy); the plan is map-only, no shuffle."""

    def make_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"media_id": ids, "payload": [bmp_formula_payload(did) for did in ids]}
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = d.mapInPandas(make_payloads, "media_id long, payload binary")
    return decode_bmp_stats(media)


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT
      doc_id AS media_id,
      CAST(f AS INT)        AS frame_idx,
      CAST(f * 1024 AS BIGINT) AS frame_offset
    FROM documents
    CROSS JOIN LATERAL (
      SELECT unnest(range(0, greatest(1, octet_length(encode(text)) // 1024))) AS f
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling as a registered op: 1 media row → n pseudo-frame
    rows (one per 1024-byte stride) through the mapInPandas seam where
    a real demuxer would go. The oracle recomputes the frame fan-out
    from octet_length alone, so the hash check verifies the explode
    shape and offsets exactly — the Spark side still walks real bytes
    through Arrow. Map-only plan; the payload column never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    return sample_video_frames(media, every_n_bytes=1024)


# --------------------------------------------------------------------------
# REAL decode seam #2: RIFF/WAVE PCM16 audio, parsed in pure Python.
# Like the BMP path above, WAV PCM needs no codec library, so the audio
# modality gets a true bytes-in → stats-out decode: synthesize wave
# files whose samples follow a modular formula in doc_id, parse the
# RIFF container back (chunk walk, fmt validation, LE int16 frames),
# and emit exact integer sample statistics the oracle recomputes from
# the formula alone.
# --------------------------------------------------------------------------


def encode_wav_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Minimal RIFF/WAVE writer: PCM format chunk + one data chunk,
    mono 16-bit little-endian."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = bytearray()
    out += struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(body), b"WAVE")
    out += struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
    out += struct.pack("<4sI", b"data", len(body)) + body
    return bytes(out)


def decode_wav_samples(data: bytes) -> tuple[int, "np.ndarray"]:
    """Walk the RIFF chunks of a PCM16 mono WAV; returns
    (sample_rate, samples as int64 array). Raises ValueError on
    anything that isn't PCM16 mono — the shared byte-walk under both
    the stats decode and the loudness analysis."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (need PCM16 mono)")
        elif cid == b"data":
            samples = np.frombuffer(
                body[: len(body) // 2 * 2], dtype="<i2"
            ).astype(np.int64)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def decode_wav_pcm16(data: bytes) -> tuple[int, int, int, int, int]:
    """(sample_rate, n_samples, sum_abs, sum_sq, peak) with exact
    integer sums, from the shared RIFF walk."""
    rate, samples = decode_wav_samples(data)
    a = np.abs(samples)
    sum_abs = int(a.sum())
    sum_sq = int((samples * samples).sum())
    peak = int(a.max()) if len(a) else 0
    return rate, len(samples), sum_abs, sum_sq, peak


def wav_formula_payload(did: int) -> bytes:
    """Deterministic PCM16 WAV for doc `did`: sample k =
    (did*31 + k*17) % 65536 - 32768, 16 kHz, did%50+20 samples — the
    oracle recomputes the stats from the formula."""
    n = did % 50 + 20
    samples = (did * 31 + np.arange(n, dtype=np.int64) * 17) % 65536 - 32768
    return encode_wav_pcm16(16000, samples.tolist())


WAV_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("sum_abs", LongType()),
        StructField("sum_sq", LongType()),
        StructField("peak", IntegerType()),
    ]
)


def decode_wav_stats(df: DataFrame) -> DataFrame:
    """mapInPandas WAV decode: undecodable payloads are dropped, the
    same drop-vs-fail contract as decode_bmp_stats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "sample_rate", "n_samples", "sum_abs", "sum_sq", "peak"
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, n, sa, sq, pk = decode_wav_pcm16(bytes(payload))
                except ValueError:
                    continue
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["sum_abs"].append(sa)
                rows["sum_sq"].append(sq)
                rows["peak"].append(pk)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, WAV_STATS_SCHEMA)


@query(
    "multimodal_decode_wav",
    oracle="""
    WITH spec AS (
      SELECT doc_id, CAST(doc_id % 50 + 20 AS INT) AS n_samples
      FROM documents
    ),
    px AS (
      SELECT doc_id, n_samples,
             CAST((doc_id * 31 + k * 17) % 65536 - 32768 AS BIGINT) AS s
      FROM spec
      CROSS JOIN LATERAL (SELECT unnest(range(0, n_samples)) AS k)
    )
    SELECT doc_id AS media_id,
           CAST(16000 AS INT)            AS sample_rate,
           n_samples,
           CAST(sum(abs(s)) AS BIGINT)   AS sum_abs,
           CAST(sum(s * s) AS BIGINT)    AS sum_sq,
           CAST(max(abs(s)) AS INT)      AS peak
    FROM px GROUP BY doc_id, n_samples
    """,
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END real audio decode: PCM16 WAV files are synthesized
    per document (sample k = (doc_id*31 + k*17) % 65536 - 32768, rate
    16 kHz, doc_id%50+20 samples), shipped as binary payloads, and
    decoded back by walking actual RIFF chunk bytes. The oracle
    recomputes the sample statistics from the FORMULA, so a hash match
    proves the byte round-trip. Map-only plan, integer-exact stats,
    payload never shuffles — the same scale contract as
    multimodal_decode_bmp."""

    def make_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"media_id": ids, "payload": [wav_formula_payload(did) for did in ids]}
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = d.mapInPandas(make_payloads, "media_id long, payload binary")
    return decode_wav_stats(media)


# --------------------------------------------------------------------------
# REAL decode seam #3: PNG (grayscale 8-bit), parsed in pure Python +
# stdlib zlib. Unlike BMP/WAV this exercises a genuinely COMPRESSED
# codec: the payload bytes are zlib-deflated scanlines, so the decode
# proves container parse (chunk walk + CRC layout), INFLATE, and
# scanline unfiltering — the full shape of a real image codec, minus
# only the exotic filter predictors (we emit filter 0 and reject the
# rest explicitly).
# --------------------------------------------------------------------------
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png_gray8(width: int, height: int, pixels: "np.ndarray") -> bytes:
    """Minimal PNG writer: 8-bit grayscale, one IDAT, filter 0 rows.
    `pixels` is a (height, width) uint8 array."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    px = np.asarray(pixels, dtype=np.uint8).reshape(height, width)
    raw = np.concatenate(
        [np.zeros((height, 1), dtype=np.uint8), px], axis=1
    ).tobytes()  # filter byte 0 + row bytes, per scanline
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png_gray8(data: bytes) -> tuple[int, int, int, int, int]:
    """Parse an 8-bit grayscale PNG: returns (width, height, sum_lum,
    min_lum, max_lum) with exact integer stats. Raises ValueError on
    anything that isn't an 8-bit grayscale filter-0 PNG."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width, height, idat = len(_PNG_SIG), None, None, bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 0 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG variant (need gray8)")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + clen  # len + tag + body + crc
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError("corrupt IDAT stream") from exc
    if len(raw) != height * (width + 1):
        raise ValueError("scanline length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, width + 1)
    if (rows[:, 0] != 0).any():
        raise ValueError("unsupported scanline filter (need 0)")
    px = rows[:, 1:]
    return (
        width,
        height,
        int(px.sum(dtype=np.int64)),
        int(px.min()),
        int(px.max()),
    )


def png_formula_payload(did: int) -> bytes:
    """Deterministic gray8 PNG for doc `did` (lum = (did·5 + x·7 + y·3)
    mod 256) — the oracle recomputes the stats from the formula."""
    w, h = did % 11 + 4, did % 7 + 4
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    lum = ((did * 5 + x * 7 + y * 3) % 256).astype(np.uint8)
    return encode_png_gray8(w, h, lum)


PNG_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_lum", LongType()),
        StructField("min_lum", IntegerType()),
        StructField("max_lum", IntegerType()),
    ]
)


def decode_png_stats(df: DataFrame) -> DataFrame:
    """mapInPandas PNG decode; undecodable payloads are dropped (same
    drop-vs-fail contract as the BMP/WAV decoders)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "width", "height", "sum_lum", "min_lum", "max_lum"
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, s, lo, hi = decode_png_gray8(bytes(payload))
                except ValueError:
                    continue
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_lum"].append(s)
                rows["min_lum"].append(lo)
                rows["max_lum"].append(hi)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, PNG_STATS_SCHEMA)


@query(
    "multimodal_decode_png",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(doc_id % 11 + 4 AS INT) AS width,
             CAST(doc_id % 7 + 4 AS INT)  AS height
      FROM documents
    ),
    px AS (
      SELECT doc_id, width, height,
             CAST((doc_id * 5 + x * 7 + y * 3) % 256 AS BIGINT) AS lum
      FROM dims
      CROSS JOIN LATERAL (SELECT unnest(range(0, width)) AS x)
      CROSS JOIN LATERAL (SELECT unnest(range(0, height)) AS y)
    )
    SELECT doc_id AS media_id, width, height,
           CAST(sum(lum) AS BIGINT) AS sum_lum,
           CAST(min(lum) AS INT)    AS min_lum,
           CAST(max(lum) AS INT)    AS max_lum
    FROM px GROUP BY doc_id, width, height
    """,
)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END compressed-image decode: deterministic grayscale
    PNGs are synthesized per document (lum = (doc_id·5 + x·7 + y·3)
    mod 256), shipped as binary payloads, and decoded back through a
    real inflate — chunk walk, IHDR validation, zlib.decompress,
    filter-byte strip — with exact luminance stats the oracle
    recomputes from the pixel FORMULA. A hash match therefore proves
    the compressed byte round-trip, not just the plumbing. Map-only
    plan; payloads never shuffle (same contract as the BMP/WAV
    decoders)."""

    def make_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"media_id": ids, "payload": [png_formula_payload(did) for did in ids]}
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = d.mapInPandas(make_payloads, "media_id long, payload binary")
    return decode_png_stats(media)


@query(
    "multimodal_decode_mixed",
    oracle="""
    WITH bmp AS (
      SELECT doc_id,
             CAST(doc_id % 13 + 4 AS INT) AS width,
             CAST(doc_id % 9 + 4 AS INT)  AS height
      FROM documents WHERE doc_id % 3 = 0
    ),
    bmp_px AS (
      SELECT doc_id, width, height,
             CAST((doc_id * 7 + x * 3 + y * 5) % 256 AS BIGINT) AS r,
             CAST((doc_id * 11 + x + y * 2) % 256 AS BIGINT)    AS g,
             CAST((doc_id * 13 + x * 2 + y) % 256 AS BIGINT)    AS b
      FROM bmp
      CROSS JOIN LATERAL (SELECT unnest(range(0, width)) AS x)
      CROSS JOIN LATERAL (SELECT unnest(range(0, height)) AS y)
    ),
    bmp_out AS (
      SELECT doc_id AS media_id, 'image/bmp' AS modality, width, height,
             CAST(sum(r) AS DOUBLE) AS f1,
             CAST(sum(g) AS DOUBLE) AS f2,
             CAST(sum(b) AS DOUBLE) AS f3
      FROM bmp_px GROUP BY doc_id, width, height
    ),
    png AS (
      SELECT doc_id,
             CAST(doc_id % 11 + 4 AS INT) AS width,
             CAST(doc_id % 7 + 4 AS INT)  AS height
      FROM documents WHERE doc_id % 3 = 1
    ),
    png_px AS (
      SELECT doc_id, width, height,
             CAST((doc_id * 5 + x * 7 + y * 3) % 256 AS BIGINT) AS lum
      FROM png
      CROSS JOIN LATERAL (SELECT unnest(range(0, width)) AS x)
      CROSS JOIN LATERAL (SELECT unnest(range(0, height)) AS y)
    ),
    png_out AS (
      SELECT doc_id AS media_id, 'image/png' AS modality, width, height,
             CAST(sum(lum) AS DOUBLE) AS f1,
             CAST(min(lum) AS DOUBLE) AS f2,
             CAST(max(lum) AS DOUBLE) AS f3
      FROM png_px GROUP BY doc_id, width, height
    ),
    wav AS (
      SELECT doc_id, CAST(doc_id % 50 + 20 AS INT) AS n_samples
      FROM documents WHERE doc_id % 3 = 2
    ),
    wav_px AS (
      SELECT doc_id, n_samples,
             CAST((doc_id * 31 + k * 17) % 65536 - 32768 AS BIGINT) AS s
      FROM wav
      CROSS JOIN LATERAL (SELECT unnest(range(0, n_samples)) AS k)
    ),
    wav_out AS (
      SELECT doc_id AS media_id, 'audio/wav' AS modality,
             n_samples AS width, CAST(1 AS INT) AS height,
             CAST(sum(abs(s)) AS DOUBLE) AS f1,
             CAST(sum(s * s) AS DOUBLE)  AS f2,
             CAST(max(abs(s)) AS DOUBLE) AS f3
      FROM wav_px GROUP BY doc_id, n_samples
    )
    SELECT * FROM bmp_out
    UNION ALL SELECT * FROM png_out
    UNION ALL SELECT * FROM wav_out
    """,
)
def multimodal_decode_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL-mode dispatch end to end: a mixed media table (each doc
    becomes a BMP, PNG, or WAV payload by doc_id % 3 — genuine bytes
    from the same writers the per-format queries use) is decoded in
    ONE mapInPandas pass by decode_image_features(fake=False), which
    magic-sniffs each payload and routes to the matching in-repo
    codec. The oracle recomputes every stat from the pixel/sample
    formulas per modality, so a hash match proves byte round-trip AND
    correct per-row dispatch. This is the 100-TB shape of a
    heterogeneous media lake: one scan, one Python stage, no shuffle,
    payload never leaves its partition."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def make_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        builders = [bmp_formula_payload, png_formula_payload, wav_formula_payload]
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [builders[did % 3](did) for did in ids],
                }
            )

    media = d.mapInPandas(make_payloads, "media_id long, payload binary")
    decoded = decode_image_features(media, fake=False)
    modality = (
        F.when(F.col("media_id") % 3 == 0, "image/bmp")
        .when(F.col("media_id") % 3 == 1, "image/png")
        .otherwise("audio/wav")
    )
    return decoded.select(
        "media_id",
        modality.alias("modality"),
        "width",
        "height",
        F.element_at("features", 1).alias("f1"),
        F.element_at("features", 2).alias("f2"),
        F.element_at("features", 3).alias("f3"),
    )


def decode_wav_samples(data: bytes) -> tuple[int, "np.ndarray"]:
    """RIFF walk returning (sample_rate, int64 sample array) — the
    raw-sample sibling of decode_wav_pcm16 for DSP passes."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (need PCM16 mono)")
        elif cid == b"data":
            samples = np.frombuffer(
                body[: len(body) // 2 * 2], dtype="<i2"
            ).astype(np.int64)
        pos += 8 + clen + (clen & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


VAD_FRAME = 8  # samples per energy frame
# voiced iff frame mean-square > this (int): samples are ±32k so typical
# frame MS ~ 3.5e8; the threshold splits the synthetic corpus ~in half
VAD_MS_THRESHOLD = 350_000_000


@query(
    "multimodal_audio_vad",
    oracle=f"""
    WITH spec AS (
      SELECT doc_id, CAST(doc_id % 50 + 20 AS INT) AS n_samples
      FROM documents
    ),
    px AS (
      SELECT doc_id, n_samples, k // {VAD_FRAME} AS frame,
             CAST((doc_id * 31 + k * 17) % 65536 - 32768 AS BIGINT) AS s
      FROM spec
      CROSS JOIN LATERAL (SELECT unnest(range(0, n_samples)) AS k)
    ),
    frames AS (
      SELECT doc_id, frame,
             sum(s * s) AS energy, count(*) AS flen
      FROM px GROUP BY doc_id, frame
    )
    SELECT doc_id AS media_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(count(*) FILTER (WHERE energy > {VAD_MS_THRESHOLD} * flen)
                AS BIGINT)          AS n_voiced,
           CAST(sum(energy) AS BIGINT) AS total_energy
    FROM frames GROUP BY doc_id
    """,
)
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based voice-activity detection over REAL decoded audio:
    per clip, frame the PCM16 stream (8-sample frames), mark
    frames whose mean-square energy clears the threshold, and report
    voiced-frame counts — the first DSP pass any speech-data pipeline
    runs to drop silence before transcription. The decode + framing is
    numpy inside the SAME mapInPandas seam as multimodal_decode_wav
    (payload never shuffles, Arrow-batched, map-only); the oracle
    regenerates the samples from the synthesis formula and frames them
    in SQL, so a hash match proves byte-exact decode AND frame
    arithmetic end-to-end. All-integer energies."""

    def make_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [wav_formula_payload(did) for did in ids],
                }
            )

    def vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_frames": [], "n_voiced": [], "total_energy": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, s = decode_wav_samples(bytes(payload))
                n_frames = (len(s) + VAD_FRAME - 1) // VAD_FRAME
                voiced = 0
                total = int((s * s).sum())
                for f in range(n_frames):
                    fr = s[f * VAD_FRAME : (f + 1) * VAD_FRAME]
                    if int((fr * fr).sum()) > VAD_MS_THRESHOLD * len(fr):
                        voiced += 1
                out["media_id"].append(mid)
                out["n_frames"].append(n_frames)
                out["n_voiced"].append(voiced)
                out["total_energy"].append(total)
            yield pd.DataFrame(out)

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = d.mapInPandas(make_payloads, "media_id long, payload binary")
    return media.mapInPandas(
        vad,
        "media_id long, n_frames long, n_voiced long, total_energy long",
    )


def decode_bmp24_pixels(data: bytes) -> "np.ndarray":
    """decode_bmp24's raw sibling: the full RGB pixel array in FORMULA
    orientation (row y=0 first — on-disk rows are bottom-up, so the
    decoded plane is flipped back)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    width, height = struct.unpack_from("<ii", data, 18)[0:2]
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24 or height <= 0 or width <= 0:
        raise ValueError("unsupported BMP variant")
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    px = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=off)
    bgr = px.reshape(height, stride)[:, :row_raw].reshape(height, width, 3)
    return bgr[::-1, :, ::-1].astype(np.int64)  # un-flip rows, BGR->RGB


@query(
    "multimodal_image_quadrant_pool",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(doc_id % 13 + 4 AS INT) AS width,
             CAST(doc_id % 9 + 4 AS INT)  AS height
      FROM documents
    ),
    px AS (
      SELECT doc_id,
             CAST(CASE WHEN y >= height // 2 THEN 2 ELSE 0 END
                  + CASE WHEN x >= width // 2 THEN 1 ELSE 0 END AS INT)
               AS quadrant,
             CAST((doc_id * 7 + x * 3 + y * 5) % 256 AS BIGINT) AS r,
             CAST((doc_id * 11 + x + y * 2) % 256 AS BIGINT)    AS g
      FROM dims
      CROSS JOIN LATERAL (SELECT unnest(range(0, width)) AS x)
      CROSS JOIN LATERAL (SELECT unnest(range(0, height)) AS y)
    )
    SELECT doc_id AS media_id, quadrant,
           CAST(count(*) AS BIGINT) AS n_px,
           CAST(sum(r) AS BIGINT)   AS sum_r,
           CAST(sum(g) AS BIGINT)   AS sum_g
    FROM px GROUP BY doc_id, quadrant
    """,
)
def multimodal_image_quadrant_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial pooling over REAL decoded images: 2x2 quadrant channel
    sums per image — the patch-pooling step of any vision-embedding
    prep (ViT patchification is this with a finer grid). Decode +
    quadrant slicing is numpy inside the same mapInPandas seam as
    multimodal_decode_bmp (payload never shuffles); the oracle
    recomputes the quadrant sums from the pixel FORMULA, so a hash
    match proves byte-exact decode, row-orientation handling (BMPs
    store rows bottom-up), AND the slicing arithmetic. Output is 4
    rows per image."""

    def make_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [bmp_formula_payload(did) for did in ids],
                }
            )

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "quadrant": [], "n_px": [], "sum_r": [], "sum_g": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_bmp24_pixels(bytes(payload))
                h, w, _ = px.shape
                for q, (ys, xs) in enumerate(
                    [
                        (slice(0, h // 2), slice(0, w // 2)),
                        (slice(0, h // 2), slice(w // 2, w)),
                        (slice(h // 2, h), slice(0, w // 2)),
                        (slice(h // 2, h), slice(w // 2, w)),
                    ]
                ):
                    tile = px[ys, xs]
                    out["media_id"].append(mid)
                    out["quadrant"].append(q)
                    out["n_px"].append(int(tile.shape[0] * tile.shape[1]))
                    out["sum_r"].append(int(tile[:, :, 0].sum()))
                    out["sum_g"].append(int(tile[:, :, 1].sum()))
            yield pd.DataFrame(out)

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = d.mapInPandas(make_payloads, "media_id long, payload binary")
    return media.mapInPandas(
        pool,
        "media_id long, quadrant int, n_px long, sum_r long, sum_g long",
    )


AHASH_SEEDS = 64  # media payloads repeat every 64 ids -> real dup clusters


@query(
    "multimodal_image_ahash_dedup",
    oracle=f"""
    WITH imgs AS (
      SELECT doc_id AS media_id, doc_id % {AHASH_SEEDS} AS seed FROM documents
    ),
    dims AS (
      SELECT media_id, seed,
             CAST(seed % 13 + 4 AS BIGINT) AS w,
             CAST(seed % 9 + 4 AS BIGINT)  AS h
      FROM imgs
    ),
    cells AS (
      SELECT media_id, CAST(by * 8 + bx AS BIGINT) AS k,
             ((  (seed * 7  + (bx * w // 8) * 3 + (by * h // 8) * 5) % 256
               + (seed * 11 + (bx * w // 8)     + (by * h // 8) * 2) % 256
               + (seed * 13 + (bx * w // 8) * 2 + (by * h // 8))     % 256
              ) // 3) AS gray
      FROM dims
      CROSS JOIN LATERAL (SELECT unnest(range(0, 8)) AS bx)
      CROSS JOIN LATERAL (SELECT unnest(range(0, 8)) AS by)
    ),
    hashes AS (
      SELECT media_id,
             string_agg(
               CASE WHEN gray > (SELECT sum(c2.gray) // 64 FROM cells c2
                                 WHERE c2.media_id = cells.media_id)
                    THEN '1' ELSE '0' END, '' ORDER BY k) AS ahash_bits
      FROM cells GROUP BY media_id
    )
    SELECT ahash_bits,
           CAST(count(*) AS BIGINT) AS cluster_size,
           CAST(min(media_id) AS BIGINT) AS canonical_id
    FROM hashes
    GROUP BY ahash_bits
    ORDER BY ahash_bits
    """,
)
def multimodal_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup via average hash (aHash): decode the REAL BMP
    payload, nearest-neighbor-sample an 8x8 grid, threshold each cell
    against the integer mean, and read the 64-bit sign pattern as the
    perceptual fingerprint — the grouping key that collapses re-encoded
    / resized copies (the media analog of dedup_exact_keep_first; the
    near-dup tier would band this hash exactly like dedup_simhash
    bands its text hash). Payload ids repeat mod {AHASH_SEEDS} so real
    duplicate clusters exist at every SF. The decode + hash runs in
    the declared mapInPandas Arrow seam (pure integer ops — uint8
    widened to int64 BEFORE the channel sum, truncating //3 and //64
    — so the hash is bit-reproducible); the oracle recomputes the
    whole hash from the pixel FORMULA in SQL, proving byte-exact
    decode, the sampling arithmetic, and the threshold in one hash
    match. Only (media_id, 64-char hash) rows ever shuffle; payloads
    stay inside the map stage. Hash emitted as a bit STRING: engine-
    portable, no signed-int64 edge at bit 63."""

    def hash_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for did in pdf["doc_id"]:
                seed = int(did) % AHASH_SEEDS
                px = decode_bmp24_pixels(bmp_formula_payload(seed))
                h, w, _ = px.shape
                sy = (np.arange(8, dtype=np.int64) * h) // 8
                sx = (np.arange(8, dtype=np.int64) * w) // 8
                gray = px.sum(axis=2) // 3  # int64 already (decode widens)
                cells = gray[np.ix_(sy, sx)]
                mean = int(cells.sum()) // 64
                bits = "".join(
                    "1" if int(v) > mean else "0" for v in cells.ravel()
                )
                ids.append(int(did))
                hashes.append(bits)
            yield pd.DataFrame({"media_id": ids, "ahash_bits": hashes})

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    hashed = d.mapInPandas(
        hash_images, schema="media_id long, ahash_bits string"
    )
    return (
        hashed.groupBy("ahash_bits")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("media_id").alias("canonical_id"),
        )
        .select(
            "ahash_bits",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("canonical_id").cast("long").alias("canonical_id"),
        )
        .orderBy("ahash_bits")
    )


SCENE_FRAME_STRIDE = 256  # pseudo-frame per 256 payload bytes
SCENE_LEN = 4             # planted scene length in frames


@query(
    "multimodal_scene_cut_detect",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             GREATEST(2, octet_length(encode(text)) // {SCENE_FRAME_STRIDE})
               AS n_frames
      FROM documents
    )
    SELECT media_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST((n_frames - 1) // {SCENE_LEN} AS BIGINT) AS n_cuts,
           CAST(CASE WHEN n_frames > {SCENE_LEN} THEN {SCENE_LEN}
                     ELSE -1 END AS BIGINT) AS first_cut_idx
    FROM media
    ORDER BY media_id
    """,
)
def multimodal_scene_cut_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection over the REAL image path: each media
    fans out to pseudo-frames (one per {SCENE_FRAME_STRIDE} payload
    bytes, the multimodal_frame_sample stride), every frame is
    synthesized as a BMP, ENCODED AND DECODED back through the
    in-repo codec, resampled to the 8x8 gray grid (the aHash
    machinery), and a cut is declared wherever consecutive grids'
    L1 distance is nonzero — scenes are planted {SCENE_LEN} frames
    long, so the detector's output is ANALYTICALLY predictable and
    the oracle recomputes it from frame counts alone: a hash match
    proves the decode, the resample, AND the delta logic found
    exactly the planted cuts (a detector bug — off-by-one frame
    indexing, orientation flip, threshold error — breaks the match).
    All pixel work stays inside the mapInPandas Arrow seam; only
    (media_id, 3 longs) ever shuffles."""

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_frames": [], "n_cuts": [], "first_cut_idx": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                n_frames = max(2, len(str(text).encode()) // SCENE_FRAME_STRIDE)
                prev = None
                n_cuts, first_cut = 0, -1
                for f in range(n_frames):
                    seed = (int(did) * 13 + (f // SCENE_LEN) * 7) % 4096
                    px = decode_bmp24_pixels(bmp_formula_payload(seed))
                    h, w, _ = px.shape
                    sy = (np.arange(8, dtype=np.int64) * h) // 8
                    sx = (np.arange(8, dtype=np.int64) * w) // 8
                    grid = (px.sum(axis=2) // 3)[np.ix_(sy, sx)]
                    if prev is not None and int(np.abs(grid - prev).sum()) > 0:
                        n_cuts += 1
                        if first_cut < 0:
                            first_cut = f
                    prev = grid
                out["media_id"].append(int(did))
                out["n_frames"].append(n_frames)
                out["n_cuts"].append(n_cuts)
                out["first_cut_idx"].append(first_cut)
            yield pd.DataFrame(out)

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        d.mapInPandas(
            detect,
            schema="media_id long, n_frames long, n_cuts long, first_cut_idx long",
        )
        .orderBy("media_id")
    )


# Loudness normalization target: RMS 16384 (half full-scale) in e3
# fixed point — the level a speech pipeline normalizes clips to before
# feature extraction.
AUDIO_TARGET_RMS_E3 = 16_384_000


@query(
    "multimodal_audio_loudness",
    oracle=f"""
    WITH spec AS (
      SELECT doc_id, CAST(doc_id % 50 + 20 AS INT) AS n_samples
      FROM documents
    ),
    px AS (
      SELECT doc_id, n_samples,
             CAST((doc_id * 31 + k * 17) % 65536 - 32768 AS BIGINT) AS s
      FROM spec
      CROSS JOIN LATERAL (SELECT unnest(range(0, n_samples)) AS k)
    ),
    st AS (
      SELECT doc_id, n_samples, CAST(sum(s * s) AS BIGINT) AS sum_sq
      FROM px GROUP BY doc_id, n_samples
    ),
    g AS (
      SELECT doc_id, n_samples,
             GREATEST(CAST(floor(sqrt(CAST(sum_sq * 1000000 // n_samples
                                           AS DOUBLE))) AS BIGINT), 1) AS rms_e3
      FROM st
    ),
    gg AS (
      SELECT doc_id, n_samples, rms_e3,
             CAST({AUDIO_TARGET_RMS_E3} AS BIGINT) * 1000000 // rms_e3
               AS gain_e6
      FROM g
    )
    SELECT gg.doc_id AS media_id, gg.n_samples, gg.rms_e3, gg.gain_e6,
           CAST(count(*) FILTER (WHERE abs(p.s) * gg.gain_e6
                                 > CAST(32767 AS BIGINT) * 1000000)
             AS BIGINT) AS n_clipped
    FROM gg JOIN px p ON p.doc_id = gg.doc_id
    GROUP BY 1, 2, 3, 4
    """,
)
def multimodal_audio_loudness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loudness normalization report over REAL decoded audio: per
    clip, integer RMS (e3 fixed point), the gain (e6) that would bring
    it to the target level, and how many samples would CLIP at that
    gain — the decision table a speech-data pipeline computes before
    normalizing (clips with high n_clipped need a limiter, not a gain).
    The clip test |s|·gain_e6 > 32767·10^6 is pure int64. The RMS uses
    floor(sqrt(double)) in both engines; note sum_sq*1e6//n can reach
    ~7.5e16 (> 2^53) for a max-amplitude clip, so the int->double
    conversion may round — determinism rests NOT on exactness below
    2^53 but on both engines performing the SAME IEEE-754
    round-to-nearest int64->double conversion followed by a
    correctly-rounded sqrt (both guaranteed by the standard), so the
    floor agrees bit-for-bit cross-engine regardless. Payloads
    are decoded by the same RIFF byte-walk as multimodal_decode_wav —
    a hash match proves the round-trip AND the analysis. Map-only
    plan: payload bytes never shuffle, one row out per clip."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "n_samples", "rms_e3", "gain_e6", "n_clipped"
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _rate, samples = decode_wav_samples(bytes(payload))
                except ValueError:
                    continue
                n = len(samples)
                if n == 0:
                    continue
                sum_sq = int((samples * samples).sum())
                rms_e3 = max(
                    int(math.floor(math.sqrt(float(sum_sq * 1_000_000 // n)))), 1
                )
                gain_e6 = AUDIO_TARGET_RMS_E3 * 1_000_000 // rms_e3
                n_clip = int(
                    (np.abs(samples) * gain_e6 > 32767 * 1_000_000).sum()
                )
                rows["media_id"].append(mid)
                rows["n_samples"].append(n)
                rows["rms_e3"].append(rms_e3)
                rows["gain_e6"].append(gain_e6)
                rows["n_clipped"].append(n_clip)
            yield pd.DataFrame(rows)

    def make_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"media_id": ids, "payload": [wav_formula_payload(did) for did in ids]}
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = d.mapInPandas(make_payloads, "media_id long, payload binary")
    return media.mapInPandas(
        run,
        "media_id long, n_samples int, rms_e3 long, gain_e6 long, n_clipped long",
    )


# Letterbox target: every VLM preprocessor letterboxes to a fixed
# square before patchification; 8x8 keeps the oracle's lateral
# replication affordable while exercising the full integer geometry.
LETTERBOX_T = 8
LETTERBOX_PAD_GRAY = 128


@query(
    "multimodal_image_letterbox",
    oracle=f"""
    WITH imgs AS (
      SELECT doc_id AS media_id, doc_id % {AHASH_SEEDS} AS seed FROM documents
    ),
    dims AS (
      SELECT media_id, seed,
             CAST(seed % 13 + 4 AS BIGINT) AS w,
             CAST(seed % 9 + 4 AS BIGINT)  AS h
      FROM imgs
    ),
    geom AS (
      SELECT media_id, seed, w, h,
             greatest(CAST(1 AS BIGINT), w * {LETTERBOX_T} // greatest(w, h))
               AS new_w,
             greatest(CAST(1 AS BIGINT), h * {LETTERBOX_T} // greatest(w, h))
               AS new_h
      FROM dims
    ),
    cells AS (
      SELECT media_id, w, h, new_w, new_h,
             CASE WHEN tx >= ({LETTERBOX_T} - new_w) // 2
                   AND tx <  ({LETTERBOX_T} - new_w) // 2 + new_w
                   AND ty >= ({LETTERBOX_T} - new_h) // 2
                   AND ty <  ({LETTERBOX_T} - new_h) // 2 + new_h
                  THEN ((  (seed * 7
                            + ((tx - ({LETTERBOX_T} - new_w) // 2) * w // new_w) * 3
                            + ((ty - ({LETTERBOX_T} - new_h) // 2) * h // new_h) * 5) % 256
                         + (seed * 11
                            + ((tx - ({LETTERBOX_T} - new_w) // 2) * w // new_w)
                            + ((ty - ({LETTERBOX_T} - new_h) // 2) * h // new_h) * 2) % 256
                         + (seed * 13
                            + ((tx - ({LETTERBOX_T} - new_w) // 2) * w // new_w) * 2
                            + ((ty - ({LETTERBOX_T} - new_h) // 2) * h // new_h)) % 256
                        ) // 3)
                  ELSE {LETTERBOX_PAD_GRAY} END AS gray
      FROM geom
      CROSS JOIN LATERAL (SELECT unnest(range(0, {LETTERBOX_T})) AS tx)
      CROSS JOIN LATERAL (SELECT unnest(range(0, {LETTERBOX_T})) AS ty)
    )
    SELECT media_id, any_value(w) AS src_w, any_value(h) AS src_h,
           any_value(new_w) AS content_w, any_value(new_h) AS content_h,
           CAST((({LETTERBOX_T} * {LETTERBOX_T}) - any_value(new_w) * any_value(new_h))
                * 1000000 // ({LETTERBOX_T} * {LETTERBOX_T}) AS BIGINT)
             AS pad_ppm,
           CAST(sum(gray) AS BIGINT) AS gray_sum
    FROM cells GROUP BY media_id ORDER BY media_id
    """,
)
def multimodal_image_letterbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving LETTERBOX resize over the REAL BMP decode —
    the geometry pass every vision-language preprocessor runs before
    patchification (resize the long side to the target, center, pad
    with neutral gray): per image, the content box, the padding share,
    and the gray-sum of the final 8x8 canvas. The gray_sum is the
    proof column: it covers every target cell, so a hash match proves
    byte-exact decode, the integer scale/offset geometry (floor
    scaling, centered offsets — the exact arithmetic a serving
    preprocessor must reproduce), nearest-neighbor sampling, AND the
    pad fill in one number; the oracle recomputes it all from the
    pixel FORMULA in SQL. Same payload family as the aHash query
    (ids repeat mod {AHASH_SEEDS}), same map-only shape: payloads are
    synthesized and decoded inside one mapInPandas stage, only the
    7-column report row ever shuffles."""
    T, PAD = LETTERBOX_T, LETTERBOX_PAD_GRAY

    def letterbox(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "src_w", "src_h", "content_w", "content_h",
                "pad_ppm", "gray_sum",
            )}
            for did in pdf["doc_id"]:
                seed = int(did) % AHASH_SEEDS
                px = decode_bmp24_pixels(bmp_formula_payload(seed))
                h, w, _ = px.shape
                gray = px.sum(axis=2) // 3
                m = max(w, h)
                nw, nh = max(1, w * T // m), max(1, h * T // m)
                ox, oy = (T - nw) // 2, (T - nh) // 2
                sx = (np.arange(nw, dtype=np.int64) * w) // nw
                sy = (np.arange(nh, dtype=np.int64) * h) // nh
                content = gray[np.ix_(sy, sx)]
                total = int(content.sum()) + PAD * (T * T - nw * nh)
                rows["media_id"].append(int(did))
                rows["src_w"].append(w)
                rows["src_h"].append(h)
                rows["content_w"].append(nw)
                rows["content_h"].append(nh)
                rows["pad_ppm"].append((T * T - nw * nh) * 1_000_000 // (T * T))
                rows["gray_sum"].append(total)
            yield pd.DataFrame(rows)

    # spread_to_cores on the id-only projection (r10): the decode +
    # resize kernel is pure CPU per row and the single-row-group
    # fixture scans as one task; the spread exchanges only 8-byte ids.
    d = spread_to_cores(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(
        letterbox,
        schema=(
            "media_id long, src_w long, src_h long, content_w long, "
            "content_h long, pad_ppm long, gray_sum long"
        ),
    ).orderBy("media_id")


@query(
    "multimodal_audio_snr",
    oracle=f"""
    WITH spec AS (
      SELECT doc_id, CAST(doc_id % 50 + 20 AS INT) AS n_samples
      FROM documents
    ),
    px AS (
      SELECT doc_id, k // {VAD_FRAME} AS frame,
             CAST((doc_id * 31 + k * 17) % 65536 - 32768 AS BIGINT) AS s
      FROM spec
      CROSS JOIN LATERAL (SELECT unnest(range(0, n_samples)) AS k)
    ),
    frames AS (
      SELECT doc_id, frame,
             CAST(sum(s * s) > {VAD_MS_THRESHOLD} * count(*) AS INT)
               AS voiced
      FROM px GROUP BY doc_id, frame
    ),
    cls AS (
      SELECT p.doc_id, f.voiced, p.s FROM px p
      JOIN frames f ON f.doc_id = p.doc_id AND f.frame = p.frame
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) FILTER (WHERE voiced = 1) AS BIGINT) AS nv,
             CAST(count(*) FILTER (WHERE voiced = 0) AS BIGINT) AS nu,
             CAST(coalesce(sum(s * s) FILTER (WHERE voiced = 1), 0)
                  AS BIGINT) AS ev,
             CAST(coalesce(sum(s * s) FILTER (WHERE voiced = 0), 0)
                  AS BIGINT) AS eu
      FROM cls GROUP BY doc_id
    )
    SELECT doc_id AS media_id, nv AS n_voiced_samples,
           nu AS n_unvoiced_samples,
           CAST(CASE WHEN nv > 0 THEN ev // nv ELSE 0 END AS BIGINT)
             AS voiced_ms,
           CAST(CASE WHEN nu > 0 THEN eu // nu ELSE 0 END AS BIGINT)
             AS unvoiced_ms,
           CAST(CASE WHEN nu > 0 AND eu > 0 AND nv > 0
                THEN (ev // nv) * 1000 // (eu // nu)
                ELSE -1 END AS BIGINT) AS snr_power_milli
    FROM agg
    """,
)
def multimodal_audio_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal-to-noise estimate over REAL decoded audio: split each
    clip's frames with the SAME energy gate as multimodal_audio_vad,
    then report the voiced-to-unvoiced POWER ratio (mean-square over
    mean-square — no sqrt, so the whole chain stays integer) — the
    quality screen a speech pipeline applies after silence trimming:
    low SNR means the 'speech' barely clears the noise floor and the
    clip transcribes garbage. -1 sentinel for clips with no unvoiced
    frames (nothing to estimate noise from) or zero noise energy.
    Same mapInPandas seam as the VAD/loudness ops — payload bytes
    never shuffle, one output row per clip; the oracle regenerates
    the samples from the synthesis formula, so a hash match proves
    decode, framing, gating, AND the power arithmetic end-to-end."""

    def make_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [wav_formula_payload(did) for did in ids],
                }
            )

    def snr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "media_id",
            "n_voiced_samples",
            "n_unvoiced_samples",
            "voiced_ms",
            "unvoiced_ms",
            "snr_power_milli",
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, s = decode_wav_samples(bytes(payload))
                nv = nu = ev = eu = 0
                n_frames = (len(s) + VAD_FRAME - 1) // VAD_FRAME
                for f in range(n_frames):
                    fr = s[f * VAD_FRAME : (f + 1) * VAD_FRAME]
                    e = int((fr * fr).sum())
                    if e > VAD_MS_THRESHOLD * len(fr):
                        nv += len(fr)
                        ev += e
                    else:
                        nu += len(fr)
                        eu += e
                vms = ev // nv if nv > 0 else 0
                ums = eu // nu if nu > 0 else 0
                ratio = (
                    vms * 1000 // ums if nu > 0 and eu > 0 and nv > 0 else -1
                )
                out["media_id"].append(mid)
                out["n_voiced_samples"].append(nv)
                out["n_unvoiced_samples"].append(nu)
                out["voiced_ms"].append(vms)
                out["unvoiced_ms"].append(ums)
                out["snr_power_milli"].append(ratio)
            yield pd.DataFrame(out)

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = d.mapInPandas(make_payloads, "media_id long, payload binary")
    return media.mapInPandas(
        snr,
        "media_id long, n_voiced_samples long, n_unvoiced_samples long, "
        "voiced_ms long, unvoiced_ms long, snr_power_milli long",
    )


# E2E twin constants (r11 verdict #6c): the same 90/95 content-split
# cuts as corpus_e2e_training_prep, a minimum-pixel quality gate that
# actually drops the smallest formula images, and the AHASH_SEEDS
# duplicate structure so the dedup stage has real work.
MM_MIN_PX = 30
MM_TRAIN_CUT = 90
MM_VAL_CUT = 95


@query(
    "multimodal_e2e_training_prep",
    oracle=f"""
    WITH imgs AS (
      SELECT doc_id AS media_id, doc_id % {AHASH_SEEDS} AS seed FROM documents
    ),
    dims AS (
      SELECT media_id, seed,
             CAST(seed % 13 + 4 AS BIGINT) AS w,
             CAST(seed % 9 + 4 AS BIGINT)  AS h
      FROM imgs
    ),
    gated AS (SELECT * FROM dims WHERE w * h >= {MM_MIN_PX}),
    cells AS (
      SELECT media_id, CAST(by * 8 + bx AS BIGINT) AS k,
             ((  (seed * 7  + (bx * w // 8) * 3 + (by * h // 8) * 5) % 256
               + (seed * 11 + (bx * w // 8)     + (by * h // 8) * 2) % 256
               + (seed * 13 + (bx * w // 8) * 2 + (by * h // 8))     % 256
              ) // 3) AS gray
      FROM gated
      CROSS JOIN LATERAL (SELECT unnest(range(0, 8)) AS bx)
      CROSS JOIN LATERAL (SELECT unnest(range(0, 8)) AS by)
    ),
    hashes AS (
      SELECT media_id,
             string_agg(
               CASE WHEN gray > (SELECT sum(c2.gray) // 64 FROM cells c2
                                 WHERE c2.media_id = cells.media_id)
                    THEN '1' ELSE '0' END, '' ORDER BY k) AS ahash_bits
      FROM cells GROUP BY media_id
    ),
    clusters AS (
      SELECT h.ahash_bits,
             CAST(count(*) AS BIGINT)        AS cluster_size,
             CAST(min(h.media_id) AS BIGINT) AS canonical_id,
             CAST(sum(g.w * g.h) AS BIGINT)  AS raw_pixels
      FROM hashes h JOIN gated g ON g.media_id = h.media_id
      GROUP BY h.ahash_bits
    ),
    tagged AS (
      SELECT CASE WHEN canonical_id % 100 < {MM_TRAIN_CUT} THEN 'train'
                  WHEN canonical_id % 100 < {MM_VAL_CUT}   THEN 'val'
                  ELSE 'test' END AS split,
             cluster_size, raw_pixels
      FROM clusters
    )
    SELECT split,
           CAST(count(*) AS BIGINT)          AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_raw_images,
           CAST(sum(raw_pixels) AS BIGINT)   AS raw_pixels,
           CAST((sum(cluster_size) - count(*)) * 1000000
                // sum(cluster_size) AS BIGINT) AS dup_savings_ppm
    FROM tagged
    GROUP BY split
    ORDER BY split
    """,
)
def multimodal_e2e_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MULTIMODAL training-data pipeline end-to-end in one plan —
    the image twin of corpus_e2e_training_prep (r11 verdict #6c):
    synthesize -> REAL BMP decode (mapInPandas Arrow seam; dims come
    from the decoded pixel plane, not metadata) -> quality gate
    (w·h >= {MM_MIN_PX} pixels, the 'too small to train on' screen) ->
    perceptual dedup (the aHash grouping of multimodal_image_ahash_dedup,
    payload ids repeating mod {AHASH_SEEDS} so real clusters exist) ->
    CLUSTER-SAFE split (split assigned per canonical cluster, never per
    copy — two near-dup images can never land in train and test) ->
    per-split budget report with dedup savings in exact ppm.

    Scale shape: payloads live and die inside one map stage (decode +
    hash emit only (media_id, 64-char bits, w, h) — the only thing
    that ever shuffles); dedup is one hash-keyed exchange; the split
    tag is a codegen expression on the canonical id; the report is a
    3-row aggregate. The oracle replays decode-gate-hash-dedup-split
    entirely from the pixel FORMULA in SQL, so a hash match proves the
    byte-exact decode, the gate population, the cluster structure, and
    the split assignment in one compare."""

    def hash_gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "ahash_bits": [], "w": [], "h": []}
            for did in pdf["doc_id"]:
                seed = int(did) % AHASH_SEEDS
                px = decode_bmp24_pixels(bmp_formula_payload(seed))
                h, w, _ = px.shape
                if w * h < MM_MIN_PX:
                    continue  # quality gate, applied on DECODED dims
                sy = (np.arange(8, dtype=np.int64) * h) // 8
                sx = (np.arange(8, dtype=np.int64) * w) // 8
                gray = px.sum(axis=2) // 3
                cells = gray[np.ix_(sy, sx)]
                mean = int(cells.sum()) // 64
                out["media_id"].append(int(did))
                out["ahash_bits"].append(
                    "".join("1" if int(v) > mean else "0" for v in cells.ravel())
                )
                out["w"].append(int(w))
                out["h"].append(int(h))
            yield pd.DataFrame(out)

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    hashed = d.mapInPandas(
        hash_gate, schema="media_id long, ahash_bits string, w long, h long"
    )
    clusters = hashed.groupBy("ahash_bits").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
        F.min("media_id").cast("long").alias("canonical_id"),
        F.sum(F.col("w") * F.col("h")).cast("long").alias("raw_pixels"),
    )
    slot = F.col("canonical_id") % 100
    tagged = clusters.select(
        F.when(slot < MM_TRAIN_CUT, "train")
        .when(slot < MM_VAL_CUT, "val")
        .otherwise("test")
        .alias("split"),
        "cluster_size",
        "raw_pixels",
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("cluster_size").cast("long").alias("n_raw_images"),
            F.sum("raw_pixels").cast("long").alias("raw_pixels"),
            F.expr(
                "CAST((sum(cluster_size) - count(*)) * 1000000"
                " div sum(cluster_size) AS BIGINT)"
            ).alias("dup_savings_ppm"),
        )
        .orderBy("split")
    )
