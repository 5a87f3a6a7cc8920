"""Multimodal columns: opaque binary payloads + typed metadata.

Design (north-star spec): image/audio/video payloads travel as
`binary` columns next to typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched functions over
`mapInPandas`, so the JVM never interprets the bytes and Python sees
them zero-copy per batch.

The container has no image/audio libs, so decoding is STUBBED: real
mode raises NotImplementedError at the decode seam; fake mode computes
deterministic pseudo-metadata from the bytes, keeping the Spark-side
plumbing (schema, batch iteration, partitioning) real and tested
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

from alexandria_pipeline_spark.catalog import load_table
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


def decode_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract over mapInPandas.

    Real mode is the seam where PIL/torchvision would go — it raises
    NotImplementedError (libs absent in this container). Fake mode
    derives deterministic pseudo width/height/features from the raw
    bytes so the distributed plumbing is testable end-to-end.

    mapInPandas (not a scalar UDF) because decode is 1-row→1-row but
    wants per-batch library state and may drop undecodable rows —
    an iterator of DataFrames models that; Arrow moves the binary
    column without copies.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs not available in this environment; "
                    "install pillow and replace this branch with "
                    "PIL.Image.open(io.BytesIO(b))"
                )
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
