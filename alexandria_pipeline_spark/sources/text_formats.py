"""JSONL / CSV ingest and egress — the text-format edge of the source
matrix (web-crawl corpora land as JSONL shards; labeling and vendor
feeds arrive as CSV; parquet is the internal format everything is
normalized INTO).

Scale contract, both directions:
  - reads take an EXPLICIT schema — schema inference is a full extra
    pass over 100 TB (and a correctness hazard: a column that happens
    to look numeric in shard 1 isn't in shard 9000). `spark.read.json`
    / `.csv` with a declared StructType does one pass, pushes column
    pruning into the text parser, and routes malformed lines to a
    quarantine column instead of failing the job (PERMISSIVE +
    columnNameOfCorruptRecord — the dead-letter pattern).
  - writes shard naturally (one file per partition) and compress with
    a SPLITTABLE-agnostic codec choice: gzip JSONL shards are the
    interchange default; parquet stays the analytical format.

Reference parity: the reference pipeline ingests pickle/parquet only
(run.py); JSONL/CSV cover what its users feed it from crawls and
vendors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """One JSONL object per row, sharded one file per partition."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-enforced JSONL read with a dead-letter column: malformed
    lines land whole in {CORRUPT_COL} (null everywhere else) instead
    of killing the job — filter on it to quarantine."""
    full = schema.add(CORRUPT_COL, "string") if CORRUPT_COL not in schema.names else schema
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_csv(df: DataFrame, path: str, compression: str | None = None) -> None:
    """RFC-4180-style CSV with header; quoting/escaping on so free
    text with commas, quotes, and newlines round-trips."""
    w = (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-enforced CSV read (no inference pass); multiLine handles
    quoted embedded newlines; PERMISSIVE + corrupt column quarantines
    rows whose field count doesn't match."""
    full = schema.add(CORRUPT_COL, "string") if CORRUPT_COL not in schema.names else schema
    return (
        spark.read.schema(full)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def register_text_format_queries() -> None:
    """Registered face of the format matrix (rows-only: side-effecting
    like sharded_sink_roundtrip — writes temp shards, reads them back,
    and PROVES equality in-plan via content digests)."""
    import tempfile

    from alexandria_pipeline_spark.catalog import load_table
    from alexandria_pipeline_spark.registry import query

    @query("source_text_formats_roundtrip")  # rows-only: side-effecting
    def source_text_formats_roundtrip(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Write the documents table out as JSONL and CSV shards, read
        both back through the schema-enforced readers, and return one
        row per format with (n_rows, content_digest, digest_matches) —
        digest = sum of a per-row hash over every column, so the match
        column proves LOSSLESS round-trip (free text with commas,
        quotes, unicode) rather than just matching counts. The write
        is executor-parallel one-file-per-partition; the read is one
        pass, no inference."""
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source"
        )

        def digest(df: DataFrame) -> DataFrame:
            return df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(
                    F.abs(F.xxhash64("doc_id", "text", "lang", "source"))
                    % F.lit(1_000_000_007)
                )
                .cast("long")
                .alias("content_digest"),
            )

        base = digest(d).collect()[0]
        out = []
        tmp = tempfile.mkdtemp(prefix="apspark_fmt_")
        write_jsonl(d, f"{tmp}/docs_jsonl")
        got_j = digest(
            read_jsonl(spark, f"{tmp}/docs_jsonl", d.schema).drop(CORRUPT_COL)
        ).collect()[0]
        out.append(("jsonl", got_j))
        write_csv(d, f"{tmp}/docs_csv")
        got_c = digest(
            read_csv(spark, f"{tmp}/docs_csv", d.schema).drop(CORRUPT_COL)
        ).collect()[0]
        out.append(("csv", got_c))
        rows = [
            {
                "format": name,
                "n_rows": got["n_rows"],
                "content_digest": got["content_digest"],
                "digest_matches": int(
                    got["n_rows"] == base["n_rows"]
                    and got["content_digest"] == base["content_digest"]
                ),
            }
            for name, got in out
        ]
        return spark.createDataFrame(
            rows,
            "format string, n_rows long, content_digest long, digest_matches int",
        ).orderBy("format")
