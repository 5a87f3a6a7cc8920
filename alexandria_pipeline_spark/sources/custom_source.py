"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
a deterministic synthetic-documents source that generates partitioned
corpus data ENGINE-SIDE, the way a real connector would read an
external system.

Why it matters at scale: the reader declares its own partitions, so N
executors pull N independent slices in parallel with no driver
materialization and no single-stream bottleneck — the contract every
Spark connector (JDBC, Kafka, Iceberg) implements, here in pure
Python. The generator is seeded per (partition, row) so output is
bit-stable across retries/speculative execution (a retried task MUST
produce identical rows or downstream exactly-once breaks).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_VOCAB = [
    "spark", "join", "data", "the", "table", "query", "row", "batch",
    "stream", "merge", "sort", "hash", "scan", "filter", "group", "window",
]

SCHEMA_DDL = "doc_id bigint, text string, n_tokens int, part_id int"


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "4"))
        self.tokens_per_doc = int(options.get("tokens", "24"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        pid = partition.value
        per_part = self.n_rows // self.n_parts
        start = pid * per_part
        end = self.n_rows if pid == self.n_parts - 1 else start + per_part
        for doc_id in range(start, end):
            # LCG seeded by doc_id only -> identical rows on task retry
            state = (doc_id * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            words = []
            for _ in range(self.tokens_per_doc):
                state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
                words.append(_VOCAB[state % len(_VOCAB)])
            yield doc_id, " ".join(words), len(words), pid


class SyntheticDocsSource(DataSource):
    """Usage:
        spark.dataSource.register(SyntheticDocsSource)
        df = (spark.read.format("synthetic_docs")
              .option("rows", 10000).option("partitions", 8).load())
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)


# --------------------------------------------------------------------------
# Streaming face of the same connector: a Python data source that
# emits a deterministic, offset-tracked document stream. The offset
# dict is the stream's replay cursor: read(start) returns rows PLUS
# the next offset, and readBetweenOffsets must regenerate the exact
# same rows for any (start, end) replay — that determinism (same LCG,
# seeded by row id) is what lets Structured Streaming give
# exactly-once over a source with no native log.
# --------------------------------------------------------------------------
from pyspark.sql.datasource import SimpleDataSourceStreamReader


def _doc_row(doc_id: int, tokens_per_doc: int, pid: int):
    state = (doc_id * 6364136223846793005 + 1442695040888963407) % (1 << 63)
    words = []
    for _ in range(tokens_per_doc):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        words.append(_VOCAB[state % len(_VOCAB)])
    return doc_id, " ".join(words), len(words), pid


class _SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", "50"))
        self.max_rows = int(options.get("maxrows", "1000000"))
        self.tokens_per_doc = int(options.get("tokens", "24"))

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def read(self, start: dict):
        lo = start["next_id"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        # Lists, not generators: Spark's prefetch cache copies the
        # returned iterator (copy.copy) for replay, and generators are
        # neither copyable nor picklable.
        rows = [_doc_row(i, self.tokens_per_doc, i % 4) for i in range(lo, hi)]
        return rows, {"next_id": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay path (failure recovery): MUST equal the original read.
        # Returned as an ITERATOR, not a list: this path runs inside the
        # partition-read worker, whose serializer rejects plain lists
        # ("Unsupported return type ('list') ... Expected types:
        # iterator"). It only executes when the prefetch cache misses
        # the range — restart recovery or an empty planned batch — so a
        # list here was a TIMING-dependent failure the normal happy
        # path never hit (read() above legitimately returns a list:
        # Spark's prefetch cache copy.copy()s it for replay).
        return iter(
            [
                _doc_row(i, self.tokens_per_doc, i % 4)
                for i in range(start["next_id"], end["next_id"])
            ]
        )


class SyntheticDocsStreamSource(DataSource):
    """Usage:
        spark.dataSource.register(SyntheticDocsStreamSource)
        df = (spark.readStream.format("synthetic_docs_stream")
              .option("rowsPerBatch", 100).load())
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_stream"

    def schema(self) -> str:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType):
        return _SyntheticDocsStreamReader(self.options)
