"""Sharded Parquet sink/source round-trip — the S3/S5/S6 re-model
(pickle shards with filename-encoded order → partitioned Parquet with
explicit shard columns).
"""

from __future__ import annotations

import glob
import tempfile

import pyarrow.parquet as pq

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.sources.parquet import read_sharded, write_sharded

from tests.conftest import SF_SMOKE


def test_rows_per_file_cap(spark):
    df = load_table(spark, SF_SMOKE, "lineitem")
    n = df.count()
    out = tempfile.mkdtemp(prefix="apspark_shards_")
    write_sharded(df, out, rows_per_shard=1000)
    files = glob.glob(f"{out}/*.parquet")
    assert files
    counts = [pq.read_metadata(f).num_rows for f in files]
    assert max(counts) <= 1000, counts  # process.py:55's 100k contract, scaled
    assert sum(counts) == n


def test_ordered_shards_round_trip(spark):
    df = load_table(spark, SF_SMOKE, "orders")
    n = df.count()
    out = tempfile.mkdtemp(prefix="apspark_oshards_")
    write_sharded(df, out, rows_per_shard=400, order_col="o_orderkey")
    back = read_sharded(spark, out, ordered=True)
    assert back.count() == n
    rows = back.select("shard_id", "row_in_shard", "o_orderkey").collect()
    # global order is recoverable from data columns, not file listing
    keys = [r["o_orderkey"] for r in rows]
    assert keys == sorted(keys)
    assert rows[0]["shard_id"] == 0 and rows[0]["row_in_shard"] == 0
    assert max(r["shard_id"] for r in rows) == -(-n // 400) - 1


def test_number_by_order_no_global_sort(spark):
    """number_by_order must produce a dense 0..n-1 numbering that
    follows order_col — and its plan must contain a PARTITIONED window
    only (a Window with an empty partition spec would be the global
    single-partition sort this function exists to avoid)."""
    from alexandria_pipeline_spark.sources.parquet import number_by_order

    df = load_table(spark, SF_SMOKE, "orders")
    numbered, handle = number_by_order(df, "o_orderkey")
    rows = numbered.select("_rn", "o_orderkey").collect()
    handle.unpersist()
    by_rn = sorted((r["_rn"], r["o_orderkey"]) for r in rows)
    assert [rn for rn, _ in by_rn] == list(range(len(rows)))
    keys = [k for _, k in by_rn]
    assert keys == sorted(keys)
    plan = numbered._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line, line
