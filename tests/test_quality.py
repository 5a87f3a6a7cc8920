"""dq_constraint_check must actually count violations, not just pass
on the clean testdata: synthesize a dirty sf_dir and assert each rule
fires with the right count."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from alexandria_pipeline_spark.registry import QUERIES

SF_CLEAN = "/root/testdata/sf0.001"


def test_dq_rules_fire_on_dirty_data(spark, tmp_path):
    sf = tmp_path / "dirty"
    sf.mkdir()
    # copy the clean tables the query touches, then dirty orders/events
    for t in ("customer", "lineitem"):
        shutil.copy(f"{SF_CLEAN}/{t}.parquet", sf / f"{t}.parquet")

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 1, 2, 3], type=pa.int64()),  # dup key
            "o_custkey": pa.array([1, None, 999_999, 2], type=pa.int64()),
            # null custkey + FK miss
            "o_totalprice": pa.array([10.0, -5.0, 20.0, 30.0]),  # negative
            "o_orderdate": pa.array([None] * 4, type=pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
            "o_orderstatus": pa.array(["O"] * 4),
        }
    )
    pq.write_table(orders, sf / "orders.parquet")

    events = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array([1_700_000_000_000_000, None], type=pa.timestamp("us")),
            "user_id": pa.array([1, 2], type=pa.int64()),
            "event_type": pa.array(["click", "bogus_type"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(events, sf / "events.parquet")

    got = {
        r["rule"]: r["n_violations"]
        for r in QUERIES["dq_constraint_check"](spark, str(sf)).collect()
    }
    assert got["orders.o_orderkey unique"] == 1  # 4 rows, 3 distinct
    assert got["orders.o_totalprice > 0"] == 1
    assert got["orders.o_custkey not null"] == 1
    assert got["events.event_type in domain"] == 1
    assert got["events.ts not null"] == 1
    # null custkey doesn't join either; anti join counts it AND the miss
    assert got["orders.o_custkey references customer"] == 2
    assert got["lineitem.l_quantity in (0,100]"] == 0
