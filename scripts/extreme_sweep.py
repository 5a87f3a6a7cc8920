"""Whole-surface ANSI-overflow sweep at extreme magnitudes.

Clones sf0.001 with prices/values scaled ~3e6x (cent-sums land in the
>1e13 range where round-4's orders_abc BIGINT*1e6 overflow lived),
then fully materializes EVERY registered batch query. The pytest
suite (tests/test_extreme_values.py) runs a 20-query
arithmetic-heavy subset on every CI pass; this script is the full
250+-query version to run before a round snapshot — it caught
q1_pricing_summary / q14_promo_effect / q8_market_share /
events_zscore_anomalies in round 5 after the subset had already
caught three others.

Usage: python scripts/extreme_sweep.py    # exit 1 on any failure
"""

from __future__ import annotations

import pathlib
import sys
import tempfile

import duckdb

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from alexandria_pipeline_spark import QUERIES, get_spark, register_all

PRICE_MULT = 3_000_000
SCALED_COLS = {
    "orders": "o_totalprice",
    "lineitem": "l_extendedprice",
    "events": "value",
}
SKIP = {"sharded_sink_roundtrip", "source_text_formats_roundtrip"}


def main() -> int:
    register_all()
    spark = get_spark("extreme-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="extreme_full_")
    src = pathlib.Path("/root/testdata/sf0.001")
    con = duckdb.connect()
    for f in sorted(src.glob("*.parquet")):
        t = f.stem
        col = SCALED_COLS.get(t)
        sel = (
            f"SELECT * REPLACE ({col} * {PRICE_MULT} AS {col}) FROM '{f}'"
            if col
            else f"SELECT * FROM '{f}'"
        )
        con.sql(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    fails: list[str] = []
    for name in sorted(QUERIES):
        if name.startswith("stream_") or name in SKIP:
            continue
        try:
            QUERIES[name](spark, out).collect()
        except Exception as exc:  # noqa: BLE001 - sweep must not stop
            kind = "OVERFLOW" if "OVERFLOW" in str(exc) else type(exc).__name__
            fails.append(f"{name} ({kind})")
            print(f"FAIL {name} {kind}", flush=True)
    print(f"\n{len(fails)} failures of {len(QUERIES)} queries")
    if fails:
        print("FAILED:", ", ".join(fails))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
