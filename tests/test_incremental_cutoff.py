"""Regression: dedup_incremental_antijoin's hist/batch cutoff must be
computed identically by Spark and the DuckDB oracle.

The original implementation used Spark `cast('long')` (truncates toward
zero) vs DuckDB `CAST(... AS BIGINT)` (rounds to nearest): with
max(doc_id)=5001 the cutoff was 4000 in Spark but 4001 in DuckDB —
doc 4001 flipped between "historical" and "batch" and the oracle
mismatched. Both sides now use integer floor division (`div` / `//`).
The driver testdata happens to have max(doc_id) ≡ 4 (mod 5), which
floors and rounds identically, so this test supplies the adversarial
max ≡ 1 (mod 5) the testdata never exercises.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from alexandria_pipeline_spark import ORACLES, QUERIES
from tests.oracle import compare

NAME = "dedup_incremental_antijoin"


def test_cutoff_agrees_on_mod5_adversarial_max(spark, tmp_path):
    # max doc_id 5001 → 5001*80/100 = 4000.8: truncation gives 4000,
    # round-to-nearest gives 4001. Doc 4001 carries a UNIQUE content key,
    # so whichever side of the cutoff it lands on changes the output row
    # set (in batch → its key is emitted; in hist → it is not).
    rows = []
    for doc_id in [10, 4000, 4001, 4500, 5001]:
        key = f"doc{doc_id} " * 10
        rows.append({"doc_id": doc_id, "text": key.strip() + " tail"})
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    df = QUERIES[NAME](spark, str(tmp_path))
    compare(df, con, ORACLES[NAME], NAME)
