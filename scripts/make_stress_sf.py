"""Self-generate a ~sf1 stress dataset (10x the sf0.1 bench data) for
the scale validation run (round-3 verdict item #6).

NOT driver data — the driver's testdata is read-only and tops out at
sf0.1; this script replicates it REPLICAS times with per-replica key
offsets so referential integrity holds within each replica:

- fact/scaling tables (lineitem, orders, customer, supplier, part,
  events): every key column gets + replica * KEY_OFFSET; all foreign
  keys are offset with the same constant, so each replica is an
  isolated, internally-consistent star.
- region/nation: fixed dimensions, copied as-is (they do not grow).
- documents: replica 0 verbatim; replicas >0 get a replica-specific
  marker token spliced in every MARKER_EVERY tokens, so cross-replica
  copies of the same doc share < 50% of their trigram shingles and do
  NOT form near-dup clusters (a raw copy would turn every doc into a
  10-member dup cluster — 45 pairs each — which is not what a real
  sf1 corpus looks like; within-replica dup structure is preserved).
- embeddings: fresh unit vectors per replica (seeded by replica id,
  same dim/labels), so ANN bucket occupancy scales like a real corpus
  instead of 10 exact copies of every vector.

Usage: python scripts/make_stress_sf.py [out_dir] [replicas]
Defaults: .stress/sf1, 10. Output is gitignored; ~10x sf0.1 bytes.
"""

from __future__ import annotations

import os
import pathlib
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 10_000_000  # > any sf0.1 key; partkeys stay < 2^31
MARKER_EVERY = 7

# key columns to offset, per table
OFFSET_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}


def replicate_sql(con, table: str, out: str, replicas: int) -> None:
    cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM src_{table}").fetchall()]
    off = OFFSET_COLS[table]
    sel = ", ".join(
        f"{c} + i * {KEY_OFFSET} AS {c}" if c in off else c for c in cols
    )
    con.sql(
        f"COPY (SELECT {sel} FROM src_{table} CROSS JOIN range({replicas}) t(i)) "
        f"TO '{out}' (FORMAT PARQUET)"
    )


def perturb_text(text: str, replica: int) -> str:
    toks = text.split(" ")
    out = []
    for j, t in enumerate(toks):
        if j and j % MARKER_EVERY == 0:
            out.append(f"zr{replica}m{j}")
        out.append(t)
    return " ".join(out)


def make_documents(out: str, replicas: int) -> None:
    base = pd.read_parquet(f"{SRC}/documents.parquet")
    parts = [base]
    for i in range(1, replicas):
        d = base.copy()
        d["doc_id"] = d["doc_id"] + i * KEY_OFFSET
        d["text"] = [perturb_text(t, i) for t in base["text"]]
        d["n_chars"] = d["text"].str.len().astype("int64")
        parts.append(d)
    pd.concat(parts, ignore_index=True).to_parquet(out, index=False)


def make_embeddings(out: str, replicas: int) -> None:
    base = pd.read_parquet(f"{SRC}/embeddings.parquet")
    dim = len(base["embedding"].iloc[0])
    parts = [base]
    for i in range(1, replicas):
        rng = np.random.default_rng(1000 + i)
        v = rng.standard_normal((len(base), dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        d = pd.DataFrame(
            {
                "vec_id": base["vec_id"] + i * KEY_OFFSET,
                "embedding": list(v),
                "label": base["label"].to_numpy(),
            }
        )
        parts.append(d)
    pd.concat(parts, ignore_index=True).to_parquet(out, index=False)


def main() -> None:
    out_dir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else ".stress/sf1")
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in list(OFFSET_COLS) + ["region", "nation"]:
        con.sql(f"CREATE VIEW src_{t} AS SELECT * FROM '{SRC}/{t}.parquet'")
    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM src_{t}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")
    for t in OFFSET_COLS:
        replicate_sql(con, t, f"{out_dir}/{t}.parquet", replicas)
        print(f"{t}: done", flush=True)
    make_documents(f"{out_dir}/documents.parquet", replicas)
    print("documents: done", flush=True)
    make_embeddings(f"{out_dir}/embeddings.parquet", replicas)
    print("embeddings: done", flush=True)
    for f in sorted(os.listdir(out_dir)):
        n = duckdb.sql(f"SELECT count(*) FROM '{out_dir}/{f}'").fetchone()[0]
        print(f"{f}: {n} rows")


if __name__ == "__main__":
    main()
