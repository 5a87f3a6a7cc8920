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
- documents: replica 0 verbatim; replicas >0 get every token rotated
  through a replica-keyed deterministic map (crc32-seeded, same-length
  pseudo-token), so cross-replica copies of the same doc share ~ZERO
  trigram shingles — per-shingle document frequency matches a real
  corpus instead of being 10x inflated (the earlier marker-splicing
  variant left ~4/7 of shingles shared across replicas, which made
  dedup stress walls partly a fixture artifact — round-4 verdict item
  #5). Because the map is FUNCTIONAL per replica, within-replica
  near-dup structure (shared spans, shared first-10-token prefixes) is
  preserved exactly. The script measures and prints the realized
  replica-0 vs replica-1 shingle share after generation.
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
import zlib

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 10_000_000  # > any sf0.1 key; partkeys stay < 2^31

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


_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_rot_cache: dict[tuple[str, int], str] = {}


def _rotate_token(tok: str, replica: int) -> str:
    """Same-length pseudo-token, deterministic in (token, replica).

    crc32-seeded so runs are reproducible regardless of
    PYTHONHASHSEED; cached — the corpus vocabulary is small, so the
    per-call cost is one dict hit."""
    key = (tok, replica)
    v = _rot_cache.get(key)
    if v is None:
        chars = []
        h = zlib.crc32(f"{replica}:{tok}".encode())
        while len(chars) < max(len(tok), 2):
            h = zlib.crc32(str(h).encode())
            chars.append(_ALPHA[h % 26])
        v = "".join(chars[: max(len(tok), 2)])
        _rot_cache[key] = v
    return v


def perturb_text(text: str, replica: int) -> str:
    return " ".join(_rotate_token(t, replica) for t in text.split(" "))


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
    # Report the realized cross-replica trigram-shingle share (the
    # fixture-quality metric round-4 flagged): fraction of replica-1's
    # distinct shingles that also occur in replica 0. Near-zero means
    # per-shingle df matches a real corpus.
    share = duckdb.sql(
        f"""
        WITH sh AS (
          SELECT doc_id // {KEY_OFFSET} AS rep,
                 toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                FROM '{out_dir}/documents.parquet'
                WHERE doc_id < 2 * {KEY_OFFSET}),
               LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i)
        ),
        r0 AS (SELECT DISTINCT shingle FROM sh WHERE rep = 0),
        r1 AS (SELECT DISTINCT shingle FROM sh WHERE rep = 1)
        SELECT
          (SELECT count(*) FROM r1 JOIN r0 USING (shingle)) AS shared,
          (SELECT count(*) FROM r1) AS total
        """
    ).fetchone()
    print(
        f"cross-replica shingle share (r1 vs r0): {share[0]}/{share[1]}"
        f" = {share[0] / max(share[1], 1):.4f}"
    )


if __name__ == "__main__":
    main()
