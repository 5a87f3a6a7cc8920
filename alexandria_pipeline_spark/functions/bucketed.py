"""Per-LSH-bucket vectorized exact scoring (Arrow/pandas kernel).

Why this exists: the knn-eval family and dedup_embedding_cosine verify
LSH candidates with an exact float64 dot product. Expressed as a
bucket self-JOIN + `aggregate(zip_with(...))` fold, every candidate
PAIR carries two 64-float arrays through the join and pays an
interpreted higher-order-function fold (~8 µs/pair measured at sf1:
the fold was 12.6 s of a 13.1 s stage; the join itself 0.5 s). At
sf10 that made three sibling evals each pay ~170 s for one logical
computation (round-7 verdict #1).

This kernel inverts the data movement: `groupBy(bucket).applyInPandas`
ships each VECTOR once per bucket (O(n) rows, not O(128·n) pairs),
and each bucket's score matrix is computed in numpy with the exact
same rounding as the JVM fold, then reduced to the per-src artifact
(top-k rows / first-same-label rank / thresholded pairs) INSIDE the
kernel — so the post-kernel plan only ever sees candidate-free
artifact-sized frames.

Bitwise determinism contract (what keeps the DuckDB oracles exact):
the JVM fold computes, per pair, ``((0.0 + x1*y1) + x2*y2) + ...``
where each product and each addition is a single correctly-rounded
float64 op. The kernel reproduces that EXACT sequence vectorized
across pairs: ``S = zeros(); for i in range(dim): S += A[:, i] *
B[:, i]`` — numpy elementwise multiply and add are separate ufuncs,
each correctly rounded per IEEE-754, no FMA fusion — so every score
is bit-identical to the JVM/DuckDB fold and every comparison
(ranking, threshold, round()) agrees across engines. Verified by the
oracle suite: the knn/dedup oracle hashes are unchanged from the
join+fold implementation this replaces.

Scale shape (100 TB): one shuffle of (id, label, vector) keyed by
bucket; bucket population is bounded by the auto-scaled plane count
(dedup.lsh_planes_for keeps expected in-bucket pairs ~128·n, linear to
n ≈ 2^47), so per-group memory is bounded; inside a group the score
matrix is computed in row blocks of <= BLOCK_CELLS float64 cells so
even a degenerate corpus (every vector identical -> one bucket) is
memory-bounded, wall-quadratic — the same failure envelope as the
join plan it replaces, minus the per-pair array shipping.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

# Max float64 cells per score block (32 MiB). Bounds kernel memory for
# pathological buckets; normal buckets (~128 rows) are single-block.
BLOCK_CELLS = 4_194_304


def lsh_bucket_pandas(df: DataFrame, planes: list[list[int]]) -> DataFrame:
    """Append the random-hyperplane bucket id via one mapInPandas pass.

    Semantically identical to dedup.lsh_bucket (bucket = sum over p of
    (1 << p) when projection_p > 0), with each projection computed by
    the SAME exact left fold as the JVM version: acc starts 0.0, then
    acc += x_i(double) * plane[i](double, an exact small integer) in
    index order — every product and addition singly rounded, so the
    sign test (> 0) agrees bitwise with the JVM fold and the DuckDB
    np-CTE at every vector. Exists because the JVM fold is interpreted
    (~18 s for 200k vectors x 11 planes at sf10); this pass is one
    Arrow round-trip and ~dim x planes vectorized ops.

    `planes` is the integer plane table (rows = planes, len(row) =
    dim), passed in by the caller (dedup owns the table; taking it as
    data keeps this module import-cycle-free).
    """
    import numpy as np
    import pandas as pd

    n_planes = len(planes)
    plane_mat = [list(map(float, row)) for row in planes]
    in_cols = df.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", bucket long"

    def add_bucket(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        p = np.asarray(plane_mat, dtype=np.float64)  # (n_planes, dim)
        for pdf in batches:
            if not len(pdf):
                continue
            v64 = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bucket = np.zeros(len(pdf), dtype=np.int64)
            for pi in range(n_planes):
                acc = np.zeros(len(pdf), dtype=np.float64)
                for i in range(v64.shape[1]):
                    acc += v64[:, i] * p[pi, i]
                bucket += np.where(acc > 0, np.int64(1) << pi, 0)
            out = pdf[in_cols].copy()
            out["bucket"] = bucket
            yield out

    return df.mapInPandas(add_bucket, out_schema)


def _score_block(v64, rows):
    """Exact-left-fold score block: rows of v64 x all of v64.

    Returns S[len(rows), n_b] where S[r, c] is bit-identical to the
    JVM fold dot(v[rows[r]], v[c]) (see module docstring).
    """
    import numpy as np

    a = v64[rows]  # (bk, dim)
    n_b, dim = v64.shape
    s = np.zeros((len(rows), n_b), dtype=np.float64)
    for i in range(dim):
        s += a[:, i][:, None] * v64[:, i][None, :]
    return s


def _ranked_order(s_neg, ids, kind: str = "stable"):
    """Row-wise argsort by (score desc, dst asc) with exact tiebreak.

    s_neg is the NEGATED score block (negation is exact), with +inf at
    excluded (self) cells so they sort last.
    """
    import numpy as np

    arr = np.empty(s_neg.shape, dtype=[("ns", "f8"), ("d", "i8")])
    arr["ns"] = s_neg
    arr["d"] = np.broadcast_to(ids, s_neg.shape)
    return np.argsort(arr, axis=1, order=("ns", "d"), kind=kind)


def topk_neighbors(bucketed: DataFrame, k: int, with_labels: bool) -> DataFrame:
    """Per-src top-k neighbors by exact cosine/dot within each bucket.

    bucketed: (vec_id, embedding, bucket[, label]). Output: one row per
    (src, rank<=k): (src[, true_label], dst[, nb_label], score, rk) —
    n·k rows total, ranked by (score desc, dst asc), self excluded.
    """
    import numpy as np
    import pandas as pd

    label_cols = ", true_label int, nb_label int" if with_labels else ""
    schema = f"src long, dst long, score double, rk int{label_cols}"

    def kern(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        n_b = len(ids)
        if n_b < 2:
            return pd.DataFrame(
                {c.split()[0]: [] for c in schema.split(", ")}
            )
        labels = (
            pdf["label"].to_numpy(dtype=np.int32) if with_labels else None
        )
        v64 = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        k_eff = min(k, n_b - 1)
        bk = max(1, BLOCK_CELLS // n_b)
        out = {c: [] for c in ("src", "dst", "score", "rk")}
        if with_labels:
            out["true_label"], out["nb_label"] = [], []
        for start in range(0, n_b, bk):
            rows = np.arange(start, min(start + bk, n_b))
            s = _score_block(v64, rows)
            ns = -s
            ns[ids[None, :] == ids[rows][:, None]] = np.inf  # exclude self
            order = _ranked_order(ns, ids)[:, :k_eff]
            src = np.repeat(ids[rows], k_eff)
            out["src"].append(src)
            out["dst"].append(ids[order].ravel())
            out["score"].append(np.take_along_axis(s, order, axis=1).ravel())
            out["rk"].append(np.tile(np.arange(1, k_eff + 1), len(rows)))
            if with_labels:
                out["true_label"].append(np.repeat(labels[rows], k_eff))
                out["nb_label"].append(labels[order].ravel())
        return pd.DataFrame(
            {c: np.concatenate(v) for c, v in out.items()}
        )

    return bucketed.groupBy("bucket").applyInPandas(kern, schema)


def first_same_label_rank(bucketed: DataFrame) -> DataFrame:
    """Per-src rank of the FIRST same-label neighbor in the full
    (score desc, dst asc) candidate ordering — the MRR primitive.

    Output: (src, true_label, frk) with one row per src that has at
    least one same-label candidate in its bucket; srcs with none are
    absent (the caller's left join counts them as zero).
    """
    import numpy as np
    import pandas as pd

    schema = "src long, true_label int, frk long"

    def kern(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        n_b = len(ids)
        if n_b < 2:
            return pd.DataFrame({"src": [], "true_label": [], "frk": []})
        labels = pdf["label"].to_numpy(dtype=np.int32)
        v64 = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        bk = max(1, BLOCK_CELLS // n_b)
        srcs, tls, frks = [], [], []
        for start in range(0, n_b, bk):
            rows = np.arange(start, min(start + bk, n_b))
            s = _score_block(v64, rows)
            ns = -s
            self_mask = ids[None, :] == ids[rows][:, None]
            ns[self_mask] = np.inf
            order = _ranked_order(ns, ids)
            sorted_lab = labels[order]
            match = sorted_lab == labels[rows][:, None]
            # self sorts last (inf) but must never count as a match
            match &= ids[order] != ids[rows][:, None]
            has = match.any(axis=1)
            frk = match.argmax(axis=1) + 1
            srcs.append(ids[rows][has])
            tls.append(labels[rows][has])
            frks.append(frk[has].astype(np.int64))
        return pd.DataFrame(
            {
                "src": np.concatenate(srcs),
                "true_label": np.concatenate(tls),
                "frk": np.concatenate(frks),
            }
        )

    return bucketed.groupBy("bucket").applyInPandas(kern, schema)


def pairs_above_threshold(bucketed: DataFrame, threshold: float) -> DataFrame:
    """All in-bucket pairs (vec_a < vec_b) with exact dot >= threshold —
    the dedup_embedding_cosine verify stage. Output: (vec_a, vec_b,
    dotp double), un-rounded (the caller rounds JVM-side)."""
    import numpy as np
    import pandas as pd

    schema = "vec_a long, vec_b long, dotp double"

    def kern(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        n_b = len(ids)
        if n_b < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "dotp": []})
        v64 = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        bk = max(1, BLOCK_CELLS // n_b)
        va, vb, dp = [], [], []
        for start in range(0, n_b, bk):
            rows = np.arange(start, min(start + bk, n_b))
            s = _score_block(v64, rows)
            mask = (s >= threshold) & (ids[None, :] > ids[rows][:, None])
            r, c = np.nonzero(mask)
            va.append(ids[rows][r])
            vb.append(ids[c])
            dp.append(s[r, c])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(va),
                "vec_b": np.concatenate(vb),
                "dotp": np.concatenate(dp),
            }
        )

    return bucketed.groupBy("bucket").applyInPandas(kern, schema)
