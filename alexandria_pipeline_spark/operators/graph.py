"""Graph analytics over the star schema: iterative PageRank on the
part co-purchase graph (parts appearing in the same order are linked).

The interesting part is EXACT cross-engine iteration: PageRank is
normally float fixpoint, which would diverge bit-wise across engines
after one aggregation (sum order). Here every rank lives in int64
micro-units and every division is truncating integer division, so
three Spark iterations produce bit-identical values to three unrolled
CTE stages in DuckDB — the same technique functions/exact.py uses for
money (never round a float quotient).

Scale notes: the edge list is built once (distinct pairs per order —
one shuffle), degree is a broadcastable per-node aggregate, and each
iteration is one shuffle (groupBy dst). Long runs bound their lineage
via pagerank_ranks' checkpoint rotation (localCheckpoint every K
iterations, superseded cache unpersisted); dedup_connected_components
applies the same pattern per-iteration in its convergence loop."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.functions.exact import int_div
from alexandria_pipeline_spark.registry import query

PR_ITERS = 3
DAMP_MICRO = 850_000
BASE_MICRO = 150_000


def _duck_pagerank_sql() -> str:
    ctes = [
        "op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """edges AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM op a JOIN op b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2
        )""",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src)",
        "r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg)",
    ]
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""s{i} AS (
              SELECT e.dst AS node, sum({prev}.r // d.deg) AS s
              FROM edges e
              JOIN {prev} ON e.src = {prev}.node
              JOIN deg d ON d.src = e.src
              GROUP BY e.dst
            )"""
        )
        ctes.append(
            f"r{i} AS (SELECT node, CAST({BASE_MICRO} + ({DAMP_MICRO} * s) // 1000000"
            f" AS BIGINT) AS r FROM s{i})"
        )
        prev = f"r{i}"
    return (
        "WITH " + ",\n".join(ctes) +
        f"\nSELECT node AS part_id, r AS rank_micro FROM {prev}"
    )


def pagerank_ranks(
    edges_deg: DataFrame,
    deg: DataFrame,
    iters: int = PR_ITERS,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Damped integer-unit PageRank core. Every `checkpoint_every`
    iterations the rank frame is eagerly localCheckpointed: lineage
    depth stays bounded by the interval instead of growing with the
    iteration count, and the superseded checkpoint is unpersisted —
    the persist-rotation every long iterative Spark job needs. Short
    loops (the 3-iteration registered query) never hit the interval,
    so the registered plan stays fully lazy."""
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("long").alias("r")
    )
    prev_ckpt = None
    for i in range(1, iters + 1):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(int_div(F.col("r"), F.col("deg"))).alias("s"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (
                F.lit(BASE_MICRO)
                + int_div(F.lit(DAMP_MICRO) * F.col("s"), F.lit(1_000_000))
            ).cast("long").alias("r"),
        )
        if i % checkpoint_every == 0 and i < iters:
            ranks = ranks.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                prev_ckpt.unpersist()
            prev_ckpt = ranks
    return ranks


@query("graph_pagerank_copurchase", oracle=_duck_pagerank_sql())
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration damped PageRank (d=0.85) over the undirected part
    co-purchase graph, all arithmetic in int64 micro-units. Every
    node has degree >= 1 by construction (nodes ARE edge endpoints),
    so there is no dangling mass and each iteration covers every
    node."""
    l = load_table(spark, sf_dir, "lineitem")
    op = l.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "k")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    ranks = pagerank_ranks(edges_deg, deg, PR_ITERS)
    return ranks.select(F.col("node").alias("part_id"), F.col("r").alias("rank_micro"))
