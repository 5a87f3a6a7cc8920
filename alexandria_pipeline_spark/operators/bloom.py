"""Distributed Bloom-filter join pruning.

The 100-TB problem this solves: a selective predicate on one fact
table (orders) must prune a much larger fact table (lineitem) BEFORE
the join shuffle. A broadcast join works when the selected keys fit in
memory as an exact set; a Bloom filter compresses the key set ~10×
further (1 bit-ish per key per hash vs 8-byte keys + hash-set
overhead), so key sets far beyond broadcast-hash range still prune
scan-side. Spark's AQE injects runtime bloom filters for exactly this
shape (spark.sql.optimizer.runtime.bloomFilter.*); this operator is
the explicit, inspectable version of that rewrite, built from
DataFrame primitives:

  build:  selected keys → k hash positions each → OR into 64-bit words
          (groupBy word index, bit_or aggregate) → collapse to ONE row
          holding the filter as a map<word_idx, word> → broadcast.
  probe:  each probe row computes its k positions and tests all k bits
          with element_at on the broadcast map — no explode, no
          shuffle, whole-stage codegen.
  verify: survivors still pass through the EXACT semi join, so Bloom
          false positives drop out and the result is exactly the
          unfiltered semi join (which is why the oracle below is plain
          ANSI SQL with no hash arithmetic — the filter only prunes).

False-negative-free by construction; xxhash64 is therefore free to be
Spark-specific. Filter sizing: m = 2^20 bits / k = 3 gives ~1% false
positives at ~87k keys (m·ln2/k); both are module constants a caller
would size from the build-side count at plan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.registry import query

BLOOM_BITS = 1 << 20  # m: filter size in bits (128 KiB of words)
BLOOM_HASHES = 3  # k: probes per key


def _positions(key, m: int = BLOOM_BITS, k: int = BLOOM_HASHES):
    """k independent bit positions for a key: xxhash64 seeded per
    probe. pmod keeps positions non-negative."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(k)]


def _bit(pos) -> F.Column:
    """1L << (pos % 64) with a COLUMN shift amount — the Python
    `F.shiftleft` signature only takes an int literal, so call the SQL
    function directly."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, 64).cast("int")
    )


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Aggregate a key column into a ONE-ROW Bloom filter: a DENSE
    array<long> of exactly m/64 words. Positions → (word_idx,
    bit_or(bits)) → left join against the full index range → ordered
    collect into the array. Dense (not map<idx,word>) because Spark's
    map element_at is a LINEAR scan of the entries — at m=2^20 that
    made every probe O(16k) and the probe stage ~10× slower than the
    exact join it was meant to prune; array element_at is a direct
    offset read. The single row is ~m/8 bytes regardless of key
    count."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col)))).alias("pos")
    )
    words = pos.groupBy((F.col("pos") / 64).cast("long").alias("w")).agg(
        F.bit_or(_bit(F.col("pos"))).alias("word")
    )
    idx = keys.sparkSession.range(BLOOM_BITS // 64).select(
        F.col("id").alias("w")
    )
    dense = idx.join(words, "w", "left").select(
        "w", F.coalesce("word", F.lit(0).cast("long")).alias("word")
    )
    # array_sort on structs orders by the first field (w), so the
    # collect is deterministic and the array index IS the word index.
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "word"))),
            lambda s: s["word"],
        ).alias("bloom")
    )


def bloom_might_contain(key, bloom_col) -> F.Column:
    """True iff ALL k bits for the key are set in the broadcast dense
    word array (1-based element_at, O(1) per probe)."""
    tests = []
    for p in _positions(key):
        word = F.element_at(bloom_col, (p / 64).cast("int") + 1)
        tests.append(word.bitwiseAND(_bit(p)) != 0)
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    return cond


@query(
    "join_bloom_pruned",
    oracle="""
    SELECT
      l_orderkey,
      CAST(count(*) AS BIGINT)         AS n_items,
      round(sum(l_extendedprice), 2)   AS gross
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
    )
    GROUP BY l_orderkey
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact-fact semi join: high-value orders select ~2%
    of keys; the Bloom filter prunes lineitem scan-side (broadcast
    map probe, no shuffle), and the exact semi join then runs on the
    survivors only — so the shuffle moves ~2% of the fact table
    instead of all of it. The oracle is the plain semi join: the
    Bloom stage must be result-invisible (false positives verified
    away, false negatives impossible)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    sel = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey")

    bloom = bloom_build(sel, "o_orderkey")
    pruned = (
        l.join(F.broadcast(bloom))  # 1-row broadcast, no shuffle
        .filter(bloom_might_contain(F.col("l_orderkey"), F.col("bloom")))
        .drop("bloom")
    )
    exact = pruned.join(
        sel, pruned.l_orderkey == sel.o_orderkey, "left_semi"
    )
    return exact.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("gross"),
    )
