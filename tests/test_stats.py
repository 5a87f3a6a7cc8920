"""Analytic invariants for the statistics operators (stats.py,
anomaly.py MAD, graph Jaccard) on constructed inputs where the right
answer is known in closed form — the complement of the DuckDB oracle,
which only proves Spark ≡ DuckDB, not Spark ≡ math.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from alexandria_pipeline_spark.operators.stats import (
    doc_length_gini,
    orders_cusum_changepoint,
    orders_linreg_trend,
)


def _orders_from_days(spark, rows):
    """rows: (day_offset, totalprice_dollars) -> minimal orders frame."""
    df = spark.createDataFrame(rows, "dd int, o_totalprice double")
    return df.select(
        F.monotonically_increasing_id().alias("o_orderkey"),
        F.lit(1).cast("long").alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        "o_totalprice",
        F.timestamp_seconds(
            F.lit(946684800) + F.col("dd").cast("long") * 86400
        ).alias("o_orderdate"),  # 2000-01-01 + dd days
        F.lit("1-URGENT").alias("o_orderpriority"),
    )


def _patch_loader(monkeypatch, module, df, table):
    import alexandria_pipeline_spark.operators.stats as stats_mod

    def fake_load(spark, sf_dir, name):
        assert name == table
        return df

    monkeypatch.setattr(stats_mod, "load_table", fake_load)


def test_linreg_exact_slope_on_synthetic_line(spark, monkeypatch):
    # revenue = 100 + 2.5 * day dollars -> slope 250 cents = 250_000 milli
    rows = [(d, 100.0 + 2.5 * d) for d in range(30)]
    _patch_loader(monkeypatch, None, _orders_from_days(spark, rows), "orders")
    out = orders_linreg_trend(spark, "ignored").collect()[0]
    assert out["n_days"] == 30
    assert out["slope_millicents_per_day"] == 250_000


def test_linreg_zero_slope_on_constant_series(spark, monkeypatch):
    rows = [(d, 500.0) for d in range(10)]
    _patch_loader(monkeypatch, None, _orders_from_days(spark, rows), "orders")
    out = orders_linreg_trend(spark, "ignored").collect()[0]
    assert out["slope_millicents_per_day"] == 0


def test_cusum_finds_planted_level_shift(spark, monkeypatch):
    # 20 days at $100, then 20 days at $900 -> CUSUM peaks at the
    # last pre-shift day (index 20, offset 19).
    rows = [(d, 100.0) for d in range(20)] + [(d, 900.0) for d in range(20, 40)]
    _patch_loader(monkeypatch, None, _orders_from_days(spark, rows), "orders")
    out = orders_cusum_changepoint(spark, "ignored").collect()[0]
    assert out["n_days"] == 40
    assert out["cp_index"] == 20
    assert out["cp_date"] == "2000-01-20"


def test_gini_zero_for_equal_lengths_and_known_for_extreme(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.stats as stats_mod

    def make_docs(lengths):
        return spark.createDataFrame(
            [(i, "x", "en", "s", n) for i, n in enumerate(lengths)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    equal = make_docs([500] * 64)
    monkeypatch.setattr(stats_mod, "load_table", lambda s, d, n: equal)
    assert doc_length_gini(spark, "ignored").collect()[0]["gini_ppm"] == 0

    # one doc holds all the mass: G = (n-1)/n = 3/4 for n=4
    skewed = make_docs([0, 0, 0, 1000])
    monkeypatch.setattr(stats_mod, "load_table", lambda s, d, n: skewed)
    assert doc_length_gini(spark, "ignored").collect()[0]["gini_ppm"] == 750_000


def test_mad_constant_series_flags_nothing(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.anomaly as anomaly_mod

    events = spark.createDataFrame(
        [(i, 1, "click", 5.0) for i in range(50)]
        + [(100 + i, 1, "buy", float(i)) for i in range(50)],
        "event_id long, user_id long, event_type string, value double",
    ).select(
        "event_id",
        F.timestamp_seconds(F.lit(946684800) + F.col("event_id")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    monkeypatch.setattr(anomaly_mod, "load_table", lambda s, d, n: events)
    rows = {
        r["event_type"]: r
        for r in anomaly_mod.events_anomaly_mad(spark, "ignored").collect()
    }
    # constant series: MAD = 0 and every deviation is 0 -> no flags
    assert rows["click"]["mad_cents"] == 0
    assert rows["click"]["n_anomalies"] == 0
    # uniform 0..49: median 24.5 -> floor 2450c; MAD = floor(12.5*100)=1250c;
    # |v - 2450| > 3750 has no solutions within [0, 4900] -> 0 flags
    assert rows["buy"]["median_cents"] == 2450
    assert rows["buy"]["mad_cents"] == 1250
    assert rows["buy"]["n_anomalies"] == 0


def test_jaccard_neighbors_complete_graph(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.graph as graph_mod

    # one order containing parts {1..5} -> K5: every edge's endpoints
    # share exactly the other 3 parts; |N(a) u N(b)| = 5 ->
    # J = 3/5 = 600000 ppm for all 10 edges.
    li = spark.createDataFrame(
        [(1, p) for p in range(1, 6)], "l_orderkey long, l_partkey long"
    )
    monkeypatch.setattr(graph_mod, "load_table", lambda s, d, n: li)
    out = graph_mod.graph_jaccard_neighbors(spark, "ignored").collect()
    assert len(out) == 10
    assert {r["jaccard_ppm"] for r in out} == {600_000}
    assert {r["n_common"] for r in out} == {3}


def test_autocorr_alternating_series_is_minus_one(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.stats as stats_mod

    # 11 days alternating 10/20 events -> 10 lag pairs, 5 of (10,20)
    # and 5 of (20,10): AR(1) phi = -1 exactly.
    rows = []
    eid = 0
    for d in range(11):
        for _ in range(10 if d % 2 == 0 else 20):
            rows.append((eid, 946684800 + d * 86400, 1, "click", 1.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, sec long, user_id long, event_type string, value double, props string"
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    monkeypatch.setattr(stats_mod, "load_table", lambda s, d_, n: events)
    out = stats_mod.events_autocorr_ar1(spark, "ignored").collect()[0]
    assert out["n_pairs"] == 10
    assert out["phi_ppm"] == -1_000_000


def test_hapax_ratio_tiny_corpus(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.text_analysis as ta_mod

    docs = spark.createDataFrame(
        [(1, "a b a", "en", "s", 5), (2, "c", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(ta_mod, "load_table", lambda s, d, n: docs)
    out = ta_mod.text_hapax_ratio(spark, "ignored").collect()[0]
    assert out["vocab_size"] == 3
    assert out["n_hapax"] == 2  # b, c
    assert out["n_tokens"] == 4
    assert out["hapax_ppm"] == 666_666


def test_label_outliers_flags_planted_point(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.similarity as sim_mod

    # 20 identical vectors + 1 planted far point in one label: the P95
    # fence lands exactly on the common distance (rank 19 of 21 is an
    # integer percentile position), so only the far point exceeds it.
    vecs = [(i, [1.0, 0.0], 7) for i in range(20)] + [(99, [0.0, 1.0], 7)]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    monkeypatch.setattr(sim_mod, "load_table", lambda s, d, n: emb)
    out = sim_mod.embedding_label_outliers(spark, "ignored").collect()[0]
    assert out["n_vecs"] == 21
    assert out["n_outliers"] == 1


def test_fano_constant_and_known_dispersion(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.stats as stats_mod

    # "click": 3 events in each of 2 minutes -> variance 0 -> Fano 0.
    # "buy": counts 1 and 3 -> (n*ss - s*s)/(n*s) = (20-16)/8 = 0.5.
    rows = []
    eid = 0
    for minute, n in [(0, 3), (1, 3)]:
        for _ in range(n):
            rows.append((eid, minute * 60, 1, "click", 1.0, "{}")); eid += 1
    for minute, n in [(0, 1), (1, 3)]:
        for _ in range(n):
            rows.append((eid, minute * 60, 1, "buy", 1.0, "{}")); eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, sec long, user_id long, event_type string, value double, props string"
    ).select(
        "event_id", F.timestamp_seconds("sec").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    monkeypatch.setattr(stats_mod, "load_table", lambda s, d, n: events)
    out = {r["event_type"]: r for r in stats_mod.events_burstiness_fano(spark, "x").collect()}
    assert out["click"]["fano_ppm"] == 0
    assert out["buy"]["fano_ppm"] == 500_000


def test_mix_shift_zero_for_identical_mix(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.stats as stats_mod

    # same 2:1 priority mix in both years -> every O == E -> chi2 = 0
    rows = []
    oid = 0
    for yr_off, base in [(0, 946684800), (1, 978307200)]:  # 2000, 2001
        for pri, n in [("1-URGENT", 20), ("5-LOW", 10)]:
            for _ in range(n):
                rows.append((oid, 1, "O", 100.0, base, pri)); oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, sec long, o_orderpriority string"
    ).withColumn("o_orderdate", F.timestamp_seconds("sec")).drop("sec")
    monkeypatch.setattr(stats_mod, "load_table", lambda s, d, n: orders)
    out = stats_mod.orders_priority_mix_shift(spark, "x").collect()[0]
    assert out["n_orders"] == 60
    assert out["dof"] == 1
    assert out["chi2_ppm"] == 0


def test_runs_test_trending_vs_alternating(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.stats as stats_mod

    # 10 low days then 10 high days -> exactly 2 runs (pure trend).
    trend = [(d, 100.0) for d in range(10)] + [(d, 900.0) for d in range(10, 20)]
    _patch_loader(monkeypatch, None, _orders_from_days(spark, trend), "orders")
    out = stats_mod.orders_runs_test(spark, "x").collect()[0]
    assert out["n_above"] == 10 and out["n_below"] == 10
    assert out["n_runs"] == 2
    assert out["expected_runs_milli"] == 11_000  # 1 + 2*100/20 = 11

    # perfect alternation -> n1+n2 runs (maximum oscillation)
    alt = [(d, 100.0 if d % 2 == 0 else 900.0) for d in range(20)]
    _patch_loader(monkeypatch, None, _orders_from_days(spark, alt), "orders")
    out = stats_mod.orders_runs_test(spark, "x").collect()[0]
    assert out["n_runs"] == 20


def test_degree_distribution_k5(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.graph as graph_mod

    li = spark.createDataFrame(
        [(1, p) for p in range(1, 6)], "l_orderkey long, l_partkey long"
    )
    monkeypatch.setattr(graph_mod, "load_table", lambda s, d, n: li)
    out = graph_mod.graph_degree_distribution(spark, "x").collect()
    assert len(out) == 1
    assert out[0]["degree"] == 4
    assert out[0]["n_nodes"] == 5
    assert out[0]["n_nodes_at_least"] == 5


def test_abc_classes_partition_everything(spark, monkeypatch):
    import alexandria_pipeline_spark.operators.stats as stats_mod

    # one dominant part (80% of revenue) and 4 small ones: the whale is
    # class A alone; shares must sum to 1e6 - rounding slack.
    rows = [(1, 8000.0)] + [(p, 500.0) for p in range(2, 6)]
    li = spark.createDataFrame(rows, "l_partkey long, l_extendedprice double") \
        .withColumn("l_orderkey", F.lit(1).cast("long"))
    monkeypatch.setattr(stats_mod, "load_table", lambda s, d, n: li)
    out = {r["abc"]: r for r in stats_mod.orders_abc_classification(spark, "x").collect()}
    assert out["A"]["n_parts"] == 1 and out["A"]["revenue_cents"] == 800_000
    assert sum(r["n_parts"] for r in out.values()) == 5
    assert sum(r["revenue_cents"] for r in out.values()) == 1_000_000
