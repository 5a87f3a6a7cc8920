"""Anomaly / outlier detection over the events stream, cross-engine
exact.

Z-score flagging is normally float arithmetic end to end (mean,
stddev, sqrt) — three places where Spark and DuckDB can drift by an
ulp and flip a boundary row. Here the entire decision is integer:
with v in cents, n·σ²-scaled deviation comparison

    (v·n − Σv)² > z² · (n·Σv² − (Σv)²)

is the exact z-score test |v−μ| > z·σ with both sides multiplied by
n², so no division, no sqrt, no float ever enters. The squares exceed
int64 at scale, so they're computed in decimal(38,0) (Spark) /
HUGEINT (DuckDB) — both exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.functions.exact import int_div
from alexandria_pipeline_spark.registry import query

Z_SCORE = 2  # flag beyond 2σ


@query(
    "events_zscore_anomalies",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    st AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)        AS n,
             CAST(sum(v_c) AS BIGINT)        AS s,
             CAST(sum(CAST(v_c AS HUGEINT) * v_c) AS BIGINT)  AS ss
      FROM v GROUP BY event_type
    )
    SELECT
      v.event_type,
      st.n AS n_events,
      CAST(st.s // st.n AS BIGINT) AS mean_cents,
      CAST(sum(CASE WHEN
            CAST(v.v_c * st.n - st.s AS HUGEINT)
          * CAST(v.v_c * st.n - st.s AS HUGEINT)
          > {Z_SCORE * Z_SCORE}
            * (CAST(st.ss AS HUGEINT) * st.n - CAST(st.s AS HUGEINT) * st.s)
        THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM v JOIN st ON v.event_type = st.event_type
    GROUP BY v.event_type, st.n, st.s
    """,
)
def events_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 2σ outlier counts with a fully integer decision
    rule (module docstring has the algebra). Plan shape: one grouped
    aggregate builds the per-type moments (a handful of rows —
    broadcast back), the flagging pass is narrow, and the final count
    re-uses the same grouping key, so the whole thing is two small
    shuffles regardless of event volume."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type", F.round(F.col("value") * 100).cast("long").alias("v_c"))
    st = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_c").alias("s"),
        # product in decimal BEFORE the sum: v_c^2 alone exceeds int64
        # once per-event values pass ~3e9 cents (extreme-values suite)
        F.sum(F.col("v_c").cast("decimal(38,0)") * F.col("v_c"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    dec = "decimal(38,0)"
    joined = v.join(F.broadcast(st), "event_type")
    dev = (F.col("v_c") * F.col("n") - F.col("s")).cast(dec)
    var_n2 = F.col("ss").cast(dec) * F.col("n") - F.col("s").cast(dec) * F.col("s")
    flagged = (dev * dev > F.lit(Z_SCORE * Z_SCORE) * var_n2).cast("long")
    return (
        joined.withColumn("is_anom", flagged)
        .groupBy("event_type", "n", "s")
        .agg(F.sum("is_anom").alias("n_anomalies"))
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            int_div(F.col("s"), F.col("n")).alias("mean_cents"),
            "n_anomalies",
        )
    )


@query(
    "events_iqr_outliers",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    q AS (
      SELECT event_type,
             CAST(floor(quantile_cont(v_c, 0.25)) AS BIGINT) AS q1,
             CAST(floor(quantile_cont(v_c, 0.75)) AS BIGINT) AS q3
      FROM v GROUP BY event_type
    )
    SELECT
      v.event_type,
      q.q1, q.q3,
      CAST(sum(CASE WHEN 2 * v.v_c < 5 * q.q1 - 3 * q.q3
                      OR 2 * v.v_c > 5 * q.q3 - 3 * q.q1
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM v JOIN q ON v.event_type = q.event_type
    GROUP BY v.event_type, q.q1, q.q3
    """,
)
def events_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outliers (v < Q1 − 1.5·IQR or v > Q3 + 1.5·IQR) per
    event type. The fences are kept integer by scaling the comparison
    by 2: 2v < 5·Q1 − 3·Q3 (and symmetrically) — no float multiplier,
    and the quartiles are floored to the cent grid like the RFM
    cutpoints. Same two-small-shuffle shape as the z-score query; the
    quartile aggregate swaps to percentile_approx unchanged when a
    single type's volume outgrows one aggregation buffer."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type", F.round(F.col("value") * 100).cast("long").alias("v_c"))
    q = v.groupBy("event_type").agg(
        F.floor(F.percentile("v_c", F.lit(0.25))).cast("long").alias("q1"),
        F.floor(F.percentile("v_c", F.lit(0.75))).cast("long").alias("q3"),
    )
    joined = v.join(F.broadcast(q), "event_type")
    is_out = (
        (2 * F.col("v_c") < 5 * F.col("q1") - 3 * F.col("q3"))
        | (2 * F.col("v_c") > 5 * F.col("q3") - 3 * F.col("q1"))
    ).cast("long")
    return (
        joined.withColumn("is_out", is_out)
        .groupBy("event_type", "q1", "q3")
        .agg(F.sum("is_out").alias("n_outliers"))
        .select("event_type", "q1", "q3", "n_outliers")
    )


MAD_K = 3  # flag beyond 3 MADs (≈ 2σ for normal data, hub-robust)


@query(
    "events_anomaly_mad",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    med AS (
      SELECT event_type,
             CAST(floor(quantile_cont(v_c, 0.5)) AS BIGINT) AS med
      FROM v GROUP BY event_type
    ),
    d AS (
      SELECT v.event_type, abs(v.v_c - med.med) AS dev, med.med
      FROM v JOIN med USING (event_type)
    ),
    m2 AS (
      SELECT event_type,
             CAST(floor(quantile_cont(dev, 0.5)) AS BIGINT) AS mad
      FROM d GROUP BY event_type
    )
    SELECT
      d.event_type,
      CAST(count(*) AS BIGINT)     AS n_events,
      CAST(min(d.med) AS BIGINT)   AS median_cents,
      CAST(min(m2.mad) AS BIGINT)  AS mad_cents,
      CAST(sum(CASE WHEN d.dev > {MAD_K} * m2.mad THEN 1 ELSE 0 END)
           AS BIGINT)              AS n_anomalies
    FROM d JOIN m2 USING (event_type)
    GROUP BY d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outliers per event type: flag rows
    with |v − median| > 3·MAD. Unlike the z-score test, both center
    and spread are medians, so a burst of extreme values cannot drag
    the threshold toward itself (breakdown point 50% vs 0%) — the
    robust twin of events_zscore_anomalies. Both medians are floored
    to the cent grid (exact integers; quantile_cont ≡ F.percentile
    interpolation, same floor in both engines) and the decision
    `dev > 3·mad` is pure int64. Plan: two small groupBy(event_type)
    percentile aggregates, each broadcast back to the fact rows, and
    one final count aggregate on the same bounded key — three
    bounded-key shuffles total, no window, no float in any decision."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v_c")
    )
    med = v.groupBy("event_type").agg(
        F.floor(F.percentile("v_c", F.lit(0.5))).cast("long").alias("med")
    )
    d = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v_c") - F.col("med")).alias("dev"), "med"
    )
    m2 = d.groupBy("event_type").agg(
        F.floor(F.percentile("dev", F.lit(0.5))).cast("long").alias("mad")
    )
    flagged = d.join(F.broadcast(m2), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("med").alias("median_cents"),
            F.min("mad").alias("mad_cents"),
            F.sum((F.col("dev") > MAD_K * F.col("mad")).cast("long")).alias(
                "n_anomalies"
            ),
        )
        .select(
            "event_type", "n_events", "median_cents", "mad_cents", "n_anomalies"
        )
    )


SEASONAL_MAD_K = 3


@query(
    "events_seasonal_residual_anomalies",
    oracle=f"""
    WITH hourly AS (
      SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    keyed AS (
      SELECT hour_s, n,
             CAST(dayofweek(to_timestamp(hour_s)) AS BIGINT) AS dow,
             CAST(hour(to_timestamp(hour_s)) AS BIGINT) AS hod
      FROM hourly
    ),
    base AS (
      SELECT dow, hod,
             CAST(floor(quantile_cont(n, 0.5)) AS BIGINT) AS med
      FROM keyed GROUP BY dow, hod
    ),
    resid AS (
      SELECT k.hour_s, k.dow, k.hod, k.n, b.med,
             abs(k.n - b.med) AS abs_resid
      FROM keyed k JOIN base b ON k.dow = b.dow AND k.hod = b.hod
    ),
    mad AS (
      SELECT dow, hod,
             CAST(floor(quantile_cont(abs_resid, 0.5)) AS BIGINT) AS mad
      FROM resid GROUP BY dow, hod
    )
    SELECT
      strftime(to_timestamp(r.hour_s), '%Y-%m-%d %H:00') AS hour,
      r.n, r.med, r.abs_resid, m.mad
    FROM resid r JOIN mad m ON r.dow = m.dow AND r.hod = m.hod
    WHERE r.abs_resid > {SEASONAL_MAD_K} * m.mad AND r.abs_resid > 0
    ORDER BY hour
    """,
)
def events_seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection: hourly event volumes are
    compared against the MEDIAN for their (day-of-week, hour-of-day)
    slot and flagged when the residual exceeds 3x that slot's MAD —
    the robust screen that plain z-scores fail (they flag every Monday
    morning as an anomaly because the baseline ignores the weekly
    cycle). Counts, medians (floored exact percentile), residuals and
    MADs are all integers, so the flag decision is bit-identical
    across engines. Shape: one fact shuffle to hourly counts (rows
    bounded by elapsed hours), then every aggregate/join runs over the
    168-slot baseline frame or the hour-bounded residual frame —
    calendar-bounded end to end, the events_anomaly_mad discipline
    with a seasonal key."""
    e = load_table(spark, sf_dir, "events")
    hour_s = (F.expr("unix_micros(ts) div 1000000 div 3600") * 3600).alias("hour_s")
    hourly = e.groupBy(hour_s).agg(F.count(F.lit(1)).alias("n"))
    keyed = hourly.select(
        "hour_s",
        "n",
        F.dayofweek(F.timestamp_seconds("hour_s")).cast("long").alias("dow"),
        F.hour(F.timestamp_seconds("hour_s")).cast("long").alias("hod"),
    )
    base = keyed.groupBy("dow", "hod").agg(
        F.floor(F.expr("percentile(n, 0.5)")).cast("long").alias("med")
    )
    resid = keyed.join(F.broadcast(base), ["dow", "hod"]).select(
        "hour_s",
        "dow",
        "hod",
        "n",
        "med",
        F.abs(F.col("n") - F.col("med")).alias("abs_resid"),
    )
    mad = resid.groupBy("dow", "hod").agg(
        F.floor(F.expr("percentile(abs_resid, 0.5)")).cast("long").alias("mad")
    )
    return (
        resid.join(F.broadcast(mad), ["dow", "hod"])
        .filter(
            (F.col("abs_resid") > SEASONAL_MAD_K * F.col("mad"))
            & (F.col("abs_resid") > 0)
        )
        .select(
            F.date_format(F.timestamp_seconds("hour_s"), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
            F.col("n").cast("long").alias("n"),
            "med",
            F.col("abs_resid").cast("long").alias("abs_resid"),
            "mad",
        )
        .orderBy("hour")
    )


@query(
    "events_anomaly_consensus",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    st AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v_c) AS BIGINT) AS s,
             CAST(sum(CAST(v_c AS HUGEINT) * v_c) AS BIGINT) AS ss,
             CAST(floor(quantile_cont(v_c, 0.25)) AS BIGINT) AS q1,
             CAST(floor(quantile_cont(v_c, 0.50)) AS BIGINT) AS med,
             CAST(floor(quantile_cont(v_c, 0.75)) AS BIGINT) AS q3
      FROM v GROUP BY event_type
    ),
    mad AS (
      SELECT v.event_type,
             CAST(floor(quantile_cont(abs(v.v_c - st.med), 0.5)) AS BIGINT) AS mad
      FROM v JOIN st USING (event_type) GROUP BY v.event_type
    ),
    flags AS (
      SELECT v.event_type,
             CASE WHEN CAST(v.v_c * st.n - st.s AS HUGEINT)
                     * CAST(v.v_c * st.n - st.s AS HUGEINT)
                     > 4
                     * (CAST(st.ss AS HUGEINT) * st.n
                        - CAST(st.s AS HUGEINT) * st.s)
                  THEN 1 ELSE 0 END AS f_z,
             CASE WHEN 2 * v.v_c < 5 * st.q1 - 3 * st.q3
                    OR 2 * v.v_c > 5 * st.q3 - 3 * st.q1
                  THEN 1 ELSE 0 END AS f_iqr,
             CASE WHEN abs(v.v_c - st.med) > 3 * mad.mad
                  THEN 1 ELSE 0 END AS f_mad
      FROM v JOIN st USING (event_type) JOIN mad USING (event_type)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(f_z) AS BIGINT)   AS n_zscore,
           CAST(sum(f_iqr) AS BIGINT) AS n_iqr,
           CAST(sum(f_mad) AS BIGINT) AS n_mad,
           CAST(sum(CASE WHEN f_z + f_iqr + f_mad >= 2 THEN 1 ELSE 0 END)
                AS BIGINT)            AS n_consensus
    FROM flags
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_anomaly_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble anomaly voting: an event is a CONSENSUS outlier when
    at least 2 of the 3 registered detectors (2σ z-test, Tukey
    fences, 3×MAD) agree — each detector alone has a known blind spot
    (σ inflated by the outliers themselves; fences brittle on skew;
    MAD degenerate when >50% of values tie) and the majority vote is
    the standard production mitigation. Every rule is the SAME
    integer decision form its standalone query uses (this query's
    per-detector counts must equal theirs — the oracle recomputes all
    three from shared statistics CTEs). One value scan joined to
    type-cardinality statistics broadcasts; one type-row read-out."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v_c")
    )
    dec = "decimal(38,0)"
    st = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_c").alias("s"),
        F.sum(F.col("v_c").cast(dec) * F.col("v_c")).cast(dec).alias("ss"),
        F.floor(F.expr("percentile(v_c, 0.25)")).cast("long").alias("q1"),
        F.floor(F.expr("percentile(v_c, 0.50)")).cast("long").alias("med"),
        F.floor(F.expr("percentile(v_c, 0.75)")).cast("long").alias("q3"),
    )
    with_st = v.join(F.broadcast(st), "event_type")
    mad = (
        with_st.groupBy("event_type")
        .agg(
            F.floor(F.expr("percentile(abs(v_c - med), 0.5)"))
            .cast("long")
            .alias("mad")
        )
    )
    flagged = with_st.join(F.broadcast(mad), "event_type").select(
        "event_type",
        F.expr(
            "CASE WHEN CAST(v_c * n - s AS decimal(38,0))"
            " * CAST(v_c * n - s AS decimal(38,0))"
            f" > {Z_SCORE * Z_SCORE}"
            " * (CAST(ss AS decimal(38,0)) * n - CAST(s AS decimal(38,0)) * s)"
            " THEN 1 ELSE 0 END"
        ).alias("f_z"),
        F.expr(
            "CASE WHEN 2 * v_c < 5 * q1 - 3 * q3"
            " OR 2 * v_c > 5 * q3 - 3 * q1 THEN 1 ELSE 0 END"
        ).alias("f_iqr"),
        F.expr(
            f"CASE WHEN abs(v_c - med) > {MAD_K} * mad THEN 1 ELSE 0 END"
        ).alias("f_mad"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("f_z").alias("n_zscore"),
            F.sum("f_iqr").alias("n_iqr"),
            F.sum("f_mad").alias("n_mad"),
            F.sum(
                (F.col("f_z") + F.col("f_iqr") + F.col("f_mad") >= 2).cast("long")
            ).alias("n_consensus"),
        )
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_zscore").cast("long").alias("n_zscore"),
            F.col("n_iqr").cast("long").alias("n_iqr"),
            F.col("n_mad").cast("long").alias("n_mad"),
            F.col("n_consensus").cast("long").alias("n_consensus"),
        )
        .orderBy("event_type")
    )
