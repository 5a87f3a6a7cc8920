"""Table loading over the driver testdata star schema.

Reference analog: the reference materializes whole Parquet files into
pandas (`run.py:20-21`, `process.py:64-67`); here every load is a lazy
`spark.read.parquet` scan so Catalyst gets column pruning + predicate
pushdown for free and nothing is materialized until an action runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor — a
# region/nation table never grows with the fact data, so joins against
# them must always be broadcast-hash, never shuffle.
BROADCAST_DIMS = {"region", "nation"}


def _ensure_event_time_confs(spark: SparkSession) -> None:
    """Confs the events table needs, set at RUNTIME, not only in our
    session factory: callers (the correctness driver, a notebook,
    spark-submit) construct their own SparkSession and never see
    session.py, so every read path must be self-sufficient in a bare
    session. Both confs are runtime-settable.

    - nanosAsLong: a timestamp[ns] parquet column is only readable as a
      raw int64 with this on (Spark rejects TIMESTAMP(NANOS) otherwise).
    - session.timeZone=UTC: a timestamp[us] column WITHOUT
      isAdjustedToUTC reads as TIMESTAMP_NTZ; interpreting that
      wall-clock as an instant goes through the session timezone. The
      oracle engine (DuckDB) treats the same column as naive-UTC, so the
      session MUST be UTC for the engines to agree — measured: in an
      America/New_York session, `to_utc_timestamp(ntz, 'UTC')` lands
      5 h off DuckDB's epoch_us. Forcing UTC here matches session.py's
      documented contract.

    The timezone pin is a GLOBAL session mutation: it also changes how
    the caller's own timestamp/date-string expressions resolve after the
    first events read. We warn (once per divergent session) rather than
    silently overwrite.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
    if prev_tz not in (None, "UTC", "Etc/UTC", "GMT"):
        import warnings

        warnings.warn(
            f"load_table('events') is pinning spark.sql.session.timeZone "
            f"to UTC (was {prev_tz!r}) for event-time correctness; this "
            f"affects ALL timestamp expressions in this session.",
            stacklevel=3,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TIMESTAMP (UTC instant),
    whatever physical type the testdata generator chose this round:

    - int64 ns-since-epoch (timestamp[ns] + nanosAsLong) → integer
      division to µs, then timestamp_micros. Integer division because
      ns-since-epoch (~1.7e18) exceeds double's 53-bit mantissa; float
      division would corrupt the low microseconds.
    - TIMESTAMP_NTZ (timestamp[us], no UTC flag) → cast to TIMESTAMP.
      Exact because _ensure_event_time_confs pinned the session to UTC.
    - TIMESTAMP → already an instant; passthrough.

    Every downstream operator (unix_micros, windows, watermarks, as-of
    joins) sees one stable type regardless of the source file's choice.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily read one testdata table; events.ts is normalized to a
    UTC-instant TIMESTAMP across all physical encodings the generator
    has shipped (int64 ns, timestamp[ns], timestamp[us] NTZ,
    timestamp[us] UTC) — see normalize_event_ts.

    SIDE EFFECT: loading 'events' pins spark.sql.session.timeZone=UTC
    for the WHOLE session (required for NTZ correctness vs the oracle);
    a warning is emitted if the session was on a different timezone."""
    if name == "events":
        _ensure_event_time_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def spread_to_cores(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster parallelism, but ONLY if the
    frame is currently narrower — a no-op on a real cluster where the
    scan is already wide, essential on the local fixtures where a
    ~10 MB single-row-group parquet scans as ONE partition and a
    downstream CPU-heavy scorer (e.g. a 64-float interpreted dot fold
    per candidate pair) would serialize on one core (measured: 43 s
    single-core vs ~2 s spread for knn_label_eval at the sf1 stress).
    The byte-based knobs (maxPartitionBytes, AQE advisory sizes) size
    partitions by DATA volume and cannot see CPU-per-row, so the
    spread is an explicit plan-time decision gated on the actual
    partition count."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
