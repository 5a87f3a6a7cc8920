"""Measured skew experiment: does the salting machinery earn its keep
under AQE, and where does AQE alone suffice?

Builds a deliberately skewed events fixture (one hot user owns ~30% of
all rows — the celebrity/bot shape), then times three plans on it:

  1. groupBy(user_id) count            — partial aggregation should
                                         make skew invisible (map-side
                                         combine collapses the hot key
                                         before the exchange)
  2. plain fact-fact join on user_id   — the hot key's row products
                                         land in one task unless AQE's
                                         skew-join splits it
  3. operators.skew.salted_join        — explicit 8-way salt of the
                                         same join

Each leg runs against the SKEWED fixture and the UNIFORM sf0.1 control
so the cost of skew itself is visible. Results land in
SKEW_STRESS_r{N}.json; the conclusion belongs in SCALE.md.

Usage: python scripts/skew_stress.py [out_json]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import duckdb

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from alexandria_pipeline_spark import get_spark
from alexandria_pipeline_spark.catalog import load_table
from alexandria_pipeline_spark.operators.skew import salted_join

SRC = "/root/testdata/sf0.1"
SKEW_DIR = ".stress/skew"
HOT_USER = 1
HOT_FRACTION_MOD = 10  # event_id % 10 < 3  -> ~30% of rows on HOT_USER


def build_fixture() -> None:
    out = pathlib.Path(SKEW_DIR)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN event_id % {HOT_FRACTION_MOD} < 3
                 THEN {HOT_USER} ELSE user_id END AS user_id)
          FROM '{SRC}/events.parquet'
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )


def timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 2)


def legs(spark, sf_dir: str) -> dict[str, float]:
    e = load_table(spark, sf_dir, "events")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )
    t_agg = timed(lambda: force(per_user))

    dim = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    plain = e.join(dim, "user_id").groupBy("event_type").agg(
        F.sum("n_events").alias("weight")
    )
    t_plain = timed(lambda: force(plain))

    salted = salted_join(e, dim, "user_id", salt_buckets=8).groupBy(
        "event_type"
    ).agg(F.sum("n_events").alias("weight"))
    t_salted = timed(lambda: force(salted))

    return {"agg_s": t_agg, "plain_join_s": t_plain, "salted_join_s": t_salted}


def main() -> int:
    if not pathlib.Path(SKEW_DIR, "events.parquet").exists():
        build_fixture()
        print("fixture built", flush=True)
    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up
    load_table(spark, SRC, "events").count()
    res = {
        "uniform_sf0.1": legs(spark, SRC),
        "skewed_30pct_hot_user": legs(spark, SKEW_DIR),
        "aqe_skew_join_enabled": spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled", "unset"
        ),
    }
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "5")
    out = sys.argv[1] if len(sys.argv) > 1 else f"SKEW_STRESS_r{rnd}.json"
    pathlib.Path(out).write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
