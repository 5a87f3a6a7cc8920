"""CLI — the reference's script surface, rebuilt.

  python -m alexandria_pipeline_spark embed          <- python run.py
  python -m alexandria_pipeline_spark embed-chunked  <- python run_extra.py
  python -m alexandria_pipeline_spark consolidate    <- python process.py
  python -m alexandria_pipeline_spark filter-long    <- python script512.py
  python -m alexandria_pipeline_spark query <name>   <- run any registered query

Flags mirror the reference where they exist (--test is run.py:78's
2-batch crop; run.py's --batch_size maps to Arrow batch sizing, which
is a session config, not a loop variable).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="alexandria_pipeline_spark")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--cpus", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("embed", help="embed documents (run.py analog)")
    pe.add_argument("--out", required=True)
    pe.add_argument("--text-col", default="text")
    pe.add_argument("--pandas-udf", action="store_true", help="use the Arrow UDF (real-model) path")
    pe.add_argument("--test", action="store_true", help="crop to 64 rows (run.py --test analog)")
    pe.add_argument("--incremental", action="store_true", help="resume = anti-join diff against --out")

    pc = sub.add_parser("embed-chunked", help="chunk+pool embedding (run_extra.py analog)")
    pc.add_argument("--out", required=True)

    pm = sub.add_parser("consolidate", help="merge two embedding outputs (process.py analog)")
    pm.add_argument("--titles", required=True)
    pm.add_argument("--abstracts", required=True)
    pm.add_argument("--out", required=True)
    pm.add_argument("--title-weight", type=float, default=0.2)

    pf = sub.add_parser("filter-long", help="filter docs over a token threshold (script512.py analog)")
    pf.add_argument("--out", required=True)
    pf.add_argument("--min-tokens", type=int, default=64)

    pq = sub.add_parser("query", help="run a registered query and show the result")
    pq.add_argument("name")
    pq.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from alexandria_pipeline_spark import get_spark, register_all, QUERIES
    from alexandria_pipeline_spark.catalog import load_table
    from alexandria_pipeline_spark.registry import release_persisted
    from alexandria_pipeline_spark.operators import jobs

    register_all()
    spark = get_spark("alexandria-pipeline-spark-cli", cpus=args.cpus)
    try:
        if args.cmd == "embed":
            if args.incremental:
                out = jobs.run_incremental_embedding_job(
                    spark, args.sf_dir, args.out, text_col=args.text_col
                )
            else:
                out = jobs.run_embedding_job(
                    spark,
                    args.sf_dir,
                    args.out,
                    text_col=args.text_col,
                    use_pandas_udf=args.pandas_udf,
                    limit=64 if args.test else None,
                )
            print(f"embedded rows={out.count()} -> {args.out}")
        elif args.cmd == "embed-chunked":
            out = jobs.run_chunked_embedding_job(spark, args.sf_dir, args.out)
            print(f"pooled rows={out.count()} -> {args.out}")
        elif args.cmd == "consolidate":
            titles = spark.read.parquet(args.titles)
            abstracts = spark.read.parquet(args.abstracts)
            out = jobs.run_consolidation_job(
                spark, titles, abstracts, args.out, title_weight=args.title_weight
            )
            print(f"merged rows={out.count()} -> {args.out}")
        elif args.cmd == "filter-long":
            d = load_table(spark, args.sf_dir, "documents")
            kept = d.filter(F.size(F.split("text", " ")) > args.min_tokens)
            kept.write.mode("overwrite").parquet(args.out)
            print(f"kept rows={spark.read.parquet(args.out).count()} -> {args.out}")
        elif args.cmd == "query":
            if args.name not in QUERIES:
                print(f"unknown query {args.name!r}; known: {', '.join(sorted(QUERIES))}")
                return 2
            QUERIES[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
            release_persisted()
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
