"""spark-submit entry for the production extraction job.

Usage (north_star: "runs via spark-submit --py-files on multi-executor
clusters")::

    spark-submit --py-files doc_parser_spark.zip scripts/run_job.py \
        --input /path/to/pages_parquet --output /path/to/out \
        --num-slices 64 --salt-partitions 4096

Local smoke::

    python scripts/run_job.py --synthetic 500 --output /tmp/job_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="parquet dir of pages (url, warc_ts, html, text, lang)")
    p.add_argument("--output", required=True)
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic pages instead of --input")
    p.add_argument("--num-slices", type=int, default=8)
    p.add_argument("--salt-partitions", type=int, default=0)
    p.add_argument("--run-id", default=None)
    p.add_argument("--master", default=None,
                   help="override master (default: whatever spark-submit set)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("doc_parser_spark-job").config(
        "spark.sql.adaptive.enabled", "true"
    ).config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        from doc_parser_spark.sources.pages import pages_df

        pages = pages_df(spark, args.synthetic)
    else:
        if not args.input:
            p.error("--input or --synthetic required")
        pages = spark.read.parquet(args.input)

    from doc_parser_spark.plans.pipeline import run_extraction_job

    summary = run_extraction_job(
        spark,
        pages,
        args.output,
        run_id=args.run_id,
        num_slices=args.num_slices,
        salt_partitions=args.salt_partitions or None,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
