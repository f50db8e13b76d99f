"""Skew-stress benchmark: host-level skew vs salt repartition (VERDICT #5).

Common-Crawl reality: page size is heavy-tailed per host — one host
serves MB-scale pages while the median page is a few KB, and crawl
output arrives grouped by host, so the natural file/split partitioning
hands one task ~100x the work. This script synthesizes exactly that
layout and measures what the salt shuffle buys:

* input: N_NORMAL ~5 KB pages spread over many files + N_HEAVY ~0.5 MB
  pages all from ONE host staged as ONE parquet file with a single row
  group (the crawl-ordered layout: a host's pages land together)
* **no-salt run**: scan → mapInPandas directly; task boundaries = file
  splits, a parquet row group is indivisible, so one task swallows the
  whole heavy host — a straggler no AQE rule can fix (there is no
  shuffle for AQE to re-plan)
* **salt run**: ``salt_repartition`` (url-hash shuffle, AQE on) spreads
  the heavy rows uniformly before the kernel

The straggler metric is engine-derived, not listener-derived: the
extraction kernel stamps every row with its task's ``partition_id`` and
its own ``extract_ms``, so per-task kernel time = sum(extract_ms) per
partition. straggler_ratio = max / median over task kernel times; the
wall-clock ratio of the two runs shows what the shuffle buys end-to-end.

Prints ONE JSON line. Usage::

    python scripts/skew_bench.py [--cpus 8] [--normal 6000] [--heavy 64]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _heavy_html(i: int, kb: int) -> bytes:
    """Deterministic MB-scale page: many real paragraphs (the kernel
    does real DOM work per byte, like a genuine huge page)."""
    para = (
        "<p>heavy host paragraph %d segment with enough words to look "
        "like running prose on a big page</p>" % i
    )
    body = para * max(1, (kb * 1024) // len(para))
    return (
        "<html><head><title>heavy %d</title></head><body><main>%s"
        "</main></body></html>" % (i, body)
    ).encode()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, default=8)
    p.add_argument("--normal", type=int, default=6000)
    p.add_argument("--heavy", type=int, default=64)
    p.add_argument("--heavy-kb", type=int, default=512)
    p.add_argument("--runs", type=int, default=2)
    args = p.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(4 * args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # per-file tasks: without this, small-file packing lumps the
        # whole corpus into one task and there is nothing to measure
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from doc_parser_spark.operators.extract import extract_documents
    from doc_parser_spark.sources.pages import pages_df

    stage = tempfile.mkdtemp(prefix="skew_stage_")
    normal = pages_df(spark, args.normal, num_partitions=args.cpus)
    heavy_rows = [
        (
            f"https://heavy.example.com/page/{i}",
            None,
            _heavy_html(i, args.heavy_kb),
            None,
            "en",
        )
        for i in range(args.heavy)
    ]
    heavy = spark.createDataFrame(heavy_rows, schema=normal.schema)
    # crawl-ordered layout: normal pages across 2*cpus files, the heavy
    # host as ONE file whose single row group is an indivisible split
    normal.repartition(2 * args.cpus).write.mode("overwrite").parquet(stage)
    heavy.coalesce(1).write.mode("append").parquet(stage)

    def run(salt: bool) -> dict:
        pages = spark.read.parquet(stage)
        docs = extract_documents(
            pages,
            with_markdown=False,
            salt_partitions=4 * args.cpus if salt else None,
        ).select("partition_id", "extract_ms", "status")
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            rows = (
                docs.groupBy("partition_id")
                .agg(
                    F.sum("extract_ms").alias("task_ms"),
                    F.count("*").alias("n"),
                )
                .collect()
            )
            wall = time.perf_counter() - t0
            if best is None or wall < best[0]:
                best = (wall, rows)
        wall, rows = best
        task_ms = sorted(float(r["task_ms"]) for r in rows)
        return {
            "wall_sec": round(wall, 2),
            "n_tasks": len(task_ms),
            "max_task_ms": round(task_ms[-1], 1),
            "median_task_ms": round(statistics.median(task_ms), 1),
            "straggler_ratio": round(
                task_ms[-1] / max(statistics.median(task_ms), 1e-9), 2
            ),
        }

    no_salt = run(salt=False)
    salted = run(salt=True)
    print(
        json.dumps(
            {
                "metric": "straggler ratio (max/median task kernel ms), "
                "host-skewed corpus",
                "cpus": args.cpus,
                "n_normal": args.normal,
                "n_heavy": args.heavy,
                "heavy_kb": args.heavy_kb,
                "no_salt": no_salt,
                "salt": salted,
                "wall_speedup": round(
                    no_salt["wall_sec"] / salted["wall_sec"], 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
