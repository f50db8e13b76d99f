"""The production extraction job: resumable, slice-checkpointed, metered.

North-star plumbing (BASELINE.json): "checkpoints per-partition completion
manifests plus lineage/metrics rows to a sidecar table so any failed run
resumes exactly where it stopped", "salt-repartitions by url-hash",
"accumulators tracking parse-failure and fallback-path rates per partition".

Design for 10^12 documents:

* **Slices.** The url space is split into ``num_slices`` deterministic
  buckets (``pmod(xxhash64(url), num_slices)``). Each slice runs as one
  Spark job writing ``documents/slice=K`` + ``chunks/slice=K`` and, only
  after the write commits, a manifest file ``_manifests/slice_K.json``
  (tmp + atomic rename). A restarted run skips every slice whose manifest
  exists — resume granularity is a slice, commit atomicity is Spark's own
  job-commit protocol, and no anti-join against the (huge) output is ever
  needed. The slice predicate is a pure column expression, so Catalyst
  pushes it into the input scan. Trade-off stated plainly: a hash
  predicate prunes FILES only when the input is bucketed/clustered by
  the same url hash — on unclustered input each slice job re-reads the
  full scan's bytes, i.e. ``num_slices`` passes total. That is the
  price of slice-granular resume on arbitrary input; bucket the input
  table by ``xxhash64(url) % num_slices`` (Iceberg: ``bucket(url)``
  partition transform) to make every slice read ~1/num_slices of the
  bytes, or run ``num_slices=1`` when resume granularity is not needed.
* **Lineage/metrics sidecar.** Per (slice, task-partition) rows aggregated
  JVM-side from the ``partition_id`` column the kernel stamps:
  row/success/failure/fallback counts, wall estimates, url range. Appended
  under ``metrics/`` per slice — the fleet-health table the north star
  requires.
* **Accumulators** give live counts while a slice runs; the sidecar is the
  durable record.

Local parquet stands in for the Iceberg catalog (not shipped in this
environment); the write pattern (partitioned dirs + atomic manifest commit)
is the same shape an Iceberg ``append`` + snapshot would give. Manifest IO
goes through ``plans/manifests.ManifestStore`` — Hadoop ``FileSystem`` API
for schemed paths (``hdfs://``/``s3a://``/``file://``), so resume works
when the output lives on the cluster filesystem, not just the driver disk.
"""

from __future__ import annotations

import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from doc_parser_spark.operators.extract import explode_chunks, extract_documents
from doc_parser_spark.plans.manifests import ManifestStore
from doc_parser_spark.sources.catalog import TableIO


def slice_predicate(num_slices: int, k: int):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(num_slices)) == k


def completed_slices(output_dir: str, spark: Optional[SparkSession] = None) -> set[int]:
    """Slices with committed manifests (Hadoop-FS-aware via ManifestStore)."""
    return ManifestStore(output_dir, spark).completed_slices()


def partition_metrics(docs: DataFrame) -> DataFrame:
    """Per-task-partition lineage/metrics rows (JVM-side aggregation over
    the kernel-stamped ``partition_id``)."""
    return docs.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("status") == "success", 1).otherwise(0)).alias("n_success"),
        F.sum(F.when(F.col("status") == "failure", 1).otherwise(0)).alias("n_failure"),
        F.sum(F.when(F.col("status") == "skipped", 1).otherwise(0)).alias("n_skipped"),
        F.sum(F.when(F.col("fallback"), 1).otherwise(0)).alias("n_fallback"),
        F.min("url").alias("min_url"),
        F.max("url").alias("max_url"),
        F.round(F.sum("extract_ms"), 1).alias("kernel_ms"),
        F.round(F.avg("confidence.parse_score"), 4).alias("avg_parse_score"),
    )


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame,
    output_dir: str,
    run_id: Optional[str] = None,
    num_slices: int = 8,
    salt_partitions: Optional[int] = None,
    reg_date: str = "1970-01-01T00:00:00Z",
    max_tokens: int = 2000,
    table_io: Optional[TableIO] = None,
) -> dict:
    """Run (or resume) the full extraction over ``pages``.

    ``table_io`` picks the output storage: default is partitioned parquet
    under ``output_dir`` (this sandbox); an Iceberg-catalog ``TableIO``
    swaps every write to atomic snapshot commits with the slice id as a
    partition column — the manifest protocol is unchanged either way.
    Returns a summary dict with per-slice outcomes and fleet metrics.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    io = table_io or TableIO(spark, "parquet", root=output_dir)
    salt_partitions = salt_partitions or spark.sparkContext.defaultParallelism

    sc = spark.sparkContext
    accumulators = {
        "success": sc.accumulator(0),
        "failure": sc.accumulator(0),
        "fallback": sc.accumulator(0),
    }

    store = ManifestStore(output_dir, spark)
    done = store.completed_slices()
    if done:
        # resuming with a different slice count would mix two incompatible
        # url-bucketings (duplicate + missing urls) — refuse loudly
        prior = store.read(sorted(done)[0])
        prior_slices = prior.get("num_slices")
        if prior_slices is not None and prior_slices != num_slices:
            raise ValueError(
                f"output {output_dir} was written with num_slices="
                f"{prior_slices}; resume must use the same value "
                f"(got {num_slices}) or a fresh output dir"
            )
    summary = {"run_id": run_id, "num_slices": num_slices, "slices": {}}

    for k in range(num_slices):
        if k in done:
            summary["slices"][k] = {"status": "resumed_skip"}
            continue

        t0 = time.perf_counter()
        slice_pages = pages.where(slice_predicate(num_slices, k))
        docs = extract_documents(
            slice_pages,
            reg_date=reg_date,
            max_tokens=max_tokens,
            salt_partitions=salt_partitions,
            accumulators=accumulators,
        ).cache()

        # output tables are day-partitioned (north_star: "written back ...
        # to a partitioned Iceberg output table") — crawl-time pruning for
        # downstream readers; slice=K keeps the resume granularity: a
        # parquet slice is its own directory, an Iceberg slice is a
        # partition column so a re-run's overwritePartitions replaces
        # exactly the slice it recomputes
        def write_slice(df: DataFrame, name: str) -> None:
            day = df.withColumn("warc_day", F.to_date("warc_ts"))
            if io.mode == "parquet":
                io.overwrite_partitioned(day, f"{name}/slice={k}", ["warc_day"])
            else:
                io.overwrite_partitioned(
                    day.withColumn("slice", F.lit(k)), name, ["slice", "warc_day"]
                )

        write_slice(docs.drop("chunks"), "documents")
        write_slice(explode_chunks(docs), "chunks")

        metrics = partition_metrics(docs).withColumn("slice", F.lit(k)).withColumn(
            "run_id", F.lit(run_id)
        )
        # aggregate ONCE: collect the (tiny) per-partition metric rows,
        # then write the sidecar from the collected relation — writing
        # the lazy frame and collecting it separately ran the whole
        # groupBy over the cached docs twice per slice
        metric_rows = [r.asDict() for r in metrics.collect()]
        metrics_local = spark.createDataFrame(metric_rows, metrics.schema)
        if io.mode == "parquet":
            io.overwrite_partitioned(metrics_local, f"metrics/slice={k}")
        else:
            io.overwrite_partitioned(metrics_local, "metrics", ["slice"])
        docs.unpersist()

        wall_ms = (time.perf_counter() - t0) * 1000.0
        n_rows = int(sum(r["n_rows"] for r in metric_rows))
        store.write_atomic(
            k,
            {
                "run_id": run_id,
                "num_slices": num_slices,
                "slice": k,
                "wall_ms": wall_ms,
                "partitions": metric_rows,
                "n_rows": n_rows,
                "n_failure": int(sum(r["n_failure"] for r in metric_rows)),
                "n_fallback": int(sum(r["n_fallback"] for r in metric_rows)),
            },
        )
        summary["slices"][k] = {
            "status": "completed",
            "wall_ms": round(wall_ms, 1),
            "n_rows": n_rows,
        }

    summary["accumulators"] = {
        "success": accumulators["success"].value,
        "failure": accumulators["failure"].value,
        "fallback": accumulators["fallback"].value,
    }
    return summary
