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
  pushes it into the input scan.
* **Lineage/metrics sidecar.** Per (slice, task-partition) rows aggregated
  JVM-side from the ``partition_id`` column the kernel stamps:
  row/success/failure/fallback counts, wall estimates, url range. Appended
  under ``metrics/`` per slice — the fleet-health table the north star
  requires.
* **Accumulators** give live counts while a slice runs; the sidecar is the
  durable record.

Local parquet stands in for the Iceberg catalog (not shipped in this
environment); the write pattern (partitioned dirs + atomic manifest commit)
is the same shape an Iceberg ``append`` + snapshot would give.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from doc_parser_spark.operators.extract import explode_chunks, extract_documents


def slice_predicate(num_slices: int, k: int):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(num_slices)) == k


def _manifest_path(output_dir: str, k: int) -> str:
    return os.path.join(output_dir, "_manifests", f"slice_{k}.json")


def _write_manifest_atomic(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)  # atomic on POSIX


def completed_slices(output_dir: str) -> set[int]:
    mdir = os.path.join(output_dir, "_manifests")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("slice_") and name.endswith(".json"):
            try:
                done.add(int(name[len("slice_"):-len(".json")]))
            except ValueError:
                continue
    return done


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
) -> dict:
    """Run (or resume) the full extraction over ``pages``.

    Returns a summary dict with per-slice outcomes and fleet metrics.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    salt_partitions = salt_partitions or spark.sparkContext.defaultParallelism

    sc = spark.sparkContext
    accumulators = {
        "success": sc.accumulator(0),
        "failure": sc.accumulator(0),
        "fallback": sc.accumulator(0),
    }

    done = completed_slices(output_dir)
    if done:
        # resuming with a different slice count would mix two incompatible
        # url-bucketings (duplicate + missing urls) — refuse loudly
        sample = _manifest_path(output_dir, sorted(done)[0])
        with open(sample) as f:
            prior = json.load(f)
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
        # downstream readers; slice=K keeps the resume granularity
        (
            docs.drop("chunks")
            .withColumn("warc_day", F.to_date("warc_ts"))
            .write.mode("overwrite")
            .partitionBy("warc_day")
            .parquet(os.path.join(output_dir, "documents", f"slice={k}"))
        )
        (
            explode_chunks(docs)
            .withColumn("warc_day", F.to_date("warc_ts"))
            .write.mode("overwrite")
            .partitionBy("warc_day")
            .parquet(os.path.join(output_dir, "chunks", f"slice={k}"))
        )

        metrics = partition_metrics(docs).withColumn("slice", F.lit(k)).withColumn(
            "run_id", F.lit(run_id)
        )
        metrics.write.mode("overwrite").parquet(
            os.path.join(output_dir, "metrics", f"slice={k}")
        )
        metric_rows = [r.asDict() for r in metrics.collect()]
        docs.unpersist()

        wall_ms = (time.perf_counter() - t0) * 1000.0
        _write_manifest_atomic(
            _manifest_path(output_dir, k),
            {
                "run_id": run_id,
                "num_slices": num_slices,
                "slice": k,
                "wall_ms": wall_ms,
                "partitions": metric_rows,
                "n_rows": int(sum(r["n_rows"] for r in metric_rows)),
                "n_failure": int(sum(r["n_failure"] for r in metric_rows)),
                "n_fallback": int(sum(r["n_fallback"] for r in metric_rows)),
            },
        )
        summary["slices"][k] = {
            "status": "completed",
            "wall_ms": round(wall_ms, 1),
            "n_rows": int(sum(r["n_rows"] for r in metric_rows)),
        }

    summary["accumulators"] = {
        "success": accumulators["success"].value,
        "failure": accumulators["failure"].value,
        "fallback": accumulators["fallback"].value,
    }
    return summary
