"""End-to-end corpus curation: the composed production pass.

One declarative job chaining the individual operators this package ships
(quality gate → repetition gate → exact dedup → near-dup clusters →
decontamination → per-host cap) into the funnel a training-data build
actually runs. Two design rules keep it 100 TB-shaped:

* **Flags, not filters, until the end.** Every stage contributes a
  boolean column on one wide per-doc relation; survivors and the
  stage-by-stage funnel report come from a single aggregation pass —
  no per-stage ``count()`` actions, no driver round trips.
* **Joins stay doc_id-keyed.** Each gate's verdict is computed by its
  own operator (already individually scale-audited) and joined back on
  doc_id — co-partitioned narrow relations, broadcast only if AQE
  decides so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup, text_analysis, web


def curate_flags(
    documents: DataFrame,
    bench_source: str = "src0",
    url_col: str | None = None,
    max_per_host: int = 10,
) -> DataFrame:
    """Per-document curation verdict: one row per doc with a boolean per
    stage and the final ``keep``.

    Stages (flag semantics: True = passes that gate):

    * ``pass_quality`` — Gopher quality gate
    * ``pass_repetition`` — Gopher repetition gate
    * ``is_exact_canonical`` — smallest doc_id of its exact-content group
    * ``is_neardup_canonical`` — smallest doc_id of its MinHash-LSH
      near-dup cluster (docs in no cluster pass trivially)
    * ``pass_decontamination`` — not contaminated vs the benchmark set
      (benchmark-source docs themselves are excluded from the corpus)
    * ``pass_host_cap`` — within the per-host document budget (only when
      ``url_col`` is given)
    """
    base = documents.select("doc_id")

    quality = text_analysis.gopher_filter(documents).select(
        "doc_id", F.col("keep").alias("pass_quality")
    )
    repetition = text_analysis.repetition_filter(documents).select(
        "doc_id", F.col("keep").alias("pass_repetition")
    )
    exact = (
        dedup.exact_dedup(documents)
        .select(F.col("canonical_id").alias("doc_id"), F.lit(True).alias("is_exact_canonical"))
    )
    clusters = dedup.dup_clusters(
        dedup.lsh_candidate_pairs(documents), documents
    ).select(
        "doc_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_neardup_canonical"),
    )
    decon = web.decontaminate(documents, bench_source=bench_source).select(
        "doc_id", (~F.col("contaminated")).alias("pass_decontamination")
    )

    flags = (
        base.join(quality, "doc_id", "left")
        .join(repetition, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .join(clusters, "doc_id", "left")
        .join(decon, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pass_quality", F.lit(False)).alias("pass_quality"),
            F.coalesce("pass_repetition", F.lit(False)).alias("pass_repetition"),
            F.coalesce("is_exact_canonical", F.lit(False)).alias("is_exact_canonical"),
            F.coalesce("is_neardup_canonical", F.lit(True)).alias("is_neardup_canonical"),
            # docs absent from decontaminate's output ARE the benchmark
            # docs — excluded from the training corpus
            F.coalesce("pass_decontamination", F.lit(False)).alias("pass_decontamination"),
        )
    )

    if url_col is not None:
        capped = web.host_cap(
            documents.select("doc_id", url_col), url_col, max_per_host
        ).select("doc_id", F.lit(True).alias("pass_host_cap"))
        flags = flags.join(capped, "doc_id", "left").withColumn(
            "pass_host_cap", F.coalesce("pass_host_cap", F.lit(False))
        )
    else:
        flags = flags.withColumn("pass_host_cap", F.lit(True))

    return flags.withColumn(
        "keep",
        F.col("pass_quality")
        & F.col("pass_repetition")
        & F.col("is_exact_canonical")
        & F.col("is_neardup_canonical")
        & F.col("pass_decontamination")
        & F.col("pass_host_cap"),
    )


_FUNNEL_STAGES = (
    "pass_quality",
    "pass_repetition",
    "is_exact_canonical",
    "is_neardup_canonical",
    "pass_decontamination",
    "pass_host_cap",
)


def curation_funnel(flags: DataFrame) -> DataFrame:
    """Stage-by-stage funnel report from ``curate_flags`` output — ONE
    aggregation job: (stage, n_in, n_out) with stages applied cumulatively
    in order."""
    running = F.lit(True)
    aggs = [F.count(F.lit(1)).alias("n_total")]
    for s in _FUNNEL_STAGES:
        running = running & F.col(s)
        aggs.append(F.sum(running.cast("long")).alias(f"out_{s}"))
    row = flags.agg(*aggs)
    # stack() pivots the single aggregate row into (stage, n_in, n_out)
    return row.selectExpr(
        "stack("
        + str(len(_FUNNEL_STAGES))
        + ", "
        + ", ".join(
            f"'{s}', {'n_total' if i == 0 else 'out_' + _FUNNEL_STAGES[i-1]}, out_{s}"
            for i, s in enumerate(_FUNNEL_STAGES)
        )
        + ") AS (stage, n_in, n_out)"
    )
