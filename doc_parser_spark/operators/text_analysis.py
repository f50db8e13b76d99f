"""Text-analysis operators for training-data pipelines.

These are first-class additions beyond the reference's own surface (the
reference is an extraction system; a 100 TB training-data pipeline also needs
corpus analytics). Everything here is pure DataFrame API — JVM-side,
whole-stage-codegen friendly, no Python UDFs — so Catalyst can push filters
into the parquet scan and keep the aggregations map-side-combined.

Each operator has an exactly-matching ANSI-SQL oracle in
``__spark_entry__.oracle_sql`` (same hash functions, same regexes, same
rounding) so the driver's DuckDB cross-check validates values, not just
shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# normalization used for fingerprints/dedup: lowercase, collapse whitespace
NORM = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "que", "los", "una"],
    "de": ["der", "die", "und", "das", "ist"],
}


def _trunc6(expr):
    """floor(x·1e6)/1e6 — portable truncation; identical IEEE result in
    DuckDB, unlike engine-native double rounding (half-up vs half-even)."""
    return F.floor(expr * F.lit(1000000.0)) / F.lit(1000000.0)


# GPT-2-style pre-tokenizer approximation: contractions, letter runs,
# digit runs, punctuation runs (each optionally space-prefixed), whitespace
# runs. The alternation is valid in BOTH Java regex (Spark) and RE2
# (DuckDB) with identical match behaviour — verified bit-exact by the
# doc_token_stats oracle.
BPE_TOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-document token/char statistics: whitespace tokenization plus a
    BPE-ish pre-tokenizer count (the two standard corpus-size estimators)."""
    bpe_sql = BPE_TOKEN_PATTERN.replace("\\", "\\\\").replace("'", "\\'")
    return documents.select(
        "doc_id",
        F.expr("size(split(trim(text), '\\\\s+'))").cast("long").alias("n_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{bpe_sql}', 0))")
        .cast("long")
        .alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars_actual"),
        _trunc6(
            F.length(F.regexp_replace("text", r"\s+", ""))
            / F.expr("size(split(trim(text), '\\\\s+'))")
        ).alias("avg_token_len"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length, punctuation/digit density,
    stopword ratio (the readability/trafilatura-style signal family)."""
    toks = F.expr("size(split(trim(text), '\\\\s+'))")
    stop_hits = None
    for w in _STOPWORDS["en"]:
        hit = F.expr(
            f"size(filter(split(lower(text), '\\\\s+'), t -> t = '{w}'))"
        )
        stop_hits = hit if stop_hits is None else (stop_hits + hit)
    return documents.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        _trunc6(
            F.length(F.regexp_replace("text", r"[^\p{Punct}]", "")) / F.length("text")
        ).alias("punct_ratio"),
        _trunc6(
            F.length(F.regexp_replace("text", r"[^0-9]", "")) / F.length("text")
        ).alias("digit_ratio"),
        _trunc6(stop_hits / toks).alias("stopword_ratio"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-overlap language ID (n-gram-free heuristic): argmax of
    per-language stopword hit counts, 'und' when all zero."""
    cols = []
    for lang, words in _STOPWORDS.items():
        hits = None
        for w in words:
            hit = F.expr(
                f"size(filter(split(lower(text), '\\\\s+'), t -> t = '{w}'))"
            )
            hits = hit if hits is None else (hits + hit)
        cols.append(hits.cast("long").alias(f"hits_{lang}"))
    scored = documents.select("doc_id", *cols)
    return scored.select(
        "doc_id",
        "hits_en",
        "hits_es",
        "hits_de",
        F.expr(
            "CASE WHEN hits_en = 0 AND hits_es = 0 AND hits_de = 0 THEN 'und' "
            "WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en' "
            "WHEN hits_es >= hits_de THEN 'es' ELSE 'de' END"
        ).alias("pred_lang"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over normalized text (dedup identity)."""
    return documents.select(
        "doc_id", F.expr(f"md5({NORM})").alias("fingerprint")
    )


def length_histogram(documents: DataFrame, bucket: int = 100) -> DataFrame:
    """n_chars histogram in fixed-width buckets."""
    return (
        documents.select(
            (F.floor(F.length("text") / bucket) * bucket).cast("long").alias("bucket_lo")
        )
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# -- Gopher-style quality gate ------------------------------------------------

# the small high-frequency set the Gopher rule checks for (≥ 2 present);
# public rule family: Rae et al. 2021 §A1.1 (word-count bounds, mean word
# length, symbol ratios, bullet/ellipsis line fractions, alpha-word
# fraction, stopword presence)
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_filter(documents: DataFrame) -> DataFrame:
    """Per-document Gopher quality signals + keep verdict.

    All signals are exact integer counts or floor-truncated ratios so the
    keep decision compares identically in Spark and DuckDB. Pure native
    expressions — one codegen stage over the scan, trivially 100 TB-safe."""
    words = F.expr("filter(split(trim(text), '\\\\s+'), t -> t <> '')")
    lines = F.expr("filter(split(text, '\\n'), l -> trim(l) <> '')")
    d = documents.select("doc_id", "text", words.alias("w"), lines.alias("ln"))
    n_words = F.size("w")
    n_lines = F.size("ln")
    alpha_words = F.expr("size(filter(w, t -> t rlike '[A-Za-z]'))")
    bullet_lines = F.expr(
        "size(filter(ln, l -> trim(l) rlike '^([-*\\u2022\\u2023\\u25E6])'))"
    )
    ellipsis_lines = F.expr("size(filter(ln, l -> trim(l) rlike '(\\\\.\\\\.\\\\.|\\u2026)$'))")
    hashes = F.length("text") - F.length(F.regexp_replace("text", "#", ""))
    ellipses = F.expr("size(regexp_extract_all(text, '(\\\\.\\\\.\\\\.|\\u2026)', 0))")
    stop_hits = None
    for wrd in _GOPHER_STOPS:
        hit = F.expr(f"CASE WHEN array_contains(w, '{wrd}') THEN 1 ELSE 0 END")
        stop_hits = hit if stop_hits is None else (stop_hits + hit)
    mean_wl = _trunc6(
        F.expr("aggregate(w, 0L, (acc, t) -> acc + length(t))") / n_words
    )
    out = d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        _trunc6(alpha_words / n_words).alias("frac_alpha_words"),
        _trunc6((hashes + ellipses) / n_words).alias("symbol_word_ratio"),
        _trunc6(bullet_lines / F.greatest(n_lines, F.lit(1))).alias("frac_bullet_lines"),
        _trunc6(ellipsis_lines / F.greatest(n_lines, F.lit(1))).alias("frac_ellipsis_lines"),
        stop_hits.cast("long").alias("n_stopwords_present"),
    )
    keep = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("frac_bullet_lines") <= 0.9)
        & (F.col("frac_ellipsis_lines") <= 0.3)
        & (F.col("frac_alpha_words") >= 0.8)
        & (F.col("n_stopwords_present") >= 2)
    )
    return out.withColumn("keep", keep)


# -- token-budget shard packing ----------------------------------------------


def pack_shards(
    documents: DataFrame, budget_tokens: int = 20000, num_partitions: int = 0
) -> DataFrame:
    """Assign documents to fixed-token-budget training shards.

    ``shard_id = floor(exclusive_prefix_sum(n_tokens) / budget)`` over
    doc_id order — the deterministic contiguous packing a shard writer
    needs. The global prefix sum is computed the scale-safe way: a plain
    ``Window.orderBy`` with no partition key collapses the whole corpus
    into ONE task, so instead this range-partitions by doc_id, aggregates
    per-partition token totals (tiny: one row per partition), turns them
    into broadcast offsets on the driver, and adds per-partition local
    cumsums — two passes, no single-task bottleneck, exact BIGINT
    arithmetic end-to-end."""
    spark = documents.sparkSession
    if num_partitions <= 0:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = F.expr("size(filter(split(trim(text), '\\\\s+'), t -> t <> ''))")
    base = (
        documents.select("doc_id", toks.cast("long").alias("n_tokens"))
        .repartitionByRange(num_partitions, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin the partition layout across the two passes
    )
    totals = {
        int(r["pid"]): int(r["s"])
        for r in base.groupBy("pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += totals.get(pid, 0)
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "pid int, p_off long"
        )
    )
    w = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn("l_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        local.join(off_df, "pid")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("p_off") + F.col("l_off")).alias("token_offset"),
            F.floor((F.col("p_off") + F.col("l_off")) / F.lit(budget_tokens))
            .cast("long")
            .alias("shard_id"),
        )
    )
