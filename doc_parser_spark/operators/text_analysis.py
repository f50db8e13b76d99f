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
