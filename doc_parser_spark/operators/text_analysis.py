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

# normalization used for fingerprints/dedup: lowercase, collapse
# whitespace; NULL text (extraction-failure rows) normalizes like the
# empty document instead of poisoning hashes/sizes with SQL NULLs
NORM = "trim(regexp_replace(lower(coalesce(text, '')), '\\\\s+', ' '))"

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


def _nn_text(documents: DataFrame) -> DataFrame:
    """NULL text (extraction-failure rows) behaves as the EMPTY document
    throughout this module: under non-ANSI Spark, size(split(NULL)) is -1
    and NULL-valued aggregates silently poison counts/ratios/groupings
    (the hazard line_dedup/top_terms/dup_spans already guard locally)."""
    return documents.withColumn("text", F.coalesce("text", F.lit("")))


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-document token/char statistics: whitespace tokenization plus a
    BPE-ish pre-tokenizer count (the two standard corpus-size estimators)."""
    documents = _nn_text(documents)
    bpe_sql = BPE_TOKEN_PATTERN.replace("\\", "\\\\").replace("'", "\\'")
    # empty-token filter: split('') yields [''] — an empty/NULL doc must
    # count 0 tokens, not a phantom 1 (pack_shards/gopher agree on 0)
    toks = "size(filter(split(trim(text), '\\\\s+'), t -> t <> ''))"
    return documents.select(
        "doc_id",
        F.expr(toks).cast("long").alias("n_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{bpe_sql}', 0))")
        .cast("long")
        .alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars_actual"),
        _trunc6(
            F.length(F.regexp_replace("text", r"\s+", ""))
            / F.expr(f"greatest({toks}, 1)")
        ).alias("avg_token_len"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length, punctuation/digit density,
    stopword ratio (the readability/trafilatura-style signal family)."""
    documents = _nn_text(documents)
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
            F.length(F.regexp_replace("text", r"[^\p{Punct}]", ""))
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("punct_ratio"),
        _trunc6(
            F.length(F.regexp_replace("text", r"[^0-9]", ""))
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("digit_ratio"),
        _trunc6(stop_hits / toks).alias("stopword_ratio"),
    )


def lang_hit_cols(text_col: str = "text"):
    """The per-language stopword hit-count columns (shared by
    :func:`lang_id` and ``web.lang_consistency`` so the two can never
    disagree on the detector)."""
    cols = []
    for lang, words in _STOPWORDS.items():
        hits = None
        for w in words:
            hit = F.expr(
                f"size(filter(split(lower({text_col}), '\\\\s+'),"
                f" t -> t = '{w}'))"
            )
            hits = hit if hits is None else (hits + hit)
        cols.append(hits.cast("long").alias(f"hits_{lang}"))
    return cols


def lang_pred_sql() -> str:
    """The argmax CASE over the ``hits_<lang>`` columns, derived from
    _STOPWORDS (ties -> earliest key), so adding a language to the dict
    extends both the hit columns AND the verdict. 'und' when all zero."""
    langs = list(_STOPWORDS)
    all_zero = " AND ".join(f"hits_{lg} = 0" for lg in langs)
    branches = []
    for i, lg in enumerate(langs[:-1]):
        geq = " AND ".join(
            f"hits_{lg} >= hits_{other}" for other in langs[i + 1 :]
        )
        branches.append(f"WHEN {geq} THEN '{lg}'")
    return (
        f"CASE WHEN {all_zero} THEN 'und' "
        + " ".join(branches)
        + f" ELSE '{langs[-1]}' END"
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-overlap language ID (n-gram-free heuristic): argmax of
    per-language stopword hit counts, 'und' when all zero."""
    documents = _nn_text(documents)
    scored = documents.select("doc_id", *lang_hit_cols())
    return scored.select(
        "doc_id",
        *[f"hits_{lg}" for lg in _STOPWORDS],
        F.expr(lang_pred_sql()).alias("pred_lang"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over normalized text (dedup identity)."""
    return documents.select(
        "doc_id", F.expr(f"md5({NORM})").alias("fingerprint")
    )


def length_histogram(documents: DataFrame, bucket: int = 100) -> DataFrame:
    """n_chars histogram in fixed-width buckets."""
    documents = _nn_text(documents)
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
    documents = _nn_text(documents)
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
    # greatest(n_words, 1): a zero-word document (empty/NULL text —
    # routine in crawl data) must yield all-zero ratios and keep=false,
    # not an ANSI divide-by-zero task failure; value-identical for every
    # non-empty document
    nw1 = F.greatest(n_words, F.lit(1))
    mean_wl = _trunc6(
        F.expr("aggregate(w, 0L, (acc, t) -> acc + length(t))") / nw1
    )
    out = d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        _trunc6(alpha_words / nw1).alias("frac_alpha_words"),
        _trunc6((hashes + ellipses) / nw1).alias("symbol_word_ratio"),
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


# -- Gopher repetition signals ------------------------------------------------

# (n, kind, threshold): top-n-gram char mass for short n, duplicated-n-gram
# char mass for long n — the Rae et al. 2021 §A1.1 repetition family.
_REP_TOP_NS = ((2, 0.20), (3, 0.18), (4, 0.16))
_REP_DUP_NS = ((5, 0.15), (10, 0.10))


def repetition_filter(documents: DataFrame) -> DataFrame:
    """Per-document repetition signals + keep verdict (Gopher §A1.1 family).

    Signals (all char fractions are floor-truncated to 6 decimals, so the
    Spark and DuckDB answers are bit-identical):

    * ``dup_line_frac`` — fraction of non-empty trimmed lines whose exact
      text occurs more than once in the document (all occurrences count).
    * ``dup_line_char_frac`` — character share of those duplicate lines
      (denominator: total chars across non-empty lines).
    * ``top_{2,3,4}gram_char_frac`` — max over word n-grams of
      ``count * len(gram)`` divided by ``length(text)``. Using char *mass*
      (count×len) rather than "the most frequent gram" keeps the statistic
      deterministic under count ties.
    * ``dup_{5,10}gram_char_frac`` — summed char mass of n-grams occurring
      more than once, over ``length(text)``.

    Scale shape: ONE scan and effectively one shuffle — lines (tagged n=0)
    and every n-gram size share a single exploded ``(n, gram)`` stream,
    aggregated by (doc_id, n, gram) with map-side partial aggregation; the
    second groupBy(doc_id) reduces an already-tiny relation. A sentinel
    (n=-1) row per document guarantees every doc_id appears in the output
    without a corpus-sized join back. The n-gram explode is the standard
    Gopher/SlimPajama approach; volume is ~(|top_ns|+|dup_ns|)× tokens.
    """
    documents = _nn_text(documents)
    all_ns = [n for n, _ in _REP_TOP_NS] + [n for n, _ in _REP_DUP_NS]
    parts = ["array(struct(-1 AS n, '' AS gram))"]
    parts.append("transform(ln, l -> struct(0 AS n, l AS gram))")
    for n in all_ns:
        parts.append(
            f"CASE WHEN size(w) >= {n} THEN "
            f"transform(sequence(1, size(w) - {n} + 1), "
            f"i -> struct({n} AS n, array_join(slice(w, i, {n}), ' ') AS gram)) "
            "ELSE slice(array(struct(-1 AS n, '' AS gram)), 1, 0) END"
        )
    stream = (
        documents.select(
            "doc_id",
            F.length("text").cast("long").alias("total_chars"),
            F.expr("filter(split(trim(text), '\\\\s+'), t -> t <> '')").alias("w"),
            F.expr(
                "transform(filter(split(text, '\\n'), l -> trim(l) <> ''),"
                " l -> trim(l))"
            ).alias("ln"),
        )
        .select(
            "doc_id",
            "total_chars",
            F.explode(F.expr("flatten(array(" + ", ".join(parts) + "))")).alias("e"),
        )
        .select("doc_id", "total_chars", F.col("e.n").alias("n"), F.col("e.gram").alias("gram"))
    )
    counts = stream.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("total_chars").alias("total_chars")
    )
    mass = F.col("cnt") * F.length("gram")
    aggs = [
        F.max("total_chars").alias("total_chars"),
        F.sum(F.when(F.col("n") == 0, F.col("cnt")).otherwise(0)).alias("n_lines"),
        F.sum(
            F.when((F.col("n") == 0) & (F.col("cnt") > 1), F.col("cnt")).otherwise(0)
        ).alias("dup_line_occ"),
        F.sum(F.when(F.col("n") == 0, mass).otherwise(0)).alias("line_chars"),
        F.sum(
            F.when((F.col("n") == 0) & (F.col("cnt") > 1), mass).otherwise(0)
        ).alias("dup_line_chars"),
    ]
    for n, _ in _REP_TOP_NS:
        aggs.append(F.max(F.when(F.col("n") == n, mass)).alias(f"top{n}_mass"))
    for n, _ in _REP_DUP_NS:
        aggs.append(
            F.sum(F.when((F.col("n") == n) & (F.col("cnt") > 1), mass).otherwise(0))
            .alias(f"dup{n}_mass")
        )
    joined = counts.groupBy("doc_id").agg(*aggs)

    def frac(num, den):
        return _trunc6(
            F.coalesce(num, F.lit(0)).cast("double")
            / F.greatest(F.coalesce(den, F.lit(0)), F.lit(1))
        )

    cols = [
        F.col("doc_id"),
        frac(F.col("dup_line_occ"), F.col("n_lines")).alias("dup_line_frac"),
        frac(F.col("dup_line_chars"), F.col("line_chars")).alias("dup_line_char_frac"),
    ]
    keep = (F.col("dup_line_frac") <= 0.30) & (F.col("dup_line_char_frac") <= 0.20)
    for n, thr in _REP_TOP_NS:
        name = f"top_{n}gram_char_frac"
        cols.append(frac(F.col(f"top{n}_mass"), F.col("total_chars")).alias(name))
        keep = keep & (F.col(name) <= thr)
    for n, thr in _REP_DUP_NS:
        name = f"dup_{n}gram_char_frac"
        cols.append(frac(F.col(f"dup{n}_mass"), F.col("total_chars")).alias(name))
        keep = keep & (F.col(name) <= thr)
    return joined.select(*cols).withColumn("keep", keep)


# -- token-budget shard packing ----------------------------------------------


def _exclusive_prefix_sum(
    df: DataFrame, order_cols: list, value_col: str, num_partitions: int
):
    """Exclusive global prefix sum of ``value_col`` over the total order
    ``order_cols`` — the scale-safe two-pass scheme shared by
    :func:`pack_shards` and :func:`pack_sequences`: a bare global
    ``Window.orderBy`` collapses the corpus into ONE task, so instead
    range-partition on the order key, pin the layout (localCheckpoint),
    turn per-partition totals into driver-held offsets broadcast back,
    and add per-partition local cumsums.  Exact BIGINT end-to-end.

    Returns the pinned relation with an ``_off`` column (the exclusive
    prefix sum)."""
    spark = df.sparkSession
    base = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin layout across the two passes
    )
    totals = {
        int(r["pid"]): int(r["s"])
        for r in base.groupBy("pid").agg(F.sum(value_col).alias("s")).collect()
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
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.withColumn(
            "l_off", F.coalesce(F.sum(value_col).over(w), F.lit(0))
        )
        .join(off_df, "pid")
        .withColumn("_off", F.col("p_off") + F.col("l_off"))
    )


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
    documents = _nn_text(documents)
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens ({budget_tokens}) must be positive")
    spark = documents.sparkSession
    if num_partitions <= 0:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = F.expr("size(filter(split(trim(text), '\\\\s+'), t -> t <> ''))")
    pref = _exclusive_prefix_sum(
        documents.select("doc_id", toks.cast("long").alias("n_tokens")),
        ["doc_id"],
        "n_tokens",
        num_partitions,
    )
    return pref.select(
        "doc_id",
        "n_tokens",
        F.col("_off").alias("token_offset"),
        F.floor(F.col("_off") / F.lit(budget_tokens))
        .cast("long")
        .alias("shard_id"),
    )


# -- deterministic sampling ---------------------------------------------------


def _hash_key(salt: str):
    """First 8 md5 hex digits of ``salt:doc_id`` as a uniform 32-bit key.

    md5 (not xxhash/crc) so the DuckDB oracle reproduces the exact key via
    pure hex arithmetic — same scheme as the simhash oracle."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def hash_sample(documents: DataFrame, rate: float = 0.05, salt: str = "s0") -> DataFrame:
    """Deterministic Bernoulli sample: keep documents whose 32-bit hash key
    falls below ``rate``·2³².  Unlike ``DataFrame.sample`` this is stable
    across runs, partitionings, and engines (reproducible held-out splits,
    A/B corpus slices), embarrassingly parallel, and pushes the filter into
    the scan — no shuffle at all."""
    threshold = int(rate * 4294967296)
    return (
        documents.select("doc_id", _hash_key(salt).alias("sample_key"))
        .where(F.col("sample_key") < F.lit(threshold))
    )


def stratified_sample(documents: DataFrame, per_stratum: int = 20, salt: str = "s0") -> DataFrame:
    """Deterministic stratified sample: the ``per_stratum`` documents with
    the smallest hash keys per ``lang`` stratum (hash order = uniform random
    order, but reproducible).  One shuffle on the stratum key; skew is
    bounded because the per-partition ``row_number`` input is pre-reduced
    nothing — rank over a stratum is the irreducible cost, and strata
    (languages) are few and balanced relative to executor counts."""
    w = Window.partitionBy("lang").orderBy("sample_key", "doc_id")
    return (
        documents.select("doc_id", "lang", _hash_key(salt).alias("sample_key"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= per_stratum)
    )


# -- corpus-fit (CCNet-style LM quality signal) -------------------------------


def lm_fit_score(documents: DataFrame) -> DataFrame:
    """Corpus-trained word-bigram fit score (the shape of CCNet's
    KenLM-perplexity quality signal, trained on the corpus itself).

    For each document: the mean add-one-smoothed conditional probability of
    its word bigrams under the corpus bigram model,

        fit = avg over bigrams of  (C(w1,w2) + 1) / (C(w1·) + V)

    where ``C(w1,w2)`` is the corpus bigram count, ``C(w1·)`` the count of
    ``w1`` as a bigram history, and ``V`` the corpus vocabulary size.
    Repetitive/boilerplate text scores high, lexically odd text low —
    CCNet buckets a corpus by exactly this kind of signal (head/middle/tail).

    Bit-exactness: probabilities use only integer counts and IEEE
    division/multiplication (correctly rounded, engine-independent — unlike
    ``ln``, whose libm varies), each scaled to an integer with
    ``floor(1e12·p)`` so the per-document sum is an **associative integer
    sum** — immune to float summation order across partitions.

    Scale shape: bigram counts and history counts are map-side-combined
    groupBys; the score join streams bigrams against the counts relation
    (shuffle join — the model is corpus-sized, never broadcast; hot-word
    skew on the history join is AQE skew-split territory); the vocabulary
    scalar is a one-row broadcast.
    """
    documents = _nn_text(documents)
    d = documents.select(
        "doc_id",
        F.expr("filter(split(trim(text), '\\\\s+'), t -> t <> '')").alias("w"),
    )
    bg = (
        d.where(F.expr("size(w) >= 2"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = d.select(F.explode("w").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    p_scaled = F.floor(
        F.lit(1e12)
        * (
            (F.col("c2") + F.lit(1)).cast("double")
            / (F.col("c1") + F.col("v")).cast("double")
        )
    )
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", p_scaled.alias("p"))
        .groupBy("doc_id")
        .agg(F.sum("p").alias("fit_sum"), F.count(F.lit(1)).alias("n_bigrams"))
    )
    return d.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(
            _trunc6(
                (F.col("fit_sum").cast("double") / F.lit(1e12)) / F.col("n_bigrams")
            ),
            F.lit(0.0),
        ).alias("lm_fit"),
    )


def top_terms(
    documents: DataFrame, k: int = 10, min_len: int = 2
) -> DataFrame:
    """Per-language top-k terms by integer-exact linear TF-IDF.

    Corpus vocabulary analytics (what dominates each language's token
    mass after stopword-ish downweighting). The idf factor is the LINEAR
    rarity ratio ``N / df`` rather than its log: the ranking this
    produces is the same family, and the score stays in exact BIGINT
    arithmetic (``1e6 * tf * N DIV df``) so distributed evaluation and
    the DuckDB oracle agree bit-for-bit — a log would ride libm and can
    flip a floor at the ulp.

    Plan shape: one explode → two aggregations (per-(lang,term) tf with
    map-side combine; per-term document frequency) → shuffle join on
    term → per-lang rank window with WindowGroupLimit pushdown. The
    corpus-size scalar joins as a broadcast literal row. Nothing
    collects; token explosion is the only data blowup and it is linear
    in corpus size."""
    toks = documents.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "filter(split(lower(coalesce(text, '')), '[^a-z]+'),"
                f" t -> length(t) >= {int(min_len)})"
            )
        ).alias("term"),
    )
    tf = toks.groupBy("lang", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("doc_freq")
    )
    n_docs = documents.select(
        F.count("*").cast("long").alias("n_corpus")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "lang",
            "term",
            "tf",
            "doc_freq",
            F.expr("(1000000 * tf * n_corpus) div doc_freq")
            .cast("long")
            .alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def bm25_topk(
    documents: DataFrame,
    terms: tuple = ("data", "table", "query"),
    k: int = 10,
    min_len: int = 2,
) -> DataFrame:
    """Lexical retrieval over the corpus: BM25-family top-k documents for
    a bag of query terms (Robertson & Walker; k1 = 1.2, b = 0.75). The
    lexical complement of the embedding ANN stack — the classic first
    stage of a hybrid retrieval / decontamination-audit pipeline.

    Exactness over libm: the idf is the log-free rarity ratio
    ``(N - df + ½) / (df + ½)`` (same ranking family; the log only
    compresses), and the whole per-term contribution is evaluated in
    BIGINT rational arithmetic —

        contribution = idf_fp4 * 44 * tf * S  div  (2df+1 consumed in
                       idf_fp4) (20*tf*S + 6*S + 18*dl*N)

    which is ``1e4 * idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` with
    k1 = 6/5, b = 3/4 and ``avgdl = S/N`` cleared of fractions. Integer
    sums are order-independent, so the per-doc score never depends on
    aggregation order and the DuckDB oracle matches bit-for-bit.
    (Headroom: exact BIGINT holds to ~10^7 docs; a production run at
    10^12 docs switches the same plan to DOUBLE + log idf, where ulp
    noise is irrelevant because nothing cross-checks hashes. Spark's
    non-ANSI BIGINT arithmetic *wraps* on overflow, so the corpus stats
    are collected up front — one tiny aggregation, the MLlib-style
    driver-held-scalar pattern ``ivf_train`` also uses — and the worst
    -case product is checked exactly; past the envelope this raises
    instead of silently mis-ranking.)

    Scale shape (10^12 docs): per-doc token arrays are projected once
    (``dl`` rides the groupBy key — no join back for lengths); the token
    stream is filtered to the query terms BEFORE any aggregation, so the
    shuffled tf relation is |terms|-bounded per doc; document frequency
    reduces that tf relation, not the corpus; the corpus-size scalar and
    the per-term df join in as broadcast-size relations; final top-k is
    ``TakeOrderedAndProject`` (per-partition heads, no global sort).

    Output: ``rank, doc_id, n_terms_hit, score`` (score is the fp4-scaled
    BIGINT)."""
    from pyspark.sql.window import Window

    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    base = documents.select(
        "doc_id",
        F.expr(
            "filter(split(lower(coalesce(text, '')), '[^a-z]+'),"
            f" t -> length(t) >= {int(min_len)})"
        ).alias("w"),
    )
    srow = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus"),
        F.sum(F.size("w")).cast("long").alias("sum_dl"),
        F.max(F.size("w")).cast("long").alias("max_dl"),
    ).collect()[0]
    n_corpus = int(srow["n_corpus"] or 0)
    sum_dl = int(srow["sum_dl"] or 0)
    max_dl = int(srow["max_dl"] or 0)
    # exact worst-case of the score numerator (df >= 1, tf <= max_dl):
    # idf_fp4_max * 44 * tf_max * S must fit a signed 64-bit long
    idf_fp4_max = (10000 * (2 * n_corpus - 1)) // 3 if n_corpus else 0
    if idf_fp4_max * 44 * max_dl * sum_dl >= (1 << 63):
        raise ValueError(
            "bm25_topk: corpus too large for exact BIGINT scoring "
            f"(n_corpus={n_corpus}, sum_dl={sum_dl}); use a DOUBLE + "
            "log-idf variant at this scale"
        )
    toks = base.select(
        "doc_id", F.size("w").cast("long").alias("dl"), F.explode("w").alias("term")
    ).where(F.expr(f"term IN ({quoted})"))
    tf = toks.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        F.expr(
            f"((10000 * (2 * {n_corpus} - 2 * doc_freq + 1))"
            " div (2 * doc_freq + 1))"
            f" * 44 * tf * {sum_dl}"
            f" div (20 * tf * {sum_dl} + 6 * {sum_dl} + 18 * dl * {n_corpus})"
        )
        .cast("long")
        .alias("c"),
    )
    by_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        F.sum("c").cast("long").alias("score"),
    )
    top = by_doc.orderBy(F.col("score").desc(), "doc_id").limit(int(k))
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "n_terms_hit",
        "score",
    )


def dup_spans(documents: DataFrame, n: int = 10) -> DataFrame:
    """Cross-document duplicate-span mass (exact substring dedup signal,
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better", §3 ExactSubstr — the shingle-counting formulation).

    For each document: how much of it is made of ``n``-word spans that
    also appear in OTHER documents. Output ``doc_id, n_spans,
    n_dup_spans, dup_span_frac`` where spans are distinct per document
    (a span repeated inside one document is self-repetition —
    ``repetition_filter``'s job — not cross-doc duplication).

    Scale shape (10^12 docs): the shingle stream explodes once and is
    projected to ``md5`` hashes immediately (narrow rows); the
    hot-shingle relation is the *output* of a map-side-combined count
    aggregation filtered to ``n_docs >= 2`` BEFORE the membership join,
    so the join probes the stream against the duplicated subset only;
    nothing broadcasts the corpus and nothing collects. Suffix-automaton
    exactness (arbitrary-length longest match) is traded for fixed-n
    shingles — the standard distributed relaxation."""
    # words materialized ONCE per row — inlining the split in the lambda
    # makes Catalyst re-evaluate it per shingle, O(words²) (dedup.py:40-45);
    # size < n must special-case (Spark's sequence(1, 0) counts DOWN)
    spans = (
        documents.select(
            "doc_id",
            F.expr(
                f"filter(split({NORM}, ' '), t -> t <> '')"
            ).alias("w"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN w IS NULL OR size(w) < {n} THEN array() "
                    f"ELSE transform(sequence(1, size(w) - {n - 1}), "
                    f"i -> md5(array_join(slice(w, i, {n}), ' '))) END"
                )
            ).alias("sh"),
        )
        .distinct()  # distinct per (doc_id, shingle)
    )
    hot = (
        spans.groupBy("sh")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("sh")
    )
    flagged = spans.join(hot, "sh", "left_semi").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dup_spans")
    )
    totals = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans")
    )
    base = documents.select("doc_id")
    return (
        base.join(totals, "doc_id", "left")
        .join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0))
            .cast("long")
            .alias("n_dup_spans"),
            _trunc6(
                F.coalesce("n_dup_spans", F.lit(0))
                / F.greatest(F.coalesce("n_spans", F.lit(0)), F.lit(1))
            ).alias("dup_span_frac"),
        )
    )


def dsir_weights(
    documents: DataFrame,
    target_pred: str = "lang = 'en'",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR importance weights over hashed n-gram features (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling",
    arXiv:2302.03169).

    DSIR scores every raw document by how much more likely its features
    are under a *target* distribution (the data you want more of) than
    under the raw-corpus distribution, then resamples by that weight. As
    in the paper, features are word n-grams hashed into a fixed number of
    buckets and both distributions are add-one-smoothed bag-of-buckets
    models. ``target_pred`` is a SQL predicate selecting the in-corpus
    target slice (default: English docs — in practice a trusted
    high-quality subset).

    Deviation from the paper, following this module's engine-portability
    precedent (see ``top_terms``' log-free TF-IDF): the weight is the
    **mean per-occurrence likelihood ratio** rather than the summed
    log-ratio — ``ln``'s libm varies between engines while integer
    ratios scaled with floor(1e6·r) sum associatively and bit-match the
    DuckDB oracle. Monotone per bucket, so resampling ranks are preserved
    within single-bucket differences.

    Scale shape: grams are exploded once and projected immediately to a
    hashed bucket id (narrow rows); both models come from ONE map-side
    combined groupBy (cr = raw count, ct = target count per bucket); the
    model relation is bounded by ``n_buckets`` so the scoring join
    broadcasts it — the corpus side never shuffles for the join, only the
    final per-doc aggregation shuffles on doc_id. At a 10^12-gram corpus
    the 1e6 scale constant must shrink (or the ratio move to DECIMAL) to
    keep ``1e6·(ct+1)·(Nr+B)`` inside int64 — documented, not silent.
    """
    documents = _nn_text(documents)
    d = documents.select(
        "doc_id",
        F.expr(target_pred).alias("is_target"),
        F.expr("filter(split(trim(text), '\\\\s+'), t -> t <> '')").alias("w"),
    )
    grams = (
        d.where(F.expr("size(w) >= 2"))
        .select(
            "doc_id",
            "is_target",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            "is_target",
            (
                F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long")
                % F.lit(n_buckets)
            ).alias("bucket"),
        )
    )
    counts = grams.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.col("is_target").cast("long")).alias("ct"),
    )
    # corpus totals via an unpartitioned window over the counts relation:
    # at most n_buckets rows pass through the SinglePartition exchange, and
    # the counts subtree is computed ONCE (a separate totals aggregation
    # would re-run the corpus-wide gram pass — Catalyst does not reuse the
    # common subplan)
    w_all = Window.partitionBy()
    model = counts.select(
        "bucket",
        "cr",
        "ct",
        F.sum("cr").over(w_all).alias("nr"),
        F.sum("ct").over(w_all).alias("nt"),
    ).select(
        "bucket",
        F.expr(
            f"CAST(1000000 * (ct + 1) * (nr + {n_buckets}) AS BIGINT) "
            f"DIV CAST((cr + 1) * (nt + {n_buckets}) AS BIGINT)"
        ).alias("wgt"),
    )
    scored = (
        grams.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("wgt").alias("s"), F.count(F.lit(1)).alias("n_grams"))
    )
    return documents.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(
            _trunc6((F.col("s").cast("double") / F.lit(1e6)) / F.col("n_grams")),
            F.lit(0.0),
        ).alias("imp_weight"),
    )


def perplexity_buckets(documents: DataFrame) -> DataFrame:
    """CCNet head/middle/tail quality bucketing (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data", arXiv:1911.00359 §4.3).

    CCNet partitions each language's crawl into three equal-mass buckets
    by LM perplexity against a trusted-corpus model; downstream recipes
    keep *head* (and often *middle*) and drop *tail*. Here the quality
    signal is this module's corpus-trained :func:`lm_fit_score` (higher
    fit = more ordinary text), so ``head`` = highest fit tercile per
    language. The tie-break on ``doc_id`` makes the tercile assignment a
    total order — bit-stable across engines and partitionings.

    Scale shape: ``ntile`` over ``PARTITION BY lang`` sorts each language
    within one task — exact, and acceptable while per-language volume
    fits a task's spill budget. At true crawl scale the same output
    contract is produced by the standard two-pass variant: aggregate
    per-language approximate fit quantiles (``percentile_approx``, one
    map-side-combined pass), broadcast the two cut points, and bucket by
    comparison — no global sort. The exact form is kept here because the
    oracle gate needs determinism, and the swap is local to this
    function.
    """
    fit = lm_fit_score(documents)
    d = documents.select("doc_id", "lang").join(fit, "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("lm_fit"), F.asc("doc_id"))
    return d.select(
        "doc_id",
        "lang",
        "lm_fit",
        F.ntile(3).over(w).alias("tile"),
    ).select(
        "doc_id",
        "lang",
        "lm_fit",
        F.expr(
            "CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
            "ELSE 'tail' END"
        ).alias("ppl_bucket"),
    )


def domain_mix_weights(
    documents: DataFrame,
    epoch_docs: int = 100_000,
) -> DataFrame:
    """Temperature-scaled domain sampling weights (the multilingual /
    data-mixing recipe of Lample & Conneau 2019 §3.1 and GPT-3 §2.2:
    sample source *i* with probability proportional to ``p_i^alpha``,
    ``alpha < 1`` up-weighting small domains).

    ``alpha`` is fixed at 0.5 so the power is ``sqrt`` — IEEE-754
    correctly rounded in every engine, unlike ``pow``/``ln`` whose libm
    results vary by platform (the same portability rule as ``top_terms``'
    log-free TF-IDF). Each source's raw mass is its whitespace-token
    count; ``sqrt(p_i)`` is scaled to an integer with ``floor(1e9·x)`` so
    the normalizing sum is associative and partition-order-proof.

    Output per source: ``n_docs``, ``n_tokens``, ``mix_weight`` (the
    normalized sampling probability, 6-dp truncated) and ``sample_quota``
    (integer docs drawn from this source in an ``epoch_docs``-document
    epoch, floor semantics).

    Scale shape: one map-side-combined groupBy on ``source``; the
    normalizing total flows through an unpartitioned window over the
    per-source relation (bounded by the number of domains), never over
    the corpus.
    """
    documents = _nn_text(documents)
    per_src = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(F.expr("filter(split(trim(text), '\\\\s+'), t -> t <> '')"))
        ).cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    scaled = per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.floor(
            F.lit(1e9)
            * F.sqrt(
                F.col("n_tokens").cast("double")
                / F.sum("n_tokens").over(w_all).cast("double")
            )
        ).cast("long").alias("wi"),
    )
    return scaled.select(
        "source",
        "n_docs",
        "n_tokens",
        _trunc6(
            F.col("wi").cast("double") / F.sum("wi").over(w_all).cast("double")
        ).alias("mix_weight"),
        F.expr(f"CAST({epoch_docs} * wi AS BIGINT) DIV SUM(wi) OVER ()")
        .cast("long")
        .alias("sample_quota"),
    )


def linear_classifier(
    documents: DataFrame,
    weights: DataFrame,
    n_buckets: int = 4096,
) -> DataFrame:
    """fastText-style linear text classifier *inference* (Joulin et al.
    2016, "Bag of Tricks for Efficient Text Classification",
    arXiv:1607.01759) — the mechanism behind crawl-scale quality/topic
    classifiers (e.g. GPT-3's WebText-vs-crawl quality model, §A;
    FineWeb-Edu / DCLM educational-value filters).

    ``weights`` is the trained model: one row per ``(bucket, cls)`` with
    an integer weight ``wgt`` (fixed-point — training frameworks quantize
    to int for exactly this kind of portable serving). Features are
    hashed unigrams (md5 → ``n_buckets`` buckets, the fastText hashing
    trick); a document's per-class score is the sum of its features'
    class weights, its label the argmax (ties broken by class name).
    ``margin`` = best minus runner-up score, the usual
    keep-threshold knob. All-integer scoring — bit-identical across
    engines and partition orders.

    Scale shape: features are exploded once and projected straight to
    ``(doc_id, bucket)`` — one narrow row per token *occurrence*
    (fastText scores per occurrence, so no dedup happens or should);
    the model relation is bounded by
    ``n_buckets × |classes|`` so the scoring join is a broadcast — the
    corpus never shuffles for it; per-class sums and the argmax window
    both group on ``doc_id`` (one shuffle; the window partitions are
    |classes|-row slivers).
    """
    documents = _nn_text(documents)
    feats = (
        documents.select(
            "doc_id",
            F.explode(
                F.expr("filter(split(trim(text), '\\\\s+'), t -> t <> '')")
            ).alias("t"),
        )
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
                % F.lit(n_buckets)
            ).alias("bucket"),
        )
    )
    scores = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "cls")
        .agg(F.sum("wgt").cast("long").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    ranked = scores.select("doc_id", "cls", "score", F.row_number().over(w).alias("rn"))
    best = ranked.groupBy("doc_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cls"))).alias("label"),
        F.max(F.when(F.col("rn") == 1, F.col("score"))).cast("long").alias("score"),
        (
            F.max(F.when(F.col("rn") == 1, F.col("score")))
            - F.coalesce(
                F.max(F.when(F.col("rn") == 2, F.col("score"))),
                F.max(F.when(F.col("rn") == 1, F.col("score"))),
            )
        ).cast("long").alias("margin"),
    )
    return documents.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce("label", F.lit("")).alias("label"),
        F.coalesce("score", F.lit(0)).cast("long").alias("score"),
        F.coalesce("margin", F.lit(0)).cast("long").alias("margin"),
    )


def demo_classifier_weights(spark, n_buckets: int = 4096, classes=("clean", "boiler", "spam")):
    """Deterministic stand-in weight table for :func:`linear_classifier`
    (a real deployment loads trained weights from parquet): for every
    ``(bucket, cls)``, ``wgt = (first-8-hex-of-md5 mod 2001) - 1000`` —
    integer in [-1000, 1000], reproducible in any engine."""
    cls_rows = ", ".join(f"('{c}')" for c in classes)
    return spark.sql(
        f"""
        SELECT b.bucket, c.cls,
               CAST(conv(substring(md5(concat(b.bucket, ':', c.cls)), 1, 8), 16, 10)
                    AS BIGINT) % 2001 - 1000 AS wgt
        FROM (SELECT explode(sequence(0, {n_buckets - 1})) AS bucket) b
        CROSS JOIN (SELECT col1 AS cls FROM (VALUES {cls_rows})) c
        """
    )


# Unicode script blocks as literal-codepoint character classes: the same
# class string parses identically in Java regex (Spark) and RE2 (DuckDB)
# because it contains no \p{...} property names (Java spells them
# \p{IsLatin}, RE2 \p{Latin} — a dialect split the literal ranges avoid).
SCRIPT_RANGES = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "hebrew": "֐-׿",
    "devanagari": "ऀ-ॿ",
    "cjk": "぀-ヿ一-鿿",
    "hangul": "ᄀ-ᇿ가-힯",
}

# deterministic multilingual decoration for the driver query: the synthetic
# documents table is ASCII word salad, which would leave every non-Latin
# counter at zero — this CASE fragment (dialect-shared, like SYNTH_URL_SQL)
# appends fixed snippets per doc_id so every script path is exercised
SYNTH_MULTILINGUAL_SQL = (
    "concat(coalesce(text, ''), "
    "CASE WHEN doc_id % 4 = 0 THEN ' привет мир' "
    "WHEN doc_id % 4 = 1 THEN ' 你好世界 こんにちは' "
    "WHEN doc_id % 4 = 2 THEN ' مرحبا بالعالم' ELSE '' END, "
    "CASE WHEN doc_id % 5 = 0 THEN ' γειά σου κόσμε' "
    "WHEN doc_id % 5 = 1 THEN ' שלום עולם' "
    "WHEN doc_id % 5 = 2 THEN ' नमस्ते दुनिया' "
    "WHEN doc_id % 5 = 3 THEN ' 안녕하세요 세계' ELSE '' END)"
)


def script_profile(documents: DataFrame) -> DataFrame:
    """Per-document unicode-script composition (the mC4/CCNet multilingual
    curation pass): per-script character counts, the dominant script, and
    the fraction of characters belonging to ANY known script — documents
    whose dominant script contradicts their claimed ``lang``, or whose
    script_ratio is low (emoji soup, markup residue, binary spill), get
    filtered or re-routed before tokenization.

    Counting is ``length(text) - length(regexp_replace(text, '[class]',
    ''))`` per script — pure JVM projection work inside whole-stage
    codegen, zero shuffles, zero joins; at 100 TB this runs at scan
    speed alongside the other per-row quality passes. Dominant script is
    the lang_id-style CASE argmax (ties → earliest key in
    ``SCRIPT_RANGES``), ``'none'`` when no script character occurs."""
    documents = _nn_text(documents)
    scripts = list(SCRIPT_RANGES)
    cols = [
        F.expr(
            f"length(text) - length(regexp_replace(text, '[{rng}]', ''))"
        )
        .cast("long")
        .alias(f"n_{name}")
        for name, rng in SCRIPT_RANGES.items()
    ]
    counted = documents.select(
        "doc_id", F.length("text").cast("long").alias("n_chars"), *cols
    )
    all_zero = " AND ".join(f"n_{s} = 0" for s in scripts)
    branches = []
    for i, s in enumerate(scripts[:-1]):
        geq = " AND ".join(f"n_{s} >= n_{o}" for o in scripts[i + 1 :])
        branches.append(f"WHEN {geq} THEN '{s}'")
    case = (
        f"CASE WHEN {all_zero} THEN 'none' "
        + " ".join(branches)
        + f" ELSE '{scripts[-1]}' END"
    )
    total = None
    for s in scripts:
        c = F.col(f"n_{s}")
        total = c if total is None else (total + c)
    return counted.select(
        "doc_id",
        "n_chars",
        *[f"n_{s}" for s in scripts],
        _trunc6(
            total.cast("double") / F.greatest(F.col("n_chars"), F.lit(1))
        ).alias("script_ratio"),
        F.expr(case).alias("dominant_script"),
    )


def corpus_profile(documents: DataFrame) -> DataFrame:
    """Deequ-style one-pass data-quality profile: per column, null count,
    exact distinct count, min/max (native-type order, rendered as
    strings) and mean rendered length — the sanity report run before a
    corpus enters a training mix.

    Scale shape: ONE aggregation over the table computes every column's
    statistics together (Spark plans the multi-distinct via a single
    Expand pass — cost |columns|× row replication, no extra scans), then
    the single result row unpivots into per-column rows driver-side-free
    via ``explode``. At 10^12 rows swap ``countDistinct`` for
    ``approx_count_distinct`` (HLL, no Expand) — noted here because the
    oracle gate needs the exact variant.
    """
    cols = documents.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.sum(F.length(F.col(c).cast("string"))).alias(f"{c}__len"),
        ]
    row = documents.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__nn")).cast("long").alias("n_null"),
            F.col(f"{c}__nd").cast("long").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
            F.coalesce(
                _trunc6(
                    F.col(f"{c}__len").cast("double") / F.col(f"{c}__nn")
                ),
                F.lit(0.0),
            ).alias("avg_len"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


# The synthetic documents table carries no punctuation or newlines, so a
# C4 pass over it is all-drop — the driver query decorates the text into a
# multi-line page with varying terminal punctuation / word counts /
# javascript / lorem-ipsum / brace injections. Dialect-shared with the
# DuckDB oracle (chr(10), substring, CASE, concat with coalesced text all
# agree byte-for-byte; Spark concat is NULL-propagating, DuckDB's is not,
# hence the coalesce).
SYNTH_C4_TEXT_SQL = (
    "concat("
    "'Intro sentence for doc ', cast(doc_id as int), ' with enough words.', chr(10), "
    "CASE WHEN doc_id % 2 = 0 THEN concat(substring(coalesce(text, ''), 1, 80), "
    "' tail words padding here.', chr(10)) ELSE '' END, "
    "CASE WHEN doc_id % 3 = 0 THEN 'short line.' "
    "ELSE 'Second proper sentence with plenty of words today!' END, chr(10), "
    "CASE WHEN doc_id % 5 = 0 THEN concat('Enable javascript to continue reading now.', chr(10)) ELSE '' END, "
    "CASE WHEN doc_id % 7 = 0 THEN concat('Lorem ipsum dolor sit amet now.', chr(10)) ELSE '' END, "
    "CASE WHEN doc_id % 11 = 0 THEN concat('Code sample { x } appears now.', chr(10)) ELSE '' END, "
    "CASE WHEN doc_id % 4 = 0 THEN 'Third full sentence with plenty of words here?' "
    "ELSE 'no terminal punctuation in this trailing line' END)"
)


def c4_clean(documents: DataFrame) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2, the "Colossal Clean
    Crawled Corpus" heuristics) — line-level filters plus page-level
    discard verdicts, flags-not-filters so the funnel stays observable:

    line kept iff (all three):
      * ends in terminal punctuation (``.`` ``!`` ``?`` ``"``) — C4's
        "retained lines that ended in a terminal punctuation mark";
      * carries >= 5 whitespace-separated words;
      * does not contain the word "javascript" (case-insensitive).

    page ``keep`` iff (all three, evaluated on the ORIGINAL page text —
    C4 removes the page outright when these fire):
      * >= 3 sentences survive the line filters (deterministic proxy:
        terminal-punctuation marks in the kept text — C4 uses an English
        sentence splitter, a model dependency this engine keeps out of
        the exact path);
      * no "lorem ipsum" anywhere (case-insensitive);
      * no curly brace ``{`` anywhere (C4's code-page heuristic).

    C4's fourth page rule (bad-words blocklist) is `web.url_filter`-style
    policy input, not a fixed constant — plug the list in as a filter on
    top. Its three-sentence-span dedup is the corpus-global pass
    implemented by `dup_spans` / `line_dedup`.

    Scale shape: one projection, zero joins, zero shuffles — every rule
    is a codegen'd higher-order array expression over the line split, so
    this runs at scan speed and composes with any downstream filter.
    """
    lines = (
        "transform(filter(split(coalesce(text, ''), '\\n'),"
        " l -> trim(l) <> ''), l -> trim(l))"
    )
    kept = (
        f"filter({lines}, l -> substring(l, -1, 1) IN ('.', '!', '?', '\"')"
        " AND size(split(l, '\\\\s+')) >= 5"
        " AND NOT contains(lower(l), 'javascript'))"
    )
    stage = documents.select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("_raw"),
        F.expr(f"array_join({kept}, '\\n')").alias("clean_text"),
        F.expr(f"size({lines})").cast("long").alias("n_lines_total"),
        F.expr(f"size({kept})").cast("long").alias("n_lines_kept"),
    ).select(
        "doc_id",
        "_raw",
        "clean_text",
        "n_lines_total",
        "n_lines_kept",
        (F.col("n_lines_total") - F.col("n_lines_kept"))
        .cast("long")
        .alias("n_lines_dropped"),
        (
            F.length("clean_text")
            - F.length(F.translate("clean_text", ".!?", ""))
        )
        .cast("long")
        .alias("n_sentences"),
    )
    return stage.select(
        "doc_id",
        "clean_text",
        "n_lines_total",
        "n_lines_kept",
        "n_lines_dropped",
        "n_sentences",
        (
            (F.col("n_sentences") >= 3)
            & ~F.lower("_raw").contains("lorem ipsum")
            & ~F.col("_raw").contains("{")
        ).alias("keep"),
    )


def bpe_train(documents: DataFrame, n_merges: int = 6) -> DataFrame:
    """Learn the first ``n_merges`` byte-pair-encoding merges over the
    corpus (Sennrich et al. 2016 `learn_bpe`; the tokenizer-training
    pass every LM data pipeline runs before token counting/packing).

    Algorithm (reference-faithful): words are whitespace tokens of the
    normalized text; each starts as its character sequence; per
    iteration the corpus-wide most frequent adjacent token pair
    (frequency-weighted by word count, ties broken lexicographically on
    (left, right)) becomes a merge, and every vocabulary word re-tokenizes
    with that merge applied greedily left-to-right. Output: one row per
    merge — ``(merge_rank, lhs, rhs, merged, pair_count)``.

    Scale shape: after ONE corpus pass (explode words → groupBy word),
    everything runs on the *distinct-word* relation — the fastBPE
    insight: web corpora have ~10M distinct words regardless of corpus
    size, so per-iteration work is a small explode + map-side-combined
    groupBy + 1-row argmax collect (bounded driver model state, the
    MLlib-estimator pattern shared with `ivf_train`). The fold that
    applies a merge is a codegen'd `aggregate` HOF — no Python. Lineage
    is truncated per iteration with `localCheckpoint` (the
    `dup_clusters` / `host_pagerank` iteration pattern).
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges ({n_merges}) must be positive")
    spark = documents.sparkSession
    vocab = (
        documents.select(
            F.explode(
                F.expr(f"filter(split({NORM}, ' '), w -> w <> '')")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("word", "cnt", F.expr("split(word, '')").alias("toks"))
        .localCheckpoint()
    )
    fold = (
        "aggregate(toks, cast(array() as array<string>), "
        "(acc, t) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = lhs "
        "AND t = rhs "
        "THEN concat(slice(acc, 1, size(acc) - 1), array(concat(lhs, rhs))) "
        "ELSE concat(acc, array(t)) END)"
    )
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = vocab.where(F.expr("size(toks) >= 2")).select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) AS a, "
                    "element_at(toks, i + 1) AS b))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("lhs"), F.col("p.b").alias("rhs"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append(
            (rank, row["lhs"], row["rhs"], row["lhs"] + row["rhs"],
             int(row["n"]))
        )
        best_df = spark.createDataFrame(
            [(row["lhs"], row["rhs"])], "lhs string, rhs string"
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best_df))
            .select("word", "cnt", F.expr(fold).alias("toks"))
            .localCheckpoint()
        )
    return spark.createDataFrame(
        merges,
        "merge_rank long, lhs string, rhs string, merged string, "
        "pair_count long",
    )


def bpe_train_offline(documents: DataFrame, n_merges: int = 1000) -> DataFrame:
    """Driver-side BPE trainer for production-sized vocabularies
    (Sennrich et al. 2016 `learn_bpe` with fastBPE-style incremental
    pair-count maintenance).

    :func:`bpe_train` is the oracle-verifiable demo: each of its merges
    is a Spark groupBy + 1-row collect, which is honest eval scope but
    makes a 30k-merge production vocab ~30k Spark jobs. This trainer
    keeps the distributed part to exactly ONE corpus pass — the
    explode→groupBy building the distinct-word relation (the fastBPE
    insight: web corpora hold ~10M distinct words regardless of corpus
    size, i.e. bounded driver model state like `ivf_train`'s codebooks)
    — then runs the merge loop in-process with incremental updates:
    picking a merge only re-tokenizes words that ever contained the
    pair, so per-merge cost is proportional to the affected vocabulary
    slice, not the whole relation.

    Merge semantics are IDENTICAL to :func:`bpe_train` (greedy
    left-to-right fold, frequency-weighted counts, ties broken
    lexicographically on (lhs, rhs) — Python tuple order equals Spark's
    code-point string order): the first k merges of both trainers are
    equal by construction, pinned by
    `test_bpe_train_offline_first_merges_equal_spark_trainer`.

    Output schema matches bpe_train: one row per merge,
    ``(merge_rank, lhs, rhs, merged, pair_count)``; training stops early
    when no adjacent pair remains (fully merged vocabulary).
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges ({n_merges}) must be positive")
    from collections import Counter, defaultdict

    spark = documents.sparkSession
    rows = (
        documents.select(
            F.explode(
                F.expr(f"filter(split({NORM}, ' '), w -> w <> '')")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    words: list[tuple[list[str], int]] = [
        (list(r["word"]), int(r["cnt"])) for r in rows
    ]
    pair_n: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wi, (toks, cnt) in enumerate(words):
        for pair in zip(toks, toks[1:]):
            pair_n[pair] += cnt
            pair_words[pair].add(wi)

    merges = []
    for rank in range(1, n_merges + 1):
        if not pair_n:
            break
        (lhs, rhs), n = min(
            pair_n.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, lhs, rhs, lhs + rhs, int(n)))
        # re-tokenize every word that ever held the pair (stale entries
        # re-add their own counts — identity, not an error)
        for wi in pair_words.pop((lhs, rhs), ()):
            toks, cnt = words[wi]
            for pair in zip(toks, toks[1:]):
                pair_n[pair] -= cnt
                if pair_n[pair] <= 0:
                    del pair_n[pair]
            # the same greedy left-to-right fold as bpe_train's SQL
            acc: list[str] = []
            for t in toks:
                if acc and acc[-1] == lhs and t == rhs:
                    acc[-1] = lhs + rhs
                else:
                    acc.append(t)
            words[wi] = (acc, cnt)
            for pair in zip(acc, acc[1:]):
                pair_n[pair] += cnt
                pair_words[pair].add(wi)

    return spark.createDataFrame(
        merges,
        "merge_rank long, lhs string, rhs string, merged string, "
        "pair_count long",
    )


def bpe_apply(documents: DataFrame, n_merges: int = 6) -> DataFrame:
    """Tokenize the corpus with the merges :func:`bpe_train` learns from
    it (the train-then-count pass that sizes a pre-training mix in model
    tokens rather than whitespace words).

    Per document: ``n_words`` (whitespace tokens of the normalized
    text), ``n_bpe_tokens`` (tokens after applying the learned merges in
    rank order, greedy left-to-right per word — Sennrich's `apply_bpe`),
    and ``compression_pct`` (integer percent ``100·bpe/chars`` —
    division-free so both engines agree exactly).

    Scale shape: merges are bounded driver model state (the vocab-size
    constant, ~30k entries in production — broadcast, never shuffled);
    tokenization runs on the *distinct-word* relation and joins back to
    the exploded corpus on the word key, so the expensive fold runs once
    per distinct word, not once per occurrence. Two shuffles total
    (distinct words, per-doc sum) regardless of merge count.
    """
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train(documents, n_merges).collect()
    ]
    words = documents.select(
        "doc_id",
        F.explode(
            F.expr(f"filter(split({NORM}, ' '), w -> w <> '')")
        ).alias("word"),
    )
    vocab = words.select("word").distinct().select(
        "word", F.expr("split(word, '')").alias("toks")
    )

    def lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    for lhs, rhs in merges:
        fold = (
            "aggregate(toks, cast(array() as array<string>), "
            f"(acc, t) -> CASE WHEN size(acc) > 0 "
            f"AND element_at(acc, -1) = {lit(lhs)} AND t = {lit(rhs)} "
            f"THEN concat(slice(acc, 1, size(acc) - 1), "
            f"array({lit(lhs + rhs)})) "
            "ELSE concat(acc, array(t)) END)"
        )
        vocab = vocab.select("word", F.expr(fold).alias("toks"))
    sized = vocab.select(
        "word", F.size("toks").cast("long").alias("n_toks")
    )
    per_doc = (
        words.join(sized, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_bpe_tokens"),
        )
    )
    # left join back so empty/NULL-text docs keep a (0, 0) row
    base = documents.select(
        "doc_id",
        F.length(F.expr(NORM)).cast("long").alias("n_chars_norm"),
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
        "n_chars_norm",
        # integer-exact percent: DIV sidesteps IEEE division entirely
        F.expr(
            "CASE WHEN n_chars_norm > 0 THEN "
            "(coalesce(n_bpe_tokens, 0) * 100) DIV n_chars_norm "
            "ELSE 0 END"
        ).cast("long").alias("compression_pct"),
    )


def lang_length_quantiles(documents: DataFrame) -> DataFrame:
    """Per-language discrete length quantiles (p25/p50/p75/p90 of
    ``n_chars``) — the calibration table per-language length filters are
    cut from (CCNet/mC4 tune their min/max-length rules per language
    because script verbosity differs wildly; a 200-char Chinese page is
    an article, a 200-char German page is a menu).

    Discrete (type-1) quantiles: the value at rank ``ceil(q*n)`` in the
    per-language sort — integer-exact, so the DuckDB twin agrees
    byte-for-byte (continuous interpolation would hang the hash compare
    on last-ulp float formula differences between engines).

    Scale shape: the corpus never sorts. Lengths first collapse to a
    per-(lang, n_chars) histogram (map-side combined; cardinality is
    bounded by #langs x max document length, independent of corpus
    rows), the cumulative rank is a window over that tiny histogram, and
    rank targets ride a broadcast of the one-row-per-lang totals. The
    only corpus-wide work is one groupBy shuffle of (lang, n_chars)
    pairs.

    Output: ``lang, n_docs, p25, p50, p75, p90`` (lengths as BIGINT).
    """
    from pyspark.sql.window import Window

    # NULL lang folds into '' and NULL lengths are dropped: Spark orders
    # NULLs first, DuckDB last, so a NULL reaching the cumulative window
    # (or the groupBy tie-break) would diverge across engines
    docs = documents.select(
        F.coalesce("lang", F.lit("")).alias("lang"), "n_chars"
    ).where(F.col("n_chars").isNotNull())
    hist = (
        docs.groupBy("lang", "n_chars")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    # per-lang totals fold from the tiny histogram, not a second corpus
    # scan — the histogram counts already sum to the filtered doc count
    totals = hist.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    j = cum.join(F.broadcast(totals), "lang")
    # rank targets in pure integer arithmetic: ceil(q*n) = (num*n + den-1) div den
    quants = {"p25": (1, 4), "p50": (1, 2), "p75": (3, 4), "p90": (9, 10)}
    aggs = [F.max("n").alias("n_docs")]
    for name, (num, den) in quants.items():
        tgt = f"(({num} * n + {den - 1}) div {den})"
        aggs.append(
            F.min(
                F.expr(f"CASE WHEN cum >= {tgt} THEN n_chars END")
            ).cast("long").alias(name)
        )
    return j.groupBy("lang").agg(*aggs)


# Demo blocklist (wordlist-as-parameter — real deployments plug the full
# "LDNOOBW" list in); shared verbatim with the DuckDB oracle twin.
DEMO_BADWORDS = ("casino", "jackpot", "viagra", "xxx", "porn")

SYNTH_BADWORD_TEXT_SQL = (
    "concat(coalesce(text, ''), "
    "CASE WHEN doc_id % 19 = 0 THEN ' Online CASINO jackpot bonus spins.' "
    "WHEN doc_id % 23 = 0 THEN ' Cheap viagra, best Viagra!' "
    "WHEN doc_id % 29 = 0 THEN ' xxx' ELSE '' END)"
)


def badword_stats(
    documents: DataFrame,
    words: tuple = DEMO_BADWORDS,
    text_col: str = "text",
) -> DataFrame:
    """C4's fourth page rule (Raffel et al. 2020 §2.2: "removed any page
    that contained any word on the 'List of Dirty, Naughty, Obscene or
    Otherwise Bad Words'") as an observable flag column. Matching is
    token-exact, not substring — "classic" must never fire on "ass" —
    so tokens are lowered and stripped of edge punctuation before the
    set test.

    Emits per doc the hit count, total token count, integer ppm hit rate
    (``n_bad * 1e6 div n_tokens`` — engine-exact, no floats) and the C4
    verdict ``keep = n_bad == 0``.

    Scale shape: pure higher-order-function projection over the token
    split — zero shuffles/joins; the wordlist is a Catalyst array
    literal, never a table. For wordlists beyond literal size (~10k) the
    same shape becomes a broadcast join on the stripped token."""
    toks = (
        f"filter(transform(split(lower(coalesce({text_col}, '')), '\\\\s+'),"
        " t -> regexp_replace(t, '^[^a-z0-9]+|[^a-z0-9]+$', '')),"
        " t -> t <> '')"
    )
    lst = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    stage = documents.select(
        "doc_id",
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.expr(f"size(filter({toks}, t -> array_contains({lst}, t)))")
        .cast("long")
        .alias("n_bad"),
    )
    return stage.select(
        "doc_id",
        "n_tokens",
        "n_bad",
        F.when(F.col("n_tokens") > 0, F.floor(F.col("n_bad") * F.lit(1000000) / F.col("n_tokens")))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bad_ppm"),
        (F.col("n_bad") == 0).alias("keep"),
    )


# One regex pass per rule, shared (as RE2/Java-portable patterns) with the
# oracle. Order matters and is part of the contract: line endings unified
# first (CRLF/CR -> LF), controls out (so a TAB-only line still collapses),
# then horizontal runs, then edge-of-line trim, then blank-run collapse.
NORM_CRLF_RE = "\\r\\n?"
NORM_CONTROL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
NORM_HSPACE_RE = "[ \\t]+"
NORM_EDGE_RE = " *\\n *"
NORM_BLANKS_RE = "\\n{3,}"

SYNTH_NOISY_TEXT_SQL = (
    "concat("
    "CASE WHEN doc_id % 3 = 0 THEN concat(chr(9), '  ') ELSE '' END, "
    "replace(coalesce(text, ''), ' ', "
    "CASE WHEN doc_id % 4 = 0 THEN '  ' ELSE ' ' END), "
    "CASE WHEN doc_id % 5 = 0 THEN concat(chr(7), 'bell') ELSE '' END, "
    "CASE WHEN doc_id % 7 = 0 THEN concat(chr(10), chr(10), chr(10), chr(10), 'tail.') ELSE '' END, "
    "CASE WHEN doc_id % 11 = 0 THEN concat(chr(10), ' padded line ', chr(9)) ELSE '' END, "
    "CASE WHEN doc_id % 13 = 0 THEN concat(chr(13), chr(10), 'crlf line.', chr(13)) ELSE '' END)"
)


def normalize_text(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Text canonicalization — the pass every pipeline runs before
    hashing/dedup so that byte-trivia (tabs vs spaces, CR remnants,
    stray control chars, ragged blank runs) doesn't defeat exact dedup:

    1. line endings unified (CRLF / lone CR -> LF);
    2. control chars (C0 minus ``\\n``, plus DEL) stripped;
    3. horizontal whitespace runs collapsed to one space;
    4. spaces trimmed at line edges;
    5. 3+ consecutive newlines collapsed to a blank line;
    6. outer trim.

    Emits the normalized text, before/after char counts, a ``changed``
    flag and ``norm_key = md5(norm_text)`` — the key exact dedup should
    group on instead of raw md5(text). Unicode NFC is deliberately NOT
    in this exact path (Spark has no JVM-side normalizer; a pandas-UDF
    NFC pass belongs next to the other Python-boundary enrichments).

    Scale shape: chained ``regexp_replace`` projection — zero shuffles,
    scan speed, whole-stage codegen."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    norm = F.regexp_replace(raw, NORM_CRLF_RE, "\n")
    norm = F.regexp_replace(norm, NORM_CONTROL_RE, "")
    norm = F.regexp_replace(norm, NORM_HSPACE_RE, " ")
    norm = F.regexp_replace(norm, NORM_EDGE_RE, "\n")
    norm = F.regexp_replace(norm, NORM_BLANKS_RE, "\n\n")
    norm = F.trim(norm)
    return documents.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(raw).cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        (norm != raw).alias("changed"),
        F.md5(norm).alias("norm_key"),
    )


def perceptron_train(
    documents: DataFrame,
    label_pred: str = "lang = 'en'",
    n_buckets: int = 32,
    epochs: int = 3,
) -> DataFrame:
    """Distributed batch-perceptron TRAINING for a binary text
    classifier (Rosenblatt 1958; the batch/aggregate formulation) —
    the training half of the crawl-quality-classifier loop whose
    inference half is :func:`linear_classifier` (DCLM / FineWeb-Edu
    train a model on weak labels, then filter the crawl with it).

    Features are hashed unigram counts (the same md5 hashing trick as
    :func:`linear_classifier`) plus a constant bias feature at bucket id
    ``n_buckets``; labels ``y ∈ {+1, -1}`` come from ``label_pred``, a
    SQL predicate over the input relation (in production: a trusted
    seed set vs random crawl). Each epoch scores every document under
    the current INTEGER weight vector and adds the summed gradient
    ``Σ_misclassified y·x`` — all-integer arithmetic end to end, so
    the learned weights are bit-identical across engines, partition
    counts, and row orders (the perceptron replaces the logistic
    ``exp``, whose libm varies between engines, with a sign test —
    this module's engine-portability precedent).

    Model state: the weight vector is ``n_buckets + 1`` integers held
    driver-side (like :func:`ivf_train`'s codebook / MLlib's KMeans
    centers); per epoch the corpus sees ONE broadcast hash-join against
    the tiny weight relation + a doc-keyed aggregation over the
    pre-partitioned feature relation, and only ``n_buckets + 1``
    gradient rows ever reach the driver. The feature relation is built
    once, repartitioned by ``doc_id`` and checkpoint-pinned, so every
    epoch's score aggregation and misclassified join are co-located —
    no corpus re-scan, no corpus-sized shuffle after epoch 0.

    Weight magnitudes are bounded by ``epochs × total token
    occurrences`` — inside int64 up to ~10^15 corpus tokens; beyond
    that the counts must move to DECIMAL (documented, not silent).

    Returns the trained model as exploded scalar rows
    ``(bucket, weight)`` — ``bucket = n_buckets`` is the bias.
    """
    if epochs < 1 or n_buckets < 1:
        raise ValueError("epochs and n_buckets must be positive")
    documents = _nn_text(documents)
    spark = documents.sparkSession
    d = documents.select(
        "doc_id",
        F.when(F.expr(label_pred), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
        F.expr("filter(split(trim(text), '\\\\s+'), t -> t <> '')").alias("w"),
    )
    tok = d.select("doc_id", F.explode("w").alias("t")).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
            % F.lit(n_buckets)
        ).alias("bucket"),
    )
    counted = tok.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    bias = d.select(
        "doc_id", F.lit(n_buckets).cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("cnt"),
    )
    feats = (
        counted.unionByName(bias)
        .repartition("doc_id")
        .localCheckpoint(eager=True)  # pin: epochs re-read, never re-derive
    )
    labels = d.select("doc_id", "y").localCheckpoint(eager=True)

    weights = {b: 0 for b in range(n_buckets + 1)}
    for _ in range(epochs):
        nonzero = [(b, wt) for b, wt in weights.items() if wt != 0]
        if nonzero:
            wdf = spark.createDataFrame(nonzero, "bucket long, wgt long")
            sc = (
                feats.join(F.broadcast(wdf), "bucket")
                .groupBy("doc_id")
                .agg(F.sum(F.col("cnt") * F.col("wgt")).alias("score"))
            )
            scored = labels.join(sc, "doc_id", "left").select(
                "doc_id", "y",
                F.coalesce("score", F.lit(0)).alias("score"),
            )
        else:  # all-zero model scores every doc 0
            scored = labels.select("doc_id", "y", F.lit(0).alias("score"))
        mis = scored.where(F.col("y") * F.col("score") <= 0).select("doc_id", "y")
        grad = (
            feats.join(mis, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("cnt")).alias("g"))
            .collect()  # bounded: <= n_buckets + 1 rows of model state
        )
        for r in grad:
            weights[r["bucket"]] += r["g"]
    return spark.createDataFrame(
        sorted(weights.items()), "bucket long, weight long"
    )


def cm_sketch(
    documents: DataFrame,
    width: int = 128,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch of corpus term frequencies (Cormode &
    Muthukrishnan 2005, "An improved data stream summary: the
    count-min sketch and its applications") — the frequency-sketch
    sibling of :func:`~doc_parser_spark.operators.web.distinct_kmv`.

    Row ``r``'s hash is the md5 of ``r || ':' || token`` folded to a
    column (the module's engine-portable md5 trick), so the sketch is
    DETERMINISTIC — identical across engines, partitionings, and row
    orders. Every token occurrence increments one cell per row;
    ``est(t) = min_r cell[r][h_r(t)]`` (see :func:`cm_estimate`)
    overestimates only, by at most ``N/width`` per row w.h.p.

    Why it matters at 10^12 docs: exact term counting
    (:func:`top_terms`) shuffles every distinct gram; the sketch is a
    single map-side-combined aggregation into a FIXED ``depth×width``
    relation, and sketches of disjoint corpus shards merge by
    CELL-WISE ADDITION — ship ``depth·width`` integers per shard, not
    gram streams (pinned by the unit test's merge property).

    Returns ``(row, col, cnt)`` — only touched cells; absent = 0.
    """
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be positive")
    documents = _nn_text(documents)
    tok = documents.select(
        F.explode(
            F.expr("filter(split(trim(text), '\\\\s+'), t -> t <> '')")
        ).alias("t")
    )
    cells = tok.select(
        F.posexplode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{r}:"), F.col("t"))),
                                1, 8,
                            ),
                            16, 10,
                        ).cast("long")
                        % F.lit(width)
                    )
                    for r in range(depth)
                ]
            )
        ).alias("row", "col")
    )
    return cells.groupBy("row", "col").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cm_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    width: int = 128,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate term frequencies from a :func:`cm_sketch`:
    ``est(t) = min_r sketch[r][h_r(t)]``, 0 when a probed cell was
    never touched. ``terms`` is a relation with a ``term`` column —
    typically a small candidate list (heavy-hitter verification,
    blocklist auditing), so the probe side stays broadcast-sized and
    the sketch side is already bounded ``depth×width``.

    Returns ``(term, est_count)`` — an OVERESTIMATE of the true count
    (never under), the CM guarantee the unit tests pin.
    """
    probes = terms.select(
        "term",
        F.posexplode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{r}:"), F.col("term"))),
                                1, 8,
                            ),
                            16, 10,
                        ).cast("long")
                        % F.lit(width)
                    )
                    for r in range(depth)
                ]
            )
        ).alias("row", "col"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy("term").agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_count")
    )


def kn_bigrams(documents: DataFrame, min_count: int = 3) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model over the corpus
    (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.24) — the classic
    data-quality LM the CCNet/KenLM filtering stack trains on clean
    text, here trained distributed and emitted as a relation of
    smoothed bigram probabilities.

    With absolute discount d = 3/4::

        P_KN(w|u) = max(c(u,w) - d, 0)/c(u)
                    + (d·N1+(u·)/c(u)) · (N1+(·w)/|bigram types|)

    All four divisions run as integer floor-division on 1e6-scaled
    BIGINTs (d = 3/4 makes ``c - d`` the exact integer ``(4c-3)/4``), so
    the probabilities are bit-identical in any engine and under any
    partitioning/summation order — the oracle-portability rule of this
    package. The flooring loses < 3e-6 of probability mass per term vs
    exact rationals; a consumer needing calibrated mass renormalizes
    per-u downstream (one groupBy).

    Tokenization is the shared ``NORM`` split every text operator uses;
    documents with fewer than two tokens contribute nothing. Bigrams
    below ``min_count`` occurrences are not emitted (their statistics
    still shape the counts they appear in — the cut is on the OUTPUT
    relation, the standard KenLM pruning knob, keeping the emitted
    model bounded).

    Scale shape (10^12 docs): one explode to the bigram stream, then
    three map-side-combined groupBys (token-pair counts, left-context
    totals + follower types, right-context predecessor types) joined
    back on their keys — all narrow string-pair rows; the bigram-type
    total is a one-row aggregate cross-joined back (scalar broadcast).
    Nothing corpus-sized collects; skewed head words ride the same
    hash-shuffle every groupBy uses (AQE splits the hot reducers).
    """
    if min_count < 1:
        raise ValueError(f"min_count ({min_count}) must be >= 1")
    d = documents.select(
        F.expr(f"split({NORM}, ' ')").alias("wd")
    ).where("size(wd) >= 2 AND wd[0] <> ''")
    pairs = d.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(wd) - 2),"
                " i -> struct(wd[i] AS u, wd[i + 1] AS w))"
            )
        ).alias("p")
    ).select("p.u", "p.w")
    # the bigram stream feeds three aggregations — materialize it once
    pairs = pairs.persist()
    cuw = pairs.groupBy("u", "w").agg(F.count(F.lit(1)).alias("n_uw"))
    cuw = cuw.persist()
    left = cuw.groupBy("u").agg(
        F.sum("n_uw").alias("n_u"),
        F.count(F.lit(1)).alias("n_follow_u"),
    )
    right = cuw.groupBy("w").agg(F.count(F.lit(1)).alias("n_prec_w"))
    types = cuw.agg(F.count(F.lit(1)).alias("n_types"))
    out = (
        cuw.where(F.col("n_uw") >= min_count)
        .join(left, "u")
        .join(right, "w")
        .crossJoin(F.broadcast(types))
        .select(
            "u",
            "w",
            F.col("n_uw").cast("long").alias("n_uw"),
            F.col("n_u").cast("long").alias("n_u"),
            F.col("n_follow_u").cast("long").alias("n_follow_u"),
            F.col("n_prec_w").cast("long").alias("n_prec_w"),
            F.expr(
                "(1000000 * (4 * n_uw - 3)) DIV (4 * n_u)"
                " + (((3 * n_follow_u * 1000000) DIV (4 * n_u))"
                "    * ((1000000 * n_prec_w) DIV n_types)) DIV 1000000"
            ).cast("long").alias("pkn_scaled"),
        )
        .withColumn(
            "p_kn", F.col("pkn_scaled").cast("double") / F.lit(1e6)
        )
    )
    return out


def kn_score(documents: DataFrame, min_count: int = 3) -> DataFrame:
    """Per-document surprisal under the corpus-trained interpolated
    Kneser-Ney bigram model — the CCNet scoring step (Wenzek et al.
    2020 §4.2: score every paragraph with a KenLM model, filter by
    perplexity). :func:`kn_bigrams` is the training half; this is the
    inference half, run as one relation-to-relation join.

    Each bigram occurrence in a document is charged an integer **bit
    cost**: ``20 - floor(log2(pkn_scaled))`` clamped to ``[0, 20]``,
    where ``pkn_scaled`` is the model's 1e6-scaled probability — so a
    ceiling-probability bigram costs ~0 bits and anything at or below
    the 1e-6 floor costs 20. Bigrams absent from the emitted (pruned)
    model — OOV under the KenLM artifact contract — cost the full 20
    bits. ``floor(log2(n))`` is computed as ``length(bin(n)) - 1``:
    pure integer/string arithmetic, bit-identical across engines,
    immune to the libm ``log`` ulp drift this package's oracle rules
    forbid (same rationale as ``top_terms``' log-free TF-IDF).

    Output per document (ALL documents — textless rows score zero):
    ``n_bigrams``, ``n_oov``, ``total_bits`` and ``avg_bits_q6`` (the
    1e6-scaled mean bit cost — the CCNet ranking key; lower = more
    ordinary text; ``perplexity = 2^(avg_bits)`` for a consumer who
    wants the familiar units).

    Scale shape (10^12 docs): one explode to the per-occurrence bigram
    stream (narrow ``(doc_id, u, w)`` rows), one hash equi-join against
    the model relation on ``(u, w)`` — the model is vocabulary-sized,
    far smaller than the stream, and never collects — then one
    map-side-combined groupBy on ``doc_id`` and a final left join back
    to the document spine. Skewed head bigrams ride AQE's skew split
    like every other hot-key join here.
    """
    model = kn_bigrams(documents, min_count=min_count).select(
        "u", "w", "pkn_scaled"
    )
    documents = _nn_text(documents)
    d = documents.select(
        "doc_id", F.expr(f"split({NORM}, ' ')").alias("wd")
    ).where("size(wd) >= 2 AND wd[0] <> ''")
    stream = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(wd) - 2),"
                " i -> struct(wd[i] AS u, wd[i + 1] AS w))"
            )
        ).alias("p"),
    ).select("doc_id", "p.u", "p.w")
    cost = F.expr(
        "CASE WHEN pkn_scaled IS NULL THEN 20 ELSE"
        " greatest(0, least(20,"
        "   20 - (length(bin(greatest(pkn_scaled, 1))) - 1))) END"
    )
    scored = (
        stream.join(model, ["u", "w"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(
                F.when(F.col("pkn_scaled").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_oov"),
            F.sum(cost).cast("long").alias("total_bits"),
        )
    )
    return (
        documents.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("total_bits", F.lit(0)).cast("long")
            .alias("total_bits"),
            F.expr(
                "CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0"
                " ELSE (1000000 * total_bits) DIV n_bigrams END"
            ).cast("long").alias("avg_bits_q6"),
        )
    )


def pack_sequences(
    documents: DataFrame,
    seq_len: int = 2048,
    seed: str = "seq0",
    num_partitions: int = 0,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the pretraining step between
    a curated corpus and a trainer: documents are laid out in a
    DETERMINISTIC hash-shuffled order (md5 over ``seed:doc_id`` — the
    corpus shuffle every pretraining run needs, reproducible across
    engines and reruns, re-seedable per epoch) and the token stream is
    cut into fixed ``seq_len`` windows, documents crossing boundaries
    (GPT-style packing; the alternative best-fit bin packing wastes no
    tokens either but destroys sequential locality).

    Output per document: its token offset in the shuffled stream, the
    first/last sequence ids it lands in, and its offset inside the
    first sequence — exactly what a shard writer needs to emit training
    sequences without ever materializing the concatenated stream.

    Scale shape: same two-pass global prefix sum as :func:`pack_shards`
    (range-partition by the shuffle key, per-partition totals → driver
    offsets broadcast back, local cumsums) — no single-task window, no
    corpus collect; exact BIGINT arithmetic end-to-end so the DuckDB
    twin reproduces every offset bit-for-bit.
    """
    documents = _nn_text(documents)
    if seq_len <= 0:
        raise ValueError(f"seq_len ({seq_len}) must be positive")
    spark = documents.sparkSession
    if num_partitions <= 0:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    toks = F.expr("size(filter(split(trim(text), '\\\\s+'), t -> t <> ''))")
    pref = _exclusive_prefix_sum(
        documents.select(
            "doc_id",
            toks.cast("long").alias("n_tokens"),
            _hash_key(seed).alias("k"),
        ),
        ["k", "doc_id"],
        "n_tokens",
        num_partitions,
    )
    return pref.select(
        "doc_id",
        "n_tokens",
        F.col("_off").alias("tok_offset"),
        F.expr(f"_off DIV {seq_len}").alias("seq_first"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr(f"(_off + n_tokens - 1) DIV {seq_len}"),
        )
        .otherwise(F.expr(f"_off DIV {seq_len}"))
        .alias("seq_last"),
        (F.col("_off") % F.lit(seq_len)).alias("offset_in_seq"),
    )


def winnow_fingerprints(
    documents: DataFrame, k: int = 5, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
    the MOSS selection rule): hash every ``k``-word gram, slide a
    ``w``-gram window, keep each window's minimum hash. Any shared run
    of ``k + w - 1`` words between two documents is GUARANTEED to share
    a fingerprint (the paper's correctness property), while the index
    carries only ~``2/(w+1)`` of the gram stream — the local/positional
    dedup primitive that MinHash (whole-doc similarity) and
    :func:`dup_spans` (full shingle membership) do not give you at this
    index cost.

    Determinism: gram hash = ``md5`` hex of the space-joined gram;
    window minimum = lexicographic min of the hex strings — identical
    in any engine, no numeric conversion. Documents with fewer than
    ``k`` words emit nothing; with 1..``w`` grams they emit the single
    minimum (one degenerate window), so every fingerprintable document
    fingerprints. Output: exploded distinct ``(doc_id, fp)`` rows plus
    the document's gram/fingerprint counts.

    Scale shape (10^12 docs): the whole selection runs INSIDE the
    per-document array expressions — zero shuffles before the final
    distinct-explode projection; the word array is materialized once
    per row (the Catalyst re-evaluation trap documented at
    ``dedup.py:37-50``), windows cost O(grams · w) with small constant
    ``w``. Downstream match-mining joins on ``fp`` like every bucketed
    pair pipeline here (count-filter hot keys before any self-join).
    """
    if k < 1 or w < 1:
        raise ValueError(f"k ({k}) and w ({w}) must be >= 1")
    documents = _nn_text(documents)
    # Every array is BOUND as a higher-order-function lambda variable
    # (`transform(array(x), v -> ...)` — evaluated once, referenced many
    # times) instead of a projected column: Catalyst's CollapseProject
    # inlines column aliases into every reference, and a gram array
    # inlined into the per-window `slice` lambda re-runs the md5
    # projection PER WINDOW — O(grams²), measured 285 s vs 1.5 s on
    # sf0.1 (the same trap documented at dedup.py:37-50, one level
    # deeper because two arrays stack here).
    grams = (
        f"transform(array(filter(split({NORM}, ' '), t -> t <> '')),"
        f" wa -> CASE WHEN size(wa) < {k} THEN array() "
        f"ELSE transform(sequence(1, size(wa) - {k - 1}), "
        f"i -> md5(array_join(slice(wa, i, {k}), ' '))) END)[0]"
    )
    res = (
        f"transform(array({grams}), ga -> struct("
        f"size(ga) AS n_grams, "
        f"CASE WHEN size(ga) = 0 THEN array() "
        f"WHEN size(ga) <= {w} THEN array(array_min(ga)) "
        f"ELSE array_distinct(transform(sequence(1, size(ga) - {w - 1}), "
        f"j -> array_min(slice(ga, j, {w})))) END AS fp_arr))[0]"
    )
    return (
        documents.select("doc_id", F.expr(res).alias("r"))
        .where("r.n_grams > 0")
        .select(
            "doc_id",
            F.col("r.n_grams").cast("long").alias("n_grams"),
            F.size("r.fp_arr").cast("long").alias("n_fps"),
            F.explode("r.fp_arr").alias("fp"),
        )
    )


def winnow_pairs(
    documents: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 50,
) -> DataFrame:
    """MOSS-style match mining over :func:`winnow_fingerprints`:
    document pairs sharing at least ``min_shared`` winnowed
    fingerprints, with the shared count and an overlap ratio against
    the smaller document's fingerprint set — the local-duplication
    complement to :func:`dedup.lsh_candidate_pairs` (MinHash pairs say
    "globally similar"; winnow pairs say "share literal k+w-1-word
    runs", which catches boilerplate splicing and partial plagiarism
    that whole-doc similarity dilutes away).

    Same skew discipline as the LSH pipeline (``dedup.py``): fingerprint
    buckets are COUNTed first (map-side-combinable, one long per key),
    degenerate buckets (``n = 1`` or ``n > max_bucket`` — ubiquitous
    boilerplate fingerprints carry no pair signal but quadratic pair
    mass) are dropped BEFORE any membership expands, and only surviving
    keys self-join. The fingerprint relation is persisted once — three
    narrow columns per (doc, fp), tiny next to the corpus.

    Output: ``doc_a < doc_b``, ``n_shared``, ``share_ppm`` =
    ``1e6 · n_shared DIV min(n_fps_a, n_fps_b)`` (integer-exact).
    """
    if min_shared < 1 or max_bucket < 2:
        raise ValueError(
            f"min_shared ({min_shared}) must be >= 1 and "
            f"max_bucket ({max_bucket}) >= 2"
        )
    from pyspark import StorageLevel

    fps = winnow_fingerprints(documents, k=k, w=w).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.where(
        (F.col("n") > 1) & (F.col("n") <= max_bucket)
    ).select("fp")
    surv = fps.join(ok, "fp")
    a = surv.select(
        "fp", F.col("doc_id").alias("doc_a"), F.col("n_fps").alias("nf_a")
    )
    b = surv.select(
        "fp", F.col("doc_id").alias("doc_b"), F.col("n_fps").alias("nf_b")
    )
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.first("nf_a").alias("nf_a"),
            F.first("nf_b").alias("nf_b"),
        )
        .where(F.col("n_shared") >= min_shared)
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.expr("(1000000 * n_shared) DIV least(nf_a, nf_b)")
            .cast("long")
            .alias("share_ppm"),
        )
    )


# UTF-8 bytes mis-decoded as cp1252/latin-1 leave these signature pairs
# (the ftfy catalogue's high-frequency entries: curly quotes/dashes as
# 'â€¦', accented latin as 'Ã©'...). Printable signatures only, so the
# literals survive every SQL/string layer unmangled.
MOJIBAKE_SIGS = (
    "â€™",  # â€™  right single quote
    "â€œ",  # â€œ  left double quote
    "â€“",  # â€“  en dash
    "â€”",  # em dash
    "â€¦",  # â€¦  ellipsis
    "Ã©",        # Ã©   é
    "Ã¨",        # Ã¨   è
    "Ã¼",        # Ã¼   ü
    "Ã¶",        # Ã¶   ö
    "Ã±",        # Ã±   ñ
    "Ã¡",        # Ã¡   á
    "Ã³",        # Ã³   ó
)


def _count_literal_sql(t: str, lit: str) -> str:
    """Occurrence count of a literal inside ``t`` via length arithmetic
    — `(len(t) - len(replace(t, lit, ''))) / len(lit)`, exact in any
    engine, no regex dialect in play."""
    esc = lit.replace("'", "''")
    return (
        f"(length({t}) - length(replace({t}, '{esc}', '')))"
        f" DIV {len(lit)}"
    )


def mojibake_stats(documents: DataFrame) -> DataFrame:
    """Encoding-damage audit per document — the ftfy-style signal a
    crawl-cleaning pipeline gates on (Speer, ftfy: "fixes text for
    you"; the dominant damage class in web corpora is UTF-8 bytes
    decoded as cp1252, which leaves unmistakable two/three-char
    signatures like ``Ã©`` for ``é``).

    Counts: ``n_mojibake`` — total occurrences of the signature
    catalogue (literal-replace length arithmetic, no regex);
    ``n_replacement`` — U+FFFD count (decode gave up entirely; this
    package's readers decode with errors='replace' by design, so FFFD
    marks true byte damage). Ratio ``moji_ppm`` is per-character,
    integer-exact. Verdict: ``mojibake`` (signatures present — the
    text is REPAIRABLE, re-encode cp1252→utf-8), ``decode_loss``
    (only FFFD — unrepairable), else ``clean``.

    Pure projection — zero shuffles at any scale; NULL text is the
    empty document.
    """
    t = "coalesce(text, '')"
    total = " + ".join(_count_literal_sql(t, s) for s in MOJIBAKE_SIGS)
    return documents.select(
        "doc_id",
        F.expr(f"({total})").cast("long").alias("n_mojibake"),
        F.expr(_count_literal_sql(t, "�")).cast("long").alias(
            "n_replacement"
        ),
        F.expr(f"length({t})").cast("long").alias("n_chars"),
        F.expr(
            f"(1000000 * ({total})) DIV greatest(length({t}), 1)"
        ).cast("long").alias("moji_ppm"),
        F.expr(
            f"CASE WHEN ({total}) > 0 THEN 'mojibake' "
            f"WHEN {_count_literal_sql(t, chr(0xFFFD))} > 0 "
            "THEN 'decode_loss' ELSE 'clean' END"
        ).alias("verdict"),
    )


# language-agnostic code keywords: frequent across C/Java/JS/Python/Go/
# Rust, essentially absent from prose (counted as whitespace-delimited
# exact tokens, so 'return' in "return policy" still hits — accepted
# noise the symbol channels dominate away)
CODE_KEYWORDS = (
    "def return import class function var const if else for while "
    "void int public static struct fn let"
).split()


def code_score(documents: DataFrame) -> DataFrame:
    """Code-vs-prose routing signal — the deterministic half of the
    StarCoder/CodeParrot ingestion split (code-looking crawl documents
    route to a code pipeline, prose to the text pipeline; the ML
    language-classifier that follows is a model plug-point like the
    CLIP/OCR boundaries here).

    Channels, all integer-exact per-mille densities over characters or
    lines:

    - ``sym_permille`` — ``{}();=`` + ``[]`` symbol characters per
      1000 chars (prose ≈ 0-5, code ≈ 30-120);
    - ``kw_per_10k`` — exact-token hits from a fixed cross-language
      keyword list per 10k whitespace tokens;
    - ``indent_permille`` — lines starting with 2+ spaces or a tab per
      1000 lines (the Python/YAML channel braces cannot see);
    - ``comment_permille`` — lines starting ``//`` ``#`` ``/*`` ``*``
      per 1000 lines.

    Verdict ``is_code``: symbol density ≥ 30‰ OR (keywords ≥ 50/10k AND
    (indent ≥ 200‰ OR symbols ≥ 10‰)) — thresholds from eyeballing the
    published StarCoder heuristics (their exact filter stack is
    per-language; this is the routing gate before language is known).

    Pure projection — zero shuffles; NULL text = empty document, all
    zeros, not code.
    """
    t = "coalesce(text, '')"
    sym = (
        f"length({t}) - length(translate({t}, '{{}}();=[]', ''))"
    )
    toks = f"size(filter(split(trim({t}), '\\\\s+'), x -> x <> ''))"
    kw_in = ", ".join(f"'{k}'" for k in CODE_KEYWORDS)
    kw = (
        f"size(filter(split(trim({t}), '\\\\s+'), x -> x IN ({kw_in})))"
    )
    lines = f"filter(split({t}, '\\n'), l -> trim(l) <> '')"
    indent = (
        f"size(filter({lines}, l -> l LIKE '  %' OR l LIKE '\\t%'))"
    )
    comment = (
        f"size(filter({lines}, l -> startswith(ltrim(l), '//')"
        " OR startswith(ltrim(l), '#') OR startswith(ltrim(l), '/*')"
        " OR startswith(ltrim(l), '* ')))"
    )
    n_lines = f"size({lines})"
    return documents.select(
        "doc_id",
        F.expr(f"({sym})").cast("long").alias("n_sym"),
        F.expr(
            f"(1000 * ({sym})) DIV greatest(length({t}), 1)"
        ).cast("long").alias("sym_permille"),
        F.expr(
            f"(10000 * ({kw})) DIV greatest({toks}, 1)"
        ).cast("long").alias("kw_per_10k"),
        F.expr(
            f"(1000 * ({indent})) DIV greatest({n_lines}, 1)"
        ).cast("long").alias("indent_permille"),
        F.expr(
            f"(1000 * ({comment})) DIV greatest({n_lines}, 1)"
        ).cast("long").alias("comment_permille"),
    ).withColumn(
        "is_code",
        F.expr(
            "sym_permille >= 30 OR (kw_per_10k >= 50"
            " AND (indent_permille >= 200 OR sym_permille >= 10))"
        ),
    )


def doc_features(documents: DataFrame) -> DataFrame:
    """Assemble the per-document quality feature table — the doc-level
    sibling of ``web.host_features`` and the input a quality classifier
    actually trains on (FineWeb-Edu / DCLM style: a wide panel of cheap
    deterministic signals feeding a learned keep-score): token mass,
    punctuation/stopword ratios, predicted language, the Gopher and
    repetition keep verdicts, encoding damage, code-likeness, and the
    KN-LM surprisal.

    Missing-channel defaults are dtype-driven (ints 0, doubles 0.0,
    booleans false, strings '') so the table is dense — every signal
    here emits one row per document by contract, but the defaults make
    the assembly robust to a channel that drops rows.

    Scale shape: each channel is one projection/aggregation over the
    same documents scan, joined back on ``doc_id`` — one co-partitioned
    exchange family (bucket the store by doc_id and rebuilds are
    exchange-free). A consumer that needs a single-pass variant can
    inline the channel projections into one select; the factored form
    is kept because every channel is individually oracle-pinned.
    """
    t = token_stats(documents).select("doc_id", "n_tokens")
    q = quality_score(documents).select(
        "doc_id", "punct_ratio", "stopword_ratio"
    )
    lg = lang_id(documents).select("doc_id", "pred_lang")
    g = gopher_filter(documents).select(
        "doc_id", F.col("keep").alias("gopher_keep")
    )
    r = repetition_filter(documents).select(
        "doc_id", F.col("keep").alias("rep_keep")
    )
    m = mojibake_stats(documents).select(
        "doc_id", "moji_ppm", F.col("verdict").alias("moji_verdict")
    )
    c = code_score(documents).select("doc_id", "sym_permille", "is_code")
    k = kn_score(documents).select("doc_id", "avg_bits_q6", "n_oov")
    s = slop_score(documents).select(
        "doc_id", "n_slop_hits", F.col("is_suspect").alias("slop_suspect")
    )
    out = t
    for rel in (q, lg, g, r, m, c, k, s):
        out = out.join(rel, "doc_id", "left")
    defaults = {
        "bigint": F.lit(0).cast("long"),
        "int": F.lit(0),
        "double": F.lit(0.0),
        "boolean": F.lit(False),
        "string": F.lit(""),
    }
    return out.select(
        *[
            F.coalesce(F.col(name), defaults[dtype]).alias(name)
            if name != "doc_id" and dtype in defaults
            else F.col(name)
            for name, dtype in out.dtypes
        ]
    )


# assistant-voice phrase catalogue: high-precision markers of LLM-
# generated text leaking into post-2023 crawls (the contamination class
# corpus curators now filter alongside spam; phrases chosen for near-
# zero base rate in human web text, all lowercase — counted on
# lowercased text)
SLOP_PHRASES = (
    "as an ai language model",
    "as a large language model",
    "i cannot fulfill that request",
    "i cannot fulfill this request",
    "as of my last knowledge update",
    "i don't have access to real-time",
    "it's important to note that",
    "it is important to note that",
    "i hope this email finds you well",
    "certainly! here",
    "delve into the",
    "in the ever-evolving landscape of",
    "in today's fast-paced world",
    "unleash the power of",
    "embark on a journey",
)


def slop_score(documents: DataFrame) -> DataFrame:
    """LLM-contamination signal per document — the newest member of the
    crawl-cleaning gate family: post-2023 crawls carry machine-generated
    pages (SEO farms piping chat models), and pretraining on them is
    self-distillation on slop. The deterministic tier is a
    high-precision assistant-voice phrase catalogue (the same
    literal-replace counting as :func:`mojibake_stats` — no regex
    dialect in play, lowercased text) plus a per-10k-token rate; an ML
    detector (Binoculars-style perplexity contrast) is a model
    plug-point beyond it, like the CLIP/OCR boundaries here.

    Output: ``n_slop_hits`` (total catalogue occurrences),
    ``n_phrases`` (distinct catalogue entries present — many distinct
    markers is stronger evidence than one repeated), ``slop_per_10k``
    (integer hits per 10k whitespace tokens), and ``is_suspect``
    (any assistant-voice hit at all — the catalogue is precision-tuned,
    so one hit is already signal).

    Pure projection — zero shuffles; NULL text is the empty document.
    """
    t = "lower(coalesce(text, ''))"
    counts = [_count_literal_sql(t, p) for p in SLOP_PHRASES]
    total = " + ".join(f"({c})" for c in counts)
    distinct = " + ".join(
        f"(CASE WHEN ({c}) > 0 THEN 1 ELSE 0 END)" for c in counts
    )
    toks = f"size(filter(split(trim({t}), '\\\\s+'), x -> x <> ''))"
    return documents.select(
        "doc_id",
        F.expr(f"({total})").cast("long").alias("n_slop_hits"),
        F.expr(f"({distinct})").cast("long").alias("n_phrases"),
        F.expr(
            f"(10000 * ({total})) DIV greatest({toks}, 1)"
        ).cast("long").alias("slop_per_10k"),
        F.expr(f"({total}) > 0").alias("is_suspect"),
    )


def vocab_spectrum(documents: DataFrame) -> DataFrame:
    """Corpus vocabulary frequency spectrum — the Zipf/Heaps diagnostic
    a tokenizer/corpus report leads with (how heavy is the head, how
    long is the hapax tail): token frequencies bucketed by
    ``floor(log2(freq))``, one row per occupied bucket with the type
    count and total token mass it holds.

    ``floor(log2(n))`` is ``length(bin(n)) - 1`` — the same log-free
    integer trick as :func:`kn_score`, so bucket edges are bit-identical
    across engines. Output per bucket: ``bucket`` (log2 floor),
    ``min_freq`` = 2^bucket, ``n_types`` (distinct tokens whose
    frequency lands in the bucket), ``n_tokens`` (their summed
    occurrences), and ``type_share_ppm`` / ``token_share_ppm`` against
    the corpus totals — ~log2(corpus) rows total, a bounded relation
    whatever the corpus size.

    Scale shape (10^12 docs): one explode to the token stream, one
    map-side-combined token count, one ~40-row bucket rollup, and a
    scalar totals broadcast — the classic two-level aggregation; no
    window over anything unbounded.
    """
    toks = documents.select(
        F.explode(
            F.expr(f"filter(split({NORM}, ' '), t -> t <> '')")
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    spec = (
        freq.select(
            F.expr("length(bin(c)) - 1").cast("long").alias("bucket"),
            "c",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
    )
    totals = spec.agg(
        F.sum("n_types").alias("tt"), F.sum("n_tokens").alias("tk")
    )
    return spec.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.expr("CAST(pow(2, bucket) AS BIGINT)").alias("min_freq"),
        "n_types",
        "n_tokens",
        F.expr("(1000000 * n_types) DIV tt").cast("long").alias(
            "type_share_ppm"
        ),
        F.expr("(1000000 * n_tokens) DIV tk").cast("long").alias(
            "token_share_ppm"
        ),
    )


def readability(documents: DataFrame) -> DataFrame:
    """Flesch–Kincaid readability, integer-exact — the FineWeb-Edu-family
    "educational level" axis computed deterministically (their actual
    classifier is an ML plug-point; this is the classic closed-form
    proxy it is calibrated against).

    Counting rules (shared verbatim with the DuckDB oracle):

    - words: whitespace tokens (the module-wide convention);
    - sentences: maximal runs of ``[.!?]`` — runs are collapsed to one
      ``chr(1)`` sentinel and counted by length difference, so
      ``"Hi!! Ok?"`` is 2 sentences, an ellipsis 1;
    - syllables: per word, maximal ``[aeiouy]`` vowel runs in the
      lowercased token, floored at 1 (numbers/punct tokens count 1) —
      the standard heuristic (silent-e refinements deliberately out:
      every refinement is Anglocentric guesswork, and both engines must
      agree bit-for-bit).

    Scores are floored-integer x100 fixed point built ONLY from
    positive-operand ``DIV`` (negative integer division floors vs
    truncates differently across engines):

    - ``fk_x100``  = 39·(w/s) + 1180·(syl/w) − 1559
    - ``fre_x100`` = 20684 − 203·w/(2·s) − 8460·(syl/w)

    Empty documents score 0 with band ``'empty'`` (dense dtype-driven
    defaults, like doc_features). Pure projection — zero shuffles, scales
    as a map stage.
    """
    # pre-existing U+0001 bytes would collide with the sentinel (counted
    # as sentence boundaries and vowel groups) — strip them first, in
    # both engines
    t = "replace(coalesce(text, ''), chr(1), '')"
    # maximal [.!?]+ runs -> chr(1) sentinels, counted by length delta
    se = f"regexp_replace({t}, '[.!?]+', chr(1))"
    n_sent = f"(length({se}) - length(replace({se}, chr(1), '')))"
    words = f"filter(split(trim(lower({t})), '\\\\s+'), x -> x <> '')"
    vg = (
        "greatest(1, length(regexp_replace(w, '[aeiouy]+', chr(1)))"
        " - length(replace(regexp_replace(w, '[aeiouy]+', chr(1)),"
        " chr(1), '')))"
    )
    syl = (
        f"aggregate(transform({words}, w -> {vg}),"
        " 0L, (acc, x) -> acc + x)"
    )
    base = documents.select(
        "doc_id",
        F.expr(f"size({words})").cast("long").alias("n_words"),
        F.expr(n_sent).cast("long").alias("n_sentences"),
        F.expr(syl).cast("long").alias("n_syllables"),
    )
    s_eff = "greatest(n_sentences, 1)"
    w_eff = "greatest(n_words, 1)"
    fk = (
        f"(39 * n_words) DIV {s_eff}"
        f" + (1180 * n_syllables) DIV {w_eff} - 1559"
    )
    fre = (
        f"20684 - (203 * n_words) DIV (2 * {s_eff})"
        f" - (8460 * n_syllables) DIV {w_eff}"
    )
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(f"(100 * n_words) DIV {s_eff}")
        .cast("long")
        .alias("wps_x100"),
        F.expr(f"(100 * n_syllables) DIV {w_eff}")
        .cast("long")
        .alias("spw_x100"),
        F.expr(f"CASE WHEN n_words = 0 THEN 0 ELSE {fk} END")
        .cast("long")
        .alias("fk_x100"),
        F.expr(f"CASE WHEN n_words = 0 THEN 0 ELSE {fre} END")
        .cast("long")
        .alias("fre_x100"),
        F.expr(
            "CASE WHEN n_words = 0 THEN 'empty' "
            f"WHEN {fk} < 600 THEN 'basic' "
            f"WHEN {fk} < 1200 THEN 'intermediate' "
            "ELSE 'advanced' END"
        ).alias("band"),
    )


def shard_manifest(
    documents: DataFrame, budget_tokens: int = 20000, num_partitions: int = 0
) -> DataFrame:
    """Per-shard completion/lineage manifest over :func:`pack_shards` —
    the sidecar row a resumable 100 TB packing job writes when a shard
    closes (the north-star contract: "per-partition completion manifests
    plus lineage/metrics rows", the same role the extraction kernel's
    partition manifest plays in sources/catalog.py).

    Per shard: doc count, token mass, the [first_doc_id, last_doc_id]
    lineage span (packing is contiguous in doc_id order, so the span IS
    the resume cursor), the global token_start offset, and
    ``content_sha256`` — sha256 over the shard's per-document digests
    ``md5(doc_id ':' text)`` concatenated in sorted order. Sorting makes
    the digest order-insensitive, so a restarted run that reassembles the
    same shard from differently-ordered partitions still produces the
    identical manifest row — digest equality is the exactly-once check.

    Scale shape: the per-doc digest is a zero-shuffle projection, the
    shard rollup one hash join (doc_id, co-partitioned with the packing
    output) + one groupBy whose groups are budget-bounded (a shard holds
    ~budget_tokens of text, so collect_list stays small regardless of
    corpus size)."""
    packed = pack_shards(documents, budget_tokens, num_partitions)
    digests = documents.select(
        "doc_id",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.coalesce("text", F.lit("")),
            )
        ).alias("doc_digest"),
    )
    return (
        packed.join(digests, "doc_id")
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
            F.min("token_offset").cast("long").alias("token_start"),
            F.sha2(
                F.array_join(F.array_sort(F.collect_list("doc_digest")), ""),
                256,
            ).alias("content_sha256"),
        )
    )


def lexical_diversity(documents: DataFrame, window: int = 100) -> DataFrame:
    """Type-token ratio lexical diversity, doc-level — the classic
    low-diversity screen (keyword-stuffed doorway pages, boilerplate
    listings, generated spam score far below prose on TTR; the MTLD
    refinement needs sequential segmentation and buys little at the
    filter stage).

    Because raw TTR collapses with document length, the headline number
    is computed over the FIRST ``window`` tokens (the standard
    fixed-window correction) alongside the full-document ratio. Types
    are exact lowercase whitespace tokens (module convention —
    punctuation variants count as distinct types, documented heuristic).
    Integer per-mille outputs, positive-operand DIV only. Pure
    projection: zero shuffles, scales as a map stage."""
    if window < 1:
        raise ValueError(f"window ({window}) must be >= 1")
    t = "coalesce(text, '')"
    words = f"filter(split(trim(lower({t})), '\\\\s+'), x -> x <> '')"
    base = documents.select(
        "doc_id",
        F.expr(f"size({words})").cast("long").alias("n_words"),
        F.expr(f"size(array_distinct({words}))").cast("long").alias("n_types"),
        F.expr(f"size(array_distinct(slice({words}, 1, {window})))")
        .cast("long")
        .alias("n_types_w"),
    )
    return base.select(
        "doc_id",
        "n_words",
        "n_types",
        F.expr("(1000 * n_types) DIV greatest(n_words, 1)")
        .cast("long")
        .alias("ttr_x1000"),
        "n_types_w",
        F.expr(
            f"(1000 * n_types_w) DIV greatest(least(n_words, {window}), 1)"
        )
        .cast("long")
        .alias("ttr_w_x1000"),
    )


def lang_audit(documents: DataFrame) -> DataFrame:
    """Declared-vs-predicted language audit — the label-QA pass a
    multilingual corpus runs before trusting its ``lang`` column
    (CommonCrawl's declared languages come from CLD2 over sometimes
    boilerplate-dominated pages; mislabels poison per-language quality
    thresholds and sampling quotas downstream).

    Verdicts: ``match`` (prediction = declared), ``mismatch``
    (confident disagreement), ``undetermined`` (the stopword detector
    saw nothing — short/empty/out-of-model text; NOT evidence against
    the label), ``unlabeled`` (no declared lang). One zero-shuffle
    projection re-using :func:`lang_id`'s scoring columns."""
    base = _nn_text(documents).select(
        "doc_id",
        F.coalesce(F.col("lang"), F.lit("")).alias("declared_lang"),
        *lang_hit_cols(),
    )
    scored = base.select(
        "doc_id",
        "declared_lang",
        F.expr(lang_pred_sql()).alias("pred_lang"),
    )
    return scored.select(
        "doc_id",
        "declared_lang",
        "pred_lang",
        F.expr(
            "CASE WHEN declared_lang = '' THEN 'unlabeled' "
            "WHEN pred_lang = 'und' THEN 'undetermined' "
            "WHEN pred_lang = declared_lang THEN 'match' "
            "ELSE 'mismatch' END"
        ).alias("verdict"),
    )


def bpe_fertility(documents: DataFrame, n_merges: int = 6) -> DataFrame:
    """Per-language tokenizer fertility — BPE tokens per whitespace word
    by declared language: the multilingual tokenizer-QA table (a
    language whose fertility runs far above the corpus mean is
    under-served by the learned merges, pays more compute per word, and
    hits context limits sooner — the standard argument for rebalancing
    BPE training data).

    Rides :func:`bpe_apply` (train-then-count on this corpus) and adds
    one lang-keyed map-side-combined groupBy; ``fertility_x100`` =
    ``100·Σbpe / Σwords`` floored (positive operands only)."""
    per_doc = bpe_apply(documents, n_merges)
    joined = per_doc.join(
        documents.select(
            "doc_id", F.coalesce(F.col("lang"), F.lit("")).alias("lang")
        ),
        "doc_id",
    )
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_bpe_tokens").cast("long").alias("total_bpe"),
    ).select(
        "lang",
        "n_docs",
        "total_words",
        "total_bpe",
        F.expr("(100 * total_bpe) DIV greatest(total_words, 1)")
        .cast("long")
        .alias("fertility_x100"),
    )


def mix_sample(
    documents: DataFrame,
    epoch_docs: int = 100_000,
    salt: str = "s0",
    n_buckets: int = 4096,
) -> DataFrame:
    """Materialize one epoch of the temperature-scaled mix — the step
    after :func:`domain_mix_weights` computes quotas: per source, the
    ``sample_quota`` documents with the smallest deterministic hash keys
    are kept (reproducible across runs/engines/partitionings — the same
    md5-key scheme as :func:`hash_sample`).

    Output one row per document: ``doc_id, source, keep``
    (flags-not-filters). NULL sources fold to the '' group BEFORE
    everything (a NULL key would silently vanish in the quota equi-join
    — NULL never equals NULL — breaking the one-row-per-document
    contract).

    Scale shape — two-pass quota-threshold selection, NOT a per-source
    corpus rank: an exact ``row_number() OVER (PARTITION BY source)``
    with a quota-*column* filter defeats ``WindowGroupLimit`` pushdown,
    so every document of a source would flow through one reducer for a
    full sort (with a handful of sources over 10^12 rows that task IS
    the job). Instead:

    1. histogram pass: the 32-bit key space is cut into ``n_buckets``
       equal ranges; one map-side-combined ``(source, bucket)`` groupBy
       yields per-bucket counts (≤ sources × n_buckets rows);
    2. threshold: a cumulative sum over that *bounded* relation finds,
       per source, the single boundary bucket where the running count
       crosses the quota — every lower bucket is wholly kept, every
       higher one wholly dropped;
    3. refine: only the boundary bucket (an expected 1/n_buckets slice
       of its source) is exactly ranked by ``(hk, doc_id)``.

    The bucket-verdict relation is broadcast back onto the corpus (a
    map-side join; bounded by sources × n_buckets — at very large
    domain counts lower ``n_buckets`` or drop the broadcast hint). The
    kept set is bit-identical to the rank formulation: bucket order
    refines ``hk`` order, so "quota smallest ``(hk, doc_id)``" is
    preserved exactly."""
    documents = documents.withColumn(
        "source", F.coalesce(F.col("source"), F.lit(""))
    )
    quotas = domain_mix_weights(documents, epoch_docs).select(
        "source", "sample_quota"
    )
    width = (1 << 32) // n_buckets
    keyed = documents.select(
        "doc_id", "source", _hash_key(salt).alias("hk")
    ).withColumn("bucket", F.expr(f"hk DIV {width}").cast("long"))
    bcounts = keyed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wsrc = Window.partitionBy("source").orderBy("bucket")
    verdicts = (
        bcounts.withColumn("cum_after", F.sum("cnt").over(wsrc))
        .withColumn("cum_before", F.col("cum_after") - F.col("cnt"))
        .join(quotas, "source")
        .select(
            "source",
            "bucket",
            "cum_before",
            "sample_quota",
            F.expr(
                "CASE WHEN cum_after <= sample_quota THEN 'all'"
                " WHEN cum_before >= sample_quota THEN 'none'"
                " ELSE 'boundary' END"
            ).alias("verdict"),
        )
    )
    tagged = keyed.join(F.broadcast(verdicts), ["source", "bucket"])
    clear = tagged.where("verdict <> 'boundary'").select(
        "doc_id", "source", (F.col("verdict") == "all").alias("keep")
    )
    wb = Window.partitionBy("source", "bucket").orderBy("hk", "doc_id")
    boundary = (
        tagged.where("verdict = 'boundary'")
        .withColumn("rk", F.row_number().over(wb).cast("long"))
        .select(
            "doc_id",
            "source",
            (F.col("cum_before") + F.col("rk") <= F.col("sample_quota")).alias(
                "keep"
            ),
        )
    )
    return clear.unionByName(boundary)


def quality_grid(documents: DataFrame) -> DataFrame:
    """Filter-interaction grid over :func:`doc_features` — the dashboard
    a funnel tuner reads before ordering/thresholding gates: how many
    documents fall in each combination of the boolean quality verdicts
    (Gopher × repetition × code × LLM-slop). Near-perfectly correlated
    gates are redundant (drop one, save a corpus pass); anti-correlated
    ones flag different failure modes and must both stay.

    One map-side-combined groupBy over 16 possible keys on top of the
    feature panel; the corpus total is a window sum OVER the grouped
    counts (≤16 rows through one reducer), so the expensive feature
    lineage — including the KN-score channel — is scanned exactly once
    instead of twice (once per aggregate branch)."""
    feats = doc_features(documents).select(
        "gopher_keep", "rep_keep", "is_code", "slop_suspect"
    )
    counts = feats.groupBy(
        "gopher_keep", "rep_keep", "is_code", "slop_suspect"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    counts = counts.withColumn(
        "n_total",
        F.sum("n_docs").over(Window.partitionBy()).cast("long"),
    )
    return counts.select(
        "gopher_keep",
        "rep_keep",
        "is_code",
        "slop_suspect",
        "n_docs",
        F.expr("(1000 * n_docs) DIV n_total").cast("long").alias(
            "share_permille"
        ),
    )
