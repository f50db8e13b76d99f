"""Web-corpus curation operators: URL canonicalization/dedup, benchmark
decontamination, PII detection/redaction.

These are the remaining webtext-pipeline passes a Common-Crawl-scale
training-data build runs between extraction and tokenization (the
CCNet / RefinedWeb / Dolma curation family). Everything is pure
DataFrame API — JVM-side, whole-stage-codegen friendly, no Python UDFs —
and every regex/array expression is written in the dialect subset where
Spark (Java regex) and DuckDB (RE2) behave identically, so the driver's
value-hash oracle validates values, not just shapes.

Scale notes (100 TB / 10^12 docs):

* URL dedup is a single hash groupBy on the canonical URL — map-side
  partial aggregation, no join, no broadcast. The canonical URL is also
  the natural bucketing key for the output table.
* Decontamination joins the corpus gram stream against the *benchmark*
  gram set. The benchmark side is small in production (a few hundred
  eval sets) but is still joined with a plain shuffle join here — never
  broadcast blindly — so a pathological benchmark list cannot OOM
  executors; AQE will pick a broadcast automatically when the side is
  genuinely tiny.
* PII counting/redaction is per-row projection work: zero shuffles.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .text_analysis import NORM, _trunc6

# --- deterministic fixtures ----------------------------------------------------
#
# The synthetic documents table has no URL or PII columns, so the driver
# queries synthesize them deterministically FROM doc_id with a SQL
# fragment that parses identically in Spark and DuckDB (verified: CASE /
# concat int-coercion / LIKE all agree byte-for-byte). Both engines build
# the same inputs, so the oracle still validates the operator itself.

SYNTH_URL_SQL = (
    "concat("
    "CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'HTTPS://' END, "
    "CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END, "
    "'Site', cast(doc_id % 50 as int), '.Example.com', "
    "CASE WHEN doc_id % 4 = 0 THEN ':80' WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END, "
    "'/Path/', cast(doc_id % 20 as int), "
    "CASE WHEN doc_id % 13 = 0 THEN '/casino' "
    "WHEN doc_id % 17 = 0 THEN '/spamlinks' ELSE '' END, "
    "CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END, "
    "CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&b=2&a=1' "
    "WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '' END, "
    "CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)"
)

# URL synth for domain_parts: varied suffix shapes (multi-level ccTLD,
# deep subdomains, bare com.au, IPv4 literal, single label, www+port)
SYNTH_DOMAIN_URL_SQL = (
    "CASE cast(doc_id % 6 as int) "
    "WHEN 0 THEN 'https://news.bbc.co.uk/p' "
    "WHEN 1 THEN concat('https://a.b.example', cast(doc_id % 40 as int), '.com/p') "
    "WHEN 2 THEN concat('https://example', cast(doc_id % 40 as int), '.com.au/p') "
    "WHEN 3 THEN concat('https://10.0.', cast(doc_id % 250 as int), '.7/p') "
    "WHEN 4 THEN 'https://localhost/p' "
    "ELSE concat('https://www.shop', cast(doc_id % 40 as int), '.co.jp:443/p') END"
)

SYNTH_PII_TEXT_SQL = (
    "concat(text, "
    "CASE WHEN doc_id % 7 = 0 THEN concat(' Contact user', "
    "cast(doc_id as int), '@example.com for details.') ELSE '' END, "
    "CASE WHEN doc_id % 9 = 0 THEN ' Call 555-867-5309 or +1 415-555-0199.' "
    "ELSE '' END, "
    "CASE WHEN doc_id % 11 = 0 THEN concat(' Origin host 10.0.', "
    "cast(doc_id % 256 as int), '.7 logged.') ELSE '' END)"
)

# Host + templated-page decoration for the template_strip driver query:
# 20 synthetic hosts, each page wrapped in a host-specific nav header and
# copyright footer (template on 100% of the host's pages), plus a
# newsletter line on 20% of pages (below the 50% threshold — must be
# KEPT). chr(10) is the newline in both dialects; Spark string literals
# would eat a backslash-n differently than DuckDB's.
SYNTH_HOST_SQL = "concat('site', cast(doc_id % 20 as int), '.com')"

SYNTH_TEMPLATED_TEXT_SQL = (
    "concat("
    "'Home | About | Contact', chr(10), "
    "'News from site', cast(doc_id % 20 as int), chr(10), "
    "coalesce(text, ''), chr(10), "
    "CASE WHEN doc_id % 5 = 0 THEN concat('Subscribe to our newsletter', "
    "chr(10)) ELSE '' END, "
    "'Copyright site', cast(doc_id % 20 as int), ' 2026')"
)


# --- URL canonicalization -----------------------------------------------------

# Tracking parameters stripped by the canonicalizer (the usual suspects;
# every predicate is a LIKE so Spark and DuckDB agree byte-for-byte).
# 'utm_' is matched with substring, not LIKE: LIKE's '_' is a one-char
# wildcard, so LIKE 'utm_%' would also strip legitimate params such as
# 'utmost=...' (and escape syntax differs between the engines).
TRACKING_PARAM_PREDICATE = (
    "p <> '' AND substring(p, 1, 4) <> 'utm_' AND p NOT LIKE 'gclid=%' "
    "AND p NOT LIKE 'fbclid=%' AND p NOT LIKE 'ref=%'"
)

# Regexes shared verbatim with the DuckDB oracle. Bracket classes ([?])
# instead of backslash escapes: Spark SQL string literals eat backslashes,
# DuckDB's don't — bracket classes sidestep the divergence entirely.
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
# host from a CANONICAL url, scheme-less forms included ('siteA.com/x',
# '//cdn.com/x') — without this, every scheme-less page lands in one ''
# host bucket and host_cap rations unrelated hosts against each other
_ANY_HOST_RE = "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?://)?([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# query starts at the first '?' BEFORE any fragment: '[?]([^#]*)' alone
# would match a '?' living inside the fragment ('http://h/p#a?b=1' has no
# query) and resurrect fragment content into the canonical form
_QUERY_RE = "^[^#?]*[?]([^#]*)"


def canonical_url_col(url_col: str = "url"):
    """Canonical form of a URL column, as a single JVM-side expression.

    Rules (the RefinedWeb/CCNet-style normalization set):
    scheme and host lowercased; ``www.`` prefix dropped; default ports
    (``:80`` http, ``:443`` https) dropped; fragment dropped; tracking
    params (utm_*/gclid/fbclid/ref) dropped; surviving query params
    sorted; empty path → ``/``; trailing slash trimmed (except root).
    Path case is preserved (paths are case-sensitive per RFC 3986).
    """
    return F.expr(_canonical_url_sql(url_col))


def _canonical_url_sql(url_col: str = "url") -> str:
    u = f"trim({url_col})"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({u}, '{_HOST_RE}', 1))"
    host0 = (
        f"CASE WHEN {hostport} LIKE 'www.%' THEN substring({hostport}, 5) "
        f"ELSE {hostport} END"
    )
    host = (
        f"CASE WHEN {scheme} = 'http' AND {host0} LIKE '%:80' "
        f"THEN left({host0}, length({host0}) - 3) "
        f"WHEN {scheme} = 'https' AND {host0} LIKE '%:443' "
        f"THEN left({host0}, length({host0}) - 4) "
        f"ELSE {host0} END"
    )
    path0 = f"regexp_extract({u}, '{_PATH_RE}', 1)"
    path1 = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    path = (
        f"CASE WHEN {path1} <> '/' AND {path1} LIKE '%/' "
        f"THEN left({path1}, length({path1}) - 1) ELSE {path1} END"
    )
    q = (
        f"array_join(array_sort(filter(split(regexp_extract({u}, '{_QUERY_RE}', 1), "
        f"'&'), p -> {TRACKING_PARAM_PREDICATE})), '&')"
    )
    # scheme-less / protocol-relative URLs ('example.com/a', '//cdn.com/x')
    # don't match the component regexes — without this fallback they all
    # collapse to ':///' and dedup/host-cap treat them as one URL
    return (
        f"CASE WHEN {scheme} = '' THEN {u} ELSE "
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {q} <> '' THEN concat('?', {q}) ELSE '' END) END"
    )


def host_col(url_col: str = "url"):
    """Canonical HOST bucket of a URL column — the one shared expression
    ``host_cap`` and ``host_stats`` key on (and the DuckDB twins mirror).

    Schemed URLs already lose ``www.``/default ports inside the
    canonical form; scheme-less URLs ride the raw passthrough, so the
    normalization re-applies here — 'www.site.com/x', 'site.com:80/y'
    and 'http://www.site.com/x' must all share one cap bucket."""
    curl = f"({_canonical_url_sql(url_col)})"
    h0 = f"lower(regexp_extract({curl}, '{_ANY_HOST_RE}', 1))"
    h1 = (
        f"CASE WHEN {h0} LIKE 'www.%' THEN substring({h0}, 5) "
        f"ELSE {h0} END"
    )
    return F.expr(
        f"CASE WHEN {h1} LIKE '%:80' THEN left({h1}, length({h1}) - 3) "
        f"WHEN {h1} LIKE '%:443' THEN left({h1}, length({h1}) - 4) "
        f"ELSE {h1} END"
    )


def url_dedup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-level exact dedup after canonicalization.

    One hash groupBy on the canonical URL (map-side combine; the grouping
    key is the output table's bucketing key at scale). ``keep_doc_id`` is
    the deterministic survivor (min doc_id — in production min warc_ts,
    same shape)."""
    return (
        pages.withColumn("canonical_url", canonical_url_col(url_col))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def latest_capture(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Recrawl dedup: keep the NEWEST capture of each canonical URL.

    Common-Crawl-style corpora carry one row per (url, fetch time); a
    training build keeps the latest capture (content supersedes), unlike
    ``url_dedup``'s min-doc_id convention. The survivor is picked with a
    single struct-max aggregate — ``max(struct(ts, -doc_id))`` — i.e. one
    groupBy with O(1) aggregation state and map-side partial combine.
    Struct agg buffers are not hash-agg mutable, so Spark plans a
    SortAggregate — but the partial_max still runs BEFORE the exchange,
    so only one combined row per (partition, url) shuffles and the final
    sort sees pre-combined rows; at 10^12 rows this still beats the
    window-rank formulation, which must shuffle and sort EVERY capture
    inside each url partition. Ties on the timestamp break
    deterministically to the LOWEST doc_id.

    Returns (canonical_url, keep_doc_id, last_ts, first_ts, n_captures).
    """
    pick = F.max(
        F.struct(
            F.col(ts_col).alias("ts"), (-F.col("doc_id")).alias("nid")
        )
    )
    return (
        pages.withColumn("canonical_url", canonical_url_col(url_col))
        .groupBy("canonical_url")
        .agg(
            pick.alias("p"),
            F.min(ts_col).alias("first_ts"),
            F.count(F.lit(1)).alias("n_captures"),
        )
        .select(
            "canonical_url",
            (-F.col("p.nid")).cast("long").alias("keep_doc_id"),
            F.col("p.ts").alias("last_ts"),
            "first_ts",
            "n_captures",
        )
    )


def extract_incremental(
    pages: DataFrame,
    prior: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Incremental-extraction pre-filter: pages whose (url, content hash)
    is NOT in a prior snapshot — only new or changed pages reach the
    expensive extraction kernel on a recrawl.

    The hash is JVM-native ``sha2(text, 256)`` computed on both sides, and
    the skip test is a LEFT ANTI join on (url, content_hash). The prior
    snapshot is corpus-sized, so it is never broadcast (same discipline
    as decontamination above); the anti-join shuffles on the composite
    key, which is near-unique → no skew. At 100 TB this is the single
    cheapest pass in the pipeline relative to what it saves: unchanged
    pages cost one hash + one shuffle row instead of a full parse.

    Returns (doc_id, url, content_hash) for the pages to (re-)extract.
    """
    cur = pages.select(
        "doc_id",
        F.col(url_col).alias("url"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias(
            "content_hash"
        ),
    )
    prev = prior.select(
        F.col(url_col).alias("url"), F.col("content_hash")
    )
    return cur.join(prev, ["url", "content_hash"], "left_anti")


# --- host-level corpus shaping --------------------------------------------------

def _host_pick_rank(pages: DataFrame, url_col: str):
    """Shared per-host deterministic ordering for the host-keyed
    operators (``host_cap``, ``fetch_waves``): canonical host bucket +
    ``md5(doc_id)`` pick, ranked by one window over a host-hash shuffle.
    The pick is partition-invariant (NOT "first seen", which is
    scheduling-dependent); keeping it in one place means the two
    operators can never disagree on per-host order. Returns the
    (doc_id, host) frame with a 1-based ``rank`` column."""
    from pyspark.sql.window import Window

    with_host = pages.select(
        "doc_id",
        host_col(url_col).alias("host"),
        F.md5(F.col("doc_id").cast("string")).alias("pick"),
    )
    w = Window.partitionBy("host").orderBy("pick", "doc_id")
    return with_host.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "host", "rank"
    )


def host_cap(
    pages: DataFrame, url_col: str = "url", max_per_host: int = 10
) -> DataFrame:
    """Per-host document cap (RefinedWeb-style domain balancing).

    A handful of hosts dominate any crawl (Zipf); capping per-host
    membership keeps them from dominating the training mix. Survivors are
    the ``max_per_host`` lowest ``md5(doc_id)`` rows per host — a
    deterministic, partition-invariant pick (NOT "first seen", which is
    scheduling-dependent). One window over a host-hash shuffle; at 100 TB
    the hot-host skew is bounded because rank only needs each host's
    top-k maintained per partition before the merge (Spark's window
    TopK pushdown via rank filter).

    The host is taken from the CANONICAL url (www./default-port variants
    of one host must share a cap bucket). Returns (doc_id, host,
    host_rank) for survivors."""
    ranked = _host_pick_rank(pages, url_col)
    return ranked.where(F.col("rank") <= max_per_host).select(
        "doc_id", "host", F.col("rank").cast("long").alias("host_rank")
    )


# Substrings that disqualify a URL (the RefinedWeb/Dolma URL-filter shape:
# a curated blocklist of domains + path words). LIKE-only so both engines
# agree byte-for-byte.
URL_BLOCKLIST_PREDICATE = (
    "c LIKE '%casino%' OR c LIKE '%.xxx/%' OR c LIKE '%spam%' "
    "OR c LIKE '%tracker%' OR c LIKE '%malware%'"
)


# Multi-level public suffixes recognized by domain_parts — a disclosed
# DETERMINISTIC SUBSET of the Public Suffix List (the full PSL is a
# periodically-updated data file; production swaps this tuple for it —
# the expression shape is identical). Covers the high-traffic ccTLD
# second levels seen in crawl data.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.kr", "or.kr", "com.br", "com.cn",
    "com.mx", "co.in", "com.tr", "com.ar", "co.za", "com.sg", "com.tw",
)


def _domain_parts_sql(url_col: str = "url") -> str:
    """(host, subdomain, registered_domain, tld) as one JVM expression
    set — shared with the DuckDB twin via the same MULTI_SUFFIXES."""
    suffixes = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    host = f"__dp_host"
    ls = "__dp_labels"
    n = f"size({ls})"
    last1 = f"element_at({ls}, -1)"
    last2 = f"concat(element_at({ls}, -2), '.', {last1})"
    is_multi = f"({n} >= 2 AND array_contains(array({suffixes}), {last2}))"
    ns = f"CASE WHEN {is_multi} THEN 2 ELSE 1 END"  # suffix label count
    is_ip = f"{host} rlike '^[0-9]+(\\\\.[0-9]+){{3}}$'"
    reg = (
        f"CASE WHEN {host} = '' THEN '' "
        f"WHEN {is_ip} THEN {host} "
        f"WHEN {n} <= {ns} THEN {host} "
        f"ELSE array_join(slice({ls}, {n} - {ns}, {ns} + 1), '.') END"
    )
    sub = (
        f"CASE WHEN {host} = '' OR {is_ip} OR {n} <= {ns} + 1 THEN '' "
        f"ELSE array_join(slice({ls}, 1, {n} - {ns} - 1), '.') END"
    )
    tld = f"CASE WHEN {host} = '' OR {is_ip} THEN '' ELSE {last1} END"
    return reg, sub, tld


def domain_parts(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-document domain decomposition of the canonical host:
    ``registered_domain`` (the PSL "eTLD+1" — the key crawl pipelines
    actually cap/blocklist on: every subdomain of a spam site is one
    actor), ``subdomain``, and ``tld``. Multi-level public suffixes
    (``co.uk``-style) resolve via :data:`MULTI_SUFFIXES`; IPv4 literals
    keep the whole address as the registered domain with '' tld.

    Pure whole-stage-codegen projection over :func:`host_col` — zero
    shuffles/joins/Python, scan speed at any scale."""
    reg, sub, tld = _domain_parts_sql(url_col)
    return (
        pages.select(
            "doc_id",
            host_col(url_col).alias("__dp_host"),
        )
        .withColumn("__dp_labels", F.expr("split(__dp_host, '[.]')"))
        .select(
            "doc_id",
            F.col("__dp_host").alias("host"),
            F.expr(sub).alias("subdomain"),
            F.expr(reg).alias("registered_domain"),
            F.expr(tld).alias("tld"),
        )
    )


def host_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host crawl statistics: doc count, distinct canonical URLs,
    character mass. The crawl-ops rollup behind host capping / blocklist
    decisions (which hosts dominate the mix, which serve giant pages).

    One groupBy on the canonical host; all aggregates but the distinct
    count combine map-side. At 100 TB the host key is Zipf-skewed but the
    aggregation state per host is O(1) (AQE handles the reduce-side
    imbalance); nothing broadcasts or collects."""
    curl = canonical_url_col(url_col)
    with_host = pages.select(
        "doc_id",
        host_col(url_col).alias("host"),
        curl.alias("curl"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
    )
    return (
        with_host.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("curl").cast("long").alias("n_urls"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


def template_strip(
    pages: DataFrame, min_pct: int = 50, min_pages: int = 3
) -> DataFrame:
    """Per-host template-line removal (the CCNet / RefinedWeb host-level
    boilerplate pass): a trimmed line is *template* for a host when it
    occurs in at least ``min_pct`` percent of that host's pages (hosts
    with fewer than ``min_pages`` pages are exempt — no stable template
    signal). Every occurrence of a template line is stripped and each
    document is rebuilt from its surviving lines in original order.

    This is the host-keyed complement of the corpus-global
    ``dedup.line_dedup``: nav menus, cookie banners and footers repeat
    *within* a host long before they repeat often enough to trip a global
    threshold, and a global pass would also over-fire on legitimate prose
    quoted across unrelated sites. Threshold arithmetic is integer
    (``100 * n_docs >= min_pct * n_pages``) so Spark and the DuckDB
    oracle agree bit-for-bit.

    Input: ``(doc_id, host, text)``. Output: ``doc_id, clean_text,
    n_lines_kept, n_lines_dropped``.

    Scale shape (10^12 docs):

    * lines explode once via ``posexplode`` (rebuild order is data, no
      window function);
    * line document-frequency is a distinct + groupBy keyed on
      ``(host, line)`` — both map-side combined; viral lines are
      per-host keys, so skew is bounded by the largest single host, and
      the groupBy *output* is filtered to the template set before any
      join touches the line stream;
    * the per-host page count is one tiny aggregation (a row per host)
      joined into the candidate relation, never into the stream;
    * the ``LEFT ANTI`` join probes the line stream against the small
      template relation; nothing broadcasts the corpus, nothing
      collects;
    * rebuild is one groupBy(doc_id) over narrow (pos, line) structs
      with ``sort_array`` + ``array_join``.
    """
    # coalesce: split(NULL) is NULL and size(NULL) is -1 under non-ANSI
    # defaults — a NULL-text doc must count 0 lines
    arr = pages.select(
        "doc_id",
        "host",
        F.expr(
            "transform(filter(split(coalesce(text, ''), '\\n'),"
            " l -> trim(l) <> ''), l -> trim(l))"
        ).alias("ln"),
    )
    lines = arr.select("doc_id", "host", F.posexplode("ln").alias("pos", "line"))
    host_pages = arr.groupBy("host").agg(F.count(F.lit(1)).alias("n_pages"))
    # a line repeated inside one document counts ONCE toward its host
    # document frequency (self-repetition is repetition_filter's job),
    # but stripping removes every occurrence
    doc_freq = (
        lines.select("host", "line", "doc_id")
        .distinct()
        .groupBy("host", "line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    template = (
        doc_freq.join(host_pages, "host")
        .where(
            (F.col("n_pages") >= min_pages)
            & (F.col("n_docs") * 100 >= F.col("n_pages") * min_pct)
        )
        .select("host", "line")
    )
    kept = lines.join(template, ["host", "line"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.expr(
                "transform(sort_array(collect_list(struct(pos, line))),"
                " s -> s.line)"
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = arr.select("doc_id", F.size("ln").alias("n_lines_total"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        (F.coalesce("n_lines_total", F.lit(0)) - F.coalesce("n_lines_kept", F.lit(0)))
        .cast("long")
        .alias("n_lines_dropped"),
    )


def url_filter(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """URL blocklist filter over the canonical form.

    Pure projection + filter — pushed to the scan by Catalyst, zero
    shuffles. Returns (doc_id, canonical_url, keep)."""
    pred = URL_BLOCKLIST_PREDICATE.replace("c LIKE", "canonical_url LIKE")
    return pages.select(
        "doc_id", canonical_url_col(url_col).alias("canonical_url")
    ).withColumn("keep", ~F.expr(f"({pred})"))


# --- benchmark decontamination -------------------------------------------------

def decontaminate(
    documents: DataFrame,
    bench_source: str = "src0",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark-overlap decontamination (the GPT-3 §C / FLAN n-gram rule).

    Documents whose word-``n``-gram stream overlaps the benchmark set's
    gram set by ≥ ``threshold`` (by gram *instances*, so repeated leakage
    weighs more) are flagged contaminated. Production uses n=13 on real
    text; n=3 here because the synthetic corpus vocabulary is ~30 words
    (13-grams would never collide and the operator would be untested).

    Scale shape: the corpus side is one explode → one shuffle join on the
    gram value → one groupBy(doc_id). The benchmark gram set is DISTINCT
    (tiny in production: eval sets, not corpora) and joined with a plain
    shuffle join — AQE promotes it to broadcast when genuinely small. The
    per-doc totals come from the documents table directly (no join back
    through the exploded stream), so every doc appears in the output even
    with zero grams."""
    grams_expr = (
        f"CASE WHEN size(w) >= {n} THEN "
        f"transform(sequence(1, size(w) - {n} + 1), "
        f"i -> array_join(slice(w, i, {n}), ' ')) "
        "ELSE slice(array(''), 1, 0) END"
    )
    words = documents.select(
        "doc_id",
        "source",
        F.expr(f"filter(split({NORM}, ' '), t -> t <> '')").alias("w"),
    )

    bench_grams = (
        words.where(F.col("source") == bench_source)
        .select(F.explode(F.expr(grams_expr)).alias("gram"))
        .distinct()
    )
    cand = words.where(F.col("source") != bench_source)
    # totals from the word count alone — size(grams) would force Catalyst
    # to materialize the whole gram array per row just to measure it
    # (measured ~30% of the query at sf0.1)
    totals = cand.select(
        "doc_id",
        F.greatest(F.expr(f"size(w) - {n} + 1"), F.lit(0))
        .cast("long")
        .alias("n_grams"),
    )
    hits = (
        cand.select("doc_id", F.explode(F.expr(grams_expr)).alias("gram"))
        .join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    joined = totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
    )
    frac = _trunc6(F.col("n_hit") / F.greatest(F.col("n_grams"), F.lit(1)))
    return joined.select(
        "doc_id",
        "n_grams",
        "n_hit",
        frac.alias("overlap_frac"),
        (frac >= F.lit(threshold)).alias("contaminated"),
    )


# --- PII detection / redaction --------------------------------------------------

# Patterns valid with identical semantics in Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backrefs, no \b (Spark string literals turn
# '\b' into backspace), bracket classes for literals.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_PHONE_RE = "([+][0-9]{1,2}[- ])?[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}"
PII_IPV4_RE = "([0-9]{1,3}[.]){3}[0-9]{1,3}"


def pii_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII counts + a redaction signature.

    Email → ``<EMAIL>`` first (addresses contain digits), then IPv4 →
    ``<IP>`` (dotted digits would half-match the phone pattern), then
    phone → ``<PHONE>``. Counts are taken on the original text; the
    signature is md5 of the fully redacted text (the driver compares
    values without shipping the full redacted corpus through the hash).
    Pure projection — zero shuffles at any scale.

    NULL text counts as empty (0 PII, not the non-ANSI ``size(NULL)=-1``
    that would subtract 3 from every failure row's corpus rollup)."""
    t = f"coalesce({text_col}, '')"
    n_email = F.expr(
        f"size(regexp_extract_all({t}, '{PII_EMAIL_RE}', 0))"
    )
    n_phone = F.expr(
        f"size(regexp_extract_all({t}, '{PII_PHONE_RE}', 0))"
    )
    n_ipv4 = F.expr(
        f"size(regexp_extract_all({t}, '{PII_IPV4_RE}', 0))"
    )
    redacted = (
        f"regexp_replace(regexp_replace(regexp_replace({t}, "
        f"'{PII_EMAIL_RE}', '<EMAIL>'), "
        f"'{PII_IPV4_RE}', '<IP>'), "
        f"'{PII_PHONE_RE}', '<PHONE>')"
    )
    return documents.select(
        "doc_id",
        n_email.cast("long").alias("n_emails"),
        n_phone.cast("long").alias("n_phones"),
        n_ipv4.cast("long").alias("n_ipv4"),
        (n_email + n_phone + n_ipv4).cast("long").alias("n_pii_total"),
        F.md5(F.expr(redacted)).alias("redacted_sig"),
    )


SYNTH_EDGE_OFFSETS = (1, 14, 27)  # shared with the DuckDB oracle twin


def host_pagerank(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """Damped PageRank over the host link graph — the crawl-curation
    quality prior (Common Crawl publishes exactly this as its host-level
    ranks; Brin & Page 1998). Input ``edges(src, dst)`` is the anchor
    graph rolled up to hosts; output is one row per host with its rank
    after ``iterations`` damped sweeps.

    Integer-exact iteration (the oracle-portability rule of this
    package): ranks are ``1e6``-scaled BIGINTs, a node's per-edge
    contribution is ``rank DIV outdeg`` and the damped update is
    ``150000 + (85 · Σ contrib) DIV 100`` — floors at every step, so the
    fixpoint trajectory is identical in any engine and under any
    partitioning / summation order. Self-loops are dropped and the edge
    set deduplicated (host-graph convention); dangling hosts simply
    contribute nothing (standard simplification), sink-only hosts still
    get rank rows.

    Scale shape (10^8-host graphs): every step is an equi-join on the
    host key plus one map-side-combined groupBy — no broadcasts of
    anything corpus-sized, no cartesian; the edge relation is persisted
    once and each iteration ``localCheckpoint``s the rank relation so
    the plan does not deepen with the iteration count (same lineage
    discipline as ``dedup.dup_clusters``).
    """
    if iterations <= 0:
        raise ValueError(f"iterations ({iterations}) must be positive")
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("h"))
        .union(e.select(F.col("dst").alias("h")))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select("h", F.lit(1_000_000).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["h"])
            .join(deg, "src")
            .select(F.col("dst").alias("h"), F.expr("r DIV outdeg").alias("c"))
            .groupBy("h")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "h", "left")
            .select(
                "h",
                (
                    F.lit(150_000)
                    + F.expr("(85 * coalesce(c, 0)) DIV 100")
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    out = ranks.select(
        F.col("h").alias("host"),
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / F.lit(1e6)).alias("rank"),
    )
    e.unpersist()
    nodes.unpersist()
    return out


def distinct_kmv(
    df: DataFrame,
    key: str = "host",
    value: str = "url",
    k: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per key (Bar-Yossef
    et al. 2002; the ``theta``/KMV family behind DataSketches) — the
    bounded-memory stand-in for exact ``countDistinct`` when per-key
    cardinalities reach billions.

    Each value hashes to 48 bits (md5-derived — deterministic, unlike
    HLL register layouts, so a DuckDB twin reproduces the sketch
    bit-for-bit); the sketch is the k smallest distinct hashes per key;
    the estimator is ``(k-1) · 2^48 / h_(k)`` with exact fallback when a
    key holds fewer than k distinct values. All-integer arithmetic.
    The exact count rides along for observability — it is the
    (corpus-shuffling) aggregate the sketch replaces at scale.

    Scale shape: one distinct on (key, hash) — narrow rows — then a
    rank-limit window Spark rewrites to WindowGroupLimit (pre-shuffle
    per-partition top-k, like ``host_cap``); sketch state per key is k
    longs regardless of cardinality.
    """
    if k < 2:
        raise ValueError(f"k ({k}) must be >= 2")
    two48 = 1 << 48
    d = (
        df.where(F.col(value).isNotNull())
        .select(
            F.col(key),
            (
                F.conv(F.substring(F.md5(F.col(value)), 1, 12), 16, 10)
                .cast("long")
            ).alias("h"),
        )
        .distinct()
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy("h")
    ranked = d.select(key, "h", F.row_number().over(w).alias("rn")).where(
        F.col("rn") <= k
    )
    per = ranked.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_min"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
    )
    exact = df.groupBy(key).agg(
        F.countDistinct(value).cast("long").alias("n_distinct_exact")
    )
    # left join FROM the exact side: a key whose values are all NULL has
    # no sketch rows but still owns an (estimate=0, exact=0) output row.
    # Null-SAFE on the key: a NULL grouping key groups on both sides but
    # a plain equi-join would drop its sketch (NULL never equals NULL),
    # silently reporting estimate=0 against a nonzero exact count
    ex = exact.alias("ex")
    pm = per.alias("pm")
    return ex.join(
        pm, F.col(f"ex.{key}").eqNullSafe(F.col(f"pm.{key}")), "left"
    ).select(
        F.col(f"ex.{key}").alias(key),
        F.coalesce(
            F.when(F.col("n_min") < k, F.col("n_min")).otherwise(
                F.expr(f"CAST({k - 1} * {two48} AS BIGINT) DIV kth")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("kmv_estimate"),
        "n_distinct_exact",
    )


# --- robots.txt exclusion ------------------------------------------------------

# deterministic robots rules synthesized from the documents table's host
# space (doc_id % 50 hosts) — dialect-shared with the DuckDB oracle, same
# pattern as SYNTH_URL_SQL. Exercises: prefix match ('/Path/1' also hits
# '/Path/10'..'/Path/19'), longer-allow override, site-wide disallow '/',
# empty-disallow (matches nothing), and the equal-length allow-wins tie.
SYNTH_ROBOTS_SQL = """
    SELECT DISTINCT concat('site', cast(doc_id % 50 as int), '.example.com') AS host,
           'disallow' AS rule, '/Path/1' AS prefix
    FROM documents WHERE (doc_id % 50) % 2 = 0
    UNION ALL
    SELECT DISTINCT concat('site', cast(doc_id % 50 as int), '.example.com'),
           'allow', '/Path/13'
    FROM documents WHERE (doc_id % 50) % 4 = 0
    UNION ALL
    SELECT DISTINCT concat('site', cast(doc_id % 50 as int), '.example.com'),
           'disallow', '/'
    FROM documents WHERE (doc_id % 50) % 5 = 0
    UNION ALL
    SELECT DISTINCT concat('site', cast(doc_id % 50 as int), '.example.com'),
           'allow', '/Path/2'
    FROM documents WHERE (doc_id % 50) % 5 = 0
    UNION ALL
    SELECT DISTINCT concat('site', cast(doc_id % 50 as int), '.example.com'),
           'disallow', ''
    FROM documents WHERE (doc_id % 50) % 3 = 0
    UNION ALL
    SELECT DISTINCT concat('site', cast(doc_id % 50 as int), '.example.com'),
           'disallow', '/Path/3'
    FROM documents WHERE (doc_id % 50) % 7 = 0
    UNION ALL
    SELECT DISTINCT concat('site', cast(doc_id % 50 as int), '.example.com'),
           'allow', '/Path/3'
    FROM documents WHERE (doc_id % 50) % 7 = 0
"""


def synth_robots(documents: DataFrame) -> DataFrame:
    """The SYNTH_ROBOTS_SQL rule relation as a DataFrame (templated table
    reference, no temp-view registration)."""
    return documents.sparkSession.sql(
        SYNTH_ROBOTS_SQL.replace("FROM documents", "FROM {documents}"),
        documents=documents,
    )


def parse_robots(payload) -> list[tuple[str, str]]:
    """robots.txt bytes/str -> [(rule, path_prefix)] for User-agent ``*``.

    Standard REP grouping (RFC 9309 §2.1): consecutive ``User-agent``
    lines open a group; ``Allow``/``Disallow`` lines bind to the open
    group; only groups naming ``*`` contribute. Comments (``#``) are
    stripped; field names are case-insensitive; unknown fields (and
    ``Sitemap``, which is group-independent) are ignored. Empty
    ``Disallow:`` is preserved as a rule with an empty prefix — it
    matches nothing, per §2.2.2.

    Pure function: runs per-row inside an Arrow batch when robots bodies
    arrive as crawl payloads; the relational twin (host, rule, prefix)
    feeds :func:`robots_filter`.
    """
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", errors="replace")
    rules: list[tuple[str, str]] = []
    in_star = False
    group_open = False  # consecutive UA lines extend the same group
    for raw in payload.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not group_open:
                in_star = False
                group_open = True
            if value == "*":
                in_star = True
            continue
        group_open = False
        if field in ("allow", "disallow") and in_star:
            rules.append((field, value))
    return rules


def _robots_match_sql(path: str, rule: str) -> str:
    """RFC 9309 rule match as one SQL expression: ``*`` spans anything
    (leftmost-greedy segment fold via ``aggregate``), trailing ``$``
    anchors to the path end.  A wildcard-free rule degenerates to the
    plain ``startswith`` probe; ``$`` on a wildcard-free rule means
    exact equality.  Everything is substring/instr arithmetic —
    codegen-friendly, engine-portable, and rule bytes can never be
    interpreted as regex/LIKE metacharacters."""
    anchored = f"endswith({rule}, '$')"
    pat = (
        f"CASE WHEN {anchored} THEN left({rule}, length({rule}) - 1) "
        f"ELSE {rule} END"
    )
    segs = f"split({pat}, '[*]', -1)"
    n = f"size({segs})"
    first = f"element_at({segs}, 1)"
    last = f"element_at({segs}, {n})"
    acc0 = (
        f"IF(substring({path}, 1, length({first})) = {first}, "
        f"CAST(length({first}) + 1 AS BIGINT), CAST(-1 AS BIGINT))"
    )
    mid = (
        f"CASE WHEN {anchored} THEN slice({segs}, 2, greatest({n} - 2, 0)) "
        f"ELSE slice({segs}, 2, {n} - 1) END"
    )
    acc = (
        f"aggregate({mid}, {acc0}, (a, s) -> "
        f"CASE WHEN a = -1 THEN CAST(-1 AS BIGINT) "
        f"WHEN s = '' THEN a "
        f"WHEN instr(substring({path}, CAST(a AS INT)), s) = 0 "
        f"THEN CAST(-1 AS BIGINT) "
        f"ELSE a + instr(substring({path}, CAST(a AS INT)), s) - 1 "
        f"+ length(s) END)"
    )
    return (
        f"CASE WHEN NOT {anchored} THEN ({acc}) <> -1 "
        f"WHEN {n} = 1 THEN {path} = {pat} "
        f"WHEN ({acc}) = -1 THEN false "
        f"WHEN {last} = '' THEN true "
        f"ELSE substring({path}, length({path}) - length({last}) + 1) "
        f"= {last} AND length({path}) - length({last}) + 1 >= ({acc}) END"
    )


def robots_filter(
    pages: DataFrame,
    robots: Optional[DataFrame] = None,
    url_col: str = "url",
) -> DataFrame:
    """Crawl-politeness verdict per page against robots.txt rules.

    ``robots`` is a (host, rule, prefix) relation — ``parse_robots``
    output exploded over the fetched robots.txt corpus (synthesized via
    ``SYNTH_ROBOTS_SQL`` in the driver query). Verdict follows Google's
    REP longest-match semantics (RFC 9309 §2.2.2): among the host's
    rules whose prefix is a string prefix of the canonical path, the
    longest wins; on equal length ``allow`` beats ``disallow``; no match
    (or an empty-prefix rule, which never matches) means allowed. Prefix
    test is ``substring(path, 1, len(prefix)) = prefix`` — no LIKE, so
    rule bytes like ``%``/``_`` can't wildcard.

    RFC 9309 §2.2.3 special characters ARE supported: ``*`` matches any
    span (any number per rule, leftmost-greedy fold) and a trailing
    ``$`` anchors the rule to the path end — ``/*.pdf$``-style rules
    match exactly as in Google's reference matcher.  The match is one
    JVM ``aggregate`` lambda over the rule's ``*``-split segments — no
    regex compilation per row, no Python, and a plain prefix reduces to
    the single ``startswith`` probe.  Rule specificity for
    longest-match stays the raw rule length (Google's priority rule).

    Flags-not-filters: every page rides through with ``blocked`` +
    winning rule/prefix, so the block rate per host is one groupBy away.

    Scale shape: rules equi-join on canonical host (robots relations are
    tiny next to the corpus — Catalyst broadcasts them); winner pick is
    one max(struct) aggregation keyed by doc_id; the page side shuffles
    once. Nothing collects.
    """
    if robots is None:
        robots = synth_robots(pages)
    canon = _canonical_url_sql(url_col)
    path0 = f"regexp_extract({canon}, '{_PATH_RE}', 1)"
    base = pages.select(
        "doc_id",
        F.expr(f"regexp_extract({canon}, '{_ANY_HOST_RE}', 1)").alias("host"),
        F.expr(f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END").alias(
            "path"
        ),
    )
    matched = base.join(robots, "host").where(
        f"prefix <> '' AND ({_robots_match_sql('path', 'prefix')})"
    )
    winner = matched.groupBy("doc_id").agg(
        F.max(
            F.struct(
                F.length("prefix").alias("plen"),
                (F.col("rule") == "allow").alias("is_allow"),
                F.col("prefix").alias("prefix"),
            )
        ).alias("w")
    )
    return base.join(winner, "doc_id", "left").select(
        "doc_id",
        "host",
        "path",
        F.coalesce(~F.col("w.is_allow"), F.lit(False)).alias("blocked"),
        F.when(F.col("w.is_allow").isNull(), "none")
        .when(F.col("w.is_allow"), "allow")
        .otherwise("disallow")
        .alias("verdict_rule"),
        F.coalesce(F.col("w.prefix"), F.lit("")).alias("matched_prefix"),
    )


def link_graph(
    links: DataFrame,
    external_only: bool = True,
    drop_nofollow: bool = False,
) -> DataFrame:
    """Outlink relation (:func:`operators.extract.extract_links` output)
    → host-graph edges ``(src_host, dst_host, n_links)`` — the real-edge
    input :func:`host_pagerank` iterates over (its driver query uses
    synthesized edges; this closes the loop from raw HTML).

    One map-side-combined groupBy; self-loops (internal links) are
    dropped by default since PageRank treats them as rank sinks. Both
    endpoints land in the same canonical host bucket host_cap/pagerank
    key on (www./default-port strip), so 'www.a.com -> a.com' is not a
    phantom cross-host edge. ``drop_nofollow`` removes links whose
    ``rel`` tokens carry ``nofollow``/``ugc``/``sponsored`` before
    edges form — the Google-since-2005 PageRank discount; dofollow-only
    graphs are what trust propagation should iterate on.
    """

    def bucket(h: str) -> str:
        return (
            f"CASE WHEN {h} LIKE '%:80' THEN left({h}, length({h}) - 3) "
            f"WHEN {h} LIKE '%:443' THEN left({h}, length({h}) - 4) "
            f"ELSE {h} END"
        )

    raw_src = f"lower(regexp_extract(url, '{_ANY_HOST_RE}', 1))"
    src = bucket(
        f"(CASE WHEN {raw_src} LIKE 'www.%' THEN substring({raw_src}, 5) "
        f"ELSE {raw_src} END)"
    )
    dst = bucket(
        "(CASE WHEN dst_host LIKE 'www.%' THEN substring(dst_host, 5) "
        "ELSE dst_host END)"
    )
    if drop_nofollow:
        links = links.where(
            "NOT arrays_overlap(split(coalesce(rel, ''), ' '),"
            " array('nofollow', 'ugc', 'sponsored'))"
        )
    edges = links.select(
        F.expr(src).alias("src_host"),
        F.expr(dst).alias("dst_host"),
    )
    if external_only:
        # bucket-level self-loop filter (stronger than is_internal: a
        # www.a.com -> a.com link is a self-loop after normalization)
        edges = edges.where("src_host <> dst_host")
    return edges.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def anchor_text(links: DataFrame, k: int = 3) -> DataFrame:
    """Incoming anchor-text profile per destination URL — the classic
    retrieval/quality signal (anchor text describes the TARGET page;
    search engines have indexed it since PageRank's companion paper).

    Input is the :func:`operators.extract.extract_links` relation.
    External links only (internal navigation anchors — 'home', 'next' —
    describe site structure, not content). Per destination: total
    incoming count, distinct anchor count, and the top-``k`` anchors by
    (count desc, anchor asc) joined as ``top_anchors``.

    Scale shape: two map-side-combined groupBys and one window rank over
    the (dst, anchor) relation — the rank-limit pushes down to
    WindowGroupLimit like `host_cap`, so no per-key state exceeds k.
    """
    if k <= 0:
        raise ValueError(f"k ({k}) must be positive")
    from pyspark.sql.window import Window

    pairs = (
        links.where(~F.col("is_internal"))
        .where(F.trim("anchor") != "")
        .groupBy("resolved", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("resolved").orderBy(
        F.desc("n"), F.asc("anchor")
    )
    ranked = pairs.withColumn("rnk", F.row_number().over(w))
    return ranked.groupBy("resolved").agg(
        F.sum("n").cast("long").alias("n_incoming"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_anchors"),
        F.array_join(
            F.expr(
                "transform(sort_array(collect_list(CASE WHEN rnk <= "
                f"{int(k)} THEN struct(rnk, anchor) END)), s -> s.anchor)"
            ),
            " | ",
        ).alias("top_anchors"),
    )


def fetch_waves(
    pages: DataFrame, url_col: str = "url", per_host: int = 4
) -> DataFrame:
    """Crawl-frontier politeness scheduling: assign every URL a fetch
    ``wave`` and ``slot`` such that no wave contains more than
    ``per_host`` URLs of one canonical host — the standard frontier
    partitioning every polite crawler (Heritrix/Nutch "politeness
    queues") applies before dispatching fetch tasks.

    Order within a host is the deterministic ``md5(doc_id)`` pick (the
    same partition-invariant tiebreak as ``host_cap``), NOT arrival
    order, so re-running the scheduler on the same frontier always
    yields the same waves regardless of task scheduling.

    Output: ``doc_id, host, wave, slot`` with
    ``wave = (rank-1) div per_host`` and ``slot = (rank-1) mod per_host``.

    Scale shape: politeness is inherently a per-host total order — that
    order IS the output — so this is one window over a host-hash
    shuffle, with three narrow columns (doc_id, host, 32-char pick) as
    the only payload. Parallelism comes from the host dimension (hosts
    >> cores in any crawl); a viral host serializes only its own rank
    scan, over rows a few dozen bytes wide, and never blocks other
    hosts. Nothing collects; no rank-limit applies because every row
    must be numbered (unlike ``host_cap``'s top-k pushdown).
    """
    if per_host < 1:
        raise ValueError(f"per_host ({per_host}) must be >= 1")
    if int(per_host) != per_host:
        # a fractional cap would silently truncate — reject it loudly
        raise ValueError(f"per_host ({per_host}) must be a whole number")
    k = int(per_host)
    return (
        _host_pick_rank(pages, url_col)
        .withColumn("r", (F.col("rank") - F.lit(1)).cast("long"))
        .select(
            "doc_id",
            "host",
            # integer div — ranks stay exact however deep the host queue
            F.expr(f"CAST(r div {k} AS BIGINT)").alias("wave"),
            F.expr(f"CAST(r % {k} AS BIGINT)").alias("slot"),
        )
    )


def host_lang_profile(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host language consistency profile — the CCNet-style signal for
    spotting machine-translation/spam farms: a legitimate host publishes
    in one or two languages, an MT content farm mirrors the same text
    across dozens. Emits per canonical host the doc count, distinct
    language count, the dominant language (ties → lexicographically
    smallest) and its share in ppm (integer-floored, so the DuckDB twin
    agrees byte-for-byte; no float entropy — logs don't hash stably
    across engines).

    Scale shape: two map-side-combined groupBys — (host, lang) counts,
    then one struct-min arg-max per host (``min(struct(-cnt, lang))``,
    the no-window latest_capture pattern). No joins, no windows, nothing
    collects."""
    # NULL lang folds into '' — Spark sorts NULLs first, DuckDB last, so a
    # NULL surviving into the argmax tie-break would diverge across engines
    counts = (
        pages.select(
            host_col(url_col).alias("host"),
            F.coalesce("lang", F.lit("")).alias("lang"),
        )
        .groupBy("host", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.groupBy("host")
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("lang"))).alias("d"),
        )
        .select(
            "host",
            "n_docs",
            "n_langs",
            F.col("d.lang").alias("dominant_lang"),
            (F.floor(F.lit(1000000) * (-F.col("d.neg")) / F.col("n_docs")))
            .cast("long")
            .alias("dominant_ppm"),
        )
    )


# Error phrases shared verbatim with the DuckDB oracle twin. Multi-word
# phrases are matched as lowered substrings; the bare token "404" is
# matched with digit guards so "2024-04-04" or "id 14041" never fire.
SOFT404_PHRASES = (
    "page not found",
    "no longer available",
    "does not exist",
    "has been removed",
    "error 404",
)
SOFT404_TOKEN_RE = "(^|[^0-9])404([^0-9]|$)"

# Deterministic decoration for the driver query: every signal path is a
# pure function of doc_id so the DuckDB twin reproduces it byte-for-byte.
SYNTH_SOFT404_TEXT_SQL = (
    "CASE WHEN doc_id % 9 = 0 THEN "
    "'Error 404 - Page Not Found. The requested URL does not exist.' "
    "WHEN doc_id % 13 = 0 THEN concat(substring(coalesce(text, ''), 1, 60), "
    "' This page is no longer available.') "
    "WHEN doc_id % 17 = 0 THEN substring(coalesce(text, ''), 1, 40) "
    "WHEN doc_id % 23 = 0 THEN concat('Ticket 14045 closed. ', "
    "substring(coalesce(text, ''), 1, 120)) "
    "ELSE coalesce(text, '') END"
)


def soft404_flags(
    documents: DataFrame,
    text_col: str = "text",
    min_chars: int = 80,
) -> DataFrame:
    """Soft-404 / error-page detection (Bar-Yossef et al. WWW'04, "Sic
    Transit Gloria Telae": servers that answer HTTP 200 with a "not
    found" body poison a crawl corpus because every dead link on a big
    host yields an identical junk page). Content-side signals only —
    the status code is long gone by the time text reaches curation:

    * ``n_phrases`` — how many of the :data:`SOFT404_PHRASES` appear in
      the lowered text (each counted once: presence, not occurrences);
    * ``has_404_token`` — a digit-guarded standalone ``404``;
    * ``is_tiny`` — fewer than ``min_chars`` chars after trim (error
      pages are short; the guard keeps a stray phrase in a long article
      from flagging it);
    * ``soft404`` — the verdict: any phrase or 404-token on a tiny page,
      or >= 2 independent phrase signals regardless of length.

    Flags-not-filters (curate.py composition pattern). Scale shape: pure
    projection — zero shuffles/joins, runs at scan speed beside the
    other per-row passes.
    """
    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    n_phrases = None
    for p in SOFT404_PHRASES:
        hit = t.contains(p).cast("long")
        n_phrases = hit if n_phrases is None else n_phrases + hit
    has_tok = F.regexp_extract(t, SOFT404_TOKEN_RE, 0) != F.lit("")
    is_tiny = F.length(t) < F.lit(min_chars)
    return documents.select(
        "doc_id",
        n_phrases.cast("long").alias("n_phrases"),
        has_tok.alias("has_404_token"),
        F.length(t).cast("long").alias("n_chars_trim"),
        is_tiny.alias("is_tiny"),
        (
            (is_tiny & ((n_phrases > 0) | has_tok))
            | (n_phrases >= 2)
        ).alias("soft404"),
    )


def cdx_index(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "text",
) -> DataFrame:
    """CDX(J)-style capture index over canonical URLs.

    Every public crawl publishes a sorted capture index beside the WARC
    data (Common Crawl's ``cdx-*.gz`` + columnar index) so a single URL
    is O(log n) findable among 10^12 captures. One row per capture,
    keyed by the SURT of the canonical URL plus the 14-digit timestamp.
    SURT (Sort-friendly URI Reordering Transform) reverses the host
    labels so every capture under a registered domain sorts adjacently::

        https://sub.Example.com:8080/A/b?q=1 -> com,example,sub:8080)/a?q=1

    Columns: ``surt_key``, ``ts14``, ``url`` (original), ``canonical_url``,
    ``digest`` (sha256 hex of the record content — the dedup handle CDX
    uses for revisit records), ``length`` (content octet length).

    Scale shape: the key derivation is a pure codegen projection over
    the already-mirrored canonical form; the ONE exchange is the global
    ``orderBy(surt_key, ts14)`` range partition — which is the point:
    the sorted range partitions are exactly the sharded, binary-
    searchable index files the artifact requires at 10^12 rows.
    """
    curl = canonical_url_col(url_col)
    base = pages.select(
        F.col(url_col).alias("url"),
        curl.alias("canonical_url"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts14"),
        F.sha2(F.col(content_col).cast("binary"), 256).alias("digest"),
        F.octet_length(F.col(content_col)).cast("long").alias("length"),
    )
    host = f"regexp_extract(canonical_url, '{_ANY_HOST_RE}', 1)"
    port = f"regexp_extract({host}, ':([0-9]+)$', 1)"
    hostname = f"regexp_replace({host}, ':[0-9]+$', '')"
    rev = f"array_join(reverse(split({hostname}, '[.]')), ',')"
    rest = (
        "regexp_extract(canonical_url, "
        "'^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?://)?[^/?#]*(.*)$', 1)"
    )
    surt = (
        f"concat({rev}, "
        f"CASE WHEN {port} <> '' THEN concat(':', {port}) ELSE '' END, "
        f"')', lower({rest}))"
    )
    return (
        base.withColumn("surt_key", F.expr(surt))
        .select("surt_key", "ts14", "url", "canonical_url", "digest", "length")
        .orderBy("surt_key", "ts14")
    )


# --- host-graph analytics beyond PageRank --------------------------------------


def host_hits(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """HITS hub/authority scores over the host link graph (Kleinberg,
    "Authoritative sources in a hyperlinked environment", JACM 1999) —
    the complement to :func:`host_pagerank`: PageRank ranks where crawl
    mass should go, authority/hub separates content endpoints from
    directory/aggregator hosts, a standard crawl-frontier prioritization
    pair.

    Integer-exact power iteration (the oracle-portability rule of this
    package): scores are ~``1e6``-scaled BIGINTs; each sweep is

    * ``auth[v] = Σ hub[u]`` over in-edges, then rescale,
    * ``hub[u] = Σ auth[v]`` over out-edges, then rescale,

    where the rescale divides by ``greatest(max(score) DIV 1e6, 1)`` —
    floors only, so the trajectory is identical in any engine, under any
    partitioning, and never needs a 128-bit intermediate (the classical
    ``x·1e6 DIV max`` form overflows ``long`` once Σ exceeds ~9.2e12;
    dividing by the pre-floored quotient keeps every value ≤ ~2e6 with
    the same fixpoint structure). Self-loops dropped, edge set
    deduplicated, exactly as ``host_pagerank``.

    Scale shape (10^8-host graphs): per sweep, two equi-joins on the
    host key + two map-side-combined groupBys; the per-sweep max is a
    one-row aggregate cross-joined back (broadcast of a scalar). Edge
    relation persisted once; ranks ``localCheckpoint`` per sweep so plan
    depth stays constant. Nothing corpus-sized is ever collected.
    """
    if iterations <= 0:
        raise ValueError(f"iterations ({iterations}) must be positive")
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("h"))
        .union(e.select(F.col("dst").alias("h")))
        .distinct()
        .persist()
    )

    def _rescale(scores: DataFrame, col: str) -> DataFrame:
        mx = scores.agg(F.max(col).alias("mx"))
        return (
            scores.crossJoin(F.broadcast(mx))
            .select(
                "h",
                F.expr(
                    f"{col} DIV greatest(mx DIV 1000000, 1)"
                ).cast("long").alias(col),
            )
            .localCheckpoint(eager=True)
        )

    hub = nodes.select("h", F.lit(1_000_000).cast("long").alias("hub"))
    auth = None
    for _ in range(iterations):
        araw = (
            e.join(hub, e["src"] == hub["h"])
            .groupBy(F.col("dst").alias("hh"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = nodes.join(
            araw, nodes["h"] == araw["hh"], "left"
        ).select("h", F.coalesce("auth", F.lit(0)).cast("long").alias("auth"))
        auth = _rescale(auth, "auth")
        hraw = (
            e.join(auth, e["dst"] == auth["h"])
            .groupBy(F.col("src").alias("hh"))
            .agg(F.sum("auth").alias("hub"))
        )
        hub = nodes.join(
            hraw, nodes["h"] == hraw["hh"], "left"
        ).select("h", F.coalesce("hub", F.lit(0)).cast("long").alias("hub"))
        hub = _rescale(hub, "hub")
    out = (
        auth.join(hub, "h")
        .select(
            F.col("h").alias("host"),
            F.col("auth").alias("auth_scaled"),
            F.col("hub").alias("hub_scaled"),
            (F.col("auth").cast("double") / F.lit(1e6)).alias("authority"),
            (F.col("hub").cast("double") / F.lit(1e6)).alias("hub"),
        )
    )
    e.unpersist()
    nodes.unpersist()
    return out


def host_components(edges: DataFrame) -> DataFrame:
    """Connected components of the host link graph: ``(host,
    component_id, component_size)`` with ``component_id`` = the smallest
    host in the component (lexicographic — host keys are strings).

    Web-graph components are the crawl-seeding / partition-layout
    primitive: the giant WCC tells you what one seed list reaches, and
    small components are where isolated spam farms and dead hosting
    clusters live (Broder et al., "Graph structure in the web", 2000).

    Delegates to the same alternating large-star/small-star engine that
    powers near-dup clustering (``dedup.dup_clusters`` — Kiveris et al.
    SOCC'14), so the scale story is shared and pinned there: per-
    iteration ``localCheckpoint``, exact fixpoint probe, O(log) rounds
    on real web graphs. Direction is ignored (components of the
    undirected graph; ``dup_clusters`` symmetrizes internally);
    self-loops contribute nothing but keep their host in the node set.
    The size rollup is one extra map-side-combined groupBy + an
    equi-join back on the component key.
    """
    from . import dedup as _dedup

    nodes = (
        edges.select(F.col("src").alias("doc_id"))
        .union(edges.select(F.col("dst").alias("doc_id")))
        .distinct()
    )
    pairs = edges.select(
        F.col("src").alias("host_a"), F.col("dst").alias("host_b")
    ).where(F.col("host_a") != F.col("host_b"))
    labels = _dedup.dup_clusters(pairs, documents=nodes).select(
        F.col("doc_id").alias("host"), F.col("cluster_id").alias("component_id")
    )
    sizes = labels.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("long").alias("component_size")
    )
    return labels.join(sizes, "component_id").select(
        "host", "component_id", "component_size"
    )


# HLL bias constant α_64 — written as an engine-portable SQL fragment:
# every literal is CAST to DOUBLE *before* any arithmetic (DuckDB parses
# bare decimal literals as DECIMAL and would do exact-decimal division;
# Spark likewise folds 0.7213 to DECIMAL(4,4)), so both engines evaluate
# the identical sequence of correctly-rounded IEEE-754 ops → identical
# bits. α_m = 0.7213/(1 + 1.079/m) for m ≥ 128 per the paper; the m=64
# HyperBall linear-counting table: 64*ln(64/V) for V = 1..64 zero
# registers, baked as LITERALS (generated once with CPython's libm,
# shared verbatim with the DuckDB twin) so the small-range correction
# is bit-identical across engines without a portable ln().
HYPERBALL_LC_TABLE_SQL = (
    "CAST(266.168517335019 AS DOUBLE), CAST(221.8070977791825 AS DOUBLE), "
    "CAST(195.85733086025996 AS DOUBLE), CAST(177.445678223346 AS DOUBLE), "
    "CAST(163.16449093923657 AS DOUBLE), "
    "CAST(151.4959113044235 AS DOUBLE), "
    "CAST(141.63026779547894 AS DOUBLE), "
    "CAST(133.0842586675095 AS DOUBLE), "
    "CAST(125.54614438550095 AS DOUBLE), "
    "CAST(118.80307138340008 AS DOUBLE), "
    "CAST(112.70321987592328 AS DOUBLE), "
    "CAST(107.13449174858698 AS DOUBLE), "
    "CAST(102.01175845748065 AS DOUBLE), "
    "CAST(97.26884823964244 AS DOUBLE), CAST(92.85330446447756 AS DOUBLE), "
    "CAST(88.722839111673 AS DOUBLE), CAST(84.84286331542117 AS DOUBLE), "
    "CAST(81.18472482966446 AS DOUBLE), CAST(77.7244226683668 AS DOUBLE), "
    "CAST(74.44165182756358 AS DOUBLE), CAST(71.31908132071992 AS DOUBLE), "
    "CAST(68.34180032008679 AS DOUBLE), CAST(65.49688751555341 AS DOUBLE), "
    "CAST(62.773072192750476 AS DOUBLE), "
    "CAST(60.160464543454154 AS DOUBLE), "
    "CAST(57.650338901644155 AS DOUBLE), "
    "CAST(55.23495791074193 AS DOUBLE), "
    "CAST(52.907428683805946 AS DOUBLE), "
    "CAST(50.66158421588466 AS DOUBLE), "
    "CAST(48.491884908641055 AS DOUBLE), "
    "CAST(46.393336247969636 AS DOUBLE), CAST(44.3614195558365 AS DOUBLE), "
    "CAST(42.39203340116426 AS DOUBLE), CAST(40.48144375958467 AS DOUBLE), "
    "CAST(38.62624139969652 AS DOUBLE), "
    "CAST(36.823305273827955 AS DOUBLE), "
    "CAST(35.06977092578864 AS DOUBLE), CAST(33.36300311253031 AS DOUBLE), "
    "CAST(31.700571982721627 AS DOUBLE), "
    "CAST(30.08023227172708 AS DOUBLE), "
    "CAST(28.499905065943302 AS DOUBLE), "
    "CAST(26.957661764883422 AS DOUBLE), "
    "CAST(25.451709930631004 AS DOUBLE), "
    "CAST(23.980380764250285 AS DOUBLE), "
    "CAST(22.542117989718538 AS DOUBLE), "
    "CAST(21.135467959716916 AS DOUBLE), "
    "CAST(19.759070825575247 AS DOUBLE), "
    "CAST(18.411652636913974 AS DOUBLE), "
    "CAST(17.09201825593889 AS DOUBLE), "
    "CAST(15.799044987617652 AS DOUBLE), "
    "CAST(14.531676840662149 AS DOUBLE), "
    "CAST(13.28891934580765 AS DOUBLE), "
    "CAST(12.069834867683198 AS DOUBLE), "
    "CAST(10.873538354905435 AS DOUBLE), "
    "CAST(9.699193480140856 AS DOUBLE), CAST(8.546009127969445 AS DOUBLE), "
    "CAST(7.413236193607785 AS DOUBLE), CAST(6.300164660048161 AS DOUBLE), "
    "CAST(5.206120925052954 AS DOUBLE), "
    "CAST(4.1304653528045545 AS DOUBLE), "
    "CAST(3.0725900279270824 AS DOUBLE), "
    "CAST(2.0319166921331373 AS DOUBLE), "
    "CAST(1.0078948459609032 AS DOUBLE), CAST(0.0 AS DOUBLE) "
)

# row of Table 1 hard-codes the same closed form the reference
# implementations (DataSketches, Redis) use for m=64.
HLL_ALPHA64_SQL = (
    "(CAST(0.7213 AS DOUBLE) / "
    "(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE)))"
)


def distinct_hll(
    df: DataFrame,
    key: str = "host",
    value: str = "url",
) -> DataFrame:
    """HyperLogLog distinct-count sketch per key (Flajolet et al. 2007)
    — the third member of the sketch family next to KMV
    (:func:`distinct_kmv`) and count-min (``text_analysis.cm_sketch``):
    fixed 64-register layout, ~1.3/√64 ≈ 16 % standard error, register
    state is 64 small ints per key no matter how many billions of URLs
    a host serves.

    Deterministic across engines and partitionings, which stock HLL
    implementations are not: the register index is the top 6 bits of a
    48-bit md5-derived hash (same hash as the KMV sketch, so the DuckDB
    twin reproduces the registers bit-for-bit), ρ = leading-zero count
    of the remaining 42 bits + 1 via integer ``length(bin(w))`` — no
    floating point anywhere in the sketch state. The estimator
    ``α·m²/Σ2^{-M[j]}`` IS evaluated in doubles, but every term 2^-M is
    an exact binary fraction (built as ``1.0 / shiftleft(1, M)``, never
    ``pow``) and the sum of ≤64 such terms is exact in a double, so the
    single rounding step is the final correctly-rounded divide —
    bit-identical in any IEEE-754 engine regardless of summation order.
    The small-range linear-counting correction (``m·ln(m/V)``) is
    deliberately omitted: ``ln`` is not correctly-rounded in either
    engine, so it would break cross-engine bit-equality — instead the
    zero-register count ``n_zero_registers`` rides along so a consumer
    can apply any bias correction downstream, and (as with KMV) the
    exact distinct count rides along for observability at test scale.

    Scale shape: one distinct on (key, register, ρ) — strictly narrower
    than the value stream — then two map-side-combined groupBys
    (register max, then the 64-row fold per key). Register relations
    MERGE by (key, register) max, so shard sketches combine by shipping
    64 ints per shard, never value streams.
    """
    two42 = 1 << 42
    d = (
        df.where(F.col(value).isNotNull())
        .select(
            F.col(key),
            F.conv(F.substring(F.md5(F.col(value)), 1, 12), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .select(
            key,
            F.expr(f"h DIV {two42}").cast("int").alias("reg"),
            F.expr(f"h % {two42}").alias("w"),
        )
        .select(
            key,
            "reg",
            F.expr(
                "CASE WHEN w = 0 THEN 43 ELSE 43 - length(bin(w)) END"
            ).cast("int").alias("rho"),
        )
        .distinct()
    )
    regs = d.groupBy(key, "reg").agg(F.max("rho").alias("m"))
    per = regs.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.expr("CAST(1.0 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)")).alias("s_present"),
    )
    exact = df.groupBy(key).agg(
        F.countDistinct(value).cast("long").alias("n_distinct_exact")
    )
    ex = exact.alias("ex")
    pm = per.alias("pm")
    est = (
        f"floor({HLL_ALPHA64_SQL} * CAST(4096.0 AS DOUBLE) / "
        "(s_present + CAST(64 - n_regs AS DOUBLE)))"
    )
    return ex.join(
        pm, F.col(f"ex.{key}").eqNullSafe(F.col(f"pm.{key}")), "left"
    ).select(
        F.col(f"ex.{key}").alias(key),
        F.coalesce(F.expr(est).cast("long"), F.lit(0)).alias("hll_estimate"),
        F.coalesce((F.lit(64) - F.col("n_regs")).cast("long"), F.lit(64)).alias(
            "n_zero_registers"
        ),
        "n_distinct_exact",
    )


# --- sitemap ingestion ----------------------------------------------------------

# Deterministic sitemap corpus synthesized from the documents table's
# doc_id space (Spark dialect only — it builds the INPUT; the oracle
# mirrors the parsed OUTPUT rows directly). One row per host; every
# fifth host serves a <sitemapindex> (the two-level layout real crawls
# must walk), the rest serve a three-entry <urlset> exercising optional
# lastmod / changefreq / priority fields and the default namespace.
SYNTH_SITEMAP_SQL = """
    SELECT host,
           CASE WHEN hn % 5 = 0 THEN concat(
             '<?xml version="1.0" encoding="UTF-8"?>',
             '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
             '<sitemap><loc>https://', host, '/sitemap-1.xml</loc>',
             '<lastmod>2024-0', cast(hn % 9 + 1 as int), '-01</lastmod></sitemap>',
             '<sitemap><loc>https://', host, '/sitemap-2.xml</loc></sitemap>',
             '</sitemapindex>')
           ELSE concat(
             '<?xml version="1.0" encoding="UTF-8"?>',
             '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
             '<url><loc>https://', host, '/page/', cast(hn * 3 as int), '</loc>',
             '<lastmod>2024-', lpad(cast(hn % 12 + 1 as string), 2, '0'),
             '-', lpad(cast(hn % 28 + 1 as string), 2, '0'), '</lastmod>',
             '<priority>0.8</priority></url>',
             '<url><loc>https://', host, '/page/', cast(hn * 3 + 1 as int), '</loc>',
             '<changefreq>daily</changefreq></url>',
             '<url><loc>https://', host, '/page/', cast(hn * 3 + 2 as int), '</loc></url>',
             '</urlset>')
           END AS xml
    FROM (
        SELECT DISTINCT cast(doc_id % 25 as int) AS hn,
               concat('smap', cast(doc_id % 25 as int), '.example.org') AS host
        FROM documents
    )
"""


def synth_sitemaps(documents: DataFrame) -> DataFrame:
    """The SYNTH_SITEMAP_SQL corpus as a DataFrame (templated table
    reference, no temp-view registration)."""
    return documents.sparkSession.sql(
        SYNTH_SITEMAP_SQL.replace("FROM documents", "FROM {documents}"),
        documents=documents,
    )


_SITEMAP_SCHEMA = (
    "host string, kind string, loc string, lastmod string, "
    "changefreq string, priority string"
)


def sitemap_urls(sitemaps: DataFrame, max_bytes: int = 8 * 1024 * 1024) -> DataFrame:
    """Sitemap corpus (host, xml) → one row per ``<url>``/``<sitemap>``
    entry — the crawl-frontier seed feed (sitemaps.org protocol; the
    discovery channel ``fetch_waves``' politeness scheduler consumes
    alongside robots.txt's ``Sitemap:`` pointers).

    Real XML parse (``xml.etree`` inside an Arrow-batched
    ``mapInPandas`` kernel — same execution contract as the extraction
    kernels: per-document failure isolation, a malformed sitemap
    contributes zero rows, never a dead batch). Namespace-agnostic tag
    matching (crawl sitemaps carry the 0.9 namespace, no namespace, or
    typo'd ones); ``<urlset>`` entries emit ``kind='url'``,
    ``<sitemapindex>`` entries ``kind='sitemap'`` (the caller recurses
    fetch-side); entries without ``<loc>`` are dropped per protocol;
    optional fields surface as empty strings (not NULL — the relation
    is an equi-joinable seed list). Oversized payloads are skipped
    under the shared ``max_bytes`` isolation gate.

    Scale shape: pure per-row projection work — zero shuffles; the
    output inherits the input partitioning (hosts), which is exactly
    the politeness key downstream schedulers bucket on.
    """
    from typing import Iterator as _It

    import pandas as _pd

    def kernel(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        import xml.etree.ElementTree as ET

        cols = ["host", "kind", "loc", "lastmod", "changefreq", "priority"]

        def local(tag: str) -> str:
            return tag.rpartition("}")[2].lower()

        for batch in batches:
            records = []
            for host, xml in zip(batch["host"], batch["xml"]):
                if xml is None or len(xml) > max_bytes:
                    continue
                try:
                    root = ET.fromstring(xml)
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
                rt = local(root.tag)
                kind = {"urlset": "url", "sitemapindex": "sitemap"}.get(rt)
                if kind is None:
                    continue
                for entry in root:
                    if local(entry.tag) not in ("url", "sitemap"):
                        continue
                    fields = {"loc": "", "lastmod": "", "changefreq": "",
                              "priority": ""}
                    for child in entry:
                        name = local(child.tag)
                        if name in fields:
                            fields[name] = (child.text or "").strip()
                    if not fields["loc"]:
                        continue  # entries without <loc> are invalid
                    records.append(
                        (host, kind, fields["loc"], fields["lastmod"],
                         fields["changefreq"], fields["priority"])
                    )
            yield _pd.DataFrame(records, columns=cols)

    return sitemaps.select("host", "xml").mapInPandas(
        kernel, schema=_SITEMAP_SCHEMA
    )


SYNTH_FEED_SQL = """
    SELECT host,
           CASE
           WHEN hn % 7 = 3 THEN '<rss version="2.0"><channel><item>'
           WHEN hn % 2 = 0 THEN concat(
             '<?xml version="1.0" encoding="UTF-8"?>',
             '<rss version="2.0"><channel>',
             '<title>Feed ', cast(hn as int), '</title>',
             '<link>https://', host, '/</link>',
             '<item><title>Post ', cast(hn * 3 as int), '</title>',
             '<link>https://', host, '/post/', cast(hn * 3 as int), '</link>',
             '<guid>tag:', host, ',', cast(hn as int), ':1</guid>',
             '<pubDate>2024-01-', lpad(cast(hn % 28 + 1 as string), 2, '0'),
             '</pubDate>',
             '<description><![CDATA[d & ', cast(hn as int),
             ']]></description></item>',
             '<item><title>Post ', cast(hn * 3 + 1 as int), '</title>',
             '<link>https://', host, '/post/', cast(hn * 3 + 1 as int),
             '</link></item>',
             '<item><title>No link</title></item>',
             '</channel></rss>')
           ELSE concat(
             '<?xml version="1.0" encoding="UTF-8"?>',
             '<feed xmlns="http://www.w3.org/2005/Atom">',
             '<title>Feed ', cast(hn as int), '</title>',
             '<entry><title>Entry ', cast(hn * 3 as int), '</title>',
             '<link rel="alternate" href="https://', host, '/e/',
             cast(hn * 3 as int), '"/>',
             '<id>urn:feed:', cast(hn as int), ':1</id>',
             '<updated>2024-01-0', cast(hn % 9 + 1 as int),
             'T00:00:00Z</updated>',
             '<summary>s ', cast(hn as int), '</summary></entry>',
             '<entry><title>Entry ', cast(hn * 3 + 1 as int), '</title>',
             '<link href="https://', host, '/e/', cast(hn * 3 + 1 as int),
             '"/>',
             '<published>2024-02-01T00:00:00Z</published></entry>',
             '<entry><title>enclosure only</title>',
             '<link rel="enclosure" href="https://', host,
             '/file.mp3"/></entry>',
             '</feed>')
           END AS xml
    FROM (
        SELECT DISTINCT cast(doc_id % 25 as int) AS hn,
               concat('feed', cast(doc_id % 25 as int), '.example.org') AS host
        FROM documents
    )
"""


def synth_feeds(documents: DataFrame) -> DataFrame:
    """The SYNTH_FEED_SQL corpus as a DataFrame (templated table
    reference, no temp-view registration)."""
    return documents.sparkSession.sql(
        SYNTH_FEED_SQL.replace("FROM documents", "FROM {documents}"),
        documents=documents,
    )


_FEED_SCHEMA = (
    "host string, kind string, feed_title string, title string, "
    "link string, guid string, published string, summary string"
)


def feed_entries(feeds: DataFrame, max_bytes: int = 8 * 1024 * 1024) -> DataFrame:
    """Feed corpus (host, xml) → one row per RSS 2.0 ``<item>`` / Atom
    1.0 ``<entry>`` — the freshness-discovery channel beside
    :func:`sitemap_urls` (RSS 2.0 spec / RFC 4287): news crawlers seed
    recrawl queues from feeds because they surface new URLs hours
    before sitemaps regenerate.

    Same execution contract as the sitemap kernel: real XML parse
    inside an Arrow-batched ``mapInPandas``, per-document failure
    isolation (malformed/oversized feeds contribute zero rows),
    namespace-agnostic tag matching (feeds in the wild carry the Atom
    namespace, none, or RDF/RSS-1.0 hybrids). Field mapping, both
    dialects to one relation:

    - ``link`` — RSS ``<link>`` text; Atom first ``<link href>`` whose
      ``rel`` is absent or ``alternate`` (enclosure/self links are not
      page URLs). Entries without a link are dropped — this is a
      frontier feed, a row must be fetchable.
    - ``guid`` — RSS ``<guid>`` / Atom ``<id>``.
    - ``published`` — RSS ``<pubDate>``; Atom ``<published>``, falling
      back to ``<updated>``. Surfaced verbatim (RFC-822 vs RFC-3339
      normalization is a downstream projection, not a parse concern).
    - ``summary`` — RSS ``<description>`` / Atom ``<summary>`` (CDATA
      transparently unwrapped by the XML parser).
    - Missing optionals are empty strings, not NULL — equi-joinable.

    Input contract: ``xml`` is a DECODED string column — binary crawl
    payloads go through the charset-sniffing decode (errors-replaced)
    first, so invalid byte sequences never reach the Arrow boundary.

    Scale shape: pure per-row projection work — zero shuffles; output
    inherits the input's host partitioning (the politeness key).
    """
    from typing import Iterator as _It

    import pandas as _pd

    def kernel(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        import xml.etree.ElementTree as ET

        cols = ["host", "kind", "feed_title", "title", "link", "guid",
                "published", "summary"]

        def local(tag) -> str:
            return tag.rpartition("}")[2].lower() if isinstance(tag, str) else ""

        def child_text(parent, names) -> str:
            for c in parent:
                if local(c.tag) in names:
                    return (c.text or "").strip()
            return ""

        for batch in batches:
            records = []
            for host, xml in zip(batch["host"], batch["xml"]):
                if xml is None or len(xml) > max_bytes:
                    continue
                try:
                    root = ET.fromstring(xml)
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
                rt = local(root.tag)
                if rt == "rss":
                    chan = next(
                        (c for c in root if local(c.tag) == "channel"), None
                    )
                    if chan is None:
                        continue
                    ftitle = child_text(chan, ("title",))
                    for item in chan:
                        if local(item.tag) != "item":
                            continue
                        link = child_text(item, ("link",))
                        if not link:
                            continue
                        records.append((
                            host, "rss", ftitle,
                            child_text(item, ("title",)), link,
                            child_text(item, ("guid",)),
                            child_text(item, ("pubdate",)),
                            child_text(item, ("description",)),
                        ))
                elif rt == "feed":
                    ftitle = child_text(root, ("title",))
                    for entry in root:
                        if local(entry.tag) != "entry":
                            continue
                        link = ""
                        for c in entry:
                            if local(c.tag) == "link" and c.get(
                                "rel", "alternate"
                            ) == "alternate":
                                link = (c.get("href") or "").strip()
                                if link:
                                    break
                        if not link:
                            continue
                        published = child_text(entry, ("published",))
                        if not published:
                            published = child_text(entry, ("updated",))
                        records.append((
                            host, "atom", ftitle,
                            child_text(entry, ("title",)), link,
                            child_text(entry, ("id",)), published,
                            child_text(entry, ("summary",)),
                        ))
            yield _pd.DataFrame(records, columns=cols)

    return feeds.select("host", "xml").mapInPandas(kernel, schema=_FEED_SCHEMA)


def revisit_records(cdx: DataFrame) -> DataFrame:
    """CDX capture index → WARC-style revisit verdicts: per content
    digest, the earliest capture is the ``response`` (stored payload),
    every later identical capture a ``revisit`` record pointing at it —
    the crawler-side storage dedup every public crawl applies before
    the corpus even lands (WARC/1.1 §6.7.2 ``revisit`` +
    ``WARC-Refers-To``; CDX revisit lines carry the original's digest).

    Input is :func:`cdx_index` output (typically the already-sorted,
    already-materialized index artifact — this pass re-reads the index,
    never the payloads). "Earliest" is the deterministic total order
    (ts14, surt_key, url), so the verdict is partition-invariant; a
    byte-identical duplicate of the minimum tuple also reads
    ``response`` (same capture listed twice is the same capture).
    ``n_captures`` rides along per digest — ``sum(record_type =
    'revisit') / count(*)`` is the storage-dedup rate crawl reports
    publish.

    Scale shape: one map-side-combined groupBy on digest (the min tuple
    + count are both partial-aggregable) and one equi-join back on
    digest. No windows over the full index, no sort.
    """
    orig = cdx.groupBy("digest").agg(
        F.min(F.struct("ts14", "surt_key", "url")).alias("o"),
        F.count(F.lit(1)).cast("long").alias("n_captures"),
    )
    c = cdx.join(orig, "digest")
    is_orig = (
        (F.col("ts14") == F.col("o.ts14"))
        & (F.col("surt_key") == F.col("o.surt_key"))
        & (F.col("url") == F.col("o.url"))
    )
    return c.select(
        "surt_key",
        "ts14",
        "url",
        "digest",
        F.when(is_orig, "response").otherwise("revisit").alias("record_type"),
        F.when(is_orig, "").otherwise(F.col("o.ts14")).alias("refers_to_ts14"),
        F.when(is_orig, "").otherwise(F.col("o.url")).alias("refers_to_url"),
        "n_captures",
    )


def capture_drift(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Recrawl drift per canonical URL: how often does the content change?

    A crawl scheduler sets each URL's revisit frequency from its observed
    change history (the classic Cho & Garcia-Molina "effective page
    refresh" signal; Common Crawl's own recrawl policy and every news
    crawler work this way). Given one row per (url, fetch time, payload),
    this orders each URL's captures by time and counts *transitions* —
    consecutive captures whose content fingerprints differ:

    - ``n_captures``   total fetches of the canonical URL
    - ``n_versions``   distinct content fingerprints ever seen
    - ``n_changes``    consecutive-capture transitions (fp != previous fp)
    - ``change_rate``  n_changes / (n_captures - 1), 0.0 for singletons
    - ``first_ts`` / ``last_ts``   capture-time span
    - ``stale_hours``  hours between the LAST content change and the last
      capture — large values mean the page stopped changing and the
      scheduler can back off

    The fingerprint is ``md5`` of the payload text (same function, same
    hex output in Spark and DuckDB, so the oracle checks values).

    Scale shape: ONE shuffle. The lag window partitions by canonical URL
    — per-URL capture counts are bounded (a crawl fetches any one URL at
    most a few hundred times), so no partition skews — and the groupBy
    that follows keys on the same column, so Catalyst reuses the window's
    exchange instead of shuffling again. Nothing is collected; nothing
    broadcasts.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("canonical_url").orderBy(ts_col, "doc_id")
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    c = (
        pages.withColumn("canonical_url", canonical_url_col(url_col))
        .withColumn("fp", fp)
        .withColumn("prev_fp", F.lag("fp").over(w))
    )
    changed = F.col("prev_fp").isNotNull() & (F.col("fp") != F.col("prev_fp"))
    # a URL's "last change" is the latest capture that introduced new
    # content; the first capture counts (it introduced the page)
    change_ts = F.when(
        F.col("prev_fp").isNull() | (F.col("fp") != F.col("prev_fp")),
        F.col(ts_col),
    )
    agg = c.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_captures"),
        F.countDistinct("fp").cast("long").alias("n_versions"),
        F.sum(changed.cast("long")).alias("n_changes"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        F.max(change_ts).alias("last_change_ts"),
    )
    return agg.select(
        "canonical_url",
        "n_captures",
        "n_versions",
        "n_changes",
        F.when(F.col("n_captures") > 1,
               _trunc6(F.col("n_changes") / (F.col("n_captures") - 1)))
         .otherwise(F.lit(0.0)).alias("change_rate"),
        "first_ts",
        "last_ts",
        F.expr("timestampdiff(HOUR, last_change_ts, last_ts)")
         .cast("long").alias("stale_hours"),
    )


def _snapshot_latest(
    pages: DataFrame, url_col: str, ts_col: str, text_col: str
) -> DataFrame:
    """One row per canonical URL: the NEWEST capture's content
    fingerprint (struct-max, same survivor rule as :func:`latest_capture`
    — ties on the timestamp break to the lowest doc_id)."""
    pick = F.max(
        F.struct(
            F.col(ts_col).alias("ts"),
            (-F.col("doc_id")).alias("nid"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fp"),
        )
    )
    return (
        pages.withColumn("canonical_url", canonical_url_col(url_col))
        .groupBy("canonical_url")
        .agg(pick.alias("p"))
        .select(
            "canonical_url",
            F.col("p.ts").alias("ts"),
            F.col("p.fp").alias("fp"),
        )
    )


def crawl_diff(
    old_pages: DataFrame,
    new_pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Delta between two crawl snapshots, per canonical URL.

    The standard between-crawls report (Common Crawl publishes exactly
    this per monthly archive; incremental index builds and freshness
    studies consume it): reduce each snapshot to its newest capture per
    canonical URL, then full-outer-join the two sides and classify:

    - ``added``     URL present only in the new snapshot
    - ``gone``      URL present only in the old snapshot
    - ``changed``   both sides, content fingerprints differ
    - ``unchanged`` both sides, identical fingerprint

    Output: (canonical_url, verdict, old_ts, new_ts, old_fp, new_fp) —
    absent sides carry NULL ts and '' fp so the relation stays
    NULL-light for downstream counting.

    Scale shape: each side is ONE map-side-combined struct-max groupBy on
    canonical_url, and the full-outer join keys on the same column, so
    both sides arrive at the join already partitioned by the join key —
    Catalyst reuses the aggregation exchanges and the join adds NO new
    shuffle. Nothing broadcasts (both sides are corpus-scale); nothing
    is collected.
    """
    old = _snapshot_latest(old_pages, url_col, ts_col, text_col)
    new = _snapshot_latest(new_pages, url_col, ts_col, text_col)
    j = old.alias("o").join(
        new.alias("n"), on="canonical_url", how="full_outer"
    )
    verdict = (
        F.when(F.col("o.fp").isNull(), "added")
        .when(F.col("n.fp").isNull(), "gone")
        .when(F.col("o.fp") != F.col("n.fp"), "changed")
        .otherwise("unchanged")
    )
    return j.select(
        "canonical_url",
        verdict.alias("verdict"),
        F.col("o.ts").alias("old_ts"),
        F.col("n.ts").alias("new_ts"),
        F.coalesce(F.col("o.fp"), F.lit("")).alias("old_fp"),
        F.coalesce(F.col("n.fp"), F.lit("")).alias("new_fp"),
    )


def host_degree(edges: DataFrame) -> DataFrame:
    """Degree / reciprocity features per host over the link graph — the
    classic link-spam signal set (TrustRank-era heuristics; a link farm
    shows near-1.0 reciprocity while legitimate hubs are asymmetric, and
    in/out imbalance separates scrapers from authorities).

    Input: ``edges(src, dst)`` raw host-edge rows (the
    :func:`link_graph` output or any (src, dst) relation; duplicate rows
    count as link multiplicity). Self-loops are dropped. Output, one row
    per host that appears on either side:

    - ``out_degree`` / ``in_degree``   distinct neighbor counts
    - ``out_links``  / ``in_links``    link-multiplicity sums
    - ``n_reciprocal``                 distinct neighbors linked BOTH ways
    - ``reciprocity``                  n_reciprocal / out_degree (trunc6,
      0.0 for pure sinks)

    Scale shape: everything runs on the DISTINCT edge-pair relation
    (one map-side-combined groupBy collapses multiplicity first), which
    is orders of magnitude narrower than the page corpus; the mirror
    check is a left-semi self-join on the swapped key — never an
    all-pairs or a collect. The final assembly joins three per-host
    aggregates that all key on the host column, so they co-partition.
    """
    pairs = (
        edges.where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )
    mirror = pairs.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = pairs.join(mirror, ["src", "dst"], "left_semi")
    out = pairs.groupBy(F.col("src").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("out_degree"),
        F.sum("n_links").cast("long").alias("out_links"),
    )
    inn = pairs.groupBy(F.col("dst").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("in_degree"),
        F.sum("n_links").cast("long").alias("in_links"),
    )
    rec = recip.groupBy(F.col("src").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_reciprocal")
    )
    j = (
        out.join(inn, "host", "full_outer")
        .join(rec, "host", "left_outer")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
    return j.select(
        "host",
        z("out_degree"),
        z("in_degree"),
        z("out_links"),
        z("in_links"),
        z("n_reciprocal"),
        F.when(
            F.coalesce(F.col("out_degree"), F.lit(0)) > 0,
            _trunc6(
                F.coalesce(F.col("n_reciprocal"), F.lit(0))
                / F.col("out_degree")
            ),
        ).otherwise(F.lit(0.0)).alias("reciprocity"),
    )


def frontier_urls(
    links: DataFrame, crawled: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Crawl-frontier expansion: link targets not yet fetched.

    The BFS step every crawler runs between waves (Mercator/Heritrix
    frontier semantics): canonicalize every resolved outlink target,
    subtract the already-crawled canonical URL set, and rank what's left
    by discovery mass. Fragment self-links vanish here by construction —
    canonicalization drops the fragment, so ``page#top`` folds onto the
    already-crawled page and the anti-join removes it.

    Input: ``links`` — the :func:`operators.extract.extract_links`
    relation (``resolved`` absolute target + source page ``url``);
    ``crawled`` — the fetched page table. Output, one row per
    undiscovered canonical URL:

    - ``host``              the target's canonical host (budget key)
    - ``n_refs``            total referring links (frontier priority —
      most-cited-first is the classic BFS ordering)
    - ``n_referrer_pages``  distinct referring source pages

    Scale shape: one map-side-combined groupBy on the canonical target,
    one distinct on the crawled side, and a left-anti join that keys on
    the same column — both sides arrive pre-partitioned, so the
    anti-join reuses the exchanges. The crawled side never broadcasts
    (it is corpus-scale by definition).
    """
    discovered = (
        links.withColumn("canonical_url", canonical_url_col("resolved"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_refs"),
            F.countDistinct(url_col).cast("long").alias("n_referrer_pages"),
        )
    )
    seen = (
        crawled.withColumn("canonical_url", canonical_url_col(url_col))
        .select("canonical_url")
        .distinct()
    )
    host = f"regexp_extract(canonical_url, '{_ANY_HOST_RE}', 1)"
    return discovered.join(seen, "canonical_url", "left_anti").select(
        "canonical_url",
        F.expr(host).alias("host"),
        "n_refs",
        "n_referrer_pages",
    )


def mime_norm_sql(col: str) -> str:
    """Canonical Content-Type normalization — media type lowercased,
    parameters stripped, NULL-safe.  The ONE expression shared by
    :func:`header_census`'s mime facet and :func:`mime_verdicts`, so
    the two relations can never disagree on what counts as a type."""
    return f"lower(trim(split_part(coalesce({col}, ''), ';', 1)))"


def header_census(headers: DataFrame) -> DataFrame:
    """Crawl-ops census over the HTTP-header relation — the
    server-technology / MIME / charset / status breakdown every crawl
    archive publishes (Common Crawl's stats pages, the HTTP Archive's
    "state of the web" tables are exactly these four facets).

    Input: the :func:`operators.extract.warc_http_headers` relation
    ``(url, rec_no, h_no, name, value, http_status)``. Output one row per
    ``(facet, key)``:

    - ``mime``     media type of ``Content-Type`` (parameters stripped,
      lowercased)
    - ``charset``  the ``charset=`` parameter when present (lowercased)
    - ``server``   the ``Server`` product token (before ``/``, lowercased)
    - ``status``   the HTTP status code (counted once per response
      record via its first header row, not once per header)

    with ``n_headers`` (facet occurrences) and ``n_pages`` (distinct
    source documents).

    Scale shape: the four facets are generated in ONE pass with a
    per-row conditional struct array + explode (no four-scan union —
    the upstream relation is a Pandas-kernel product and must be read
    once), then a single map-side-combined groupBy. Nothing broadcasts;
    nothing is collected.
    """
    mime = mime_norm_sql("value")
    charset = "lower(regexp_extract(value, 'charset=([A-Za-z0-9_\\\\-]+)', 1))"
    server = "lower(split_part(trim(value), '/', 1))"
    facets = F.expr(
        "filter(array("
        f"CASE WHEN name = 'content-type' AND {mime} <> '' "
        f"  THEN struct('mime' AS facet, {mime} AS key) END, "
        f"CASE WHEN name = 'content-type' AND {charset} <> '' "
        f"  THEN struct('charset' AS facet, {charset} AS key) END, "
        f"CASE WHEN name = 'server' AND {server} <> '' "
        f"  THEN struct('server' AS facet, {server} AS key) END, "
        "CASE WHEN h_no = 0 AND http_status IS NOT NULL "
        "  THEN struct('status' AS facet, "
        "cast(http_status AS string) AS key) END"
        "), x -> x IS NOT NULL)"
    )
    return (
        headers.select("url", F.explode(facets).alias("f"))
        .groupBy(F.col("f.facet").alias("facet"), F.col("f.key").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_headers"),
            F.countDistinct("url").cast("long").alias("n_pages"),
        )
    )


def robots_directives(
    robots: DataFrame, host_col: str = "host", payload_col: str = "payload"
) -> DataFrame:
    """robots.txt corpus → one row per directive, with RFC 9309 group
    structure resolved DECLARATIVELY — no Python kernel anywhere: lines
    via posexplode, comment strip / field split via string expressions,
    and the group grammar (consecutive ``User-agent`` lines extend a
    group, any other directive closes it) via a lag window over the
    per-host line order. Semantics match :func:`parse_robots` exactly
    (property-tested against it on randomized files).

    Input: one robots.txt per host ``(host, payload)``. Output:
    ``(host, line_no, group_id, in_star, field, value)`` — ``group_id``
    numbers groups 1..n per host (0 = a stray rule before any group),
    ``in_star`` marks directives whose group names ``*``. Comment-only,
    blank, and colon-less lines emit no row (and per the RFC do NOT
    close a group). ``Sitemap`` rows carry their surrounding group id
    but are group-independent by spec — consumers ignore it.

    Scale shape: ONE shuffle total. The lag window partitions by host;
    the group-id running sum and the per-(host, group) star flag are
    windows whose partition keys are supersets of ``host``, so they
    reuse the same exchange (extra sorts, no extra shuffles). robots.txt
    files are bounded (500 KiB per RFC 9309 §2.4) so host partitions
    cannot skew.
    """
    from pyspark.sql.window import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.coalesce(F.col(payload_col), F.lit("")), "\r?\n")
        ).alias("line_no", "raw"),
    )
    clean = F.expr("trim(split_part(raw, '#', 1))")
    d = (
        lines.withColumn("clean", clean)
        .where("instr(clean, ':') > 0")
        .select(
            "host",
            "line_no",
            F.expr("lower(trim(substring_index(clean, ':', 1)))").alias(
                "field"
            ),
            F.expr("trim(substring(clean, instr(clean, ':') + 1))").alias(
                "value"
            ),
        )
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("field") == "user-agent"
    d = d.withColumn(
        "group_start",
        (is_ua & F.coalesce(F.lag("field").over(w) != "user-agent",
                            F.lit(True))).cast("long"),
    ).withColumn(
        "group_id",
        F.sum("group_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    star = F.max(
        (is_ua & (F.col("value") == "*")).cast("int")
    ).over(Window.partitionBy("host", "group_id"))
    return d.select(
        "host",
        "line_no",
        F.col("group_id").cast("long").alias("group_id"),
        (star == 1).alias("in_star"),
        "field",
        "value",
    )


def robots_stats(directives: DataFrame) -> DataFrame:
    """Per-host robots.txt profile over :func:`robots_directives` — the
    crawl-ops dashboard row (robots adoption censuses publish exactly
    these: how many hosts disallow everything, set Crawl-delay, ship
    sitemaps):

    - ``n_groups``       user-agent groups in the file
    - ``n_star_rules``   allow/disallow rules binding to ``*``
    - ``disallow_all``   a star-group ``Disallow: /`` exists
    - ``crawl_delay``    star-group Crawl-delay seconds (max if repeated,
      NULL when absent or non-numeric)
    - ``n_sitemaps``     Sitemap directives (group-independent per spec)

    One map-side-combined groupBy on host — keyed identically to the
    directive windows, so stacked on :func:`robots_directives` the whole
    profile still costs ONE shuffle.
    """
    in_star = F.col("in_star")
    rule = F.col("field").isin("allow", "disallow")
    return directives.groupBy("host").agg(
        F.max("group_id").cast("long").alias("n_groups"),
        F.sum((rule & in_star).cast("long")).alias("n_star_rules"),
        F.max(
            in_star
            & (F.col("field") == "disallow")
            & (F.col("value") == "/")
        ).alias("disallow_all"),
        F.max(
            F.when(
                in_star & (F.col("field") == "crawl-delay"),
                F.expr("try_cast(value AS DOUBLE)"),
            )
        ).alias("crawl_delay"),
        F.sum((F.col("field") == "sitemap").cast("long")).alias("n_sitemaps"),
    )


def polite_schedule(
    frontier: DataFrame,
    robots: DataFrame,
    default_delay: float = 1.0,
    max_delay: float = 30.0,
) -> DataFrame:
    """Politeness-aware fetch schedule over the crawl frontier — the
    Mercator/Heritrix per-host queue discipline (one connection per
    host, Crawl-delay honored) expressed relationally.

    Inputs: ``frontier`` — :func:`frontier_urls` output
    ``(canonical_url, host, n_refs, ...)``; ``robots`` — the per-host
    :func:`robots_stats` profile. Hosts whose star group disallows
    everything are dropped entirely (fetching them violates the REP);
    hosts without a robots row (or without a numeric Crawl-delay) get
    ``default_delay``, and declared delays are clamped to ``max_delay``
    — production crawlers cap, else one host setting ``86400`` parks
    its queue for a day per URL.

    Output, one row per schedulable frontier URL:

    - ``slot``         0-based position in the host's fetch queue
      (most-referenced first, URL as the deterministic tie-break)
    - ``delay_s``      the effective inter-fetch delay for the host
    - ``not_before_s`` earliest fetch time relative to the host queue's
      start: ``slot * delay_s``

    Scale shape: the robots profile joins on ``host`` and the queue
    window partitions on ``host`` — same key, so the window reuses the
    join's exchange (one shuffle per side, no broadcast of the
    corpus-scale frontier; the robots side is one row per host and
    shuffles, it never needs to fit in memory). Per-host queue windows
    are bounded by the host-cap upstream, so no window partition can
    absorb the whole corpus.
    """
    from pyspark.sql.window import Window

    prof = robots.select(
        "host",
        F.coalesce("disallow_all", F.lit(False)).alias("_nofetch"),
        F.least(
            F.coalesce("crawl_delay", F.lit(float(default_delay))),
            F.lit(float(max_delay)),
        ).alias("delay_s"),
    )
    joined = frontier.join(prof, "host", "left")
    keep = joined.where(~F.coalesce("_nofetch", F.lit(False)))
    w = Window.partitionBy("host").orderBy(
        F.desc("n_refs"), F.asc("canonical_url")
    )
    delay = F.coalesce("delay_s", F.lit(float(default_delay)))
    return (
        keep.withColumn("slot", (F.row_number().over(w) - 1).cast("long"))
        .select(
            "host",
            "canonical_url",
            "n_refs",
            "slot",
            delay.alias("delay_s"),
            (F.col("slot") * delay).alias("not_before_s"),
        )
    )


def url_templates(
    pages: DataFrame,
    url_col: str = "url",
    trap_min_urls: int = 100,
    trap_min_share: float = 0.5,
) -> DataFrame:
    """Per-host URL path-template mining — the crawler-trap detector.

    Crawler traps (infinite calendars, session-id paths, faceted-search
    grids) show up as ONE path template absorbing most of a host's
    distinct URLs: digit runs in the canonical path are folded to
    ``{n}`` and the resulting templates are censused per host. The trap
    flag fires when a parameterized template both exceeds
    ``trap_min_urls`` distinct URLs and carries ≥ ``trap_min_share`` of
    the host's URL mass — Heritrix's path-ology filter and IRLbot's
    spam/ trap budgeting key on exactly this signal.

    Output, one row per ``(host, template)``:
    ``depth`` (path segments), ``n_urls`` (distinct canonical URLs),
    ``host_share`` (fraction of the host's distinct URLs), ``trap``.

    Scale shape: the corpus-sized data crosses ONE distinct-aggregate
    exchange (countDistinct over ``(host, template)``, partial agg
    map-side); the host-total window then re-exchanges only the
    aggregated ``(host, template)`` relation — template cardinality per
    host is tiny by construction (that is the point of templating), so
    that second shuffle moves kilobytes, not the corpus. Nothing
    broadcasts, nothing collects.
    """
    from pyspark.sql.window import Window

    canon = _canonical_url_sql(url_col)
    path0 = f"regexp_extract({canon}, '{_PATH_RE}', 1)"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    base = pages.select(
        F.expr(canon).alias("canonical_url"),
        host_col(url_col).alias("host"),
        F.expr(
            f"regexp_replace({path}, '[0-9]+', '{{n}}')"
        ).alias("template"),
    )
    g = base.groupBy("host", "template").agg(
        F.countDistinct("canonical_url").cast("long").alias("n_urls")
    )
    host_total = F.sum("n_urls").over(Window.partitionBy("host"))
    share = F.col("n_urls") / host_total
    return g.select(
        "host",
        "template",
        (F.size(F.split("template", "/")) - 1).cast("long").alias("depth"),
        "n_urls",
        share.alias("host_share"),
        (
            F.col("template").contains("{n}")
            & (F.col("n_urls") >= int(trap_min_urls))
            & (share >= float(trap_min_share))
        ).alias("trap"),
    )


def host_trustrank(
    edges: DataFrame, seeds: DataFrame, iterations: int = 5
) -> DataFrame:
    """TrustRank over the host link graph (Gyöngyi, Garcia-Molina &
    Pedersen, VLDB 2004) — the link-spam demotion prior: PageRank with
    the teleport mass restricted to a curated trusted-seed set, so
    trust attenuates with link distance from the seeds and hosts
    unreachable from any seed score exactly zero (the property the spam
    filter keys on; plain PageRank gives every spam island its 0.15
    floor).

    ``seeds`` is a (host) relation; seeds absent from the graph carry
    no mass. Integer-exact like :func:`host_pagerank`: the seed
    distribution is ``1e6 DIV n_seeds`` on each in-graph seed, and the
    update is ``(15·base + 85·Σ contrib) DIV 100`` — one floor per
    step, so the trajectory is engine- and partitioning-independent.
    ``n_seeds`` is the one driver-held scalar (bounded model state,
    like the IVF codebook); everything else stays distributed.

    Scale shape: identical to :func:`host_pagerank` — per sweep one
    equi-join on the host key + one map-side-combined groupBy, edges
    persisted once, per-iteration ``localCheckpoint`` keeps plan depth
    constant. The seed set joins on host (left-semi shape); it is never
    assumed broadcastable.
    """
    if iterations <= 0:
        raise ValueError(f"iterations ({iterations}) must be positive")
    # eager localCheckpoint (not persist/unpersist): the returned plan
    # still references these relations, so they must stay materialized
    # after this function exits — checkpoint blocks are freed by the
    # ContextCleaner when the result goes out of scope
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("h"))
        .union(e.select(F.col("dst").alias("h")))
        .distinct()
    )
    sd = seeds.select(F.col(seeds.columns[0]).alias("h")).distinct()
    nodes = (
        nodes.join(sd.withColumn("_s", F.lit(True)), "h", "left")
        .select("h", F.coalesce("_s", F.lit(False)).alias("is_seed"))
        .localCheckpoint(eager=True)
    )
    n_seeds = nodes.where("is_seed").count()  # driver scalar
    if n_seeds == 0:
        raise ValueError("no seed host is present in the edge graph")
    base_scaled = 1_000_000 // n_seeds
    base = F.when(F.col("is_seed"), F.lit(base_scaled)).otherwise(
        F.lit(0)
    ).cast("long")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select("h", base.alias("r"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["h"])
            .join(deg, "src")
            .select(F.col("dst").alias("h"), F.expr("r DIV outdeg").alias("c"))
            .groupBy("h")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "h", "left")
            .select(
                "h",
                F.expr(
                    f"(15 * (CASE WHEN is_seed THEN {base_scaled} ELSE 0 END)"
                    " + 85 * coalesce(c, 0)) DIV 100"
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        nodes.join(ranks, "h")
        .select(
            F.col("h").alias("host"),
            "is_seed",
            F.col("r").alias("trust_scaled"),
            (F.col("r").cast("double") / F.lit(1e6)).alias("trust"),
        )
    )


def host_spam_mass(
    edges: DataFrame, seeds: DataFrame, iterations: int = 5
) -> DataFrame:
    """Estimated spam mass per host (Gyöngyi, Berkhin, Garcia-Molina &
    Pedersen, "Link Spam Detection Based on Mass Estimation", VLDB
    2006): the fraction of a host's PageRank that is NOT accounted for
    by rank flowing from a trusted-seed core.  Hosts whose rank comes
    almost entirely from unknown/spam neighborhoods score near 1; hosts
    endorsed by the seed-reachable web score near 0 — the demotion
    signal big-crawl curation applies on top of raw PageRank.

    Fused sweep — the reason this is not just
    ``host_pagerank ⋈ host_trustrank``: both power iterations share the
    same edge relation, the same out-degree relation and the same join
    key, so the state is carried as ONE two-column rank relation
    ``(h, r, t)`` and every sweep costs a single equi-join plus a
    single map-side-combined groupBy for BOTH vectors — half the
    shuffles of running the operators separately, which is the bill
    that matters on a 10^8-host graph.  Per-iteration
    ``localCheckpoint`` keeps the plan depth constant (same lineage
    discipline as :func:`host_pagerank`).

    Integer-exact like its parents: PageRank is the per-node-scale
    iteration (init 1e6, update ``150000 + (85·Σ r DIV outdeg) DIV
    100``) and TrustRank the distribution-scale one (seeds init
    ``1e6 DIV n_seeds``, update ``(15·base + 85·Σ) DIV 100``).  The two
    scales are reconciled by multiplying trust by ``n_nodes`` (both
    then approximate the stationary vector × n·1e6), giving

    - ``spam_mass_scaled = max(0, rank_scaled − trust_scaled·n)`` —
      absolute unexplained rank, and
    - ``spam_mass_bp = clamp(10000 − (trust_scaled·n·10000) DIV
      rank_scaled, 0, 10000)`` — the relative mass in basis points.

    All divisions are floor-on-nonnegative so the result is bit-equal
    across engines and partitionings.  The bp product is bounded by
    ``1e10 · n_nodes`` and therefore int64-safe up to ~9·10^8 hosts —
    the size of the full public web host graph; beyond that, rescale to
    percent.  ``n_seeds`` / ``n_nodes`` are the two driver-held scalars
    (bounded model state); nothing corpus-sized is collected or
    broadcast.
    """
    if iterations <= 0:
        raise ValueError(f"iterations ({iterations}) must be positive")
    # eager localCheckpoint, not persist/unpersist — the returned plan
    # references e/nodes (see host_trustrank)
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sd = seeds.select(F.col(seeds.columns[0]).alias("h")).distinct()
    nodes = (
        e.select(F.col("src").alias("h"))
        .union(e.select(F.col("dst").alias("h")))
        .distinct()
        .join(sd.withColumn("_s", F.lit(True)), "h", "left")
        .select("h", F.coalesce("_s", F.lit(False)).alias("is_seed"))
        .localCheckpoint(eager=True)
    )
    counts = nodes.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_seed").cast("long")).alias("s"),
    ).first()
    n_nodes, n_seeds = counts["n"], int(counts["s"])  # driver scalars
    if n_seeds == 0:
        raise ValueError("no seed host is present in the edge graph")
    base_scaled = 1_000_000 // n_seeds
    tbase = (
        F.when(F.col("is_seed"), F.lit(base_scaled))
        .otherwise(F.lit(0))
        .cast("long")
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    state = nodes.select(
        "h", F.lit(1_000_000).cast("long").alias("r"), tbase.alias("t")
    )
    for _ in range(iterations):
        contrib = (
            e.join(state, e["src"] == state["h"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("h"),
                F.expr("r DIV outdeg").alias("cr"),
                F.expr("t DIV outdeg").alias("ct"),
            )
            .groupBy("h")
            .agg(F.sum("cr").alias("cr"), F.sum("ct").alias("ct"))
        )
        state = (
            nodes.join(contrib, "h", "left")
            .select(
                "h",
                (
                    F.lit(150_000) + F.expr("(85 * coalesce(cr, 0)) DIV 100")
                ).cast("long").alias("r"),
                F.expr(
                    f"(15 * (CASE WHEN is_seed THEN {base_scaled} ELSE 0 END)"
                    " + 85 * coalesce(ct, 0)) DIV 100"
                ).cast("long").alias("t"),
            )
            .localCheckpoint(eager=True)
        )
    tnorm = F.col("t") * F.lit(int(n_nodes))
    return nodes.join(state, "h").select(
        F.col("h").alias("host"),
        "is_seed",
        F.col("r").alias("rank_scaled"),
        F.col("t").alias("trust_scaled"),
        F.greatest(F.lit(0).cast("long"), F.col("r") - tnorm).alias(
            "spam_mass_scaled"
        ),
        F.least(
            F.lit(10_000).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.lit(10_000)
                - F.expr(f"(t * {int(n_nodes)} * 10000) DIV r"),
            ),
        ).alias("spam_mass_bp"),
    )


SYNTH_REDIRECT_SQL = """
    SELECT concat('https://r.example.org/u', cast(k as int)) AS url,
           CASE WHEN k % 8 = 0 THEN 200
                WHEN k % 8 = 7 THEN 302
                WHEN k % 8 = 6 THEN 301
                ELSE 301 END AS status,
           CASE WHEN k % 8 = 0 THEN ''
                WHEN k % 8 = 6 THEN
                    concat('https://r.example.org/u', cast(k as int))
                WHEN k % 8 = 7 THEN
                    concat('https://external.example.net/x', cast(k as int))
                ELSE concat('https://r.example.org/u', cast(k - 1 as int))
                END AS location
    FROM (SELECT DISTINCT cast(doc_id % 40 as int) AS k FROM documents)
"""


def synth_redirects(documents: DataFrame) -> DataFrame:
    """The SYNTH_REDIRECT_SQL corpus as a DataFrame: 40 URLs in 5
    families — 200 endpoints, 1..5-hop 301 chains, a self-loop, and a
    redirect to an absent (dangling) external target."""
    return documents.sparkSession.sql(
        SYNTH_REDIRECT_SQL.replace("FROM documents", "FROM {documents}"),
        documents=documents,
    )


def redirect_chains(responses: DataFrame, max_hops: int = 8) -> DataFrame:
    """Resolve every URL's redirect chain over a ``(url, status,
    location)`` response relation — the canonicalization step between
    fetch and index (RFC 9110 §15.4; crawlers follow a bounded number
    of 3xx hops, then classify): one output row per input URL with

    - ``final_url`` — where the chain ends,
    - ``n_hops`` — redirects followed (0 for a non-redirect row),
    - ``verdict`` — ``resolved`` (ended on a fetched non-redirect URL),
      ``dangling`` (ended on a URL absent from the relation),
      ``loop`` (the next target was already on this chain's path —
      ``final_url`` is the repeated URL, the closing hop counts),
      ``truncated`` (still redirecting after ``max_hops``).

    Determinism: a URL captured more than once collapses to its
    minimum ``(status, location)`` pair before any edge is formed, so
    the chain map is a function and the output partition-invariant.

    Scale shape: the redirect map is corpus-sized and is NEVER
    broadcast or collected — each hop is one equi-join of the
    still-pending frontier against the map on the URL key, plus one
    small join against the distinct-URL relation at finalization; the
    frontier only shrinks, AQE right-sizes the post-hop partitions, and
    per-hop ``localCheckpoint`` keeps plan depth constant.  Loop
    detection carries the path as a ≤``max_hops``-element array —
    bounded row width, no visited-set state.  ``max_hops`` joins total
    (crawlers use 5-10; Googlebot stops at 10).
    """
    if max_hops <= 0:
        raise ValueError(f"max_hops ({max_hops}) must be positive")
    # eager localCheckpoint: the returned union references redirects/
    # urls (both derived from base) lazily, so base must stay
    # materialized after this function returns — persist/unpersist
    # would force the corpus-wide dedup groupBy to re-run per branch
    base = (
        responses.select("url", "status", "location")
        .groupBy("url")
        .agg(F.min(F.struct("status", "location")).alias("s"))
        .select("url", F.col("s.status").alias("status"),
                F.col("s.location").alias("location"))
        .localCheckpoint(eager=True)
    )
    is_redir = (
        (F.col("status") >= 300) & (F.col("status") < 400)
        & F.col("location").isNotNull() & (F.col("location") != "")
    )
    redirects = base.where(is_redir).select(
        F.col("url").alias("src"), F.col("location").alias("dst")
    )
    urls = base.select(F.col("url").alias("known_url")).distinct()
    pending = base.select(
        F.col("url").alias("start"),
        F.col("url").alias("cur"),
        F.array("url").alias("path"),
        F.lit(0).alias("hops"),
    ).localCheckpoint(eager=True)
    done = []
    for _ in range(max_hops):
        j = pending.join(
            redirects, pending["cur"] == redirects["src"], "left"
        ).select("start", "cur", "path", "hops", "dst")
        ended = j.where(F.col("dst").isNull()).join(
            urls, F.col("cur") == F.col("known_url"), "left"
        )
        done.append(
            ended.select(
                F.col("start").alias("url"),
                F.col("cur").alias("final_url"),
                F.col("hops").cast("int").alias("n_hops"),
                F.when(F.col("known_url").isNotNull(), F.lit("resolved"))
                .otherwise(F.lit("dangling")).alias("verdict"),
            )
        )
        looped = j.where(
            F.col("dst").isNotNull() & F.array_contains("path", F.col("dst"))
        )
        done.append(
            looped.select(
                F.col("start").alias("url"),
                F.col("dst").alias("final_url"),
                (F.col("hops") + 1).cast("int").alias("n_hops"),
                F.lit("loop").alias("verdict"),
            )
        )
        pending = (
            j.where(
                F.col("dst").isNotNull()
                & ~F.array_contains("path", F.col("dst"))
            )
            .select(
                "start",
                F.col("dst").alias("cur"),
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
                (F.col("hops") + 1).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    # final classification: a chain whose cursor stopped redirecting at
    # exactly max_hops has resolved (the crawler fetches it) — only the
    # still-redirecting remainder is truncated
    tail = (
        pending.join(redirects, pending["cur"] == redirects["src"], "left")
        .join(urls, F.col("cur") == F.col("known_url"), "left")
    )
    done.append(
        tail.select(
            F.col("start").alias("url"),
            F.col("cur").alias("final_url"),
            F.col("hops").cast("int").alias("n_hops"),
            F.when(F.col("dst").isNotNull(), F.lit("truncated"))
            .when(F.col("known_url").isNotNull(), F.lit("resolved"))
            .otherwise(F.lit("dangling")).alias("verdict"),
        )
    )
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out


#: Declared-MIME → sniffed-format family expectation (RFC 9110
#: Content-Type semantics vs magic-byte reality).  Single source of
#: truth for :func:`mime_verdicts` and its DuckDB twin.
MIME_FORMAT_MAP: dict = {
    "text/html": "html",
    "application/xhtml+xml": "html",
    "application/pdf": "pdf",
    "text/xml": "xml",
    "application/xml": "xml",
    "application/rss+xml": "xml",
    "application/atom+xml": "xml",
    "text/plain": "text",
    "text/markdown": "md",
    "text/csv": "csv",
    "application/json": "json",
    "application/ld+json": "json",
    "image/png": "image",
    "image/jpeg": "image",
    "image/gif": "image",
    "image/webp": "image",
    "application/zip": "zip",
    "application/gzip": "gzip",
    "application/x-gzip": "gzip",
    "application/msword": "cfb",
    "application/rtf": "rtf",
    "text/rtf": "rtf",
    "message/rfc822": "mime",
    "audio/wav": "audio",
    "audio/x-wav": "audio",
}


def mime_verdicts(
    pages: DataFrame, max_bytes: int = 20 * 1024 * 1024
) -> DataFrame:
    """Declared Content-Type vs magic-byte reality, per capture — the
    polyglot/mislabel census crawl QA runs before routing payloads to
    format backends (mislabeled text/html PDFs are the classic
    extraction-pipeline poison; security scanners flag the same skew as
    MIME-confusion risk).

    Input ``(url, mime, html: binary)``; output one row per capture:

    - ``mime_norm`` — media type lowercased, parameters stripped
      (``Text/HTML; charset=utf-8`` → ``text/html``), ``''`` if absent,
    - ``expected_format`` — :data:`MIME_FORMAT_MAP` family (``''`` when
      the type is unmapped),
    - ``sniffed_format`` — the shared magic-byte sniffer's verdict on
      the actual payload (``''`` for NULL/oversized payloads that were
      never sniffed),
    - ``verdict`` — ``missing_mime`` / ``unknown_mime`` /
      ``unsniffable`` (payload absent or over ``max_bytes`` — NOT
      counted as a mismatch: a healthy 25 MiB PDF is not a mislabel) /
      ``ok`` / ``mismatch``.  Strict family equality otherwise,
      deliberately: a text/csv payload that sniffs as prose IS a
      routing discrepancy.

    Scale shape: the sniff is an Arrow-batched ``mapInPandas`` over the
    first 4 KiB of each payload (the sniffer never reads further);
    normalization + mapping + verdict are pure JVM column expressions —
    zero shuffles end to end, so the relation feeds a groupBy census
    (:func:`mime_census`) at one exchange total.
    """
    from typing import Iterator as _It

    import pandas as _pd

    def kernel(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        from doc_parser_spark.core import sniff as _sniff

        for batch in batches:
            records = []
            for url, mime, payload in zip(
                batch["url"], batch["mime"], batch["html"]
            ):
                if payload is None or len(payload) > max_bytes:
                    fmt = ""  # never sniffed — distinct from 'unknown'
                else:
                    fmt = _sniff.sniff_format(bytes(payload))
                records.append((url, mime, fmt))
            yield _pd.DataFrame(
                records, columns=["url", "mime", "sniffed_format"]
            )

    sniffed = pages.select("url", "mime", "html").mapInPandas(
        kernel, schema="url string, mime string, sniffed_format string"
    )
    expected = F.lit("")
    for mt in sorted(MIME_FORMAT_MAP):  # deterministic CASE order
        expected = F.when(
            F.col("mime_norm") == mt, F.lit(MIME_FORMAT_MAP[mt])
        ).otherwise(expected)
    return (
        sniffed.withColumn("mime_norm", F.expr(mime_norm_sql("mime")))
        .withColumn("expected_format", expected)
        .select(
            "url",
            "mime_norm",
            "expected_format",
            "sniffed_format",
            F.when(F.col("mime_norm") == "", F.lit("missing_mime"))
            .when(F.col("expected_format") == "", F.lit("unknown_mime"))
            .when(F.col("sniffed_format") == "", F.lit("unsniffable"))
            .when(
                F.col("expected_format") == F.col("sniffed_format"),
                F.lit("ok"),
            )
            .otherwise(F.lit("mismatch"))
            .alias("verdict"),
        )
    )


def mime_census(verdicts: DataFrame) -> DataFrame:
    """Roll :func:`mime_verdicts` up to the published census shape:
    captures per (declared type, expected family, sniffed family,
    verdict).  One map-side-combined groupBy — the single exchange of
    the whole mime-audit pipeline."""
    return verdicts.groupBy(
        "mime_norm", "expected_format", "sniffed_format", "verdict"
    ).agg(F.count(F.lit(1)).alias("n_captures"))


def hreflang_clusters(alts: DataFrame) -> DataFrame:
    """Translation clusters from the hreflang annotation relation
    (``extract_hreflang`` output ``(url, hreflang, href)``): pages
    connected by ``alternate``/``hreflang`` references form one
    multilingual document group — the unit multilingual corpus curation
    dedups/aligns on (keep one language per cluster, or pair variants
    for parallel-text mining).

    Output one row per member URL (declaring pages AND referenced-only
    targets): ``cluster_id`` (smallest URL in the component),
    ``cluster_size``, ``ref_langs`` (sorted distinct hreflang labels
    pointing at this URL, comma-joined — self-annotations count, per
    the hreflang contract that every page lists itself), ``declares``
    (page emits hreflang links), ``referenced`` (some page, possibly
    itself, targets it).  Non-reciprocal annotation — the most common
    hreflang deployment bug — is exactly ``declares XOR referenced``.

    Scale shape: component labels come from the shared alternating
    large-star/small-star engine (``dedup.dup_clusters`` — same scale
    story as near-dup clustering and ``host_components``); the lang
    census is one map-side-combined groupBy on the target key; the
    final assembly joins on the URL key. Nothing corpus-sized is
    broadcast or collected.
    """
    from . import dedup as _dedup

    # eager localCheckpoint: ref/decl/nodes in the returned plan all
    # read from a after this function exits
    a = alts.select("url", "hreflang", "href").localCheckpoint(eager=True)
    nodes = (
        a.select(F.col("url").alias("doc_id"))
        .union(a.select(F.col("href").alias("doc_id")))
        .distinct()
    )
    pairs = a.select("url", "href").where(F.col("url") != F.col("href"))
    labels = _dedup.dup_clusters(pairs, documents=nodes).select(
        F.col("doc_id").alias("m_url"), F.col("cluster_id")
    )
    ref = a.groupBy(F.col("href").alias("m_url")).agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_set("hreflang"))
        ).alias("ref_langs")
    )
    decl = a.select(F.col("url").alias("m_url")).distinct().withColumn(
        "declares", F.lit(True)
    )
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    out = (
        labels.join(sizes, "cluster_id")
        .join(ref, "m_url", "left")
        .join(decl, "m_url", "left")
        .select(
            F.col("m_url").alias("url"),
            "cluster_id",
            "cluster_size",
            F.coalesce("ref_langs", F.lit("")).alias("ref_langs"),
            F.coalesce("declares", F.lit(False)).alias("declares"),
            F.col("ref_langs").isNotNull().alias("referenced"),
        )
    )
    return out


def revisit_schedule(
    drift: DataFrame,
    min_hours: int = 1,
    max_hours: int = 720,
    default_hours: int = 168,
) -> DataFrame:
    """Revisit policy from the drift profile (:func:`capture_drift`
    output) — the scheduling half of the Cho & Garcia-Molina refresh
    loop: estimate each URL's content change period from its capture
    history and sample at twice that rate, with back-off for pages that
    stopped changing.  Integer-exact throughout (all ``DIV``/clamp, no
    floats), so the policy is bit-identical across engines — the
    property that lets two crawl controllers agree on a schedule
    without coordinating.

    Rules, first match wins (``span_hours`` = first→last capture):

    - ``cold_start`` — one capture or zero span: ``default_hours``
      (nothing observable yet; weekly by default).
    - ``static`` — multiple captures, zero changes: ``2·span`` (each
      quiet revisit doubles confidence the page is static, so the
      interval grows with the evidence).
    - ``backoff`` — changes were observed but the page has now been
      stale for >4 observed change periods: ``2·period``.
    - ``tracking`` — steady-state: ``period DIV 2`` (sample at twice
      the observed change rate, the classic freshness/cost balance).

    Every branch clamps to ``[min_hours, max_hours]``.  A page that
    changed on every capture of a sub-hour burst yields period 0 and
    clamps to ``min_hours`` — the hottest schedule, as it should.

    Scale shape: a pure projection over the drift relation — zero
    additional shuffles on top of ``capture_drift``'s single exchange.
    """
    if not (1 <= min_hours <= default_hours <= max_hours):
        raise ValueError(
            f"need 1 <= min_hours ({min_hours}) <= default_hours"
            f" ({default_hours}) <= max_hours ({max_hours})"
        )
    d = drift.withColumn(
        "span_hours",
        F.expr("timestampdiff(HOUR, first_ts, last_ts)").cast("long"),
    ).withColumn(
        "change_period_hours",
        F.expr(
            "CASE WHEN n_changes > 0 THEN span_hours DIV n_changes"
            " ELSE CAST(0 AS BIGINT) END"
        ),
    )
    cold = (F.col("n_captures") <= 1) | (F.col("span_hours") <= 0)
    static = F.col("n_changes") == 0
    backoff = F.col("stale_hours") > 4 * F.col("change_period_hours")
    base = (
        F.when(cold, F.lit(default_hours).cast("long"))
        .when(static, 2 * F.col("span_hours"))
        .when(backoff, 2 * F.col("change_period_hours"))
        .otherwise(F.expr("change_period_hours DIV 2"))
    )
    reason = (
        F.when(cold, F.lit("cold_start"))
        .when(static, F.lit("static"))
        .when(backoff, F.lit("backoff"))
        .otherwise(F.lit("tracking"))
    )
    return d.select(
        "canonical_url",
        "n_captures",
        "n_changes",
        "span_hours",
        "change_period_hours",
        "stale_hours",
        F.least(
            F.lit(max_hours).cast("long"),
            F.greatest(F.lit(min_hours).cast("long"), base),
        ).alias("revisit_hours"),
        reason.alias("reason"),
    )


def canonical_verdicts(meta: DataFrame) -> DataFrame:
    """rel=canonical audit over the page-meta relation (``url``,
    ``canonical`` as extracted — possibly relative, possibly empty):
    the indexing-side signal search pipelines resolve before dedup,
    and the deployment-bug census SEO audits publish (canonicals
    pointing at redirecting/canonicalizing targets are ignored by
    Google — the "canonical chain" bug).

    Resolution (RFC 3986 against the page URL): absolute passthrough,
    protocol-relative gets the page scheme, root-relative the page
    authority, directory-relative the page's path dirname (dot-segment
    normalization is NOT applied — disclosed; real canonicals are
    overwhelmingly absolute).  Verdict compares CANONICAL FORMS
    (:func:`canonical_url_col` on both sides — ``www.``/default-port/
    tracking-param/trailing-slash noise does not make a page
    non-self-canonical):

    - ``none`` — no canonical declared,
    - ``self`` — canonical form equals the page's canonical form,
    - ``same_host`` / ``cross_host`` — points at another page, split
      by canonical host bucket.

    ``is_chain`` — the declared target itself declares a non-self
    canonical (one dedup-projected self-join on the canonical-URL key;
    targets outside the relation are unknown and flag false).

    Scale shape: projections plus ONE map-side-combined groupBy and ONE
    equi-join, both on the canonical-URL key — the same key the dedup
    stage shuffles on, so at scale the exchange is shared/bucketable.
    Nothing collects; nothing broadcasts.
    """
    c = "trim(coalesce(canonical, ''))"
    scheme = f"lower(regexp_extract(url, '{_SCHEME_RE}', 1))"
    host = f"regexp_extract(url, '{_HOST_RE}', 1)"
    pagedir = (
        f"regexp_replace(regexp_extract(url, '{_PATH_RE}', 1),"
        " '[^/]*$', '')"
    )
    resolved = (
        f"CASE WHEN {c} = '' THEN NULL "
        f"WHEN {c} RLIKE '{_SCHEME_RE}' THEN {c} "
        f"WHEN {c} LIKE '//%' THEN concat({scheme}, ':', {c}) "
        f"WHEN {c} LIKE '/%' THEN concat({scheme}, '://', {host}, {c}) "
        f"ELSE concat({scheme}, '://', {host}, "
        f"CASE WHEN {pagedir} = '' THEN '/' ELSE {pagedir} END, {c}) END"
    )
    v = (
        meta.select("url", "canonical")
        .withColumn("resolved", F.expr(resolved))
        .withColumn("page_canonical", canonical_url_col("url"))
        .withColumn("canon_canonical", canonical_url_col("resolved"))
        .withColumn(
            "verdict",
            F.when(F.col("resolved").isNull(), F.lit("none"))
            .when(
                F.col("canon_canonical") == F.col("page_canonical"),
                F.lit("self"),
            )
            .when(
                host_col("resolved") == host_col("url"),
                F.lit("same_host"),
            )
            .otherwise(F.lit("cross_host")),
        )
        # eager localCheckpoint, not persist: v feeds both the targets
        # aggregate and the final join, and the returned plan still
        # references it — persist here would leak cached partitions
        .localCheckpoint(eager=True)
    )
    targets = v.groupBy(
        F.col("page_canonical").alias("t_page")
    ).agg(
        F.max(
            F.col("verdict").isin("same_host", "cross_host")
        ).alias("t_nonself")
    )
    out = (
        v.join(targets, v["canon_canonical"] == targets["t_page"], "left")
        .select(
            "url",
            "page_canonical",
            F.coalesce("resolved", F.lit("")).alias("canonical_resolved"),
            "verdict",
            (
                F.col("verdict").isin("same_host", "cross_host")
                & F.coalesce("t_nonself", F.lit(False))
            ).alias("is_chain"),
        )
    )
    return out


def index_verdicts(directives: DataFrame) -> DataFrame:
    """Indexability per URL from robots directives — the gate between
    "fetched" and "belongs in the corpus/index" (Google robots-meta /
    X-Robots-Tag semantics, most-restrictive-wins across every channel
    and tag).  Input is the unioned directive relation ``(url,
    content)`` — rows from ``extract_robots_meta`` and/or
    ``X-Robots-Tag`` header values; a URL with no rows is simply absent
    (the caller left-joins and treats absence as indexable).

    Directive tokens (comma-separated, case/space-insensitive):
    ``noindex`` / ``nofollow`` / ``noarchive`` / ``nosnippet``, with
    ``none`` expanding to ``noindex + nofollow`` per spec.
    ``unavailable_after`` and crawler-scoped precedence are not
    modelled (disclosed — the relation keeps raw rows so a finer
    combiner can be layered later).  ``indexable = NOT noindex``.

    Scale shape: explode to narrow token rows, then ONE map-side-
    combined groupBy on the URL key — flags are ``max`` aggregations,
    so the shuffle carries booleans, not token lists.
    """
    toks = directives.select(
        "url",
        F.explode(
            F.split(F.lower(F.coalesce(F.col("content"), F.lit(""))), ",")
        ).alias("t"),
    ).select("url", F.trim("t").alias("t"))
    noindex = F.max(F.col("t").isin("noindex", "none")).alias("noindex")
    nofollow = F.max(F.col("t").isin("nofollow", "none")).alias("nofollow")
    return (
        toks.groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            noindex,
            nofollow,
            F.max(F.col("t") == "noarchive").alias("noarchive"),
            F.max(F.col("t") == "nosnippet").alias("nosnippet"),
        )
        .withColumn("indexable", ~F.col("noindex"))
    )


def lang_consistency(pages: DataFrame) -> DataFrame:
    """Declared vs detected language per page — the multilingual-corpus
    QA gate (CCNet/OSCAR pipelines drop or re-route pages whose
    ``<html lang>`` contradicts the detector; mismatch rates per host
    also expose template-copied lang attributes, a notorious crawl
    artifact).  Input ``(url, lang_attr, text)`` — the page-meta
    relation joined with extracted text.

    ``declared_lang`` is the primary BCP-47 subtag, lowercased
    (``en-US`` → ``en``); ``pred_lang`` comes from the shared
    stopword-overlap detector (``text_analysis.lang_id`` — same
    verdict, same tie-break).  Verdicts: ``undeclared`` (no usable
    attribute), ``undetected`` (detector says ``und`` — never blamed on
    the declaration), ``match`` / ``mismatch``.

    Scale shape: pure projections (the detector is a fixed set of
    JVM-side token-count expressions) — zero shuffles; census rollups
    downstream key on (declared, pred, verdict).
    """
    from . import text_analysis as _ta

    declared = F.lower(
        F.trim(
            F.element_at(
                F.split(F.coalesce(F.col("lang_attr"), F.lit("")), "-"), 1
            )
        )
    )
    scored = pages.select(
        "url",
        declared.alias("declared_lang"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    ).select("url", "declared_lang", *_ta.lang_hit_cols())
    return scored.select(
        "url",
        "declared_lang",
        F.expr(_ta.lang_pred_sql()).alias("pred_lang"),
    ).select(
        "url",
        "declared_lang",
        "pred_lang",
        F.when(F.col("declared_lang") == "", F.lit("undeclared"))
        .when(F.col("pred_lang") == "und", F.lit("undetected"))
        .when(
            F.col("declared_lang") == F.col("pred_lang"), F.lit("match")
        )
        .otherwise(F.lit("mismatch"))
        .alias("verdict"),
    )


def dom_templates(
    paths: DataFrame,
    min_pages: int = 2,
    boiler_share_ppm: int = 800_000,
) -> DataFrame:
    """Wrapper induction / site-template census over the DOM-path
    relation (``extract_dom_paths`` output ``(url, dom_path,
    text_hash)``): the structure-recovery step that separates a host's
    TEMPLATE (nav, footer, cookie banner — same path, same text on
    nearly every page) from its CONTENT SLOTS (same path, text varies
    per page) — the classifier behind template-aware boilerplate
    stripping at corpus scale (the per-host generalization of
    line-level ``template_strip``).

    Per (host, dom_path): page counts, distinct texts, the largest
    single-text page count, ppm shares against the host's emitting-page
    total, and the verdict —

    - ``boilerplate``: one text dominates ≥ ``boiler_share_ppm`` of the
      host's pages (and ≥ ``min_pages`` carry the path),
    - ``slot``: the path itself is that common but no text dominates,
    - ``rare``: everything else (one-off structure).

    Integer-exact: shares are ``(1e6·x) DIV n_pages_host``.

    Scale shape: three map-side-combined groupBys — (host, path, text)
    → (host, path) → host — all sharing the host key prefix, then two
    equi-joins back on that same key; nothing corpus-sized broadcasts
    and nothing collects.  Host skew is bounded by the same cap logic
    the crawl layout applies (``host_cap``) upstream.
    """
    if min_pages < 1:
        raise ValueError(f"min_pages ({min_pages}) must be >= 1")
    h = paths.select(
        host_col("url").alias("host"), "url", "dom_path", "text_hash"
    )
    per_text = h.groupBy("host", "dom_path", "text_hash").agg(
        F.countDistinct("url").alias("nu")
    )
    top = per_text.groupBy("host", "dom_path").agg(
        F.max("nu").cast("long").alias("top_text_pages")
    )
    per_path = h.groupBy("host", "dom_path").agg(
        F.countDistinct("url").cast("long").alias("n_pages_with_path"),
        F.countDistinct("text_hash").cast("long").alias("n_texts"),
    )
    totals = h.groupBy("host").agg(
        F.countDistinct("url").cast("long").alias("n_pages_host")
    )
    return (
        per_path.join(top, ["host", "dom_path"])
        .join(totals, "host")
        .select(
            "host",
            "dom_path",
            "n_pages_host",
            "n_pages_with_path",
            "n_texts",
            "top_text_pages",
            F.expr("(1000000 * n_pages_with_path) DIV n_pages_host")
            .alias("path_share_ppm"),
            F.expr("(1000000 * top_text_pages) DIV n_pages_host")
            .alias("top_share_ppm"),
            F.when(
                (F.col("n_pages_with_path") >= min_pages)
                & (
                    F.expr("(1000000 * top_text_pages) DIV n_pages_host")
                    >= boiler_share_ppm
                ),
                F.lit("boilerplate"),
            )
            .when(
                (F.col("n_pages_with_path") >= min_pages)
                & (
                    F.expr(
                        "(1000000 * n_pages_with_path) DIV n_pages_host"
                    )
                    >= boiler_share_ppm
                ),
                F.lit("slot"),
            )
            .otherwise(F.lit("rare"))
            .alias("verdict"),
        )
    )


def host_budgets(ranks: DataFrame, total_budget: int) -> DataFrame:
    """Apportion a global fetch budget across hosts proportionally to a
    rank column — the crawl-budget step between ranking and scheduling
    (IRLbot's budgeting / Common Crawl's rank-proportional fetch lists):
    ``(host, rank_scaled)`` → ``(host, rank_scaled, budget)`` with the
    **exact-sum invariant** ``Σ budget = total_budget`` via
    largest-remainder apportionment (Hamilton's method): floor division
    alone loses up to n_hosts-1 fetches; the deficit goes back one unit
    at a time to the largest remainders, ties broken by host key — so
    the allocation is deterministic and engine-portable (every step is
    integer DIV/%/compare).

    Overflow bound (disclosed): ``total_budget · max(rank_scaled)``
    must fit int64 — at a 1e9-fetch budget that allows ranks up to
    ~9e9, comfortably above the 1e6-scaled rank vectors this package
    produces.

    Scale shape: one map-side-combined aggregation for the two scalars
    (rank mass and floor-sum — bounded driver state, like the IVF
    codebook), then a single global ``row_number`` window over the HOST
    relation — hosts number ~1e8 at full-web scale, orders of magnitude
    below the corpus, and the window input is 3 narrow columns; the
    corpus itself is never touched.
    """
    from pyspark.sql.window import Window

    if total_budget <= 0:
        raise ValueError(f"total_budget ({total_budget}) must be positive")
    # eager localCheckpoint: the returned plan reads r after this
    # function exits (and the two scalar aggs below consume it too)
    r = ranks.select(
        "host", F.col("rank_scaled").cast("long")
    ).localCheckpoint(eager=True)
    stats = r.agg(
        F.sum("rank_scaled").alias("s"),
        F.sum(
            (
                F.col("rank_scaled").isNull() | (F.col("rank_scaled") < 0)
            ).cast("long")
        ).alias("bad"),
    ).first()
    s = stats["s"]
    if stats["bad"]:
        # a NULL/negative rank would silently break the exact-sum
        # invariant (its base/rem go NULL and the deficit shorts)
        raise ValueError(
            f"{stats['bad']} rank_scaled values are NULL or negative"
        )
    if not s or s <= 0:
        raise ValueError("rank mass is zero — nothing to apportion")
    b = r.select(
        "host",
        "rank_scaled",
        F.expr(f"({total_budget} * rank_scaled) DIV {s}").alias("base"),
        F.expr(f"({total_budget} * rank_scaled) % {s}").alias("rem"),
    )
    deficit = int(total_budget) - int(b.agg(F.sum("base")).first()[0])
    w = Window.orderBy(F.desc("rem"), F.asc("host"))
    out = b.select(
        "host",
        "rank_scaled",
        (
            F.col("base")
            + (F.row_number().over(w) <= F.lit(deficit)).cast("long")
        ).alias("budget"),
    )
    return out


def host_features(
    stats: DataFrame,
    degree: Optional[DataFrame] = None,
    ranks: Optional[DataFrame] = None,
    spam: Optional[DataFrame] = None,
) -> DataFrame:
    """Assemble the host-reputation feature table — the wide per-host
    relation crawl curation actually consumes (Common Crawl publishes
    exactly this join as its host-level ranks file): content mass
    (:func:`host_stats`), link-graph degree/reciprocity
    (:func:`host_degree`), PageRank (:func:`host_pagerank`), and
    trust/spam mass (:func:`host_spam_mass`), one row per host seen by
    ANY channel.

    Missing-channel defaults are dtype-driven (ints 0, doubles 0.0,
    booleans false, strings '') so the table is dense and
    threshold-friendly; a host absent from the link graph is a host
    with zero degree, not a NULL to trip downstream predicates.

    Scale shape: a chain of full-outer equi-joins ALL keyed on host —
    one co-partitioned exchange family (bucket the store by host and
    every later rebuild of this table is exchange-free, the
    ``write_bucketed`` story); each input is itself one aggregation
    over its source. Nothing broadcasts, nothing collects.
    """
    out = stats
    for rel in (degree, ranks, spam):
        if rel is not None:
            out = out.join(rel, "host", "full_outer")
    defaults = {"bigint": F.lit(0).cast("long"),
                "int": F.lit(0),
                "double": F.lit(0.0),
                "boolean": F.lit(False),
                "string": F.lit("")}
    cols = [
        F.coalesce(F.col(name), defaults[dtype]).alias(name)
        if name != "host" and dtype in defaults
        else F.col(name)
        for name, dtype in out.dtypes
    ]
    return out.select(*cols)


def robots_posture(fetches: DataFrame) -> DataFrame:
    """Crawl posture per host from the robots.txt FETCH outcome — the
    RFC 9309 §2.3.1 layer underneath rule matching, which every crawler
    implements and most corpora document (Googlebot's published
    behavior): a robots.txt that cannot be fetched changes the host's
    entire posture before any rule is read.

    Input ``(host, status)`` — the HTTP status of the robots.txt fetch
    (NULL/0 = network failure, never reached HTTP).  Output posture:

    - 2xx → ``use_rules`` (parse and match, the normal path),
    - 3xx → ``use_rules`` with ``follow_redirect`` true (RFC 9309:
      follow at least five hops; the chain itself is
      :func:`redirect_chains`' job),
    - 4xx → ``allow_all`` (an absent robots.txt is an open host),
    - 5xx / unreachable / anything non-definitive (1xx, non-standard
      anti-bot codes like 999) → ``disallow_all`` with ``retry`` true —
      conservative but never a permanent blacklist.

    Pure projection — zero shuffles; joins onto the frontier on the
    host key like the rules relation does.
    """
    st = F.coalesce(F.col("status"), F.lit(0))
    return fetches.select(
        "host",
        st.cast("int").alias("status"),
        F.when((st >= 200) & (st < 300), F.lit("use_rules"))
        .when((st >= 300) & (st < 400), F.lit("use_rules"))
        .when((st >= 400) & (st < 500), F.lit("allow_all"))
        .otherwise(F.lit("disallow_all"))
        .alias("posture"),
        ((st >= 300) & (st < 400)).alias("follow_redirect"),
        # anything that is not a definitive 2xx-4xx answer is retriable:
        # 5xx, network failure (0), 1xx and non-standard anti-bot codes
        # (999) must not blacklist the host forever
        (~((st >= 200) & (st < 500))).alias("retry"),
    )


def host_cocitation(
    edges: DataFrame,
    max_out_degree: int = 50,
    min_common: int = 2,
) -> DataFrame:
    """Co-citation mining over the host graph (Small 1973 via Dean &
    Henzinger's related-pages algorithm, WWW 1999): two hosts are
    related when the same third hosts link to BOTH — the
    link-structure "related sites" signal that works where content
    similarity can't see (different languages, no shared vocabulary).

    Hub capping is what makes this tractable: a directory host linking
    to 10^4 sites would alone generate ~10^8 co-citation pairs, so
    linkers with out-degree above ``max_out_degree`` are EXCLUDED
    (standard practice — a link from a 10^4-outlink hub carries no
    endorsement signal anyway; the cap is disclosed in the output
    semantics, not silent).  Pair mass is then bounded by
    Σ min(out_i, cap)² instead of Σ out_i².

    Output per unordered pair (a < b): ``n_common`` co-citing linkers,
    each side's capped in-degree, and the integer-exact squared-cosine
    similarity ``cos2_ppm = (1e6·n_common²) DIV (in_a·in_b)`` — floors
    only, engine-portable (int64-safe while n_common < 3·10^6).
    Pairs below ``min_common`` are dropped (noise floor).

    Scale shape: one groupBy to compute linker out-degrees, the capped
    self-join on the linker key, one map-side-combined pair groupBy,
    and an in-degree join — every join an equi-join, nothing
    broadcast-corpus-sized, no cartesian.
    """
    if max_out_degree < 1:
        raise ValueError(f"max_out_degree ({max_out_degree}) must be >= 1")
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    capped = e.join(
        deg.where(F.col("outdeg") <= max_out_degree), "src"
    ).select("src", "dst")
    ind = capped.groupBy(F.col("dst").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("ind")
    )
    a = capped.select("src", F.col("dst").alias("a"))
    b = capped.select("src", F.col("dst").alias("b"))
    pairs = (
        a.join(b, "src")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    return (
        pairs.join(ind.selectExpr("h AS a", "ind AS in_a"), "a")
        .join(ind.selectExpr("h AS b", "ind AS in_b"), "b")
        .select(
            "a",
            "b",
            "n_common",
            "in_a",
            "in_b",
            F.expr(
                "(1000000 * n_common * n_common) DIV (in_a * in_b)"
            ).alias("cos2_ppm"),
        )
    )


def page_link_features(links: DataFrame) -> DataFrame:
    """Per-page outlink feature vector from the extracted link relation
    — the link-shape half of a page-quality classifier's input (spam
    pages are outlink-heavy, externally skewed, and nofollow-free;
    SEO-heavy pages are the opposite): per source URL, total links,
    external count and per-mille share, distinct destination hosts,
    nofollow/sponsored/ugc count, and mean anchor length (per-mille —
    integer-exact, like every ratio in this package).

    One map-side-combined groupBy on the page URL — the relation is
    already partitioned by its producing kernel's layout, and the URL
    key matches the extraction output's, so the join back onto
    documents is co-partitioned.
    """
    nf = (
        "arrays_overlap(split(coalesce(rel, ''), ' '),"
        " array('nofollow', 'ugc', 'sponsored'))"
    )
    return (
        links.groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.sum((~F.col("is_internal")).cast("long")).alias("n_external"),
            F.countDistinct("dst_host").cast("long").alias("n_dst_hosts"),
            F.sum(F.expr(nf).cast("long")).alias("n_nofollow"),
            F.sum(F.length(F.coalesce("anchor", F.lit("")))).alias("_alen"),
        )
        .select(
            "url",
            "n_links",
            "n_external",
            F.expr("(1000 * n_external) DIV n_links").alias(
                "external_permille"
            ),
            "n_dst_hosts",
            "n_nofollow",
            F.expr("_alen DIV n_links").alias("mean_anchor_len"),
        )
    )


_JUNK_CAPTIONS = (
    "image img photo picture logo icon banner thumbnail thumb spacer "
    "pixel avatar placeholder untitled"
).split()


def image_candidates(
    refs: DataFrame,
    min_caption_tokens: int = 2,
    min_caption_chars: int = 5,
    min_px: int = 64,
    max_aspect: int = 4,
) -> DataFrame:
    """Image–caption pair curation over the extracted image-ref relation
    — the deterministic half of the LAION recipe (Schuhmann et al. 2021
    §2: keep <img> whose alt text is a plausible caption, drop junk
    captions and icon-sized images, dedup by image URL; the CLIP
    similarity gate that follows is an ML plug-point, out of
    deterministic scope like the other model boundaries here).

    Caption choice: first non-empty of ``alt`` → ``caption``
    (figcaption) → ``title``, recorded in ``caption_src``. Gates, all
    integer/string-exact:

    - ≥ ``min_caption_tokens`` whitespace tokens and
      ≥ ``min_caption_chars`` characters;
    - not a stock junk word (``logo``, ``icon``, …) and not pure
      digits/punctuation;
    - declared ``width``/``height`` (when present) ≥ ``min_px`` and
      aspect ratio ≤ ``max_aspect`` : 1 — undeclared dimensions pass,
      matching LAION's fetch-then-filter split (the post-fetch pixel
      gate lives with the fetcher).

    Dedup: one survivor per canonical image URL (min ``(url, img_no)``
    — deterministic under any partitioning), with ``n_pages`` (how many
    pages referenced the image) and ``n_captions`` (distinct caption
    diversity — a junk-detection feature: one image with hundreds of
    captions is navigation chrome).

    Scale shape (10^12 pages): the gates are a narrow projection +
    filter; dedup is one hash groupBy on the canonical image URL joined
    to the rank-1 survivor window over the same key — the second
    exchange reuses the first's partitioning. Nothing collects, no
    Python rows.
    """
    if min_caption_tokens < 1 or min_caption_chars < 1:
        raise ValueError(
            f"min_caption_tokens ({min_caption_tokens}) and "
            f"min_caption_chars ({min_caption_chars}) must be >= 1"
        )
    if min_px < 1 or max_aspect < 1:
        raise ValueError(
            f"min_px ({min_px}) and max_aspect ({max_aspect}) must be >= 1"
        )
    from pyspark.sql.window import Window

    junk = ", ".join(f"'{w}'" for w in _JUNK_CAPTIONS)
    chosen = (
        "CASE WHEN coalesce(alt, '') <> '' THEN struct(alt AS c, 'alt' AS s)"
        " WHEN coalesce(caption, '') <> ''"
        "   THEN struct(caption AS c, 'figcaption' AS s)"
        " ELSE struct(coalesce(title, '') AS c, 'title' AS s) END"
    )
    cand = (
        refs.select(
            F.col("url").alias("page_url"),
            "img_no",
            F.col("resolved"),
            F.expr(chosen).alias("_ch"),
            "width",
            "height",
        )
        .select(
            "page_url",
            "img_no",
            "resolved",
            F.col("_ch.c").alias("caption"),
            F.col("_ch.s").alias("caption_src"),
            F.expr(
                "size(filter(split(_ch.c, '\\\\s+'), t -> t <> ''))"
            ).cast("long").alias("n_tokens"),
            "width",
            "height",
        )
        .where(F.col("caption") != "")
        .where(F.col("n_tokens") >= min_caption_tokens)
        .where(F.length("caption") >= min_caption_chars)
        .where(f"lower(trim(caption)) NOT IN ({junk})")
        .where("NOT (caption rlike '^[0-9 .,_-]+$')")
        .where(f"width IS NULL OR width >= {min_px}")
        .where(f"height IS NULL OR height >= {min_px}")
        .where(
            "width IS NULL OR height IS NULL OR"
            f" (width <= {max_aspect} * height"
            f"  AND height <= {max_aspect} * width)"
        )
        .withColumn("img_url", canonical_url_col("resolved"))
    )
    w = Window.partitionBy("img_url").orderBy("page_url", "img_no")
    ranked = cand.withColumn("_rn", F.row_number().over(w))
    stats = cand.groupBy("img_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.countDistinct("caption").cast("long").alias("n_captions"),
    )
    return (
        ranked.where("_rn = 1")
        .join(stats, "img_url")
        .select(
            "img_url",
            "page_url",
            F.col("img_no").cast("long").alias("img_no"),
            "caption",
            "caption_src",
            "n_tokens",
            "width",
            "height",
            "n_pages",
            "n_captions",
        )
    )


def host_communities(edges: DataFrame, iterations: int = 4) -> DataFrame:
    """Synchronous label propagation over the undirected host graph
    (Raghavan, Albert & Kumara 2007, "Near linear time algorithm to
    detect community structures in large-scale networks") — the
    spam-farm / link-ring clustering primitive: where
    :func:`host_components` answers "what is reachable", LPA groups the
    DENSELY linked hosts, so a link farm inside the giant component
    still surfaces as its own community.

    Deterministic *inclusion* variant: every host starts labeled with
    itself; each synchronous sweep relabels a host with the most
    frequent label among its neighbors PLUS its own current label (one
    self-vote — the inclusion rule Gephi/igraph implementations use),
    ties broken by the lexicographically smallest label — a total
    order, so the trajectory is bit-identical in any engine and under
    any partitioning. The self-vote kills the classic synchronous-LPA
    2-cycle on bipartite pairs (hub↔mirror hosts are everywhere in web
    graphs); the output contract is "labels after ``iterations``
    sweeps", defined and stable regardless, unlike the paper's
    asynchronous random-order variant.

    Direction is ignored (edges symmetrized); self-loops dropped, and
    hosts appearing ONLY in self-loops leave the node set — the same
    convention as :func:`host_pagerank`.

    Scale shape (10^8-host graphs): per sweep, one equi-join of the
    edge relation against the label relation, one map-side-combined
    groupBy on ``(host, label)``, and one per-host rank-1 window Spark
    rewrites to WindowGroupLimit (pre-shuffle top-1); the edge relation
    is persisted once and each sweep ``localCheckpoint``s the labels so
    the plan does not deepen with the iteration count.
    """
    if iterations <= 0:
        raise ValueError(f"iterations ({iterations}) must be positive")
    from pyspark.sql.window import Window

    fwd = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    nodes = und.select(F.col("src").alias("h")).distinct().persist()
    # the self-vote: one (h, h) edge per node, so a host's own current
    # label rides the same neighbor-count aggregation
    sym = und.union(
        nodes.select(F.col("h").alias("src"), F.col("h").alias("dst"))
    ).persist()
    labels = nodes.select("h", F.col("h").alias("lbl"))
    w = Window.partitionBy("src").orderBy(F.desc("n"), F.asc("lbl"))
    for _ in range(iterations):
        freq = (
            sym.join(labels, sym["dst"] == labels["h"])
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        pick = (
            freq.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .select(F.col("src").alias("h"), F.col("lbl").alias("new_lbl"))
        )
        labels = (
            labels.join(pick, "h", "left")
            .select("h", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    out = labels.join(sizes, "lbl").select(
        F.col("h").alias("host"),
        F.col("lbl").alias("community_id"),
        "community_size",
    )
    und.unpersist()
    sym.unpersist()
    nodes.unpersist()
    return out


# civil day-number pieces shared by page_dates and its DuckDB twin: all
# arithmetic on POSITIVE integers, so floor/trunc division agree and the
# formula is engine-portable (unlike julian-day formulas whose negative
# intermediate divisions differ between Spark DIV (trunc) and DuckDB //
# (floor))
_MONTH_OFFS = (0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)
_URL_DATE_RE = (
    "/((19|20)[0-9]{2})/(0[1-9]|1[0-2])(/(0[1-9]|[12][0-9]|3[01]))?(/|$)"
)
_META_DATE_RE = "^((19|20)[0-9]{2})-([0-9]{2})-([0-9]{2})"


def _daynum_sql(y: str, m: str, d: str, elem) -> str:
    """Day number of y-m-d (proleptic civil calendar, day 1 =
    0001-01-01) in pure positive-integer arithmetic. ``elem`` renders a
    1-based lookup into the cumulative month-offset table for the
    target dialect."""
    leap = f"(({y}) % 4 = 0 AND ({y}) % 100 <> 0) OR ({y}) % 400 = 0"
    return (
        f"(365 * (({y}) - 1) + (({y}) - 1) DIV 4 - (({y}) - 1) DIV 100"
        f" + (({y}) - 1) DIV 400 + {elem(m)}"
        f" + CASE WHEN ({leap}) AND ({m}) > 2 THEN 1 ELSE 0 END + ({d}))"
    )


def page_dates(meta: DataFrame) -> DataFrame:
    """Publication-date resolution per page — the corpus-freshness
    primitive (time-sliced training corpora, dedup recency priority,
    news-vs-evergreen routing all key on it): reconcile the two
    declared channels, the URL-path date (``/2023/04/...`` — the
    blog/news convention) and ``article:published_time`` (OpenGraph),
    against the capture timestamp.

    Input: a relation with ``url``, ``published_time`` (ISO string or
    ''), ``warc_ts`` (timestamp) — :func:`extract.extract_page_meta`
    joined back to its pages supplies exactly this. Validity gates are
    explicit (month 1-12, day 1-31 by pattern; meta wins over URL when
    both parse — it carries a day, the URL may not).

    Output per url: ``published_ymd`` (int yyyymmdd, 0 when undated;
    URL dates without a day component resolve to day 1),
    ``date_source`` meta|url|none, ``date_verdict``:

    - ``consistent`` — both channels, same year+month,
    - ``conflict`` — both channels, different year or month (a strong
      template-error / repost signal),
    - ``meta_only`` / ``url_only`` / ``undated``;

    and ``staleness_days`` = capture day − published day (NULL when
    undated; negative = post-dated — scheduled posts and clock skew),
    computed with a positive-integer civil day-number formula so the
    value is bit-identical in any engine, never via engine DATE types.

    Scale shape: pure projection — zero shuffles, no regex backtracking
    hazards (bounded character-class patterns).
    """
    offs = ", ".join(str(o) for o in _MONTH_OFFS)

    def elem(m: str) -> str:
        return f"element_at(array({offs}), CAST({m} AS INT))"

    uy = f"CAST(nullif(regexp_extract(url, '{_URL_DATE_RE}', 1), '') AS BIGINT)"
    um = f"CAST(nullif(regexp_extract(url, '{_URL_DATE_RE}', 3), '') AS BIGINT)"
    ud = f"CAST(nullif(regexp_extract(url, '{_URL_DATE_RE}', 5), '') AS BIGINT)"
    pt = "coalesce(published_time, '')"
    my = f"CAST(nullif(regexp_extract({pt}, '{_META_DATE_RE}', 1), '') AS BIGINT)"
    mm_ = f"CAST(nullif(regexp_extract({pt}, '{_META_DATE_RE}', 3), '') AS BIGINT)"
    md_ = f"CAST(nullif(regexp_extract({pt}, '{_META_DATE_RE}', 4), '') AS BIGINT)"
    d = meta.select(
        "url",
        "warc_ts",
        F.expr(uy).alias("uy"),
        F.expr(um).alias("um"),
        F.expr(f"coalesce({ud}, 1)").alias("ud"),
        F.expr(my).alias("my"),
        F.expr(mm_).alias("mm"),
        F.expr(md_).alias("md"),
    ).select(
        "url",
        "warc_ts",
        "uy",
        "um",
        "ud",
        # meta validity: pattern allows month/day digits the calendar
        # does not — gate the ranges explicitly
        F.expr(
            "CASE WHEN my IS NOT NULL AND mm BETWEEN 1 AND 12"
            " AND md BETWEEN 1 AND 31 THEN my END"
        ).alias("vy"),
        F.expr(
            "CASE WHEN my IS NOT NULL AND mm BETWEEN 1 AND 12"
            " AND md BETWEEN 1 AND 31 THEN mm END"
        ).alias("vm"),
        F.expr(
            "CASE WHEN my IS NOT NULL AND mm BETWEEN 1 AND 12"
            " AND md BETWEEN 1 AND 31 THEN md END"
        ).alias("vd"),
    )
    pub_y = "coalesce(vy, uy)"
    pub_m = "coalesce(vm, um)"
    pub_d = "CASE WHEN vy IS NOT NULL THEN vd ELSE ud END"
    cap_day = _daynum_sql(
        "year(warc_ts)", "month(warc_ts)", "day(warc_ts)", elem
    )
    pub_day = _daynum_sql(pub_y, pub_m, pub_d, elem)
    return d.select(
        "url",
        F.expr(
            f"CASE WHEN {pub_y} IS NULL THEN 0"
            f" ELSE {pub_y} * 10000 + {pub_m} * 100 + {pub_d} END"
        ).cast("long").alias("published_ymd"),
        F.expr(
            "CASE WHEN vy IS NOT NULL THEN 'meta'"
            " WHEN uy IS NOT NULL THEN 'url' ELSE 'none' END"
        ).alias("date_source"),
        F.expr(
            "CASE WHEN vy IS NOT NULL AND uy IS NOT NULL THEN"
            "  CASE WHEN vy = uy AND vm = um THEN 'consistent'"
            "       ELSE 'conflict' END"
            " WHEN vy IS NOT NULL THEN 'meta_only'"
            " WHEN uy IS NOT NULL THEN 'url_only'"
            " ELSE 'undated' END"
        ).alias("date_verdict"),
        F.expr(
            f"CASE WHEN {pub_y} IS NULL THEN CAST(NULL AS BIGINT)"
            f" ELSE CAST({cap_day} - {pub_day} AS BIGINT) END"
        ).alias("staleness_days"),
    )


def url_classify(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-type taxonomy — the within-host frontier-routing complement
    to :func:`host_budgets` (which splits budget ACROSS hosts): crawl
    schedulers prioritize article-shaped URLs and depress search/tag/
    pagination surfaces, the classic infinite-space traps
    (:func:`url_templates` mines them statistically; this is the
    instant rule tier every production crawler also carries).

    Per URL: ``path_depth`` (non-empty segments), ``n_query_params``,
    ``has_date_path`` (the ``/2023/04/`` convention, shared regex with
    :func:`page_dates`), and ``page_type`` — first match wins down a
    fixed ladder: search → pagination → tag → feed → media → product →
    article → home → other. Pure lowercased LIKE/regexp ladder; every
    pattern is anchored or slash-delimited so rule bytes never act as
    metacharacters.

    Pure projection — zero shuffles at any scale.
    """
    u = f"lower(coalesce({url_col}, ''))"
    path = f"regexp_extract({u}, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    qs = f"regexp_extract({u}, '\\\\?([^#]*)', 1)"
    d = pages.select(
        F.col(url_col).alias("url"),
        F.expr(path).alias("p"),
        F.expr(qs).alias("qs"),
    )
    ladder = (
        "CASE"
        " WHEN p LIKE '%/search%' OR qs rlike '(^|&)(q|s|query)=' "
        "   THEN 'search'"
        " WHEN qs rlike '(^|&)(page|p|offset|start)=[0-9]'"
        "   OR p rlike '/page/[0-9]+' THEN 'pagination'"
        " WHEN p LIKE '%/tag/%' OR p LIKE '%/tags/%'"
        "   OR p LIKE '%/category/%' OR p LIKE '%/label/%' THEN 'tag'"
        " WHEN p LIKE '%/feed%' OR p LIKE '%.rss' OR p LIKE '%/rss%'"
        "   OR p LIKE '%atom.xml' THEN 'feed'"
        " WHEN p rlike"
        "   '\\\\.(jpg|jpeg|png|gif|webp|svg|mp4|webm|mp3|pdf|zip)$'"
        "   THEN 'media'"
        " WHEN p LIKE '%/product/%' OR p LIKE '%/item/%'"
        "   OR p rlike '/p/[0-9]+$' THEN 'product'"
        f" WHEN p rlike '{_URL_DATE_RE}' OR p LIKE '%/article%'"
        "   OR p LIKE '%/post/%' OR p LIKE '%/blog/%'"
        "   OR p LIKE '%/news/%' THEN 'article'"
        " WHEN p = '' OR p = '/' THEN 'home'"
        " ELSE 'other' END"
    )
    return d.select(
        "url",
        F.expr(
            "size(filter(split(p, '/'), s -> s <> ''))"
        ).cast("long").alias("path_depth"),
        F.expr(
            "CASE WHEN qs = '' THEN 0"
            " ELSE size(split(qs, '&')) END"
        ).cast("long").alias("n_query_params"),
        F.expr(f"p rlike '{_URL_DATE_RE}'").alias("has_date_path"),
        F.expr(ladder).alias("page_type"),
    )


def sitemap_coverage(
    sitemap_entries: DataFrame,
    pages: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Sitemap-vs-crawl reconciliation per host — the crawl-ops
    completeness audit both sides of the protocol care about: how much
    of what the host DECLARED (its sitemap ``<url>`` entries) did the
    crawl actually capture, and how much of the capture is sitemap-
    orphaned (discovered only by link walking — template/trap surface
    or genuinely fresh pages the sitemap lags on).

    Both channels are canonicalized (:func:`canonical_url_col`) and
    deduplicated, keyed by the URL's OWN host (not the sitemap row's
    fetch host — cross-host ``<loc>`` entries count against the host
    they name, per the sitemaps.org cross-submission rule). Output per
    host seen by either channel: ``n_sitemap``, ``n_crawled``,
    ``n_both``, ``coverage_ppm`` = 1e6·both DIV sitemap (NULL when the
    host declared nothing), ``orphan_ppm`` = 1e6·(crawled−both) DIV
    crawled (NULL when nothing crawled).

    Scale shape: two distinct-projections and one full-outer equi-join
    on the canonical URL, then a map-side-combined host rollup — the
    join key is the finest key, so skew rides the standard hash
    shuffle; nothing collects or broadcasts a channel.
    """
    sm = (
        sitemap_entries.where("kind = 'url'")
        .select(canonical_url_col("loc").alias("cu"))
        .distinct()
        .select("cu", F.lit(1).alias("in_sm"))
    )
    cr = (
        pages.select(canonical_url_col(url_col).alias("cu"))
        .distinct()
        .select("cu", F.lit(1).alias("in_cr"))
    )
    j = sm.join(cr, "cu", "full_outer").select(
        host_col("cu").alias("host"),
        F.coalesce("in_sm", F.lit(0)).alias("in_sm"),
        F.coalesce("in_cr", F.lit(0)).alias("in_cr"),
    )
    return (
        j.groupBy("host")
        .agg(
            F.sum("in_sm").cast("long").alias("n_sitemap"),
            F.sum("in_cr").cast("long").alias("n_crawled"),
            F.sum(F.col("in_sm") * F.col("in_cr")).cast("long").alias(
                "n_both"
            ),
        )
        .select(
            "host",
            "n_sitemap",
            "n_crawled",
            "n_both",
            F.expr(
                "CASE WHEN n_sitemap = 0 THEN CAST(NULL AS BIGINT)"
                " ELSE (1000000 * n_both) DIV n_sitemap END"
            ).alias("coverage_ppm"),
            F.expr(
                "CASE WHEN n_crawled = 0 THEN CAST(NULL AS BIGINT)"
                " ELSE (1000000 * (n_crawled - n_both)) DIV n_crawled END"
            ).alias("orphan_ppm"),
        )
    )


def pld_graph(edges: DataFrame) -> DataFrame:
    """Host-level link edges → the pay-level-domain (PLD) graph — the
    second graph Common Crawl publishes beside host ranks (every
    subdomain of a domain is one actor for ranking/capping, so
    domain-level rank is the spam-resistant prior; cf. the
    cc-webgraph domain-graph convention).

    Each endpoint maps to its registered domain via the same
    PSL/eTLD+1 logic as :func:`domain_parts` (multi-level suffixes,
    IPv4 literals kept whole). Intra-domain edges (subdomain ↔
    subdomain of one PLD) drop — they are navigation, not endorsement.
    ``n_host_pairs`` counts the DISTINCT host-level pairs that rolled
    into each PLD edge (the edge-weight the domain graph carries).

    Scale shape: two zero-shuffle projections (the PSL logic is pure
    whole-stage codegen) + one dedup groupBy + one count groupBy on the
    (src, dst) key — no joins, nothing corpus-sized held anywhere."""
    reg, _sub, _tld = _domain_parts_sql()

    def to_pld(df: DataFrame, col: str) -> DataFrame:
        return (
            df.withColumn("__dp_host", F.lower(F.col(col)))
            .withColumn("__dp_labels", F.expr("split(__dp_host, '[.]')"))
            .withColumn(f"{col}_pld", F.expr(reg))
            .drop("__dp_host", "__dp_labels")
        )

    # DNS names are case-insensitive: fold BEFORE the dedup so mixed-case
    # duplicates of one host pair count once
    host_pairs = edges.select(
        F.lower("src").alias("src"), F.lower("dst").alias("dst")
    ).distinct()
    mapped = to_pld(to_pld(host_pairs, "src"), "dst")
    return (
        mapped.select(
            F.col("src_pld").alias("src"), F.col("dst_pld").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n_host_pairs"))
    )


def host_dup_rate(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host exact-duplicate share — the mirror/scraper-farm signal
    (a host whose pages are mostly corpus-wide duplicates is a
    syndication mirror or a scraper; host_cap and crawl budgets should
    see that BEFORE spending fetches there). Duplicate = the page's
    normalized content hash (the exact-dedup identity,
    ``md5(NORM text)``) occurs more than once ANYWHERE in the corpus —
    cross-host mirrors count, which is the point.

    Scale shape: one map-side-combined hash groupBy finds the dup keys
    (a relation of only the duplicated hashes), one equi-join flags
    docs, one host groupBy rolls up. ``n_distinct_hashes`` rides the
    same host shuffle. Nothing broadcasts by assumption — AQE promotes
    the dup-key side when it is genuinely small."""
    from doc_parser_spark.operators.text_analysis import NORM

    with_host = pages.select(
        host_col(url_col).alias("host"),
        F.expr(f"md5({NORM})").alias("k"),
    )
    dup_keys = (
        with_host.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("k", F.lit(True).alias("is_dup"))
    )
    flagged = with_host.join(dup_keys, "k", "left")
    return flagged.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(F.col("is_dup"), 1)).cast("long").alias("n_dup_docs"),
        F.countDistinct("k").cast("long").alias("n_distinct_hashes"),
    ).select(
        "host",
        "n_docs",
        "n_dup_docs",
        "n_distinct_hashes",
        F.expr("(1000 * n_dup_docs) DIV n_docs").cast("long").alias(
            "dup_permille"
        ),
    )


def host_hops(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 4
) -> DataFrame:
    """Link distance (BFS hop count) from a trusted seed set — the
    crawl-depth prior beside :func:`host_trustrank`'s damped mass:
    frontier schedulers cap how many hops past a seed they crawl
    (Mercator/OPIC-era practice), and "unreachable within k hops" is the
    crispest spam-island predicate there is. TrustRank attenuates but
    mixes; hop distance is the exact min-path metric.

    Iterative min-distance label propagation: dist(seed)=0, each sweep
    relaxes one hop (``min(dist(src)+1)`` over in-edges). Hosts still
    unreached after ``max_hops`` sweeps emit ``hops = -1`` (distinct
    from any real distance, dense dtype). Sweeps are equi-joins on the
    host key + map-side-combined min-aggregations; per-iteration
    ``localCheckpoint`` keeps plan depth constant (the
    pagerank/components discipline). BFS needs no numeric damping, so
    the result is trivially integer-exact in any engine.
    """
    if max_hops <= 0:
        raise ValueError(f"max_hops ({max_hops}) must be positive")
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("h"))
        .union(e.select(F.col("dst").alias("h")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = nodes.join(
        seeds.select(F.col("host").alias("h")).distinct(), "h", "left_semi"
    ).select("h", F.lit(0).cast("long").alias("d"))
    dist = dist.localCheckpoint(eager=True)
    for _ in range(max_hops):
        relaxed = (
            e.join(dist, e["src"] == dist["h"])
            .select(F.col("dst").alias("h"), (F.col("d") + 1).alias("d"))
            .unionByName(dist)
            .groupBy("h")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
        dist = relaxed
    out = nodes.join(dist, "h", "left").select(
        F.col("h").alias("host"),
        F.coalesce("d", F.lit(-1)).cast("long").alias("hops"),
    )
    e.unpersist()
    return out


def host_hyperball(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """HyperBall harmonic centrality (Boldi & Vigna 2013, "In-Core
    Computation of Geometric Centralities with HyperBall") — THE
    published algorithm for centrality on web-scale graphs: each node
    keeps an HLL sketch of its in-ball ``B(x,t) = {y : d(y,x) ≤ t}``;
    one sweep max-merges neighbor sketches along edges; harmonic
    centrality accumulates ``(|B(x,t)| − |B(x,t−1)|)/t``. Exact
    all-pairs BFS needs O(V²) state; HyperBall needs 64 small ints per
    node, merged with the same shuffle shape as one PageRank sweep.

    Engine-portable to the bit, like :func:`distinct_hll` whose register
    scheme this reuses (md5-derived 6-bit register / 42-bit ρ, no floats
    in sketch state): per-iteration ball estimates floor to BIGINT, and
    the harmonic sum is kept in /60-fixed-point so the ``1/t`` weights
    (t ≤ 6) are exact integers — ``harmonic_x60 = Σ diff_t · (60/t)``.

    Scale shape: the register relation is (host, reg, m) ≤ 64 rows per
    node; each sweep is one equi-join on the edge key + one map-side-
    combined max-aggregation; ``localCheckpoint`` per sweep keeps plan
    depth constant (the pagerank/components/hops discipline). Output one
    row per node: the final ball estimate and ``harmonic_x60``.
    """
    if not 0 < iterations <= 6:
        raise ValueError(f"iterations ({iterations}) must be in 1..6")
    lc_arr = f"array({HYPERBALL_LC_TABLE_SQL})"
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("h"))
        .union(e.select(F.col("dst").alias("h")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    two42 = 1 << 42
    regs = (
        nodes.select(
            "h",
            F.conv(F.substring(F.md5(F.col("h")), 1, 12), 16, 10)
            .cast("long")
            .alias("hh"),
        )
        .select(
            "h",
            F.expr(f"hh DIV {two42}").cast("int").alias("reg"),
            F.expr(
                f"CASE WHEN hh % {two42} = 0 THEN 43"
                f" ELSE 43 - length(bin(hh % {two42})) END"
            ).cast("int").alias("m"),
        )
        .localCheckpoint(eager=True)
    )

    def estimate(r: DataFrame) -> DataFrame:
        per = r.groupBy("h").agg(
            F.count(F.lit(1)).alias("n_regs"),
            F.sum(
                F.expr(
                    "CAST(1.0 AS DOUBLE)"
                    " / CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)"
                )
            ).alias("s_present"),
        )
        raw = (
            f"{HLL_ALPHA64_SQL} * CAST(4096.0 AS DOUBLE)"
            " / (s_present + CAST(64 - n_regs AS DOUBLE))"
        )
        # standard HLL small-range correction, made engine-portable: the
        # linear-counting values 64·ln(64/V) are a 64-entry LITERAL
        # table (same literals in the DuckDB twin — no cross-engine libm)
        return per.select(
            "h",
            F.expr(
                f"CASE WHEN {raw} <= 160.0 AND n_regs < 64"
                f" THEN floor(element_at({lc_arr},"
                f" CAST(64 - n_regs AS INT)))"
                f" ELSE floor({raw}) END"
            ).cast("long").alias("est"),
        )

    prev = estimate(regs)
    parts: list[DataFrame] = []
    for t in range(1, iterations + 1):
        contrib = e.join(regs, F.col("src") == F.col("h")).select(
            F.col("dst").alias("h"), "reg", "m"
        )
        regs = (
            contrib.unionByName(regs.select("h", "reg", "m"))
            .groupBy("h", "reg")
            .agg(F.max("m").alias("m"))
            .localCheckpoint(eager=True)
        )
        cur = estimate(regs)
        parts.append(
            cur.alias("c")
            .join(prev.alias("p"), "h")
            .select(
                "h",
                (
                    F.greatest(
                        F.col("c.est") - F.col("p.est"), F.lit(0)
                    )
                    * F.lit(60 // t)
                ).alias("part"),
            )
        )
        prev = cur
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    harm = acc.groupBy("h").agg(F.sum("part").cast("long").alias("hx"))
    out = (
        nodes.join(prev, "h", "left")
        .join(harm, "h", "left")
        .select(
            F.col("h").alias("host"),
            F.coalesce("est", F.lit(0)).cast("long").alias("ball_estimate"),
            F.coalesce("hx", F.lit(0)).cast("long").alias("harmonic_x60"),
        )
    )
    e.unpersist()
    return out


def degree_spectrum(edges: DataFrame) -> DataFrame:
    """Log₂-bucketed degree distribution of the host graph — the
    power-law health check (a natural web graph is heavy-tailed; a
    bucket bulge at one degree is a link-farm ring, a truncated tail a
    crawler frontier bug). The graph-side twin of
    ``text_analysis.vocab_spectrum``.

    One row per (direction, bucket): ``min_degree = 2^bucket``,
    ``n_hosts``, and the integer per-mille share of that direction's
    hosts. ``floor(log2(n))`` is ``length(bin(n)) - 1`` — the log-free
    integer form every spectrum/bit-cost op here uses, so the bucket
    edges are bit-exact in any engine. Rides :func:`host_degree` (one
    distinct-edge rollup) plus two tiny direction aggregates."""
    deg = host_degree(edges).select("host", "out_degree", "in_degree")
    parts = []
    for direction in ("out", "in"):
        col = f"{direction}_degree"
        parts.append(
            deg.where(F.col(col) > 0).select(
                F.lit(direction).alias("direction"),
                F.expr(f"length(bin({col})) - 1")
                .cast("long")
                .alias("bucket"),
            )
        )
    both = parts[0].unionByName(parts[1])
    counts = both.groupBy("direction", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts")
    )
    totals = both.groupBy("direction").agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    return counts.join(totals, "direction").select(
        "direction",
        "bucket",
        F.expr("CAST(pow(2, bucket) AS BIGINT)").alias("min_degree"),
        "n_hosts",
        F.expr("(1000 * n_hosts) DIV n_total").cast("long").alias(
            "share_permille"
        ),
    )
