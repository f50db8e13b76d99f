"""Web-corpus curation operators: URL canonicalization/dedup,
benchmark decontamination, PII detection/redaction."""

from pyspark.sql import Row, functions as F

from doc_parser_spark.operators import web


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([Row(url=url)])
    return df.select(web.canonical_url_col("url").alias("c")).collect()[0].c


def test_canonical_url_rules(spark):
    cases = {
        # scheme+host lowercased, www stripped, default port dropped, frag dropped
        "HTTPS://WWW.Ex.COM:443/A/B#frag": "https://ex.com/A/B",
        "http://ex.com:80/": "http://ex.com/",
        # non-default port survives; path case preserved
        "http://ex.com:8080/Case/Path": "http://ex.com:8080/Case/Path",
        # empty path -> '/', trailing slash trimmed elsewhere
        "http://ex.com": "http://ex.com/",
        "http://ex.com/a/": "http://ex.com/a",
        # tracking params dropped, rest sorted
        "http://ex.com/p?utm_source=x&b=2&a=1&gclid=9": "http://ex.com/p?a=1&b=2",
        # all params tracking -> no query at all
        "http://ex.com/p?utm_campaign=c": "http://ex.com/p",
        # https :443 stripped but http :443 kept
        "http://ex.com:443/x": "http://ex.com:443/x",
    }
    for raw, want in cases.items():
        assert _canon(spark, raw) == want, raw


def test_url_dedup_groups_variants(spark):
    rows = [
        Row(doc_id=1, url="http://WWW.ex.com:80/a?utm_source=1"),
        Row(doc_id=2, url="http://ex.com/a"),
        Row(doc_id=3, url="http://ex.com/b"),
    ]
    out = {
        r.canonical_url: r
        for r in web.url_dedup(spark.createDataFrame(rows)).collect()
    }
    assert out["http://ex.com/a"].n_dups == 2
    assert out["http://ex.com/a"].keep_doc_id == 1
    assert out["http://ex.com/b"].n_dups == 1


def test_decontaminate_flags_verbatim_overlap(spark):
    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        Row(doc_id=0, text=bench_text, source="src0"),
        # full verbatim copy: every 3-gram hits
        Row(doc_id=1, text=bench_text, source="src1"),
        # no overlap at all
        Row(doc_id=2, text="one two three four five six", source="src1"),
        # partial: shares the prefix only
        Row(doc_id=3, text="alpha beta gamma unrelated words here", source="src1"),
        # too short for any 3-gram
        Row(doc_id=4, text="tiny doc", source="src1"),
    ]
    out = {r.doc_id: r for r in web.decontaminate(
        spark.createDataFrame(rows), bench_source="src0", n=3, threshold=0.5
    ).collect()}
    assert set(out) == {1, 2, 3, 4}  # benchmark docs excluded from output
    assert out[1].n_grams == 4 and out[1].n_hit == 4 and out[1].contaminated
    assert out[2].n_hit == 0 and not out[2].contaminated
    assert out[3].n_grams == 4 and out[3].n_hit == 1 and not out[3].contaminated
    assert out[4].n_grams == 0 and out[4].n_hit == 0 and not out[4].contaminated


def test_pii_counts_and_redaction(spark):
    rows = [
        Row(doc_id=1, text="mail a.b+c@ex.org or x@y.co, host 10.0.3.7, call 555-123-4567"),
        Row(doc_id=2, text="nothing sensitive here"),
        Row(doc_id=3, text="+1 415-555-0199 twice 555-867-5309"),
    ]
    df = spark.createDataFrame(rows)
    out = {r.doc_id: r for r in web.pii_stats(df).collect()}
    assert (out[1].n_emails, out[1].n_ipv4, out[1].n_phones) == (2, 1, 1)
    assert out[1].n_pii_total == 4
    assert out[2].n_pii_total == 0
    assert out[3].n_phones == 2

    # redaction signature corresponds to the actually-redacted text
    red = df.where("doc_id = 1").select(
        F.expr(
            "regexp_replace(regexp_replace(regexp_replace(text, "
            f"'{web.PII_EMAIL_RE}', '<EMAIL>'), "
            f"'{web.PII_IPV4_RE}', '<IP>'), "
            f"'{web.PII_PHONE_RE}', '<PHONE>')"
        ).alias("t")
    ).collect()[0].t
    assert red == "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>"


def test_url_dedup_plan_is_single_agg_no_join(spark):
    df = spark.createDataFrame([Row(doc_id=1, url="http://ex.com/a")])
    plan = web.url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # one hash groupBy, no join/broadcast
    assert plan.count("Exchange") <= 1


def test_host_cap_groups_canonical_variants(spark):
    # 7 docs on one logical host through www/port variants + 1 other host
    rows = [
        Row(doc_id=i, url=u)
        for i, u in enumerate(
            [
                "http://ex.com/1", "http://WWW.ex.com/2", "http://ex.com:80/3",
                "https://ex.com/4", "http://ex.com/5", "http://ex.com/6",
                "http://www.ex.com:80/7", "http://other.org/x",
            ]
        )
    ]
    out = web.host_cap(spark.createDataFrame(rows), max_per_host=3).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    assert len(by_host["ex.com"]) == 3  # capped despite 7 variants
    assert len(by_host["other.org"]) == 1
    assert sorted(r.host_rank for r in by_host["ex.com"]) == [1, 2, 3]
    # deterministic survivor pick: re-run yields the same doc_ids
    out2 = web.host_cap(spark.createDataFrame(rows), max_per_host=3).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in out2)


def test_url_filter_blocklist(spark):
    rows = [
        Row(doc_id=1, url="http://ex.com/fun/casino/page"),
        Row(doc_id=2, url="http://ex.com/fine"),
        Row(doc_id=3, url="http://tracker.net/p"),
    ]
    out = {r.doc_id: r.keep for r in web.url_filter(spark.createDataFrame(rows)).collect()}
    assert out == {1: False, 2: True, 3: False}


def test_canonicalization_is_idempotent(spark):
    # canonical(canonical(u)) == canonical(u) over a messy generated set
    df = spark.range(0, 300).toDF("doc_id").selectExpr(
        f"{web.SYNTH_URL_SQL} AS url"
    )
    once = df.select(web.canonical_url_col("url").alias("url"))
    twice = once.select(web.canonical_url_col("url").alias("url"))
    assert once.collect() == twice.collect()


def test_canonical_url_schemeless_fallback(spark):
    # scheme-less / protocol-relative URLs must NOT collapse to ':///'
    assert _canon(spark, "example.com/a") == "example.com/a"
    assert _canon(spark, "//cdn.com/x") == "//cdn.com/x"
    assert _canon(spark, "  spaced.com/y ") == "spaced.com/y"
    # and therefore dedup keeps them distinct
    from pyspark.sql import Row

    rows = [
        Row(doc_id=1, url="example.com/a"),
        Row(doc_id=2, url="//cdn.com/x"),
        Row(doc_id=3, url="example.com/a"),
    ]
    out = web.url_dedup(spark.createDataFrame(rows)).collect()
    assert len(out) == 2


def test_canonical_url_duckdb_twin_schemeless(spark):
    import duckdb

    import __spark_entry__ as entry

    urls = ["example.com/a", "//cdn.com/x", "HTTPS://WWW.Ex.COM:443/A/B#f",
            "http://ex.com/p?utm_source=x&b=2&a=1", "  spaced.com/y "]
    con = duckdb.connect()
    expr = entry._duck_canonical_url("url")
    duck = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS url)", [u]).fetchone()[0]
        for u in urls
    ]
    mine = [_canon(spark, u) for u in urls]
    assert duck == mine


def test_host_stats_rollup(spark):
    rows = [
        (1, "http://a.com/x", "hello"),
        (2, "https://WWW.A.com/y?utm_source=z", "worldly"),
        (3, "http://a.com/x", None),  # dup canonical url, NULL text
        (4, "http://b.com/only", "bb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r["host"]: r for r in web.host_stats(df).collect()}
    assert out["a.com"]["n_docs"] == 3
    assert out["a.com"]["n_urls"] == 2  # x twice (canonical), y once
    assert out["a.com"]["total_chars"] == 12  # 5 + 7 + 0 (NULL -> '')
    assert out["a.com"]["max_chars"] == 7
    assert out["b.com"]["n_docs"] == 1


def test_host_pagerank_hand_computed(spark):
    import pytest

    from doc_parser_spark.operators.web import host_pagerank

    # A->B, A->C, B->C, C->A; self-loop and duplicate edges must be ignored
    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("A", "A"), ("A", "B")],
        "src string, dst string",
    )
    r = {row["host"]: row["rank_scaled"]
         for row in host_pagerank(edges, iterations=2).collect()}
    # iter1: A=150000+85%*1000000=1000000; B=150000+85%*500000=575000;
    #        C=150000+85%*(500000+1000000)=1425000
    # iter2: A=150000+85%*1425000=1361250; B=575000;
    #        C=150000+85%*(500000+575000)=1063750
    assert r == {"A": 1361250, "B": 575000, "C": 1063750}

    # sink-only host keeps a rank row; dangling rank mass just vanishes
    sink = spark.createDataFrame([("A", "B")], "src string, dst string")
    r1 = {row["host"]: row["rank_scaled"]
          for row in host_pagerank(sink, iterations=1).collect()}
    assert r1 == {"A": 150000, "B": 1000000}
    r2 = {row["host"]: row["rank_scaled"]
          for row in host_pagerank(sink, iterations=2).collect()}
    assert r2 == {"A": 150000, "B": 277500}

    with pytest.raises(ValueError):
        host_pagerank(sink, iterations=0)


def test_distinct_kmv_estimator(spark):
    import pytest

    from doc_parser_spark.operators.web import distinct_kmv

    # small key: fewer than k distincts -> exact fallback
    # big key: 600 distincts, k=32 -> estimate within KMV error bounds
    rows = [("small", f"u{i}") for i in range(10)]
    rows += [("big", f"v{i}") for i in range(600)]
    rows += [("big", "v0")] * 5  # duplicates must not inflate
    df = spark.createDataFrame(rows, "host string, url string")
    out = {r["host"]: r for r in distinct_kmv(df, k=32).collect()}
    assert out["small"]["kmv_estimate"] == 10
    assert out["small"]["n_distinct_exact"] == 10
    assert out["big"]["n_distinct_exact"] == 600
    # KMV relative error ~ 1/sqrt(k-2) ≈ 18%; allow 3 sigma
    assert 300 <= out["big"]["kmv_estimate"] <= 1000
    with pytest.raises(ValueError):
        distinct_kmv(df, k=1)


def test_distinct_kmv_ignores_nulls(spark):
    from doc_parser_spark.operators.web import distinct_kmv

    rows = [("h", f"u{i}") for i in range(10)] + [("h", None)] * 3
    df = spark.createDataFrame(rows, "host string, url string")
    r = distinct_kmv(df, k=16).collect()[0]
    # countDistinct ignores NULLs; the sketch must too (no off-by-one)
    assert r["kmv_estimate"] == 10 and r["n_distinct_exact"] == 10


def test_distinct_kmv_all_null_key_kept(spark):
    from doc_parser_spark.operators.web import distinct_kmv

    rows = [("h", f"u{i}") for i in range(4)] + [("empty", None)] * 2
    df = spark.createDataFrame(rows, "host string, url string")
    out = {r["host"]: r for r in distinct_kmv(df, k=8).collect()}
    assert out["empty"]["kmv_estimate"] == 0
    assert out["empty"]["n_distinct_exact"] == 0
    assert out["h"]["kmv_estimate"] == 4


def test_pii_stats_null_text_counts_zero(spark):
    from doc_parser_spark.operators.web import pii_stats

    docs = spark.createDataFrame(
        [(1, None), (2, "mail me: a@b.com")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert out[1]["n_emails"] == 0 and out[1]["n_pii_total"] == 0
    assert out[1]["redacted_sig"] is not None  # md5('') — never NULL
    assert out[2]["n_emails"] == 1


def test_distinct_kmv_null_key_keeps_sketch(spark):
    from doc_parser_spark.operators.web import distinct_kmv

    df = spark.createDataFrame(
        [(None, f"u{i}") for i in range(5)] + [("h1", "x")],
        "host string, url string",
    )
    out = {
        r["host"]: r
        for r in distinct_kmv(df, key="host", value="url").collect()
    }
    assert out[None]["n_distinct_exact"] == 5
    assert out[None]["kmv_estimate"] == 5  # sketch kept via null-safe join
    assert out["h1"]["kmv_estimate"] == 1


def test_host_bucket_normalizes_schemeless_variants(spark):
    from doc_parser_spark.operators.web import host_col

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            ("http://www.site.com/x",),
            ("www.site.com/x",),
            ("site.com:80/y",),
            ("//www.site.com:443/z",),
        ],
        "url string",
    )
    hosts = {r[0] for r in df.select(host_col("url")).collect()}
    assert hosts == {"site.com"}


def test_parse_robots_grouping_and_fields():
    from doc_parser_spark.operators.web import parse_robots

    txt = b"""
# crawl policy
User-agent: BigBot
Disallow: /private

User-agent: *
User-agent: other
Disallow: /tmp/   # trailing comment
Allow: /tmp/ok
Disallow:
Sitemap: https://x.example/sitemap.xml
Crawl-delay: 10

User-agent: Another
Allow: /
"""
    assert parse_robots(txt) == [
        ("disallow", "/tmp/"), ("allow", "/tmp/ok"), ("disallow", ""),
    ]
    # a second group that also names * contributes too
    txt2 = "User-agent: *\nDisallow: /a\nUser-agent: *\nDisallow: /b\n"
    assert parse_robots(txt2) == [("disallow", "/a"), ("disallow", "/b")]
    assert parse_robots("") == []


def test_robots_filter_longest_match_semantics(spark):
    from doc_parser_spark.operators.web import robots_filter

    pages = spark.createDataFrame(
        [
            (1, "https://a.example/docs/guide"),   # disallow /docs wins
            (2, "https://a.example/docs/api/x"),   # longer allow /docs/api
            (3, "https://a.example/open"),         # no match
            (4, "https://b.example/anything"),     # site-wide disallow /
            (5, "https://b.example/pub/page"),     # allow /pub overrides /
            (6, "https://c.example/tie"),          # equal length: allow wins
            (7, "https://nruleshost.example/x"),   # host with no rules
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [
            ("a.example", "disallow", "/docs"),
            ("a.example", "allow", "/docs/api"),
            ("a.example", "disallow", ""),      # empty: matches nothing
            ("b.example", "disallow", "/"),
            ("b.example", "allow", "/pub"),
            ("c.example", "disallow", "/tie"),
            ("c.example", "allow", "/tie"),
        ],
        "host string, rule string, prefix string",
    )
    out = {r["doc_id"]: r for r in robots_filter(pages, robots).collect()}
    assert out[1]["blocked"] and out[1]["matched_prefix"] == "/docs"
    assert not out[2]["blocked"] and out[2]["matched_prefix"] == "/docs/api"
    assert not out[3]["blocked"] and out[3]["verdict_rule"] == "none"
    assert out[4]["blocked"] and out[4]["matched_prefix"] == "/"
    assert not out[5]["blocked"]
    assert not out[6]["blocked"]  # RFC 9309: least-restrictive on tie
    assert not out[7]["blocked"]
    # canonical path feeds the match: trailing slash trimmed, host lowered
    pages2 = spark.createDataFrame(
        [(8, "HTTPS://WWW.A.Example:443/docs/")], "doc_id long, url string"
    )
    row = robots_filter(pages2, robots).collect()[0]
    assert row["host"] == "a.example" and row["path"] == "/docs"
    assert row["blocked"]


def test_extract_links_and_link_graph(spark):
    from doc_parser_spark.operators.extract import extract_links
    from doc_parser_spark.operators.web import link_graph

    html = (b'<html><body>'
            b'<a href="/rel/x">Rel Link</a>'
            b'<a href="https://other.example/abs?q=1">Abs</a>'
            b'<a href="javascript:void(0)">js</a>'
            b'<a href="MAILTO:a@b.c">mail</a>'
            b'<a href="#frag">frag</a>'
            b'<a name="no-href">anchor-only</a>'
            b'<a href="//cdn.example/proto-rel">cdn</a>'
            b'</body></html>')
    pages = spark.createDataFrame(
        [("https://www.host.example/page/1", bytearray(html)),
         ("https://www.host.example/page/2", bytearray(b"%PDF-1.4 not html")),
         ("https://www.host.example/page/3", None)],
        "url string, html binary",
    )
    rows = extract_links(pages).orderBy("url", "link_no").collect()
    # pseudo-links and the href-less anchor skipped WITHOUT consuming
    # numbering; non-HTML and NULL pages contribute nothing
    assert [(r["link_no"], r["href"]) for r in rows] == [
        (0, "/rel/x"), (1, "https://other.example/abs?q=1"),
        (2, "#frag"), (3, "//cdn.example/proto-rel"),
    ]
    by_no = {r["link_no"]: r for r in rows}
    assert by_no[0]["resolved"] == "https://www.host.example/rel/x"
    assert by_no[0]["is_internal"] and by_no[0]["anchor"] == "Rel Link"
    assert not by_no[1]["is_internal"]
    assert by_no[2]["resolved"] == "https://www.host.example/page/1#frag"
    # protocol-relative inherits the page scheme, lands on the CDN host
    assert by_no[3]["dst_host"] == "cdn.example"

    edges = {(r["src_host"], r["dst_host"]): r["n_links"]
             for r in link_graph(extract_links(pages)).collect()}
    # canonical src host (www. stripped); internal self-loops dropped
    assert edges == {("host.example", "other.example"): 1,
                     ("host.example", "cdn.example"): 1}


def test_extract_image_refs(spark):
    from doc_parser_spark.operators.extract import extract_image_refs

    html = (b'<html><body>'
            b'<img src="/pics/a.jpg" alt=" A   photo " width="640" '
            b'height="auto">'
            b'<img src="data:image/gif;base64,R0lGOD">'
            b'<figure><img src="https://cdn.example/b.png" title="T">'
            b'<figcaption> the  caption </figcaption></figure>'
            b'<img src="//cdn.example/c.gif" width="5%" height="12">'
            b'<img alt="no src at all">'
            b'</body></html>')
    pages = spark.createDataFrame(
        [("https://www.host.example/page/1", bytearray(html)),
         ("https://www.host.example/page/2", bytearray(b"%PDF-1.4 nope")),
         ("https://www.host.example/page/3", None)],
        "url string, html binary",
    )
    rows = extract_image_refs(pages).orderBy("url", "img_no").collect()
    # data: URIs and src-less imgs skipped WITHOUT consuming numbering
    assert [(r["img_no"], r["src"]) for r in rows] == [
        (0, "/pics/a.jpg"), (1, "https://cdn.example/b.png"),
        (2, "//cdn.example/c.gif"),
    ]
    by_no = {r["img_no"]: r for r in rows}
    # alt/title/figcaption whitespace-normalized; '' when absent
    assert by_no[0]["alt"] == "A photo" and by_no[0]["caption"] == ""
    assert by_no[0]["resolved"] == "https://www.host.example/pics/a.jpg"
    assert by_no[0]["width"] == 640 and by_no[0]["height"] is None
    assert by_no[1]["title"] == "T" and by_no[1]["alt"] == ""
    assert by_no[1]["caption"] == "the caption"
    assert by_no[1]["dst_host"] == "cdn.example"
    # percent dims are CSS, not pixel declarations
    assert by_no[2]["width"] is None and by_no[2]["height"] == 12
    assert by_no[2]["resolved"] == "https://cdn.example/c.gif"

    # gallery-spam cap is head-of-document deterministic
    many = b"<html><body>" + b'<img src="/i.png">' * 7 + b"</body></html>"
    pages2 = spark.createDataFrame(
        [("https://h.example/", bytearray(many))], "url string, html binary"
    )
    capped = extract_image_refs(pages2, max_images_per_page=3).collect()
    assert [r["img_no"] for r in capped] == [0, 1, 2]


def test_domain_parts(spark):
    from doc_parser_spark.operators.web import domain_parts

    pages = spark.createDataFrame(
        [(1, "https://news.bbc.co.uk/x"),
         (2, "http://WWW.Example.COM:80/y"),
         (3, "https://a.b.c.site.org/z"),
         (4, "https://192.168.1.10/q"),
         (5, "https://localhost/"),
         (6, "site.co.uk/relative"),     # scheme-less passthrough
         (7, "https://co.uk/")],          # bare multi-suffix host
        "doc_id long, url string",
    )
    by = {r["doc_id"]: r for r in domain_parts(pages).collect()}
    assert by[1]["registered_domain"] == "bbc.co.uk"
    assert by[1]["subdomain"] == "news" and by[1]["tld"] == "uk"
    # www./default port stripped by the canonical host bucket
    assert by[2]["host"] == "example.com"
    assert by[2]["registered_domain"] == "example.com"
    assert by[2]["subdomain"] == "" and by[2]["tld"] == "com"
    assert by[3]["registered_domain"] == "site.org"
    assert by[3]["subdomain"] == "a.b.c"
    # IPv4 literal: whole address is the actor, no tld
    assert by[4]["registered_domain"] == "192.168.1.10"
    assert by[4]["subdomain"] == "" and by[4]["tld"] == ""
    assert by[5]["registered_domain"] == "localhost"
    assert by[5]["tld"] == "localhost"
    # scheme-less URLs still resolve a host through the canonical bucket
    assert by[6]["registered_domain"] == "site.co.uk"
    # a host that IS a public suffix keeps itself as registered domain
    assert by[7]["registered_domain"] == "co.uk"
    assert by[7]["subdomain"] == ""

    # scan-speed contract: pure projection, no exchange/join/Python
    plan = domain_parts(pages)._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Join", "InPandas", "BatchEvalPython"):
        assert bad not in plan, plan


def test_extract_page_meta(spark):
    from doc_parser_spark.operators.extract import extract_page_meta

    html = (b'<html lang=" en-US "><head><title> My  Page </title>'
            b'<title>second ignored</title>'
            b'<link rel="canonical" href="https://c.example/x">'
            b'<link rel="stylesheet" href="/s.css">'
            b'<meta property="og:title" content=" OG  T ">'
            b'<meta property="og:type" content="article">'
            b'<meta name="description" content="D">'
            b'<meta property="article:published_time" '
            b'content="2024-02-03T04:05:06Z">'
            b'<script type="application/ld+json">'
            b'{"@graph": [{"@type": "WebSite"}, {"@type": ["B", "A"]}]}'
            b'</script>'
            b'<script type="application/ld+json">{not json</script>'
            b'<script>var x = 1;</script>'
            b'</head><body><p>hi</p></body></html>')
    pages = spark.createDataFrame(
        [("u1", bytearray(html)),
         ("u2", bytearray(b"%PDF-1.4")),
         ("u3", None)],
        "url string, html binary",
    )
    rows = extract_page_meta(pages).collect()
    assert len(rows) == 1  # non-HTML / NULL pages contribute nothing
    r = rows[0]
    assert r["title"] == "My Page"          # first wins, normalized
    assert r["lang_attr"] == "en-US"
    assert r["canonical"] == "https://c.example/x"
    assert r["og_title"] == "OG T" and r["og_type"] == "article"
    assert r["meta_description"] == "D"
    assert r["published_time"] == "2024-02-03T04:05:06Z"
    # @graph + list-@type flattened, sorted distinct; bad block ignored
    assert r["jsonld_types"] == "A,B,WebSite"
    assert r["n_jsonld"] == 1


def test_wet_records(spark):
    from doc_parser_spark.operators.extract import wet_records

    docs = spark.createDataFrame(
        [("https://a.example/p", "2024-03-05 06:07:08", "héllo wörld"),
         ("https://b.example/q", "2024-03-05 06:07:08", None)],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    recs = {r["url"]: r["wet_record"] for r in wet_records(docs).collect()}
    rec = recs["https://a.example/p"]
    head, _, body = rec.partition("\r\n\r\n")
    lines = head.split("\r\n")
    assert lines[0] == "WARC/1.0"
    assert "WARC-Type: conversion" in lines
    assert "WARC-Target-URI: https://a.example/p" in lines
    assert "WARC-Date: 2024-03-05T06:07:08Z" in lines
    # Content-Length counts UTF-8 octets, not characters
    assert f"Content-Length: {len('héllo wörld'.encode())}" in lines
    assert body == "héllo wörld\r\n\r\n"
    # record ids are deterministic (md5 over URI+date) and distinct
    ids = [l for r in recs.values() for l in r.split("\r\n")
           if l.startswith("WARC-Record-ID")]
    assert len(set(ids)) == 2
    # NULL text → empty payload, Content-Length 0
    assert "Content-Length: 0" in recs["https://b.example/q"]


def test_extract_table_cells(spark):
    from doc_parser_spark.operators.extract import extract_table_cells

    html = (b'<html><body><p>before</p><table>'
            b'<tr><th rowspan="2">h</th><td colspan="2">wide</td></tr>'
            b'<tr><td>x</td><td>y</td></tr>'
            b'</table><table><tr><td>solo</td></tr></table></body></html>')
    pages = spark.createDataFrame(
        [("https://h.example/p", None, bytearray(html), "", "en")],
        "url string, warc_ts timestamp, html binary, text string,"
        " lang string",
    )
    rows = extract_table_cells(pages).orderBy("table_no", "cell_no").collect()
    assert [(r["table_no"], r["cell_no"], r["text"]) for r in rows] == [
        (0, 0, "h"), (0, 1, "wide"), (0, 2, "x"), (0, 3, "y"),
        (1, 0, "solo"),
    ]
    by = {(r["table_no"], r["cell_no"]): r for r in rows}
    # rowspan TH → row_header with a 2-row extent; colspan spans 2 cols
    assert by[(0, 0)]["row_header"] and by[(0, 0)]["end_row"] == 2
    assert by[(0, 0)]["row_span"] == 2 and not by[(0, 0)]["column_header"]
    assert by[(0, 1)]["col_span"] == 2 and by[(0, 1)]["end_col"] == 3
    assert by[(0, 0)]["table_rows"] == 2 and by[(0, 0)]["table_cols"] == 3
    assert by[(1, 0)]["table_rows"] == 1 and by[(1, 0)]["table_cols"] == 1


def test_anchor_text_topk_and_filters(spark):
    from doc_parser_spark.operators.web import anchor_text
    import pytest

    rows = [
        ("u1", "https://t.example/a", "Great Page", False),
        ("u2", "https://t.example/a", "Great Page", False),
        ("u3", "https://t.example/a", "click here", False),
        ("u4", "https://t.example/a", "Archive", False),
        ("u5", "https://t.example/a", "Best Page", False),
        ("u6", "https://t.example/b", "home", True),      # internal: out
        ("u7", "https://t.example/b", "  ", False),       # blank: out
    ]
    df = spark.createDataFrame(
        rows, "url string, resolved string, anchor string, is_internal boolean"
    )
    out = anchor_text(df, 3).collect()
    assert len(out) == 1  # /b had only internal/blank anchors
    r = out[0]
    assert r["n_incoming"] == 5 and r["n_distinct_anchors"] == 4
    # count desc then lexicographic: Great Page(2), Archive, Best Page
    assert r["top_anchors"] == "Great Page | Archive | Best Page"
    with pytest.raises(ValueError):
        anchor_text(df, 0)


def test_latest_capture_keeps_newest_and_breaks_ties_low_doc_id(spark):
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [
        # one canonical url, three captures; newest (hour 9) wins
        Row(doc_id=1, url="http://WWW.ex.com:80/a", warc_ts=t(3)),
        Row(doc_id=2, url="http://ex.com/a", warc_ts=t(9)),
        Row(doc_id=3, url="http://ex.com/a?utm_source=x", warc_ts=t(5)),
        # tie on ts -> lowest doc_id survives
        Row(doc_id=7, url="http://ex.com/b", warc_ts=t(4)),
        Row(doc_id=5, url="http://ex.com/b", warc_ts=t(4)),
    ]
    out = {
        r.canonical_url: r
        for r in web.latest_capture(spark.createDataFrame(rows)).collect()
    }
    a = out["http://ex.com/a"]
    assert a.keep_doc_id == 2 and a.n_captures == 3
    assert a.last_ts == t(9) and a.first_ts == t(3)
    b = out["http://ex.com/b"]
    assert b.keep_doc_id == 5 and b.n_captures == 2


def test_extract_incremental_skips_unchanged_pages(spark):
    cur = spark.createDataFrame(
        [
            Row(doc_id=1, url="u1", text="same"),
            Row(doc_id=2, url="u2", text="edited"),
            Row(doc_id=3, url="u3", text="brand new"),
            Row(doc_id=4, url="u4", text=None),  # NULL text hashes as ''
        ]
    )
    prior = cur.where("doc_id in (1, 2, 4)").select(
        "url",
        F.sha2(
            F.when(F.col("doc_id") == 2, F.lit("old version")).otherwise(
                F.coalesce("text", F.lit(""))
            ),
            256,
        ).alias("content_hash"),
    )
    got = sorted(
        r.doc_id for r in web.extract_incremental(cur, prior).collect()
    )
    # u1 unchanged, u4 unchanged (NULL == NULL via coalesce); u2 changed, u3 new
    assert got == [2, 3]


def test_extract_incremental_never_broadcasts_prior(spark):
    cur = spark.createDataFrame([Row(doc_id=1, url="u", text="t")])
    prior = cur.select(
        "url", F.sha2(F.coalesce("text", F.lit("")), 256).alias("content_hash")
    )
    plan = (
        web.extract_incremental(cur, prior)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "broadcast" not in plan.lower()


def test_template_strip_host_level(spark):
    nav, foot = "Home | About", "(c) hostA"
    rows = [
        # hostA: 4 pages, nav on 4/4 and footer on 3/4 -> both template at 50%
        Row(doc_id=1, host="a.com", text=f"{nav}\nunique one\n{foot}"),
        Row(doc_id=2, host="a.com", text=f"{nav}\nunique two\n{foot}"),
        Row(doc_id=3, host="a.com", text=f"{nav}\nunique three\n{foot}"),
        # nav repeated WITHIN doc 4: counts once toward df, both copies strip
        Row(doc_id=4, host="a.com", text=f"{nav}\nunique four\n{nav}"),
        # 'shared pair' on exactly 2/4 pages (50% boundary -> template)
        Row(doc_id=5, host="a.com", text="shared pair"),
        Row(doc_id=6, host="a.com", text="shared pair\nsolo line"),
        # hostB has the same nav but only 2 pages (< min_pages) -> exempt
        Row(doc_id=7, host="b.com", text=f"{nav}\nb body"),
        Row(doc_id=8, host="b.com", text=f"{nav}\nb other"),
        Row(doc_id=9, host="c.com", text=None),
    ]
    # hostA now has 6 pages: nav on 4/6 (67%), foot on 3/6 (50%) -> template;
    # 'shared pair' on 2/6 (33%) -> kept
    out = {
        r.doc_id: r
        for r in web.template_strip(
            spark.createDataFrame(rows), min_pct=50, min_pages=3
        ).collect()
    }
    assert out[1].clean_text == "unique one"
    assert out[1].n_lines_kept == 1 and out[1].n_lines_dropped == 2
    # within-doc repeat: every occurrence stripped
    assert out[4].clean_text == "unique four"
    assert out[4].n_lines_dropped == 2
    # sub-threshold line survives
    assert out[5].clean_text == "shared pair"
    assert out[6].clean_text == "shared pair\nsolo line"
    # small host exempt from template detection
    assert out[7].clean_text == f"{nav}\nb body"
    assert out[7].n_lines_dropped == 0
    # NULL text -> zero lines, not -1
    assert out[9].clean_text == "" and out[9].n_lines_dropped == 0
    assert out[9].n_lines_kept == 0


def test_template_strip_matches_python_replica_randomized(spark):
    import random

    rng = random.Random(0xC0FFEE)
    hosts = [f"h{i}.com" for i in range(6)]
    vocab = ["alpha", "beta", "gamma", "delta", "nav bar", "footer (c)",
             "  padded  ", "", "repeat me", "tail"]
    rows = []
    for doc_id in range(80):
        host = rng.choice(hosts)
        n = rng.randint(0, 6)
        lines = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.1:
            text = None
        else:
            text = "\n".join(lines)
        rows.append((doc_id, host, text))

    min_pct, min_pages = 40, 3

    # pure-python replica of the documented semantics
    def lines_of(t):
        return [l.strip() for l in (t or "").split("\n") if l.strip() != ""]

    by_host = {}
    for d, h, t in rows:
        by_host.setdefault(h, []).append((d, lines_of(t)))
    template = set()
    for h, docs in by_host.items():
        if len(docs) < min_pages:
            continue
        df = {}
        for d, ls in docs:
            for l in set(ls):
                df[l] = df.get(l, 0) + 1
        for l, c in df.items():
            if 100 * c >= min_pct * len(docs):
                template.add((h, l))
    want = {}
    for d, h, t in rows:
        ls = lines_of(t)
        kept = [l for l in ls if (h, l) not in template]
        want[d] = ("\n".join(kept), len(kept), len(ls) - len(kept))

    from pyspark.sql import Row

    out = {
        r.doc_id: (r.clean_text, r.n_lines_kept, r.n_lines_dropped)
        for r in web.template_strip(
            spark.createDataFrame(
                [Row(doc_id=d, host=h, text=t) for d, h, t in rows]
            ),
            min_pct=min_pct,
            min_pages=min_pages,
        ).collect()
    }
    assert out == want


def test_fetch_waves_politeness(spark):
    import hashlib

    rows = [
        Row(doc_id=i, url=f"http://host{i % 3}.com/p/{i}") for i in range(20)
    ]
    out = web.fetch_waves(
        spark.createDataFrame(rows), per_host=2
    ).collect()
    assert len(out) == 20
    # politeness invariant: no (host, wave) bucket exceeds per_host
    from collections import Counter

    buckets = Counter((r.host, r.wave) for r in out)
    assert max(buckets.values()) <= 2
    # waves are dense from 0 and slots enumerate 0..per_host-1
    for host in {r.host for r in out}:
        mine = sorted(
            (r.wave, r.slot) for r in out if r.host == host
        )
        expect = [(i // 2, i % 2) for i in range(len(mine))]
        assert mine == expect, host
    # deterministic order: md5(doc_id) pick, not arrival order
    h0 = sorted((r for r in out if r.host == "host0.com"),
                key=lambda r: (r.wave, r.slot))
    picks = [hashlib.md5(str(r.doc_id).encode()).hexdigest() for r in h0]
    assert picks == sorted(picks)


def test_fetch_waves_validates_per_host(spark):
    import pytest

    df = spark.createDataFrame([Row(doc_id=1, url="http://a.com/x")])
    with pytest.raises(ValueError):
        web.fetch_waves(df, per_host=0)


def test_host_lang_profile_dominant_and_ties(spark):
    rows = (
        [Row(url="http://a.com/1", lang="en")] * 3
        + [Row(url="https://WWW.a.com/2", lang="de")] * 3  # tie with en
        + [Row(url="http://a.com:80/3", lang="fr")]
        + [Row(url="http://b.com/x", lang="ko")] * 2
    )
    rows = [Row(url=r.url + f"?i={i}", lang=r.lang) for i, r in enumerate(rows)]
    out = {r.host: r for r in web.host_lang_profile(
        spark.createDataFrame(rows)).collect()}
    a = out["a.com"]  # www./port variants share the bucket
    assert (a.n_docs, a.n_langs) == (7, 3)
    assert a.dominant_lang == "de"  # 3-3 tie -> lexicographically smallest
    assert a.dominant_ppm == 428571  # floor(1e6 * 3/7)
    b = out["b.com"]
    assert (b.n_docs, b.n_langs, b.dominant_lang, b.dominant_ppm) == (
        2, 1, "ko", 1000000)


def test_host_lang_profile_null_lang_folds_to_empty(spark):
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([
        StructField("url", StringType()), StructField("lang", StringType()),
    ])
    rows = [("http://n.com/1", None), ("http://n.com/2", None),
            ("http://n.com/3", "en")]
    out = web.host_lang_profile(
        spark.createDataFrame(rows, schema)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.n_langs, r.dominant_lang) == (3, 2, "")


def test_fetch_waves_partition_invariant(spark):
    """The wave assignment is a global contract — it must not depend on
    input partitioning (the per-host rank is computed after a host
    shuffle, so any layout must produce identical waves)."""
    rows = [Row(doc_id=i, url=f"http://h{i % 5}.com/{i}") for i in range(200)]
    df1 = spark.createDataFrame(rows).repartition(1)
    df13 = spark.createDataFrame(rows).repartition(13)
    a = {r.doc_id: (r.wave, r.slot) for r in web.fetch_waves(df1).collect()}
    b = {r.doc_id: (r.wave, r.slot) for r in web.fetch_waves(df13).collect()}
    assert a == b


def test_soft404_tiny_error_page_flagged(spark):
    rows = [
        # classic soft-404: tiny body + phrase → flagged
        Row(doc_id=1, text="Error 404 - Page Not Found."),
        # long article that merely QUOTES one phrase → not flagged
        Row(doc_id=2, text="A history of HTTP errors. The phrase page not "
            "found became iconic. " + "More prose here. " * 30),
        # two independent phrases → flagged even on a long page
        Row(doc_id=3, text="This page has been removed and is no longer "
            "available to readers. " + "Padding sentence. " * 30),
        # digit-guarded 404 token: dates/ids must NOT fire
        Row(doc_id=4, text="Released 2024-04-04 under ticket 14045."),
        # bare 404 token on a tiny page → flagged
        Row(doc_id=5, text="404. Sorry."),
        Row(doc_id=6, text=None),
    ]
    out = {r.doc_id: r for r in
           web.soft404_flags(spark.createDataFrame(rows)).collect()}
    assert out[1].soft404 and out[1].is_tiny and out[1].n_phrases >= 1
    assert not out[2].soft404 and out[2].n_phrases == 1
    assert out[3].soft404 and out[3].n_phrases == 2
    assert not out[4].soft404 and not out[4].has_404_token
    assert out[5].soft404 and out[5].has_404_token
    assert not out[6].soft404 and out[6].n_chars_trim == 0


def test_cdx_index_surt_keys(spark):
    import datetime as dt

    ts = dt.datetime(2024, 3, 5, 12, 30, 9)
    pages = spark.createDataFrame(
        [
            ("HTTPS://WWW.Sub.Example.COM/A/B?utm_source=x&b=2&a=1#f", ts, "body one"),
            ("http://other.example.com:8080/Case/Path", ts, "body two"),
            ("http://example.com", ts, "body three"),
        ],
        "url string, warc_ts timestamp, text string",
    )
    rows = web.cdx_index(pages).collect()
    by_url = {r["url"]: r for r in rows}
    # host labels reversed + lowercased; www stripped by canonicalization;
    # tracking params dropped, survivors sorted; path lowercased in the KEY only
    r = by_url["HTTPS://WWW.Sub.Example.COM/A/B?utm_source=x&b=2&a=1#f"]
    assert r["surt_key"] == "com,example,sub)/a/b?a=1&b=2"
    assert r["canonical_url"] == "https://sub.example.com/A/B?a=1&b=2"
    assert r["ts14"] == "20240305123009"
    assert len(r["digest"]) == 64 and r["length"] == len(b"body one")
    # non-default port rides inside the key before ')'
    assert by_url["http://other.example.com:8080/Case/Path"]["surt_key"] == (
        "com,example,other:8080)/case/path"
    )
    # bare host -> '/' path
    assert by_url["http://example.com"]["surt_key"] == "com,example)/"
    # global index order: (surt_key, ts14)
    assert [x["surt_key"] for x in rows] == sorted(x["surt_key"] for x in rows)


def test_capture_drift_counts_transitions_not_versions(spark):
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [
        # url A across variants: x -> y -> y -> x : 4 captures, 2 distinct
        # fingerprints, 3 transitions... no: x->y change, y->y no, y->x change
        Row(doc_id=1, url="http://WWW.ex.com:80/a", warc_ts=t(0), text="x"),
        Row(doc_id=2, url="http://ex.com/a", warc_ts=t(2), text="y"),
        Row(doc_id=3, url="http://ex.com/a?utm_source=q", warc_ts=t(5), text="y"),
        Row(doc_id=4, url="http://ex.com/a", warc_ts=t(11), text="x"),
        # singleton url B; NULL text folds to ''
        Row(doc_id=9, url="http://ex.com/b", warc_ts=t(3), text=None),
    ]
    out = {
        r.canonical_url: r
        for r in web.capture_drift(spark.createDataFrame(rows)).collect()
    }
    a = out["http://ex.com/a"]
    assert a.n_captures == 4 and a.n_versions == 2 and a.n_changes == 2
    # 2 changes / 3 gaps, floor-truncated to 6 places
    assert a.change_rate == 0.666666
    assert a.first_ts == t(0) and a.last_ts == t(11)
    # last content change happened at hour 11 (y -> x), so staleness is 0
    assert a.stale_hours == 0
    b = out["http://ex.com/b"]
    assert b.n_captures == 1 and b.n_versions == 1 and b.n_changes == 0
    assert b.change_rate == 0.0 and b.stale_hours == 0


def test_capture_drift_stale_hours_measures_back_off_signal(spark):
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [
        # page changed once early, then 3 identical recrawls: staleness
        # spans from the LAST change (hour 2) to the last capture (hour 20)
        Row(doc_id=1, url="http://ex.com/p", warc_ts=t(0), text="v1"),
        Row(doc_id=2, url="http://ex.com/p", warc_ts=t(2), text="v2"),
        Row(doc_id=3, url="http://ex.com/p", warc_ts=t(8), text="v2"),
        Row(doc_id=4, url="http://ex.com/p", warc_ts=t(20), text="v2"),
    ]
    (r,) = web.capture_drift(spark.createDataFrame(rows)).collect()
    assert r.n_changes == 1 and r.n_versions == 2
    assert r.stale_hours == 18
    assert r.change_rate == 0.333333


def test_crawl_diff_classifies_all_four_verdicts(spark):
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)
    t2 = lambda h: dt.datetime(2024, 2, 1, h)
    old = spark.createDataFrame(
        [
            # /a unchanged; variant urls collapse to one canonical row
            Row(doc_id=1, url="http://WWW.ex.com:80/a", warc_ts=t(0), text="x"),
            Row(doc_id=2, url="http://ex.com/a", warc_ts=t(5), text="x"),
            # /b changed in the new crawl
            Row(doc_id=3, url="http://ex.com/b", warc_ts=t(1), text="old"),
            # /c dropped out of the new crawl
            Row(doc_id=4, url="http://ex.com/c", warc_ts=t(2), text="c"),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=11, url="http://ex.com/a?utm_source=z", warc_ts=t2(0), text="x"),
            Row(doc_id=12, url="http://ex.com/b", warc_ts=t2(1), text="new"),
            # /d newly discovered
            Row(doc_id=13, url="http://ex.com/d", warc_ts=t2(2), text="d"),
        ]
    )
    out = {r.canonical_url: r for r in web.crawl_diff(old, new).collect()}
    assert out["http://ex.com/a"].verdict == "unchanged"
    assert out["http://ex.com/b"].verdict == "changed"
    assert out["http://ex.com/c"].verdict == "gone"
    assert out["http://ex.com/d"].verdict == "added"
    a = out["http://ex.com/a"]
    # newest capture's ts rides through on both sides
    assert a.old_ts == t(5) and a.new_ts == t2(0)
    # absent side carries NULL ts and '' fp
    c = out["http://ex.com/c"]
    assert c.new_ts is None and c.new_fp == ""
    d = out["http://ex.com/d"]
    assert d.old_ts is None and d.old_fp == ""


def test_crawl_diff_latest_capture_decides_content(spark):
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)
    # old snapshot has TWO captures of /p: early 'v2', late 'v1'; the
    # NEWEST one ('v1') is the comparison content, so vs new 'v1' the
    # verdict is unchanged even though an older capture differed
    old = spark.createDataFrame(
        [
            Row(doc_id=1, url="http://ex.com/p", warc_ts=t(1), text="v2"),
            Row(doc_id=2, url="http://ex.com/p", warc_ts=t(9), text="v1"),
        ]
    )
    new = spark.createDataFrame(
        [Row(doc_id=3, url="http://ex.com/p", warc_ts=t(20), text="v1")]
    )
    (r,) = web.crawl_diff(old, new).collect()
    assert r.verdict == "unchanged"


def test_frontier_urls_anti_joins_crawled_and_folds_fragments(spark):
    links = spark.createDataFrame(
        [
            # two pages cite the same undiscovered target (variant forms)
            Row(url="https://old.ex.com/page/1", resolved="https://NEW.ex.com/a?utm_source=x"),
            Row(url="https://old.ex.com/page/2", resolved="https://new.ex.com/a"),
            # page 1 cites it twice: n_refs counts links, pages distinct
            Row(url="https://old.ex.com/page/1", resolved="https://new.ex.com/a"),
            # fragment self-link folds onto the crawled page -> removed
            Row(url="https://old.ex.com/page/3", resolved="https://old.ex.com/page/3#top"),
            # already-crawled target -> removed
            Row(url="https://old.ex.com/page/4", resolved="https://old.ex.com/page/9"),
        ]
    )
    crawled = spark.createDataFrame(
        [
            Row(url="https://old.ex.com/page/3"),
            Row(url="https://old.ex.com/page/9"),
            Row(url="https://old.ex.com/page/1"),
            Row(url="https://old.ex.com/page/2"),
            Row(url="https://old.ex.com/page/4"),
        ]
    )
    out = web.frontier_urls(links, crawled).collect()
    assert len(out) == 1
    (r,) = out
    assert r.canonical_url == "https://new.ex.com/a"
    assert r.host == "new.ex.com"
    assert r.n_refs == 3 and r.n_referrer_pages == 2


def test_robots_directives_group_grammar(spark):
    payload = (
        "# policy\n"
        "User-agent: google\n"
        "Disallow: /private\n"
        "\n"
        "User-Agent: *\n"        # case-insensitive field
        "User-agent: bing\n"     # consecutive UA extends the group
        "Disallow: /tmp # trailing comment\n"
        "Allow: /public\n"
        "nocolonline\n"          # no ':' -> no row, does NOT close group
        "Crawl-delay: 3\n"
        "Sitemap: https://ex.com/sitemap.xml\n"  # value keeps its ':'
    )
    df = spark.createDataFrame([("ex.com", payload)], "host string, payload string")
    rows = {r.line_no: r for r in web.robots_directives(df).collect()}
    assert rows[1].field == "user-agent" and rows[1].group_id == 1
    assert not rows[2].in_star  # google group
    assert rows[4].group_id == 2 and rows[4].in_star
    assert rows[5].group_id == 2 and rows[5].value == "bing"
    assert rows[6].value == "/tmp" and rows[6].in_star  # comment stripped
    assert rows[9].field == "crawl-delay" and rows[9].in_star
    assert rows[10].field == "sitemap"
    assert rows[10].value == "https://ex.com/sitemap.xml"
    assert 0 not in rows and 3 not in rows and 8 not in rows


def test_robots_directives_stray_rule_before_any_group(spark):
    df = spark.createDataFrame(
        [("h", "Disallow: /x\nUser-agent: *\nDisallow: /y\n")],
        "host string, payload string",
    )
    rows = {r.line_no: r for r in web.robots_directives(df).collect()}
    # stray rule: group 0, never in star
    assert rows[0].group_id == 0 and not rows[0].in_star
    assert rows[2].group_id == 1 and rows[2].in_star


def test_robots_directives_matches_parse_robots_randomized(spark):
    import random

    rng = random.Random(20260820)
    fields = ["User-agent", "Disallow", "Allow", "Crawl-delay", "Sitemap",
              "Unknown-field"]
    uas = ["*", "google", "bing"]
    vals = ["/", "/a", "/tmp/x", "", "3", "https://e.com/s.xml"]
    cases = []
    for h in range(40):
        n = rng.randint(0, 14)
        lines = []
        for _ in range(n):
            roll = rng.random()
            if roll < 0.15:
                lines.append(rng.choice(["", "# comment", "junk no colon"]))
            else:
                f = rng.choice(fields)
                v = rng.choice(uas) if f == "User-agent" else rng.choice(vals)
                suffix = " # c" if rng.random() < 0.2 else ""
                lines.append(f"{f}: {v}{suffix}")
        cases.append((f"h{h}", "\n".join(lines)))
    df = spark.createDataFrame(cases, "host string, payload string")
    got = (
        web.robots_directives(df)
        .where("in_star AND field IN ('allow', 'disallow')")
        .orderBy("host", "line_no")
        .collect()
    )
    from collections import defaultdict

    by_host = defaultdict(list)
    for r in got:
        by_host[r.host].append((r.field, r.value))
    for host, payload in cases:
        assert by_host.get(host, []) == web.parse_robots(payload), host


def test_robots_stats_profile(spark):
    df = spark.createDataFrame(
        [
            ("a", "User-agent: *\nDisallow: /\nCrawl-delay: 7\n"
                  "Sitemap: /s1\nSitemap: /s2\n"),
            ("b", "User-agent: g\nDisallow: /x\nUser-agent: *\nAllow: /\n"
                  "Crawl-delay: soon\n"),  # non-numeric delay -> NULL
            ("c", "# nothing but comments\n"),
        ],
        "host string, payload string",
    )
    out = {r.host: r for r in web.robots_stats(web.robots_directives(df)).collect()}
    a = out["a"]
    assert a.n_groups == 1 and a.n_star_rules == 1 and a.disallow_all
    assert a.crawl_delay == 7.0 and a.n_sitemaps == 2
    b = out["b"]
    assert b.n_groups == 2 and b.n_star_rules == 1 and not b.disallow_all
    assert b.crawl_delay is None and b.n_sitemaps == 0
    assert "c" not in out  # no directives at all -> no profile row


def test_polite_schedule_queue_discipline(spark):
    frontier = spark.createDataFrame(
        [
            ("a.com", "https://a.com/p1", 5),
            ("a.com", "https://a.com/p2", 9),
            ("a.com", "https://a.com/p3", 9),   # tie -> url asc
            ("blocked.com", "https://blocked.com/x", 100),
            ("norobots.com", "https://norobots.com/y", 1),
        ],
        "host string, canonical_url string, n_refs long",
    )
    robots = spark.createDataFrame(
        [
            ("a.com", False, 120.0),       # clamped to max_delay
            ("blocked.com", True, None),   # disallow_all -> dropped
        ],
        "host string, disallow_all boolean, crawl_delay double",
    )
    out = web.polite_schedule(frontier, robots, default_delay=2.0,
                              max_delay=30.0)
    rows = {(r.host, r.canonical_url): r for r in out.collect()}
    assert ("blocked.com", "https://blocked.com/x") not in rows
    a2 = rows[("a.com", "https://a.com/p2")]
    a3 = rows[("a.com", "https://a.com/p3")]
    a1 = rows[("a.com", "https://a.com/p1")]
    assert (a2.slot, a3.slot, a1.slot) == (0, 1, 2)  # refs desc, url asc
    assert a1.delay_s == 30.0 and a1.not_before_s == 60.0  # clamped
    ny = rows[("norobots.com", "https://norobots.com/y")]
    assert ny.delay_s == 2.0 and ny.slot == 0 and ny.not_before_s == 0.0


def test_polite_schedule_non_numeric_delay_falls_back(spark):
    frontier = spark.createDataFrame(
        [("h.com", "https://h.com/a", 1)],
        "host string, canonical_url string, n_refs long",
    )
    robots = spark.createDataFrame(
        [("h.com", False, None)],  # robots_stats NULL delay (non-numeric)
        "host string, disallow_all boolean, crawl_delay double",
    )
    r = web.polite_schedule(frontier, robots, default_delay=1.5).first()
    assert r.delay_s == 1.5


def test_url_templates_trap_detection(spark):
    urls = (
        [(f"https://trap.com/cal/2024/{d}",) for d in range(1, 7)]
        + [("https://trap.com/about",)]
        + [("https://ok.com/a/1",), ("https://ok.com/b/2",),
           ("https://ok.com/c/3",)]
        + [("https://ok.com/a/1#frag",)]  # canonical-folds onto a/1
    )
    df = spark.createDataFrame(urls, "url string")
    out = {(r.host, r.template): r
           for r in web.url_templates(df, trap_min_urls=3,
                                      trap_min_share=0.5).collect()}
    t = out[("trap.com", "/cal/{n}/{n}")]
    assert t.n_urls == 6 and t.depth == 3 and t.trap
    assert abs(t.host_share - 6 / 7) < 1e-12
    assert not out[("trap.com", "/about")].trap
    # ok.com: each template 1 url -> below trap_min_urls, no trap
    assert out[("ok.com", "/a/{n}")].n_urls == 1
    assert not any(r.trap for (h, _), r in out.items() if h == "ok.com")
    shares = sum(r.host_share for (h, _), r in out.items() if h == "ok.com")
    assert abs(shares - 1.0) < 1e-12


def test_trustrank_hand_computed_and_spam_island_zero(spark):
    edges = spark.createDataFrame(
        [("s", "a"), ("c", "d"), ("d", "c")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("s",)], "host string")
    out = {r.host: r for r in
           web.host_trustrank(edges, seeds, iterations=2).collect()}
    # n_seeds=1 -> base 1e6.  iter1: s=(15*1e6)//100=150000,
    # a=(85*1e6)//100=850000.  iter2: s=150000, a=(85*150000)//100=127500.
    assert out["s"].trust_scaled == 150_000 and out["s"].is_seed
    assert out["a"].trust_scaled == 127_500 and not out["a"].is_seed
    # spam island unreachable from the seed: exactly zero trust
    assert out["c"].trust_scaled == 0 and out["d"].trust_scaled == 0
    assert out["a"].trust == 127_500 / 1e6


def test_trustrank_seed_mass_splits_and_out_of_graph_seed_ignored(spark):
    edges = spark.createDataFrame(
        [("s1", "a"), ("s2", "a")], "src string, dst string"
    )
    seeds = spark.createDataFrame(
        [("s1",), ("s2",), ("ghost",)], "host string"
    )
    out = {r.host: r for r in
           web.host_trustrank(edges, seeds, iterations=1).collect()}
    assert "ghost" not in out  # not a graph node
    # base = 1e6 // 2 = 500000 each; a gets 85% of both contributions
    assert out["a"].trust_scaled == (85 * (500_000 + 500_000)) // 100
    assert out["s1"].trust_scaled == (15 * 500_000) // 100


def test_trustrank_validates_inputs(spark):
    import pytest

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("zz",)], "host string")
    with pytest.raises(ValueError):
        web.host_trustrank(edges, seeds, iterations=0)
    with pytest.raises(ValueError):
        web.host_trustrank(edges, seeds, iterations=1)  # no seed in graph


def test_spam_mass_matches_parent_operators(spark):
    # fused sweep must be bit-equal to the two parent power iterations
    rows = [(f"h{i}", f"h{(i * 7 + o) % 13}") for i in range(13)
            for o in (1, 5, 11)]
    edges = spark.createDataFrame(rows, "src string, dst string")
    seeds = spark.createDataFrame([("h0",), ("h5",)], "host string")
    sm = {r.host: r for r in
          web.host_spam_mass(edges, seeds, iterations=4).collect()}
    pr = {r.host: r.rank_scaled for r in
          web.host_pagerank(edges, iterations=4).collect()}
    tr = {r.host: r.trust_scaled for r in
          web.host_trustrank(edges, seeds, iterations=4).collect()}
    assert set(sm) == set(pr) == set(tr)
    for h, row in sm.items():
        assert row.rank_scaled == pr[h], h
        assert row.trust_scaled == tr[h], h


def test_spam_mass_island_full_and_seed_clamped(spark):
    edges = spark.createDataFrame(
        [("s", "a"), ("c", "d"), ("d", "c")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("s",)], "host string")
    out = {r.host: r for r in
           web.host_spam_mass(edges, seeds, iterations=2).collect()}
    n = 4
    # spam island: zero trust -> all rank is unexplained mass, bp = 10000
    for h in ("c", "d"):
        assert out[h].trust_scaled == 0
        assert out[h].spam_mass_scaled == out[h].rank_scaled
        assert out[h].spam_mass_bp == 10_000
    # the seed itself: trust*n exceeds rank -> both clamps engage
    s = out["s"]
    assert s.trust_scaled * n > s.rank_scaled
    assert s.spam_mass_scaled == 0 and s.spam_mass_bp == 0
    # a: r=150000+850000=1000000... iter2 r=150000+(85*(150000))//100
    # hand-check bp arithmetic for the non-clamped host
    a = out["a"]
    expect_bp = min(10_000, max(
        0, 10_000 - (a.trust_scaled * n * 10_000) // a.rank_scaled))
    assert a.spam_mass_bp == expect_bp
    assert a.spam_mass_scaled == max(0, a.rank_scaled - a.trust_scaled * n)


def test_spam_mass_validates_inputs(spark):
    import pytest

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        web.host_spam_mass(
            edges, spark.createDataFrame([("a",)], "host string"),
            iterations=0)
    with pytest.raises(ValueError):
        web.host_spam_mass(
            edges, spark.createDataFrame([("zz",)], "host string"),
            iterations=1)


def _drift_row(spark, url, n_cap, n_chg, first, last, stale):
    return spark.createDataFrame(
        [(url, n_cap, 1, n_chg, first, last, stale)],
        "canonical_url string, n_captures long, n_versions long,"
        " n_changes long, first_ts timestamp, last_ts timestamp,"
        " stale_hours long",
    )


def test_revisit_schedule_rules(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def at(h):
        return t0 + dt.timedelta(hours=h)

    rows = (
        _drift_row(spark, "cold", 1, 0, t0, t0, 0)
        .unionByName(_drift_row(spark, "static", 5, 0, t0, at(100), 100))
        # span 100h, 10 changes -> period 10, stale 5 <= 40 -> tracking 5
        .unionByName(_drift_row(spark, "track", 11, 10, t0, at(100), 5))
        # stale 50 > 40 -> backoff 2*10=20
        .unionByName(_drift_row(spark, "back", 11, 10, t0, at(100), 50))
        # burst: span 0 -> cold_start even with changes
        .unionByName(_drift_row(spark, "burst", 3, 2, t0, t0, 0))
        # hot page: period 0 via span 1h/3 changes -> clamp to min
        .unionByName(_drift_row(spark, "hot", 4, 3, t0, at(1), 0))
    )
    out = {r.canonical_url: r for r in
           web.revisit_schedule(rows, min_hours=2, max_hours=150,
                                default_hours=24).collect()}
    assert (out["cold"].reason, out["cold"].revisit_hours) == ("cold_start", 24)
    assert (out["static"].reason, out["static"].revisit_hours) == ("static", 150)  # 200 clamped
    assert (out["track"].reason, out["track"].revisit_hours) == ("tracking", 5)
    assert out["track"].change_period_hours == 10
    assert (out["back"].reason, out["back"].revisit_hours) == ("backoff", 20)
    assert (out["burst"].reason, out["burst"].revisit_hours) == ("cold_start", 24)
    assert (out["hot"].reason, out["hot"].revisit_hours) == ("tracking", 2)  # clamp min


def test_revisit_schedule_composes_with_capture_drift(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [
            (1, "https://a.com/x", t0, "v1"),
            (2, "https://a.com/x", t0 + dt.timedelta(hours=10), "v2"),
            (3, "https://a.com/x", t0 + dt.timedelta(hours=20), "v2"),
        ],
        "doc_id long, url string, warc_ts timestamp, text string",
    )
    out = web.revisit_schedule(web.capture_drift(pages)).collect()
    assert len(out) == 1
    r = out[0]
    # span 20h, 1 change at h10, stale 10h > 4*20? period=20, stale 10<=80
    assert (r.span_hours, r.change_period_hours) == (20, 20)
    assert (r.reason, r.revisit_hours) == ("tracking", 10)


def test_revisit_schedule_validates(spark):
    import pytest

    d = _drift_row(spark, "u", 1, 0,
                   __import__("datetime").datetime(2024, 1, 1),
                   __import__("datetime").datetime(2024, 1, 1), 0)
    with pytest.raises(ValueError):
        web.revisit_schedule(d, min_hours=10, default_hours=5)


def test_canonical_verdicts_resolution_and_classes(spark):
    meta = spark.createDataFrame(
        [
            ("https://a.com/d/p1", ""),                          # none
            ("https://a.com/d/p2", "https://a.com/d/p2"),        # self abs
            ("https://www.a.com/d/p3?utm_source=x",
             "https://a.com:443/d/p3"),                          # self via norm
            ("https://a.com/d/p4", "/d/p2"),                     # root-rel
            ("https://a.com/d/p5", "other"),                     # dir-rel
            ("https://a.com/d/p6", "//a.com/d/p6"),              # proto-rel self
            ("https://a.com/d/p7", "https://b.net/x"),           # cross host
            ("https://a.com/d/p8", None),                        # null
        ],
        "url string, canonical string",
    )
    out = {r.url: r for r in web.canonical_verdicts(meta).collect()}
    assert out["https://a.com/d/p1"].verdict == "none"
    assert out["https://a.com/d/p2"].verdict == "self"
    assert out["https://www.a.com/d/p3?utm_source=x"].verdict == "self"
    p4 = out["https://a.com/d/p4"]
    assert (p4.verdict, p4.canonical_resolved) == (
        "same_host", "https://a.com/d/p2")
    p5 = out["https://a.com/d/p5"]
    assert (p5.verdict, p5.canonical_resolved) == (
        "same_host", "https://a.com/d/other")
    assert out["https://a.com/d/p6"].verdict == "self"
    assert out["https://a.com/d/p7"].verdict == "cross_host"
    assert out["https://a.com/d/p8"].verdict == "none"
    # chain: p4 -> p2 (self-declaring) is NOT a chain
    assert not p4.is_chain


def test_canonical_verdicts_chain_flag(spark):
    meta = spark.createDataFrame(
        [
            ("https://a.com/x", "https://a.com/y"),   # x -> y
            ("https://a.com/y", "https://a.com/z"),   # y -> z  (so x chains)
            ("https://a.com/z", "https://a.com/z"),   # z self
        ],
        "url string, canonical string",
    )
    out = {r.url: r for r in web.canonical_verdicts(meta).collect()}
    assert out["https://a.com/x"].is_chain          # target y non-self
    assert not out["https://a.com/y"].is_chain      # target z is self
    assert not out["https://a.com/z"].is_chain      # self never chains


def test_robots_filter_wildcard_rules(spark):
    import pyspark.sql.functions as F  # noqa: N812

    robots = spark.createDataFrame(
        [
            ("h", "disallow", "/*.pdf$"),       # extension ban
            ("h", "disallow", "/a/*/secret"),   # interior star
            ("h", "allow", "/a/pub/secret"),    # same length? no: 13 > 12
            ("h", "disallow", "/exact$"),       # anchored plain rule
            ("h", "disallow", "*"),             # '*' alone - lowest priority
            ("h", "allow", "/"),                # beats '*' on length? both 1
        ],
        "host string, rule string, prefix string",
    )
    pages = spark.createDataFrame(
        [
            (1, "https://h/x/doc.pdf"),      # *.pdf$ -> blocked
            (2, "https://h/x/doc.pdfx"),     # not anchored-matched
            (3, "https://h/a/v1/secret"),    # interior star -> blocked
            (4, "https://h/a/pub/secret"),   # allow (longer) wins
            (5, "https://h/exact"),          # anchored exact -> blocked
            (6, "https://h/exactly"),        # $ fails -> only '*'/'/' match
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r for r in
           web.robots_filter(pages, robots).collect()}
    assert out[1].blocked and out[1].matched_prefix == "/*.pdf$"
    assert not out[2].blocked
    assert out[3].blocked and out[3].matched_prefix == "/a/*/secret"
    assert not out[4].blocked and out[4].matched_prefix == "/a/pub/secret"
    assert out[5].blocked and out[5].matched_prefix == "/exact$"
    # page 6: '*' (len 1) ties '/' (len 1) -> allow beats disallow
    assert not out[6].blocked and out[6].verdict_rule == "allow"


def test_robots_wildcard_match_expression_cases(spark):
    from doc_parser_spark.operators.web import _robots_match_sql

    cases = [
        # (path, rule, expect)
        ("/a/b/c", "/a", True),
        ("/a/b/c", "/b", False),
        ("/a/b/c", "*", True),
        ("/a/b/c", "*b*c", True),
        ("/a/b/c", "*c*b", False),        # order matters
        ("/abc", "/a*c$", True),
        ("/abcd", "/a*c$", False),
        ("/abc", "/abc$", True),
        ("/abcx", "/abc$", False),
        ("/p/x.pdf", "/*.pdf$", True),
        ("/p/x.pdf.html", "/*.pdf$", False),
        ("/aa", "/a*a$", True),            # overlap: pos constraint holds
        ("/a", "/a*a$", False),            # cannot reuse the same 'a'
        ("/a%b_c", "/a%b_c", True),        # LIKE metachars are literal
        ("/ab", "/a*$", True),             # trailing *$ = prefix match
        ("/a/b", "/a*b*", True),           # trailing bare star
    ]
    df = spark.createDataFrame(cases, "path string, prefix string, expect boolean")
    got = df.selectExpr(
        "path", "prefix", "expect",
        f"({_robots_match_sql('path', 'prefix')}) AS m",
    ).collect()
    for r in got:
        assert r.m == r.expect, (r.path, r.prefix, r.m)


def test_robots_posture_rfc9309(spark):
    fetches = spark.createDataFrame(
        [("ok", 200), ("redir", 301), ("gone", 404), ("forbidden", 403),
         ("down", 503), ("teapot", 418), ("dead", None)],
        "host string, status int",
    )
    out = {r.host: r for r in web.robots_posture(fetches).collect()}
    assert out["ok"].posture == "use_rules" and not out["ok"].retry
    assert out["redir"].posture == "use_rules"
    assert out["redir"].follow_redirect
    assert out["gone"].posture == "allow_all"
    assert out["forbidden"].posture == "allow_all"   # 4xx = open host
    assert out["teapot"].posture == "allow_all"
    assert out["down"].posture == "disallow_all" and out["down"].retry
    assert out["dead"].posture == "disallow_all" and out["dead"].retry
    assert out["dead"].status == 0
    # non-definitive codes never blacklist permanently
    extra = {r.host: r for r in web.robots_posture(
        spark.createDataFrame([("odd", 999), ("cont", 100)],
                              "host string, status int")).collect()}
    assert extra["odd"].posture == "disallow_all" and extra["odd"].retry
    assert extra["cont"].posture == "disallow_all" and extra["cont"].retry


def test_link_graph_drop_nofollow(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/1", "b.com", "", "x"),
            ("https://a.com/1", "c.com", "nofollow", "y"),
            ("https://a.com/1", "d.com", "sponsored noopener", "z"),
            ("https://a.com/1", "e.com", "noopener", "w"),
            ("https://a.com/2", "f.com", None, "v"),
        ],
        "url string, dst_host string, rel string, anchor string",
    )
    full = {(r.src_host, r.dst_host) for r in
            web.link_graph(links).collect()}
    assert full == {("a.com", "b.com"), ("a.com", "c.com"),
                    ("a.com", "d.com"), ("a.com", "e.com"),
                    ("a.com", "f.com")}
    dofollow = {(r.src_host, r.dst_host) for r in
                web.link_graph(links, drop_nofollow=True).collect()}
    # nofollow and sponsored edges gone; unrelated rel tokens stay
    assert dofollow == {("a.com", "b.com"), ("a.com", "e.com"),
                        ("a.com", "f.com")}


def test_extract_links_rel_tokens(spark):
    from doc_parser_spark.operators.extract import extract_links

    html = (
        b'<html><body>'
        b'<a href="/a" rel=" NoFollow  UGC ">one</a>'
        b'<a href="/b">two</a>'
        b'</body></html>'
    )
    pages = spark.createDataFrame(
        [("https://h.com/p", html)], "url string, html binary"
    )
    rows = sorted(extract_links(pages).collect(), key=lambda r: r.link_no)
    assert rows[0].rel == "nofollow ugc"  # lowered + space-normalized
    assert rows[1].rel == ""


def test_page_link_features(spark):
    links = spark.createDataFrame(
        [
            ("p1", "a.com", False, "", "hello"),
            ("p1", "b.com", False, "nofollow", "xx"),
            ("p1", "b.com", False, "", "yyyy"),
            ("p1", "self.com", True, None, ""),
        ],
        "url string, dst_host string, is_internal boolean, rel string,"
        " anchor string",
    )
    r = web.page_link_features(links).collect()[0]
    assert (r.n_links, r.n_external, r.n_dst_hosts, r.n_nofollow) == (
        4, 3, 3, 1)
    assert r.external_permille == 750
    assert r.mean_anchor_len == (5 + 2 + 4 + 0) // 4


def test_host_dup_rate(spark):
    rows = [
        # mirror.com: 3 pages, all the same syndicated body
        (1, "wire story", "http://mirror.com/a"),
        (2, "wire story", "http://mirror.com/b"),
        (3, "wire story", "http://mirror.com/c"),
        # orig.com: 1 copy of the wire story (cross-host dup) + 1 unique
        (4, "wire story", "http://orig.com/x"),
        (5, "an original essay", "http://orig.com/y"),
        # clean.com: unique only
        (6, "something else", "http://clean.com/z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    out = {r["host"]: r.asDict() for r in web.host_dup_rate(df).collect()}
    assert out["mirror.com"]["n_dup_docs"] == 3
    assert out["mirror.com"]["dup_permille"] == 1000
    assert out["mirror.com"]["n_distinct_hashes"] == 1
    assert out["orig.com"]["n_dup_docs"] == 1  # the cross-host copy
    assert out["orig.com"]["dup_permille"] == 500
    assert out["clean.com"]["n_dup_docs"] == 0
    assert out["clean.com"]["dup_permille"] == 0


def test_hyperball_exact_on_small_graph(spark):
    # in the linear-counting regime (balls << 64) the sketch is exact,
    # so HyperBall's harmonic_x60 equals hand-computed 60·Σ 1/d over
    # in-paths of length <= iterations:
    #   ring a->b->c->d->a plus x->a
    #   a: d(1),x(1),c(2),b(3)  -> 60+60+30+20 = 170
    #   b: a(1),d(2),x(2),c(3)  -> 60+30+30+20 = 140
    #   c: b(1),a(2),d(3),x(3)  -> 60+30+20+20 = 130
    #   d: c(1),b(2),a(3)       -> 60+30+20    = 110   (x at d=4 > 3)
    #   x: no in-edges          -> 0
    from doc_parser_spark.operators import web

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("x", "a")],
        "src string, dst string",
    )
    got = {r["host"]: r["harmonic_x60"] for r in web.host_hyperball(e).collect()}
    assert got == {"a": 170, "b": 140, "c": 130, "d": 110, "x": 0}

    # deterministic under repartitioning (register merge is max — order-free)
    again = {
        r["host"]: r["harmonic_x60"]
        for r in web.host_hyperball(e.repartition(7)).collect()
    }
    assert again == got


def test_hyperball_ball_monotone_and_validated(spark):
    import pytest as _pytest

    from doc_parser_spark.operators import web

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    b1 = {r["host"]: r["ball_estimate"] for r in web.host_hyperball(e, 1).collect()}
    b3 = {r["host"]: r["ball_estimate"] for r in web.host_hyperball(e, 3).collect()}
    assert all(b3[h] >= b1[h] for h in b1)
    assert b3["d"] == 4  # a,b,c,d all within 3 hops upstream of d
    with _pytest.raises(ValueError):
        web.host_hyperball(e, 0)
    with _pytest.raises(ValueError):
        web.host_hyperball(e, 7)
