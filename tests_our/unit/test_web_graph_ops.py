"""Unit tests for the session-8 host-graph / sketch / ingestion wave:
HITS, connected components, HyperLogLog, sitemap parse, KN bigrams."""

import pytest

from doc_parser_spark.operators import text_analysis, web


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


# --- HITS -----------------------------------------------------------------


def test_hits_separates_hub_from_authority(spark):
    # classic star: hub -> a1..a3; a-side gets authority, hub-side hub score
    e = _edges(
        spark,
        [("hub", "a1"), ("hub", "a2"), ("hub", "a3"), ("h2", "a1")],
    )
    rows = {r.host: r for r in web.host_hits(e, iterations=3).collect()}
    assert rows["hub"].hub_scaled == max(r.hub_scaled for r in rows.values())
    assert rows["a1"].auth_scaled == max(
        r.auth_scaled for r in rows.values()
    )
    # pure-authority nodes have zero hub score and vice versa
    assert rows["a2"].hub_scaled == 0
    assert rows["hub"].auth_scaled == 0
    # a1 has two in-links, a2 one -> strictly more authority
    assert rows["a1"].auth_scaled > rows["a2"].auth_scaled


def test_hits_drops_self_loops_and_dups(spark):
    e = _edges(spark, [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")])
    out = web.host_hits(e, iterations=2)
    assert sorted(r.host for r in out.collect()) == ["a", "b"]


def test_hits_rejects_nonpositive_iterations(spark):
    with pytest.raises(ValueError):
        web.host_hits(_edges(spark, [("a", "b")]), iterations=0)


# --- connected components ---------------------------------------------------


def test_components_two_islands(spark):
    e = _edges(
        spark,
        [("b", "a"), ("c", "b"), ("x", "y"), ("y", "x"), ("z", "z")],
    )
    rows = {r.host: r for r in web.host_components(e).collect()}
    assert rows["a"].component_id == "a"
    assert rows["c"].component_id == "a"
    assert rows["x"].component_id == "x"
    assert rows["y"].component_id == "x"
    # self-loop-only host is its own singleton component
    assert rows["z"].component_id == "z"
    assert rows["z"].component_size == 1
    assert rows["a"].component_size == 3
    assert rows["x"].component_size == 2


# --- HyperLogLog -------------------------------------------------------------


def test_hll_estimate_tracks_exact(spark):
    df = spark.range(3000).selectExpr(
        "concat('h', cast(id % 3 as int)) AS host",
        "concat('u', cast(id as string)) AS url",
    )
    rows = web.distinct_hll(df, "host", "url").collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_distinct_exact == 1000
        # m=64 -> ~16% standard error; allow 4 sigma
        assert 1000 * 0.36 < r.hll_estimate < 1000 * 1.64
        assert r.n_zero_registers == 0


def test_hll_duplicates_do_not_move_the_sketch(spark):
    base = spark.range(500).selectExpr(
        "'h' AS host", "concat('u', cast(id % 50 as int)) AS url"
    )
    once = spark.range(50).selectExpr(
        "'h' AS host", "concat('u', cast(id as string)) AS url"
    )
    a = web.distinct_hll(base, "host", "url").collect()[0]
    b = web.distinct_hll(once, "host", "url").collect()[0]
    assert a.hll_estimate == b.hll_estimate
    assert a.n_distinct_exact == b.n_distinct_exact == 50


def test_hll_all_null_values(spark):
    df = spark.createDataFrame(
        [("h", None)], "host string, url string"
    )
    r = web.distinct_hll(df, "host", "url").collect()[0]
    assert r.hll_estimate == 0
    assert r.n_zero_registers == 64
    assert r.n_distinct_exact == 0


# --- sitemap parse -----------------------------------------------------------


def _sitemaps(spark, rows):
    return spark.createDataFrame(rows, "host string, xml string")


def test_sitemap_urlset_fields(spark):
    xml = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://e.com/a</loc><lastmod>2024-01-02</lastmod>"
        "<changefreq>daily</changefreq><priority>0.9</priority></url>"
        "<url><loc> https://e.com/b </loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"  # no loc -> dropped
        "</urlset>"
    )
    rows = web.sitemap_urls(_sitemaps(spark, [("e.com", xml)])).collect()
    assert len(rows) == 2
    full = next(r for r in rows if r.loc == "https://e.com/a")
    assert (full.kind, full.lastmod, full.changefreq, full.priority) == (
        "url", "2024-01-02", "daily", "0.9"
    )
    bare = next(r for r in rows if r.loc == "https://e.com/b")  # trimmed
    assert (bare.lastmod, bare.changefreq, bare.priority) == ("", "", "")


def test_sitemap_index_and_namespace_agnosticism(spark):
    xml = (
        "<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc></sitemap>"
        "</sitemapindex>"
    )  # no namespace at all
    rows = web.sitemap_urls(_sitemaps(spark, [("e.com", xml)])).collect()
    assert [(r.kind, r.loc) for r in rows] == [
        ("sitemap", "https://e.com/s1.xml")
    ]


def test_sitemap_failure_isolation(spark):
    rows = web.sitemap_urls(
        _sitemaps(
            spark,
            [
                ("bad.com", "<urlset><url><loc>x</loc>"),  # malformed
                ("null.com", None),
                ("rss.com", "<rss><channel/></rss>"),  # not a sitemap root
                ("ok.com", "<urlset><url><loc>https://ok.com/</loc></url></urlset>"),
            ],
        )
    ).collect()
    assert [(r.host, r.loc) for r in rows] == [("ok.com", "https://ok.com/")]


# --- RSS/Atom feed entries ---------------------------------------------------


def test_feed_entries_rss_fields_and_link_rule(spark):
    xml = (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        "<title>Blog</title><link>https://e.com/</link>"
        "<item><title>P1</title><link> https://e.com/1 </link>"
        "<guid>g1</guid><pubDate>2024-01-02</pubDate>"
        "<description><![CDATA[d & one]]></description></item>"
        "<item><title>bare</title><link>https://e.com/2</link></item>"
        "<item><title>no link</title><guid>g3</guid></item>"
        "</channel></rss>"
    )
    rows = web.feed_entries(_sitemaps(spark, [("e.com", xml)])).collect()
    assert len(rows) == 2  # link-less item dropped
    p1 = next(r for r in rows if r.link == "https://e.com/1")  # trimmed
    assert (p1.kind, p1.feed_title, p1.title, p1.guid, p1.published,
            p1.summary) == ("rss", "Blog", "P1", "g1", "2024-01-02",
                            "d & one")
    bare = next(r for r in rows if r.link == "https://e.com/2")
    assert (bare.guid, bare.published, bare.summary) == ("", "", "")


def test_feed_entries_atom_rel_and_published_fallback(spark):
    xml = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>A</title>'
        '<entry><title>E1</title>'
        '<link rel="enclosure" href="https://e.com/f.mp3"/>'
        '<link rel="alternate" href="https://e.com/e1"/>'
        "<id>i1</id><updated>2024-01-05T00:00:00Z</updated>"
        "<summary>s1</summary></entry>"
        '<entry><title>E2</title><link href="https://e.com/e2"/>'
        "<published>2024-02-01T00:00:00Z</published>"
        "<updated>2024-03-01T00:00:00Z</updated></entry>"
        '<entry><title>only enclosure</title>'
        '<link rel="self" href="https://e.com/feed.xml"/></entry>'
        "</feed>"
    )
    rows = web.feed_entries(_sitemaps(spark, [("e.com", xml)])).collect()
    assert len(rows) == 2  # self/enclosure-only entry dropped
    e1 = next(r for r in rows if r.link == "https://e.com/e1")
    # enclosure link skipped; published falls back to <updated>
    assert (e1.kind, e1.feed_title, e1.guid, e1.published, e1.summary) == (
        "atom", "A", "i1", "2024-01-05T00:00:00Z", "s1"
    )
    e2 = next(r for r in rows if r.link == "https://e.com/e2")
    assert e2.published == "2024-02-01T00:00:00Z"  # explicit wins


def test_feed_entries_failure_isolation(spark):
    rows = web.feed_entries(
        _sitemaps(
            spark,
            [
                ("bad.com", "<rss><channel><item>"),  # malformed
                ("null.com", None),
                ("sm.com", "<urlset><url><loc>x</loc></url></urlset>"),
                ("nochan.com", "<rss version='2.0'/>"),
                ("ok.com",
                 "<rss><channel><item><link>https://ok.com/1</link>"
                 "</item></channel></rss>"),
            ],
        )
    ).collect()
    assert [(r.host, r.link) for r in rows] == [("ok.com", "https://ok.com/1")]


def test_feed_entries_synth_corpus_shape(spark):
    docs = spark.range(0, 50).selectExpr("id AS doc_id")
    out = web.feed_entries(web.synth_feeds(docs)).collect()
    hosts = {r.host for r in out}
    assert "feed3.example.org" not in hosts  # hn%7==3 malformed
    assert "feed10.example.org" not in hosts  # 10%7==3 malformed
    rss = [r for r in out if r.kind == "rss"]
    atom = [r for r in out if r.kind == "atom"]
    # even hn -> rss (2 kept items of 3), odd -> atom (2 kept of 3)
    assert all(int(r.host[4:].split(".")[0]) % 2 == 0 for r in rss)
    assert all(int(r.host[4:].split(".")[0]) % 2 == 1 for r in atom)
    assert all(
        len([r for r in out if r.host == h]) == 2 for h in hosts
    )
    cd = next(r for r in rss if r.guid)  # CDATA description unwrapped
    hn = int(cd.host[4:].split(".")[0])
    assert cd.summary == f"d & {hn}"


# --- Kneser-Ney bigrams --------------------------------------------------------


def test_kn_bigrams_hand_computed(spark):
    # corpus: "a b" x3, "a c" x1  -> bigram types: (a,b) n=3, (a,c) n=1
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "A  b"), (4, "a c")],
        "doc_id long, text string",
    )
    rows = {
        (r.u, r.w): r
        for r in text_analysis.kn_bigrams(docs, min_count=1).collect()
    }
    ab = rows[("a", "b")]
    # c(a,b)=3, c(a)=4, N1+(a.)=2, N1+(.b)=1, |types|=2
    # term1 = (1e6*(4*3-3)) DIV (4*4) = 9000000 DIV 16 = 562500
    # lambda = (3*2*1e6) DIV 16 = 375000 ; pcont = 1e6*1 DIV 2 = 500000
    # term2 = 375000*500000 DIV 1e6 = 187500 -> 750000
    assert ab.pkn_scaled == 562500 + 187500
    assert ab.n_uw == 3 and ab.n_u == 4
    ac = rows[("a", "c")]
    # term1 = (1e6*1) DIV 16 = 62500 ; term2 identical structure = 187500
    assert ac.pkn_scaled == 62500 + 187500
    # interpolated KN is normalized per context: the discounted mass is
    # exactly redistributed (floors can only lose a few 1e-6 of mass)
    assert 1.0 - 1e-5 <= ab.p_kn + ac.p_kn <= 1.0


def test_kn_bigrams_skips_short_docs_and_validates(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, None), (4, "x y")],
        "doc_id long, text string",
    )
    out = text_analysis.kn_bigrams(docs, min_count=1).collect()
    assert [(r.u, r.w, r.n_uw) for r in out] == [("x", "y", 1)]
    with pytest.raises(ValueError):
        text_analysis.kn_bigrams(docs, min_count=0)


def test_kn_score_hand_computed(spark):
    # same corpus as the kn_bigrams hand test: model (min_count=1) is
    # (a,b) pkn=750000, (a,c) pkn=250000
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "A  b"), (4, "a c"), (5, None)],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in text_analysis.kn_score(docs, min_count=1).collect()
    }
    assert len(rows) == 5  # every document scores, textless included
    # 750000 in [2^19, 2^20) -> floor_log2 = 19 -> 1 bit
    assert rows[1].n_bigrams == 1 and rows[1].n_oov == 0
    assert rows[1].total_bits == 1 and rows[1].avg_bits_q6 == 1_000_000
    # 250000 in [2^17, 2^18) -> floor_log2 = 17 -> 3 bits
    assert rows[4].total_bits == 3 and rows[4].avg_bits_q6 == 3_000_000
    # textless document: the zero row, not a dropped row / NULLs
    assert (rows[5].n_bigrams, rows[5].n_oov, rows[5].total_bits,
            rows[5].avg_bits_q6) == (0, 0, 0, 0)


def test_kn_score_oov_charges_floor_bits(spark):
    # min_count=3 prunes (a,c) from the emitted model -> doc 4's only
    # bigram is OOV under the KenLM-artifact contract: full 20 bits
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in text_analysis.kn_score(docs, min_count=3).collect()
    }
    assert rows[4].n_oov == 1 and rows[4].total_bits == 20
    assert rows[4].avg_bits_q6 == 20_000_000
    assert rows[1].n_oov == 0 and rows[1].total_bits <= 20


# --- revisit records -----------------------------------------------------------


def test_revisit_records_picks_earliest_and_links(spark):
    cdx = spark.createDataFrame(
        [
            ("com,a)/x", "20240101000000", "https://a.com/x", "d1"),
            ("com,b)/y", "20240102000000", "https://b.com/y", "d1"),
            ("com,c)/z", "20240103000000", "https://c.com/z", "d1"),
            ("com,d)/w", "20240101000000", "https://d.com/w", "d2"),
        ],
        "surt_key string, ts14 string, url string, digest string",
    )
    from doc_parser_spark.operators import web

    rows = {r.url: r for r in web.revisit_records(cdx).collect()}
    assert rows["https://a.com/x"].record_type == "response"
    assert rows["https://a.com/x"].refers_to_url == ""
    assert rows["https://b.com/y"].record_type == "revisit"
    assert rows["https://b.com/y"].refers_to_url == "https://a.com/x"
    assert rows["https://c.com/z"].refers_to_ts14 == "20240101000000"
    assert rows["https://b.com/y"].n_captures == 3
    assert rows["https://d.com/w"].record_type == "response"
    assert rows["https://d.com/w"].n_captures == 1


def test_host_degree_reciprocity_and_degrees(spark):
    from doc_parser_spark.operators import web

    edges = spark.createDataFrame(
        [
            # a<->b reciprocal; a->c one-way (duplicated: multiplicity 2)
            ("a", "b"), ("b", "a"), ("a", "c"), ("a", "c"),
            # self-loop dropped entirely
            ("d", "d"),
            # pure sink: e receives, never links out
            ("c", "e"),
        ],
        "src string, dst string",
    )
    out = {r.host: r for r in web.host_degree(edges).collect()}
    a = out["a"]
    assert a.out_degree == 2 and a.in_degree == 1
    assert a.out_links == 3 and a.in_links == 1
    assert a.n_reciprocal == 1 and a.reciprocity == 0.5
    b = out["b"]
    assert b.out_degree == 1 and b.n_reciprocal == 1 and b.reciprocity == 1.0
    c = out["c"]
    # c's only out-neighbor is e (one-way): reciprocity 0.0, not NULL
    assert c.out_degree == 1 and c.n_reciprocal == 0 and c.reciprocity == 0.0
    e = out["e"]
    # pure sink: zero out_degree -> reciprocity 0.0 by convention
    assert e.out_degree == 0 and e.in_degree == 1 and e.reciprocity == 0.0
    # the self-loop host never surfaces
    assert "d" not in out


# --- redirect chains ---------------------------------------------------------


def _responses(spark, rows):
    return spark.createDataFrame(rows, "url string, status int, location string")


def test_redirect_chain_verdicts(spark):
    out = {r.url: r for r in web.redirect_chains(_responses(spark, [
        ("a", 301, "b"), ("b", 302, "c"), ("c", 200, ""),   # 2-hop chain
        ("d", 200, None),                                   # plain page
        ("e", 301, "ghost"),                                # dangling
        ("f", 301, "f"),                                    # self-loop
        ("g", 301, "h"), ("h", 302, "g"),                   # 2-cycle
    ]), max_hops=5).collect()}
    assert (out["a"].final_url, out["a"].n_hops, out["a"].verdict) == ("c", 2, "resolved")
    assert (out["b"].final_url, out["b"].n_hops, out["b"].verdict) == ("c", 1, "resolved")
    assert (out["c"].n_hops, out["c"].verdict) == (0, "resolved")
    assert (out["d"].n_hops, out["d"].verdict) == (0, "resolved")
    assert (out["e"].final_url, out["e"].n_hops, out["e"].verdict) == ("ghost", 1, "dangling")
    assert (out["f"].final_url, out["f"].n_hops, out["f"].verdict) == ("f", 1, "loop")
    assert (out["g"].final_url, out["g"].n_hops, out["g"].verdict) == ("g", 2, "loop")
    assert (out["h"].final_url, out["h"].n_hops, out["h"].verdict) == ("h", 2, "loop")


def test_redirect_chain_truncation_and_dup_collapse(spark):
    rows = [(f"u{i}", 301, f"u{i-1}") for i in range(1, 6)] + [("u0", 200, "")]
    # duplicate capture of u3 with a different target: min struct wins
    rows.append(("u3", 301, "u2"))
    rows.append(("u3", 308, "u0"))
    out = {r.url: r for r in
           web.redirect_chains(_responses(spark, rows), max_hops=3).collect()}
    assert (out["u3"].final_url, out["u3"].verdict) == ("u0", "resolved")
    assert out["u3"].n_hops == 3  # u3->u2->u1->u0 (301 < 308: min keeps u2)
    assert (out["u5"].verdict, out["u5"].n_hops, out["u5"].final_url) == (
        "truncated", 3, "u2")
    assert out["u2"].verdict == "resolved" and out["u2"].n_hops == 2


def test_redirect_chain_validates_and_empty_location(spark):
    import pytest

    with pytest.raises(ValueError):
        web.redirect_chains(_responses(spark, [("a", 200, "")]), max_hops=0)
    # 3xx with empty/NULL location is not an edge
    out = {r.url: r for r in web.redirect_chains(_responses(spark, [
        ("a", 301, ""), ("b", 301, None)]), max_hops=2).collect()}
    assert out["a"].verdict == "resolved" and out["a"].n_hops == 0
    assert out["b"].verdict == "resolved" and out["b"].n_hops == 0


# --- MIME verdicts -----------------------------------------------------------


def test_mime_verdicts_families(spark):
    pages = spark.createDataFrame(
        [
            ("u1", "text/html", b"<html><body>x</body></html>"),
            ("u2", "text/html", b"%PDF-1.4\nobj"),           # mislabeled pdf
            ("u3", "Application/PDF; q=1", b"%PDF-1.7\n"),    # norm + params
            ("u4", "application/x-prop", b"<html></html>"),   # unmapped
            ("u5", None, b"<html></html>"),                   # missing
            ("u6", "  ", b"<html></html>"),                   # blank
            ("u7", "image/png",
             bytes.fromhex("89504e470d0a1a0a") + b"x"),
            ("u8", "text/plain", None),                       # null payload
        ],
        "url string, mime string, html binary",
    )
    out = {r.url: r for r in web.mime_verdicts(pages).collect()}
    assert (out["u1"].verdict, out["u1"].sniffed_format) == ("ok", "html")
    assert (out["u2"].verdict, out["u2"].expected_format,
            out["u2"].sniffed_format) == ("mismatch", "html", "pdf")
    assert (out["u3"].mime_norm, out["u3"].verdict) == (
        "application/pdf", "ok")
    assert (out["u4"].verdict, out["u4"].expected_format) == (
        "unknown_mime", "")
    assert out["u5"].verdict == "missing_mime"
    assert out["u6"].verdict == "missing_mime"
    assert (out["u7"].verdict, out["u7"].sniffed_format) == ("ok", "image")
    # null payload was never sniffed: not a mislabel verdict
    assert (out["u8"].sniffed_format, out["u8"].verdict) == (
        "", "unsniffable")


def test_mime_census_rollup(spark):
    pages = spark.createDataFrame(
        [("u%d" % i, "text/html", b"<html></html>") for i in range(5)]
        + [("p", "text/html", b"%PDF-1.4")],
        "url string, mime string, html binary",
    )
    rows = web.mime_census(web.mime_verdicts(pages)).collect()
    d = {(r.mime_norm, r.sniffed_format, r.verdict): r.n_captures
         for r in rows}
    assert d[("text/html", "html", "ok")] == 5
    assert d[("text/html", "pdf", "mismatch")] == 1


# --- hreflang clusters --------------------------------------------------------


def test_extract_hreflang_kernel(spark):
    html = (
        b'<html><head>'
        b'<link rel="alternate" hreflang="EN" href="/en"/>'
        b'<link rel="alternate nofollow" hreflang="fr" '
        b'href="https://o.com/fr"/>'
        b'<link rel="stylesheet" href="/css"/>'          # wrong rel
        b'<link rel="alternate" href="/no-lang"/>'       # no hreflang
        b'<link rel="alternate" hreflang="de"/>'         # no href
        b'</head><body>x</body></html>'
    )
    from doc_parser_spark.operators.extract import extract_hreflang

    pages = spark.createDataFrame(
        [("https://s.com/a", html)], "url string, html binary"
    )
    rows = sorted(extract_hreflang(pages).collect(), key=lambda r: r.pos)
    assert [(r.hreflang, r.href) for r in rows] == [
        ("en", "https://s.com/en"),          # lowered + resolved
        ("fr", "https://o.com/fr"),
    ]


def test_hreflang_clusters_reciprocity_and_membership(spark):
    alts = spark.createDataFrame(
        [
            # full pair: en <-> fr, each self-annotates
            ("en1", "en", "en1"), ("en1", "fr", "fr1"),
            ("fr1", "fr", "fr1"), ("fr1", "en", "en1"),
            ("en1", "x-default", "en1"),
            # broken: en2 -> de2, de2 never declares
            ("en2", "de", "de2"),
        ],
        "url string, hreflang string, href string",
    )
    out = {r.url: r for r in web.hreflang_clusters(alts).collect()}
    assert out["en1"].cluster_id == "en1" and out["fr1"].cluster_id == "en1"
    assert out["en1"].cluster_size == 2
    assert out["en1"].ref_langs == "en,x-default"
    assert out["fr1"].ref_langs == "fr"
    assert out["en1"].declares and out["en1"].referenced
    # de2 is a member through reference only
    assert out["de2"].cluster_id == "de2"  # min('de2','en2') = 'de2'
    assert out["en2"].cluster_id == "de2"
    assert out["de2"].cluster_size == 2
    assert (out["de2"].declares, out["de2"].referenced) == (False, True)
    assert (out["en2"].declares, out["en2"].referenced) == (True, False)
    assert out["en2"].ref_langs == ""


# --- robots meta / indexability ------------------------------------------------


def test_extract_robots_meta_kernel(spark):
    from doc_parser_spark.operators.extract import extract_robots_meta

    html = (
        b'<html><head>'
        b'<meta name="ROBOTS" content="noindex, nofollow"/>'
        b'<meta name="googlebot" content="nosnippet"/>'
        b'<meta name="viewport" content="width=1"/>'
        b'<meta name="robots" content="noarchive"/>'
        b'</head><body>x</body></html>'
    )
    pages = spark.createDataFrame(
        [("u", html)], "url string, html binary"
    )
    rows = sorted(
        extract_robots_meta(pages).collect(),
        key=lambda r: (r.name, r.content),
    )
    assert [(r.name, r.content) for r in rows] == [
        ("googlebot", "nosnippet"),
        ("robots", "noarchive"),
        ("robots", "noindex, nofollow"),
    ]


def test_index_verdicts_most_restrictive_wins(spark):
    d = spark.createDataFrame(
        [
            ("a", "index, follow"),
            ("b", "NOINDEX"),
            ("c", "none"),
            ("d", "nofollow , noarchive"),
            ("d", "nosnippet"),          # second channel merges
            ("e", ""),
        ],
        "url string, content string",
    )
    out = {r.url: r for r in web.index_verdicts(d).collect()}
    assert (out["a"].noindex, out["a"].indexable) == (False, True)
    assert (out["b"].noindex, out["b"].indexable) == (True, False)
    assert (out["c"].noindex, out["c"].nofollow) == (True, True)
    assert (out["d"].nofollow, out["d"].noarchive, out["d"].nosnippet,
            out["d"].indexable) == (True, True, True, True)
    assert out["d"].n_tokens == 3
    # blank content still yields a row (one empty token, no flags)
    assert (out["e"].indexable, out["e"].noindex) == (True, False)


# --- language consistency ------------------------------------------------------


def test_lang_consistency_verdicts(spark):
    pages = spark.createDataFrame(
        [
            ("m", "en-US", "the cat and the dog of the house is here"),
            ("x", "de", "the cat and the dog of the house is here"),
            ("u", "", "the and of to is"),
            ("n", "fr", "zzz qqq www"),            # detector says und
            ("nn", None, "xxx"),                   # null attr + und
        ],
        "url string, lang_attr string, text string",
    )
    out = {r.url: r for r in web.lang_consistency(pages).collect()}
    assert (out["m"].declared_lang, out["m"].pred_lang,
            out["m"].verdict) == ("en", "en", "match")
    assert out["x"].verdict == "mismatch"
    assert out["u"].verdict == "undeclared"
    assert (out["n"].pred_lang, out["n"].verdict) == ("und", "undetected")
    assert out["nn"].verdict == "undeclared"


def test_lang_consistency_matches_lang_id(spark):
    # shared detector: pred_lang must equal text_analysis.lang_id's
    docs = spark.createDataFrame(
        [(1, "el que la los una"), (2, "der die und das ist"),
         (3, "the of and la el")],
        "doc_id long, text string",
    )
    expected = {r.doc_id: r.pred_lang
                for r in text_analysis.lang_id(docs).collect()}
    pages = docs.selectExpr("cast(doc_id as string) AS url",
                            "'xx' AS lang_attr", "text")
    got = {int(r.url): r.pred_lang
           for r in web.lang_consistency(pages).collect()}
    assert got == expected


# --- DOM templates -------------------------------------------------------------


def test_extract_dom_paths_shape_and_order(spark):
    from doc_parser_spark.operators.extract import extract_dom_paths

    html = (
        b"<html><head><title>T</title></head><body>"
        b"<nav><ul><li>Home</li><li>About</li></ul></nav>"
        b"<p>hello   world</p><div><p>nested</p></div>"
        b"</body></html>"
    )
    pages = spark.createDataFrame([("u", html)], "url string, html binary")
    rows = sorted(extract_dom_paths(pages).collect(), key=lambda r: r.pos)
    got = [(r.dom_path, r.n_chars) for r in rows]
    assert got == [
        ("html/head/title", 1),
        ("html/body/nav", len("HomeAbout")),
        ("html/body/nav/ul/li", 4),
        ("html/body/nav/ul/li", 5),
        ("html/body/p", len("hello world")),   # whitespace normalized
        ("html/body/div/p", 6),
    ]
    import hashlib
    assert rows[4].text_hash == hashlib.md5(b"hello world").hexdigest()


def test_dom_templates_verdicts(spark):
    # 4 pages on one host: title identical (boilerplate), p varies
    # (slot), blockquote on one page (rare)
    rows = []
    import hashlib

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    for i in range(4):
        u = f"https://t.com/p{i}"
        rows.append((u, "html/head/title", md5("Site")))
        rows.append((u, "html/body/p", md5(f"text {i}")))
    rows.append(("https://t.com/p0", "html/body/blockquote", md5("q")))
    paths = spark.createDataFrame(
        rows, "url string, dom_path string, text_hash string"
    )
    out = {r.dom_path: r for r in web.dom_templates(paths).collect()}
    t = out["html/head/title"]
    assert (t.verdict, t.n_pages_host, t.top_text_pages) == (
        "boilerplate", 4, 4)
    assert t.path_share_ppm == 1_000_000 and t.top_share_ppm == 1_000_000
    p = out["html/body/p"]
    assert (p.verdict, p.n_texts, p.top_text_pages) == ("slot", 4, 1)
    assert p.top_share_ppm == 250_000
    b = out["html/body/blockquote"]
    assert (b.verdict, b.n_pages_with_path) == ("rare", 1)


def test_dom_templates_multi_host_and_validation(spark):
    import hashlib
    import pytest

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    rows = [
        ("https://a.com/1", "html/body/p", md5("x")),
        ("https://a.com/2", "html/body/p", md5("x")),
        ("https://b.com/1", "html/body/p", md5("y")),
    ]
    paths = spark.createDataFrame(
        rows, "url string, dom_path string, text_hash string"
    )
    out = {(r.host, r.dom_path): r for r in web.dom_templates(paths).collect()}
    assert out[("a.com", "html/body/p")].verdict == "boilerplate"
    assert out[("b.com", "html/body/p")].verdict == "rare"  # 1 page host
    with pytest.raises(ValueError):
        web.dom_templates(paths, min_pages=0)


# --- crawl-budget apportionment -------------------------------------------------


def test_host_budgets_exact_sum_and_largest_remainder(spark):
    ranks = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 3), ("d", 1)],
        "host string, rank_scaled long",
    )
    out = {r.host: r.budget for r in
           web.host_budgets(ranks, total_budget=10).collect()}
    # shares: a 50/12... total 12 mass over 10 units: floors 4,2,2,0;
    # remainders (10*r)%12: a=2, b=6, c=6, d=10 -> deficit 2 goes to d
    # then b (tie b/c broken by host asc)
    assert sum(out.values()) == 10
    assert out == {"a": 4, "b": 3, "c": 2, "d": 1}


def test_host_budgets_zero_rank_and_validation(spark):
    import pytest

    ranks = spark.createDataFrame(
        [("a", 7), ("z", 0)], "host string, rank_scaled long"
    )
    out = {r.host: r.budget for r in
           web.host_budgets(ranks, 5).collect()}
    assert out == {"a": 5, "z": 0}
    with pytest.raises(ValueError):
        web.host_budgets(ranks, 0)
    zero = spark.createDataFrame([("a", 0)], "host string, rank_scaled long")
    with pytest.raises(ValueError):
        web.host_budgets(zero, 5)


def test_host_budgets_conserves_large_budget(spark):
    ranks = spark.range(0, 97).selectExpr(
        "concat('h', id) AS host", "(id * 13) % 101 + 1 AS rank_scaled"
    )
    rows = web.host_budgets(ranks, total_budget=1_000_003).collect()
    assert sum(r.budget for r in rows) == 1_000_003


# --- host feature table ----------------------------------------------------------


def test_host_features_dense_defaults(spark):
    stats = spark.createDataFrame(
        [("a.com", 5, 5, 1000, 400), ("b.com", 1, 1, 10, 10)],
        "host string, n_docs long, n_urls long, total_chars long,"
        " max_chars long",
    )
    degree = spark.createDataFrame(
        [("a.com", 2, 1, 3, 1, 1, 0.5), ("c.com", 0, 4, 0, 9, 0, 0.0)],
        "host string, out_degree long, in_degree long, out_links long,"
        " in_links long, n_reciprocal long, reciprocity double",
    )
    ranks = spark.createDataFrame(
        [("a.com", 900000)], "host string, rank_scaled long"
    )
    out = {r.host: r for r in
           web.host_features(stats, degree, ranks).collect()}
    assert set(out) == {"a.com", "b.com", "c.com"}
    a = out["a.com"]
    assert (a.n_docs, a.out_degree, a.rank_scaled) == (5, 2, 900000)
    b = out["b.com"]  # absent from graph channels -> dense zeros
    assert (b.out_degree, b.in_links, b.reciprocity, b.rank_scaled) == (
        0, 0, 0.0, 0)
    c = out["c.com"]  # referenced-only host: zero content mass
    assert (c.n_docs, c.total_chars, c.in_degree) == (0, 0, 4)
    # no NULLs anywhere
    for r in out.values():
        assert all(v is not None for v in r.asDict().values())


# --- co-citation ----------------------------------------------------------------


def test_cocitation_pairs_and_cosine(spark):
    # l1 and l2 both cite {x, y}; l3 cites only x; hub cites everything
    e = _edges(spark, [
        ("l1", "x"), ("l1", "y"),
        ("l2", "x"), ("l2", "y"),
        ("l3", "x"),
        ("hub", "x"), ("hub", "y"), ("hub", "z"), ("hub", "w"),
    ])
    out = {(r.a, r.b): r for r in
           web.host_cocitation(e, max_out_degree=3, min_common=2).collect()}
    assert set(out) == {("x", "y")}  # hub excluded; z/w never co-cited
    r = out[("x", "y")]
    # capped in-degrees: x <- l1,l2,l3 = 3; y <- l1,l2 = 2
    assert (r.n_common, r.in_a, r.in_b) == (2, 3, 2)
    assert r.cos2_ppm == (1_000_000 * 4) // 6


def test_cocitation_hub_inclusion_when_cap_allows(spark):
    e = _edges(spark, [
        ("hub", "x"), ("hub", "y"), ("l1", "x"), ("l1", "y"),
    ])
    out = web.host_cocitation(e, max_out_degree=50, min_common=2).collect()
    assert len(out) == 1 and out[0].n_common == 2
    import pytest
    with pytest.raises(ValueError):
        web.host_cocitation(e, max_out_degree=0)


# --- LAION-style image-caption candidates ---------------------------------------


def _refs_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, img_no long, src string, resolved string,"
        " dst_host string, alt string, title string, caption string,"
        " width long, height long",
    )


def test_image_candidates_gates_and_caption_precedence(spark):
    rows = [
        # passes via alt
        ("https://a.com/1", 0, "/i.jpg", "https://a.com/i.jpg", "a.com",
         "red bicycle outdoors", "", "", 640, 480),
        # alt empty -> figcaption chosen
        ("https://a.com/2", 0, "/f.jpg", "https://a.com/f.jpg", "a.com",
         "", "ignored title", "mountain lake vista", None, None),
        # alt/figcaption empty -> title chosen
        ("https://a.com/3", 0, "/t.jpg", "https://a.com/t.jpg", "a.com",
         "", "sunset over bay", "", None, None),
        # junk word
        ("https://a.com/4", 0, "/l.png", "https://a.com/l.png", "a.com",
         "logo", "", "", 640, 480),
        # too few tokens
        ("https://a.com/5", 0, "/s.jpg", "https://a.com/s.jpg", "a.com",
         "bicycle", "", "", None, None),
        # pure digits/punct
        ("https://a.com/6", 0, "/d.jpg", "https://a.com/d.jpg", "a.com",
         "2024 01, 02", "", "", None, None),
        # icon-sized
        ("https://a.com/7", 0, "/ic.png", "https://a.com/ic.png", "a.com",
         "tiny but described", "", "", 16, 16),
        # extreme aspect
        ("https://a.com/8", 0, "/b.png", "https://a.com/b.png", "a.com",
         "very wide banner art", "", "", 900, 120),
        # one declared dimension only: passes (other is the fetch gate)
        ("https://a.com/9", 0, "/h.jpg", "https://a.com/h.jpg", "a.com",
         "half declared image", "", "", 300, None),
    ]
    out = {r.page_url: r for r in
           web.image_candidates(_refs_df(spark, rows)).collect()}
    assert set(out) == {"https://a.com/1", "https://a.com/2",
                        "https://a.com/3", "https://a.com/9"}
    assert out["https://a.com/1"].caption_src == "alt"
    assert out["https://a.com/2"].caption == "mountain lake vista"
    assert out["https://a.com/2"].caption_src == "figcaption"
    assert out["https://a.com/3"].caption_src == "title"
    assert out["https://a.com/1"].n_tokens == 3


def test_image_candidates_dedup_and_stats(spark):
    # same image via www/default-port variants -> one canonical survivor
    rows = [
        ("https://z.com/p2", 1, "/i.jpg", "https://www.cdn.com:443/x.jpg",
         "cdn.com", "a fine picture", "", "", None, None),
        ("https://z.com/p1", 0, "/i.jpg", "https://cdn.com/x.jpg",
         "cdn.com", "another caption here", "", "", None, None),
        ("https://z.com/p3", 2, "/i.jpg", "https://cdn.com/x.jpg",
         "cdn.com", "a fine picture", "", "", None, None),
    ]
    out = web.image_candidates(_refs_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # min (page_url, img_no) survivor; 3 pages, 2 distinct captions
    assert r.page_url == "https://z.com/p1" and r.img_no == 0
    assert r.n_pages == 3 and r.n_captions == 2


def test_image_candidates_validates_params(spark):
    df = _refs_df(spark, [])
    with pytest.raises(ValueError):
        web.image_candidates(df, min_caption_tokens=0)
    with pytest.raises(ValueError):
        web.image_candidates(df, max_aspect=0)


# --- label-propagation communities -----------------------------------------------


def test_communities_two_triangles_converge_to_min_host(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("x", "y"), ("y", "z"), ("z", "x"),
         ("s", "s")],  # self-loop-only host leaves the node set
    )
    rows = {r.host: r for r in web.host_communities(e, iterations=4).collect()}
    assert set(rows) == {"a", "b", "c", "x", "y", "z"}
    assert all(rows[h].community_id == "a" for h in "abc")
    assert all(rows[h].community_id == "x" for h in "xyz")
    assert rows["a"].community_size == 3 and rows["z"].community_size == 3


def test_communities_direction_ignored_and_self_vote_kills_2cycle(spark):
    # a->b only: symmetrized; the inclusion self-vote makes the pair
    # converge to min('a') in one sweep instead of the classic
    # synchronous-LPA 2-cycle
    e = _edges(spark, [("a", "b")])
    for it in (1, 2):
        rows = {r.host: r.community_id
                for r in web.host_communities(e, iterations=it).collect()}
        assert rows == {"a": "a", "b": "a"}, it
    with pytest.raises(ValueError):
        web.host_communities(e, iterations=0)


# --- publication-date resolution ---------------------------------------------


def _meta_df(spark, rows):
    import datetime
    cap = datetime.datetime(2024, 3, 15, 12, 0, 0)
    return spark.createDataFrame(
        [(u, p, cap) for u, p in rows],
        "url string, published_time string, warc_ts timestamp",
    )


def test_page_dates_verdicts_and_staleness(spark):
    import datetime
    rows = [
        ("https://a.com/blog/2023/04/02/x", "2023-04-28T09:00:00Z"),   # consistent
        ("https://a.com/a/2022/04/x", "2023-04-05T00:00:00+02:00"),    # conflict
        ("https://a.com/news/2021/12/31/y.html", ""),                  # url_only
        ("https://a.com/p/1", "2020-06-07T08:30:00Z"),                 # meta_only
        ("https://a.com/q/1", "2023-13-40T00:00:00Z"),                 # invalid meta
        ("https://a.com/about", ""),                                   # undated
        ("https://a.com/f/2024/02/29/leap", ""),                       # leap day
        ("https://a.com/p/2", "2024-06-01T00:00:00Z"),                 # post-dated
    ]
    out = {r.url: r for r in web.page_dates(_meta_df(spark, rows)).collect()}
    cap = datetime.date(2024, 3, 15)

    r = out["https://a.com/blog/2023/04/02/x"]
    assert (r.date_verdict, r.date_source) == ("consistent", "meta")
    assert r.published_ymd == 20230428  # meta day wins
    assert r.staleness_days == (cap - datetime.date(2023, 4, 28)).days

    r = out["https://a.com/a/2022/04/x"]
    assert (r.date_verdict, r.date_source) == ("conflict", "meta")

    r = out["https://a.com/news/2021/12/31/y.html"]
    assert (r.date_verdict, r.published_ymd) == ("url_only", 20211231)
    assert r.staleness_days == (cap - datetime.date(2021, 12, 31)).days

    r = out["https://a.com/p/1"]
    assert (r.date_verdict, r.published_ymd) == ("meta_only", 20200607)

    r = out["https://a.com/q/1"]
    assert (r.date_verdict, r.published_ymd, r.staleness_days) == (
        "undated", 0, None)

    assert out["https://a.com/about"].date_verdict == "undated"

    r = out["https://a.com/f/2024/02/29/leap"]  # leap-day daynum path
    assert r.published_ymd == 20240229
    assert r.staleness_days == (cap - datetime.date(2024, 2, 29)).days

    r = out["https://a.com/p/2"]  # scheduled post: negative staleness
    assert r.staleness_days == (cap - datetime.date(2024, 6, 1)).days < 0


def test_page_dates_url_without_day_resolves_to_first(spark):
    out = web.page_dates(
        _meta_df(spark, [("https://a.com/2019/07/archive", "")])
    ).collect()[0]
    assert (out.published_ymd, out.date_source) == (20190701, "url")


# --- URL-type taxonomy -------------------------------------------------------


def test_url_classify_ladder_and_features(spark):
    cases = {
        "https://a.com/search?q=shoes": "search",
        "https://a.com/list?page=4": "pagination",
        "https://a.com/tag/sports": "tag",
        "https://a.com/feed/": "feed",
        "https://a.com/pics/cat.jpg": "media",
        "https://a.com/product/123": "product",
        "https://a.com/2023/04/02/title": "article",
        "https://a.com/blog/my-story": "article",
        "https://a.com/": "home",
        "https://a.com": "home",
        "https://a.com/docs/manual": "other",
        # precedence: search outranks the article-ish path
        "https://a.com/blog/search?q=x": "search",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    out = {r.url: r for r in web.url_classify(df).collect()}
    for u, want in cases.items():
        assert out[u].page_type == want, (u, out[u].page_type)
    assert out["https://a.com/2023/04/02/title"].has_date_path
    assert out["https://a.com/search?q=shoes"].n_query_params == 1
    assert out["https://a.com/docs/manual"].path_depth == 2
    assert out["https://a.com/"].path_depth == 0


# --- sitemap-vs-crawl coverage -----------------------------------------------


def test_sitemap_coverage_hand_computed(spark):
    entries = spark.createDataFrame(
        [
            ("a.com", "url", "https://a.com/1"),
            ("a.com", "url", "https://a.com/2"),
            ("a.com", "url", "https://www.a.com/2"),   # canonical dup
            ("a.com", "sitemap", "https://a.com/sub.xml"),  # not a page
            ("b.com", "url", "https://b.com/only-declared"),
            # cross-submission: a.com's sitemap declares a c.com page
            ("a.com", "url", "https://c.com/x"),
        ],
        "host string, kind string, loc string",
    )
    pages = spark.createDataFrame(
        [("https://a.com/1",), ("https://a.com/orphan",),
         ("https://d.com/crawled-only",)],
        "url string",
    )
    rows = {r.host: r for r in web.sitemap_coverage(entries, pages).collect()}
    a = rows["a.com"]
    # declared {1,2} (www dup collapses; sub.xml is kind=sitemap),
    # crawled {1, orphan}, both {1}
    assert (a.n_sitemap, a.n_crawled, a.n_both) == (2, 2, 1)
    assert a.coverage_ppm == 500_000 and a.orphan_ppm == 500_000
    b = rows["b.com"]
    assert (b.n_sitemap, b.n_crawled, b.n_both) == (1, 0, 0)
    assert b.coverage_ppm == 0 and b.orphan_ppm is None
    # the cross-submitted URL counts against the host it NAMES
    c = rows["c.com"]
    assert (c.n_sitemap, c.n_crawled) == (1, 0)
    d = rows["d.com"]
    assert d.coverage_ppm is None and d.orphan_ppm == 1_000_000


def test_host_hops_bfs(spark):
    """Chain a->b->c->d with seed {a}: exact hop counts; e is an island
    and must report -1; a seed not in the graph contributes nothing."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "e2")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",), ("ghost",)], "host string")
    out = {r["host"]: r["hops"] for r in web.host_hops(edges, seeds).collect()}
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3, "e": -1, "e2": -1}


def test_host_hops_max_cap(spark):
    """A 6-long chain with max_hops=2: nodes past the cap stay -1."""
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)], "src string, dst string"
    )
    seeds = spark.createDataFrame([("n0",)], "host string")
    out = {
        r["host"]: r["hops"]
        for r in web.host_hops(edges, seeds, max_hops=2).collect()
    }
    assert out["n0"] == 0 and out["n1"] == 1 and out["n2"] == 2
    assert out["n3"] == -1 and out["n6"] == -1


def test_host_hops_min_over_paths(spark):
    """Two paths to the same node: BFS takes the shorter."""
    edges = spark.createDataFrame(
        [("s", "x"), ("x", "y"), ("y", "t"), ("s", "t")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("s",)], "host string")
    out = {r["host"]: r["hops"] for r in web.host_hops(edges, seeds).collect()}
    assert out["t"] == 1


def test_degree_spectrum_buckets(spark):
    """Hub with out-degree 5 lands in bucket 2 (4..7); leaves with
    out-degree 1 in bucket 0; in-direction counts the 5 targets."""
    edges = spark.createDataFrame(
        [("hub", f"t{i}") for i in range(5)] + [("leaf", "t0")],
        "src string, dst string",
    )
    out = {
        (r["direction"], r["bucket"]): r.asDict()
        for r in web.degree_spectrum(edges).collect()
    }
    assert out[("out", 2)]["n_hosts"] == 1          # hub: floor(log2 5)=2
    assert out[("out", 2)]["min_degree"] == 4
    assert out[("out", 0)]["n_hosts"] == 1          # leaf
    assert out[("out", 0)]["share_permille"] == 500
    # in-degrees: t0 has 2 (bucket 1), t1..t4 have 1 (bucket 0)
    assert out[("in", 1)]["n_hosts"] == 1
    assert out[("in", 0)]["n_hosts"] == 4
    assert out[("in", 0)]["share_permille"] == 800
