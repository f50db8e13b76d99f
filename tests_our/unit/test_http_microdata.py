"""Unit tests for HTTP-header mining and schema.org microdata walk."""

from doc_parser_spark.core.warc_backend import parse_http_headers
from doc_parser_spark.html.microdata import microdata_rows
from doc_parser_spark.operators.extract import (
    extract_microdata,
    warc_http_headers,
)


# --- parse_http_headers ------------------------------------------------------


def test_http_headers_wire_order_and_duplicates():
    body = (
        b"HTTP/1.1 301 Moved\r\n"
        b"Server: x\r\n"
        b"Set-Cookie: a=1\r\n"
        b"Set-Cookie: b=2\r\n"
        b"Location: https://e.com/\r\n"
        b"\r\nbody"
    )
    status, hdrs = parse_http_headers(body)
    assert status == 301
    assert hdrs == [
        ("server", "x"),
        ("set-cookie", "a=1"),
        ("set-cookie", "b=2"),
        ("location", "https://e.com/"),
    ]


def test_http_headers_degrades():
    assert parse_http_headers(b"not http") == (None, [])
    assert parse_http_headers(b"HTTP/1.1 200 OK\r\nno-terminator") == (
        None,
        [],
    )
    # colon-less junk lines are skipped; latin-1 value bytes survive
    status, hdrs = parse_http_headers(
        b"HTTP/1.1 200 OK\r\njunkline\r\nX-N: caf\xe9\r\n\r\n"
    )
    assert status == 200
    assert hdrs == [("x-n", "caf\xe9")]


def test_warc_http_headers_operator(spark):
    http = (
        b"HTTP/1.1 200 OK\r\nServer: s\r\nContent-Type: text/html\r\n\r\nhi"
    )
    warc = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n" + http
    )
    pages = spark.createDataFrame(
        [("u1", bytearray(warc)), ("torn", bytearray(b"WARC/1.0\r\nX"))],
        "url string, html binary",
    )
    rows = warc_http_headers(pages).collect()
    assert [(r.url, r.h_no, r.name, r.value, r.http_status) for r in rows] == [
        ("u1", 0, "server", "s", 200),
        ("u1", 1, "content-type", "text/html", 200),
    ]


# --- microdata -----------------------------------------------------------------


def test_microdata_nested_and_value_rules():
    html = (
        b'<div itemscope itemtype="https://schema.org/Article extra">'
        b'<h1 itemprop="headline"> A  B </h1>'
        b'<span itemprop="author" itemscope'
        b' itemtype="https://schema.org/Person">'
        b'<span itemprop="name">N</span></span>'
        b'<time itemprop="datePublished" datetime="2024-01-02">Jan</time>'
        b'<a itemprop="url" href="/x">l</a>'
        b'<meta itemprop="wordCount" content="7">'
        b'<img itemprop="image" src="/i.png">'
        b"</div>"
    )
    rows = microdata_rows(html)
    by = {(r["item_no"], r["prop"]): r for r in rows}
    assert by[(0, "headline")]["value"] == "A B"  # whitespace-normalized
    assert by[(0, "headline")]["item_type"] == "https://schema.org/Article"
    assert by[(0, "author")]["value"] == "" and by[(0, "author")]["ref_item"] == 1
    assert by[(1, "name")]["parent_item"] == 0
    assert by[(0, "datePublished")]["value"] == "2024-01-02"
    assert by[(0, "url")]["value"] == "/x"
    assert by[(0, "wordCount")]["value"] == "7"
    assert by[(0, "image")]["value"] == "/i.png"


def test_microdata_markers_orphans_multitoken():
    html = (
        b'<p itemprop="orphan">ignored</p>'
        b'<div itemscope itemtype="https://schema.org/Thing"></div>'
        b'<div itemscope><b itemprop="a b">v</b></div>'
    )
    rows = microdata_rows(html)
    # orphan itemprop outside any itemscope is dropped per spec
    assert all(r["prop"] != "orphan" for r in rows)
    marker = [r for r in rows if r["item_no"] == 0]
    assert marker == [
        {
            "item_no": 0,
            "item_type": "https://schema.org/Thing",
            "parent_item": None,
            "prop": "",
            "value": "",
            "ref_item": None,
        }
    ]
    multi = sorted(
        (r["prop"], r["value"]) for r in rows if r["item_no"] == 1
    )
    assert multi == [("a", "v"), ("b", "v")]


def test_extract_microdata_failure_isolation(spark):
    pages = spark.createDataFrame(
        [
            ("ok", bytearray(b'<div itemscope><i itemprop="p">v</i></div>')),
            ("null", None),
            ("plain", bytearray(b"<p>no items</p>")),
        ],
        "url string, html binary",
    )
    rows = extract_microdata(pages).collect()
    assert [(r.url, r.prop, r.value) for r in rows] == [("ok", "p", "v")]


def test_header_census_four_facets(spark):
    from pyspark.sql import Row

    from doc_parser_spark.operators import web

    rows = [
        # page A: 200, apache/2.4, text/html with charset
        Row(url="a", rec_no=0, h_no=0, name="server", value="Apache/2.4.57", http_status=200),
        Row(url="a", rec_no=0, h_no=1, name="content-type",
            value="text/HTML; charset=UTF-8", http_status=200),
        # page B: 404, nginx bare token, json without charset
        Row(url="b", rec_no=0, h_no=0, name="server", value="nginx", http_status=404),
        Row(url="b", rec_no=0, h_no=1, name="content-type",
            value="application/json", http_status=404),
        # page B second record, also 200 apache: status counted per record
        Row(url="b", rec_no=1, h_no=0, name="server", value="Apache/2.2", http_status=200),
        # a header no facet consumes
        Row(url="a", rec_no=0, h_no=2, name="x-other", value="zz", http_status=200),
    ]
    out = {
        (r.facet, r.key): r
        for r in web.header_census(spark.createDataFrame(rows)).collect()
    }
    assert out[("mime", "text/html")].n_headers == 1
    assert out[("mime", "application/json")].n_pages == 1
    assert out[("charset", "utf-8")].n_headers == 1
    assert ("charset", "") not in out  # absent param emits no row
    a = out[("server", "apache")]
    assert a.n_headers == 2 and a.n_pages == 2  # both pages saw apache
    assert out[("server", "nginx")].n_headers == 1  # bare token, no '/'
    assert out[("status", "200")].n_headers == 2  # per record, not per header
    assert out[("status", "404")].n_headers == 1
    assert not [k for k in out if k[0] not in ("mime", "charset", "server", "status")]
