"""WARC record reader: record chain walk, HTTP envelope strip, re-dispatch."""

import gzip

import pytest

from doc_parser_spark.core import sniff
from doc_parser_spark.core.serialize import export_text
from doc_parser_spark.core.warc_backend import WarcError, extract_warc, warc_payload
from doc_parser_spark.operators.extract import convert_payload
from doc_parser_spark.sources.office_fixtures import make_warc


def test_sniff_and_response_record():
    w = make_warc(6)
    assert sniff.sniff_format(w) == sniff.FORMAT_WARC
    doc, kind = extract_warc(w)
    assert kind == "warc:html"
    txt = export_text(doc)
    assert "Crawled 6" in txt and "Warc wrapped paragraph." in txt


def test_warcinfo_skipped_and_uri_parsed():
    body, uri = warc_payload(make_warc(2))
    assert uri == "https://example.org/2"
    assert body.startswith(b"<html>")  # HTTP envelope stripped


def test_gzip_member_inflates():
    gz = gzip.compress(make_warc(3))
    doc, kind = extract_warc(gz)
    assert kind == "warc:html"
    assert "Crawled 3" in export_text(doc)


def test_kernel_routing():
    from doc_parser_spark.operators.extract import process_document

    rec = process_document("u", make_warc(1))
    assert (rec["status"], rec["format"]) == ("success", "warc:html")


def test_truncated_rejected():
    with pytest.raises(WarcError):
        warc_payload(b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\nxx")


def test_gzip_transport_routes_through_kernel():
    import gzip as _gzip

    from doc_parser_spark.operators.extract import process_document

    rec = process_document("u", _gzip.compress(make_warc(4)))
    assert (rec["status"], rec["format"]) == ("success", "warc:html")
    rec = process_document("u", _gzip.compress(b"<html><body><p>hi</p></body></html>"))
    assert (rec["status"], rec["format"]) == ("success", "gz:html")
    # nested transport chains terminate
    deep = b"<p>x</p>"
    for _ in range(5):
        deep = _gzip.compress(deep)
    rec = process_document("u", deep)
    assert rec["status"] == "skipped"


def test_multi_member_gzip_warc():
    # standard .warc.gz: ONE GZIP MEMBER PER RECORD. The first member holds
    # only the warcinfo record — a one-shot zlib.decompress sees just that
    # member and dies with "no response record found".
    import gzip as _gzip

    raw = make_warc(9)
    split = raw.index(b"WARC/1.0", 8)
    blob = _gzip.compress(raw[:split]) + _gzip.compress(raw[split:])
    body, uri = warc_payload(blob)
    assert uri == "https://example.org/9"
    assert b"Crawled 9" in body
    doc, kind = extract_warc(blob)
    assert kind == "warc:html"


def test_multi_member_gzip_warc_through_kernel():
    # the TRANSPORT path (sniffed gzip -> inflate -> re-dispatch) must also
    # inflate every member, not just the warcinfo-only first one
    import gzip as _gzip

    from doc_parser_spark.operators.extract import process_document

    raw = make_warc(7)
    split = raw.index(b"WARC/1.0", 8)
    blob = _gzip.compress(raw[:split]) + _gzip.compress(raw[split:])
    rec = process_document("u", blob)
    assert (rec["status"], rec["format"]) == ("success", "warc:html")


def _rec(wtype: str, body: bytes, extra: str = "") -> bytes:
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\n{extra}"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def test_iter_records_walks_all_and_strip_envelope():
    from doc_parser_spark.core.warc_backend import (
        iter_records,
        strip_http_envelope,
    )

    html = "<p>café</p>".encode()
    http = b"HTTP/1.1 301 Moved\r\nContent-Type: text/html\r\nLocation: x\r\n\r\n" + html
    chain = b"\r\n\r\n".join(
        [
            _rec("warcinfo", b"software: t\r\n"),
            _rec("response", http, "WARC-Target-URI: https://e.com/a\r\n"),
            _rec("metadata", b"k: v\r\n", "WARC-Target-URI: https://e.com/a\r\n"),
        ]
    )
    recs = list(iter_records(chain))
    assert [h.get("warc-type") for h, _ in recs] == [
        "warcinfo", "response", "metadata",
    ]
    body, status, ctype = strip_http_envelope(recs[1][1])
    assert body == html and status == 301 and ctype == "text/html"
    # non-HTTP body passes through untouched
    assert strip_http_envelope(b"plain") == (b"plain", None, "")


def test_iter_records_multi_member_gzip():
    import gzip

    from doc_parser_spark.core.warc_backend import iter_records

    # standard .warc.gz: one gzip member PER record
    members = b"".join(
        gzip.compress(_rec(t, b"x: y\r\n") + b"\r\n\r\n")
        for t in ("warcinfo", "metadata")
    )
    recs = list(iter_records(members))
    assert [h.get("warc-type") for h, _ in recs] == ["warcinfo", "metadata"]


def test_warc_records_relation_isolates_torn_chains(spark):
    from doc_parser_spark.operators.extract import warc_records

    good = b"\r\n\r\n".join(
        [
            _rec("warcinfo", b"a: b\r\n"),
            _rec(
                "response",
                b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello",
                "WARC-Target-URI: https://e.com/ok\r\n",
            ),
        ]
    )
    torn = good[:-3]  # truncated mid-body: declared length overruns data
    junk = good + b"\r\n\r\nGARBAGE-NOT-A-RECORD"  # bad framing after rec 2
    pages = spark.createDataFrame(
        [
            ("u1", bytearray(good)),
            ("u2", bytearray(torn)),
            ("u3", None),
            ("u4", bytearray(b"not a warc at all")),
            ("u5", bytearray(junk)),
        ],
        "url string, html binary",
    )
    rows = warc_records(pages).collect()
    # only the clean chain contributes — and ALL of its records
    assert sorted((r["url"], r["rec_no"], r["warc_type"]) for r in rows) == [
        ("u1", 0, "warcinfo"), ("u1", 1, "response"),
    ]
    resp = [r for r in rows if r["rec_no"] == 1][0]
    assert resp["http_status"] == 200 and resp["payload_length"] == 5
    assert resp["target_uri"] == "https://e.com/ok"
