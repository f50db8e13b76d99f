"""Fuzz + property coverage for the session-10 surface.

1. The RFC 9309 wildcard matcher (one SQL expression) is compared
   against an independent pure-Python reference over hundreds of
   seeded-random (path, rule) pairs — greedy-fold equivalence is easy
   to get subtly wrong at anchors and overlaps, so the property is the
   test, not examples.
2. The new ingestion kernels (feeds, hreflang, robots-meta, DOM paths,
   mime sniff) each digest one batch of hostile payloads (tag soup,
   truncated XML, NULLs, binary junk, deep nesting) and must uphold
   their output invariants without a dead batch.
"""

from __future__ import annotations

import random

import pytest

pytestmark = pytest.mark.unit


def _ref_match(path: str, rule: str) -> bool:
    """Independent reference for RFC 9309 */$ rule matching
    (leftmost-greedy; trailing $ anchors)."""
    anchored = rule.endswith("$")
    pat = rule[:-1] if anchored else rule
    segs = pat.split("*")
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    mid = segs[1:-1] if anchored else segs[1:]
    for seg in mid:
        if seg == "":
            continue
        i = path.find(seg, pos)
        if i < 0:
            return False
        pos = i + len(seg)
    if not anchored:
        return True
    if len(segs) == 1:
        return path == pat
    last = segs[-1]
    if last == "":
        return True
    return path.endswith(last) and len(path) - len(last) >= pos


def test_wildcard_matcher_matches_reference_on_random_pairs(spark):
    from doc_parser_spark.operators.web import _robots_match_sql

    rng = random.Random(910)
    alphabet = "ab/."
    pairs = []
    for _ in range(400):
        path = "/" + "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
        rule = "".join(
            rng.choice(alphabet + "*")
            for _ in range(rng.randint(1, 7))
        )
        if rng.random() < 0.4:
            rule += "$"
        if not rule or rule in ("$",):
            rule = "/"
        pairs.append((path, rule))
    df = spark.createDataFrame(pairs, "path string, prefix string")
    got = df.selectExpr(
        "path", "prefix", f"({_robots_match_sql('path', 'prefix')}) AS m"
    ).collect()
    for r in got:
        assert r.m == _ref_match(r.path, r.prefix), (r.path, r.prefix, r.m)


_HOSTILE = [
    b"",
    b"\x00\xff\xfe garbage \x80\x81",
    b"<rss><channel><item><link>",                      # truncated
    b"<feed>" + b"<entry>" * 500,                        # unclosed pile
    b"<?xml version='1.0'?><feed xmlns='urn:x'><entry/></feed>",
    b"<html>" + b"<div>" * 3000 + b"deep" + b"</div>" * 3000,
    b"<html><head><link rel=alternate hreflang href></head></html>",
    b"<html><head><meta name=robots content></head><body></body></html>",
    "<html><body><p>café ☃</p></body></html>".encode(),
    b"%PDF-1.4 not really html",
    b"<urlset><url><loc>x</loc></url></urlset>",
    None,
]


def _pages(spark, payloads):
    return spark.createDataFrame(
        [(f"https://fz{i}.example.org/p", p) for i, p in enumerate(payloads)],
        "url string, html binary",
    )


def test_feed_kernel_survives_hostile_batch(spark):
    # the operator contract takes DECODED strings (binary crawl payloads
    # go through the charset-sniffing decode first, errors-replaced) —
    # raw invalid UTF-8 can't reach the Arrow boundary
    from doc_parser_spark.operators.web import feed_entries

    rows_in = [
        (f"fz{i}.example.org",
         p.decode("utf-8", errors="replace") if p is not None else None)
        for i, p in enumerate(_HOSTILE)
    ]
    rows = feed_entries(
        spark.createDataFrame(rows_in, "host string, xml string")
    ).collect()
    for r in rows:
        assert r.link  # link-less entries never surface


def test_hreflang_and_robots_meta_kernels_survive(spark):
    from doc_parser_spark.operators.extract import (
        extract_hreflang,
        extract_robots_meta,
    )

    hl = extract_hreflang(_pages(spark, _HOSTILE)).collect()
    for r in hl:
        assert r.hreflang == r.hreflang.lower() and r.href
    rm = extract_robots_meta(_pages(spark, _HOSTILE)).collect()
    for r in rm:
        assert r.name in ("robots", "googlebot", "bingbot")


def test_dom_paths_and_mime_kernels_survive(spark):
    from pyspark.sql import functions as F  # noqa: N812

    from doc_parser_spark.operators.extract import extract_dom_paths
    from doc_parser_spark.operators.web import mime_verdicts

    dp = extract_dom_paths(_pages(spark, _HOSTILE)).collect()
    by_url = {}
    for r in dp:
        by_url.setdefault(r.url, []).append(r.pos)
        assert r.dom_path and len(r.text_hash) == 32 and r.n_chars >= 0
    for poses in by_url.values():  # contiguous document-order numbering
        assert sorted(poses) == list(range(len(poses)))
    mv = mime_verdicts(
        _pages(spark, _HOSTILE).withColumn("mime", F.lit("text/html"))
    ).collect()
    assert len(mv) == len(_HOSTILE)  # census never drops a capture
    for r in mv:
        assert r.verdict in (
            "ok", "mismatch", "unknown_mime", "missing_mime", "unsniffable"
        )
