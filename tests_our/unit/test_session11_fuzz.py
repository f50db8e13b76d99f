"""Hostile-input fuzz for the session-11 expression operators: every
one is a pure projection, so the contract under garbage is 'total
function, sane ranges, never a task failure' — checked over seeded
random and adversarial rows in ONE Spark job per operator (per-example
style would pay JVM latency 100x)."""

from __future__ import annotations

import random

import pytest

from doc_parser_spark.operators import text_analysis, web

pytestmark = pytest.mark.unit


def _garbage_strings(rng, n):
    pools = [
        "",
        " ",
        "\x00\x01\x02",
        "�" * 40,
        "{}();=[]" * 30,
        "a" * 5000,                      # one huge word
        ("w " * 3000).strip(),           # many tiny words
        "é" * 100,
        "Ã©" * 100,
        "\\n\\t\\\\",
        "\n\n\n\n",
        "🙂" * 50,
        "http://,:::///?&&&==##",
    ]
    out = []
    for i in range(n):
        if rng.random() < 0.5:
            out.append(rng.choice(pools))
        else:
            out.append(
                "".join(chr(rng.randint(1, 0x2FFF)) for _ in range(rng.randint(0, 120)))
            )
    return out


def test_text_ops_survive_garbage(spark):
    rng = random.Random(411)
    rows = [(i, s) for i, s in enumerate(_garbage_strings(rng, 80))]
    rows.append((len(rows), None))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n = len(rows)

    moji = text_analysis.mojibake_stats(docs).collect()
    assert len(moji) == n
    assert all(r.verdict in ("clean", "mojibake", "decode_loss") for r in moji)
    assert all(0 <= r.moji_ppm <= 1_000_000 for r in moji)

    code = text_analysis.code_score(docs).collect()
    assert len(code) == n
    assert all(0 <= r.sym_permille <= 1000 for r in code)
    assert all(r.is_code in (True, False) for r in code)

    slop = text_analysis.slop_score(docs).collect()
    assert len(slop) == n
    assert all(r.n_slop_hits >= 0 for r in slop)

    fps = text_analysis.winnow_fingerprints(docs).collect()
    # only rows with >= k words fingerprint; every fp is an md5 hex
    assert all(len(r.fp) == 32 and r.n_fps <= r.n_grams for r in fps)

    kn = text_analysis.kn_score(docs).collect()
    assert len(kn) == n
    assert all(0 <= r.avg_bits_q6 <= 20_000_000 for r in kn)
    assert all(r.n_oov <= r.n_bigrams for r in kn)

    feats = text_analysis.doc_features(docs).collect()
    assert len(feats) == n
    assert all(all(v is not None for v in r.asDict().values()) for r in feats)


def _garbage_urls(rng, n):
    pools = [
        "", "https://", "http://?", "//", ":", "not a url at all",
        "https://a.com/" + "x/" * 200,
        "https://a.com/2023/13/99/x",     # invalid month/day in path
        "https://a.com/9999/12/31/x",
        "ftp://a.com/2020/01/file",
        "https://a.com/?" + "&" * 50,
        "https://a.com/#frag/2023/01/02",
        "https://[::1]:8080/p",
    ]
    out = []
    for i in range(n):
        if rng.random() < 0.5:
            out.append(rng.choice(pools))
        else:
            out.append(
                "https://h%d.com/%s" % (
                    rng.randint(0, 5),
                    "".join(rng.choice("abc/?&=%.0123#") for _ in range(rng.randint(0, 60))),
                )
            )
    return out


def test_url_ops_survive_garbage(spark):
    import datetime

    rng = random.Random(412)
    urls = _garbage_urls(rng, 80)
    cap = datetime.datetime(2024, 3, 15)
    meta = spark.createDataFrame(
        [(u, rng.choice(["", "2023-04-05T00:00:00Z", "9999-99-99", "junk"]), cap)
         for u in urls],
        "url string, published_time string, warc_ts timestamp",
    )
    dates = web.page_dates(meta).collect()
    assert len(dates) == len(urls)
    for r in dates:
        assert r.date_verdict in (
            "consistent", "conflict", "meta_only", "url_only", "undated")
        assert (r.published_ymd == 0) == (r.date_source == "none")
        if r.date_verdict == "undated":
            assert r.staleness_days is None

    cls = web.url_classify(
        spark.createDataFrame([(u,) for u in urls], "url string")
    ).collect()
    assert len(cls) == len(urls)
    types = {"search", "pagination", "tag", "feed", "media", "product",
             "article", "home", "other"}
    assert all(r.page_type in types for r in cls)
    assert all(r.path_depth >= 0 and r.n_query_params >= 0 for r in cls)
