"""Deterministic synthetic Common-Crawl-style page table (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Rows are generated from a seeded RNG only — no external data. Hosts are
zipf-skewed on purpose so the salt-repartition path has real skew to defuse;
HTML payload classes cover every handler group of the HTML walk
(SURVEY.md §2.2) and ~5% of rows carry ``%PDF-`` payloads routed to the PDF
branch; a small tail is degenerate (empty/garbage) to exercise
failure/skip statuses.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from doc_parser_spark.pdf import writer

_WORDS = (
    "data spark query engine table row batch shuffle merge scan filter "
    "climate report annual global mean section detail result method state "
    "value record page text item chunk token vector index search model"
).split()

_LANGS = ["ko", "en", "en", "ko", "en"]  # reference corpus is Korean-heavy

_BASE_TS = datetime(2024, 1, 1)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)).capitalize() + "."


def _para(rng: random.Random, sentences: int = 3) -> str:
    return " ".join(_sentence(rng, rng.randint(6, 14)) for _ in range(sentences))


def _html_doc(rng: random.Random, i: int) -> bytes:
    """One HTML page hitting a rotating subset of handler groups."""
    cls = i % 10
    parts = ["<html><head><title>ignored head title</title>",
             "<style>.nav{color:red}</style></head><body>"]
    if cls in (1, 5, 9):
        parts.append(f"<nav>boilerplate menu {i}</nav><p>pre-heading furniture</p>")
    parts.append(f"<h1>Document {i}</h1>")
    parts.append(f"<p>{_para(rng)}</p>")
    if cls == 0:
        parts.append(f"<h2>Section A</h2><p>{_para(rng)}</p><h4>Deep skip</h4><p>{_para(rng, 2)}</p>")
    elif cls == 1:
        parts.append(f"<p>line one<br>line two of doc {i}</p>")
    elif cls == 2:
        parts.append(
            "<ul><li>alpha</li><li>beta<ul><li>nested</li></ul></li></ul>"
            f'<ol start="{(i % 7) + 2}"><li>first</li><li>second</li></ol>'
        )
    elif cls == 3:
        parts.append(
            "<table><tr><th>K</th><th>V</th></tr>"
            f'<tr><td rowspan="2">x{i}</td><td>{rng.randint(0, 99)}</td></tr>'
            f"<tr><td>{rng.randint(0, 99)}</td></tr></table>"
        )
    elif cls == 4:
        parts.append(f"<pre>def f_{i}():\n    return {i}</pre>")
    elif cls == 5:
        parts.append(
            f"<figure><img src='x{i}.png'><figcaption>Figure {i}</figcaption></figure><img src='y.png'>"
        )
    elif cls == 6:
        parts.append(f"<details><summary>More {i}</summary><p>{_para(rng, 1)}</p></details>")
    elif cls == 7:
        parts.append(f"<div>floating text {i}<p>{_para(rng, 1)}</p></div>")
    elif cls == 8:
        # long doc: exercises the token splitter
        for _ in range(6):
            parts.append(f"<h2>{_sentence(rng, 3)}</h2><p>{_para(rng, 30)}</p>")
    # cls 9: furniture-heavy short doc, nothing extra
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def _pdf_doc(rng: random.Random, i: int) -> bytes:
    runs = [(72.0, 720.0, 18.0, f"PDF Report {i}")]
    runs += writer.paragraph_runs(
        [_sentence(rng, 8), _sentence(rng, 8)[:-1] + "-", _sentence(rng, 6)],
        top_y=680.0,
    )
    runs += writer.fragmented_runs(_sentence(rng, 6), 72.0, 600.0)
    # rotate the deterministic label classes through the corpus so the
    # pipeline (batch, streaming, bench) exercises every labeler path
    variant = i % 4
    if variant == 0:  # monospace code listing
        runs.append((72.0, 560.0, 10.0, f"def gen_{i}():", "mono"))
        runs.append((72.0, 547.0, 10.0, f"return {i}", "mono"))
    elif variant == 1:  # display formula in a TeX math face
        runs.append((220.0, 560.0, 11.0, f"E = m + {i}", "math"))
    elif variant == 2:  # marker-led small-print footnote
        runs.append((72.0, 120.0, 8.0, f"1 footnote source {i}"))
    runs.append((290.0, 40.0, 10.0, "1"))  # folio
    page2 = writer.paragraph_runs([_sentence(rng, 10), _sentence(rng, 7)], top_y=700.0)
    page2.append((290.0, 40.0, 10.0, "2"))
    return writer.write_pdf([runs, page2])


def generate_rows(n: int, seed: int = 42) -> list[dict]:
    """n deterministic page rows (host-skewed urls, mixed payloads)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # zipf-ish host skew: rank = floor(u^-0.7) caps heavy hosts
        u = rng.random()
        host = int(min(999, (u ** -0.7) - 1))
        url = f"https://host{host}.example/{seed}/{i}"
        warc_ts = _BASE_TS + timedelta(seconds=(i * 2591999) // max(n - 1, 1))
        lang = _LANGS[i % len(_LANGS)]
        roll = i % 100
        if roll < 5:
            payload = _pdf_doc(rng, i)
        elif roll == 90:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_hwp(i)
        elif roll == 91:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_wav(i)
        elif roll == 92:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_docx()
        elif roll == 93:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_xlsx()
        elif roll == 80:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_epub(i)
        elif roll == 81:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_odt(i)
        elif roll == 82:
            from doc_parser_spark.sources import office_fixtures

            payload = (
                office_fixtures.make_odp(i)
                if (i // 100) % 2
                else office_fixtures.make_ods(i)
            )
        elif roll == 83:
            import zlib

            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_warc(i)
            if i % 2 == 0:  # half arrive as gzip members (mtime-free header)
                co = zlib.compressobj(9, zlib.DEFLATED, 31)
                payload = co.compress(payload) + co.flush()
        elif roll == 84:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_rtf(i)
        elif roll == 85:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_mhtml(i)
        elif roll == 86:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_eml(i)
        elif roll == 87:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_doc(i)
        elif roll == 88:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_xls(i)
        elif roll == 89:
            from doc_parser_spark.sources import office_fixtures

            payload = office_fixtures.make_ppt(i)
        elif roll == 94:
            payload = (
                f"= Adoc {i}\n\n== Part\n\n{_para(rng, 2)}\n".encode()
            )
        elif roll == 95:
            payload = (
                f"<?xml version=\"1.0\"?><article><front><article-title>Paper {i}"
                f"</article-title></front><body><sec><title>Sec</title><p>{_para(rng, 1)}"
                f"</p></sec></body></article>"
            ).encode()
        elif roll == 96:
            payload = (
                f'{{"title": "Json {i}", "body": "{_para(rng, 1)}"}}'.encode()
            )
        elif roll == 97:
            payload = b""  # degenerate: empty
        elif roll == 98:
            payload = bytes(rng.randbytes(64))  # degenerate: binary garbage
        elif roll == 99:
            payload = _para(rng, 2).encode()  # plain text payload
        else:
            payload = _html_doc(rng, i)
        rows.append(
            {
                "url": url,
                "warc_ts": warc_ts,
                "html": payload,
                "text": "",
                "lang": lang,
            }
        )
    return rows


def pages_df(spark, n: int, seed: int = 42, num_partitions: int | None = None):
    """Synthetic page table as a Spark DataFrame."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    rows = generate_rows(n, seed)
    df = spark.createDataFrame(rows, schema=schema)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df
