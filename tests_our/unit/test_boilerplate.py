"""Densitometric boilerplate classification (html/boilerplate.py):
block segmentation, the published NumWordsRules thresholds, structural
priors, and end-to-end main-content extraction."""

from doc_parser_spark.html.boilerplate import (
    block_features,
    classify_blocks,
    extract_main_text,
    segment_blocks,
)
from doc_parser_spark.html.dom import find_body, parse_html


_PAGE = b"""<html><body>
<nav><a href="/">Home</a> <a href="/a">News</a> <a href="/b">Sports</a></nav>
<div class="side"><a href="/x">Related story one</a><br>
<a href="/y">Related story two</a><br><a href="/z">Related story three</a></div>
<h1>Quarterly results beat expectations</h1>
<p>The company reported earnings well above analyst expectations for the
third quarter, driven by strong demand across all regions and a recovery
in advertising spending that started earlier in the year.</p>
<p>Management raised full-year guidance and announced an expanded buyback
program, citing confidence in continued growth through the next fiscal
cycle despite macroeconomic uncertainty in several key markets.</p>
<footer>Copyright 2024 Example Corp. <a href="/terms">Terms</a>
<a href="/privacy">Privacy</a></footer>
</body></html>"""


def _blocks(html: bytes):
    return classify_blocks(segment_blocks(find_body(parse_html(html))))


def test_main_text_keeps_article_drops_furniture():
    text = extract_main_text(_PAGE)
    assert "earnings well above analyst expectations" in text
    assert "expanded buyback" in text
    assert "Quarterly results beat expectations" in text  # heading rescued
    assert "Home" not in text and "Related story" not in text
    assert "Copyright" not in text


def test_structural_prior_beats_density():
    # long fluent prose inside <nav> stays boilerplate: the prior is a
    # hard override, not a density vote
    page = (b"<html><body><nav><p>" +
            b"word " * 80 +
            b"</p></nav><p>" + b"content " * 80 + b"</p></body></html>")
    blocks = _blocks(page)
    navs = [b for b in blocks if b.discarded]
    assert navs and all(not b.content for b in navs)
    assert any(b.content for b in blocks if not b.discarded)


def test_link_density_rule():
    # a block that is mostly anchor text is boilerplate even outside nav
    page = (b'<html><body><div><a href="/1">one link</a> '
            b'<a href="/2">two link</a> <a href="/3">three link</a></div>'
            b"<p>" + b"real prose " * 30 + b"</p></body></html>")
    blocks = _blocks(page)
    linky = next(b for b in blocks if b.link_chars > 0)
    assert linky.link_density > 0.333333 and not linky.content
    prose = next(b for b in blocks if b.link_chars == 0 and b.n_words > 40)
    assert prose.content


def test_short_block_context_rules():
    # a short block sandwiched between short boilerplate is dropped; the
    # same short block right before a long paragraph is kept (the
    # (prev, curr, next) tree from the WSDM paper)
    long_p = b"<p>" + b"body text " * 40 + b"</p>"
    kept = _blocks(b"<html><body><p>Intro line here</p>" + long_p + b"</body></html>")
    assert kept[0].content  # next block is long -> content
    dropped = _blocks(
        b"<html><body><p>a</p><p>tiny block here</p><p>b</p></body></html>"
    )
    assert all(not b.content for b in dropped)


def test_block_features_records():
    recs = block_features(_PAGE)
    assert [r["block_id"] for r in recs] == list(range(len(recs)))
    h = next(r for r in recs if r["heading"])
    assert h["content"] and h["n_words"] == 4
    assert all(0.0 <= r["link_density"] <= 1.0 for r in recs)
    assert any(r["discarded"] for r in recs)
    # text density: words per 80-col wrapped line, bounded sanity
    assert all(r["text_density"] <= r["n_words"] for r in recs)


def test_boilerplate_blocks_operator(spark):
    from doc_parser_spark.operators.extract import boilerplate_blocks

    rows = [
        ("u1", bytearray(_PAGE)),
        ("u2", None),                       # null payload -> zero rows
        ("u3", bytearray(b"\x00\x01not html")),  # garbage -> isolated
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = boilerplate_blocks(pages).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    assert "u2" not in by_url
    u1 = sorted(by_url["u1"], key=lambda r: r["block_id"])
    kept = " ".join(r["text"] for r in u1 if r["content"])
    assert "buyback" in kept and "Copyright" not in kept
    assert [r["block_id"] for r in u1] == list(range(len(u1)))


def test_noscript_is_discarded():
    # noscript is flow-level and a hard-discard container: its fallback
    # text (tracking pixels, "enable JavaScript" banners) must never
    # reach main text, however fluent
    page = (b"<html><body><p>real article prose " + b"word " * 30 +
            b"</p><noscript>Please enable JavaScript to view the "
            b"comments powered by a tracking vendor with many words "
            b"in this fallback banner text block here</noscript>"
            b"</body></html>")
    text = extract_main_text(page)
    assert "real article prose" in text
    assert "enable JavaScript" not in text
