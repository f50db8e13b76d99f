"""RSS/Atom/RDF syndication feeds (core/feed_backend.py) — crawl-reality
format with no reference counterpart: a feed through the HTML walk is
tag soup; here it maps to title + per-item sections."""

from doc_parser_spark.core import model, sniff
from doc_parser_spark.core.feed_backend import (
    extract_feed,
    looks_like_feed,
)
from doc_parser_spark.core.serialize import export_text
from doc_parser_spark.operators.extract import process_document

RSS = b"""<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0" xmlns:content="http://purl.org/rss/1.0/modules/content/">
<channel>
  <title>Example Blog</title>
  <description>Daily &amp; weekly notes</description>
  <item>
    <title>First post</title>
    <link>https://example.com/1</link>
    <description>&lt;p&gt;Hello &lt;b&gt;world&lt;/b&gt;.&lt;/p&gt;&lt;p&gt;Second para.&lt;/p&gt;</description>
  </item>
  <item>
    <title>Second post</title>
    <content:encoded><![CDATA[<div>Full <i>content</i> body.</div>]]></content:encoded>
    <description>short summary ignored when encoded exists</description>
  </item>
</channel>
</rss>"""

ATOM = b"""<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Stream</title>
  <subtitle>status updates</subtitle>
  <entry>
    <title>Entry one</title>
    <summary>plain summary text</summary>
  </entry>
  <entry>
    <title>Entry two</title>
    <content type="html">&lt;p&gt;rich body&lt;/p&gt;</content>
  </entry>
</feed>"""

RDF = b"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns="http://purl.org/rss/1.0/">
  <channel rdf:about="https://old.example.org/">
    <title>RSS 1.0 Site</title>
    <description>legacy feed</description>
  </channel>
  <item rdf:about="https://old.example.org/a">
    <title>Old item</title>
    <description>rdf item body</description>
  </item>
</rdf:RDF>"""


def test_sniff_routes_feeds_to_xml():
    assert sniff.sniff_format(RSS) == sniff.FORMAT_XML
    assert sniff.sniff_format(ATOM) == sniff.FORMAT_XML  # no xml decl
    assert sniff.sniff_format(RDF) == sniff.FORMAT_XML
    assert looks_like_feed(RSS) and looks_like_feed(ATOM) and looks_like_feed(RDF)
    assert not looks_like_feed(b"<html><body>rss feed</body></html>")


def test_rss_structure():
    doc = extract_feed(RSS)
    items = [(n.label, n.text) for n, _ in doc.iterate_items()]
    assert (model.TITLE, "Example Blog") in items
    assert (model.PARAGRAPH, "Daily & weekly notes") in items
    assert (model.SECTION_HEADER, "First post") in items
    assert (model.PARAGRAPH, "Hello world .") in items or any(
        "Hello" in t for _, t in items
    )
    # content:encoded wins over description
    text = export_text(doc)
    assert "Full content body." in text
    assert "short summary ignored" not in text
    # paragraphs nest under their item header
    hdr = next(n for n, _ in doc.iterate_items() if n.text == "Second post")
    para = next(n for n, _ in doc.iterate_items() if "Full" in n.text)
    assert para.parent == hdr.index


def test_atom_structure():
    doc = extract_feed(ATOM)
    text = export_text(doc)
    assert "Atom Stream" in text and "status updates" in text
    assert "Entry one" in text and "plain summary text" in text
    assert "Entry two" in text and "rich body" in text


def test_rdf_rss10_structure():
    doc = extract_feed(RDF)
    text = export_text(doc)
    assert "RSS 1.0 Site" in text and "Old item" in text and "rdf item body" in text


def test_truncated_feed_salvaged():
    cut = RSS[: RSS.rfind(b"<item>")]  # drop the second item mid-doc
    doc = extract_feed(cut)
    text = export_text(doc)
    assert "First post" in text and "Second post" not in text


def test_sitemap_urlset():
    sm = (
        b'<?xml version="1.0"?>'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://ex.com/a</loc><lastmod>2024-01-01</lastmod></url>"
        b"<url><loc>https://ex.com/b</loc></url></urlset>"
    )
    assert sniff.sniff_format(sm) == sniff.FORMAT_XML
    doc = extract_feed(sm)
    text = export_text(doc)
    assert "https://ex.com/a (2024-01-01)" in text
    assert "https://ex.com/b" in text


def test_sitemap_index():
    sm = (
        b"<sitemapindex><sitemap><loc>https://ex.com/s1.xml</loc></sitemap>"
        b"<sitemap><loc>https://ex.com/s2.xml</loc></sitemap></sitemapindex>"
    )
    assert sniff.sniff_format(sm) == sniff.FORMAT_XML
    text = export_text(extract_feed(sm))
    assert "s1.xml" in text and "s2.xml" in text


def test_feed_through_process_document():
    rec = process_document("https://example.com/feed.xml", RSS)
    assert rec["status"] == "success"
    assert rec["format"] == "xml"
    assert "Example Blog" in rec["text"] and "Full content body." in rec["text"]
    assert rec["markdown"].startswith("# Example Blog")
