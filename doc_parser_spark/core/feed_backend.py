"""RSS / Atom / RDF feed backend.

No reference counterpart (the reference never sees raw crawl payloads);
first-class here because web crawls are full of syndication feeds —
Common Crawl fetches them like any other URL — and a feed routed to the
HTML extractor produces tag-soup garbage. Structure mapping:

* channel/feed title        -> document TITLE
* channel description /
  feed subtitle             -> paragraph
* each item/entry           -> SECTION_HEADER(title) + paragraphs from
  description / summary / content:encoded / content (HTML payloads are
  tag-stripped and entity-unescaped — feed bodies are fragments, not
  documents, so the full HTML extractor would only add furniture rules
  that don't apply)

Namespace-agnostic (localname matching): RSS 2.0 (``<rss><channel>``),
RSS 1.0 / RDF (``<rdf:RDF>`` with RSS-1.0-namespace items) and Atom
(``<feed><entry>``) all walk the same way.
"""

from __future__ import annotations

import html as _html
import re
import xml.etree.ElementTree as ET

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document

_FEED_ROOT_RE = re.compile(
    rb"<\s*(rss|feed|rdf:RDF|urlset|sitemapindex)[\s>]", re.IGNORECASE
)
_BLOCK_BREAK_RE = re.compile(
    r"<\s*(?:/p|br\s*/?|/div|/li|/h[1-6]|/tr)\s*>", re.IGNORECASE
)
_TAG_RE = re.compile(r"<[^>]*>")
_SCRIPT_RE = re.compile(
    r"<\s*(script|style)\b.*?<\s*/\s*\1\s*>", re.IGNORECASE | re.DOTALL
)


def looks_like_feed(payload: bytes) -> bool:
    head = payload[:2048].lstrip(b"\xef\xbb\xbf").lstrip()
    # skip an xml declaration / comments / doctype preamble
    head = re.sub(rb"^(?:<\?[^>]*\?>|<!--.*?-->|<![^>]*>|\s+)*", b"", head,
                  flags=re.DOTALL)
    return _FEED_ROOT_RE.match(head) is not None


def _strip_html(text: str) -> list[str]:
    """Feed body fragment → plain paragraphs (tags out, entities in)."""
    text = _SCRIPT_RE.sub(" ", text)
    text = _BLOCK_BREAK_RE.sub("\n", text)
    text = _TAG_RE.sub(" ", text)
    text = _html.unescape(text)
    paras = []
    for chunk in text.split("\n"):
        chunk = " ".join(chunk.split())
        if chunk:
            paras.append(chunk)
    return paras


def _local(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _child_text(el, *names: str) -> str:
    wanted = set(names)
    for ch in el:
        if _local(ch.tag) in wanted:
            txt = "".join(ch.itertext()).strip()
            if txt:
                return txt
    return ""


def extract_feed(payload: bytes) -> Document:
    try:
        root = ET.fromstring(payload)
    except ET.ParseError:
        # crawl feeds are frequently truncated mid-entry; salvage by
        # closing at the last complete item/entry
        text = payload.decode("utf-8", errors="replace")
        for closer, wrapper in (
            ("</item>", "</channel></rss>"),
            ("</entry>", "</feed>"),
        ):
            idx = text.rfind(closer)
            if idx >= 0:
                try:
                    root = ET.fromstring(
                        text[: idx + len(closer)] + wrapper
                    )
                    break
                except ET.ParseError:
                    continue
        else:
            raise ValueError("unparseable feed XML")

    doc = Document()
    rootname = _local(root.tag)
    if rootname in ("urlset", "sitemapindex"):
        # XML sitemaps (sitemaps.org): a crawl-frontier artifact, not
        # prose — emit the URL list as a list group so downstream
        # quality/lang filters see it for what it is
        group = doc.add_list_group(name="list")
        for entry in root:
            if _local(entry.tag) not in ("url", "sitemap"):
                continue
            loc = _child_text(entry, "loc")
            lastmod = _child_text(entry, "lastmod")
            if loc:
                doc.add_text(
                    text=f"{loc} ({lastmod})" if lastmod else loc,
                    label=model.PARAGRAPH,
                    parent=group,
                )
        return doc
    if rootname == "rss":
        channels = [ch for ch in root if _local(ch.tag) == "channel"]
        container = channels[0] if channels else root
        items = [ch for ch in container.iter() if _local(ch.tag) == "item"]
        title = _child_text(container, "title")
        subtitle = _child_text(container, "description")
    elif rootname == "RDF":
        container = next(
            (ch for ch in root if _local(ch.tag) == "channel"), root
        )
        items = [ch for ch in root if _local(ch.tag) == "item"]
        title = _child_text(container, "title")
        subtitle = _child_text(container, "description")
    else:  # Atom <feed>
        container = root
        items = [ch for ch in root if _local(ch.tag) == "entry"]
        title = _child_text(container, "title")
        subtitle = _child_text(container, "subtitle")

    parent = None
    if title:
        parent = doc.add_text(text=title, label=model.TITLE)
    if subtitle:
        for para in _strip_html(subtitle):
            doc.add_text(text=para, label=model.PARAGRAPH, parent=parent)

    for item in items:
        ititle = _child_text(item, "title")
        header = (
            doc.add_heading(text=ititle, level=1, parent=parent)
            if ititle
            else parent
        )
        # first non-empty body wins (encoded > content > description)
        body = next(
            (
                b
                for name in ("encoded", "content", "description", "summary")
                if (b := _child_text(item, name))
            ),
            "",
        )
        for para in _strip_html(body):
            doc.add_text(text=para, label=model.PARAGRAPH, parent=header)
    return doc
