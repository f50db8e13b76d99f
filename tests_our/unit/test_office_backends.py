"""Unit tests for office-container + extra-format backends (SURVEY §2.4)."""

import pytest

from doc_parser_spark.core import model, sniff
from doc_parser_spark.core.office_backends import (
    detect_zip_kind,
    extract_docx,
    extract_hwpx,
    extract_office,
    extract_pptx,
    extract_xlsx,
)
from doc_parser_spark.core.serialize import doc_to_json, export_text
from doc_parser_spark.core.simple_backends import extract_asciidoc, extract_xml_generic
from doc_parser_spark.core.splitter import recursive_split
from doc_parser_spark.operators.extract import convert_payload

pytestmark = pytest.mark.unit

from doc_parser_spark.sources.office_fixtures import (
    _zip_bytes,
    make_docx,
    make_hwpx,
    make_pptx,
    make_xlsx,
)


def test_zip_kind_detection():
    assert detect_zip_kind(make_docx()) == "docx"
    assert detect_zip_kind(make_xlsx()) == "xlsx"
    assert detect_zip_kind(make_pptx()) == "pptx"
    assert detect_zip_kind(make_hwpx()) == "hwpx"
    assert detect_zip_kind(_zip_bytes({"random.txt": "x"})) == "zip"
    assert detect_zip_kind(b"not a zip") == "zip"


def test_docx_extraction():
    doc = extract_docx(make_docx())
    items = [(n.label, n.text) for n, _ in doc.iterate_items()]
    assert items[0] == (model.TITLE, "Doc Title")
    assert (model.SECTION_HEADER, "Intro") in items
    # docx body text carries the PARAGRAPH label (msword_backend.py:830)
    assert (model.PARAGRAPH, "First paragraph.") in items
    lis = [n for n, _ in doc.iterate_items() if n.label == model.LIST_ITEM]
    assert [li.text for li in lis] == ["item one", "item two"]
    # reference hardcodes is_numbered=False (msword_backend.py:717) — numId
    # alone cannot distinguish bullets from numbers
    assert not any(li.enumerated for li in lis)
    table = doc.tables()[0].table
    assert table.grid == [["H1", "H2"], ["a", "b"]]


def test_xlsx_extraction():
    doc = extract_xlsx(make_xlsx())
    table = doc.tables()[0].table
    assert table.grid == [["name", "42"], ["alice", "7"]]
    assert table.num_rows == 2 and table.num_cols == 2


def test_pptx_extraction():
    doc = extract_pptx(make_pptx())
    items = [(n.label, n.text) for n, _ in doc.iterate_items()]
    # title placeholder -> TITLE; non-list body text -> PARAGRAPH
    # (mspowerpoint_backend.py:191-204)
    assert (model.TITLE, "Slide Title") in items
    assert (model.PARAGRAPH, "Bullet text") in items


def test_hwpx_extraction():
    doc = extract_hwpx(make_hwpx())
    texts = [n.text for n, _ in doc.iterate_items() if n.label == model.PARAGRAPH]
    assert texts == ["한국어 본문 단락"]  # table cell text not duplicated
    assert doc.tables()[0].table.grid == [["셀"]]


def test_zip_routes_through_convert_payload():
    for payload, kind in [
        (make_docx(), "docx"), (make_xlsx(), "xlsx"),
        (make_pptx(), "pptx"), (make_hwpx(), "hwpx"),
    ]:
        assert sniff.sniff_format(payload) == sniff.FORMAT_ZIP
        doc, fmt, fallback = convert_payload(payload)
        assert fmt == kind and not fallback
        assert doc.has_text_items() or doc.tables()


def test_asciidoc_extraction():
    adoc = b"""= Document Title

== Section One

Body paragraph
over two lines.

* alpha
* beta

. first
. second

|===
|H1 |H2
|a |b
|===

.Figure caption
image::pic.png[]
"""
    assert sniff.sniff_format(adoc) == sniff.FORMAT_ADOC
    doc = extract_asciidoc(adoc)
    items = [(n.label, n.text) for n, _ in doc.iterate_items()]
    assert items[0] == (model.TITLE, "Document Title")
    assert (model.SECTION_HEADER, "Section One") in items
    assert (model.TEXT, "Body paragraph over two lines.") in items
    lis = [n for n, _ in doc.iterate_items() if n.label == model.LIST_ITEM]
    # ". first"/". second" are NOT list items under the reference's marker
    # grammar (needs \w+.) — they collect into the next caption instead
    assert [li.text for li in lis] == ["alpha", "beta"]
    assert [li.enumerated for li in lis] == [False, False]
    table = doc.tables()[0]
    assert table.table.grid == [["H1", "H2"], ["a", "b"]]
    assert doc.nodes[table.caption_ref].text == " first . second"
    pics = [n for n, _ in doc.iterate_items() if n.label == model.PICTURE]
    assert len(pics) == 1
    caption = doc.nodes[pics[0].caption_ref]
    assert caption.text == "Figure caption"


def test_asciidoc_nested_list_indent_machine():
    """Indent-driven group stack (asciidoc_backend.py:128-159): deeper
    indent opens a child group, dedent pops back, and ordered markers are
    parsed but emitted unnumbered (the reference never passes the flag)."""
    adoc = b"""* First item
  * Nested item 1
  * Nested item 2
* Second item
  1. Ordered 1
  2. Ordered 2
    * Deeper
* Third item
"""
    doc = extract_asciidoc(adoc)
    shape = [
        (d, n.text)
        for n, d in doc.iterate_items(with_groups=True)
        if n.label == model.LIST_ITEM
    ]
    assert shape == [
        (2, "First item"),
        (3, "Nested item 1"),
        (3, "Nested item 2"),
        (2, "Second item"),
        (3, "Ordered 1"),
        (3, "Ordered 2"),
        (4, "Deeper"),
        (2, "Third item"),
    ]
    lis = [n for n, _ in doc.iterate_items() if n.label == model.LIST_ITEM]
    assert all(not li.enumerated for li in lis)


def test_xml_generic_extraction():
    xml = b"""<?xml version="1.0"?>
<article><front><article-title>Paper Title</article-title></front>
<body><sec><title>Methods</title><p>We did things.</p></sec></body></article>"""
    assert sniff.sniff_format(xml) == sniff.FORMAT_XML
    doc = extract_xml_generic(xml)
    items = [(n.label, n.text) for n, _ in doc.iterate_items()]
    assert items[0] == (model.TITLE, "Paper Title")
    assert (model.SECTION_HEADER, "Methods") in items
    assert (model.TEXT, "We did things.") in items


def test_doc_json_roundtrip_via_dispatch():
    from doc_parser_spark.html.extractor import extract_html

    doc = extract_html(b"<html><body><h1>T</h1><p>body</p></body></html>")
    payload = doc_to_json(doc).encode()
    assert sniff.sniff_format(payload) == sniff.FORMAT_DOC_JSON
    doc2, fmt, _ = convert_payload(payload)
    assert fmt == "doc_json"
    assert export_text(doc2) == export_text(doc)


def test_generic_json_values():
    payload = b'{"title": "Hello", "nested": {"body": ["one", "two"]}, "n": 3}'
    assert sniff.sniff_format(payload) == sniff.FORMAT_JSON
    doc, fmt, _ = convert_payload(payload)
    assert fmt == "json"
    assert export_text(doc) == "Hello\n\none\n\ntwo"


def test_recursive_split():
    # reference: RecursiveCharacterTextSplitter(chunk_size=1000, overlap=200)
    # semantics (attachment_processor.py:298+)
    text = "\n\n".join("para %d " % i + "word " * 50 for i in range(10))
    chunks = recursive_split(text, chunk_size=1000, chunk_overlap=200)
    assert len(chunks) > 1
    assert all(len(c) <= 1000 for c in chunks)
    # everything is retained in order
    joined = " ".join(chunks)
    for i in range(10):
        assert f"para {i}" in joined
    assert recursive_split("", 1000, 200) == []
    assert recursive_split("short", 1000, 200) == ["short"]
    # single giant token falls back to char-level splitting
    assert all(len(c) <= 10 for c in recursive_split("x" * 95, 10, 2))


def test_xlsx_sheet_order_numeric_not_lexicographic():
    # sheet10 must come AFTER sheet2 (numeric page ordering)
    sheet_tpl = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
<row r="1"><c r="A1"><v>{}</v></c></row>
</sheetData></worksheet>"""
    members = {"[Content_Types].xml": "<Types/>", "xl/workbook.xml": "<workbook/>"}
    for i in range(1, 13):
        members[f"xl/worksheets/sheet{i}.xml"] = sheet_tpl.format(i * 100)
    doc = extract_xlsx(_zip_bytes(members))
    tables = doc.tables()
    assert len(tables) == 12
    assert [t.page_no for t in tables] == list(range(1, 13))
    assert [t.table.grid[0][0] for t in tables] == [str(i * 100) for i in range(1, 13)]


def test_degenerate_all_rowheader_table_does_not_crash():
    # divergence from the reference (which raises IndexError,
    # html_backend.py:475): all-row-header tables extract as empty grid
    from doc_parser_spark.html.extractor import extract_html

    doc = extract_html(
        b"<html><body><p>keep me</p>"
        b"<table><tr><th rowspan='2'>A</th></tr></table></body></html>"
    )
    assert "keep me" in export_text(doc, layers=("body", "furniture"))
    table = doc.tables()[0].table
    assert table.num_rows == 0
