"""Unit tests for deterministic enrichment (SURVEY.md §2.6 portable subset)."""

import pytest

from doc_parser_spark.core import model
from doc_parser_spark.core.enrichment import (
    apply_toc,
    demote_section_headers,
    enrich_document,
    extract_raw_text_for_toc,
    meaningful_char_ratio,
    needs_ocr_retrigger,
    parse_toc_content,
)
from doc_parser_spark.html.extractor import extract_html

pytestmark = pytest.mark.unit


def _flat_doc():
    # a PDF-style flat document where headings were NOT detected
    doc = extract_html(
        b"<html><body>"
        b"<p>Annual Business Report</p>"
        b"<p>1. Introduction</p>"
        b"<p>Some intro prose here.</p>"
        b"<p>1.1. Background</p>"
        b"<p>Background prose follows.</p>"
        b"<p>2. Results</p>"
        b"<p>Result prose.</p>"
        b"</body></html>"
    )
    return doc


def test_parse_toc_content():
    parsed = parse_toc_content(
        "TITLE: Annual Business Report\n"
        "1. Introduction\n1.1. Background\n1.1.1. Details\n"
        "2. Results\nUnnumbered Appendix\n"
    )
    assert parsed["title"] == "Annual Business Report"
    levels = [(t["number"], t["level"]) for t in parsed["toc_items"]]
    assert levels == [("1", 1), ("1.1", 2), ("1.1.1", 3), ("2", 1), ("", 1)]


def test_apply_toc_promotes_title_and_sections():
    doc = _flat_doc()
    toc = "TITLE: Annual Business Report\n1. Introduction\n1.1. Background\n2. Results\n"
    matched = apply_toc(doc, toc)
    assert matched == 4
    by_text = {n.text: n for n in doc.nodes if n.text}
    assert by_text["Annual Business Report"].label == model.TITLE
    assert by_text["1. Introduction"].label == model.SECTION_HEADER
    assert by_text["1. Introduction"].level == 1
    assert by_text["1.1. Background"].label == model.SECTION_HEADER
    assert by_text["1.1. Background"].level == 2
    # prose stays prose
    assert by_text["Some intro prose here."].label == model.TEXT


def test_demote_section_headers():
    doc = extract_html(b"<html><body><h1>T</h1><h2>S</h2><p>x</p></body></html>")
    n = demote_section_headers(doc)
    assert n == 1  # only the h2 (TITLE is not a section header)
    assert all(node.label != model.SECTION_HEADER for node in doc.nodes)


def test_enrich_document_noop_without_provider():
    doc = _flat_doc()
    before = [(n.label, n.text) for n in doc.nodes]
    enrich_document(doc, toc_provider=None)
    assert [(n.label, n.text) for n in doc.nodes] == before


def test_enrich_document_with_provider():
    doc = _flat_doc()
    enrich_document(doc, toc_provider=lambda raw: "1. Introduction\n2. Results\n")
    headers = [n.text for n in doc.nodes if n.label == model.SECTION_HEADER]
    assert set(headers) == {"1. Introduction", "2. Results"}


def test_raw_text_collapses_whitespace():
    doc = extract_html(b"<html><body><p>a   b\nc</p></body></html>")
    assert extract_raw_text_for_toc(doc) == "a b c\n"


def test_quality_check():
    assert meaningful_char_ratio("Normal English text, with 123.") > 0.95
    assert meaningful_char_ratio("한국어 텍스트입니다.") > 0.95
    assert meaningful_char_ratio("\x01\x02\x03") < 0.2
    good = extract_html(b"<html><body><p>plain healthy text</p></body></html>")
    assert not needs_ocr_retrigger(good)
    empty = extract_html(b"<html><body></body></html>")
    assert needs_ocr_retrigger(empty)
