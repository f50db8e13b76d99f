"""RTF backend: group-stack tokenizer, destinations, escapes, tables."""

import pytest

from doc_parser_spark.core import sniff
from doc_parser_spark.core.rtf_backend import RtfError, extract_rtf
from doc_parser_spark.core.serialize import export_markdown, export_text
from doc_parser_spark.sources.office_fixtures import make_rtf


def test_sniff_and_full_extraction():
    rtf = make_rtf(5)
    assert sniff.sniff_format(rtf) == sniff.FORMAT_RTF
    doc = extract_rtf(rtf)
    txt = export_text(doc)
    assert "Rtf fixture 5 café — text." in txt  # \'e9 hex + 舒? unicode
    assert "Second paragraph 5." in txt and "Tail." in txt
    assert "fixture;" not in txt  # \*\generator destination skipped
    t = doc.tables()
    assert len(t) == 1
    assert t[0].table.grid == [["K", "V"], ["k5", "v"]]


def test_skip_destinations_and_symbol_escapes():
    rtf = (
        b"{\\rtf1{\\info{\\title SECRET}}{\\colortbl;\\red0;}"
        b"A \\{brace\\} \\\\slash \\~nb\\par}"
    )
    txt = export_text(extract_rtf(rtf))
    assert "SECRET" not in txt and "red0" not in txt
    assert "A {brace} \\slash" in txt and "nb" in txt


def test_uc_fallback_skip():
    # \uc2 means TWO fallback bytes follow each \uN
    rtf = b"{\\rtf1\\uc2 \\u945 ab after\\par}"
    txt = export_text(extract_rtf(rtf))
    assert "α after" in txt and "ab" not in txt.replace(" after", "")


def test_non_rtf_rejected():
    with pytest.raises(RtfError):
        extract_rtf(b"not rtf at all")


def test_markdown_table():
    md = export_markdown(extract_rtf(make_rtf(1)))
    assert "| K" in md and "| k1" in md
