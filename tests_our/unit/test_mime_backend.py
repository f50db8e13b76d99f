"""MHTML web-archive and EML backends (stdlib email over the MIME walk)."""

import pytest

from doc_parser_spark.core import model, sniff
from doc_parser_spark.core.mime_backend import MimeError, extract_mime
from doc_parser_spark.core.serialize import export_text
from doc_parser_spark.operators.extract import convert_payload
from doc_parser_spark.sources import office_fixtures as fx


def test_sniff_routes_mime():
    assert sniff.sniff_format(fx.make_mhtml(1)) == sniff.FORMAT_MIME
    assert sniff.sniff_format(fx.make_eml(1)) == sniff.FORMAT_MIME
    # prose that merely mentions a header name must NOT route to MIME
    assert (
        sniff.sniff_format(b"This text explains what MIME-Version: means.")
        == sniff.FORMAT_TEXT
    )


def test_mhtml_html_part_rides_html_extractor():
    doc, kind = extract_mime(fx.make_mhtml(7))
    assert kind == "mhtml"
    txt = export_text(doc)
    # quoted-printable decoded, UTF-8 charset honored, list semantics intact
    assert "Snapshot 7" in txt and "Saved café content." in txt
    assert "- alpha" in txt and "- beta" in txt
    assert doc.title_text() == "Snapshot 7"  # h1 per the HTML extractor rule


def test_eml_plaintext_paragraphs_and_subject_title():
    doc, kind = extract_mime(fx.make_eml(3))
    assert kind == "eml"
    items = [(n.label, n.text) for n, _ in doc.iterate_items()]
    assert (model.TITLE, "Weekly report 3") in items
    assert (model.TEXT, "First paragraph of report 3.") in items
    assert (model.TEXT, "Second paragraph with café bytes.") in items


def test_kernel_routing_and_status():
    from doc_parser_spark.operators.extract import process_document

    rec = process_document("u", fx.make_mhtml(2))
    assert (rec["status"], rec["format"]) == ("success", "mhtml")
    rec = process_document("u", fx.make_eml(2))
    assert (rec["status"], rec["format"]) == ("success", "eml")


def test_headerless_mime_rejected():
    with pytest.raises(MimeError):
        extract_mime(b"\r\n\r\nno headers at all")
