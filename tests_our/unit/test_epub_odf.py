"""EPUB and OpenDocument (odt/ods/odp) backends.

No reference counterpart (the reference shells LibreOffice-family files
out to LibreOffice, ``doc_preprocessors/attachment_processor.py:86-146``,
and never sees .epub at all); native zip+XML readers here, same
treatment as legacy_office.py.
"""

import io
import zipfile

import pytest

from doc_parser_spark.core import model
from doc_parser_spark.core.epub_backend import EpubError, extract_epub
from doc_parser_spark.core.odf_backend import OdfError, extract_odf
from doc_parser_spark.core.office_backends import detect_zip_kind
from doc_parser_spark.core.serialize import export_markdown, export_text
from doc_parser_spark.sources import office_fixtures as fx


# -- routing ----------------------------------------------------------------


def test_zip_kind_detection():
    assert detect_zip_kind(fx.make_epub(1)) == "epub"
    assert detect_zip_kind(fx.make_odt(1)) == "odt"
    assert detect_zip_kind(fx.make_ods(1)) == "ods"
    assert detect_zip_kind(fx.make_odp(1)) == "odp"
    # OOXML still wins over the generic mimetype probes
    assert detect_zip_kind(fx.make_docx()) == "docx"


def test_kernel_routing_and_status():
    from doc_parser_spark.operators.extract import process_document

    for mk, kind in [(fx.make_epub, "epub"), (fx.make_odt, "odt"),
                     (fx.make_ods, "ods"), (fx.make_odp, "odp")]:
        rec = process_document("u", mk(2))
        assert (rec["status"], rec["format"]) == ("success", kind)


# -- EPUB --------------------------------------------------------------------


def test_epub_title_and_spine_order():
    doc = extract_epub(fx.make_epub(5))
    assert doc.title_text() == "Fixture Book 5"
    txt = export_text(doc)
    # chapter 1 content precedes chapter 2 content (spine order)
    assert txt.index("Opening paragraph 5.") < txt.index("Chapter Two")
    # HTML semantics ride the full extractor: list + table survive
    assert "- first point" in txt
    assert "a5 | b" in txt


def test_epub_chapters_are_chapter_groups_with_page_provenance():
    doc = extract_epub(fx.make_epub(1))
    chapters = [n for n in doc.nodes if n.label == model.GROUP_CHAPTER]
    assert len(chapters) == 2
    # every grafted item is page-addressed by its chapter ordinal
    pages = {n.page_no for n in doc.nodes
             if not n.is_group and n.text and "Closing" in (n.text or "")}
    assert pages == {2}


def test_epub_table_grafts_as_table_struct():
    doc = extract_epub(fx.make_epub(9))
    tables = doc.tables()
    assert len(tables) == 1
    t = tables[0].table
    assert t.num_rows == 2 and t.num_cols == 2
    assert t.grid[1][0] == "a9"
    md = export_markdown(doc)
    assert "| k" in md  # table renders through the shared sink


def test_epub_missing_container_is_epub_error():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
    with pytest.raises(EpubError):
        extract_epub(buf.getvalue())


def test_epub_spine_skips_missing_members():
    # manifest points at a chapter the zip doesn't carry: skipped, not fatal
    payload = fx.make_epub(0)
    buf = io.BytesIO()
    src = zipfile.ZipFile(io.BytesIO(payload))
    with zipfile.ZipFile(buf, "w") as zf:
        for info in src.infolist():
            if info.filename != "OEBPS/ch2.xhtml":
                zf.writestr(info, src.read(info.filename))
    doc = extract_epub(buf.getvalue())
    txt = export_text(doc)
    assert "Opening paragraph 0." in txt and "Chapter Two" not in txt


# -- ODT ---------------------------------------------------------------------


def test_odt_structure():
    doc = extract_odf(fx.make_odt(4))[0]
    items = [(n.label, n.text) for n, _ in doc.iterate_items()]
    assert (model.SECTION_HEADER, "Odt Report 4") in items
    assert (model.TEXT, "Lead paragraph 4.") in items
    # numbered list style -> enumerated items with markers
    li = [n for n, _ in doc.iterate_items() if n.label == model.LIST_ITEM]
    assert [x.text for x in li] == ["alpha step", "beta step"]
    assert all(x.enumerated for x in li)
    assert li[0].marker == "1."
    t = doc.tables()[0].table
    assert t.grid[1][0] == "row4"


def test_odt_whitespace_elements_expand():
    # <text:s text:c="2"/> and <text:tab/> must separate words (not fuse them)
    doc = extract_odf(fx.make_odt(0))[0]
    assert any(n.text == "Lead paragraph 0." for n in doc.nodes)


# -- ODS ---------------------------------------------------------------------


def test_ods_repeat_expansion_and_padding_trim():
    doc, kind = extract_odf(fx.make_ods(7))
    assert kind == "ods"
    t = doc.tables()[0].table
    # 1000-col + 500-row repeat padding trimmed to the used range
    assert t.num_rows == 2 and t.num_cols == 3
    assert t.grid[0] == ["h1", "h2", "h2"]
    assert t.grid[1][0] == "7"
    # sheets become chapter groups with the sheet name as heading
    names = [n.name for n in doc.nodes if n.label == model.GROUP_CHAPTER]
    assert names == ["sheet: Data", "sheet: Empty"]


def test_ods_repeat_cap_bounds_work():
    # a hostile 2^24 repeat must not allocate 2^24 cells
    content = f"""<?xml version="1.0"?>
<office:document-content {fx._ODF_OFFICE}><office:body><office:spreadsheet>
<table:table table:name="S">
<table:table-row table:number-rows-repeated="16777216">
<table:table-cell table:number-columns-repeated="16777216"><text:p>x</text:p>
</table:table-cell></table:table-row>
</table:table>
</office:spreadsheet></office:body></office:document-content>"""
    payload = fx._odf_zip(
        "application/vnd.oasis.opendocument.spreadsheet", content)
    doc = extract_odf(payload)[0]
    t = doc.tables()[0].table
    assert t.num_rows <= 1024 and t.num_cols <= 1024


# -- ODP ---------------------------------------------------------------------


def test_odp_slides_titles_lists_tables():
    doc, kind = extract_odf(fx.make_odp(6))
    assert kind == "odp"
    assert doc.title_text() == "Deck 6"
    txt = export_text(doc)
    assert "- point one" in txt
    assert "c | d6" in txt
    # slide 2 title is a section header, not a second TITLE
    heads = [n for n in doc.nodes if n.label == model.SECTION_HEADER]
    assert [h.text for h in heads] == ["Points"]
    # per-slide page provenance
    assert {n.page_no for n in doc.nodes if n.text == "point one"} == {2}


# -- error paths ---------------------------------------------------------------


def test_odf_no_content_xml_is_odf_error():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("meta.xml", "<meta/>")
    with pytest.raises(OdfError):
        extract_odf(buf.getvalue())
