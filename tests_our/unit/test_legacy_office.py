"""Legacy binary Office readers (.doc / .xls / .ppt) over the CFB parser."""

import pytest

from doc_parser_spark.core import model
from doc_parser_spark.core.cfb import read_cfb
from doc_parser_spark.core.legacy_office import (
    LegacyOfficeError,
    extract_legacy_office,
    _rk_value,
)
from doc_parser_spark.core.serialize import export_markdown, export_text
from doc_parser_spark.sources import office_fixtures as fx


def test_doc_pieces_and_table():
    doc, kind = extract_legacy_office(read_cfb(fx.make_doc(5)))
    assert kind == "doc"
    txt = export_text(doc)
    assert "Legacy doc 5 paragraph one." in txt  # CP1252-compressed piece
    assert "Unicode piece – two ¶5." in txt  # UTF-16LE piece
    t = doc.tables()
    assert len(t) == 1
    assert [c.text for c in t[0].table.cells] == ["A", "B", "c", "d"]
    assert t[0].table.grid == [["A", "B"], ["c", "d"]]


def test_xls_sst_continue_merges_and_numbers():
    doc, kind = extract_legacy_office(read_cfb(fx.make_xls(2)))
    assert kind == "xls"
    tables = doc.tables()
    # sheet Alpha: data table + separate merged-header island; sheet Beta: 1
    assert len(tables) == 3
    cells0 = {(c.start_row, c.start_col): c.text for c in tables[0].table.cells}
    assert cells0[(0, 0)] == "Header 2"
    assert cells0[(0, 1)] == "wide ¶ string"  # fHighByte UTF-16 SST entry
    assert cells0[(0, 2)] == "splitstring"  # spans the Continue boundary
    assert cells0[(1, 0)] == "3.25" and cells0[(1, 1)] == "42"
    assert cells0[(1, 2)] == "7"  # MULRK
    merged = tables[1].table.cells[0]
    assert (merged.col_span, merged.text) == (2, "Header 2")
    assert tables[2].table.cells[0].text == "102"
    # sheets land as named section groups in BOUNDSHEET order
    names = [n.name for n in doc.nodes if n.label == model.GROUP_SECTION and n.name.startswith("sheet")]
    assert names == ["sheet: Alpha", "sheet: Beta"]


def test_ppt_slides_titles_and_pages():
    doc, kind = extract_legacy_office(read_cfb(fx.make_ppt(9)))
    assert kind == "ppt"
    items = [(n.label, n.text, n.page_no) for n, _ in doc.iterate_items()]
    assert (model.SECTION_HEADER, "Slide one title 9", 1) in items
    assert (model.TEXT, "Body bullet one", 1) in items
    assert (model.TEXT, "Body bullet two", 1) in items
    assert (model.SECTION_HEADER, "Zwölf title", 2) in items  # TextBytes + 2nd slide


def test_rk_encodings():
    assert _rk_value((30 << 2) | 0x02) == 30.0
    assert _rk_value((((-5) << 2) & 0xFFFFFFFF) | 0x02) == -5.0
    assert _rk_value((3050 << 2) | 0x03) == 30.5  # fX100 integer
    import struct
    ieee_top = struct.unpack("<Q", struct.pack("<d", 2.5))[0] >> 32
    assert _rk_value(ieee_top & 0xFFFFFFFC) == 2.5


def test_unknown_cfb_rejected():
    from doc_parser_spark.core.cfb import write_cfb

    with pytest.raises(LegacyOfficeError):
        extract_legacy_office({"SomeStream": b"x"})
    # and through the kernel: routed to a skipped row (unsupported
    # format semantics, same as binary garbage), never a crash
    from doc_parser_spark.operators.extract import process_document

    rec = process_document("u", write_cfb({"SomeStream": b"\x00" * 64}))
    assert rec["status"] == "skipped"


def test_doc_markdown_renders_table():
    doc, _ = extract_legacy_office(read_cfb(fx.make_doc(1)))
    md = export_markdown(doc)
    assert "| A" in md and "| c" in md


def test_corruption_fuzz_never_crashes_kernel():
    """Bit-flipped / truncated container payloads must isolate as
    failure/skipped rows — never escape the per-document guard."""
    import random

    from doc_parser_spark.operators.extract import process_document
    from doc_parser_spark.sources.office_fixtures import (
        make_doc, make_mhtml, make_ppt, make_rtf, make_warc, make_xls,
    )

    rng = random.Random(1)
    base = [make_doc(1), make_xls(1), make_ppt(1), make_warc(1), make_rtf(1), make_mhtml(1)]
    for _ in range(120):
        b = bytearray(rng.choice(base))
        for _ in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        b = bytes(b[: rng.randrange(10, len(b) + 1)])
        rec = process_document("u", b)
        assert rec["status"] in ("success", "failure", "skipped")
