"""Deterministic layout labeling (Op-24 rules stand-in; pdf/labels.py).

Reference behaviors mirrored: furniture split (docling AssembledUnit
headers/body, base_models.py:260-264; page_header/page_footer layout
classes), list_item clusters, caption refs on tables, code blocks
(code_formula_model.py — font-based detection here, VLM scoped out).
"""

import pytest

from doc_parser_spark.core import model
from doc_parser_spark.core.serialize import export_markdown, export_text
from doc_parser_spark.pdf import labels, writer
from doc_parser_spark.pdf.extractor import extract_pdf

pytestmark = pytest.mark.unit


def _page(body_lines, page_no, header=None, footer=None):
    runs = []
    if header:
        runs.append((72.0, 760.0, 10.0, header))
    runs += writer.paragraph_runs(body_lines, top_y=600)
    if footer:
        runs.append((280.0, 30.0, 10.0, footer))
    return runs


def test_repeated_header_footer_become_furniture():
    pages = [
        _page([f"Body paragraph {i} with real flowing prose."], i,
              header="Journal of Deterministic Tests",
              footer=f"Page {i}")
        for i in (1, 2, 3)
    ]
    doc, fallback = extract_pdf(writer.write_pdf(pages))
    assert not fallback
    body = export_text(doc)
    assert "Journal of Deterministic Tests" not in body
    assert "Page 1" not in body
    furn = [
        (n.label, n.text)
        for n, _ in doc.iterate_items(layers=(model.FURNITURE,))
    ]
    assert ([l for l, _ in furn].count(model.PAGE_HEADER)) == 3
    assert ([l for l, _ in furn].count(model.PAGE_FOOTER)) == 3
    assert ("Body paragraph 2" in body)


def test_band_text_without_repetition_stays_body():
    # single page, non-numeric header text: no repetition evidence → body
    doc, _ = extract_pdf(
        writer.write_pdf([_page(["Body text."], 1, header="Running Head")])
    )
    assert "Running Head" in export_text(doc)


def test_page_number_is_furniture_even_on_one_page():
    doc, _ = extract_pdf(
        writer.write_pdf([_page(["Body text."], 1, footer="7")])
    )
    assert export_text(doc) == "Body text."
    furn = [n.label for n, _ in doc.iterate_items(layers=(model.FURNITURE,))]
    assert furn == [model.PAGE_FOOTER]


def test_bullet_list_groups_items():
    runs = writer.paragraph_runs(
        ["- alpha item one", "- beta item two", "- gamma item three"],
        top_y=600,
    )
    doc, _ = extract_pdf(writer.write_pdf([runs]))
    items = [
        (n.label, n.text) for n, _ in doc.iterate_items(with_groups=True)
    ]
    assert (model.GROUP_LIST, "") in items
    li = [t for l, t in items if l == model.LIST_ITEM]
    assert li == ["alpha item one", "beta item two", "gamma item three"]
    md = export_markdown(doc)
    assert "- alpha item one\n- beta item two" in md


def test_enumerated_list_renders_numbers():
    runs = writer.paragraph_runs(["1. first step", "2. second step"], top_y=600)
    doc, _ = extract_pdf(writer.write_pdf([runs]))
    md = export_markdown(doc)
    assert "1. first step" in md and "2. second step" in md
    li = [
        n for n, _ in doc.iterate_items() if n.label == model.LIST_ITEM
    ]
    assert all(n.enumerated for n in li)


def test_lone_dash_line_is_not_a_list():
    # a single marker line is more likely dehyphenation debris than a list
    runs = writer.paragraph_runs(["- only one marker line"], top_y=600)
    doc, _ = extract_pdf(writer.write_pdf([runs]))
    labels_seen = [n.label for n, _ in doc.iterate_items()]
    assert model.LIST_ITEM not in labels_seen


def test_mono_font_block_becomes_code():
    runs = [
        (72.0, 600.0, 11.0, "x = compute(1)", "mono"),
        (72.0, 586.0, 11.0, "emit(x + 2)", "mono"),
    ]
    runs += writer.paragraph_runs(["Prose after the snippet."], top_y=520)
    doc, _ = extract_pdf(writer.write_pdf([runs]))
    code = [n for n, _ in doc.iterate_items() if n.label == model.CODE]
    assert len(code) == 1
    assert code[0].text == "x = compute(1)\nemit(x + 2)"
    assert "```\nx = compute(1)\nemit(x + 2)\n```" in export_markdown(doc)
    assert "Prose after the snippet." in export_text(doc)


def test_caption_below_table_cross_references():
    cols, rows = [90.0, 90.0], [20.0, 20.0]
    runs = writer.table_cell_runs(
        72.0, 700.0, cols, rows, [["h1", "h2"], ["a", "b"]]
    )
    ops = writer.table_ops(72.0, 700.0, cols, rows)
    runs.append((72.0, 630.0, 10.0, "Table 1. Determinism results."))
    doc, _ = extract_pdf(writer.write_pdf_with_graphics([(runs, ops)]))
    tables = [n for n, _ in doc.iterate_items() if n.label == model.TABLE]
    caps = [n for n, _ in doc.iterate_items() if n.label == model.CAPTION]
    assert len(tables) == 1 and len(caps) == 1
    assert tables[0].caption_ref == caps[0].index


def test_caption_above_table_cross_references():
    cols, rows = [90.0, 90.0], [20.0, 20.0]
    runs = writer.table_cell_runs(
        72.0, 690.0, cols, rows, [["h1", "h2"], ["a", "b"]]
    )
    ops = writer.table_ops(72.0, 690.0, cols, rows)
    runs.append((72.0, 710.0, 10.0, "Table 1. Placed above the grid."))
    doc, _ = extract_pdf(writer.write_pdf_with_graphics([(runs, ops)]))
    tables = [n for n, _ in doc.iterate_items() if n.label == model.TABLE]
    caps = [n for n, _ in doc.iterate_items() if n.label == model.CAPTION]
    assert len(tables) == 1 and len(caps) == 1
    assert tables[0].caption_ref == caps[0].index


def test_split_list_items_pure():
    assert labels.split_list_items(["- a", "- b"]) == [("a", False), ("b", False)]
    assert labels.split_list_items(["1. a", "cont", "2. b"]) == [
        ("a cont", True),
        ("b", True),
    ]
    assert labels.split_list_items(["- a"]) is None
    assert labels.split_list_items(["text", "- a", "- b"]) is None
    assert labels.split_list_items([]) is None


def test_adjacent_code_blocks_merge_into_one_listing():
    # a blank source line splits the cluster but not the listing
    runs = [
        (72.0, 600.0, 11.0, "def f():", "mono"),
        (72.0, 586.0, 11.0, "return 1", "mono"),
        (72.0, 558.0, 11.0, "print(f())", "mono"),  # after a blank line
    ]
    doc, _ = extract_pdf(writer.write_pdf([runs]))
    code = [n for n, _ in doc.iterate_items() if n.label == model.CODE]
    assert len(code) == 1
    assert code[0].text == "def f():\nreturn 1\nprint(f())"


def test_math_font_block_becomes_formula():
    runs = [(200.0, 600.0, 11.0, "E = mc2", "math")]
    runs += writer.paragraph_runs(
        ["Prose paragraph following the display equation."], top_y=560
    )
    doc, _ = extract_pdf(writer.write_pdf([runs]))
    formulas = [
        n for n, _ in doc.iterate_items() if n.label == model.FORMULA
    ]
    assert [n.text for n in formulas] == ["E = mc2"]
    assert "Prose paragraph following" in export_text(doc)


def test_math_font_without_operator_stays_text():
    # an italic variable name alone is not a display equation
    runs = [(72.0, 600.0, 11.0, "x", "math")]
    runs += writer.paragraph_runs(["denotes the unknown."], top_y=586)
    doc, _ = extract_pdf(writer.write_pdf([runs]))
    assert not [
        n for n, _ in doc.iterate_items() if n.label == model.FORMULA
    ]


def test_split_label_runs_pure():
    class C:
        def __init__(self, font_name, text="t"):
            self.font_name = font_name
            self.text = text

    mono, prose = C("Courier"), C("Helvetica")
    # uniform block: no split
    assert labels.split_label_runs([prose, prose]) == [[prose, prose]]
    # caption + 2-cell code run splits
    out = labels.split_label_runs([prose, mono, mono])
    assert len(out) == 2 and out[1] == [mono, mono]
    # a single inline mono cell stays in the paragraph
    assert labels.split_label_runs([prose, mono, prose]) == [
        [prose, mono, prose]
    ]
    # math run with an operator splits out
    math = C("CMMI10", "a + b = c")
    out = labels.split_label_runs([math, prose])
    assert len(out) == 2 and out[0] == [math]
    # math cell without an operator merges back into prose
    bare = C("CMMI10", "x")
    assert labels.split_label_runs([bare, prose]) == [[bare, prose]]


def test_folio_outside_band_still_footer_when_bottommost():
    # LaTeX-style folio ~0.82h: below the 15% band but the page's lowest
    # block → footer (reference labels these page_footer)
    runs = writer.paragraph_runs(["Body text paragraph."], top_y=600)
    runs.append((290.0, 145.0, 10.0, "3"))  # y=145/792 → top≈0.81h
    doc, _ = extract_pdf(writer.write_pdf([runs]))
    furn = [
        n.label for n, _ in doc.iterate_items(layers=(model.FURNITURE,))
    ]
    assert furn == [model.PAGE_FOOTER]
    assert export_text(doc) == "Body text paragraph."


def test_footnote_marker_small_print_at_page_bottom():
    runs = writer.paragraph_runs(["Body paragraph in full size."], top_y=600)
    # footnote: digit marker + reduced size, low on the page (y=120/792)
    runs.append((72.0, 120.0, 8.0, "1 http://example.org/source"))
    doc, _ = extract_pdf(writer.write_pdf([runs]))
    fns = [n for n, _ in doc.iterate_items() if n.label == model.FOOTNOTE]
    assert [n.text for n in fns] == ["1 http://example.org/source"]
    # body-layer content (docling keeps footnotes in the body)
    assert "example.org" in export_text(doc)


def test_superscript_marker_joins_its_line():
    from doc_parser_spark.pdf import minipdf

    # 6pt superscript '1' overlapping an 8pt line → one merged cell
    def cell(i, text, l, r, t, b, fs):
        return minipdf.TextCell(index=i, text=text, l=l, t=t, r=r, b=b,
                                font_size=fs, page_no=1,
                                font_name="F", font_names=("F",))

    sup = cell(0, "1", 136.8, 146.3, 715.0, 721.4, 6.4)
    url = cell(1, "http://x.org", 146.4, 258.4, 717.0, 725.0, 8.0)
    from doc_parser_spark.pdf import layout

    merged = layout.merge_horizontal_cells([sup, url])
    assert len(merged) == 1
    assert merged[0].text.split() == ["1", "http://x.org"]
    assert merged[0].font_size == 8.0  # dominant face, not the superscript


def test_new_labels_flow_through_every_sink():
    # footnote/formula/code must serialize in json/doctags/html — the
    # docling-json bucketer raises on labels missing from its text set
    import json as _json

    from doc_parser_spark.core.docling_json import export_docling_json
    from doc_parser_spark.core.serialize import export_doctags, export_html

    runs = writer.paragraph_runs(["Body."], top_y=640)
    runs.append((200.0, 600.0, 11.0, "E = mc2", "math"))
    runs.append((72.0, 560.0, 11.0, "x = 1", "mono"))
    runs.append((72.0, 546.0, 11.0, "y = 2", "mono"))
    runs.append((72.0, 120.0, 8.0, "1 see http://example.org"))
    doc, _ = extract_pdf(writer.write_pdf([runs]))
    j = _json.loads(
        export_docling_json(
            doc, name="t", filename="t.pdf",
            mimetype="application/pdf", data=b"t",
        )
    )
    got = {t["label"] for t in j["texts"]}
    assert {"formula", "code", "footnote"} <= got
    dt = export_doctags(doc)
    assert "<formula>" in dt and "<code>" in dt and "<footnote>" in dt
    html = export_html(doc)
    assert "<pre><code>" in html


def test_font_name_reaches_cells():
    from doc_parser_spark.pdf import minipdf

    pdf = writer.write_pdf(
        [[(72.0, 700.0, 12.0, "plain"), (72.0, 660.0, 12.0, "typed", "mono")]]
    )
    (page,) = minipdf.parse_pdf(pdf)
    by_text = {c.text: c.font_name for c in page.cells}
    assert by_text["plain"] == "Helvetica"
    assert by_text["typed"] == "Courier"


def test_picture_clusters_from_bitmap_rects():
    from doc_parser_spark.pdf import labels

    # two tiled halves of one figure + one separate figure + a 4pt rule
    rects = [
        (100, 100, 200, 180),
        (202, 100, 300, 180),  # 2pt gap → same cluster
        (100, 400, 300, 560),
        (72, 700, 540, 703),  # decorative rule: area < threshold
    ]
    boxes = labels.cluster_picture_rects(rects)
    assert boxes == [(100.0, 100.0, 300.0, 180.0), (100.0, 400.0, 300.0, 560.0)]


def test_reference_pdf_pictures_and_caption_ref():
    """picture_classification: both figures emit PICTURE items with
    their 'Figure N' captions cross-referenced (the golden's shape)."""
    doc, _ = extract_pdf(
        open(
            "/root/reference/tests/data/pdf/picture_classification.pdf",
            "rb",
        ).read()
    )
    pics = [n for n, _ in doc.iterate_items() if n.label == model.PICTURE]
    assert len(pics) == 2
    from doc_parser_spark.core.serialize import export_markdown

    assert export_markdown(doc).count("<!-- image -->") == 2


def test_bold_body_size_line_becomes_section_header():
    # Word-converted PDFs: headings are bold at nearly body size —
    # under any safe size factor, so boldness is the signal
    from doc_parser_spark.pdf import minipdf

    def cell(i, text, name, t, size=12.0):
        return minipdf.TextCell(
            index=i, text=text, l=72.0, t=t, r=400.0, b=t + size,
            font_size=size, page_no=1, font_name=name,
            font_names=(name,),
        )

    # build through labels directly (writer has no bold face)
    assert labels.is_bold_heading(
        [cell(0, "Pre-Digital Era", "TimesNewRomanPS-BoldMT", 100.0)],
        "Pre-Digital Era",
        12.0,
    )
    # a bold full sentence is emphasis, not a heading
    assert not labels.is_bold_heading(
        [cell(0, "This whole sentence is bold.", "Arial-Bold", 100.0)],
        "This whole sentence is bold.",
        12.0,
    )
    # regular face never qualifies
    assert not labels.is_bold_heading(
        [cell(0, "Plain line", "TimesNewRomanPSMT", 100.0)],
        "Plain line",
        12.0,
    )
    # below body size never qualifies
    assert not labels.is_bold_heading(
        [cell(0, "Tiny bold", "Arial-Bold", 100.0, size=9.0)],
        "Tiny bold",
        12.0,
    )


def test_leading_bold_heading_splits_from_paragraph():
    from doc_parser_spark.pdf import minipdf

    def cell(i, text, names, t):
        return minipdf.TextCell(
            index=i, text=text, l=72.0, t=t, r=400.0, b=t + 12.0,
            font_size=12.0, page_no=1, font_name=names[0],
            font_names=tuple(names),
        )

    head = cell(0, "Heading Line", ("Arial-Bold",), 100.0)
    body1 = cell(1, "Body sentence one.", ("Arial",), 114.0)
    body2 = cell(2, "Body sentence two.", ("Arial",), 128.0)
    out = labels.split_leading_bold_heading([head, body1, body2], 12.0)
    assert out == [[head], [body1, body2]]
    # uniformly bold block: emphasis, no split
    b1 = cell(1, "All bold.", ("Arial-Bold",), 114.0)
    assert labels.split_leading_bold_heading([head, b1], 12.0) == [[head, b1]]


def test_smallcaps_zero_gap_merges_one_cell_with_space_join():
    # small-caps share the baseline: 'V'+'ATICAN' merges into ONE cell;
    # the joint carries the flat " " separator of the reference's
    # sanitize_text (no golden exhibits a seamless zero-gap cell join)
    from doc_parser_spark.pdf import minipdf

    def cell(i, text, l, r, t, b, fs):
        return minipdf.TextCell(index=i, text=text, l=l, t=t, r=r, b=b,
                                font_size=fs, page_no=1)

    big = cell(0, "V", 72.0, 80.0, 100.0, 110.0, 10.0)
    small = cell(1, "ATICAN", 80.1, 120.0, 102.5, 110.0, 7.5)
    from doc_parser_spark.pdf import layout

    merged = layout.merge_horizontal_cells([big, small])
    assert len(merged) == 1 and merged[0].text == "V ATICAN"


def test_inline_math_in_prose_stays_text():
    # 'where α = 0.05 is the learning rate' — math face present and '='
    # present, but it reads as prose → never a formula
    class C:
        text = "where a = 0.05 is the learning rate"
        font_name = "CMMI10"
        font_names = ("CMMI10", "CMR10")
        font_size = 10.0

    assert not labels.is_formula_block([C()])


def test_whitespace_cell_does_not_declassify_code():
    class Mono:
        def __init__(self, text):
            self.text = text
            self.font_name = "Courier"
            self.font_names = ("Courier",)

    class Blank:
        text = "   "
        font_name = ""
        font_names = ()

    assert labels.is_mono_block([Mono("def f():"), Blank(), Mono("x = 1")])
    # the 'any' cell joins the surrounding run — no split
    out = labels.split_label_runs([Mono("a"), Blank(), Mono("b")])
    assert len(out) == 1 and len(out[0]) == 3


def test_caption_kind_matching():
    assert labels.caption_kind("Table 3: results") == "table"
    assert labels.caption_kind("Tab. 2 overview") == "table"
    assert labels.caption_kind("Figure 1: pipeline") == "figure"
    assert labels.caption_kind("Listing 1: code") == "figure"


def test_text_pdf_with_logo_still_falls_back_for_text(monkeypatch):
    """A text-bearing PDF whose structured parse yields no cells but DOES
    place a bitmap must still recover text via the naive scan."""
    from doc_parser_spark.pdf import minipdf as mp

    pdf = writer.write_pdf([writer.paragraph_runs(["Recoverable text."], top_y=600)])

    real_parse = mp.parse_pdf

    def broken_parse(data):
        pages = real_parse(data)
        for p in pages:
            p.cells = []  # fonts defeated the structured parse
            p.bitmap_rects = [(100.0, 100.0, 200.0, 200.0)]
        return pages

    monkeypatch.setattr(mp, "parse_pdf", broken_parse)
    doc, fallback = extract_pdf(pdf)
    assert fallback
    assert "Recoverable text." in export_text(doc)


def test_symbol_font_decodes_via_symbol_charset():
    # a subset SymbolMT declaring /MacRomanEncoding still reads through
    # the Symbol charset: code 0xA5 is '∞' (infinity), not MacRoman '•'
    from doc_parser_spark.pdf import textengine as te

    f = te.parse_font(
        b"<</Type/Font/Subtype/TrueType/BaseFont/AAAAAH+SymbolMT"
        b"/Encoding/MacRomanEncoding/FirstChar 165/LastChar 165"
        b"/Widths[460]>>",
        {}, {}, cmap_cls=None,
    )
    assert f._uni(0xA5) == "∞"
    assert f._uni(0xB7) == "•"
    assert f._uni(0x44) == "Δ"


def test_glyph_bullets_kept_in_list_item_text():
    # reference goldens keep symbol/unmapped-glyph markers verbatim
    # ('- ∞ IBM MT/ST ...', '- rGLYPH<...> Database ...'); dash/enum
    # markers still strip
    from doc_parser_spark.pdf import labels

    items = labels.split_list_items(
        ["∞ first item", "∞ second item"]
    )
    assert items == [("∞ first item", False), ("∞ second item", False)]
    items = labels.split_list_items(
        [
            "rGLYPH<c=1,font=/NKDKKL+JansonTextLTStd-Roman> Database work",
            "rGLYPH<c=1,font=/NKDKKL+JansonTextLTStd-Roman> Advanced SQL",
        ]
    )
    assert items is not None and items[0][0].startswith("rGLYPH<")
    items = labels.split_list_items(["- plain dash", "- another"])
    assert items == [("plain dash", False), ("another", False)]
