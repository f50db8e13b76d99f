"""Free-form / magazine reading order (r4 VERDICT directive #4).

The reference resolves these page classes with its NN reading-order
predictor (docling/models/readingorder_model.py:42-381); the
deterministic rebuild extends recursive XY-cut with two island rules
(layout.order_cells → freeform): gutter-blocker removal and side-float
extraction. Three synthetic fixtures cover the behaviors:

* A — text wrapping around a right-side pull-quote (the island shares
  y-range with narrowed body lines);
* B — a pull-quote straddling the gutter of a two-column layout (no
  clean projection cut anywhere on the page);
* C — a left-margin note beside a single-column body, plus the classic
  banded L-shape (title → columns → full-width close) as a guard that
  the pure-XY-cut path is untouched.

All fixtures are real PDFs from the deterministic writer; assertions run
the full extract_pdf pipeline, parity-test style (byte text order).
"""

import pytest

from doc_parser_spark.pdf import writer
from doc_parser_spark.pdf.extractor import extract_pdf

pytestmark = pytest.mark.unit


def _texts(doc):
    return [
        node.text
        for node, _level in doc.iterate_items()
        if getattr(node, "text", "") and node.text.strip()
    ]


def _order_of(doc, labels):
    txt = _texts(doc)
    pos = {}
    for lab in labels:
        hits = [i for i, t in enumerate(txt) if lab in t]
        assert hits, (lab, txt)
        pos[lab] = hits[0]
    return [lab for lab in sorted(labels, key=lambda v: pos[v])]


def test_wrap_around_pull_quote_reads_flow_then_island():
    # full rows, then body narrows to the left while a padded larger-font
    # quote floats right, then full rows resume
    runs = [
        (72.0, 700.0, 10.0, "body one full width row aaa"),
        (72.0, 686.0, 10.0, "body two full width row bbb"),
        (72.0, 672.0, 10.0, "body three full width row ccc"),
        (72.0, 654.0, 10.0, "narrow four left"),
        (72.0, 640.0, 10.0, "narrow five left"),
        (72.0, 626.0, 10.0, "narrow six left"),
        (340.0, 648.0, 12.0, "QUOTE alpha line"),
        (340.0, 632.0, 12.0, "QUOTE beta line"),
        (72.0, 612.0, 10.0, "body seven full width ddd"),
        (72.0, 598.0, 10.0, "body eight full width eee"),
    ]
    doc, fallback = extract_pdf(writer.write_pdf([runs]))
    assert not fallback
    labels = [
        "body one", "body two", "body three", "narrow four", "narrow five",
        "narrow six", "body seven", "body eight", "QUOTE alpha", "QUOTE beta",
    ]
    got = _order_of(doc, labels)
    # flow reads continuously; the floating quote follows it
    assert got == [
        "body one", "body two", "body three", "narrow four", "narrow five",
        "narrow six", "body seven", "body eight", "QUOTE alpha", "QUOTE beta",
    ]


def test_gutter_straddling_quote_keeps_column_order():
    # two continuous prose columns (8-word lines defeat the unruled
    # table pass); the pull-quote sits inside the gutter with 18pt of
    # whitespace on BOTH sides — below the 24.5pt projection threshold —
    # so no cut exists anywhere until island removal (freeform rule 1),
    # and the boundary it enables passes through the removed quote's
    # x-range (the straddle precondition)
    lw = ["now", "then", "soon", "late", "again", "often", "never",
          "today"]
    left = [
        (72.0, 700.0 - 14 * i, 10.0, f"left col row {c} by it so {w}")
        for i, (c, w) in enumerate(zip("abcdefgh", lw))
    ]
    right = [
        (376.5, 700.0 - 14 * i, 10.0, f"right col row {c} in an up {w}")
        for i, (c, w) in enumerate(zip("abcdefgh", reversed(lw)))
    ]
    quote = [
        (235.0, 648.0, 13.0, "STRADDLE qone extra"),
        (235.0, 630.0, 13.0, "STRADDLE qtwo extra"),
    ]
    doc, fallback = extract_pdf(writer.write_pdf([left + right + quote]))
    assert not fallback
    from doc_parser_spark.core.serialize import export_text

    txt = export_text(doc)

    def at(s):
        i = txt.find(s)
        assert i >= 0, (s, txt)
        return i

    # whole left column before right column, island last
    assert at("left col row h") < at("right col row a")
    assert at("right col row h") < at("STRADDLE qone")
    assert at("STRADDLE qone") < at("STRADDLE qtwo")
    # columns internally top-to-bottom
    for c in "abcdefg":
        assert at(f"left col row {c}") < at(f"left col row {chr(ord(c) + 1)}")
        assert at(f"right col row {c}") < at(f"right col row {chr(ord(c) + 1)}")


def test_margin_note_floats_after_body():
    from doc_parser_spark.core.serialize import export_text

    fill = ["over the hill", "by", "quiet water", "near town",
            "x", "under a tall tree"]
    body = [
        (150.0, 700.0 - 14 * i, 10.0,
         f"main body paragraph row {chr(97 + i)} {fill[i]}")
        for i in range(6)
    ]
    note = [
        (60.0, 672.0, 8.0, "MARGIN n1"),
        (60.0, 661.0, 8.0, "MARGIN n2"),
    ]
    doc, fallback = extract_pdf(writer.write_pdf([body + note]))
    assert not fallback
    txt = export_text(doc)

    def at(s):
        i = txt.find(s)
        assert i >= 0, (s, txt)
        return i

    # body flow reads first (rows in order), the margin note after it
    for c in "abcde":
        assert at(f"row {c}") < at(f"row {chr(ord(c) + 1)}")
    assert at("row f") < at("MARGIN n1") < at("MARGIN n2")


def test_banded_l_shape_still_pure_xy_cut():
    # title band → two columns → full-width close: the classic path must
    # stay intact (regression guard for the freeform fallback)
    runs = [(72.0, 740.0, 18.0, "THE TITLE BAND")]
    runs += [
        (72.0, 680.0 - 14 * i, 10.0, f"colA row {i}") for i in range(4)
    ]
    runs += [
        (320.0, 680.0 - 14 * i, 10.0, f"colB row {i}") for i in range(4)
    ]
    runs += [
        (72.0, 560.0, 10.0, "closing full width paragraph")
    ]
    doc, fallback = extract_pdf(writer.write_pdf([runs]))
    assert not fallback
    txt = _texts(doc)

    def at(s):
        hits = [i for i, t in enumerate(txt) if s in t]
        assert hits, (s, txt)
        return min(hits)

    assert at("THE TITLE BAND") < at("colA row 0")
    assert at("colA row 3") < at("colB row 0")
    assert at("colB row 3") < at("closing full width")
