"""Fuzz properties for the new extraction relations' kernel logic.

The Spark operators (`extract_image_refs`, `extract_spans`,
`extract_table_cells`) wrap per-document pure functions: DOM parse →
walk. These properties run that path in-process over randomized HTML
(hypothesis; mirrors the codec fuzz style, SURVEY §5) and assert the
invariants the relations promise: no crash on arbitrary tag soup,
document-order contiguous numbering, half-open non-degenerate cell
extents inside the declared grid.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from doc_parser_spark.core.serialize import flatten_spans
from doc_parser_spark.html.dom import parse_html
from doc_parser_spark.html.extractor import extract_html

pytestmark = pytest.mark.unit

_tag = st.sampled_from(
    ["div", "p", "span", "img", "figure", "figcaption", "table", "tr",
     "td", "th", "ul", "li", "a", "h1", "h2", "b"]
)
_attr = st.sampled_from(
    ['src="/x.png"', 'src="data:image/png;base64,AA"', "src=''",
     'alt=" a  b "', 'width="12"', 'width="auto"', 'height="5%"',
     'rowspan="2"', 'colspan="0"', 'colspan="-3"', 'href="/y"', ""]
)


@st.composite
def _soup(draw):
    n = draw(st.integers(min_value=0, max_value=25))
    parts = ["<html><body>"]
    for _ in range(n):
        t = draw(_tag)
        kind = draw(st.integers(min_value=0, max_value=3))
        if kind == 0:
            parts.append(f"<{t} {draw(_attr)}>")
        elif kind == 1:
            parts.append(f"</{t}>")
        elif kind == 2:
            parts.append(draw(st.text(max_size=12)))
        else:
            parts.append(f"<{t} {draw(_attr)}>{draw(st.text(max_size=8))}</{t}>")
    parts.append("</body></html>")
    return "".join(parts)


@settings(max_examples=60, deadline=None)
@given(html=_soup())
def test_image_walk_never_crashes_and_numbers_contiguously(html):
    # the SHIPPED per-document walk, not a replica
    from doc_parser_spark.operators.extract import walk_image_refs

    root = parse_html(html.encode("utf-8", "surrogatepass"))
    rows = walk_image_refs(root, "https://h.example/p", 1000)
    assert [r["img_no"] for r in rows] == list(range(len(rows)))
    for r in rows:
        assert r["src"] and not r["src"].lower().startswith("data:")
        for key in ("width", "height"):
            assert r[key] is None or r[key] >= 0


@settings(max_examples=60, deadline=None)
@given(html=_soup())
def test_span_and_table_invariants_on_tag_soup(html):
    doc = extract_html(html.encode("utf-8", "surrogatepass"))
    spans = flatten_spans(doc)
    refs = set()
    for s in spans:
        assert s["self_ref"] not in refs  # refs unique
        refs.add(s["self_ref"])
        t = s.get("table")
        if not t:
            continue
        assert t["num_rows"] >= 0 and t["num_cols"] >= 0
        for c in t["cells"]:
            # half-open, non-degenerate, inside the declared grid
            assert 0 <= c["start_row"] < c["end_row"] <= t["num_rows"]
            assert 0 <= c["start_col"] < c["end_col"] <= t["num_cols"]
            assert c["row_span"] == c["end_row"] - c["start_row"]
            assert c["col_span"] == c["end_col"] - c["start_col"]
