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


# --- encoding-hostile payload fuzz ----------------------------------------
#
# parse_html now routes bytes through the WHATWG charset sniffer; these
# properties drive the SHIPPED per-document extraction path
# (convert_payload -> extract_html -> exports) over byte payloads with
# randomized/hostile encoding declarations and mixed-validity bytes,
# asserting the per-document contract: never raises, always yields a
# Document whose exports are strings.

_codec = st.sampled_from(
    ["utf-8", "shift_jis", "euc-kr", "gbk", "windows-1251", "windows-1252"]
)
_decl = st.sampled_from(
    ["", "<meta charset='{c}'>", "<meta charset='utf-8'>",
     '<meta http-equiv="Content-Type" content="text/html; charset={c}">',
     "<meta charset='no-such-codec'>",
     '<meta name="x" content="charset={c}">']  # inert: not a declaration
)
_body_text = st.sampled_from(
    ["plain ascii", "café — naïve", "日本語テキスト", "한국어 텍스트",
     "中文网页内容", "русский текст", "mixed 日本 café"]
)


@settings(max_examples=150, deadline=None)
@given(
    codec=_codec, decl=_decl, body=_body_text,
    junk=st.binary(max_size=8),
    bom=st.booleans(),
)
def test_full_extraction_survives_hostile_encodings(codec, decl, body, junk, bom):
    from doc_parser_spark.core.serialize import export_markdown, export_text
    from doc_parser_spark.operators.extract import convert_payload

    html = f"<html><head>{decl.format(c=codec)}</head><body><h1>T</h1><p>{body}</p></body></html>"
    try:
        data = html.encode(codec)
    except UnicodeEncodeError:
        return  # body not representable in this codec — not a valid page
    # splice junk bytes mid-document (declared-encoding violations) and
    # optionally a UTF-8 BOM that contradicts the declaration
    data = (b"\xef\xbb\xbf" if bom else b"") + data[:40] + junk + data[40:]
    doc, fmt, _fb = convert_payload(data)
    assert fmt == "html"
    assert isinstance(export_text(doc), str)
    assert isinstance(export_markdown(doc), str)


@settings(max_examples=100, deadline=None)
@given(codec=_codec, body=_body_text)
def test_declared_pages_round_trip_their_text(codec, body):
    # a WELL-FORMED declared page must surface its body text intact
    from doc_parser_spark.core.serialize import export_text
    from doc_parser_spark.operators.extract import convert_payload

    html = (f"<html><head><meta charset='{codec}'></head>"
            f"<body><p>{body}</p></body></html>")
    try:
        data = html.encode(codec)
    except UnicodeEncodeError:
        return
    doc, _fmt, _fb = convert_payload(data)
    assert body in export_text(doc)
