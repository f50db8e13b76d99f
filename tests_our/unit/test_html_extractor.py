"""Unit tests for the HTML extraction path (SURVEY.md §2.2, Op-8..17).

Each test pins one behaviour of the reference backend
(docling/backend/html_backend.py) as re-expressed by
doc_parser_spark.html.extractor.
"""

import pytest

from doc_parser_spark.core import model
from doc_parser_spark.core.serialize import export_markdown, export_text, flatten_spans
from doc_parser_spark.html.extractor import extract_html

pytestmark = pytest.mark.unit


def labels(doc, layers=(model.BODY, model.FURNITURE)):
    return [(n.label, n.text) for n, _ in doc.iterate_items(layers=layers)]


def test_furniture_before_first_heading():
    # html_backend.py:127-131: content before the first h1..h6 is FURNITURE
    doc = extract_html(
        b"<html><body><p>boilerplate nav</p><h1>Title</h1><p>body text</p></body></html>"
    )
    layer_by_text = {
        n.text: n.content_layer
        for n, _ in doc.iterate_items(layers=(model.BODY, model.FURNITURE))
    }
    assert layer_by_text["boilerplate nav"] == model.FURNITURE
    assert layer_by_text["Title"] == model.BODY
    assert layer_by_text["body text"] == model.BODY
    # main-content text export drops furniture
    assert "boilerplate" not in export_text(doc)


def test_no_heading_means_all_body():
    doc = extract_html(b"<html><body><p>just text</p></body></html>")
    assert export_text(doc) == "just text"


def test_heading_hierarchy_and_skipped_levels():
    # html_backend.py:233-275: h1 → TITLE; skipped levels synthesize groups
    doc = extract_html(
        b"<html><body><h1>T</h1><h3>Deep</h3><p>x</p><h2>Back</h2></body></html>"
    )
    items = labels(doc)
    assert items[0] == (model.TITLE, "T")
    assert (model.SECTION_HEADER, "Deep") in items
    deep = next(n for n, _ in doc.iterate_items() if n.text == "Deep")
    assert deep.level == 2  # hlevel - 1
    back = next(n for n, _ in doc.iterate_items() if n.text == "Back")
    assert back.level == 1
    # the synthesized invisible group for the skipped h2 level exists
    groups = [n for n in doc.nodes if n.is_group and n.name.startswith("header-")]
    assert len(groups) == 1 and groups[0].name == "header-2"


def test_h1_resets_parents():
    doc = extract_html(
        b"<html><body><h1>A</h1><h2>A1</h2><h1>B</h1><p>under b</p></body></html>"
    )
    under_b = next(n for n, _ in doc.iterate_items() if n.text == "under b")
    parent = doc.nodes[under_b.parent]
    assert parent.label == model.TITLE and parent.text == "B"


def test_br_becomes_newline():
    # html_backend.py:124-125
    doc = extract_html(b"<html><body><p>line one<br>line two</p></body></html>")
    assert export_text(doc) == "line one\nline two"


def test_inline_tags_joined_without_space():
    # bs4 .text semantics: descendant strings joined with no separator
    doc = extract_html(b"<html><body><p>a<b>b</b>c</p></body></html>")
    assert export_text(doc) == "abc"


def test_floating_text_in_div():
    # html_backend.py:152-171: NavigableString runs inside <div> flushed as
    # TEXT when followed by a node-item tag (or at end); non-div floats dropped
    doc = extract_html(
        b"<html><body><div>floating<p>para</p></div><span>dropped</span></body></html>"
    )
    texts = [t for _, t in labels(doc)]
    assert "floating" in texts and "para" in texts
    assert "dropped" not in texts


def test_unordered_and_ordered_lists_with_start():
    # html_backend.py:302-380
    doc = extract_html(
        b'<html><body><ul><li>u1</li></ul><ol start="42"><li>a</li><li>b</li></ol></body></html>'
    )
    lis = [n for n, _ in doc.iterate_items() if n.label == model.LIST_ITEM]
    assert [li.text for li in lis] == ["u1", "a", "b"]
    assert [li.marker for li in lis] == ["", "42.", "43."]
    assert [li.enumerated for li in lis] == [False, True, True]
    assert "42. a" in export_text(doc)


def test_ordered_list_without_start_has_no_marker():
    # marker only when the start attribute exists (html_backend.py:340-343)
    doc = extract_html(b"<html><body><ol><li>a</li></ol></body></html>")
    li = next(n for n, _ in doc.iterate_items() if n.label == model.LIST_ITEM)
    assert li.marker == "" and li.enumerated


def test_nested_list_flattens_parent_text():
    # html_backend.py:345-367: li containing a nested list flattens its text
    doc = extract_html(
        b"<html><body><ul><li>outer\n  text<ul><li>inner</li></ul></li></ul></body></html>"
    )
    lis = [n.text for n, _ in doc.iterate_items() if n.label == model.LIST_ITEM]
    assert lis == ["outer text", "inner"]


def test_table_grid_with_spans():
    # html_backend.py:382-496
    doc = extract_html(
        b"<html><body><table>"
        b"<tr><th>A</th><th>B</th><th>C</th></tr>"
        b'<tr><td rowspan="2">x</td><td colspan="2">y</td></tr>'
        b"<tr><td>z</td><td>w</td></tr>"
        b"</table></body></html>"
    )
    table = doc.tables()[0].table
    assert table.num_rows == 3 and table.num_cols == 3
    assert table.grid[0] == ["A", "B", "C"]
    assert table.grid[1] == ["x", "y", "y"]
    assert table.grid[2] == ["x", "z", "w"]
    headers = [c for c in table.cells if c.column_header]
    assert [c.text for c in headers] == ["A", "B", "C"]


def test_nested_table_skipped():
    # html_backend.py:384-387
    doc = extract_html(
        b"<html><body><table><tr><td><table><tr><td>inner</td></tr></table></td></tr></table></body></html>"
    )
    assert doc.tables() == []


def test_table_inline_formula():
    # html_backend.py:448-453
    doc = extract_html(
        b"<html><body><table><tr><td><inline-formula>alt $$x^2$$ tail</inline-formula></td></tr></table></body></html>"
    )
    table = doc.tables()[0].table
    assert table.cells[0].text == "$$x^2$$"


def test_figure_with_caption_and_bare_img():
    # html_backend.py:540-577
    doc = extract_html(
        b"<html><body><figure><img src='x.png'><figcaption>Fig 1</figcaption></figure>"
        b"<img src='y.png'></body></html>"
    )
    pics = [n for n, _ in doc.iterate_items() if n.label == model.PICTURE]
    assert len(pics) == 2
    captions = [n for n, _ in doc.iterate_items() if n.label == model.CAPTION]
    assert captions[0].text == "Fig 1"
    assert pics[0].caption_ref == captions[0].index
    assert pics[1].caption_ref is None


def test_details_summary():
    # html_backend.py:218-231: details → section group; summary → paragraph
    doc = extract_html(
        b"<html><body><details><summary>More</summary><p>hidden</p></details></body></html>"
    )
    texts = [t for _, t in labels(doc)]
    assert texts == ["More", "hidden"]
    groups = [n for n in doc.nodes if n.is_group and n.name == "details"]
    assert len(groups) == 1


def test_pre_code_block():
    # html_backend.py:277-287
    doc = extract_html(b"<html><body><pre>x = 1\n  y = 2</pre></body></html>")
    code = next(n for n, _ in doc.iterate_items() if n.label == model.CODE)
    assert code.text == "x = 1\n  y = 2"
    assert "```" in export_markdown(doc)


def test_script_style_excluded():
    doc = extract_html(
        b"<html><body><div><script>var x=1;</script>visible</div>"
        b"<style>.a{}</style><p>para</p></body></html>"
    )
    text = export_text(doc, layers=(model.BODY, model.FURNITURE))
    assert "var x" not in text and ".a{}" not in text
    assert "visible" in text and "para" in text


def test_entity_decoding():
    doc = extract_html(b"<html><body><p>a &amp; b &lt;c&gt; &#8212; d</p></body></html>")
    assert export_text(doc) == "a & b <c> — d"


def test_spans_are_ordered_and_refd():
    doc = extract_html(b"<html><body><h1>T</h1><p>p1</p><p>p2</p></body></html>")
    spans = flatten_spans(doc)
    item_spans = [s for s in spans if s["kind"] == "item"]
    assert [s["label"] for s in item_spans] == ["title", "text", "text"]
    assert item_spans[1]["parent_ref"] == item_spans[0]["self_ref"]


def test_malformed_html_does_not_crash():
    doc = extract_html(b"<html><body><p>unclosed<div><b>bold</p></div>")
    assert "unclosed" in export_text(doc, layers=(model.BODY, model.FURNITURE))


def test_exotic_numeric_attrs_do_not_fail_document():
    """isnumeric() superset ('²', '½') crashes int() in the reference
    (html_backend.py:308/402); isdecimal keeps the document alive."""
    from doc_parser_spark.html.extractor import extract_html

    html = (
        "<html><body>"
        '<ol start="²"><li>a</li><li>b</li></ol>'
        '<table><tr><td colspan="½">x</td><td>y</td></tr></table>'
        "<p>body survives</p></body></html>"
    ).encode()
    doc = extract_html(html)
    from doc_parser_spark.core.serialize import export_text

    text = export_text(doc)
    assert "body survives" in text
    assert "x" in text and "y" in text  # spans fell back to 1


def test_flat_div_floating_text_linear_behavior():
    """Many interleaved text/anchor children in one flat div: same output
    as before (suffix-flag rewrite), covering the flush conditions."""
    from doc_parser_spark.core.serialize import export_text
    from doc_parser_spark.html.extractor import extract_html

    inner = "".join(
        f"t{i} <a href='#'>l{i}</a> " for i in range(50)
    ) + "<p>para</p> tail"
    doc = extract_html(f"<html><body><div>{inner}</div></body></html>".encode())
    text = export_text(doc)
    # floating text before the <p> flushes as one text node; the tail
    # (last child, no following item tag) flushes at end-of-children
    assert "t0" in text and "t49" in text and "tail" in text
