"""BOK JSON structured mapping (reference bok_json_backend.py:26-1059):
labeled text/table/picture items per page instead of string-leaf soup."""

import json

from doc_parser_spark.core import model
from doc_parser_spark.core.bok_backend import extract_bok_json


def _payload(contents, page=1):
    return json.dumps(
        {"body": [{"page": page, "contents": contents}]}, ensure_ascii=False
    ).encode()


def _cell(*blocks, **spans):
    return {"contents": list(blocks), **spans}


def _text(s):
    return {"type": "text", "content": s}


def test_text_and_image_blocks():
    doc = extract_bok_json(_payload([
        _text("첫 문단"), {"type": "image", "content": "img/a.png"},
        _text("둘째 문단"),
    ]))
    items = [(n.label, n.text) for n, _ in doc.iterate_items()]
    assert items == [
        (model.TEXT, "첫 문단"), (model.PICTURE, ""), (model.TEXT, "둘째 문단"),
    ]


def test_simple_table_preserved_with_spans():
    table = [
        {"cells": [_cell(_text("h1")), _cell(_text("h2"), colSpan=2)]},
        {"cells": [_cell(_text("a")), _cell(_text("b")), _cell(_text("c"))]},
    ]
    doc = extract_bok_json(_payload([{"type": "table", "content": table}]))
    t = doc.tables()[0].table
    assert (t.num_rows, t.num_cols) == (2, 3)
    assert t.grid == [["h1", "h2", "h2"], ["a", "b", "c"]]
    assert t.cells[1].col_span == 2
    assert t.cells[0].column_header


def test_table_with_image_flattens_column_major():
    table = [
        {"cells": [
            _cell(_text("A1"), {"type": "image", "content": "x.png"}),
            _cell(_text("B1")),
        ]},
        {"cells": [_cell(_text("A2")), _cell(_text("B2"))]},
    ]
    doc = extract_bok_json(_payload([{"type": "table", "content": table}]))
    # picture first, then COLUMN-major reading order: A1, A2, B1, B2
    labels = [n.label for n, _ in doc.iterate_items()]
    assert labels[0] == model.PICTURE
    texts = [n.text for n, _ in doc.iterate_items() if n.label == model.TEXT]
    assert texts == ["A1", "A2", "B1", "B2"]
    # one unspecified group per cell
    groups = [
        n for n, _ in doc.iterate_items(with_groups=True)
        if n.label == model.GROUP_UNSPECIFIED
    ]
    assert len(groups) == 4
    assert groups[0].name == "cell_page_1_r0_c0"


def test_nested_leaf_table_preserved_under_cell_group():
    inner = [{"cells": [_cell(_text("x")), _cell(_text("y"))]}]
    outer = [
        {"cells": [
            _cell(_text("intro"), {"type": "table", "content": inner}),
        ]},
    ]
    doc = extract_bok_json(_payload([{"type": "table", "content": outer}]))
    # outer flattens (nested table present); inner is a leaf data table
    tables = doc.tables()
    assert len(tables) == 1
    assert tables[0].table.grid == [["x", "y"]]
    # the preserved table nests under the cell group
    assert doc.nodes[tables[0].parent].label == model.GROUP_UNSPECIFIED
    texts = [n.text for n, _ in doc.iterate_items() if n.label == model.TEXT]
    assert texts == ["intro"]


def test_cell_text_includes_image_placeholder():
    table = [{"cells": [_cell(_text("txt"))]}]
    # simple table with image placeholder INSIDE a preserved table cell
    table[0]["cells"][0]["contents"].append(_text(None))
    doc = extract_bok_json(_payload([{"type": "table", "content": table}]))
    assert doc.tables()  # still a table (no image/nested table)


def test_duplicate_tables_dropped():
    table = [{"cells": [_cell(_text("only"))]}]
    doc = extract_bok_json(_payload([
        {"type": "table", "content": table},
        {"type": "table", "content": json.loads(json.dumps(table))},
    ]))
    assert len(doc.tables()) == 1


def test_non_bok_json_returns_empty():
    assert not extract_bok_json(b'{"foo": "bar"}').nodes[1:]
    assert not extract_bok_json(b"not json").nodes[1:]
