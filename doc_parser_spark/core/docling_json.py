"""DoclingDocument-schema JSON export (reference-parity sink).

The reference pipeline serializes converted documents with docling-core's
``DoclingDocument.save_as_json`` / ``export_to_dict`` (used by
``tests/verify_utils.py:483-496`` with ``json.dump(..., ensure_ascii=False,
indent=2)`` and no trailing newline); its committed groundtruth corpus
(``tests/data/groundtruth/docling_v2/*.json``, schema version 1.5.0) is the
byte-level contract this module reproduces from our flat-node model.

Format facts reverse-engineered from the 53 v1.5.0 groundtruth files (never
from docling-core source, which is not vendored in the reference):

* top-level key order: schema_name, version, name, origin, furniture, body,
  groups, texts, pictures, tables, key_value_items, form_items, pages
* ``origin.binary_hash`` is the sha256 of the input bytes reduced to a
  uint64: ``int(hexdigest, 16) % 2**64`` (verified against every fixture)
* bucket arrays hold items in creation order; refs are ``#/texts/N`` etc.;
  the body root serializes as ``#/body`` (label "unspecified", name
  "_root_") and a constant empty ``#/furniture`` twin — furniture-layer
  items stay in the body tree with ``content_layer: "furniture"``
* per-label key orders are fixed (e.g. ``section_header`` appends ``level``;
  ``list_item`` appends ``enumerated``/``marker`` after an optional
  ``formatting``); ``formatting`` / ``hyperlink`` / ``image`` keys are
  emitted only when the backend recorded them
* table ``data`` is ``{table_cells, num_rows, num_cols, grid}`` where grid
  repeats the spanning cell object over every covered position and fills
  uncovered positions with synthesized empty cells
* prov entries are ``{page_no, bbox{l,t,r,b,coord_origin}, charspan}``
  (PPTX: EMU coordinates, BOTTOMLEFT origin; XLSX: cell-index boxes,
  TOPLEFT)
"""

from __future__ import annotations

import hashlib
import json
from typing import Optional

from . import model
from .model import Document, Node, TableData

# our group-label vocabulary -> docling-core GroupLabel serialization
# (ordered lists serialize with label "list", name "ordered list [start N]")
_GROUP_LABEL_OUT = {
    model.GROUP_ORDERED_LIST: "list",
}

_TEXTISH = {
    model.TITLE,
    model.SECTION_HEADER,
    model.TEXT,
    model.PARAGRAPH,
    model.FORMULA,
    model.CODE,
    model.LIST_ITEM,
    model.CAPTION,
    model.FOOTNOTE,
    model.PAGE_HEADER,
    model.PAGE_FOOTER,
}


def binary_hash(data: bytes) -> int:
    """uint64 reduction of the sha256 file hash (groundtruth-verified)."""
    return int(hashlib.sha256(data).hexdigest(), 16) % (1 << 64)


def _bucket(node: Node) -> str:
    if node.is_group:
        return "groups"
    if node.label == model.TABLE:
        return "tables"
    if node.label == model.PICTURE:
        return "pictures"
    if node.label in _TEXTISH:
        return "texts"
    raise ValueError(f"unbucketable label {node.label!r}")


def _cell_dict(cell) -> dict:
    return {
        "row_span": cell.row_span,
        "col_span": cell.col_span,
        "start_row_offset_idx": cell.start_row,
        "end_row_offset_idx": cell.end_row,
        "start_col_offset_idx": cell.start_col,
        "end_col_offset_idx": cell.end_col,
        "text": cell.text,
        "column_header": cell.column_header,
        "row_header": cell.row_header,
        "row_section": getattr(cell, "row_section", False),
    }


def _table_data_dict(data: TableData) -> dict:
    cells = [_cell_dict(c) for c in data.cells]
    # grid: spanning cell object repeated over covered positions; gaps get
    # synthesized empty single-span cells addressed at their own position
    grid: list[list[Optional[dict]]] = [
        [None] * data.num_cols for _ in range(data.num_rows)
    ]
    for cd in cells:
        for r in range(cd["start_row_offset_idx"], cd["end_row_offset_idx"]):
            for c in range(cd["start_col_offset_idx"], cd["end_col_offset_idx"]):
                if 0 <= r < data.num_rows and 0 <= c < data.num_cols:
                    if grid[r][c] is None:
                        grid[r][c] = cd
    for r in range(data.num_rows):
        for c in range(data.num_cols):
            if grid[r][c] is None:
                grid[r][c] = {
                    "row_span": 1,
                    "col_span": 1,
                    "start_row_offset_idx": r,
                    "end_row_offset_idx": r + 1,
                    "start_col_offset_idx": c,
                    "end_col_offset_idx": c + 1,
                    "text": "",
                    "column_header": False,
                    "row_header": False,
                    "row_section": False,
                }
    return {
        "table_cells": cells,
        "num_rows": data.num_rows,
        "num_cols": data.num_cols,
        "grid": grid,
    }


def _prov_list(node: Node) -> list:
    if node.charspan is None:
        return []
    l, t, r, b = node.bbox if node.bbox is not None else (0.0, 0.0, 0.0, 0.0)
    return [
        {
            "page_no": node.page_no,
            "bbox": {
                "l": l,
                "t": t,
                "r": r,
                "b": b,
                "coord_origin": node.coord_origin,
            },
            "charspan": list(node.charspan),
        }
    ]


def export_docling_dict(
    doc: Document,
    *,
    name: str,
    filename: str,
    mimetype: str,
    binary_hash: int,
    version: str = "1.5.0",
) -> dict:
    """Serialize ``doc`` as a DoclingDocument-schema dict (v1.5.0 shape)."""
    # ref assignment: creation order per bucket; the body root is #/body
    ref_of: dict[int, str] = {}
    counters: dict[str, int] = {}
    ordered: dict[str, list[Node]] = {"groups": [], "texts": [], "pictures": [], "tables": []}
    for node in doc.nodes:
        if node is doc.root:
            ref_of[node.index] = "#/body"
            continue
        bucket = _bucket(node)
        i = counters.get(bucket, 0)
        counters[bucket] = i + 1
        ref_of[node.index] = f"#/{bucket}/{i}"
        ordered[bucket].append(node)

    def ref(idx: Optional[int]) -> dict:
        return {"$ref": ref_of[idx]}

    def head(node: Node) -> dict:
        return {
            "self_ref": ref_of[node.index],
            "parent": ref(node.parent if node.parent is not None else doc.root.index),
            "children": [ref(c) for c in node.children],
            "content_layer": node.content_layer,
        }

    def group_dict(node: Node) -> dict:
        d = head(node)
        d["name"] = node.name or "group"
        d["label"] = _GROUP_LABEL_OUT.get(node.label, node.label)
        return d

    def formatting_dict(node: Node) -> dict:
        return {
            "bold": node.bold,
            "italic": node.italic,
            "underline": node.underline,
            "strikethrough": node.strikethrough,
            "script": node.script,
        }

    def text_dict(node: Node) -> dict:
        d = head(node)
        d["label"] = node.label
        d["prov"] = _prov_list(node)
        d["orig"] = node.orig if node.orig is not None else node.text
        d["text"] = node.text
        if node.label == model.SECTION_HEADER:
            if node.has_formatting:
                d["formatting"] = formatting_dict(node)
            d["level"] = node.level
        elif node.label == model.LIST_ITEM:
            if node.has_formatting:
                d["formatting"] = formatting_dict(node)
            d["enumerated"] = node.enumerated
            d["marker"] = node.marker
        elif node.label == model.CODE:
            if node.has_formatting:  # TextItem declares formatting after text
                d["formatting"] = formatting_dict(node)
            d["captions"] = []
            d["references"] = []
            d["footnotes"] = []
            d["code_language"] = "unknown"
        else:
            if node.has_formatting:
                d["formatting"] = formatting_dict(node)
            if node.hyperlink:
                d["hyperlink"] = node.hyperlink
        return d

    def picture_dict(node: Node) -> dict:
        d = head(node)
        d["label"] = node.label
        d["prov"] = _prov_list(node)
        d["captions"] = [] if node.caption_ref is None else [ref(node.caption_ref)]
        d["references"] = []
        d["footnotes"] = []
        if node.image_meta is not None:
            d["image"] = node.image_meta
        d["annotations"] = []
        return d

    def table_dict(node: Node) -> dict:
        d = head(node)
        d["label"] = node.label
        d["prov"] = _prov_list(node)
        d["captions"] = [] if node.caption_ref is None else [ref(node.caption_ref)]
        d["references"] = []
        d["footnotes"] = []
        d["data"] = _table_data_dict(node.table or TableData())
        d["annotations"] = []
        return d

    pages = {
        str(no): {"size": {"width": float(w), "height": float(h)}, "page_no": no}
        for no, (w, h) in sorted(doc.page_sizes.items())
    }

    return {
        "schema_name": "DoclingDocument",
        "version": version,
        "name": name,
        "origin": {
            "mimetype": mimetype,
            "binary_hash": binary_hash,
            "filename": filename,
        },
        "furniture": {
            "self_ref": "#/furniture",
            "children": [],
            "content_layer": "furniture",
            "name": "_root_",
            "label": "unspecified",
        },
        "body": {
            "self_ref": "#/body",
            "children": [ref(c) for c in doc.root.children],
            "content_layer": "body",
            "name": "_root_",
            "label": "unspecified",
        },
        "groups": [group_dict(n) for n in ordered["groups"]],
        "texts": [text_dict(n) for n in ordered["texts"]],
        "pictures": [picture_dict(n) for n in ordered["pictures"]],
        "tables": [table_dict(n) for n in ordered["tables"]],
        "key_value_items": [],
        "form_items": [],
        "pages": pages,
    }


def export_docling_json(
    doc: Document,
    *,
    name: str,
    filename: str,
    mimetype: str,
    data: Optional[bytes] = None,
    binary_hash_value: Optional[int] = None,
    ensure_ascii: bool = False,
) -> str:
    """Byte-exact twin of the reference's JSON groundtruth writers, no
    trailing newline. Two writers exist with different escaping:
    ``tests/verify_utils.py:490`` (``ensure_ascii=False`` — HTML/CSV/Office
    groundtruth) and docling-core ``save_as_json`` (default
    ``ensure_ascii=True`` — the USPTO suite, ``test_backend_patent_uspto
    .py:27``)."""
    if binary_hash_value is None:
        binary_hash_value = binary_hash(data or b"")
    d = export_docling_dict(
        doc,
        name=name,
        filename=filename,
        mimetype=mimetype,
        binary_hash=binary_hash_value,
    )
    return json.dumps(d, ensure_ascii=ensure_ascii, indent=2)


def export_docling_yaml(
    doc: Document,
    *,
    name: str,
    filename: str,
    mimetype: str,
    data: Optional[bytes] = None,
) -> str:
    """Byte-exact twin of docling-core ``save_as_yaml`` (pyyaml safe_dump of
    the exported dict, block style, keys sorted; the reference round-trips
    through JSON first, so spanning grid cells lose their object identity
    and no YAML anchors are emitted). Pinned by the committed
    ``inline_and_formatting.md.yaml`` groundtruth."""
    import yaml

    d = export_docling_dict(
        doc,
        name=name,
        filename=filename,
        mimetype=mimetype,
        binary_hash=binary_hash(data or b""),
    )
    return yaml.safe_dump(
        json.loads(json.dumps(d)),
        default_flow_style=False,
        sort_keys=True,
        allow_unicode=True,
    )
