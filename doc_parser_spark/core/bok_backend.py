"""BOK JSON backend — the fork's registered default JSON format.

From-scratch reimplementation of the reference's structured mapping
(``docling/backend/json/bok_json_backend.py:26-1059``; registered as the
default JSON backend at ``document_converter.py:211-213``). The input is
``{"body": [{"page": N, "contents": [...]}]}`` where content blocks are
``{"type": "text"|"image"|"picture"|"table", "content": ...}`` and tables
are ``[{"cells": [{"rowSpan", "colSpan", "contents": [...]}]}]``.

Behavioural contract:

* text blocks → TEXT items; image/picture blocks → picture items
* simple tables (no nested tables, no images) are PRESERVED as TableData:
  col-span-aware width, cell text = space-joined text contents with
  ``[이미지: path]`` placeholders, first row = column header
* tables containing images or nested tables are FLATTENED: pictures
  surface first, then cells walk in COLUMN-major reading order, one
  ``unspecified`` group per cell (``cell_page_{page}_r{r}_c{c}``);
  nested leaf data tables are preserved under their cell group, deeper
  nesting recurses
* duplicate content blocks / tables are dropped via fingerprints
"""

from __future__ import annotations

import json
from typing import Optional

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document


def _is_data_table(table_content) -> bool:
    if not table_content:
        return False
    num_rows = len(table_content)
    max_cols = max(
        (len(row.get("cells", [])) for row in table_content
         if isinstance(row, dict)),
        default=0,
    )
    return num_rows >= 1 and max_cols >= 1


def _has_nested_tables(table_content) -> bool:
    for row in table_content:
        if not isinstance(row, dict):
            continue
        for cell in row.get("cells", []):
            if not isinstance(cell, dict):
                continue
            for content in cell.get("contents", []):
                if isinstance(content, dict) and content.get("type") == "table":
                    return True
    return False


def _has_images(table_content) -> bool:
    for row in table_content:
        if not isinstance(row, dict):
            continue
        for cell in row.get("cells", []):
            if not isinstance(cell, dict):
                continue
            for content in cell.get("contents", []):
                if isinstance(content, dict) and content.get("type") in (
                    "image", "picture"
                ):
                    return True
    return False


def _table_fingerprint(table_content) -> str:
    parts = [f"size_{len(table_content)}"]
    for row in table_content[:3]:
        if isinstance(row, dict):
            for cell in row.get("cells", [])[:3]:
                if isinstance(cell, dict):
                    for content in cell.get("contents", [])[:1]:
                        if isinstance(content, dict):
                            parts.append(str(content.get("content"))[:30])
    return "tbl_" + "|".join(parts)


def _convert_table(table_content) -> Optional[model.TableData]:
    """Reference ``_convert_to_table_data`` (:779-854)."""
    if not table_content:
        return None
    num_rows = len(table_content)
    num_cols = 0
    for row in table_content:
        if isinstance(row, dict) and "cells" in row:
            cols = sum(
                cell.get("colSpan", 1)
                for cell in row["cells"]
                if isinstance(cell, dict)
            )
            num_cols = max(num_cols, cols)
    if num_rows == 0 or num_cols == 0:
        return None
    data = model.TableData(num_rows=num_rows, num_cols=num_cols)
    grid: list[list[Optional[str]]] = [[None] * num_cols for _ in range(num_rows)]
    for row_idx, row in enumerate(table_content):
        if not (isinstance(row, dict) and "cells" in row):
            continue
        col_idx = 0
        for cell in row["cells"]:
            if not isinstance(cell, dict):
                continue
            text_parts = []
            for content in cell.get("contents", []):
                if not isinstance(content, dict):
                    continue
                if content.get("type") == "text":
                    if content.get("content") is not None:
                        text_parts.append(str(content["content"]))
                elif content.get("type") in ("image", "picture"):
                    if content.get("content"):
                        text_parts.append(f"[이미지: {content['content']}]")
            cell_text = " ".join(text_parts)
            row_span = cell.get("rowSpan", 1)
            col_span = cell.get("colSpan", 1)
            data.cells.append(
                model.TableCellData(
                    text=cell_text, row_span=row_span, col_span=col_span,
                    start_row=row_idx, end_row=row_idx + row_span,
                    start_col=col_idx, end_col=col_idx + col_span,
                    column_header=(row_idx == 0),
                )
            )
            for rr in range(row_idx, min(row_idx + row_span, num_rows)):
                for cc in range(col_idx, min(col_idx + col_span, num_cols)):
                    grid[rr][cc] = cell_text
            col_idx += col_span
    data.grid = grid
    return data


class _BokConverter:
    def __init__(self) -> None:
        self.doc = Document()
        self.processed: set[str] = set()

    def convert(self, payload: dict) -> Document:
        for page in payload.get("body", []):
            if not isinstance(page, dict):
                continue
            page_no = page.get("page", 1)
            self._process_contents(page_no, page.get("contents", []))
        return self.doc

    def _process_contents(self, page_no: int, contents) -> None:
        for idx, block in enumerate(contents):
            if not isinstance(block, dict):
                continue
            content_id = f"{block.get('type')}_{page_no}_{idx}_{str(block.get('content'))[:50]}"
            if content_id in self.processed:
                continue
            self.processed.add(content_id)
            ctype = block.get("type")
            if ctype == "text":
                if block.get("content") is not None:
                    self.doc.add_text(
                        label=model.TEXT, text=str(block["content"]),
                        page_no=page_no,
                    )
            elif ctype in ("image", "picture"):
                if block.get("content"):
                    self.doc.add_picture(page_no=page_no)
            elif ctype == "table":
                table_content = block.get("content", [])
                if table_content:
                    self._process_table(page_no, table_content)

    def _process_table(self, page_no: int, table_content) -> None:
        flatten = _has_images(table_content) or _has_nested_tables(table_content)
        if not flatten:
            if _is_data_table(table_content):
                fp = _table_fingerprint(table_content)
                if fp in self.processed:
                    return
                self.processed.add(fp)
                data = _convert_table(table_content)
                if data is not None:
                    self.doc.add_table(data=data, page_no=page_no)
            else:
                self._flatten_table(page_no, table_content)
            return
        self._flatten_table(page_no, table_content)

    def _flatten_table(self, page_no: int, table_content) -> None:
        """Column-major reading-order expansion (reference :303-360)."""
        if not table_content:
            return
        if _has_images(table_content):
            for row in table_content:
                if not isinstance(row, dict):
                    continue
                for cell in row.get("cells", []):
                    if not isinstance(cell, dict):
                        continue
                    for content in cell.get("contents", []):
                        if isinstance(content, dict) and content.get("type") in (
                            "image", "picture"
                        ) and content.get("content"):
                            self.doc.add_picture(page_no=page_no)

        cell_matrix: dict[tuple[int, int], dict] = {}
        max_rows = len(table_content)
        max_cols = 0
        for row_idx, row in enumerate(table_content):
            if not (isinstance(row, dict) and "cells" in row):
                continue
            current_col = 0
            for cell_data in row["cells"]:
                if not isinstance(cell_data, dict):
                    continue
                while (row_idx, current_col) in cell_matrix:
                    current_col += 1
                row_span = cell_data.get("rowSpan", 1)
                col_span = cell_data.get("colSpan", 1)
                for r_off in range(row_span):
                    for c_off in range(col_span):
                        r, c = row_idx + r_off, current_col + c_off
                        if r < max_rows:
                            cell_matrix[(r, c)] = {
                                "cell": cell_data,
                                "origin": (r_off == 0 and c_off == 0),
                                "pos": (row_idx, current_col),
                            }
                current_col += col_span
                max_cols = max(max_cols, current_col)

        table_ids: set[str] = set()
        for col in range(max_cols):
            for row in range(max_rows):
                info = cell_matrix.get((row, col))
                if info is None or not info["origin"]:
                    continue
                pos = f"r{info['pos'][0]}_c{info['pos'][1]}"
                group = self.doc.add_group(
                    name=f"cell_page_{page_no}_{pos}",
                    label=model.GROUP_UNSPECIFIED,
                )
                self._add_cell_contents(page_no, info["cell"], pos, group, table_ids)

    def _add_cell_contents(
        self, page_no: int, cell_data: dict, cell_pos: str,
        parent: model.Node, table_ids: set,
    ) -> None:
        for idx, block in enumerate(cell_data.get("contents", [])):
            if not isinstance(block, dict):
                continue
            content_id = (
                f"pg{page_no}_{cell_pos}_idx{idx}_{str(block.get('content'))[:50]}"
            )
            if content_id in self.processed:
                continue
            self.processed.add(content_id)
            ctype = block.get("type")
            if ctype == "text":
                if block.get("content") is not None:
                    text = str(block["content"]).strip()
                    if text:
                        self.doc.add_text(
                            label=model.TEXT, text=text, parent=parent,
                            page_no=page_no,
                        )
            elif ctype in ("image", "picture"):
                if block.get("content"):
                    self.doc.add_picture(page_no=page_no)
            elif ctype == "table":
                nested = block.get("content", [])
                if not nested:
                    continue
                fp = _table_fingerprint(nested)
                if fp in self.processed:
                    continue
                if _is_data_table(nested) and not _has_nested_tables(nested):
                    data = _convert_table(nested)
                    if data is not None:
                        self.processed.add(fp)
                        self.doc.add_table(
                            data=data, parent=parent, page_no=page_no
                        )
                else:
                    self._flatten_table(page_no, nested)


def looks_like_bok(payload: dict) -> bool:
    """The reference's validity gate: a top-level ``body`` list
    (bok_json_backend.py:64-66)."""
    return isinstance(payload, dict) and isinstance(payload.get("body"), list)


def extract_bok_json(data: bytes) -> Document:
    """BOK JSON bytes → structured Document."""
    try:
        payload = json.loads(data.decode("utf-8", errors="replace"))
    except json.JSONDecodeError:
        return Document()
    if not looks_like_bok(payload):
        return Document()
    return _BokConverter().convert(payload)
