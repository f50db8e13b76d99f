"""Deterministic serializers: document tree → text / markdown / flat spans.

The reference exports through docling-core's ``export_to_markdown`` /
``export_to_text`` (CLI fan-out at ``docling/cli/main.py:177-277``; the
byte-exact golden check is ``tests/verify_utils.py:500-515``). docling-core is
not available here, so these serializers define this engine's *own* frozen
export contract — deterministic, pure functions of the tree — and the golden
fixtures in ``tests_our/`` pin their output byte-for-byte.

Conventions (matching docling-core's markdown style where cheap):
* blocks joined with a blank line (``\\n\\n``), no trailing newline,
* title → ``# text``; section_header level L → ``'#' * (L + 1) + ' text'``,
* code → fenced block,
* unordered list items → ``- text`` (nested: 2-space indent per depth),
* enumerated items → explicit marker when the source ``start`` attribute
  produced one (reference: html_backend.py:340-343), else positional ``N.``,
* tables → pipe grid from the span-expanded occupancy grid,
* pictures → ``<!-- image -->`` in markdown (docling-core convention),
  omitted from plain text,
* plain-text export renders only the BODY layer — this is the "main-content
  text" of the north star; furniture (pre-heading boilerplate) is dropped.
"""

from __future__ import annotations

import unicodedata
from typing import Optional

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document, Node


def _list_item_prefix(doc: Document, node: Node) -> str:
    if node.marker:
        return node.marker + " "
    if node.enumerated:
        parent = doc.nodes[node.parent] if node.parent is not None else None
        if parent is not None:
            pos = 0
            for child_idx in parent.children:
                child = doc.nodes[child_idx]
                if child.label == model.LIST_ITEM:
                    pos += 1
                if child_idx == node.index:
                    break
            return f"{pos}. "
        return "1. "
    return "- "


def _list_depth(doc: Document, node: Node) -> int:
    depth = 0
    cur = node.parent
    while cur is not None:
        parent = doc.nodes[cur]
        if parent.label in (model.GROUP_LIST, model.GROUP_ORDERED_LIST):
            depth += 1
        cur = parent.parent
    return max(depth - 1, 0)


def _list_root(doc: Document, node: Node) -> Optional[int]:
    """Index of the OUTERMOST list-group ancestor (one rendered markdown
    block spans a whole top-level list, nested items included — reference
    list spacing in tests/data/groundtruth/docling_v2/example_0{1,3,7}.html.md)."""
    root = None
    cur = node.parent
    while cur is not None:
        parent = doc.nodes[cur]
        if parent.label in (model.GROUP_LIST, model.GROUP_ORDERED_LIST):
            root = cur
        cur = parent.parent
    return root


def _md_escape(s: str) -> str:
    """docling-core markdown text escaping (groundtruth evidence:
    wiki_duck.html.md keeps ``&amp;`` and ``\\_``): HTML-escape ``&``/``<``/``>``
    (quotes untouched) plus underscore escaping. Applied to text items only
    — table cells and code blocks pass through raw."""
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace("_", "\\_")
    )


def _visible_width(s: str) -> int:
    """wcswidth-compatible display width (tabulate measures cells with
    wcwidth when present): wide East-Asian chars count 2, combining marks 0,
    and any control character makes the WHOLE string width -1 — which is why
    the reference's groundtruth pads a tab-containing cell to column width
    + len(cell) + 1 (csv-tab.csv.md rows 4-5)."""
    total = 0
    for ch in s:
        o = ord(ch)
        if o == 0:
            continue
        if o < 32 or 0x7F <= o < 0xA0:
            return -1
        if unicodedata.combining(ch):
            continue
        total += 2 if unicodedata.east_asian_width(ch) in ("W", "F") else 1
    return total


def _md_is_number(s: str) -> bool:
    """tabulate's numeric-cell test (float-parseable, non-empty)."""
    if not s or s != s.strip():
        s = s.strip()
    if not s:
        return False
    try:
        float(s)
        return True
    except ValueError:
        return False


def _md_format_number(s: str) -> str:
    """tabulate reformats parsed numbers (int stays, float via repr)."""
    t = s.strip()
    try:
        return str(int(t))
    except ValueError:
        pass
    try:
        return repr(float(t))
    except ValueError:
        return s


def _table_to_markdown(table: model.TableData) -> str:
    """GitHub-pipe table in the reference's exact rendering (docling-core
    delegates to ``tabulate(..., tablefmt='github')``; groundtruth at
    tests/data/groundtruth/docling_v2/*.html.md): column width =
    max(data cell widths, header width + 2); all-numeric data columns are
    re-formatted through number parsing and right-aligned (header too);
    string columns left-aligned; separator = width + 2 dashes."""
    if table.num_rows == 0 or table.num_cols == 0:
        return ""
    # whitespace semantics calibrated byte-exact against the groundtruth
    # (wiki_duck.html.md): newlines become spaces in every cell, DATA cells
    # are stripped (tabulate strips inside _align_column) but HEADER cells
    # are NOT (tabulate _align_header pads the raw string) — a trailing
    # space inside a header cell widens the whole column ('Authority
    # control databases' column is width 30, not 29)
    rows = [
        [(c if c is not None else "").replace("\n", " ") for c in row]
        for row in table.grid
    ]
    header, data = rows[0], [[c.strip() for c in row] for row in rows[1:]]
    ncols = table.num_cols
    numeric = [
        bool(data) and all(_md_is_number(r[j]) for r in data) for j in range(ncols)
    ]
    cells = [list(header)] + [
        [
            _md_format_number(r[j]) if numeric[j] else r[j]
            for j in range(ncols)
        ]
        for r in data
    ]
    widths = [
        max(
            max((_visible_width(r[j]) for r in cells[1:]), default=0),
            _visible_width(header[j]) + 2,
        )
        for j in range(ncols)
    ]

    def pad(s: str, w: int, right: bool) -> str:
        fill = " " * max(w - _visible_width(s), 0)
        return (fill + s) if right else (s + fill)

    lines = []
    for i, r in enumerate(cells):
        padded = [pad(r[j], widths[j], numeric[j]) for j in range(ncols)]
        lines.append("| " + " | ".join(padded) + " |")
        if i == 0:
            lines.append("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    rendered = "\n".join(lines)
    if table.escape_cells:
        # post-padding markdown escape (widths computed on the raw text —
        # escaped cells intentionally overflow their column, matching the
        # JATS groundtruth: &lt;15, &amp; mixed, RRID:AB\_262044).
        # Underscores INSIDE $$…$$ formula spans stay raw (pnas gt keeps
        # {\mathrm{_{{F}}^{{2}}}} unescaped).
        parts = rendered.split("$$")
        for i, part in enumerate(parts):
            part = (
                part.replace("&", "&amp;")
                .replace("<", "&lt;")
                .replace(">", "&gt;")
            )
            if i % 2 == 0:
                part = part.replace("_", "\\_")
            parts[i] = part
        rendered = "$$".join(parts)
    return rendered


def _table_to_text(table: model.TableData) -> str:
    lines = []
    for row in table.grid:
        cells = [(c if c is not None else "").replace("\n", " ").strip() for c in row]
        lines.append(" | ".join(cells))
    return "\n".join(lines)


def export_text(doc: Document, layers: tuple[str, ...] = (model.BODY,)) -> str:
    """Main-content plain text (BODY layer only by default). Members of one
    inline group collapse into a single space-joined block."""
    blocks: list[str] = []
    last_inline_parent: Optional[int] = None
    for node, _ in doc.iterate_items(layers=layers):
        label = node.label
        inline_parent = (
            node.parent
            if node.parent is not None
            and doc.nodes[node.parent].label == model.GROUP_INLINE
            else None
        )
        if label == model.PICTURE:
            last_inline_parent = None
            continue
        if label == model.TABLE:
            last_inline_parent = None
            if node.table is not None:
                rendered = _table_to_text(node.table)
                if rendered:
                    blocks.append(rendered)
            continue
        text = node.text
        if not text:
            continue
        if inline_parent is not None and inline_parent == last_inline_parent and blocks:
            blocks[-1] += " " + text
        elif label == model.LIST_ITEM:
            indent = "  " * _list_depth(doc, node)
            blocks.append(indent + _list_item_prefix(doc, node) + text)
        else:
            blocks.append(text)
        last_inline_parent = inline_parent
    return "\n\n".join(blocks)


def _fmt_wrap(s: str, node: Node) -> str:
    """Re-emit docling-core Formatting + hyperlink (markdown serializer:
    ``**bold**`` / ``*italic*`` / ``[text](url)`` — groundtruth evidence
    inline_and_formatting.md.md)."""
    if node.bold and node.italic:
        s = f"***{s}***"
    elif node.bold:
        s = f"**{s}**"
    elif node.italic:
        s = f"*{s}*"
    if node.hyperlink:
        s = f"[{s}]({node.hyperlink})"
    return s


def _inline_md(node: Node) -> str:
    """One inline-group member: code spans backtick-wrapped and UNESCAPED
    (gt keeps ``not_to_escape`` raw inside backticks), text escaped."""
    if node.label == model.CODE:
        base = f"`{node.text}`"
    elif node.label == model.FORMULA:
        # inline formulas render single-dollar (equations.docx gt);
        # standalone ones are $$-blocks in render_block
        base = f"${node.text}$"
    elif node.label == model.PICTURE:
        return "<!-- image -->"
    else:
        base = _md_escape(node.text)
    return _fmt_wrap(base, node)


_LIST_GROUPS = (model.GROUP_LIST, model.GROUP_ORDERED_LIST)


def export_markdown(
    doc: Document, layers: tuple[str, ...] = (model.BODY,)
) -> str:
    """Markdown export, byte-compatible with docling-core
    ``export_to_markdown`` on every committed groundtruth fixture
    (html/csv/md inputs). Blocks joined by blank lines; one block per
    top-level list (nested items single-newline, 4-space indents); inline
    groups join their members with single spaces."""
    blocks: list[str] = []
    referenced_captions = {
        n.caption_ref for n in doc.nodes if n.caption_ref is not None
    }

    def visible(node: Node) -> bool:
        return node.content_layer in layers

    def join_inline(group: Node) -> str:
        parts = []
        for ci in group.children:
            c = doc.nodes[ci]
            if c.is_group or not visible(c):
                continue
            r = _inline_md(c)
            if r:
                parts.append(r)
        return " ".join(parts)

    def item_text(node: Node) -> str:
        """Block item's rendered text: own text or its inline group."""
        if node.text:
            return _fmt_wrap(_md_escape(node.text), node)
        for ci in node.children:
            c = doc.nodes[ci]
            if c.label == model.GROUP_INLINE:
                return join_inline(c)
        return ""

    def render_list(group: Node, depth: int, lines: list[str]) -> None:
        for ci in group.children:
            c = doc.nodes[ci]
            if c.label == model.LIST_ITEM:
                txt = item_text(c)
                if visible(c) and txt:
                    lines.append(
                        "    " * depth + _list_item_prefix(doc, c) + txt
                    )
                for gi in c.children:
                    g2 = doc.nodes[gi]
                    if g2.label in _LIST_GROUPS:
                        render_list(g2, depth + 1, lines)
            elif c.label in _LIST_GROUPS:
                render_list(c, depth + 1, lines)
            elif c.label == model.GROUP_INLINE:
                continue  # consumed by its list item
            else:
                render_block(c, depth + 1)  # stray non-item content: lands
                # as its own top-level block after the list lines

    def render_block(node: Node, depth: int) -> None:
        label = node.label
        if node.is_group:
            if label in _LIST_GROUPS:
                lines: list[str] = []
                render_list(node, 0, lines)
                if lines:
                    blocks.append("\n".join(lines))
            elif label == model.GROUP_INLINE:
                joined = join_inline(node)
                if joined:
                    blocks.append(joined)
            else:
                for ci in node.children:
                    render_block(doc.nodes[ci], depth + 1)
            return
        if label == model.CAPTION and node.index in referenced_captions:
            pass
        elif label == model.PICTURE:
            if visible(node):
                if node.caption_ref is not None:
                    cap = doc.nodes[node.caption_ref]
                    if cap.text:
                        blocks.append(_md_escape(cap.text))
                blocks.append("<!-- image -->")
        elif label == model.TABLE:
            if visible(node) and node.table is not None:
                if node.caption_ref is not None:
                    cap = doc.nodes[node.caption_ref]
                    if cap.text:
                        blocks.append(_md_escape(cap.text))
                rendered = _table_to_markdown(node.table)
                if rendered:
                    blocks.append(rendered)
        elif label == model.TITLE:
            txt = item_text(node)
            if visible(node) and txt:
                blocks.append("# " + txt)
        elif label == model.SECTION_HEADER:
            txt = item_text(node)
            if visible(node) and txt:
                # hash count: stored level+1, deepened by tree position —
                # JATS headings carry level 1 at any nesting depth and the
                # groundtruth renders ##/###/#### by depth, while flat md
                # docs render by level (max() satisfies every committed gt)
                blocks.append("#" * max(node.level + 1, depth) + " " + txt)
        elif label == model.FORMULA:
            if visible(node) and node.text:
                blocks.append(f"$${node.text}$$")
        elif label == model.CODE:
            if visible(node) and node.text:
                blocks.append("```\n" + node.text + "\n```")
        else:
            if visible(node) and node.text:
                blocks.append(_fmt_wrap(_md_escape(node.text), node))
        # children of block items (heading-rooted subtrees) render as blocks;
        # inline groups were already consumed by item_text
        for ci in node.children:
            c = doc.nodes[ci]
            if c.label == model.GROUP_INLINE:
                continue
            render_block(c, depth + 1)

    for ci in doc.root.children:
        render_block(doc.nodes[ci], 1)
    return "\n\n".join(blocks)


def _itxt_trunc(text: str, max_text_len: int) -> str:
    """Reference indented-text truncation (docling-core
    ``_export_to_indented_text``; groundtruth: wiki_duck.html.itxt): long
    texts collapse to ``head ... tail`` with head = max//2 - 3 chars and
    tail = max//2 + 3 chars — a 75-char result at the default cap. Texts
    up to that length stay intact (longest untruncated groundtruth item is
    73 chars; shortest truncated is 75), so the threshold sits at the
    result length, not the cap. ``max_text_len=None`` disables truncation
    (the reference's argless ``_export_to_indented_text()``, used by the
    USPTO groundtruth)."""
    if max_text_len is None:
        return text
    limit = max_text_len + 4  # truncate only from 75 chars up
    if len(text) <= limit:
        return text
    return (
        text[: max_text_len // 2 - 3]
        + " ... "
        + text[-(max_text_len // 2 + 3):]
    )


def export_itxt(doc: Document, max_text_len: Optional[int] = 70) -> str:
    """Indented element-tree export, byte-compatible with the reference's
    ``DoclingDocument._export_to_indented_text(max_text_len=70,
    explicit_tables=False)`` used for every ``*.itxt`` groundtruth file
    (tests/test_backend_html.py:142-147). One line per body-layer node
    (groups included); pictures re-print their caption ref one level down
    under the SAME item number."""
    lines = ["item-0 at level 0: unspecified: group _root_"]
    ix = 0
    for node, depth in doc.iterate_items(layers=(model.BODY,), with_groups=True):
        ix += 1
        pad = "  " * depth
        head = f"{pad}item-{ix} at level {depth}"
        if node.is_group:
            label = "list" if node.label in (
                model.GROUP_LIST, model.GROUP_ORDERED_LIST
            ) else node.label
            lines.append(f"{head}: {label}: group {node.name}")
        elif node.label == model.PICTURE:
            lines.append(f"{head}: picture")
            if node.caption_ref is not None:
                cap = doc.nodes[node.caption_ref]
                if cap.text:
                    # caption reprints under their item are NOT truncated
                    # (pnas itxt keeps full figure captions inline while the
                    # same caption items truncate at their tree position)
                    lines.append(
                        f"{pad}  item-{ix} at level {depth + 1}: caption: "
                        f"{cap.text}"
                    )
        elif node.label == model.TABLE:
            t = node.table
            nr = t.num_rows if t is not None else 0
            nc = t.num_cols if t is not None else 0
            lines.append(f"{head}: table with [{nr}x{nc}]")
            if node.caption_ref is not None:
                cap = doc.nodes[node.caption_ref]
                if cap.text:
                    lines.append(
                        f"{pad}  item-{ix} at level {depth + 1}: caption: "
                        f"{cap.text}"
                    )
        else:
            lines.append(
                f"{head}: {node.label}: {_itxt_trunc(node.text, max_text_len)}"
            )
    return "\n".join(lines)


def _clamped_cell(c, num_rows: int, num_cols: int) -> dict:
    """Relation-contract view of a grid cell: half-open, non-degenerate,
    inside the declared grid.

    The HTML grid builder is reference-faithful (html_backend.py:382-508)
    and tag soup can hand it ``colspan="0"`` (zero-width extent) or a
    ``rowspan`` overhanging the last row (end_row > num_rows); the WHATWG
    table algorithm clamps both — spans are at least 1 and growth stops
    at the row group's end. Valid cells pass through unchanged, so every
    parity fixture is byte-identical; only degenerate extents move.
    """
    sr = min(max(c.start_row, 0), num_rows - 1)
    sc = min(max(c.start_col, 0), num_cols - 1)
    er = min(max(c.end_row, sr + 1), num_rows)
    ec = min(max(c.end_col, sc + 1), num_cols)
    return {
        "text": c.text,
        "row_span": er - sr,
        "col_span": ec - sc,
        "start_row": sr,
        "end_row": er,
        "start_col": sc,
        "end_col": ec,
        "column_header": c.column_header,
        "row_header": c.row_header,
    }


def flatten_spans(doc: Document) -> list[dict]:
    """Tree → ordered flat span records (for the Spark ``spans`` column).

    DFS order over both layers; groups included so the structure is
    reconstructible (the ``.itxt`` spirit of the reference's groundtruth
    files, ``tests/data/groundtruth/docling_v2/*.itxt``).
    """
    spans: list[dict] = []
    for node, depth in doc.iterate_items(
        layers=(model.BODY, model.FURNITURE), with_groups=True
    ):
        table_payload: Optional[dict] = None
        if node.table is not None:
            table_payload = {
                "num_rows": node.table.num_rows,
                "num_cols": node.table.num_cols,
                "cells": [
                    _clamped_cell(c, node.table.num_rows, node.table.num_cols)
                    # anchor view: the md backend's reference-faithful
                    # duplicate cells stay a sink-only artifact
                    for c in node.table.anchor_cells()
                    if node.table.num_rows > 0 and node.table.num_cols > 0
                ],
            }
        bbox_payload = None
        if node.bbox is not None:
            l, t, r, b = node.bbox
            bbox_payload = {"l": float(l), "t": float(t), "r": float(r), "b": float(b)}
        spans.append(
            {
                "self_ref": node.self_ref,
                "parent_ref": (
                    doc.nodes[node.parent].self_ref if node.parent is not None else None
                ),
                "kind": "group" if node.is_group else "item",
                "label": node.label,
                "name": node.name or None,
                "level": node.level,
                "marker": node.marker or None,
                "enumerated": node.enumerated,
                "content_layer": node.content_layer,
                "depth": depth,
                "page_no": node.page_no,
                "text": node.text or None,
                "bbox": bbox_payload,
                "table": table_payload,
            }
        )
    return spans


def doc_to_json(doc: Document) -> str:
    """Lossless document JSON (the engine's analog of docling-JSON,
    reference: docling/backend/json/docling_json_backend.py)."""
    import json

    return json.dumps({"name": doc.name, "spans": flatten_spans(doc)})


def doc_from_json(data) -> Document:
    """Rebuild a Document from :func:`doc_to_json` output (lossless load,
    Op-46 parity). Accepts str or bytes."""
    import json

    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    payload = json.loads(data)
    doc = Document(name=payload.get("name", "doc"))
    by_ref: dict[str, Node] = {}
    for span in payload["spans"]:
        parent = by_ref.get(span.get("parent_ref") or "")
        label = span["label"]
        kwargs = dict(parent=parent, content_layer=span.get("content_layer", model.BODY))
        if span["kind"] == "group":
            node = doc.add_group(name=span.get("name") or "", label=label, **kwargs)
        elif label == model.TABLE:
            t = span.get("table") or {}
            table = model.TableData(
                num_rows=t.get("num_rows", 0), num_cols=t.get("num_cols", 0)
            )
            for c in t.get("cells") or []:
                table.cells.append(
                    model.TableCellData(
                        text=c["text"], row_span=c["row_span"], col_span=c["col_span"],
                        start_row=c["start_row"], end_row=c["end_row"],
                        start_col=c["start_col"], end_col=c["end_col"],
                        column_header=c["column_header"], row_header=c["row_header"],
                    )
                )
            # rebuild grid from span-expanded cells
            grid = [[None] * table.num_cols for _ in range(table.num_rows)]
            for c in table.cells:
                for r in range(c.start_row, min(c.end_row, table.num_rows)):
                    for cc in range(c.start_col, min(c.end_col, table.num_cols)):
                        grid[r][cc] = c.text
            table.grid = grid
            node = doc.add_table(data=table, page_no=span.get("page_no", 1), **kwargs)
        elif label == model.PICTURE:
            node = doc.add_picture(page_no=span.get("page_no", 1), **kwargs)
        elif label == model.SECTION_HEADER:
            node = doc.add_heading(
                text=span.get("text") or "", level=span.get("level", 1),
                page_no=span.get("page_no", 1), **kwargs
            )
        elif label == model.CODE:
            node = doc.add_code(text=span.get("text") or "",
                                page_no=span.get("page_no", 1), **kwargs)
        elif label == model.LIST_ITEM:
            node = doc.add_list_item(
                text=span.get("text") or "", enumerated=span.get("enumerated", False),
                marker=span.get("marker") or "", page_no=span.get("page_no", 1),
                **kwargs,
            )
        else:
            node = doc.add_text(
                text=span.get("text") or "", label=label,
                page_no=span.get("page_no", 1), **kwargs
            )
        bbox = span.get("bbox")
        if bbox:
            node.bbox = (bbox["l"], bbox["t"], bbox["r"], bbox["b"])
        by_ref[span["self_ref"]] = node
    return doc


def export_doctags(doc: Document, layers: tuple[str, ...] = (model.BODY,)) -> str:
    """DocTags-style markup export (the reference CLI's doctags sink,
    docling/cli/main.py:177-277; OutputFormat enum base_models.py:66-72).
    One tag per item; tables as OTSL-spirit cell runs."""
    parts: list[str] = ["<doctag>"]
    for node, _ in doc.iterate_items(layers=layers):
        label = node.label
        if label == model.TABLE and node.table is not None:
            cells = []
            for row in node.table.grid:
                cells.append(
                    "".join(f"<fcel>{(c or '').strip()}" for c in row) + "<nl>"
                )
            parts.append("<otsl>" + "".join(cells) + "</otsl>")
        elif label == model.PICTURE:
            parts.append("<picture></picture>")
        elif node.text:
            parts.append(f"<{label}>{node.text}</{label}>")
    parts.append("</doctag>")
    return "\n".join(parts)


def export_html(doc: Document, layers: tuple[str, ...] = (model.BODY,)) -> str:
    """HTML export (the reference CLI's html sink; also the carrier for the
    markdown backend's embedded-HTML re-route, md_backend.py:510-545).
    Tree-faithful: nested list groups become nested ``<ul>``/``<ol>``,
    code items ``<pre><code>`` (the re-route's unwrap pattern), inline
    groups one ``<p>`` with ``<b>``/``<i>``/``<code>``/``<a>`` members."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def visible(node: Node) -> bool:
        return node.content_layer in layers

    def inline_html(node: Node) -> str:
        if node.label == model.PICTURE:
            return "<figure></figure>"
        s = f"<code>{esc(node.text)}</code>" if node.label == model.CODE \
            else esc(node.text)
        if node.bold:
            s = f"<b>{s}</b>"
        if node.italic:
            s = f"<i>{s}</i>"
        if node.hyperlink:
            s = f'<a href="{esc(node.hyperlink)}">{s}</a>'
        return s

    def heading_text(node: Node) -> str:
        if node.text:
            return esc(node.text)
        for ci in node.children:
            c = doc.nodes[ci]
            if c.label == model.GROUP_INLINE:
                return " ".join(
                    inline_html(doc.nodes[x])
                    for x in c.children
                    if not doc.nodes[x].is_group
                )
        return ""

    parts: list[str] = ["<html><body>"]

    def render_list(group: Node) -> None:
        tag = "ol" if group.label == model.GROUP_ORDERED_LIST else "ul"
        start = ""
        if tag == "ol" and group.name.startswith("ordered list start "):
            start = f' start="{group.name.rsplit(" ", 1)[1]}"'
        parts.append(f"<{tag}{start}>")
        for ci in group.children:
            c = doc.nodes[ci]
            if c.label == model.LIST_ITEM:
                txt = heading_text(c) if not c.text else esc(c.text)
                sub = [
                    doc.nodes[gi] for gi in c.children
                    if doc.nodes[gi].label in _LIST_GROUPS
                ]
                if sub:
                    parts.append(f"<li>{txt}")
                    for g2 in sub:
                        render_list(g2)
                    parts.append("</li>")
                else:
                    parts.append(f"<li>{txt}</li>")
            elif c.label in _LIST_GROUPS:
                parts.append("<li>")
                render_list(c)
                parts.append("</li>")
        parts.append(f"</{tag}>")

    def render(node: Node) -> None:
        label = node.label
        if node.is_group:
            if label in _LIST_GROUPS:
                render_list(node)
            elif label == model.GROUP_INLINE:
                joined = " ".join(
                    inline_html(doc.nodes[x])
                    for x in node.children
                    if not doc.nodes[x].is_group
                )
                if joined:
                    parts.append(f"<p>{joined}</p>")
            else:
                for ci in node.children:
                    render(doc.nodes[ci])
            return
        if label == model.TITLE:
            txt = heading_text(node)
            if visible(node) and txt:
                parts.append(f"<h1>{txt}</h1>")
        elif label == model.SECTION_HEADER:
            lvl = min(node.level + 1, 6)
            txt = heading_text(node)
            if visible(node) and txt:
                parts.append(f"<h{lvl}>{txt}</h{lvl}>")
        elif label == model.CODE:
            if visible(node) and node.text:
                parts.append(f"<pre><code>{esc(node.text)}</code></pre>")
        elif label == model.TABLE:
            if visible(node) and node.table is not None:
                rows = []
                for ri, row in enumerate(node.table.grid):
                    tag = "th" if ri == 0 else "td"
                    rows.append(
                        "<tr>"
                        + "".join(
                            f"<{tag}>{esc((c or '').strip())}</{tag}>" for c in row
                        )
                        + "</tr>"
                    )
                parts.append("<table>" + "".join(rows) + "</table>")
        elif label == model.PICTURE:
            if visible(node):
                parts.append("<figure></figure>")
        elif node.text and visible(node):
            parts.append(f"<p>{inline_html(node)}</p>")
        for ci in node.children:
            c = doc.nodes[ci]
            if c.label == model.GROUP_INLINE:
                continue
            render(c)

    for ci in doc.root.children:
        render(doc.nodes[ci])
    parts.append("</body></html>")
    return "\n".join(parts)


def export_docling_html(doc: Document, *, name: str) -> str:
    """DoclingDocument ``save_as_html`` byte-parity sink: full HTML page
    with the docling-core serializer's head/CSS, a ``<div class='page'>``
    content wrapper, and single-line ``<table><tbody>`` tables that emit
    each spanning cell once with colspan/rowspan attributes (byte-pinned by
    the reference's committed ``word_tables.docx.html`` groundtruth;
    docling-core ``transforms/serializer/html.py``). Empty paragraphs are
    kept (``<p></p>``), matching the serializer."""
    import html as _html

    from doc_parser_spark.core.docling_html_css import DOCLING_HTML_CSS
    from doc_parser_spark.core.docling_json import _table_data_dict
    from doc_parser_spark.core.model import TableData

    def esc(s: str) -> str:
        return _html.escape(s)

    items: list[str] = []

    def table_html(node: Node) -> str:
        d = _table_data_dict(node.table or TableData())
        rows = []
        for r in range(d["num_rows"]):
            tds = []
            for c in range(d["num_cols"]):
                cell = d["grid"][r][c]
                # spanning cells render once, at their anchor position
                if (
                    cell["start_row_offset_idx"] != r
                    or cell["start_col_offset_idx"] != c
                ):
                    continue
                attrs = ""
                if cell["col_span"] > 1:
                    attrs += f' colspan="{cell["col_span"]}"'
                if cell["row_span"] > 1:
                    attrs += f' rowspan="{cell["row_span"]}"'
                tag = "th" if cell["column_header"] else "td"
                tds.append(f"<{tag}{attrs}>{esc(cell['text'])}</{tag}>")
            rows.append("<tr>" + "".join(tds) + "</tr>")
        return "<table><tbody>" + "".join(rows) + "</tbody></table>"

    def render_list(group: Node) -> None:
        tag = "ol" if group.label == model.GROUP_ORDERED_LIST else "ul"
        body = []
        for ci in group.children:
            c = doc.nodes[ci]
            if c.label == model.LIST_ITEM:
                body.append(f"<li>{esc(c.text)}</li>")
        items.append(f"<{tag}>" + "".join(body) + f"</{tag}>")

    def render(node: Node) -> None:
        label = node.label
        if node.content_layer != model.BODY:
            return
        if node.is_group:
            if label in _LIST_GROUPS:
                render_list(node)
            else:
                for ci in node.children:
                    render(doc.nodes[ci])
            return
        if label == model.TITLE:
            items.append(f"<h1>{esc(node.text)}</h1>")
        elif label == model.SECTION_HEADER:
            lvl = min(node.level + 1, 6)
            items.append(f"<h{lvl}>{esc(node.text)}</h{lvl}>")
        elif label == model.CODE:
            items.append(f"<pre><code>{esc(node.text)}</code></pre>")
        elif label == model.FORMULA:
            items.append(f'<div class="formula">{esc(node.text)}</div>')
        elif label == model.TABLE:
            items.append(table_html(node))
        elif label == model.PICTURE:
            items.append("<figure></figure>")
        else:
            items.append(f"<p>{esc(node.text)}</p>")
        for ci in node.children:
            render(doc.nodes[ci])

    for ci in doc.root.children:
        render(doc.nodes[ci])
    head = (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        '<meta charset="UTF-8">\n'
        f"<title>{esc(name)}</title>\n"
        '<meta name="generator" content="Docling HTML Serializer">\n'
        f"{DOCLING_HTML_CSS}\n</head>\n<body>\n<div class='page'>\n"
    )
    return head + "\n".join(items) + "\n</div>\n</body>\n</html>"
