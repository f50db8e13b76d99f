"""Lightweight document tree model (the engine's analog of DoclingDocument).

The reference represents converted documents as a docling-core
``DoclingDocument``: content items (texts, tables, pictures) plus a body tree
of groups, addressed by JSON-pointer-style refs (see the taxonomy summary in
the reference's ``docs/concepts/docling_document.md:22-45``). This module is a
from-scratch, dependency-free equivalent sized for use inside Arrow-batched
pandas UDFs: plain Python objects, a flat node table with parent/children
indices, and a DFS iterator that mirrors ``DoclingDocument.iterate_items``.

Labels follow the reference's ``DocItemLabel`` / ``GroupLabel`` vocabulary
(docling-core), restricted to what the deterministic extraction paths emit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Optional

# content layers (docling-core ContentLayer; used by the furniture/body rule,
# reference: docling/backend/html_backend.py:127-131)
BODY = "body"
FURNITURE = "furniture"

# item labels (DocItemLabel subset emitted by the deterministic paths)
TITLE = "title"
SECTION_HEADER = "section_header"
TEXT = "text"
PARAGRAPH = "paragraph"  # pptx non-list text (mspowerpoint_backend.py:191)
FORMULA = "formula"  # JATS tex-math (jats_backend.py:476-484)
CODE = "code"
LIST_ITEM = "list_item"
CAPTION = "caption"
FOOTNOTE = "footnote"
PICTURE = "picture"
TABLE = "table"
PAGE_HEADER = "page_header"
PAGE_FOOTER = "page_footer"

# group labels (GroupLabel subset)
GROUP_SECTION = "section"
GROUP_LIST = "list"
GROUP_ORDERED_LIST = "ordered_list"
GROUP_INLINE = "inline"  # docling-core InlineGroup (md_backend.py:444-447)
GROUP_CHAPTER = "chapter"  # pptx slides (mspowerpoint_backend.py:334)
GROUP_UNSPECIFIED = "unspecified"  # BOK JSON cell groups (bok_json_backend.py:349)

_GROUP_LABELS = {
    GROUP_SECTION, GROUP_LIST, GROUP_ORDERED_LIST, GROUP_INLINE,
    GROUP_CHAPTER, GROUP_UNSPECIFIED,
}


@dataclass
class TableCellData:
    """One logical table cell (reference: docling-core ``TableCell``, filled by
    ``docling/backend/html_backend.py:483-494``)."""

    text: str
    row_span: int = 1
    col_span: int = 1
    start_row: int = 0
    end_row: int = 1
    start_col: int = 0
    end_col: int = 1
    column_header: bool = False
    row_header: bool = False
    row_section: bool = False


@dataclass
class TableData:
    """Table payload: cell list + span-expanded text grid
    (reference: ``html_backend.py:410-496``)."""

    num_rows: int = 0
    num_cols: int = 0
    cells: list[TableCellData] = field(default_factory=list)
    grid: list[list[Optional[str]]] = field(default_factory=list)
    # markdown renders cells HTML-escaped AFTER padding (JATS-path tables,
    # groundtruth pnas/pntd); HTML-path tables keep raw cells
    escape_cells: bool = False

    def anchor_cells(self) -> list[TableCellData]:
        """Cells unique by their (start_row, start_col) anchor, first
        occurrence wins — how docling-core's grid-based serializers see a
        table whose cell list carries duplicates (the reference's markdown
        backend double-populates table_cells, md_backend.py _close_table)."""
        seen: set[tuple[int, int]] = set()
        out: list[TableCellData] = []
        for c in self.cells:
            key = (c.start_row, c.start_col)
            if key in seen:
                continue
            seen.add(key)
            out.append(c)
        return out


@dataclass
class Node:
    """One tree node: a content item or a group.

    ``self_ref`` mimics docling's JSON-pointer refs (``#/texts/0``) so chunk
    metadata and span outputs stay shaped like the reference's.
    """

    index: int
    label: str
    self_ref: str
    parent: Optional[int] = None
    children: list[int] = field(default_factory=list)
    text: str = ""
    level: int = 0  # heading level for section_header (reference level = h-level - 1)
    marker: str = ""  # ordered-list marker, e.g. "42."
    enumerated: bool = False
    content_layer: str = BODY
    name: str = ""  # group name, e.g. "ordered list start 42"
    table: Optional[TableData] = None
    caption_ref: Optional[int] = None  # picture -> caption node index
    page_no: int = 1
    bbox: Optional[tuple[float, float, float, float]] = None  # (l, t, r, b) top-left origin
    # inline formatting (docling-core Formatting + hyperlink; carried by the
    # markdown backend's emphasis/link handling, md_backend.py:301-347)
    bold: bool = False
    italic: bool = False
    hyperlink: str = ""
    underline: bool = False
    strikethrough: bool = False
    script: str = "baseline"
    # emit a ``formatting`` object in the DoclingDocument JSON sink — mirrors
    # "Formatting is not None" in the reference model (set by run-aware
    # backends like DOCX even when every flag is False)
    has_formatting: bool = False
    # original text before sanitization when it differs (JSON ``orig`` field)
    orig: Optional[str] = None
    # provenance for geometry-aware backends: emitting a prov entry requires
    # a charspan; coord_origin is BOTTOMLEFT for PPTX (EMU), TOPLEFT for XLSX
    charspan: Optional[tuple[int, int]] = None
    coord_origin: str = "TOPLEFT"
    # embedded picture metadata for the JSON sink ({mimetype, dpi, size})
    image_meta: Optional[dict] = None

    @property
    def is_group(self) -> bool:
        return self.label in _GROUP_LABELS


class Document:
    """Flat-array document tree with a body root group.

    Mirrors the parts of DoclingDocument the pipeline needs: ``add_text`` /
    ``add_heading`` / ``add_group`` / ``add_list_group`` / ``add_list_item`` /
    ``add_table`` / ``add_picture`` / ``add_code`` and a DFS ``iterate_items``.
    """

    def __init__(self, name: str = "doc"):
        self.name = name
        self.nodes: list[Node] = []
        # page_no -> (width, height); filled by geometry-aware backends
        # (PDF) so bboxes can be normalized (DoclingDocument.pages.size)
        self.page_sizes: dict[int, tuple[float, float]] = {}
        self._counters: dict[str, int] = {}
        self.root = self._new_node(label=GROUP_SECTION, parent=None, ref_bucket="groups")
        self.root.name = "_root_"

    # -- construction -----------------------------------------------------

    def _new_node(self, label: str, parent: Optional[int], ref_bucket: str) -> Node:
        i = self._counters.get(ref_bucket, 0)
        self._counters[ref_bucket] = i + 1
        node = Node(
            index=len(self.nodes),
            label=label,
            self_ref=f"#/{ref_bucket}/{i}",
            parent=parent.index if isinstance(parent, Node) else parent,
        )
        self.nodes.append(node)
        if node.parent is not None:
            self.nodes[node.parent].children.append(node.index)
        return node

    def _attach(self, label: str, parent: Optional[Node], bucket: str) -> Node:
        p = parent if parent is not None else self.root
        return self._new_node(label, p, bucket)

    def add_text(
        self,
        text: str,
        label: str = TEXT,
        parent: Optional[Node] = None,
        content_layer: str = BODY,
        page_no: int = 1,
        bbox: Optional[tuple] = None,
    ) -> Node:
        node = self._attach(label, parent, "texts")
        node.text = text
        node.orig = text  # frozen at creation (docling add_text); later .text mutations don't touch it
        node.content_layer = content_layer
        node.page_no = page_no
        node.bbox = bbox
        return node

    def add_heading(
        self,
        text: str,
        level: int = 1,
        parent: Optional[Node] = None,
        content_layer: str = BODY,
        page_no: int = 1,
        bbox: Optional[tuple] = None,
    ) -> Node:
        node = self._attach(SECTION_HEADER, parent, "texts")
        node.text = text
        node.orig = text  # frozen at creation (docling add_text); later .text mutations don't touch it
        node.level = level
        node.content_layer = content_layer
        node.page_no = page_no
        node.bbox = bbox
        return node

    def add_code(
        self,
        text: str,
        parent: Optional[Node] = None,
        content_layer: str = BODY,
        page_no: int = 1,
    ) -> Node:
        node = self._attach(CODE, parent, "texts")
        node.text = text
        node.orig = text  # frozen at creation (docling add_text); later .text mutations don't touch it
        node.content_layer = content_layer
        node.page_no = page_no
        return node

    def add_group(
        self,
        name: str = "",
        label: str = GROUP_SECTION,
        parent: Optional[Node] = None,
        content_layer: str = BODY,
    ) -> Node:
        node = self._attach(label, parent, "groups")
        node.name = name
        node.content_layer = content_layer
        return node

    def add_list_group(
        self, name: str = "", parent: Optional[Node] = None, content_layer: str = BODY
    ) -> Node:
        label = GROUP_ORDERED_LIST if name.startswith("ordered") else GROUP_LIST
        node = self._attach(label, parent, "groups")
        node.name = name
        node.content_layer = content_layer
        return node

    def add_list_item(
        self,
        text: str,
        enumerated: bool = False,
        marker: str = "",
        parent: Optional[Node] = None,
        content_layer: str = BODY,
        page_no: int = 1,
        bbox: Optional[tuple] = None,
    ) -> Node:
        node = self._attach(LIST_ITEM, parent, "texts")
        node.text = text
        node.orig = text  # frozen at creation (docling add_text); later .text mutations don't touch it
        node.enumerated = enumerated
        node.marker = marker
        node.content_layer = content_layer
        node.page_no = page_no
        node.bbox = bbox
        return node

    def add_table(
        self,
        data: TableData,
        parent: Optional[Node] = None,
        content_layer: str = BODY,
        page_no: int = 1,
        bbox: Optional[tuple] = None,
        caption: Optional[Node] = None,
    ) -> Node:
        node = self._attach(TABLE, parent, "tables")
        node.table = data
        node.caption_ref = caption.index if caption is not None else None
        node.content_layer = content_layer
        node.page_no = page_no
        node.bbox = bbox
        return node

    def add_picture(
        self,
        parent: Optional[Node] = None,
        caption: Optional[Node] = None,
        content_layer: str = BODY,
        page_no: int = 1,
    ) -> Node:
        node = self._attach(PICTURE, parent, "pictures")
        node.caption_ref = caption.index if caption is not None else None
        node.content_layer = content_layer
        node.page_no = page_no
        return node

    # -- traversal --------------------------------------------------------

    def iterate_items(
        self, layers: tuple[str, ...] = (BODY,), with_groups: bool = False
    ) -> Iterator[tuple[Node, int]]:
        """DFS over the body tree, yielding (node, depth).

        Mirrors ``DoclingDocument.iterate_items`` with
        ``included_content_layers`` filtering (used by the chunker, reference:
        doc_preprocessors/basic_processor.py:126).
        """
        stack: list[tuple[int, int]] = [(c, 1) for c in reversed(self.root.children)]
        while stack:
            idx, depth = stack.pop()
            node = self.nodes[idx]
            if node.is_group:
                if with_groups and node.content_layer in layers:
                    yield node, depth
            elif node.content_layer in layers:
                yield node, depth
            for c in reversed(node.children):
                stack.append((c, depth + 1))

    def tables(self) -> list[Node]:
        return [n for n in self.nodes if n.label == TABLE]

    def title_text(self) -> str:
        """First TITLE item's text (reference:
        doc_preprocessors/basic_processor.py:1013-1017)."""
        for node, _ in self.iterate_items(layers=(BODY, FURNITURE)):
            if node.label == TITLE:
                return node.text.strip() if node.text else ""
        return ""

    def num_pages(self) -> int:
        return max((n.page_no for n in self.nodes if not n.is_group), default=1)

    def has_text_items(self) -> bool:
        """True when any text-bearing item is non-empty, or a structureless
        table exists (reference: basic_processor.py:1085-1090)."""
        for node, _ in self.iterate_items(layers=(BODY, FURNITURE)):
            if node.label in (TITLE, SECTION_HEADER, TEXT, CODE, LIST_ITEM, CAPTION):
                if node.text and node.text.strip():
                    return True
            elif node.label == TABLE and node.table is not None and not node.table.cells:
                return True
        return False
