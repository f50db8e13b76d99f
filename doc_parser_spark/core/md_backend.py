"""Markdown → document tree, marko-AST-equivalent semantics.

From-scratch reimplementation of the reference's Markdown backend contract
(``docling/backend/md_backend.py``, marko + HTML re-route). marko is not
available here; this is an original block + inline parser that reproduces
the reference's OBSERVABLE behaviour, validated byte-exact against the
committed groundtruth (``tests/data/groundtruth/docling_v2/*.md.md``).

Behavioural contract (reference file:line):

* long ``_`` runs shortened to 10 ............ md_backend.py:65-86
* headings: h1 → title, hN → level N-1; NOT parents (flat doc)
  .............................................. md_backend.py:203-226, 369-380
* empty headings / empty list items dropped; a list with only empty
  items produces no group ...................... md_backend.py:246-258, 265-290
* list groups named "list", ordered flag per group, no explicit
  markers (numbering is positional at export) .. md_backend.py:275-277
* paragraphs/headings with >1 inline children wrap an inline group
  .............................................. md_backend.py:444-447
* inline emphasis/strong → formatting flags; links → hyperlink;
  code spans → CODE items; images → picture + caption-from-title
  .............................................. md_backend.py:301-347, 390-399
* pipe-table buffering quirks: separator row skipped, header defines
  num_cols, in_table persists until a non-text block closes it, a NEW
  paragraph while in_table concatenates onto the last buffered row
  .............................................. md_backend.py:127-182, 336-349
* fenced/indented code: body stripped, empty dropped ... md_backend.py:401-415
* HTML blocks: buffered verbatim with markers, then the whole document
  is exported to HTML and re-parsed through the HTML backend
  .............................................. md_backend.py:34-36, 421-438, 510-545
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document

_MARKER_BODY = "DOC_PARSER_SPARK_MD_HTML_EXPORT"
_START_MARKER = f"#_#_{_MARKER_BODY}_START_#_#"
_STOP_MARKER = f"#_#_{_MARKER_BODY}_STOP_#_#"

_UNDERSCORE_RUN = re.compile(r"_+")
_ATX = re.compile(r"^(#{1,6})(?:[ \t]+(.*?))?[ \t]*$")
_FENCE = re.compile(r"^(`{3,}|~{3,})[ \t]*(\S*)[ \t]*$")
_BULLET = re.compile(r"^([-+*])(?:[ \t]+(.*))?$")
_ORDERED = re.compile(r"^(\d{1,9})([.)])(?:[ \t]+(.*))?$")
_HTML_OPEN = re.compile(r"^<(?:!--|!|\?|/?[A-Za-z][A-Za-z0-9-]*)")


def _shorten_underscores(text: str, max_length: int = 10) -> str:
    """md_backend.py:65-86 — runs of ``_`` longer than 10 collapse to 10."""
    return _UNDERSCORE_RUN.sub(
        lambda m: m.group(0) if len(m.group(0)) <= max_length else "_" * max_length,
        text,
    )


def _expand(line: str) -> str:
    return line.expandtabs(4)


def _indent_of(line: str) -> int:
    return len(line) - len(line.lstrip(" "))


# ---------------------------------------------------------------------------
# inline parsing → flat piece list (marko leaf items with accumulated
# formatting/hyperlink, the shape the reference walk produces)
# ---------------------------------------------------------------------------


@dataclass
class Piece:
    kind: str  # "text" | "code" | "image"
    text: str
    bold: bool = False
    italic: bool = False
    hyperlink: str = ""
    title: str = ""  # image caption source (reference uses the TITLE)


_CODE_SPAN = re.compile(r"(`+)(.+?)\1", re.DOTALL)
_IMAGE = re.compile(r"!\[([^\]]*)\]\(([^)\s]*)(?:[ \t]+\"([^\"]*)\")?\)")
_LINK = re.compile(r"\[([^\]]*)\]\(([^)\s]*)(?:[ \t]+\"([^\"]*)\")?\)")
# emphasis delimiters, longest first (no flanking subtleties — the corpus
# uses well-formed ***x*** / **x** / *x* / _x_ forms)
_EMPH_FORMS = (
    ("***", True, True), ("___", True, True),
    ("**", True, False), ("__", True, False),
    ("*", False, True), ("_", False, True),
)


def parse_inlines(
    text: str,
    bold: bool = False,
    italic: bool = False,
    hyperlink: str = "",
    out: Optional[list] = None,
) -> list[Piece]:
    """Recursive-descent inline scan producing marko-equivalent leaves."""
    if out is None:
        out = []
    i, n = 0, len(text)
    plain_start = i

    def flush(upto: int) -> None:
        if upto > plain_start:
            out.append(
                Piece("text", text[plain_start:upto], bold, italic, hyperlink)
            )

    while i < n:
        ch = text[i]
        if ch == "`":
            m = _CODE_SPAN.match(text, i)
            if m:
                flush(i)
                out.append(Piece("code", m.group(2).strip(), bold, italic, hyperlink))
                i = m.end()
                plain_start = i
                continue
        elif ch == "!" and text.startswith("![", i):
            m = _IMAGE.match(text, i)
            if m:
                flush(i)
                out.append(
                    Piece("image", m.group(1), bold, italic, hyperlink,
                          title=m.group(3) or "")
                )
                i = m.end()
                plain_start = i
                continue
        elif ch == "[":
            m = _LINK.match(text, i)
            if m:
                flush(i)
                parse_inlines(m.group(1), bold, italic, m.group(2), out)
                i = m.end()
                plain_start = i
                continue
        elif ch in "*_":
            prev = text[i - 1] if i > 0 else ""
            matched = False
            for delim, b, it in _EMPH_FORMS:
                if not text.startswith(delim, i):
                    continue
                # CommonMark flanking (simplified): ``_`` never opens
                # intraword; an opener must be followed by non-space
                if delim[0] == "_" and (prev.isalnum() or prev == "_") \
                        and not text.startswith(delim * 2, i):
                    break
                after_open = text[i + len(delim): i + len(delim) + 1]
                if not after_open or after_open.isspace():
                    break
                search = i + len(delim)
                end = -1
                while True:
                    cand = text.find(delim, search)
                    if cand == -1 or cand == i + len(delim):
                        break
                    before = text[cand - 1]
                    after = text[cand + len(delim): cand + len(delim) + 1]
                    if before.isspace():
                        search = cand + 1
                        continue
                    if delim[0] == "_" and after and after.isalnum():
                        search = cand + 1
                        continue
                    end = cand
                    break
                if end > 0:
                    inner = text[i + len(delim): end]
                    if inner.strip():
                        flush(i)
                        parse_inlines(inner, bold or b, italic or it, hyperlink, out)
                        i = end + len(delim)
                        plain_start = i
                        matched = True
                break
            if not matched:
                i += 1
            continue
        i += 1
    flush(n)
    return out


def _plain_concat(line: str) -> str:
    """Inline-parse a table row and concatenate stripped leaf texts — the
    reference buffers marko RawText leaves stripped, so emphasis/link
    markers vanish from table rows (md_backend.py:336-349)."""
    pieces = parse_inlines(line)
    return "".join(
        (p.text.strip()) for p in pieces if p.kind in ("text", "code")
    )


# ---------------------------------------------------------------------------
# block parsing
# ---------------------------------------------------------------------------


class _MdParser:
    def __init__(self) -> None:
        self.doc = Document()
        self.in_table = False
        self.table_buffer: list[str] = []
        self.html_blocks = 0

    # -- table buffering (reference quirk set, md_backend.py:127-182) -----

    def _close_table(self) -> None:
        if not self.in_table:
            return
        rows = []
        for n, raw in enumerate(self.table_buffer):
            if n == 0 or n > 1:  # row 1 (separator) skipped unconditionally
                rows.append([t.strip() for t in raw.split("|")[1:-1]])
        self.in_table = False
        self.table_buffer = []
        if not rows or not rows[0]:
            return
        num_rows, num_cols = len(rows), len(rows[0])
        table = model.TableData(num_rows=num_rows, num_cols=num_cols)
        grid: list[list[Optional[str]]] = []
        for ri in range(num_rows):
            padded = (rows[ri] + [""] * num_cols)[:num_cols]
            grid.append(list(padded))
            for ci, cell in enumerate(padded):
                table.cells.append(
                    model.TableCellData(
                        text=cell, start_row=ri, end_row=ri + 1,
                        start_col=ci, end_col=ci + 1, column_header=(ri == 0),
                    )
                )
        table.grid = grid
        # the reference populates table_cells TWICE — once via the TableData
        # constructor and once via an explicit append loop (md_backend.py
        # _close_table "# Populate") — so markdown tables carry every cell
        # duplicated in the serialized model (pinned by the committed
        # inline_and_formatting.md.yaml groundtruth). Downstream text/HTML
        # serializers are grid-anchor-based (docling-core) and see each
        # cell once.
        table.cells.extend(list(table.cells))
        self.doc.add_table(data=table)

    def _buffer_table_lines(self, lines: list[str], new_paragraph: bool) -> None:
        for k, line in enumerate(lines):
            norm = _plain_concat(line)
            if k == 0 and new_paragraph and self.table_buffer:
                # reference: a new paragraph while in_table has no leading
                # LineBreak, so its first line concatenates onto the last
                # buffered row
                self.table_buffer[-1] += norm
            else:
                self.table_buffer.append(norm)
        self.in_table = True

    # -- leaf emission ------------------------------------------------------

    def _emit_pieces(
        self,
        pieces: list[Piece],
        n_children: int,
        parent: Optional[model.Node],
        as_heading: Optional[int] = None,
        as_list_item: bool = False,
        enumerated: bool = False,
    ) -> Optional[model.Node]:
        """Create doc items for a paragraph/heading/list-item content.

        Returns the created block item (heading/list item) if one exists.
        ``n_children`` is the marko child count (pieces + soft breaks):
        >1 wraps an inline group (md_backend.py:444-447)."""
        doc = self.doc
        pieces = [
            p for p in pieces
            if p.kind == "image" or p.text.strip() or p.kind == "code"
        ]
        if not pieces:
            return None
        if n_children > 1:
            if as_heading is not None:
                block = self._add_heading("", as_heading, parent)
                holder = doc.add_group(
                    name="group", label=model.GROUP_INLINE, parent=block
                )
            elif as_list_item:
                block = doc.add_list_item(
                    text="", enumerated=enumerated, parent=parent
                )
                holder = doc.add_group(
                    name="group", label=model.GROUP_INLINE, parent=block
                )
            else:
                block = None
                holder = doc.add_group(
                    name="group", label=model.GROUP_INLINE, parent=parent
                )
            for p in pieces:
                self._emit_leaf(p, holder)
            return block
        p = pieces[0]
        if p.kind == "image":
            return self._emit_leaf(p, parent)
        text = p.text.strip() if p.kind == "text" else p.text
        if as_heading is not None:
            node = self._add_heading(text, as_heading, parent)
        elif as_list_item:
            node = doc.add_list_item(text=text, enumerated=enumerated, parent=parent)
        elif p.kind == "code":
            node = doc.add_code(text=text, parent=parent)
        else:
            node = doc.add_text(text=text, label=model.TEXT, parent=parent)
        node.bold, node.italic, node.hyperlink = p.bold, p.italic, p.hyperlink
        # the reference creates a Formatting object exactly when the leaf
        # sits under Emphasis/StrongEmphasis (md_backend.py:320-328);
        # plain/link-only leaves keep formatting=None
        node.has_formatting = bool(p.bold or p.italic)
        return node

    def _emit_leaf(self, p: Piece, parent: Optional[model.Node]) -> model.Node:
        doc = self.doc
        if p.kind == "image":
            caption = None
            if p.title:
                caption = doc.add_text(text=p.title, label=model.CAPTION)
            return doc.add_picture(parent=parent, caption=caption)
        if p.kind == "code":
            node = doc.add_code(text=p.text, parent=parent)
        else:
            node = doc.add_text(text=p.text.strip(), label=model.TEXT, parent=parent)
        node.bold, node.italic, node.hyperlink = p.bold, p.italic, p.hyperlink
        node.has_formatting = bool(p.bold or p.italic)
        return node

    def _emit_paragraph(
        self, para_lines: list[str], parent: Optional[model.Node]
    ) -> None:
        pieces: list[Piece] = []
        n_children = len(para_lines) - 1  # soft line breaks
        for pline in para_lines:
            sub = parse_inlines(pline)
            pieces.extend(sub)
            n_children += len(sub)
        self._emit_pieces(pieces, n_children, parent)

    def _add_heading(
        self, text: str, level: int, parent: Optional[model.Node]
    ) -> model.Node:
        if level == 1:
            return self.doc.add_text(text=text, label=model.TITLE, parent=parent)
        return self.doc.add_heading(text=text, level=level - 1, parent=parent)

    # -- block walk ---------------------------------------------------------

    def parse(self, text: str) -> None:
        self._parse_blocks(text.split("\n"), 0, parent=None)
        self._close_table()

    def _parse_blocks(
        self, lines: list[str], indent: int, parent: Optional[model.Node]
    ) -> None:
        i = 0
        n = len(lines)
        while i < n:
            raw = lines[i]
            line = _expand(raw)
            body = line[indent:] if len(line) >= indent else line.lstrip(" ")
            stripped = body.strip()

            if not stripped:
                i += 1
                continue

            rel_indent = _indent_of(body)

            # fenced code
            m = _FENCE.match(body.lstrip(" ")) if rel_indent <= 3 else None
            if m:
                self._close_table()
                fence = m.group(1)[0] * 3
                code_lines: list[str] = []
                i += 1
                while i < n:
                    nxt = _expand(lines[i])[indent:]
                    if nxt.lstrip(" ").startswith(fence):
                        i += 1
                        break
                    code_lines.append(nxt)
                    i += 1
                snippet = "\n".join(code_lines).strip()
                if snippet:
                    self.doc.add_code(text=snippet, parent=parent)
                continue

            # indented code block (4+ spaces past current indent)
            if rel_indent >= 4:
                self._close_table()
                code_lines = []
                while i < n:
                    cur = _expand(lines[i])[indent:]
                    if cur.strip() and _indent_of(cur) >= 4:
                        code_lines.append(cur[4:])
                        i += 1
                    elif not cur.strip():
                        code_lines.append("")
                        i += 1
                    else:
                        break
                snippet = "\n".join(code_lines).strip()
                if snippet:
                    self.doc.add_code(text=snippet, parent=parent)
                continue

            # ATX heading
            m = _ATX.match(stripped)
            if m:
                self._close_table()
                level = len(m.group(1))
                content = (m.group(2) or "").strip()
                if content:
                    pieces = parse_inlines(content)
                    self._emit_pieces(
                        pieces, len(pieces), parent, as_heading=level
                    )
                i += 1
                continue

            # list
            if _BULLET.match(stripped) or _ORDERED.match(stripped):
                self._close_table()
                i = self._parse_list(lines, i, n, indent, parent)
                continue

            # html block
            if _HTML_OPEN.match(stripped) and indent == 0:
                self._close_table()
                block_lines = [body]
                closed_comment = stripped.startswith("<!--") and "-->" in stripped
                is_comment = stripped.startswith("<!--")
                i += 1
                while i < n and not closed_comment:
                    cur = _expand(lines[i])[indent:]
                    if is_comment:
                        block_lines.append(cur)
                        if "-->" in cur:
                            i += 1
                            break
                        i += 1
                        continue
                    if not cur.strip():
                        break
                    block_lines.append(cur)
                    i += 1
                html_body = "\n".join(block_lines).strip()
                if html_body:
                    self.html_blocks += 1
                    self.doc.add_code(
                        text=f"{_START_MARKER}{html_body}{_STOP_MARKER}",
                        parent=parent,
                    )
                continue

            # paragraph (possibly a pipe table)
            para_lines = [stripped]
            i += 1
            while i < n:
                cur = _expand(lines[i])[indent:] if len(_expand(lines[i])) >= indent \
                    else _expand(lines[i]).lstrip(" ")
                cs = cur.strip()
                if (
                    not cs
                    or _ATX.match(cs)
                    or _BULLET.match(cs)
                    or _ORDERED.match(cs)
                    or (_FENCE.match(cs) and _indent_of(cur) <= 3)
                    or (_HTML_OPEN.match(cs) and indent == 0)
                ):
                    break
                para_lines.append(cs)
                i += 1

            # pipe table: buffered within ONE paragraph only — marko's
            # BlankLine / next Paragraph element hits the reference walk's
            # else-branch which closes the table (md_backend.py:438-441),
            # so a following plain paragraph is NEVER swallowed
            pipe_idx = next(
                (k for k, pl in enumerate(para_lines) if "|" in pl), None
            )
            if pipe_idx is not None:
                head = para_lines[:pipe_idx]
                # the reference wraps the marko Paragraph in an inline group
                # BEFORE iterating its children (md_backend.py:444-448);
                # table-row children are then buffered, not emitted, so a
                # table-only paragraph with >1 inline children leaves an
                # EMPTY inline group in the document (pinned by the
                # committed inline_and_formatting.md.yaml groundtruth)
                n_children = len(para_lines) - 1  # LineBreak children
                head_pieces: list[Piece] = []
                for pl in head:
                    sub = parse_inlines(pl)
                    head_pieces.extend(sub)
                    n_children += len(sub)
                for tl in para_lines[pipe_idx:]:
                    n_children += len(parse_inlines(tl))
                if n_children > 1:
                    holder = self.doc.add_group(
                        name="group", label=model.GROUP_INLINE, parent=parent
                    )
                    for p in head_pieces:
                        if p.kind == "image" or p.text.strip() or p.kind == "code":
                            self._emit_leaf(p, holder)
                elif head:
                    self._emit_paragraph(head, parent)
                self._buffer_table_lines(para_lines[pipe_idx:], new_paragraph=False)
                self._close_table()
                continue

            self._emit_paragraph(para_lines, parent)

    # -- lists ---------------------------------------------------------------

    def _parse_list(
        self,
        lines: list[str],
        i: int,
        n: int,
        indent: int,
        parent: Optional[model.Node],
    ) -> int:
        """Parse a run of sibling list items at this indent; returns the next
        line index. Bullet-char change starts a new list (CommonMark);
        ordered/unordered switch likewise."""
        doc = self.doc

        items: list[tuple[bool, list[str]]] = []  # (enumerated, content lines)
        cur_marker: Optional[str] = None
        ordered = False

        while i < n:
            raw = _expand(lines[i])
            body = raw[indent:] if len(raw) >= indent else raw.lstrip(" ")
            cs = body.strip()
            if not cs:
                # blank: list continues if an indented continuation or a new
                # same-style marker follows
                j = i + 1
                while j < n and not _expand(lines[j])[indent:].strip():
                    j += 1
                if j >= n:
                    break
                nxt = _expand(lines[j])[indent:]
                if _indent_of(nxt) >= 1 or self._same_marker(
                    nxt.strip(), cur_marker, ordered
                ):
                    i = j
                    continue
                break
            if _indent_of(body) > 3:
                break
            mb = _BULLET.match(cs)
            mo = _ORDERED.match(cs)
            if not mb and not mo:
                break
            marker = mb.group(1) if mb else mo.group(2)
            is_ordered = mo is not None
            if cur_marker is None:
                cur_marker, ordered = marker, is_ordered
            elif marker != cur_marker or is_ordered != ordered:
                break  # new list starts here
            content_first = (mb.group(2) if mb else mo.group(3)) or ""
            # content column: marker width + 1 space (tabs already expanded)
            content_col = indent + _indent_of(body) + (
                len(mb.group(1)) + 1 if mb else len(mo.group(1)) + len(mo.group(2)) + 1
            )
            item_lines = [content_first] if content_first.strip() else []
            i += 1
            while i < n:
                cont = _expand(lines[i])
                if not cont.strip():
                    # look ahead: continuation?
                    j = i + 1
                    while j < n and not _expand(lines[j]).strip():
                        j += 1
                    if j < n and len(_expand(lines[j])) > content_col and \
                            _indent_of(_expand(lines[j])) >= content_col:
                        item_lines.append("")
                        i += 1
                        continue
                    break
                if _indent_of(cont) >= content_col:
                    item_lines.append(cont[content_col:])
                    i += 1
                    continue
                break
            items.append((is_ordered, item_lines))

        non_empty = [it for it in items if any(s.strip() for s in it[1])]
        if not non_empty:
            return i
        group = doc.add_list_group(name="list", parent=parent)
        group.label = model.GROUP_ORDERED_LIST if ordered else model.GROUP_LIST
        for is_ordered, item_lines in items:
            if not any(s.strip() for s in item_lines):
                continue
            # first paragraph → the item text; nested blocks recurse under it
            first_para: list[str] = []
            k = 0
            while k < len(item_lines):
                s = item_lines[k]
                if not s.strip():
                    break
                if _BULLET.match(s.strip()) or _ORDERED.match(s.strip()) or \
                        _indent_of(s) >= 4 or _FENCE.match(s.strip()):
                    break
                first_para.append(s.strip())
                k += 1
            rest = item_lines[k:]
            if first_para and "|" in first_para[0]:
                self._buffer_table_lines(first_para, new_paragraph=False)
                self._close_table()
                item_node: Optional[model.Node] = None
            elif first_para:
                pieces = []
                n_children = len(first_para) - 1
                for pline in first_para:
                    sub = parse_inlines(pline)
                    pieces.extend(sub)
                    n_children += len(sub)
                item_node = self._emit_pieces(
                    pieces, n_children, group,
                    as_list_item=True, enumerated=is_ordered,
                )
            else:
                item_node = None
            if any(s.strip() for s in rest):
                self._parse_blocks(
                    rest, 0, parent=item_node if item_node is not None else group
                )
        return i

    @staticmethod
    def _same_marker(s: str, marker: Optional[str], ordered: bool) -> bool:
        if marker is None:
            return False
        mb = _BULLET.match(s)
        mo = _ORDERED.match(s)
        if ordered:
            return mo is not None and mo.group(2) == marker
        return mb is not None and mb.group(1) == marker


def extract_markdown_tree(data: bytes) -> Document:
    """Markdown bytes → Document (pure-md path; no HTML re-route)."""
    text = data.decode("utf-8", errors="replace")
    parser = _MdParser()
    parser.parse(_shorten_underscores(text))
    return parser.doc


def extract_markdown(data: bytes) -> Document:
    """Markdown bytes → Document, including the reference's embedded-HTML
    re-route: when HTML blocks were buffered, the whole document is
    serialized to HTML (markers unwrapped to splice the original HTML
    back verbatim) and re-parsed through the HTML backend
    (md_backend.py:510-545)."""
    text = data.decode("utf-8", errors="replace")
    parser = _MdParser()
    parser.parse(_shorten_underscores(text))
    if parser.html_blocks == 0:
        return parser.doc

    from doc_parser_spark.core.serialize import export_html
    from doc_parser_spark.html.extractor import extract_html

    html_str = export_html(
        parser.doc, layers=(model.BODY, model.FURNITURE)
    )

    def _unwrap(m: re.Match) -> str:
        # splice the ORIGINAL html back: undo export_html's escaping
        # (reverse order of esc: &lt;/&gt; first, &amp; last)
        inner = m.group(1)
        return (
            inner.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
        )

    html_str = re.sub(
        rf"<pre><code>\s*{re.escape(_START_MARKER)}(.*?)"
        rf"{re.escape(_STOP_MARKER)}\s*</code></pre>",
        _unwrap,
        html_str,
        flags=re.DOTALL,
    )
    return extract_html(html_str.encode("utf-8"))
