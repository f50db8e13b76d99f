"""Plain-text / Markdown / CSV extraction branches.

Lightweight counterparts of the reference's declarative backends kept for
format-surface completeness (SURVEY.md §2.4): Markdown (marko-based,
``docling/backend/md_backend.py:65-554``), CSV dialect-sniffed single table
(``docling/backend/csv_backend.py:17-125``), and the plain-text loader of the
LangChain-style path (``doc_preprocessors/attachment_processor.py:298+``).
marko is unavailable; the Markdown walk here is a deterministic line-based
parser covering the block constructs the corpus uses (headings, lists,
fenced code, paragraphs, pipe tables).
"""

from __future__ import annotations

import csv
import io
import re

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document

_MD_HEADING = re.compile(r"^(#{1,6})\s+(.*)$")
_MD_ULIST = re.compile(r"^(\s*)[-*+]\s+(.*)$")
_MD_OLIST = re.compile(r"^(\s*)(\d+)[.)]\s+(.*)$")
_MD_UNDERSCORES = re.compile(r"_{3,}")


def extract_text_doc(data: bytes) -> Document:
    """Plain text → one TEXT item per blank-line-separated paragraph."""
    text = data.decode("utf-8", errors="replace")
    doc = Document()
    for para in re.split(r"\n\s*\n", text):
        para = para.strip()
        if para:
            doc.add_text(text=para, label=model.TEXT)
    return doc


def extract_markdown(data: bytes) -> Document:
    """Markdown → document tree (delegates to the marko-semantics backend,
    :mod:`doc_parser_spark.core.md_backend` — groundtruth-validated against
    tests/data/groundtruth/docling_v2/*.md.md, embedded-HTML re-route
    included)."""
    from doc_parser_spark.core.md_backend import extract_markdown as _impl

    return _impl(data)


def extract_csv(data: bytes) -> Document:
    """CSV → single table, first row = header (csv_backend.py:17-125)."""
    text = data.decode("utf-8", errors="replace")
    # dialect is sniffed from the FIRST LINE only (csv_backend.py:58-59
    # readline + sniff) — sniffing a larger window can pick up a stray
    # quotechar from later rows (csv-too-few-columns.csv keeps 'b' literal)
    first_line = text.splitlines(keepends=True)[0] if text else ""
    try:
        dialect = csv.Sniffer().sniff(first_line, delimiters=",;\t|:")
    except csv.Error:
        dialect = csv.excel
    rows = list(csv.reader(io.StringIO(text), dialect, strict=True))
    doc = Document()
    if not rows:
        return doc
    num_cols = max(len(r) for r in rows)
    table = model.TableData(num_rows=len(rows), num_cols=num_cols)
    grid = []
    for ri, row in enumerate(rows):
        padded = list(row) + [""] * (num_cols - len(row))
        grid.append(padded)
        for ci, cell_text in enumerate(padded):
            table.cells.append(
                model.TableCellData(
                    text=cell_text,
                    start_row=ri,
                    end_row=ri + 1,
                    start_col=ci,
                    end_col=ci + 1,
                    column_header=(ri == 0),
                )
            )
    table.grid = grid
    doc.add_table(data=table)
    return doc


# -- AsciiDoc (reference: docling/backend/asciidoc_backend.py:29-443) --------

_ADOC_TITLE = re.compile(r"^= +(.*)$")
_ADOC_SECTION = re.compile(r"^(={2,6}) +(.*)$")
_ADOC_ULIST = re.compile(r"^(\*+|-) +(.*)$")
_ADOC_OLIST = re.compile(r"^(\.+) +(.*)$")
_ADOC_CAPTION = re.compile(r"^\.(\S.*)$")
_ADOC_IMAGE = re.compile(r"^image::?([^\[]+)\[(.*)\]\s*$")
_ADOC_TABLE_DELIM = re.compile(r"^\|={3,}\s*$")


def extract_asciidoc(data: bytes) -> Document:
    """AsciiDoc line-regex parser: titles/sections/lists/tables/images."""
    text = data.decode("utf-8", errors="replace")
    doc = Document()
    parents: dict[int, model.Node] = {}
    current = None
    list_group = None
    para: list[str] = []
    pending_caption = None

    def flush_para():
        nonlocal para
        if para:
            joined = " ".join(s.strip() for s in para).strip()
            if joined:
                doc.add_text(text=joined, label=model.TEXT, parent=current)
            para = []

    lines = text.split("\n")
    i = 0
    while i < len(lines):
        line = lines[i]

        if _ADOC_TABLE_DELIM.match(line):
            flush_para()
            list_group = None
            rows = []
            i += 1
            while i < len(lines) and not _ADOC_TABLE_DELIM.match(lines[i]):
                cells = [c.strip() for c in lines[i].split("|")[1:]]
                if cells:
                    rows.append(cells)
                i += 1
            i += 1
            if rows:
                num_cols = max(len(r) for r in rows)
                data_t = model.TableData(num_rows=len(rows), num_cols=num_cols)
                data_t.grid = [r + [""] * (num_cols - len(r)) for r in rows]
                for ri, row in enumerate(data_t.grid):
                    for ci, cell_text in enumerate(row):
                        data_t.cells.append(
                            model.TableCellData(
                                text=cell_text, start_row=ri, end_row=ri + 1,
                                start_col=ci, end_col=ci + 1,
                                column_header=(ri == 0),
                            )
                        )
                doc.add_table(data=data_t, parent=current)
            continue

        m = _ADOC_TITLE.match(line)
        if m:
            flush_para(); list_group = None
            parents.clear()
            node = doc.add_text(text=m.group(1).strip(), label=model.TITLE)
            parents[0] = node
            current = node
            i += 1; continue
        m = _ADOC_SECTION.match(line)
        if m:
            flush_para(); list_group = None
            level = len(m.group(1)) - 1
            parent = None
            for l in range(level - 1, -1, -1):
                if l in parents:
                    parent = parents[l]; break
            node = doc.add_heading(text=m.group(2).strip(), level=level, parent=parent)
            parents[level] = node
            for k in [k for k in parents if k > level]:
                del parents[k]
            current = node
            i += 1; continue
        m = _ADOC_IMAGE.match(line)
        if m:
            flush_para(); list_group = None
            caption = None
            cap_text = m.group(2).strip() or (pending_caption or "")
            if cap_text:
                caption = doc.add_text(text=cap_text, label=model.CAPTION)
            doc.add_picture(parent=current, caption=caption)
            pending_caption = None
            i += 1; continue
        m = _ADOC_ULIST.match(line)
        mo = _ADOC_OLIST.match(line)
        if m or mo:
            flush_para()
            if list_group is None:
                list_group = doc.add_list_group(
                    name="ordered list" if mo else "list", parent=current
                )
            if mo:
                doc.add_list_item(text=mo.group(2).strip(), enumerated=True,
                                  parent=list_group)
            else:
                doc.add_list_item(text=m.group(2).strip(), parent=list_group)
            i += 1; continue
        m = _ADOC_CAPTION.match(line)
        if m and not line.startswith(".."):
            pending_caption = m.group(1).strip()
            i += 1; continue
        if not line.strip():
            flush_para()
            list_group = None
        else:
            para.append(line)
        i += 1

    flush_para()
    return doc


# -- Generic article XML (JATS-spirit; reference: docling/backend/xml/) ------


def extract_xml_generic(data: bytes) -> Document:
    """Scientific-article-style XML → title/abstract/sections/paragraphs.

    A deterministic structural walk in the spirit of the JATS backend
    (``docling/backend/xml/jats_backend.py``): ``article-title``/``title``
    elements become headings, ``p`` elements paragraphs, in document order."""
    from xml.etree import ElementTree as ET

    doc = Document()
    try:
        root = ET.fromstring(data.decode("utf-8", errors="replace"))
    except ET.ParseError:
        return doc

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1].lower()

    def all_text(el) -> str:
        return " ".join("".join(el.itertext()).split())

    title_done = False
    for el in root.iter():
        name = local(el.tag)
        if name in ("article-title",) or (name == "title" and not title_done):
            text = all_text(el)
            if text:
                if not title_done:
                    doc.add_text(text=text, label=model.TITLE)
                    title_done = True
                continue
        elif name == "title":
            text = all_text(el)
            if text:
                doc.add_heading(text=text, level=1)
        elif name == "p":
            text = all_text(el)
            if text:
                doc.add_text(text=text, label=model.TEXT)
    return doc
