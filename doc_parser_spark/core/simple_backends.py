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
    """Markdown → document tree (headings/lists/code/tables/paragraphs).

    Applies the reference's ``_shorten_underscore_sequences`` normalization
    (md_backend.py: long ``___`` runs collapsed) before parsing.
    """
    text = data.decode("utf-8", errors="replace")
    text = _MD_UNDERSCORES.sub("__", text)
    doc = Document()

    parents: dict[int, model.Node] = {}

    def parent_for_level(level: int):
        for l in range(level - 1, -1, -1):
            if l in parents:
                return parents[l]
        return None

    lines = text.split("\n")
    i = 0
    para_buf: list[str] = []
    list_group: model.Node | None = None
    current_parent = None

    def flush_para():
        nonlocal para_buf
        if para_buf:
            joined = " ".join(s.strip() for s in para_buf).strip()
            if joined:
                doc.add_text(text=joined, label=model.TEXT, parent=current_parent)
            para_buf = []

    while i < len(lines):
        line = lines[i]

        if line.lstrip().startswith("```"):
            flush_para()
            list_group = None
            code_lines = []
            i += 1
            while i < len(lines) and not lines[i].lstrip().startswith("```"):
                code_lines.append(lines[i])
                i += 1
            doc.add_code(text="\n".join(code_lines), parent=current_parent)
            i += 1
            continue

        m = _MD_HEADING.match(line)
        if m:
            flush_para()
            list_group = None
            hlevel = len(m.group(1))
            heading_text = m.group(2).strip()
            if hlevel == 1:
                parents.clear()
                node = doc.add_text(text=heading_text, label=model.TITLE)
                parents[1] = node
            else:
                node = doc.add_heading(
                    text=heading_text, level=hlevel - 1, parent=parent_for_level(hlevel)
                )
                parents[hlevel] = node
                for k in [k for k in parents if k > hlevel]:
                    del parents[k]
            current_parent = node
            i += 1
            continue

        mu, mo = _MD_ULIST.match(line), _MD_OLIST.match(line)
        if mu or mo:
            flush_para()
            if list_group is None:
                name = "ordered list" if mo else "list"
                list_group = doc.add_list_group(name=name, parent=current_parent)
            if mo:
                doc.add_list_item(
                    text=mo.group(3).strip(),
                    enumerated=True,
                    marker=f"{mo.group(2)}.",
                    parent=list_group,
                )
            else:
                doc.add_list_item(text=mu.group(2).strip(), parent=list_group)
            i += 1
            continue

        if line.strip().startswith("|") and line.count("|") >= 2:
            flush_para()
            list_group = None
            rows = []
            while i < len(lines) and lines[i].strip().startswith("|"):
                cells = [c.strip() for c in lines[i].strip().strip("|").split("|")]
                if not all(re.fullmatch(r":?-{2,}:?", c) for c in cells):
                    rows.append(cells)
                i += 1
            if rows:
                num_cols = max(len(r) for r in rows)
                data_t = model.TableData(num_rows=len(rows), num_cols=num_cols)
                grid = []
                for ri, row in enumerate(rows):
                    padded = row + [""] * (num_cols - len(row))
                    grid.append(padded)
                    for ci, cell_text in enumerate(padded):
                        data_t.cells.append(
                            model.TableCellData(
                                text=cell_text,
                                start_row=ri,
                                end_row=ri + 1,
                                start_col=ci,
                                end_col=ci + 1,
                                column_header=(ri == 0),
                            )
                        )
                data_t.grid = grid
                doc.add_table(data=data_t, parent=current_parent)
            continue

        if not line.strip():
            flush_para()
            list_group = None
        else:
            para_buf.append(line)
        i += 1

    flush_para()
    return doc


def extract_csv(data: bytes) -> Document:
    """CSV → single table, first row = header (csv_backend.py:17-125)."""
    text = data.decode("utf-8", errors="replace")
    try:
        dialect = csv.Sniffer().sniff(text[:4096], delimiters=",;\t|")
    except csv.Error:
        dialect = csv.excel
    rows = list(csv.reader(io.StringIO(text), dialect))
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
