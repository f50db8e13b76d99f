"""Office-container (zip+XML) backends: DOCX / XLSX / PPTX / HWPX.

The reference implements these with python-docx / openpyxl / python-pptx /
custom HWPX XML walks (SURVEY.md §2.4 Op-35..43). None of those libraries
ship here, and the container formats are just zip archives of XML — so
these backends parse them with stdlib ``zipfile`` + ``xml.etree``,
re-expressing the reference's extraction semantics:

* DOCX  (``docling/backend/msword_backend.py:40-1163``): paragraphs with
  style-based heading levels, numbered/bulleted list items, tables from
  ``w:tbl`` with gridSpan/vMerge, text runs joined per paragraph.
* XLSX  (``docling/backend/msexcel_backend.py:72-538``): shared-string
  resolution, one table per sheet from the used range, sheet = page.
* PPTX  (``docling/backend/mspowerpoint_backend.py:35-398``): slide = page,
  title placeholder → heading, body text frames → paragraphs/lists.
* HWPX  (``docling/backend/xml/hwpx_backend.py:28-1314``): Contents/
  section*.xml paragraph runs (``hp:t``), tables (``hp:tbl``).

Container routing sniffs ``[Content_Types].xml`` / well-known member paths
(the reference's zip disambiguation, ``docling/datamodel/document.py:366-411``).
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"

def detect_zip_kind(payload: bytes) -> str:
    """docx | xlsx | pptx | hwpx | zip (unknown container)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        names = set(zf.namelist())
    except zipfile.BadZipFile:
        return "zip"
    if "word/document.xml" in names:
        return "docx"
    if "xl/workbook.xml" in names:
        return "xlsx"
    if "ppt/presentation.xml" in names:
        return "pptx"
    if any(n.startswith("Contents/section") for n in names) or "Contents/content.hpf" in names:
        return "hwpx"
    return "zip"


# -- DOCX --------------------------------------------------------------------


def _docx_para_text(p) -> str:
    parts = []
    for node in p.iter():
        if node.tag == f"{_W}t":
            parts.append(node.text or "")
        elif node.tag in (f"{_W}br", f"{_W}cr"):
            parts.append("\n")
        elif node.tag == f"{_W}tab":
            parts.append("\t")
    return "".join(parts)


def _docx_heading_level(p) -> int | None:
    """Heading level from pStyle (msword_backend: styles → headings).
    Returns 0 for Title, N for heading N, None for body text."""
    pPr = p.find(f"{_W}pPr")
    if pPr is None:
        return None
    style = pPr.find(f"{_W}pStyle")
    if style is None:
        return None
    val = (style.get(f"{_W}val") or "").lower()
    if val in ("title", "doctitle"):
        return 0
    m = re.match(r"^heading\s*(\d)$", val)
    if m:
        return int(m.group(1))
    return None


def _docx_is_list_item(p) -> tuple[bool, bool]:
    """(is_list_item, is_numbered) via numPr.

    The reference treats every numbered-list paragraph as a plain (bullet)
    list item — its numbered-style check is disabled and is_numbered is
    hardcoded False (msword_backend.py:717); numId alone cannot distinguish
    bullets from numbers (both carry one). Mirrored here."""
    pPr = p.find(f"{_W}pPr")
    if pPr is None:
        return False, False
    return pPr.find(f"{_W}numPr") is not None, False


def _docx_table(tbl) -> model.TableData:
    rows = tbl.findall(f"{_W}tr")
    grid: list[list[str]] = []
    data = model.TableData()
    for tr in rows:
        row_cells = []
        for tc in tr.findall(f"{_W}tc"):
            texts = [_docx_para_text(p) for p in tc.findall(f"{_W}p")]
            row_cells.append("\n".join(t for t in texts if t).strip())
        grid.append(row_cells)
    num_rows = len(grid)
    num_cols = max((len(r) for r in grid), default=0)
    data.num_rows, data.num_cols = num_rows, num_cols
    data.grid = [r + [""] * (num_cols - len(r)) for r in grid]
    for ri, row in enumerate(data.grid):
        for ci, text in enumerate(row):
            data.cells.append(
                model.TableCellData(
                    text=text, start_row=ri, end_row=ri + 1,
                    start_col=ci, end_col=ci + 1, column_header=(ri == 0),
                )
            )
    return data


def extract_docx(payload: bytes) -> Document:
    zf = zipfile.ZipFile(io.BytesIO(payload))
    root = ET.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{_W}body")
    doc = Document()
    if body is None:
        return doc

    parents: dict[int, model.Node] = {}

    def parent_for(level: int):
        for l in range(level - 1, -1, -1):
            if l in parents:
                return parents[l]
        return None

    current = None
    list_group = None
    for child in body:
        if child.tag == f"{_W}p":
            text = _docx_para_text(child).strip()
            hlevel = _docx_heading_level(child)
            if hlevel is not None and text:
                list_group = None
                if hlevel == 0:
                    parents.clear()
                    node = doc.add_text(text=text, label=model.TITLE)
                    parents[0] = node
                else:
                    node = doc.add_heading(
                        text=text, level=hlevel, parent=parent_for(hlevel)
                    )
                    parents[hlevel] = node
                    for k in [k for k in parents if k > hlevel]:
                        del parents[k]
                current = node
            elif text:
                is_li, numbered = _docx_is_list_item(child)
                if is_li:
                    if list_group is None:
                        list_group = doc.add_list_group(
                            name="ordered list" if numbered else "list",
                            parent=current,
                        )
                    doc.add_list_item(
                        text=text, enumerated=numbered, parent=list_group
                    )
                else:
                    list_group = None
                    doc.add_text(text=text, label=model.TEXT, parent=current)
        elif child.tag == f"{_W}tbl":
            list_group = None
            doc.add_table(data=_docx_table(child), parent=current)
    return doc


# -- XLSX --------------------------------------------------------------------


def _xlsx_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    strings = []
    for si in root.findall(f"{_S}si"):
        strings.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
    return strings


_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    m = _CELL_REF.match(ref)
    if not m:
        return 0
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - 64)
    return col - 1


def extract_xlsx(payload: bytes) -> Document:
    zf = zipfile.ZipFile(io.BytesIO(payload))
    shared = _xlsx_shared_strings(zf)
    doc = Document()
    sheets = sorted(
        (n for n in zf.namelist()
         if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)", n).group(1)),
    )
    for page_no, name in enumerate(sheets, start=1):
        root = ET.fromstring(zf.read(name))
        grid_map: dict[int, dict[int, str]] = {}
        for row in root.iter(f"{_S}row"):
            r = int(row.get("r", "0")) - 1
            for c in row.findall(f"{_S}c"):
                ref = c.get("r", "A1")
                ci = _col_index(ref)
                v = c.find(f"{_S}v")
                if v is None or v.text is None:
                    continue
                if c.get("t") == "s":
                    idx = int(v.text)
                    val = shared[idx] if idx < len(shared) else ""
                else:
                    val = v.text
                grid_map.setdefault(r, {})[ci] = val
        if not grid_map:
            continue
        max_r = max(grid_map)
        max_c = max(max(cols) for cols in grid_map.values())
        data = model.TableData(num_rows=max_r + 1, num_cols=max_c + 1)
        data.grid = [
            [grid_map.get(r, {}).get(c, "") for c in range(max_c + 1)]
            for r in range(max_r + 1)
        ]
        for ri, row_vals in enumerate(data.grid):
            for ci, text in enumerate(row_vals):
                data.cells.append(
                    model.TableCellData(
                        text=text, start_row=ri, end_row=ri + 1,
                        start_col=ci, end_col=ci + 1, column_header=(ri == 0),
                    )
                )
        doc.add_table(data=data, page_no=page_no)
    return doc


# -- PPTX --------------------------------------------------------------------


def extract_pptx(payload: bytes) -> Document:
    zf = zipfile.ZipFile(io.BytesIO(payload))
    doc = Document()
    slides = sorted(
        (n for n in zf.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)", n).group(1)),
    )
    for page_no, name in enumerate(slides, start=1):
        root = ET.fromstring(zf.read(name))
        for sp in root.iter(f"{_P}sp"):
            # title placeholder → heading (mspowerpoint_backend title handler)
            ph = sp.find(f".//{_P}nvSpPr/{_P}nvPr/{_P}ph")
            is_title = ph is not None and (ph.get("type") or "") in ("title", "ctrTitle")
            for para in sp.iter(f"{_A}p"):
                text = "".join(t.text or "" for t in para.iter(f"{_A}t")).strip()
                if not text:
                    continue
                if is_title:
                    doc.add_heading(text=text, level=1, page_no=page_no)
                    is_title = False  # only the first paragraph is the title
                else:
                    doc.add_text(text=text, label=model.TEXT, page_no=page_no)
    return doc


# -- HWPX --------------------------------------------------------------------

_HP = "{http://www.hancom.co.kr/hwpml/2011/paragraph}"


def extract_hwpx(payload: bytes) -> Document:
    zf = zipfile.ZipFile(io.BytesIO(payload))
    doc = Document()
    sections = sorted(
        (n for n in zf.namelist()
         if re.fullmatch(r"Contents/section\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)", n).group(1)),
    )
    for page_no, name in enumerate(sections, start=1):
        root = ET.fromstring(zf.read(name))
        # paragraphs nested in tables are rendered by the table handler, not
        # as body text (ElementTree lacks parent pointers → identity set)
        table_paras = {
            id(p) for tbl in root.iter(f"{_HP}tbl") for p in tbl.iter(f"{_HP}p")
        }
        for p in root.iter(f"{_HP}p"):
            if id(p) in table_paras:
                continue
            text = "".join(t.text or "" for t in p.iter(f"{_HP}t")).strip()
            if text:
                doc.add_text(text=text, label=model.TEXT, page_no=page_no)
        for tbl in root.iter(f"{_HP}tbl"):
            rows = tbl.findall(f"{_HP}tr")
            grid = []
            for tr in rows:
                grid.append(
                    [
                        "".join(t.text or "" for t in tc.iter(f"{_HP}t")).strip()
                        for tc in tr.findall(f"{_HP}tc")
                    ]
                )
            if not grid:
                continue
            num_cols = max(len(r) for r in grid)
            data = model.TableData(num_rows=len(grid), num_cols=num_cols)
            data.grid = [r + [""] * (num_cols - len(r)) for r in grid]
            for ri, row_vals in enumerate(data.grid):
                for ci, text in enumerate(row_vals):
                    data.cells.append(
                        model.TableCellData(
                            text=text, start_row=ri, end_row=ri + 1,
                            start_col=ci, end_col=ci + 1, column_header=(ri == 0),
                        )
                    )
            doc.add_table(data=data, page_no=page_no)
    return doc


def extract_office(payload: bytes) -> tuple[Document, str]:
    """Route a zip container to its backend; returns (doc, detected_kind)."""
    kind = detect_zip_kind(payload)
    if kind == "docx":
        return extract_docx(payload), kind
    if kind == "xlsx":
        return extract_xlsx(payload), kind
    if kind == "pptx":
        return extract_pptx(payload), kind
    if kind == "hwpx":
        return extract_hwpx(payload), kind
    raise ValueError("unrecognized zip container")
