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


def extract_docx(payload: bytes) -> Document:
    """DOCX → document tree (delegates to the python-docx-equivalent
    backend, :mod:`doc_parser_spark.core.docx_backend` — groundtruth-
    validated byte-exact on all 12 reference fixtures incl. textboxes,
    numbered headers, list nesting, merged tables and OMML equations)."""
    from doc_parser_spark.core.docx_backend import extract_docx as _impl

    return _impl(payload)


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


_XLSX_BUILTIN_DATE_FMTS = {
    14: "mm-dd-yy", 15: "d-mmm-yy", 16: "d-mmm", 17: "mmm-yy",
    18: "h:mm AM/PM", 19: "h:mm:ss AM/PM", 20: "h:mm", 21: "h:mm:ss",
    22: "m/d/yy h:mm", 45: "mm:ss", 46: "[h]:mm:ss", 47: "mmss.0",
}


def _xlsx_is_date_fmt(fmt: str) -> bool:
    """openpyxl ``is_date_format`` heuristic: a d/m/h/y/s code outside
    quoted literals and bracket sections marks a date/time format."""
    out = []
    in_quote = in_bracket = False
    for ch in fmt:
        if ch == '"':
            in_quote = not in_quote
        elif ch == "[" and not in_quote:
            in_bracket = True
        elif ch == "]" and not in_quote:
            in_bracket = False
        elif not in_quote and not in_bracket:
            out.append(ch)
    return bool(re.search(r"[dmhys]", "".join(out), re.IGNORECASE))


def _xlsx_date_styles(zf: zipfile.ZipFile) -> set[int]:
    """Indices into cellXfs whose number format is a date/time format."""
    try:
        root = ET.fromstring(zf.read("xl/styles.xml"))
    except (KeyError, ET.ParseError):
        return set()
    custom = {}
    for nf in root.iter(f"{_S}numFmt"):
        try:
            custom[int(nf.get("numFmtId", "-1"))] = nf.get("formatCode", "")
        except ValueError:
            pass
    date_styles = set()
    cellxfs = root.find(f"{_S}cellXfs")
    if cellxfs is None:
        return set()
    for i, xf in enumerate(cellxfs.findall(f"{_S}xf")):
        try:
            fmt_id = int(xf.get("numFmtId", "0"))
        except ValueError:
            continue
        fmt = custom.get(fmt_id) or _XLSX_BUILTIN_DATE_FMTS.get(fmt_id)
        if fmt_id in _XLSX_BUILTIN_DATE_FMTS or (fmt and _xlsx_is_date_fmt(fmt)):
            date_styles.add(i)
    return date_styles


def _xlsx_serial_to_str(serial: float) -> str:
    """Excel 1900-system serial → ``str(datetime)`` (openpyxl from_excel:
    epoch 1899-12-30 absorbs the Lotus leap-year bug)."""
    import datetime as _dt

    base = _dt.datetime(1899, 12, 30)
    # round to microseconds like openpyxl (avoids float drift)
    value = base + _dt.timedelta(days=serial)
    micro = round(value.microsecond, -3)
    if micro >= 1_000_000:
        value += _dt.timedelta(seconds=1)
        micro = 0
    return str(value.replace(microsecond=int(micro)))


def _xlsx_cell_text(c, shared: list, date_styles: set) -> object:
    """openpyxl ``cell.value`` equivalent, rendered via ``str()`` by the
    caller (msexcel_backend.py:372 ``text=str(cell.value)``). Returns None
    for valueless cells."""
    t = c.get("t", "n")
    f = c.find(f"{_S}f")
    if f is not None and t not in ("s", "inlineStr", "b", "e", "str"):
        # data_only=False workbook: formula cells read back as the formula
        return "=" + (f.text or "")
    if t == "inlineStr":
        is_el = c.find(f"{_S}is")
        if is_el is None:
            return None
        return "".join(tt.text or "" for tt in is_el.iter(f"{_S}t"))
    v = c.find(f"{_S}v")
    if v is None or v.text is None:
        return None
    txt = v.text
    if t == "s":
        idx = int(txt)
        return shared[idx] if idx < len(shared) else ""
    if t == "b":
        return txt not in ("0", "false", "FALSE")
    if t in ("e", "str"):
        return txt
    # numeric: int unless a fraction/exponent is present (openpyxl
    # _cast_number), dates resolved through the cell style
    try:
        num = float(txt) if ("." in txt or "e" in txt or "E" in txt) else int(txt)
    except ValueError:
        return txt
    try:
        style = int(c.get("s", "-1"))
    except ValueError:
        style = -1
    if style in date_styles:
        return _xlsx_serial_to_str(float(num))
    return num


def _xlsx_sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """(sheet name, member path) in WORKBOOK order (xl/workbook.xml sheet
    sequence + workbook rels — NOT filename order, which diverges after a
    user reorders sheets)."""
    rels = {}
    try:
        rroot = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rroot.iter(
            "{http://schemas.openxmlformats.org/package/2006/relationships}Relationship"
        ):
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target.lstrip("/")
            else:
                target = "xl/" + target
            rels[rel.get("Id", "")] = target.replace("xl/../", "")
    except (KeyError, ET.ParseError):
        pass
    out = []
    try:
        wroot = ET.fromstring(zf.read("xl/workbook.xml"))
    except (KeyError, ET.ParseError):
        wroot = ET.Element("none")
    rns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    for sh in wroot.iter(f"{_S}sheet"):
        rid = sh.get(f"{rns}id", "")
        target = rels.get(rid)
        if target and target in zf.namelist():
            out.append((sh.get("name", ""), target))
    if not out:
        # rels-less containers (or repaired files): filename order fallback
        sheets = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)", n).group(1)),
        )
        out = [
            (f"Sheet{i}", n)
            for i, n in enumerate(sheets, start=1)
        ]
    return out


def _xlsx_sheet_pictures(zf: zipfile.ZipFile, sheet_path: str) -> int:
    """Number of embedded pictures on the sheet (openpyxl ``ws._images``:
    <xdr:pic> elements of the sheet drawing; charts are graphicFrames and
    are dropped, matching the reference)."""
    m = re.match(r"xl/worksheets/(sheet[^/]+)$", sheet_path)
    if not m:
        return 0
    rels_path = f"xl/worksheets/_rels/{m.group(1)}.rels"
    try:
        rroot = ET.fromstring(zf.read(rels_path))
    except (KeyError, ET.ParseError):
        return 0
    count = 0
    xdr = "{http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing}"
    for rel in rroot.iter(
        "{http://schemas.openxmlformats.org/package/2006/relationships}Relationship"
    ):
        if rel.get("Type", "").endswith("/drawing"):
            target = rel.get("Target", "").replace("../", "xl/")
            try:
                droot = ET.fromstring(zf.read(target))
            except (KeyError, ET.ParseError):
                continue
            count += sum(1 for _ in droot.iter(f"{xdr}pic"))
    return count


def extract_xlsx(payload: bytes) -> Document:
    """XLSX/XLSM → sheet groups with region-grown data tables + pictures.

    Replicates the reference's multi-table discovery
    (``msexcel_backend.py:289-475``): scan the used range row-major; each
    unvisited non-empty cell anchors a table whose bottom/right bounds grow
    while cells are non-empty or merged; all cells inside the rectangle are
    collected (gaps inside the rectangle read back ``str(None)``, merged
    ranges carry row/col spans). Sheets become ``section`` groups named
    ``sheet: <name>`` in workbook order; pictures follow the tables."""
    zf = zipfile.ZipFile(io.BytesIO(payload))
    shared = _xlsx_shared_strings(zf)
    date_styles = _xlsx_date_styles(zf)
    doc = Document()

    for sheet_idx, (sheet_name, path) in enumerate(_xlsx_sheet_targets(zf)):
        try:
            root = ET.fromstring(zf.read(path))
        except ET.ParseError:
            continue
        values: dict[tuple[int, int], object] = {}
        for row in root.iter(f"{_S}row"):
            for c in row.findall(f"{_S}c"):
                ref = c.get("r")
                if ref is None:
                    continue
                m = _CELL_REF.match(ref)
                if not m:
                    continue
                r, ci = int(m.group(2)) - 1, _col_index(ref)
                val = _xlsx_cell_text(c, shared, date_styles)
                if val is not None:
                    values[(r, ci)] = val
        merged: list[tuple[int, int, int, int]] = []
        for mc in root.iter(f"{_S}mergeCell"):
            ref = mc.get("ref", "")
            if ":" in ref:
                a, b = ref.split(":", 1)
                ma, mb = _CELL_REF.match(a), _CELL_REF.match(b)
                if ma and mb:
                    merged.append(
                        (int(ma.group(2)) - 1, _col_index(a),
                         int(mb.group(2)) - 1, _col_index(b))
                    )

        group = doc.add_group(
            name=f"sheet: {sheet_name}", label=model.GROUP_SECTION
        )
        page_no = sheet_idx + 1

        def merged_at(r: int, c: int):
            for mr in merged:
                if mr[0] <= r <= mr[2] and mr[1] <= c <= mr[3]:
                    return mr
            return None

        if values:
            max_row = max(r for r, _ in values)
            max_col = max(c for _, c in values)
            visited: set[tuple[int, int]] = set()
            for sr in range(max_row + 1):
                for sc in range(max_col + 1):
                    if (sr, sc) in visited or (sr, sc) not in values:
                        continue
                    # grow bottom along column sc
                    bottom = sr
                    ri = sr + 1
                    while ri <= max_row:
                        mr = merged_at(ri, sc)
                        if (ri, sc) not in values and mr is None:
                            break
                        bottom = max(bottom, mr[2] if mr else ri)
                        ri += 1
                    # grow right along row sr
                    right = sc
                    cj = sc + 1
                    while cj <= max_col:
                        mr = merged_at(sr, cj)
                        if (sr, cj) not in values and mr is None:
                            break
                        right = max(right, mr[3] if mr else cj)
                        cj += 1

                    num_rows = bottom + 1 - sr
                    num_cols = right + 1 - sc
                    table = model.TableData(num_rows=num_rows, num_cols=num_cols)
                    grid = [[None] * num_cols for _ in range(num_rows)]
                    cell_visited: set[tuple[int, int]] = set()
                    for ri in range(sr, bottom + 1):
                        for cj in range(sc, right + 1):
                            mr = merged_at(ri, cj)
                            row_span = (mr[2] - mr[0] + 1) if mr else 1
                            col_span = (mr[3] - mr[1] + 1) if mr else 1
                            if (ri, cj) in cell_visited:
                                continue
                            text = str(values.get((ri, cj)))
                            table.cells.append(
                                model.TableCellData(
                                    text=text, row_span=row_span, col_span=col_span,
                                    start_row=ri - sr, end_row=ri - sr + row_span,
                                    start_col=cj - sc, end_col=cj - sc + col_span,
                                    column_header=(ri == sr),
                                )
                            )
                            for rr in range(ri, ri + row_span):
                                for cc in range(cj, cj + col_span):
                                    cell_visited.add((rr, cc))
                                    if rr - sr < num_rows and cc - sc < num_cols:
                                        grid[rr - sr][cc - sc] = text
                    table.grid = grid
                    doc.add_table(data=table, parent=group, page_no=page_no)
                    visited.update(cell_visited)

        for _ in range(_xlsx_sheet_pictures(zf, path)):
            doc.add_picture(parent=group, page_no=page_no)
    return doc


# -- PPTX --------------------------------------------------------------------


_R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _pptx_slide_targets(zf: zipfile.ZipFile) -> list[str]:
    """Slide member paths in PRESENTATION order (p:sldIdLst + rels)."""
    rels = {}
    out: list[str] = []
    try:
        rroot = ET.fromstring(zf.read("ppt/_rels/presentation.xml.rels"))
        for rel in rroot.iter(f"{_REL_NS}Relationship"):
            rels[rel.get("Id", "")] = "ppt/" + rel.get("Target", "").lstrip("/")
        proot = ET.fromstring(zf.read("ppt/presentation.xml"))
    except (KeyError, ET.ParseError):
        proot = None
    for sld in (proot.iter(f"{_P}sldId") if proot is not None else ()):
        target = rels.get(sld.get(f"{_R_NS}id", ""), "")
        if target in zf.namelist():
            out.append(target)
    if not out:
        out = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)", n).group(1)),
        )
    return out


def _pptx_para_text(p) -> str:
    """python-pptx content_children walk: runs + fields keep their text,
    line breaks become single spaces (mspowerpoint_backend.py:158-163)."""
    parts = []
    for child in p:
        if child.tag in (f"{_A}r", f"{_A}fld"):
            t = child.find(f"{_A}t")
            parts.append(t.text or "" if t is not None else "")
        elif child.tag == f"{_A}br":
            parts.append(" ")
    return "".join(parts)


def _pptx_is_list_item(p) -> tuple[bool, bool]:
    """(is_list, enumerated): a:buChar → bullet, a:buAutoNum → numbered,
    indent level > 0 → unnumbered sub-list (mspowerpoint_backend.py:133-150)."""
    if p.find(f".//{_A}buChar") is not None:
        return True, False
    if p.find(f".//{_A}buAutoNum") is not None:
        return True, True
    ppr = p.find(f"{_A}pPr")
    if ppr is not None and int(ppr.get("lvl", "0") or "0") > 0:
        return True, False
    return False, False


def _pptx_cell_text(tc) -> str:
    """python-pptx cell.text: paragraph texts joined with newlines, then
    stripped (mspowerpoint_backend.py:297)."""
    paras = []
    body = tc.find(f"{_A}txBody")
    if body is None:
        return ""
    for p in body.findall(f"{_A}p"):
        paras.append("".join(
            (t.text or "") for t in p.iter(f"{_A}t")
        ))
    return "\n".join(paras).strip()


def _pptx_handle_table(tbl, doc: Document, parent: model.Node, page_no: int) -> None:
    rows = tbl.findall(f"{_A}tr")
    num_rows = len(rows)
    num_cols = max((len(tr.findall(f"{_A}tc")) for tr in rows), default=0)
    table = model.TableData(num_rows=num_rows, num_cols=num_cols)
    grid: list[list] = [[None] * num_cols for _ in range(num_rows)]
    any_cell = False
    for ri, tr in enumerate(rows):
        for ci, tc in enumerate(tr.findall(f"{_A}tc")):
            text = _pptx_cell_text(tc)
            if not text:
                continue  # empty cells skipped (mspowerpoint_backend.py:308)
            row_span = int(tc.get("rowSpan", "1") or "1")
            col_span = int(tc.get("gridSpan", "1") or "1")
            any_cell = True
            table.cells.append(
                model.TableCellData(
                    text=text, row_span=row_span, col_span=col_span,
                    start_row=ri, end_row=ri + row_span,
                    start_col=ci, end_col=ci + col_span,
                    column_header=(ri == 0),
                )
            )
            for rr in range(ri, min(ri + row_span, num_rows)):
                for cc in range(ci, min(ci + col_span, num_cols)):
                    grid[rr][cc] = text
    table.grid = grid
    if any_cell:
        doc.add_table(data=table, parent=parent, page_no=page_no)


def _pptx_placeholder_type(sp) -> str:
    ph = sp.find(f".//{_P}nvSpPr/{_P}nvPr/{_P}ph")
    if ph is None:
        return ""
    return ph.get("type", "body")


def _pptx_handle_text(sp, doc: Document, parent: model.Node, page_no: int) -> None:
    body = sp.find(f"{_P}txBody")
    if body is None:
        return
    paras = body.findall(f"{_A}p")
    shape_text = "\n".join(_pptx_para_text(p) for p in paras)
    if not shape_text.strip():
        return
    ph_type = _pptx_placeholder_type(sp)
    is_title = ph_type in ("title", "ctrTitle")
    list_group = None
    enum_value = 0
    for p in paras:
        is_list, enumerated = _pptx_is_list_item(p)
        p_text = _pptx_para_text(p)
        if is_list:
            if list_group is None:
                list_group = doc.add_list_group(name="list", parent=parent)
                enum_value = 0
            marker = ""
            if enumerated:
                enum_value += 1
                marker = f"{enum_value}."
            doc.add_list_item(
                text=p_text, enumerated=enumerated, marker=marker,
                parent=list_group, page_no=page_no,
            )
        else:
            # subtitle keeps PARAGRAPH (the reference's SECTION_HEADER
            # assignment is a bare no-op expression, mspowerpoint_backend.py:201)
            label = model.TITLE if is_title else model.PARAGRAPH
            doc.add_text(text=p_text, label=label, parent=parent, page_no=page_no)


def _pptx_walk_shapes(el, doc: Document, parent: model.Node, page_no: int) -> None:
    for child in el:
        tag = child.tag
        if tag == f"{_P}grpSp":  # groups recurse, members flatten in order
            _pptx_walk_shapes(child, doc, parent, page_no)
        elif tag == f"{_P}graphicFrame":
            tbl = child.find(f".//{_A}tbl")
            if tbl is not None:
                _pptx_handle_table(tbl, doc, parent, page_no)
        elif tag == f"{_P}pic":
            doc.add_picture(parent=parent, page_no=page_no)
        elif tag == f"{_P}sp":
            _pptx_handle_text(child, doc, parent, page_no)


def extract_pptx(payload: bytes) -> Document:
    """PPTX → one ``chapter`` group per slide (``slide-{i}``), shapes in
    slide-XML order: group shapes flattened recursively, tables from
    graphicFrames (empty cells skipped, merged spans honored), pictures,
    title placeholders → TITLE, other non-list paragraphs → PARAGRAPH,
    bullet/auto-numbered/indented paragraphs → one list group per shape
    with explicit ``N.`` markers for numbered items
    (``mspowerpoint_backend.py:124-398``)."""
    zf = zipfile.ZipFile(io.BytesIO(payload))
    doc = Document()
    for i, path in enumerate(_pptx_slide_targets(zf)):
        try:
            root = ET.fromstring(zf.read(path))
        except ET.ParseError:
            continue
        slide_group = doc.add_group(name=f"slide-{i}", label=model.GROUP_CHAPTER)
        sp_tree = root.find(f"{_P}cSld/{_P}spTree")
        if sp_tree is not None:
            _pptx_walk_shapes(sp_tree, doc, slide_group, i + 1)
        # notes → furniture text (mspowerpoint_backend.py:380-398)
        m = re.match(r"ppt/slides/(slide[^/]+)\.xml$", path)
        if m:
            rels_path = f"ppt/slides/_rels/{m.group(1)}.xml.rels"
            try:
                rroot = ET.fromstring(zf.read(rels_path))
            except (KeyError, ET.ParseError):
                continue
            for rel in rroot.iter(f"{_REL_NS}Relationship"):
                if rel.get("Type", "").endswith("/notesSlide"):
                    target = "ppt/" + rel.get("Target", "").replace("../", "")
                    try:
                        nroot = ET.fromstring(zf.read(target))
                    except (KeyError, ET.ParseError):
                        continue
                    notes = "\n".join(
                        _pptx_para_text(p) for p in nroot.iter(f"{_A}p")
                    ).strip()
                    if notes:
                        doc.add_text(
                            text=notes, label=model.TEXT, parent=slide_group,
                            content_layer=model.FURNITURE, page_no=i + 1,
                        )
    return doc


# -- HWPX --------------------------------------------------------------------

_HP = "{http://www.hancom.co.kr/hwpml/2011/paragraph}"


_ROMAN_HEADER = re.compile("^(?:\\d+\\.\\s+|[\u2160\u2161\u2162\u2163\u2164\u2165\u2166\u2167\u2168\u2169]+\\.\\s*)")
_HWPX_LIST_SYMBOLS = {"\u25a1": 0, "o": 1, "-": 2, "*": 2}


def _hwpx_text(el) -> str:
    return "".join(t.text or "" for t in el.iter(f"{_HP}t"))


def _hwpx_is_toc_entry(p) -> bool:
    """TOC entries carry a tab followed by a page number
    (hwpx_backend.py:95-114 + :404-409): '3. Title<tab/>9'."""
    if p.find(f".//{_HP}tab") is None:
        return False
    full = " ".join(
        (t.text or "") + "".join(
            (tb.tail or "") for tb in t.findall(f"{_HP}tab")
        )
        for t in p.iter(f"{_HP}t")
    )
    return re.search(r"\d+\s*$", full.strip()) is not None


def _hwpx_table(tbl, doc: Document, parent, page_no: int) -> None:
    rows = tbl.findall(f"{_HP}tr")
    grid = []
    for tr in rows:
        grid.append(
            ["".join(t.text or "" for t in tc.iter(f"{_HP}t")).strip()
             for tc in tr.findall(f"{_HP}tc")]
        )
    if not grid:
        return
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
    doc.add_table(data=data, parent=parent, page_no=page_no)


def extract_hwpx(payload: bytes) -> Document:
    """HWPX → document tree with the fork's Korean-document heuristics
    (``docling/backend/xml/hwpx_backend.py``):

    * mini-tables of shape 1x1/1x2/1x3 promote to SECTION_HEADER when the
      text is <= 200 chars and unseen (:330-346); larger tables stay tables
    * rect/drawText shapes promote to SECTION_HEADER the same way (:350-369)
    * tab-plus-trailing-page-number paragraphs are TOC entries — kept as
      plain paragraphs, never headers (:95-114, :404-409)
    * ``N. `` / roman-numeral headers (:425-432), deduplicated by
      whitespace-normalized text
    * list symbols 'square/o/-/*' open nested list groups via a level
      stack (:115-163)
    """
    zf = zipfile.ZipFile(io.BytesIO(payload))
    doc = Document()
    sections = sorted(
        (n for n in zf.namelist()
         if re.fullmatch(r"Contents/section\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)", n).group(1)),
    )
    seen_headers: set[str] = set()
    current_section = None
    list_stack: list[tuple] = []  # (group node, symbol level)

    def add_header(text: str, page_no: int):
        nonlocal current_section
        seen_headers.add("".join(text.split()))
        list_stack.clear()
        current_section = doc.add_heading(text=text, level=1, page_no=page_no)
        return current_section

    def add_para(text: str, page_no: int, parent=None) -> None:
        doc.add_text(
            text=text, label=model.PARAGRAPH,
            parent=parent if parent is not None else current_section,
            page_no=page_no,
        )

    def handle_list_symbol(txt: str, page_no: int) -> bool:
        sym = txt[0] if txt else ""
        if sym not in _HWPX_LIST_SYMBOLS:
            return False
        level = _HWPX_LIST_SYMBOLS[sym]
        while list_stack and list_stack[-1][1] >= level:
            list_stack.pop()
        parent_group = list_stack[-1][0] if list_stack else current_section
        group = doc.add_list_group(name="list", parent=parent_group)
        list_stack.append((group, level))
        doc.add_text(
            text=txt, label=model.PARAGRAPH, parent=group, page_no=page_no
        )
        return True

    for page_no, name in enumerate(sections, start=1):
        try:
            root = ET.fromstring(zf.read(name))
        except ET.ParseError:
            continue
        nested = {
            id(sub)
            for tbl in root.iter(f"{_HP}tbl")
            for sub in tbl.iter(f"{_HP}p")
        } | {
            id(sub)
            for rect in root.iter(f"{_HP}rect")
            for sub in rect.iter(f"{_HP}p")
        }
        # document-order dispatch: body paragraphs and STANDALONE tables
        # (a tbl outside any paragraph renders directly; run-embedded mini
        # tables are handled inside the paragraph walk)
        para_tbls = {
            id(t)
            for p in root.iter(f"{_HP}p")
            if id(p) not in nested
            for t in p.iter(f"{_HP}tbl")
        }
        inner_tbls = {
            id(sub)
            for tbl in root.iter(f"{_HP}tbl")
            for sub in tbl.iter(f"{_HP}tbl")
            if sub is not tbl
        }
        ordered = []
        for el in root.iter():
            tag = el.tag.rsplit("}", 1)[-1]
            if tag == "p" and id(el) not in nested:
                ordered.append(("p", el))
            elif (
                tag == "tbl"
                and id(el) not in para_tbls
                and id(el) not in inner_tbls
            ):
                ordered.append(("tbl", el))
        for kind, el in ordered:
            if kind == "tbl":
                _hwpx_table(el, doc, current_section, page_no)
                continue
            p = el
            has_secpr = p.find(f".//{_HP}secPr") is not None
            has_text = p.find(f".//{_HP}run/{_HP}t") is not None
            if has_secpr and not has_text:
                continue

            runs = p.findall(f"{_HP}run")
            header_added = False
            consumed_runs: set[int] = set()
            for ri, run in enumerate(runs):
                for child in run:
                    tag = child.tag.rsplit("}", 1)[-1]
                    if tag == "tbl":
                        trs = child.findall(f"{_HP}tr")
                        rows = int(child.get("rowCnt", len(trs)) or len(trs))
                        first_tr = trs[0] if trs else None
                        cols_default = (
                            len(first_tr.findall(f"{_HP}tc")) if first_tr is not None else 0
                        )
                        cols = int(child.get("colCnt", cols_default) or cols_default)
                        txt = " ".join(
                            (t.text or "") for t in child.iter(f"{_HP}t")
                        ).strip()
                        norm = "".join(txt.split())
                        if (
                            (rows, cols) in ((1, 1), (1, 2), (1, 3))
                            and txt
                            and len(txt) <= 200
                            and norm not in seen_headers
                        ):
                            add_header(txt, page_no)
                            header_added = True
                            consumed_runs.add(ri)
                        else:
                            _hwpx_table(child, doc, current_section, page_no)
                            consumed_runs.add(ri)
                        break
                    if tag == "rect":
                        draw = child.find(f".//{_HP}drawText")
                        if draw is None:
                            continue
                        txt = "".join(
                            t.text or "" for t in draw.iter(f"{_HP}t")
                        ).strip()
                        norm = "".join(txt.split())
                        if txt and len(txt) <= 200 and norm not in seen_headers:
                            add_header(txt, page_no)
                            header_added = True
                            consumed_runs.add(ri)
                        break
            if header_added:
                for ri, run in enumerate(runs):
                    if ri in consumed_runs:
                        continue
                    txt = " ".join(
                        (t.text or "") for t in run.findall(f".//{_HP}t")
                    ).strip()
                    if txt:
                        add_para(txt, page_no)
                continue
            if consumed_runs:
                # table-only paragraph already rendered
                leftovers = [
                    " ".join((t.text or "") for t in run.findall(f".//{_HP}t")).strip()
                    for ri, run in enumerate(runs)
                    if ri not in consumed_runs
                ]
                for txt in leftovers:
                    if txt:
                        add_para(txt, page_no)
                continue

            full = " ".join(
                (t.text or "")
                for run in runs
                for t in run.findall(f"{_HP}t")
            ).strip()
            if not full:
                continue
            if _hwpx_is_toc_entry(p):
                add_para(full, page_no)
                continue
            norm = "".join(full.split())
            if _ROMAN_HEADER.match(full) and norm not in seen_headers:
                add_header(full, page_no)
                continue
            if handle_list_symbol(full, page_no):
                continue
            list_stack.clear()
            add_para(full, page_no)
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
