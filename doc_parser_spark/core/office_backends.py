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
import posixpath
import re
import zipfile
from xml.etree import ElementTree as ET

from doc_parser_spark.core import model
from doc_parser_spark.core.limits import BoundedZipFile
from doc_parser_spark.core.model import Document

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"

def detect_zip_kind(payload: bytes) -> str:
    """docx | xlsx | pptx | hwpx | epub | odt | ods | odp | zip (unknown)."""
    try:
        zf = BoundedZipFile(io.BytesIO(payload))
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
    mimetype = b""
    if "mimetype" in names:
        try:
            mimetype = zf.read("mimetype").strip()
        except Exception:
            mimetype = b""
    if mimetype == b"application/epub+zip" or "META-INF/container.xml" in names:
        return "epub"
    from doc_parser_spark.core.odf_backend import detect_odf_kind

    odf = detect_odf_kind(names, mimetype)
    if odf:
        return odf
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


_XDR = "{http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing}"


def _xlsx_sheet_images(
    zf: zipfile.ZipFile, sheet_path: str
) -> list[tuple[tuple[int, int, int, int], bytes]]:
    """(anchor box, image bytes) per embedded picture, in drawing document
    order (openpyxl ``ws._images``). The anchor is the TwoCellAnchor grid
    box (from.col, from.row, to.col+1, to.row+1); one-cell/absolute anchors
    yield (0, 0, 0, 0) (msexcel_backend.py:494-502). Charts are
    graphicFrames and are dropped, matching the reference."""
    m = re.match(r"xl/worksheets/(sheet[^/]+)$", sheet_path)
    if not m:
        return []
    rels_path = f"xl/worksheets/_rels/{m.group(1)}.rels"
    try:
        rroot = ET.fromstring(zf.read(rels_path))
    except (KeyError, ET.ParseError):
        return []
    out: list[tuple[tuple[int, int, int, int], bytes]] = []
    for rel in rroot.iter(f"{_REL_NS}Relationship"):
        if not rel.get("Type", "").endswith("/drawing"):
            continue
        target = rel.get("Target", "").replace("../", "xl/")
        try:
            droot = ET.fromstring(zf.read(target))
        except (KeyError, ET.ParseError):
            continue
        drels = _pptx_part_rels(zf, target)

        def _cellref(el, tag):
            node = el.find(f"{_XDR}{tag}")
            try:
                return (
                    int(node.find(f"{_XDR}col").text),
                    int(node.find(f"{_XDR}row").text),
                )
            except (AttributeError, TypeError, ValueError):
                return 0, 0

        for anchor_el in droot:
            if anchor_el.tag == f"{_XDR}twoCellAnchor":
                fc, fr = _cellref(anchor_el, "from")
                tc, tr = _cellref(anchor_el, "to")
                anchor = (fc, fr, tc + 1, tr + 1)
            elif anchor_el.tag in (
                f"{_XDR}oneCellAnchor", f"{_XDR}absoluteAnchor"
            ):
                anchor = (0, 0, 0, 0)
            else:
                continue
            for pic in anchor_el.iter(f"{_XDR}pic"):
                blip = pic.find(f".//{_A}blip")
                rid = blip.get(f"{_R_NS}embed") if blip is not None else None
                media = drels.get(rid or "")
                if not media:
                    continue
                try:
                    out.append((anchor, zf.read(media)))
                except KeyError:
                    continue
    return out


def extract_xlsx(payload: bytes) -> Document:
    """XLSX/XLSM → sheet groups with region-grown data tables + pictures.

    Replicates the reference's multi-table discovery
    (``msexcel_backend.py:289-475``): scan the used range row-major; each
    unvisited non-empty cell anchors a table whose bottom/right bounds grow
    while cells are non-empty or merged; all cells inside the rectangle are
    collected (gaps inside the rectangle read back ``str(None)``, merged
    ranges carry row/col spans). Sheets become ``section`` groups named
    ``sheet: <name>`` in workbook order; pictures follow the tables."""
    zf = BoundedZipFile(io.BytesIO(payload))
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
        # every item's TOPLEFT grid bbox; the page size is the overall
        # extent (right-left, bottom-top) once the sheet is done
        # (msexcel_backend.py:192-203, 521-545)
        sheet_boxes: list[tuple[float, float, float, float]] = []

        def set_prov(node, l, t, r, b):
            node.bbox = (float(l), float(t), float(r), float(b))
            node.coord_origin = "TOPLEFT"
            node.charspan = (0, 0)
            sheet_boxes.append(node.bbox)

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
                    node = doc.add_table(
                        data=table, parent=group, page_no=page_no
                    )
                    set_prov(node, sc, sr, sc + num_cols, sr + num_rows)
                    visited.update(cell_visited)

        for anchor, blob in _xlsx_sheet_images(zf, path):
            meta = _raster_image_meta(blob, dpi=72)
            if meta is None:  # "could not extract the image from excel sheets"
                continue
            node = doc.add_picture(parent=group, page_no=page_no)
            node.image_meta = meta
            set_prov(node, *anchor)

        if sheet_boxes:
            doc.page_sizes[page_no] = (
                max(b[2] for b in sheet_boxes) - min(b[0] for b in sheet_boxes),
                max(b[3] for b in sheet_boxes) - min(b[1] for b in sheet_boxes),
            )
        else:
            doc.page_sizes[page_no] = (0.0, 0.0)
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


def _pptx_para_text(p, br: str = " ") -> str:
    """python-pptx content_children walk: runs + fields keep their text,
    line breaks become ``br`` — a single space in the reference's paragraph
    accumulation (mspowerpoint_backend.py:158-163), a vertical tab in
    python-pptx ``.text`` properties (used for charspans/cell text)."""
    parts = []
    for child in p:
        if child.tag in (f"{_A}r", f"{_A}fld"):
            t = child.find(f"{_A}t")
            parts.append(t.text or "" if t is not None else "")
        elif child.tag == f"{_A}br":
            parts.append(br)
    return "".join(parts)


def _pptx_frame_text(body) -> str:
    """python-pptx TextFrame.text: paragraphs joined with newlines, line
    breaks as vertical tabs."""
    return "\n".join(
        _pptx_para_text(p, br="\v") for p in body.findall(f"{_A}p")
    )


# layout -> master placeholder-type fallback map
# (python-pptx placeholder.py LayoutPlaceholder._base_placeholder)
_PH_BASE_TYPE = {
    "body": "body", "chart": "body", "clipArt": "body", "ctrTitle": "title",
    "dgm": "body", "dt": "dt", "ftr": "ftr", "media": "body", "obj": "body",
    "pic": "body", "sldNum": "sldNum", "subTitle": "body", "title": "title",
    "tbl": "body",
}


def _pptx_ph(el):
    """The shape's p:ph element (placeholder marker), if any."""
    for tag in ("nvSpPr", "nvPicPr", "nvGraphicFramePr", "nvGrpSpPr"):
        ph = el.find(f"{_P}{tag}/{_P}nvPr/{_P}ph")
        if ph is not None:
            return ph
    return None


def _pptx_shape_xfrm(el) -> dict:
    """Directly-applied EMU geometry from the shape's own xfrm element
    (python-pptx BaseShape.left/top/width/height; graphicFrames carry a
    p:xfrm child, other shapes spPr/a:xfrm)."""
    if el.tag == f"{_P}graphicFrame":
        xfrm = el.find(f"{_P}xfrm")
    else:
        xfrm = el.find(f"{_P}spPr/{_A}xfrm")
    vals: dict = {}
    if xfrm is None:
        return vals
    off, ext = xfrm.find(f"{_A}off"), xfrm.find(f"{_A}ext")
    try:
        if off is not None:
            vals["left"], vals["top"] = int(off.get("x")), int(off.get("y"))
        if ext is not None:
            vals["width"] = int(ext.get("cx"))
            vals["height"] = int(ext.get("cy"))
    except (TypeError, ValueError):
        return {}
    return vals


def _pptx_part_rels(zf: zipfile.ZipFile, part_path: str) -> dict[str, str]:
    """rId -> zip member path for a part's relationships."""
    base = part_path.rsplit("/", 1)[0]
    rels_path = f"{base}/_rels/{part_path.rsplit('/', 1)[1]}.rels"
    out: dict[str, str] = {}
    try:
        rroot = ET.fromstring(zf.read(rels_path))
    except (KeyError, ET.ParseError):
        return out
    for rel in rroot.iter(f"{_REL_NS}Relationship"):
        target = rel.get("Target", "")
        if target.startswith("/"):
            resolved = target.lstrip("/")
        else:
            resolved = posixpath.normpath(posixpath.join(base, target))
        out[rel.get("Id", "")] = resolved
    return out


def _pptx_rel_root(zf, rels: dict[str, str], rroot_types: dict[str, str],
                   type_suffix: str):
    """(path, parsed root) of the first relationship whose Type ends with
    ``type_suffix``, or None."""
    for rid, target in rels.items():
        if rroot_types.get(rid, "").endswith(type_suffix):
            try:
                return target, ET.fromstring(zf.read(target))
            except (KeyError, ET.ParseError):
                return None
    return None


def _pptx_rel_types(zf: zipfile.ZipFile, part_path: str) -> dict[str, str]:
    base = part_path.rsplit("/", 1)[0]
    rels_path = f"{base}/_rels/{part_path.rsplit('/', 1)[1]}.rels"
    try:
        rroot = ET.fromstring(zf.read(rels_path))
    except (KeyError, ET.ParseError):
        return {}
    return {
        rel.get("Id", ""): rel.get("Type", "")
        for rel in rroot.iter(f"{_REL_NS}Relationship")
    }


def _pptx_layout_geoms(zf: zipfile.ZipFile, slide_path: str,
                       rels: dict[str, str]) -> dict[str, dict]:
    """ph idx -> resolved layout placeholder geometry, layout values with
    master fallback by mapped placeholder type (python-pptx
    _InheritsGeometryMixin / LayoutPlaceholder._base_placeholder)."""
    found = _pptx_rel_root(zf, rels, _pptx_rel_types(zf, slide_path),
                           "/slideLayout")
    if found is None:
        return {}
    layout_path, lroot = found
    lrels = _pptx_part_rels(zf, layout_path)
    master = _pptx_rel_root(zf, lrels, _pptx_rel_types(zf, layout_path),
                            "/slideMaster")
    master_by_type: dict[str, dict] = {}
    if master is not None:
        for sp in master[1].iter(f"{_P}sp"):
            ph = _pptx_ph(sp)
            if ph is not None:
                master_by_type.setdefault(
                    ph.get("type", "obj"), _pptx_shape_xfrm(sp)
                )
    out: dict[str, dict] = {}
    for sp in lroot.iter(f"{_P}sp"):
        ph = _pptx_ph(sp)
        if ph is None:
            continue
        vals = dict(_pptx_shape_xfrm(sp))
        base = master_by_type.get(
            _PH_BASE_TYPE.get(ph.get("type", "obj"), ""), {}
        )
        for k, v in base.items():
            vals.setdefault(k, v)
        out.setdefault(ph.get("idx", "0"), vals)
    return out


class _PptxCtx:
    """Per-slide walk context: zip handle, slide rels, resolved layout
    placeholder geometry, slide size in EMU."""

    def __init__(self, zf, rels, ph_geoms, slide_size):
        self.zf = zf
        self.rels = rels
        self.ph_geoms = ph_geoms
        self.slide_size = slide_size


def _pptx_geom(el, ctx: "_PptxCtx") -> dict:
    """Effective shape geometry: own xfrm attrs, missing ones inherited from
    the layout placeholder with the same idx (python-pptx per-attribute
    _effective_value)."""
    vals = dict(_pptx_shape_xfrm(el))
    ph = _pptx_ph(el)
    if ph is not None:
        for k, v in ctx.ph_geoms.get(ph.get("idx", "0"), {}).items():
            vals.setdefault(k, v)
    return vals


def _pptx_set_prov(node, vals: dict, page_no: int, text: str,
                   slide_size: tuple[int, int]) -> None:
    """generate_prov (mspowerpoint_backend.py:103-121): a falsy left (absent
    OR zero) yields the full-slide bbox; BoundingBox.from_tuple with
    BOTTOMLEFT stores (l=left, b=top, r=left+w, t=top+h) with min/max
    swaps; charspan is [0, len(text)]."""
    if vals.get("left"):
        left, top = vals["left"], vals.get("top") or 0
        width = vals.get("width") or 0
        height = vals.get("height") or 0
    else:
        left, top = 0, 0
        width, height = slide_size
    l, b = float(left), float(top)
    r, t = float(left + width), float(top + height)
    if r < l:
        l, r = r, l
    if b > t:
        b, t = t, b
    node.bbox = (l, t, r, b)
    node.coord_origin = "BOTTOMLEFT"
    node.charspan = (0, len(text))
    node.page_no = page_no


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
    """python-pptx cell.text: paragraph texts joined with newlines, breaks
    as vertical tabs, then stripped (mspowerpoint_backend.py:297)."""
    body = tc.find(f"{_A}txBody")
    if body is None:
        return ""
    return _pptx_frame_text(body).strip()


def _pptx_handle_table(tbl, doc: Document, parent: model.Node, page_no: int,
                       vals: dict, slide_size: tuple[int, int]) -> None:
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
        node = doc.add_table(data=table, parent=parent, page_no=page_no)
        _pptx_set_prov(node, vals, page_no, "", slide_size)


def _pptx_placeholder_type(sp) -> str:
    ph = sp.find(f".//{_P}nvSpPr/{_P}nvPr/{_P}ph")
    if ph is None:
        return ""
    return ph.get("type", "body")


def _pptx_handle_text(sp, doc: Document, parent: model.Node, page_no: int,
                      vals: dict, slide_size: tuple[int, int]) -> None:
    body = sp.find(f"{_P}txBody")
    if body is None:
        return
    paras = body.findall(f"{_A}p")
    # emptiness gate + charspan both use python-pptx shape.text.strip()
    # (mspowerpoint_backend.py:128,361-363)
    shape_text = _pptx_frame_text(body).strip()
    if not shape_text:
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
            node = doc.add_list_item(
                text=p_text, enumerated=enumerated, marker=marker,
                parent=list_group, page_no=page_no,
            )
        else:
            # subtitle keeps PARAGRAPH (the reference's SECTION_HEADER
            # assignment is a bare no-op expression, mspowerpoint_backend.py:201)
            label = model.TITLE if is_title else model.PARAGRAPH
            node = doc.add_text(
                text=p_text, label=label, parent=parent, page_no=page_no
            )
        _pptx_set_prov(node, vals, page_no, shape_text, slide_size)


def _pptx_png_dpi(blob: bytes) -> float | None:
    """PNG pHYs horizontal density as PIL reports it (meters -> dpi)."""
    pos = 8
    while pos + 8 <= len(blob):
        length = int.from_bytes(blob[pos:pos + 4], "big")
        ctype = blob[pos + 4:pos + 8]
        if ctype == b"pHYs" and length >= 9:
            ppux = int.from_bytes(blob[pos + 8:pos + 12], "big")
            unit = blob[pos + 16]
            if unit == 1:  # meters
                return ppux * 0.0254
            return None
        if ctype == b"IDAT":
            return None
        pos += 12 + length
    return None


def _pptx_jpeg_dpi(blob: bytes) -> float | None:
    """JFIF APP0 horizontal density (units 1=dpi, 2=dpcm)."""
    if blob[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            return None
        marker = blob[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = int.from_bytes(blob[pos + 2:pos + 4], "big")
        if marker == 0xE0 and blob[pos + 4:pos + 9] == b"JFIF\x00":
            units = blob[pos + 11]
            xdens = int.from_bytes(blob[pos + 12:pos + 14], "big")
            if units == 1:
                return float(xdens)
            if units == 2:
                return xdens * 2.54
            return None
        if marker == 0xDA:
            return None
        pos += 2 + seglen
    return None


def _raster_image_meta(blob: bytes, dpi: int | None = None) -> dict | None:
    """Decode an embedded raster into an ImageRef-shaped dict the way the
    reference does (PIL open + ImageRef.from_pil; undecodable images return
    None and the picture is dropped). With ``dpi=None`` the density comes
    from the image header per python-pptx Image.dpi (rounded, clamped to
    [1, 2048] else 72, mspowerpoint_backend.py:235-256); callers like XLSX
    pass a fixed dpi (msexcel_backend.py:505)."""
    dpi_raw = None
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            from .png import decode_png

            arr = decode_png(blob)
            dpi_raw = _pptx_png_dpi(blob)
        elif blob[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            arr = decode_jpeg(blob)
            dpi_raw = _pptx_jpeg_dpi(blob)
        elif blob[:2] == b"BM":
            from .wmf import decode_bmp

            arr = decode_bmp(blob)
        else:
            return None
    except Exception:
        return None
    if dpi is None:
        try:
            dpi = int(round(float(dpi_raw)))
            if dpi < 1 or dpi > 2048:
                dpi = 72
        except (TypeError, ValueError):
            dpi = 72
    import base64

    from .png import encode_png

    h, w = arr.shape[:2]
    uri = "data:image/png;base64," + base64.b64encode(encode_png(arr)).decode()
    return {
        "mimetype": "image/png",
        "dpi": dpi,
        "size": {"width": float(w), "height": float(h)},
        "uri": uri,
    }


def _pptx_handle_picture(pic, doc: Document, parent: model.Node, page_no: int,
                         vals: dict, ctx: "_PptxCtx") -> None:
    blip = pic.find(f".//{_A}blip")
    rid = blip.get(f"{_R_NS}embed") if blip is not None else None
    target = ctx.rels.get(rid or "")
    if not target:  # linked (not embedded) image: hasattr(shape,'image') False
        return
    try:
        blob = ctx.zf.read(target)
    except KeyError:
        return
    meta = _raster_image_meta(blob)
    if meta is None:
        return
    node = doc.add_picture(parent=parent, page_no=page_no)
    node.image_meta = meta
    _pptx_set_prov(node, vals, page_no, "", ctx.slide_size)


def _pptx_walk_shapes(el, doc: Document, parent: model.Node, page_no: int,
                      ctx: "_PptxCtx") -> None:
    for child in el:
        tag = child.tag
        if tag == f"{_P}grpSp":  # groups recurse, members flatten in order
            _pptx_walk_shapes(child, doc, parent, page_no, ctx)
        elif tag == f"{_P}graphicFrame":
            tbl = child.find(f".//{_A}tbl")
            if tbl is not None:
                _pptx_handle_table(
                    tbl, doc, parent, page_no, _pptx_geom(child, ctx),
                    ctx.slide_size,
                )
        elif tag == f"{_P}pic":
            _pptx_handle_picture(
                child, doc, parent, page_no, _pptx_geom(child, ctx), ctx
            )
        elif tag == f"{_P}sp":
            _pptx_handle_text(
                child, doc, parent, page_no, _pptx_geom(child, ctx),
                ctx.slide_size,
            )


def extract_pptx(payload: bytes) -> Document:
    """PPTX → one ``chapter`` group per slide (``slide-{i}``), shapes in
    slide-XML order: group shapes flattened recursively, tables from
    graphicFrames (empty cells skipped, merged spans honored), pictures,
    title placeholders → TITLE, other non-list paragraphs → PARAGRAPH,
    bullet/auto-numbered/indented paragraphs → one list group per shape
    with explicit ``N.`` markers for numbered items
    Geometry-aware like the reference: every item carries a prov entry with
    the shape's EMU bbox (full-slide box when the effective left is falsy),
    slide sizes land in ``pages``, and embedded pictures become ImageRef
    data URIs (``mspowerpoint_backend.py:103-398``)."""
    zf = BoundedZipFile(io.BytesIO(payload))
    doc = Document()
    slide_size = _pptx_slide_size(zf)
    for i, path in enumerate(_pptx_slide_targets(zf)):
        try:
            root = ET.fromstring(zf.read(path))
        except ET.ParseError:
            continue
        slide_group = doc.add_group(name=f"slide-{i}", label=model.GROUP_CHAPTER)
        doc.page_sizes[i + 1] = (float(slide_size[0]), float(slide_size[1]))
        rels = _pptx_part_rels(zf, path)
        ctx = _PptxCtx(zf, rels, _pptx_layout_geoms(zf, path, rels), slide_size)
        sp_tree = root.find(f"{_P}cSld/{_P}spTree")
        if sp_tree is not None:
            _pptx_walk_shapes(sp_tree, doc, slide_group, i + 1, ctx)
        # notes → furniture text with a zero TOPLEFT bbox
        # (mspowerpoint_backend.py:380-398); only the body placeholder frame
        # counts (python-pptx NotesSlide.notes_text_frame)
        found = _pptx_rel_root(zf, rels, _pptx_rel_types(zf, path), "/notesSlide")
        if found is not None:
            for sp in found[1].iter(f"{_P}sp"):
                ph = _pptx_ph(sp)
                if ph is None or ph.get("type") != "body":
                    continue
                body = sp.find(f"{_P}txBody")
                notes = _pptx_frame_text(body).strip() if body is not None else ""
                if notes:
                    node = doc.add_text(
                        text=notes, label=model.TEXT, parent=slide_group,
                        content_layer=model.FURNITURE, page_no=i + 1,
                    )
                    node.bbox = (0.0, 0.0, 0.0, 0.0)
                    node.coord_origin = "TOPLEFT"
                    node.charspan = (0, len(notes))
                break
    return doc


def _pptx_slide_size(zf: zipfile.ZipFile) -> tuple[int, int]:
    """Presentation-level slide size in EMU (p:sldSz; python-pptx default
    10x7.5in when absent)."""
    try:
        proot = ET.fromstring(zf.read("ppt/presentation.xml"))
    except (KeyError, ET.ParseError):
        return 9144000, 6858000
    sldsz = proot.find(f"{_P}sldSz")
    if sldsz is None:
        return 9144000, 6858000
    try:
        return int(sldsz.get("cx")), int(sldsz.get("cy"))
    except (TypeError, ValueError):
        return 9144000, 6858000


# -- HWPX --------------------------------------------------------------------

_HP = "{http://www.hancom.co.kr/hwpml/2011/paragraph}"
_HC = "{http://www.hancom.co.kr/hwpml/2011/core}"

# BinData lookup order mirrors the reference's extension probe
# (hwpx_backend.py:1199-1214); we include .wmf and .tif because
# core/wmf.py and core/tiff.py can decode them natively (the reference
# needs ImageMagick/Wand for both and drops them without it).
_HWPX_IMG_EXTS = (".bmp", ".png", ".jpg", ".jpeg", ".wmf", ".tif")


def _hwpx_image_meta(zf, pic_el) -> dict | None:
    """<hp:pic> → ImageRef-shaped dict (hwpx_backend.py:217-241): read
    the hc:img binaryItemIDRef payload from BinData/, converting WMF to
    PNG through the native rasterizer first."""
    img = pic_el.find(f".//{_HC}img")
    if img is None:
        return None
    bin_id = img.get("binaryItemIDRef")
    if not bin_id:
        return None
    blob = None
    for ext in _HWPX_IMG_EXTS:
        try:
            blob = zf.read(f"BinData/{bin_id}{ext}")
            break
        except KeyError:
            continue
    if not blob:
        return None
    if blob[:4] in (b"\xd7\xcd\xc6\x9a",) or (
        len(blob) >= 6 and blob[:2] in (b"\x01\x00", b"\x02\x00")
        and blob[2:4] == b"\x09\x00"
    ):
        from .wmf import wmf_to_png

        blob = wmf_to_png(blob)
        if blob is None:
            return None
    elif blob[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import tiff_to_png

        blob = tiff_to_png(blob)
        if blob is None:
            return None
    return _raster_image_meta(blob, dpi=72)


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
    zf = BoundedZipFile(io.BytesIO(payload))
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
                    if tag == "pic":
                        meta = _hwpx_image_meta(zf, child)
                        if meta is not None:
                            node = doc.add_picture(
                                parent=current_section, page_no=page_no
                            )
                            node.image_meta = meta
                        continue
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
    if kind == "epub":
        from doc_parser_spark.core.epub_backend import extract_epub

        return extract_epub(payload), kind
    if kind in ("odt", "ods", "odp", "odf"):
        from doc_parser_spark.core.odf_backend import extract_odf

        return extract_odf(payload)
    raise ValueError("unrecognized zip container")
