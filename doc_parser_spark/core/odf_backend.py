"""OpenDocument (ODF 1.x) backend: .odt text, .ods spreadsheet, .odp slides.

No reference counterpart — the reference converts LibreOffice-family
files by shelling out to LibreOffice itself
(``doc_preprocessors/attachment_processor.py:86-146`` converts to PDF
and re-parses); here the zip+XML container is read natively, the same
treatment the legacy binary Office formats got (``legacy_office.py``).

Structure mapping (content.xml, namespace-qualified):

* ``text:h``  (``text:outline-level``)          -> SECTION_HEADER
* ``text:p``                                    -> paragraph (text:s /
  text:tab / text:line-break expanded; annotations/tracked-deletions
  skipped)
* ``text:list`` / ``text:list-item``            -> (nested) list groups;
  ordered when the list style name carries a numbering hint
* ``table:table``                               -> TableData with
  number-columns/rows-spanned spans + number-columns-repeated expansion
  (repeat runs capped; trailing all-empty rows/columns trimmed the way
  LibreOffice's used-range does)
* ``draw:frame`` + ``draw:image``               -> PICTURE (+ svg:title /
  svg:desc caption)
* .ods: one chapter group per sheet (sheet name as SECTION_HEADER)
* .odp: one chapter group per ``draw:page`` (PPTX-slide treatment);
  ``presentation:class="title"`` frames -> TITLE/SECTION_HEADER
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET

from doc_parser_spark.core import model
from doc_parser_spark.core.limits import BoundedZipFile
from doc_parser_spark.core.model import Document, TableCellData, TableData

_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_DRAW = "{urn:oasis:names:tc:opendocument:xmlns:drawing:1.0}"
_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_SVG = "{urn:oasis:names:tc:opendocument:xmlns:svg-compatible:1.0}"
_PRES = "{urn:oasis:names:tc:opendocument:xmlns:presentation:1.0}"

# repeat-run cap: ODS pads the last cell/row to 2^20/2^24 via
# number-*-repeated; anything repeated past this is formatting padding,
# not data (LibreOffice applies the same used-range logic)
_MAX_REPEAT = 1024


class OdfError(ValueError):
    """Structurally broken ODF container."""


def detect_odf_kind(names: set[str], mimetype: bytes) -> str:
    """'odt' | 'ods' | 'odp' | '' from the OCF mimetype member (or the
    content.xml root as fallback — handled by the caller)."""
    mt = mimetype.strip()
    if mt.startswith(b"application/vnd.oasis.opendocument."):
        sub = mt.rsplit(b".", 1)[-1]
        if sub.startswith(b"text"):
            return "odt"
        if sub.startswith(b"spreadsheet"):
            return "ods"
        if sub.startswith(b"presentation"):
            return "odp"
        return "odt"  # graphics/chart etc.: walk the text path
    if "content.xml" in names and ("meta.xml" in names or "styles.xml" in names):
        return "odf"  # ODF family, body element decides
    return ""


# -- text assembly -------------------------------------------------------


_SKIP_LOCAL = {"annotation", "tracked-changes", "note-citation"}


def _para_text(el) -> str:
    """Flatten a text:p / text:h with text:s, text:tab, text:line-break."""
    parts: list[str] = []

    def walk(node) -> None:
        local = node.tag.rsplit("}", 1)[-1]
        if local in _SKIP_LOCAL:
            return
        if local == "s":
            parts.append(" " * int(node.get(f"{_TEXT}c", "1") or "1"))
        elif local == "tab":
            parts.append("\t")
        elif local == "line-break":
            parts.append("\n")
        else:
            if node.text:
                parts.append(node.text)
            for child in node:
                walk(child)
                if child.tail:
                    parts.append(child.tail)

    if el.text:
        parts.append(el.text)
    for child in el:
        walk(child)
        if child.tail:
            parts.append(child.tail)
    return " ".join("".join(parts).split())


def _is_ordered_list(el) -> bool:
    style = (el.get(f"{_TEXT}style-name") or "").lower()
    return "num" in style or "order" in style


# -- tables ---------------------------------------------------------------


def _table_data(tbl) -> TableData:
    # compact (cells, repeat) rows: ODS pads with number-*-repeated runs
    # of empty cells (the fixture carries a 500x1003 pad) — expanding
    # them before the trim would do O(pad) work for rows the used-range
    # logic throws away
    packed: list[tuple[list[tuple[str, int, int, int]], int]] = []
    for tr in tbl.findall(f"{_TABLE}table-row"):
        row_rep = min(int(tr.get(f"{_TABLE}number-rows-repeated", "1") or "1"),
                      _MAX_REPEAT)
        cells: list[tuple[str, int, int, int]] = []
        for tc in tr:
            local = tc.tag.rsplit("}", 1)[-1]
            if local == "covered-table-cell":
                rep = min(int(tc.get(f"{_TABLE}number-columns-repeated", "1")
                              or "1"), _MAX_REPEAT)
                cells.extend([("", 1, 1, 0)] * rep)  # placeholder, covered
                continue
            if local != "table-cell":
                continue
            rep = min(int(tc.get(f"{_TABLE}number-columns-repeated", "1")
                          or "1"), _MAX_REPEAT)
            cspan = int(tc.get(f"{_TABLE}number-columns-spanned", "1") or "1")
            rspan = int(tc.get(f"{_TABLE}number-rows-spanned", "1") or "1")
            text = "\n".join(
                t for t in (_para_text(p) for p in tc.findall(f"{_TEXT}p"))
                if t
            )
            cells.append((text, rspan, cspan, 1))
            if rep > 1:
                cells.extend([(text, 1, 1, 1)] * (rep - 1))
        # trim trailing empty cells within the row (column-repeat padding)
        while cells and not cells[-1][0]:
            cells.pop()
        packed.append((cells, row_rep))

    # trim trailing all-empty rows (row-repeat padding) on the COMPACT
    # representation, then expand what survives
    while packed and all(not c[0] for c in packed[-1][0]):
        packed.pop()
    rows_raw: list[list[tuple[str, int, int, int]]] = []
    for cells, row_rep in packed:
        for _ in range(row_rep):
            rows_raw.append(cells)
    num_rows = len(rows_raw)
    num_cols = 0
    for cells in rows_raw:
        w = sum(c[2] for c in cells)
        num_cols = max(num_cols, w)
    # trim trailing all-empty columns
    col_used = [False] * num_cols
    for cells in rows_raw:
        ci = 0
        for text, _rs, cs, _real in cells:
            if text:
                for cc in range(ci, min(ci + cs, num_cols)):
                    col_used[cc] = True
            ci += cs
    while num_cols and not col_used[num_cols - 1]:
        num_cols -= 1

    table = TableData(num_rows=num_rows, num_cols=num_cols)
    grid: list[list] = [[None] * num_cols for _ in range(num_rows)]
    for ri, cells in enumerate(rows_raw):
        ci = 0
        for text, rspan, cspan, real in cells:
            if ci >= num_cols:
                break
            if real and text:
                table.cells.append(TableCellData(
                    text=text, row_span=rspan, col_span=cspan,
                    start_row=ri, end_row=ri + rspan,
                    start_col=ci, end_col=ci + cspan,
                    column_header=(ri == 0),
                ))
                for rr in range(ri, min(ri + rspan, num_rows)):
                    for cc in range(ci, min(ci + cspan, num_cols)):
                        grid[rr][cc] = text
            ci += cspan
    table.grid = grid
    return table


def _table_nonempty(table: TableData) -> bool:
    return bool(table.cells)


# -- block walkers ---------------------------------------------------------


def _walk_blocks(container, doc: Document, parent, page_no: int,
                 list_depth: int = 0) -> None:
    for el in container:
        local = el.tag.rsplit("}", 1)[-1]
        if local == "h":
            text = _para_text(el)
            if text:
                level = int(el.get(f"{_TEXT}outline-level", "1") or "1")
                doc.add_heading(text, level=max(1, level), parent=parent,
                                page_no=page_no)
        elif local == "p":
            text = _para_text(el)
            if text:
                doc.add_text(text, parent=parent, page_no=page_no)
            # frames ride inside paragraphs
            for frame in el.iter(f"{_DRAW}frame"):
                _handle_frame(frame, doc, parent, page_no)
        elif local == "list":
            group = doc.add_list_group(
                name="ordered list" if _is_ordered_list(el) else "list",
                parent=parent)
            n = 0
            for li in el.findall(f"{_TEXT}list-item"):
                n += 1
                first = True
                for sub in li:
                    slocal = sub.tag.rsplit("}", 1)[-1]
                    if slocal in ("p", "h"):
                        text = _para_text(sub)
                        if text and first:
                            doc.add_list_item(
                                text,
                                enumerated=_is_ordered_list(el),
                                marker=f"{n}." if _is_ordered_list(el) else "",
                                parent=group, page_no=page_no)
                            first = False
                        elif text:
                            doc.add_text(text, parent=group, page_no=page_no)
                    elif slocal == "list":
                        _walk_blocks(li, doc, group, page_no, list_depth + 1)
                        break
        elif local == "table":
            table = _table_data(el)
            if _table_nonempty(table):
                doc.add_table(data=table, parent=parent, page_no=page_no)
        elif local == "section":
            _walk_blocks(el, doc, parent, page_no, list_depth)


def _handle_frame(frame, doc: Document, parent, page_no: int) -> None:
    img = frame.find(f"{_DRAW}image")
    if img is None:
        return
    caption = None
    title_el = frame.find(f"{_SVG}title")
    desc_el = frame.find(f"{_SVG}desc")
    cap_text = _para_text(title_el) if title_el is not None else ""
    if not cap_text and desc_el is not None:
        cap_text = _para_text(desc_el)
    if cap_text:
        caption = doc.add_text(cap_text, label=model.CAPTION, parent=parent,
                               page_no=page_no)
    doc.add_picture(parent=parent, caption=caption, page_no=page_no)


# -- entry -----------------------------------------------------------------


def extract_odf(payload: bytes) -> tuple[Document, str]:
    """ODF zip -> (Document, 'odt'|'ods'|'odp')."""
    zf = BoundedZipFile(io.BytesIO(payload))
    names = set(zf.namelist())
    try:
        content = zf.read("content.xml")
    except KeyError as exc:
        raise OdfError("no content.xml") from exc
    try:
        root = ET.fromstring(content)
    except ET.ParseError as exc:
        raise OdfError(f"bad content.xml: {exc}") from exc
    body = root.find(f"{_OFFICE}body")
    if body is None:
        raise OdfError("no office:body")

    mimetype = zf.read("mimetype") if "mimetype" in names else b""
    kind = detect_odf_kind(names, mimetype)

    text_el = body.find(f"{_OFFICE}text")
    sheet_el = body.find(f"{_OFFICE}spreadsheet")
    pres_el = body.find(f"{_OFFICE}presentation")
    if kind in ("", "odf"):
        kind = "odt" if text_el is not None else (
            "ods" if sheet_el is not None else (
                "odp" if pres_el is not None else ""))
    if not kind:
        raise OdfError("unrecognized office:body content")

    doc = Document(name=kind)
    if kind == "odt":
        if text_el is None:
            raise OdfError("odt without office:text")
        _walk_blocks(text_el, doc, doc.root, page_no=1)
    elif kind == "ods":
        if sheet_el is None:
            raise OdfError("ods without office:spreadsheet")
        page = 0
        for tbl in sheet_el.findall(f"{_TABLE}table"):
            page += 1
            group = doc.add_group(name=f"sheet: {tbl.get(f'{_TABLE}name', '')}",
                                  label=model.GROUP_CHAPTER)
            sheet_name = tbl.get(f"{_TABLE}name", "")
            if sheet_name:
                doc.add_heading(sheet_name, level=1, parent=group,
                                page_no=page)
            data = _table_data(tbl)
            if _table_nonempty(data):
                doc.add_table(data=data, parent=group, page_no=page)
    else:  # odp
        if pres_el is None:
            raise OdfError("odp without office:presentation")
        page = 0
        for slide in pres_el.findall(f"{_DRAW}page"):
            page += 1
            group = doc.add_group(
                name=f"slide-{page - 1}", label=model.GROUP_CHAPTER)
            for frame in slide.findall(f"{_DRAW}frame"):
                cls = frame.get(f"{_PRES}class", "")
                box = frame.find(f"{_DRAW}text-box")
                if box is not None:
                    if cls == "title":
                        text = " ".join(
                            t for t in (_para_text(p) for p in
                                        box.findall(f"{_TEXT}p")) if t)
                        if text:
                            label = model.TITLE if page == 1 else \
                                model.SECTION_HEADER
                            if label == model.TITLE:
                                doc.add_text(text, label=label, parent=group,
                                             page_no=page)
                            else:
                                doc.add_heading(text, level=1, parent=group,
                                                page_no=page)
                        continue
                    _walk_blocks(box, doc, group, page_no=page)
                    continue
                tbl = frame.find(f"{_TABLE}table")
                if tbl is not None:
                    data = _table_data(tbl)
                    if _table_nonempty(data):
                        doc.add_table(data=data, parent=group, page_no=page)
                    continue
                _handle_frame(frame, doc, group, page)
    return doc, kind
