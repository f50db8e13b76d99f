"""Legacy binary Microsoft Office readers: .doc (MS-DOC), .xls (BIFF8),
.ppt (MS-PPT) — pure Python over the shared CFB container parser.

The reference cannot read these directly: it shells out to LibreOffice
(``soffice --headless --convert-to pdf``, attachment_processor.py:86-146)
and re-parses the PDF — a subprocess boundary that does not exist on a
Spark executor. These readers run inside the Arrow kernel like every
other backend (same treatment the fork's HWP Java subprocess got in
``core/hwp_backend.py``). Web crawls carry plenty of legacy Office
payloads, so this is first-class surface for a Common-Crawl extraction
engine, not an afterthought.

Scope: text + table structure (the training-data signal). Embedded
objects, formatting runs, and drawing layers are ignored.

* ``.doc`` — FIB → CLX piece table in the 0Table/1Table stream →
  text runs (CP1252-compressed or UTF-16LE pieces), main-document CP
  range only; paragraph marks 0x0D, cell/row marks 0x07 reassembled
  into tables ([MS-DOC] §2.4.1 piece-table algorithm).
* ``.xls`` — BIFF8 record stream: SST (with Continue-spanning strings),
  BOUNDSHEET offsets, LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR /
  FORMULA+STRING cells, MERGEDCELLS spans; per-sheet grids go through
  the same region-growing table discovery contract as the XLSX backend.
* ``.ppt`` — record tree walk of the PowerPoint Document stream:
  SlideListWithText → SlidePersistAtom (slide boundaries) +
  TextHeaderAtom (title vs body) + TextCharsAtom/TextBytesAtom.
"""

from __future__ import annotations

import struct

from . import model
from .model import Document


class LegacyOfficeError(ValueError):
    pass


def _fill_grid(data: model.TableData) -> None:
    """Span-expand the cell list into the text grid serializers render."""
    grid: list[list[str | None]] = [
        [None] * data.num_cols for _ in range(data.num_rows)
    ]
    for c in data.cells:
        for rr in range(c.start_row, min(c.end_row, data.num_rows)):
            for cc in range(c.start_col, min(c.end_col, data.num_cols)):
                grid[rr][cc] = c.text
    data.grid = grid


# --- .doc (Word 97-2003) -------------------------------------------------------

_DOC_MAGIC = 0xA5EC


def extract_doc_text(word_stream: bytes, table_stream: bytes) -> str:
    """WordDocument + nTable streams → main-document text (raw, with Word
    control characters preserved for the caller to structure)."""
    if len(word_stream) < 0x200:
        raise LegacyOfficeError("WordDocument stream too short")
    (w_ident,) = struct.unpack_from("<H", word_stream, 0)
    if w_ident != _DOC_MAGIC:
        raise LegacyOfficeError("bad FIB magic")

    # FibRgLw97.ccpText: base(32) + csw(2) + fibRgW(28) + cslw(2) = 64;
    # ccpText is the 4th 4-byte field of fibRgLw
    (csw,) = struct.unpack_from("<H", word_stream, 32)
    fib_rg_w = 34
    cslw_off = fib_rg_w + csw * 2
    (cslw,) = struct.unpack_from("<H", word_stream, cslw_off)
    fib_rg_lw = cslw_off + 2
    (ccp_text,) = struct.unpack_from("<i", word_stream, fib_rg_lw + 3 * 4)
    cb_off = fib_rg_lw + cslw * 4
    (cb_rg_fc_lcb,) = struct.unpack_from("<H", word_stream, cb_off)
    blob = cb_off + 2
    # fcClx/lcbClx = pair index 33 of fibRgFcLcb97
    if cb_rg_fc_lcb < 34:
        raise LegacyOfficeError("FIB too small for fcClx")
    fc_clx, lcb_clx = struct.unpack_from("<II", word_stream, blob + 33 * 8)
    clx = table_stream[fc_clx : fc_clx + lcb_clx]
    if not clx:
        raise LegacyOfficeError("empty CLX")

    # walk CLX: Prc entries (clxt=1) precede the single Pcdt (clxt=2)
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:
        (cb,) = struct.unpack_from("<H", clx, pos + 1)
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise LegacyOfficeError("no Pcdt in CLX")
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    n = (len(plc) - 4) // 12
    if n <= 0:
        raise LegacyOfficeError("empty piece table")
    cps = struct.unpack_from(f"<{n + 1}i", plc, 0)
    out: list[str] = []
    for i in range(n):
        pcd_off = (n + 1) * 4 + i * 8
        (fc_raw,) = struct.unpack_from("<I", plc, pcd_off + 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        cp0, cp1 = cps[i], min(cps[i + 1], ccp_text)
        if cp1 <= cp0:
            continue
        count = cp1 - cp0
        if compressed:
            raw = word_stream[fc // 2 : fc // 2 + count]
            out.append(raw.decode("cp1252", errors="replace"))
        else:
            raw = word_stream[fc : fc + 2 * count]
            out.append(raw.decode("utf-16-le", errors="replace"))
        if cps[i + 1] >= ccp_text:
            break
    return "".join(out)


def extract_doc(streams: dict[str, bytes]) -> Document:
    word = streams.get("WordDocument")
    if word is None:
        raise LegacyOfficeError("no WordDocument stream")
    if len(word) < 0x200:
        raise LegacyOfficeError("WordDocument stream too short")
    (flags,) = struct.unpack_from("<H", word, 0x0A)
    table = streams.get("1Table" if flags & 0x0200 else "0Table")
    if table is None:  # some writers store only one of the two
        table = streams.get("1Table") or streams.get("0Table") or b""
    text = extract_doc_text(word, table)

    doc = Document()
    page_no = 1
    pending_rows: list[list[str]] = []

    def flush_table() -> None:
        nonlocal pending_rows
        if not pending_rows:
            return
        ncols = max(len(r) for r in pending_rows)
        data = model.TableData(num_rows=len(pending_rows), num_cols=ncols)
        for ri, row in enumerate(pending_rows):
            for ci in range(ncols):
                data.cells.append(
                    model.TableCellData(
                        text=row[ci] if ci < len(row) else "",
                        row_span=1, col_span=1,
                        start_row=ri, end_row=ri + 1,
                        start_col=ci, end_col=ci + 1,
                        column_header=False, row_header=False,
                    )
                )
        _fill_grid(data)
        doc.add_table(data, page_no=page_no)
        pending_rows = []

    def emit_para(para: str) -> None:
        nonlocal page_no
        flush_table()
        if "\x0c" in para:  # page breaks
            page_no += para.count("\x0c")
            para = para.replace("\x0c", "")
        cleaned = _doc_clean(para)
        if cleaned:
            doc.add_text(text=cleaned, label=model.TEXT, page_no=page_no)

    for seg in text.split("\r"):
        seg = seg.replace("\x0b", "\n")  # vertical tab = soft line break
        if "\x07" not in seg:
            emit_para(seg)
            continue
        # table region: each cell ends with 0x07, each row with another
        # 0x07 (the TTP mark) — so rows split on the doubled mark; any
        # trailing text after the last row mark is a plain paragraph
        parts = seg.split("\x07\x07")
        for k, part in enumerate(parts):
            is_last = k == len(parts) - 1
            if not is_last or "\x07" in part:
                cells = [_doc_clean(c) for c in part.split("\x07")]
                if any(cells):
                    pending_rows.append(cells)
            elif part:
                emit_para(part)
    flush_table()
    return doc


def _doc_clean(s: str) -> str:
    # drop field-begin/separator/end and other Word control chars
    return "".join(
        ch for ch in s if ch >= " " or ch in ("\t", "\n")
    ).strip()


# --- .xls (BIFF8) ---------------------------------------------------------------


def _biff_records(data: bytes, start: int = 0):
    pos = start
    while pos + 4 <= len(data):
        rtype, sz = struct.unpack_from("<HH", data, pos)
        if rtype == 0:
            break
        yield rtype, pos + 4, sz
        pos += 4 + sz


class _SstReader:
    """Byte reader over SST + Continue payload segments.

    A string's character data restarts with a fresh grbit byte at every
    Continue boundary ([MS-XLS] §2.5.293) — the classic BIFF8 trap."""

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.si = 0
        self.off = 0

    def remaining_in_seg(self) -> int:
        return len(self.segs[self.si]) - self.off

    def _advance(self) -> None:
        while self.si < len(self.segs) - 1 and self.off >= len(self.segs[self.si]):
            self.si += 1
            self.off = 0

    def bytes(self, n: int) -> bytes:
        out = b""
        while n > 0:
            self._advance()
            seg = self.segs[self.si]
            take = min(n, len(seg) - self.off)
            if take <= 0:
                raise LegacyOfficeError("SST truncated")
            out += seg[self.off : self.off + take]
            self.off += take
            n -= take
        return out

    def u8(self) -> int:
        return self.bytes(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.bytes(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.bytes(4))[0]

    def chars(self, cch: int, high: bool) -> str:
        """Read cch characters, re-reading the grbit at continue breaks."""
        out = []
        while cch > 0:
            self._advance()
            if self.off == 0 and out:  # crossed into a Continue: fresh grbit
                high = bool(self.u8() & 1)
            avail = self.remaining_in_seg()
            if high:
                take = min(cch, avail // 2)
                if take == 0:
                    raise LegacyOfficeError("SST truncated (wide)")
                out.append(self.bytes(take * 2).decode("utf-16-le", "replace"))
            else:
                take = min(cch, avail)
                if take == 0:
                    raise LegacyOfficeError("SST truncated (narrow)")
                out.append(self.bytes(take).decode("latin-1"))
            cch -= take
        return "".join(out)


def _read_xl_unicode_string(r: _SstReader, rich_ext: bool = True) -> str:
    cch = r.u16()
    grbit = r.u8()
    high = bool(grbit & 0x01)
    c_run = r.u16() if (rich_ext and grbit & 0x08) else 0
    cb_ext = r.u32() if (rich_ext and grbit & 0x04) else 0
    s = r.chars(cch, high)
    if c_run:
        r.bytes(4 * c_run)
    if cb_ext:
        r.bytes(cb_ext)
    return s


def _parse_sst(segments: list[bytes]) -> list[str]:
    r = _SstReader(segments)
    r.u32()  # cstTotal
    cst_unique = r.u32()
    return [_read_xl_unicode_string(r) for _ in range(cst_unique)]


def _rk_value(rk: int) -> float:
    val: float
    if rk & 0x02:  # integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return val / 100.0 if rk & 0x01 else val


def _num_text(x: float) -> str:
    return str(int(x)) if float(x).is_integer() and abs(x) < 1e15 else str(x)


def extract_xls(streams: dict[str, bytes]) -> Document:
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise LegacyOfficeError("no Workbook stream")

    sst: list[str] = []
    sheets: list[tuple[str, int]] = []  # (name, stream offset)
    # globals substream: ends at the first EOF after the initial BOF
    rec_iter = _biff_records(wb)
    pending_sst: list[bytes] | None = None
    for rtype, off, sz in rec_iter:
        payload = wb[off : off + sz]
        if rtype == 0x00FC:  # SST
            pending_sst = [payload]
        elif rtype == 0x003C and pending_sst is not None:  # Continue
            pending_sst.append(payload)
        else:
            if pending_sst is not None:
                sst = _parse_sst(pending_sst)
                pending_sst = None
            if rtype == 0x0085:  # BOUNDSHEET
                lb_ply_pos = struct.unpack_from("<I", payload, 0)[0]
                cch = payload[6]
                high = payload[7] & 1
                raw = payload[8 : 8 + cch * (2 if high else 1)]
                name = raw.decode("utf-16-le" if high else "latin-1", "replace")
                sheets.append((name, lb_ply_pos))
            elif rtype == 0x000A:  # EOF of globals
                break
    if pending_sst is not None:
        sst = _parse_sst(pending_sst)

    doc = Document()
    for sheet_idx, (sheet_name, ply) in enumerate(sheets):
        values: dict[tuple[int, int], str] = {}
        merged: list[tuple[int, int, int, int]] = []
        last_formula_cell: tuple[int, int] | None = None
        for rtype, off, sz in _biff_records(wb, ply):
            p = wb[off : off + sz]
            if rtype == 0x000A:  # sheet EOF
                break
            if rtype == 0x00FD:  # LABELSST
                rw, col, _xf, isst = struct.unpack_from("<HHHI", p, 0)
                values[(rw, col)] = sst[isst] if isst < len(sst) else ""
            elif rtype == 0x0203:  # NUMBER
                rw, col, _xf = struct.unpack_from("<HHH", p, 0)
                (x,) = struct.unpack_from("<d", p, 6)
                values[(rw, col)] = _num_text(x)
            elif rtype == 0x027E:  # RK
                rw, col, _xf, rk = struct.unpack_from("<HHHI", p, 0)
                values[(rw, col)] = _num_text(_rk_value(rk))
            elif rtype == 0x00BD:  # MULRK
                rw, col_first = struct.unpack_from("<HH", p, 0)
                n_cells = (sz - 6) // 6
                for k in range(n_cells):
                    (rk,) = struct.unpack_from("<I", p, 4 + k * 6 + 2)
                    values[(rw, col_first + k)] = _num_text(_rk_value(rk))
            elif rtype == 0x0205:  # BOOLERR
                rw, col, _xf, bval, ferr = struct.unpack_from("<HHHBB", p, 0)
                values[(rw, col)] = (
                    f"#ERR:{bval:02x}" if ferr else ("True" if bval else "False")
                )
            elif rtype == 0x0204:  # LABEL (inline BIFF8 string)
                rw, col, _xf = struct.unpack_from("<HHH", p, 0)
                values[(rw, col)] = _read_xl_unicode_string(_SstReader([p[6:]]))
            elif rtype == 0x0006:  # FORMULA: cached result
                rw, col, _xf = struct.unpack_from("<HHH", p, 0)
                cached = p[6:14]
                if cached[6:8] == b"\xff\xff":
                    kind = cached[0]
                    if kind == 0:  # string result follows in STRING record
                        last_formula_cell = (rw, col)
                        values[(rw, col)] = ""
                    elif kind == 1:
                        values[(rw, col)] = "True" if cached[2] else "False"
                    elif kind == 2:
                        values[(rw, col)] = f"#ERR:{cached[2]:02x}"
                    else:
                        values[(rw, col)] = ""
                else:
                    (x,) = struct.unpack("<d", cached)
                    values[(rw, col)] = _num_text(x)
            elif rtype == 0x0207 and last_formula_cell is not None:  # STRING
                values[last_formula_cell] = _read_xl_unicode_string(
                    _SstReader([p])
                )
                last_formula_cell = None
            elif rtype == 0x00E5:  # MERGEDCELLS
                (cmcs,) = struct.unpack_from("<H", p, 0)
                for k in range(cmcs):
                    rf, rl, cf, cl = struct.unpack_from("<HHHH", p, 2 + k * 8)
                    merged.append((rf, cf, rl, cl))

        group = doc.add_group(name=f"sheet: {sheet_name}", label=model.GROUP_SECTION)
        _grid_to_tables(doc, group, values, merged, page_no=sheet_idx + 1)
    return doc


def _grid_to_tables(doc, group, values, merged, page_no: int) -> None:
    """Region-growing multi-table discovery over a sparse cell grid — the
    same contract the XLSX backend implements (msexcel_backend.py:289-475)."""
    if not values:
        return

    def merged_at(r: int, c: int):
        for mr in merged:
            if mr[0] <= r <= mr[2] and mr[1] <= c <= mr[3]:
                return mr
        return None

    max_row = max(r for r, _ in values)
    max_col = max(c for _, c in values)
    visited: set[tuple[int, int]] = set()
    for sr in range(max_row + 1):
        for sc in range(max_col + 1):
            if (sr, sc) in visited or (sr, sc) not in values:
                continue
            bottom = sr
            ri = sr + 1
            while ri <= max_row:
                mr = merged_at(ri, sc)
                if (ri, sc) not in values and mr is None:
                    break
                bottom = max(bottom, mr[2] if mr else ri)
                ri += 1
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
            data = model.TableData(num_rows=num_rows, num_cols=num_cols)
            cell_done: set[tuple[int, int]] = set()
            for ri in range(sr, bottom + 1):
                for cj in range(sc, right + 1):
                    visited.add((ri, cj))
                    if (ri, cj) in cell_done:
                        continue
                    mr = merged_at(ri, cj)
                    row_span = (mr[2] - mr[0] + 1) if mr else 1
                    col_span = (mr[3] - mr[1] + 1) if mr else 1
                    if mr:
                        for xr in range(mr[0], mr[2] + 1):
                            for xc in range(mr[1], mr[3] + 1):
                                cell_done.add((xr, xc))
                    text = values.get((ri, cj))
                    data.cells.append(
                        model.TableCellData(
                            text=str(text) if text is not None else "None",
                            row_span=row_span, col_span=col_span,
                            start_row=ri - sr, end_row=ri - sr + row_span,
                            start_col=cj - sc, end_col=cj - sc + col_span,
                            column_header=ri == sr, row_header=False,
                        )
                    )
            _fill_grid(data)
            doc.add_table(data, parent=group, page_no=page_no)


# --- .ppt (PowerPoint 97-2003) ---------------------------------------------------

_PPT_SLIDE_PERSIST = 0x03F3
_PPT_TEXT_HEADER = 0x0F9F
_PPT_TEXT_CHARS = 0x0FA0
_PPT_TEXT_BYTES = 0x0FA8
_PPT_SLIDE_LIST = 0x0FF0


def _ppt_walk(data: bytes, pos: int, end: int, out: list[tuple[int, bytes]]) -> None:
    while pos + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, pos)
        body_end = min(pos + 8 + rlen, end)
        if (ver_inst & 0x0F) == 0x0F:  # container
            _ppt_walk(data, pos + 8, body_end, out)
        else:
            out.append((rtype, data[pos + 8 : body_end]))
        pos = body_end


def extract_ppt(streams: dict[str, bytes]) -> Document:
    ppt = streams.get("PowerPoint Document")
    if ppt is None:
        raise LegacyOfficeError("no PowerPoint Document stream")
    atoms: list[tuple[int, bytes]] = []
    _ppt_walk(ppt, 0, len(ppt), atoms)

    doc = Document()
    page_no = 0
    text_kind = 1  # TextHeaderAtom type: 0 = title
    seen_text = False
    for rtype, body in atoms:
        if rtype == _PPT_SLIDE_PERSIST:
            page_no += 1
        elif rtype == _PPT_TEXT_HEADER and len(body) >= 4:
            text_kind = struct.unpack_from("<I", body, 0)[0]
        elif rtype in (_PPT_TEXT_CHARS, _PPT_TEXT_BYTES):
            text = (
                body.decode("utf-16-le", "replace")
                if rtype == _PPT_TEXT_CHARS
                else body.decode("latin-1")
            )
            for para in text.replace("\x0b", "\n").split("\r"):
                para = para.strip("\x00").strip()
                if not para:
                    continue
                seen_text = True
                if text_kind == 0:
                    doc.add_heading(para, level=1, page_no=max(page_no, 1))
                else:
                    doc.add_text(
                        text=para, label=model.TEXT, page_no=max(page_no, 1)
                    )
    if not seen_text and not atoms:
        raise LegacyOfficeError("no PPT records")
    return doc


# --- router -----------------------------------------------------------------------


def extract_legacy_office(streams: dict[str, bytes]) -> tuple[Document, str]:
    """Parsed CFB streams → (Document, kind) for doc/xls/ppt containers."""
    if "WordDocument" in streams:
        return extract_doc(streams), "doc"
    if "Workbook" in streams or "Book" in streams:
        return extract_xls(streams), "xls"
    if "PowerPoint Document" in streams:
        return extract_ppt(streams), "ppt"
    raise LegacyOfficeError(
        "unrecognized OLE2 payload (streams: "
        + ", ".join(sorted(streams)[:8])
        + ")"
    )
