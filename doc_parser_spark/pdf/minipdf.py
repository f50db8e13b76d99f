"""Pure-Python PDF text extraction: content streams → positioned text cells.

The reference's fallback PDF backend extracts positioned text rectangles via
pypdfium2 (``docling/backend/pypdfium2_backend.py:120-153``) — a PDFMiner-style
pass, which is exactly what the north star asks for. pypdfium2 is not
available in this environment, so this module implements the pass from
scratch for the deterministic PDF subset the corpus carries (uncompressed
content streams, standard Type1 fonts, ``BT/ET`` text blocks with
``Td/TD/Tm/T*/TL/Tf/Tj/TJ/'`` operators).

Output cells carry top-left-origin bounding boxes like the reference's
(``pypdfium2_backend.py:142-150`` converts BOTTOMLEFT → TOPLEFT); the width
model is a 0.5-em average-glyph approximation (Helvetica metrics are not
shipped), which is stable because fixtures use the same model.

FlateDecode streams are supported via stdlib zlib when present.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

AVG_GLYPH_EM = 0.5  # average Helvetica glyph width as a fraction of font size


@dataclass
class TextCell:
    """A positioned text run (reference TextCell analog)."""

    index: int
    text: str
    l: float
    t: float
    r: float
    b: float
    font_size: float
    page_no: int
    font_name: str = ""  # /BaseFont sans subset prefix ("" when unresolved)
    # every distinct face in the cell (a merged line mixes faces — e.g. a
    # display equation sets the variable in CMMI and digits in CMR)
    font_names: tuple = ()

    @property
    def height(self) -> float:
        return self.b - self.t

    @property
    def width(self) -> float:
        return self.r - self.l


@dataclass
class PdfPage:
    page_no: int
    width: float
    height: float
    cells: list
    # painted raster rects (l, t, r, b), top-left origin — feeds OCR
    # region detection (pdf/ocr_regions.py)
    bitmap_rects: list = field(default_factory=list)
    # painted axis-aligned segments (x0, y0, x1, y1), top-left origin —
    # feeds ruled-table grid detection (pdf/tables.py)
    rulings: list = field(default_factory=list)


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
# spec says the keyword is followed by \r\n or \n, but real generators
# (e.g. the reference's amt_handbook_sample.pdf) also emit bare \r on both
# delimiters — accept any single EOL sequence on either side
_STREAM_RE = re.compile(rb"stream(?:\r\n|\n|\r)(.*?)(?:\r\n|\n|\r)?endstream", re.DOTALL)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")


class CMap:
    """ToUnicode CMap: fixed-width CID codes → unicode strings.

    Parses ``bfchar``/``bfrange`` sections (PDF 32000-1 §9.10.3); the code
    byte-width comes from the bfchar/bfrange source hex length (2 bytes for
    Identity-H CID fonts, 1 for simple fonts)."""

    def __init__(self, data: bytes):
        self.map: dict[int, str] = {}
        self.width = 2

        def uni(hexs: bytes) -> str:
            raw = bytes.fromhex(hexs.decode())
            return raw.decode("utf-16-be", errors="replace")

        widths = set()
        for section in _BFCHAR_RE.findall(data):
            hexes = _HEX_RE.findall(section)
            for src, dst in zip(hexes[0::2], hexes[1::2]):
                src = re.sub(rb"\s", b"", src)
                widths.add(len(src) // 2)
                self.map[int(src, 16)] = uni(dst)
        for section in _BFRANGE_RE.findall(data):
            # ranges come as `<lo> <hi> <dst>` or `<lo> <hi> [<d1> <d2> ...]`
            for m in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
                section,
            ):
                lo, hi = int(m.group(1), 16), int(m.group(2), 16)
                widths.add(len(m.group(1)) // 2)
                body = m.group(3)
                if body.startswith(b"["):
                    dsts = _HEX_RE.findall(body)
                    for i, dst in enumerate(dsts):
                        if lo + i <= hi:
                            self.map[lo + i] = uni(dst)
                else:
                    base = bytes.fromhex(body[1:-1].decode())
                    base_str = base.decode("utf-16-be", errors="replace")
                    for code in range(lo, min(hi, lo + 0xFFFF) + 1):
                        if base_str:
                            self.map[code] = base_str[:-1] + chr(
                                ord(base_str[-1]) + (code - lo)
                            )
        if widths:
            self.width = max(widths)

    def decode(self, raw: bytes) -> str:
        w = self.width
        out = []
        for i in range(0, len(raw) - w + 1, w):
            out.append(self.map.get(int.from_bytes(raw[i : i + w], "big"), ""))
        return "".join(out)


def _balanced_dict(data: bytes, start: int) -> bytes:
    """The ``<<...>>`` dict starting at/after ``start`` (nesting-aware)."""
    open_ix = data.find(b"<<", start)
    if open_ix < 0:
        return b""
    depth = 0
    i = open_ix
    while i < len(data) - 1:
        pair = data[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[open_ix:i]
        else:
            i += 1
    return b""


def _resources_of(body: bytes, objects: dict[int, bytes]) -> bytes:
    """/Resources dict bytes of a page/XObject body (inline or ref)."""
    res_m = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", body)
    if res_m:
        return objects.get(int(res_m.group(1)), b"")
    ix = body.find(b"/Resources")
    return _balanced_dict(body, ix) if ix >= 0 else b""


def _fonts_of(
    resources: bytes,
    objects: dict[int, bytes],
    cmap_cache: dict,
    font_cache: dict,
) -> dict:
    """Font resource name → textengine.Font (widths, encoding, ToUnicode)."""
    from doc_parser_spark.pdf.textengine import parse_font

    font_m = re.search(rb"/Font\s+(\d+)\s+\d+\s+R", resources)
    if font_m:
        font_dict = objects.get(int(font_m.group(1)), b"")
    else:
        ix = resources.find(b"/Font")
        font_dict = _balanced_dict(resources, ix) if ix >= 0 else b""
    fonts: dict = {}
    for fm in re.finditer(rb"/([^\s/\[\]<>()]+)\s+(\d+)\s+\d+\s+R", font_dict):
        name, ref = fm.group(1).decode("latin-1"), int(fm.group(2))
        if ref not in font_cache:
            try:
                font_cache[ref] = parse_font(
                    objects.get(ref, b""), objects, cmap_cache, cmap_cls=CMap
                )
            except Exception:
                font_cache[ref] = None
        if font_cache[ref] is not None:
            fonts[name] = font_cache[ref]
    return fonts


def _xobject_resolver(
    resources: bytes,
    objects: dict[int, bytes],
    cmap_cache: dict,
    font_cache: dict,
    depth: int = 0,
):
    """name → tagged XObject for ``Do`` ops: ``("form", content, fonts,
    nested resolver)`` or ``("image",)`` (raster placements feed the OCR
    region detector, the analog of pypdfium2_backend.py:254-268
    ``get_bitmap_rects``)."""

    def resolve(name: str):
        if depth > 8:
            return None
        xo_m = re.search(rb"/XObject\s+(\d+)\s+\d+\s+R", resources)
        if xo_m:
            xdict = objects.get(int(xo_m.group(1)), b"")
        else:
            ix = resources.find(b"/XObject")
            xdict = _balanced_dict(resources, ix) if ix >= 0 else b""
        m = re.search(
            rb"/" + re.escape(name.encode("latin-1")) + rb"\s+(\d+)\s+\d+\s+R",
            xdict,
        )
        if not m:
            return None
        xbody = objects.get(int(m.group(1)), b"")
        if re.search(rb"/Subtype\s*/Image\b", xbody):
            return ("image",)
        if not re.search(rb"/Subtype\s*/Form\b", xbody):
            return None
        try:
            content = _object_stream(xbody) or b""
        except PdfParseError:
            return None
        mtx = re.search(rb"/Matrix\s*\[([^\]]*)\]", xbody)
        if mtx:
            nums = re.findall(rb"[-+]?\d*\.?\d+", mtx.group(1))[:6]
            if len(nums) == 6:
                content = (
                    b" ".join(nums) + b" cm\n" + content
                )
        xres = _resources_of(xbody, objects)
        xfonts = _fonts_of(xres, objects, cmap_cache, font_cache)
        return (
            "form",
            content,
            xfonts,
            _xobject_resolver(
                xres or resources, objects, cmap_cache, font_cache, depth + 1
            ),
        )

    return resolve


class PdfParseError(Exception):
    pass


def _parse_objects(data: bytes) -> dict[int, bytes]:
    objects: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objects[int(m.group(1))] = m.group(3)
    if not objects:
        raise PdfParseError("no PDF objects found")
    _expand_object_streams(objects)
    return objects


def _expand_object_streams(objects: dict[int, bytes]) -> None:
    """Inline the members of /ObjStm compressed object streams (PDF 1.5+).

    Page-tree and content dictionaries routinely live inside object
    streams in real-world files (e.g. the reference's
    ``amt_handbook_sample.pdf``); without expansion the page walk sees no
    /Pages objects at all. Stream layout per spec: the first ``First``
    bytes hold N (objnum, offset) integer pairs; members follow at
    ``First + offset`` with no obj/endobj wrappers."""
    for body in list(objects.values()):
        if not re.search(rb"/Type\s*/ObjStm", body):
            continue
        first_m = re.search(rb"/First\s+(\d+)", body)
        n_m = re.search(rb"/N\s+(\d+)", body)
        try:
            payload = _object_stream(body)
        except PdfParseError:
            continue
        if not (first_m and n_m and payload):
            continue
        first, n = int(first_m.group(1)), int(n_m.group(1))
        ints = [int(x) for x in re.findall(rb"\d+", payload[:first])][: 2 * n]
        pairs = list(zip(ints[0::2], ints[1::2]))
        for idx, (objnum, off) in enumerate(pairs):
            end = pairs[idx + 1][1] if idx + 1 < len(pairs) else len(payload) - first
            member = payload[first + off : first + end]
            # top-level (possibly incrementally-updated) definitions win
            objects.setdefault(objnum, member)


def _object_stream(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if m is None:
        return None
    payload = m.group(1)
    if b"/FlateDecode" in body:
        try:
            # decompressobj tolerates trailing bytes after the zlib frame
            # (common when the endstream EOL guess over-captures) — but a
            # stream cut mid-deflate must still error so the caller's
            # fallback path triggers instead of silently losing tail text
            d = zlib.decompressobj()
            payload = d.decompress(payload)
            if not d.eof:
                raise PdfParseError("truncated FlateDecode stream")
        except zlib.error as exc:
            raise PdfParseError(f"bad FlateDecode stream: {exc}") from exc
    return payload


def _page_objects(objects: dict[int, bytes]) -> list[int]:
    """Page object numbers in document order (via /Pages kids when present)."""
    pages_in_tree: list[int] = []

    def walk_kids(obj_num: int, depth: int = 0) -> None:
        if depth > 32 or obj_num not in objects:
            return
        body = objects[obj_num]
        if b"/Type" in body and b"/Pages" in body.replace(b" ", b""):
            m = _KIDS_RE.search(body)
            if m:
                for ref in _REF_RE.finditer(m.group(1)):
                    walk_kids(int(ref.group(1)), depth + 1)
                return
        if re.search(rb"/Type\s*/Page\b", body):
            pages_in_tree.append(obj_num)

    roots = [
        num for num, body in objects.items()
        if re.search(rb"/Type\s*/Pages\b", body) and b"/Parent" not in body
    ]
    for root in sorted(roots):
        walk_kids(root)
    if not pages_in_tree:
        pages_in_tree = sorted(
            num for num, body in objects.items()
            if re.search(rb"/Type\s*/Page\b", body)
        )
    return pages_in_tree


# -- content-stream tokenizer -------------------------------------------------

_TOKEN_RE = re.compile(
    rb"""
    (?P<str>\((?:\\.|[^\\()])*\))      # literal string
  | (?P<hex><[0-9A-Fa-f\s]*>)          # hex string
  | (?P<arr_open>\[) | (?P<arr_close>\])
  | (?P<num>[-+]?\d*\.?\d+)
  | (?P<name>/[^\s\[\]()<>/]+)
  | (?P<op>[A-Za-z'"*]+)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    body = raw[1:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        ch = body[i : i + 1]
        if ch == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < len(body) and j < i + 4 and body[j : j + 1].isdigit():
                    j += 1
                out.append(chr(int(body[i + 1 : j], 8) & 0xFF))
                i = j
                continue
            i += 1
            continue
        out.append(ch.decode("latin-1"))
        i += 1
    return "".join(out)


def extract_cells(
    content: bytes,
    page_height: float,
    page_no: int,
    fonts: dict | None = None,
    xobjects=None,
) -> tuple[list[TextCell], list[tuple[float, float, float, float]]]:
    """Run the glyph-metric text engine over one content stream and
    assemble positioned glyphs into textline cells (textengine.py).

    Returns ``(cells, bitmap_rects)``; both convert PDF bottom-left
    device coords to a top-left origin exactly as the reference
    normalizes pypdfium2 rects (pypdfium2_backend.py:142-150, 254-268)."""
    from doc_parser_spark.pdf.textengine import TextEngine, assemble_cells

    engine = TextEngine(fonts or {}, xobjects)
    engine.run(content, _TOKEN_RE, _decode_pdf_string)
    cells = assemble_cells(engine.glyphs, page_height, page_no, TextCell)
    rects = [
        (x0, page_height - y1, x1, page_height - y0)
        for x0, y0, x1, y1 in engine.image_rects
    ]
    rulings = [
        (x0, page_height - y0, x1, page_height - y1)
        for x0, y0, x1, y1 in engine.rulings
    ]
    return cells, rects, rulings


def parse_pdf(data: bytes) -> list[PdfPage]:
    """PDF bytes → pages of positioned text cells."""
    if not data.startswith(b"%PDF-"):
        raise PdfParseError("missing %PDF- header")
    objects = _parse_objects(data)
    pages: list[PdfPage] = []
    cmap_cache: dict = {}
    font_cache: dict = {}
    for page_no, obj_num in enumerate(_page_objects(objects), start=1):
        body = objects[obj_num]
        mb = _MEDIABOX_RE.search(body)
        width, height = (612.0, 792.0)
        mb_x0 = mb_y0 = 0.0
        if mb:
            mb_x0, mb_y0 = float(mb.group(1)), float(mb.group(2))
            width = float(mb.group(3)) - mb_x0
            height = float(mb.group(4)) - mb_y0
        content = b""
        m = _CONTENTS_RE.search(body)
        refs: list[int] = []
        if m:
            refs = [int(m.group(1))]
        else:
            m_arr = _CONTENTS_ARR_RE.search(body)
            if m_arr:
                refs = [int(r.group(1)) for r in _REF_RE.finditer(m_arr.group(1))]
        # /Contents may be a stream ref, an inline array, or a ref to an
        # ARRAY object of stream refs (ISO 32000 7.7.3.3) — follow refs
        # with a cycle-guarded worklist so all three shapes resolve
        seen: set[int] = set()
        work = list(refs)
        while work:
            ref = work.pop(0)
            if ref in seen:
                continue
            seen.add(ref)
            obody = objects.get(ref, b"")
            stream = _object_stream(obody)
            if stream:
                content += stream + b"\n"
            elif obody.strip().startswith(b"["):
                work.extend(
                    int(r.group(1)) for r in _REF_RE.finditer(obody)
                )
        if mb_x0 or mb_y0:
            # shift device space so the MediaBox origin lands at (0, 0)
            content = (
                f"1 0 0 1 {-mb_x0:g} {-mb_y0:g} cm\n".encode() + content
            )
        resources = _resources_of(body, objects)
        fonts = _fonts_of(resources, objects, cmap_cache, font_cache)
        xobjects = _xobject_resolver(resources, objects, cmap_cache, font_cache)
        cells, bitmap_rects, rulings = extract_cells(
            content, height, page_no, fonts=fonts, xobjects=xobjects
        )
        pages.append(
            PdfPage(
                page_no=page_no, width=width, height=height,
                cells=cells, bitmap_rects=bitmap_rects, rulings=rulings,
            )
        )
    if not pages:
        raise PdfParseError("no pages found")
    return pages


def fallback_scan(data: bytes) -> list[PdfPage]:
    """Last-resort pass: every literal string followed by Tj, in file order
    (the engine's analog of the reference's whole-document backend-fallback
    retry, doc_preprocessors/basic_processor.py:887-903)."""
    runs = re.findall(rb"(\((?:\\.|[^\\()])*\))\s*Tj", data)
    cells = [
        TextCell(
            index=i, text=_decode_pdf_string(raw),
            l=72.0, t=72.0 + 14.0 * i, r=500.0, b=84.0 + 14.0 * i,
            font_size=11.0, page_no=1,
        )
        for i, raw in enumerate(runs)
    ]
    return [PdfPage(page_no=1, width=612.0, height=792.0, cells=cells)]


_XOBJ_IMG_RE = re.compile(rb"/Subtype\s*/Image\b")


def extract_page_images(data: bytes) -> list[dict]:
    """Embedded raster XObjects per page → decodable payloads.

    The reference serves picture crops from rendered pages
    (``Page.get_image``); the embedded /Image XObjects are the original
    payloads and extract without rasterizing. Returns one dict per image
    reference in page order: ``{page_no, name, width, height, colorspace,
    filter, payload}`` where payload is the raw stream (JPEG bytes for
    DCTDecode, deflated-then-raw samples for FlateDecode)."""
    objects = _parse_objects(data)
    out: list[dict] = []

    def xobject_refs(container: bytes) -> list:
        """(name, ref) pairs of the /XObject dict in a resources blob."""
        xo_m = re.search(rb"/XObject\s+(\d+)\s+\d+\s+R", container)
        if xo_m:
            xdict = objects.get(int(xo_m.group(1)), b"")
        else:
            ix = container.find(b"/XObject")
            xdict = _balanced_dict(container, ix) if ix >= 0 else b""
        return [
            (m.group(1).decode("latin-1"), int(m.group(2)))
            for m in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", xdict)
        ]

    def resources_of(body: bytes) -> bytes:
        res_m = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", body)
        if res_m:
            return objects.get(int(res_m.group(1)), b"")
        ix = body.find(b"/Resources")
        return _balanced_dict(body, ix) if ix >= 0 else b""

    def walk(container_body: bytes, page_no: int, seen: set, depth: int) -> None:
        """Collect image XObjects, recursing through /Form XObjects
        (real files nest figures inside forms — amt_handbook does)."""
        if depth > 8:
            return
        for name, ref in xobject_refs(resources_of(container_body)):
            if ref in seen:
                continue
            seen.add(ref)
            xbody = objects.get(ref, b"")
            if re.search(rb"/Subtype\s*/Form\b", xbody):
                walk(xbody, page_no, seen, depth + 1)
                continue
            if not _XOBJ_IMG_RE.search(xbody):
                continue
            _collect(xbody, name, page_no)
            # soft masks are separate image streams (frequently the JPEG
            # part of an indexed-color figure, as in amt_handbook)
            sm_ref = re.search(rb"/SMask\s+(\d+)\s+\d+\s+R", xbody)
            if sm_ref and int(sm_ref.group(1)) not in seen:
                seen.add(int(sm_ref.group(1)))
                _collect(
                    objects.get(int(sm_ref.group(1)), b""),
                    f"{name}.smask", page_no,
                )

    def _collect(xbody: bytes, name: str, page_no: int) -> None:
        sm = _STREAM_RE.search(xbody)
        if sm is None:
            return
        w_m = re.search(rb"/Width\s+(\d+)", xbody)
        h_m = re.search(rb"/Height\s+(\d+)", xbody)
        cs_m = re.search(rb"/ColorSpace\s*/(\w+)", xbody)
        is_dct = b"/DCTDecode" in xbody
        payload = sm.group(1)
        if not is_dct and b"/FlateDecode" in xbody:
            try:
                payload = zlib.decompressobj().decompress(payload)
            except zlib.error:
                return
        out.append(
            {
                "page_no": page_no,
                "name": name,
                "width": int(w_m.group(1)) if w_m else 0,
                "height": int(h_m.group(1)) if h_m else 0,
                "colorspace": cs_m.group(1).decode("latin-1") if cs_m else "",
                "filter": "DCTDecode" if is_dct else "FlateDecode" if b"/FlateDecode" in xbody else "raw",
                "payload": payload,
            }
        )

    for page_no, obj_num in enumerate(_page_objects(objects), start=1):
        walk(objects[obj_num], page_no, set(), 0)
    return out
