"""Standalone image payloads → Document (reference ``InputFormat.IMAGE``).

The reference routes images through the PDF pipeline
(``document_converter.py:193-195``: ``InputFormat.IMAGE`` →
``StandardPdfPipeline`` + ``DoclingParseV4DocumentBackend``), accepting
``jpg jpeg png tif tiff bmp webp`` (``base_models.py:82``) plus
``image/gif`` by mimetype (``base_models.py:107-112``).  The image
becomes a single page whose size is the pixel dimensions, and all text
comes from OCR — an ML provider boundary here, exactly like ASR for
audio (``test_backend_webp.py`` runs EasyOCR/Tesseract engines that are
not installed in this environment).

Deterministic scope mirrored by this module:

* header-only dimension parsing for all six container formats (no full
  decode needed to build the page geometry);
* a one-page Document with ``page_sizes[1] = (w, h)`` and a full-page
  PICTURE item — the shape the reference's pipeline produces before OCR
  cells are merged in;
* an ``ocr_fn(payload) -> iterable`` plug-point whose cells become TEXT
  items, the same contract as the PDF path's ``ocr_fn`` (off by default,
  like the reference's ``do_ocr`` outside the image pipeline).
"""

from __future__ import annotations

import struct

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document


class ImageError(ValueError):
    """Malformed or unsupported image container."""


# DIB header sizes: BITMAPCOREHEADER, BITMAPINFOHEADER and the V2-V5
# extensions — used to validate the weak 2-byte "BM" magic.
_BMP_DIB_SIZES = {12, 40, 52, 56, 64, 108, 124}


def _png_dims(data: bytes) -> tuple[int, int]:
    # IHDR is required to be the first chunk (PNG spec §11.2.2)
    if len(data) < 24 or data[12:16] != b"IHDR":
        raise ImageError("PNG missing IHDR")
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def _jpeg_dims(data: bytes) -> tuple[int, int]:
    # walk marker segments to the first SOFn (C0-CF minus DHT/DAC/RSTn)
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            break
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > n:
                break
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            return w, h
        pos += 2 + seglen
    raise ImageError("JPEG has no SOF header")


def _gif_dims(data: bytes) -> tuple[int, int]:
    if len(data) < 10:
        raise ImageError("GIF header truncated")
    w, h = struct.unpack("<HH", data[6:10])
    return w, h


def _bmp_dims(data: bytes) -> tuple[int, int]:
    if len(data) < 26:
        raise ImageError("BMP header truncated")
    dib = struct.unpack("<I", data[14:18])[0]
    if dib == 12:  # BITMAPCOREHEADER: 16-bit dims
        w, h = struct.unpack("<HH", data[18:22])
    else:
        w, h = struct.unpack("<ii", data[18:26])
    return w, abs(h)  # negative height = top-down DIB


def _webp_dims(data: bytes) -> tuple[int, int]:
    if len(data) < 30:
        raise ImageError("WebP header truncated")
    chunk = data[12:16]
    if chunk == b"VP8X":  # extended header: 24-bit minus-one dims
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return w, h
    if chunk == b"VP8L":  # lossless: 14-bit minus-one dims packed LE
        bits = int.from_bytes(data[21:25], "little")
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    if chunk == b"VP8 ":  # lossy: dims after the 3-byte start code
        if data[23:26] != b"\x9d\x01\x2a":
            raise ImageError("VP8 key-frame start code missing")
        w, h = struct.unpack("<HH", data[26:30])
        return w & 0x3FFF, h & 0x3FFF
    raise ImageError(f"unknown WebP chunk {chunk!r}")


def _tiff_dims(data: bytes) -> tuple[int, int]:
    if len(data) < 8:
        raise ImageError("TIFF header truncated")
    endian = "<" if data[:2] == b"II" else ">"
    ifd_off = struct.unpack(endian + "I", data[4:8])[0]
    if ifd_off + 2 > len(data):
        raise ImageError("TIFF IFD offset out of range")
    n_entries = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])[0]
    w = h = None
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(data):
            break
        tag, typ = struct.unpack(endian + "HH", data[e : e + 4])
        if tag not in (256, 257):  # ImageWidth / ImageLength
            continue
        if typ == 3:  # SHORT
            val = struct.unpack(endian + "H", data[e + 8 : e + 10])[0]
        else:  # LONG
            val = struct.unpack(endian + "I", data[e + 8 : e + 12])[0]
        if tag == 256:
            w = val
        else:
            h = val
    if w is None or h is None:
        raise ImageError("TIFF IFD lacks dimension tags")
    return w, h


def sniff_image(head: bytes) -> str | None:
    """First bytes → image subformat name, or None if not an image.

    BMP's 2-byte magic is validated against the DIB header-size field so
    text starting with "BM" is not misrouted (same structural-validation
    policy as the audio magics in ``sniff.py``)."""
    if head.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if head.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if head.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if head[:4] == b"RIFF" and head[8:12] == b"WEBP":
        return "webp"
    if head[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if (
        head[:2] == b"BM"
        and len(head) >= 18
        and struct.unpack("<I", head[14:18])[0] in _BMP_DIB_SIZES
    ):
        return "bmp"
    return None


_DIMS = {
    "png": _png_dims,
    "jpeg": _jpeg_dims,
    "gif": _gif_dims,
    "bmp": _bmp_dims,
    "webp": _webp_dims,
    "tiff": _tiff_dims,
}


def image_dimensions(data: bytes) -> tuple[str, int, int]:
    """Payload → (subformat, width_px, height_px); header-only parse."""
    sub = sniff_image(data[:32])
    if sub is None:
        raise ImageError("not a recognized image container")
    try:
        w, h = _DIMS[sub](data)
    except (struct.error, IndexError) as exc:
        raise ImageError(f"truncated {sub} header: {exc}") from exc
    if w <= 0 or h <= 0:
        raise ImageError(f"degenerate {sub} dimensions {w}x{h}")
    return sub, w, h


def extract_image(data: bytes, ocr_fn=None) -> Document:
    """Image payload → one-page Document (picture + optional OCR text).

    Page size is the pixel dimensions (the reference's image→page wrap
    renders at image scale, so bbox normalization divides by pixel size —
    consistent with ``compose_vectors``' page-size normalization).

    ``ocr_fn(payload) -> iterable`` of dicts with ``text`` and optional
    ``bbox`` (l, t, r, b in pixels); each cell becomes a TEXT item in
    iteration order, the merge shape of the PDF path's OCR plug-point.
    Without ``ocr_fn`` the document is the picture-only page the
    reference produces when OCR finds no cells."""
    sub, w, h = image_dimensions(data)
    doc = Document()
    doc.page_sizes[1] = (float(w), float(h))
    pic = doc.add_picture(page_no=1)
    pic.bbox = (0.0, 0.0, float(w), float(h))
    if ocr_fn is None:
        return doc
    for cell in ocr_fn(data):
        node = doc.add_text(text=cell.get("text", ""), label=model.TEXT)
        node.page_no = 1
        if cell.get("bbox") is not None:
            node.bbox = tuple(float(v) for v in cell["bbox"])
    return doc
