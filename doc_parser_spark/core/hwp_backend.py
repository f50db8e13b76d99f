"""HWP v5 (Hangul Word Processor) backend — direct, pure Python.

The reference can only ingest ``.hwp`` by shelling out to pyhwp's
``hwp5html`` and re-parsing the XHTML→PDF round-trip
(doc_preprocessors/attachment_processor.py:296-318 ``HwpLoader``). Inside
an Arrow-batched Spark kernel a subprocess per document is a non-starter,
so this module reads the container directly from the published HWP 5.0
format: a CFB/OLE2 compound file (``core/cfb.py``) holding

* ``FileHeader`` — 32-byte signature ``HWP Document File`` + version +
  property bits (bit 0: body streams are raw-deflate compressed);
* ``BodyText/Section{n}`` — tagged record streams. Record header is a
  little-endian u32: tag(10) | level(10) | size(12), size 0xFFF meaning a
  following u32 carries the real size. Paragraph text lives in
  ``HWPTAG_PARA_TEXT`` (tag 67) as UTF-16LE where codes < 32 are controls:
  char controls occupy one WCHAR, inline/extended controls eight
  (section/column/table/drawing anchors etc.).

Scope: paragraph text per section in record order — headers, tables and
shapes ride the HWPX backend (``office_backends.py:extract_hwpx``), which
is the fork's primary Korean path. This backend makes raw ``.hwp`` payloads
extractable at all without Java/pyhwp."""

from __future__ import annotations

import re
import struct
import zlib
from doc_parser_spark.core import model
from doc_parser_spark.core.cfb import CfbError, read_cfb
from doc_parser_spark.core.limits import (
    DEFAULT_MAX_BYTES,
    BombError,
    inflate_bounded,
)
from doc_parser_spark.core.model import Document

HWP_SIGNATURE = b"HWP Document File"

HWPTAG_PARA_HEADER = 66
HWPTAG_PARA_TEXT = 67

# control chars that occupy a single WCHAR; all other codes < 32 are
# inline/extended controls followed by 7 more WCHARs (HWP 5.0 spec, 표 3)
_CHAR_CONTROLS = {0, 10, 13, 24, 25, 26, 27, 28, 29, 30, 31}


class HwpError(ValueError):
    pass


def is_hwp(data: bytes) -> bool:
    """Cheap check: CFB magic + HWP FileHeader signature present."""
    if not data.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        return False
    try:
        return HWP_SIGNATURE in read_cfb(data).get("FileHeader", b"")[:32]
    except Exception:  # noqa: BLE001 — malformed container
        return False


def iter_records(stream: bytes):
    """Yield (tag, level, payload) from a tagged record stream."""
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        (header,) = struct.unpack_from("<I", stream, pos)
        pos += 4
        tag = header & 0x3FF
        level = (header >> 10) & 0x3FF
        size = (header >> 20) & 0xFFF
        if size == 0xFFF:
            if pos + 4 > n:
                break
            (size,) = struct.unpack_from("<I", stream, pos)
            pos += 4
        yield tag, level, stream[pos : pos + size]
        pos += size


def decode_para_text(payload: bytes) -> str:
    """UTF-16LE paragraph text with control runs skipped (tab → space)."""
    out: list[str] = []
    chars = struct.unpack(f"<{len(payload) // 2}H", payload[: len(payload) // 2 * 2])
    i = 0
    while i < len(chars):
        code = chars[i]
        if code >= 32:
            # surrogate pairs pass through struct as two u16s — rejoin
            out.append(chr(code))
            i += 1
        elif code in _CHAR_CONTROLS:
            if code in (10, 13):
                out.append("\n")
            i += 1
        else:
            if code == 9:
                out.append(" ")
            i += 8  # inline/extended control block
    text = "".join(out)
    # rejoin utf-16 surrogate halves; a LONE surrogate (corrupt record, or
    # a control block the i+=8 skip landed mid-pair on) degrades to U+FFFD
    # instead of raising out of the decode
    return text.encode("utf-16", "surrogatepass").decode("utf-16", "replace")


def extract_hwp(data: bytes) -> Document:
    """HWP v5 bytes → Document (one TEXT item per paragraph)."""
    try:
        streams = read_cfb(data)
    except CfbError as exc:
        raise HwpError(f"not a CFB container: {exc}") from exc
    header = streams.get("FileHeader", b"")
    if HWP_SIGNATURE not in header[:32]:
        raise HwpError("missing HWP FileHeader signature")
    (props,) = struct.unpack_from("<I", header, 36)
    compressed = bool(props & 1)
    if props & 2:
        raise HwpError("password-protected HWP")

    sections = sorted(
        (
            (int(m.group(1)), name)
            for name, m in (
                (n, re.fullmatch(r"BodyText/Section(\d+)", n)) for n in streams
            )
            if m
        )
    )
    # fixture writers may store flat names (our CFB writer has no storages)
    if not sections:
        sections = sorted(
            (int(m.group(1)), name)
            for name, m in (
                (n, re.fullmatch(r"Section(\d+)", n)) for n in streams
            )
            if m
        )
    if not sections:
        raise HwpError("no BodyText sections")

    doc = Document()
    for _no, name in sections:
        raw = streams[name]
        if compressed:
            # bomb-bounded: a section stream must not inflate past the
            # document size gate (limits.py)
            # require_end: HWP section streams declare no inflated size,
            # so a truncated deflate must FAIL the document (matching the
            # pre-bounded zlib.decompress semantics) rather than silently
            # succeed with missing paragraphs
            try:
                raw = inflate_bounded(
                    raw, DEFAULT_MAX_BYTES, wbits=-15, require_end=True
                )
            except BombError as exc:
                raise HwpError(str(exc)) from exc
            except zlib.error as exc:
                raise HwpError(f"corrupt section stream: {exc}") from exc
        for tag, _level, payload in iter_records(raw):
            if tag != HWPTAG_PARA_TEXT:
                continue
            for para in decode_para_text(payload).split("\n"):
                para = para.strip()
                if para:
                    doc.add_text(text=para, label=model.TEXT)
    return doc
