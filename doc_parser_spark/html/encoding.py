"""WHATWG-style HTML encoding sniffing for crawl payloads.

The reference hands raw bytes to BeautifulSoup
(``docling/backend/html_backend.py:75``), whose UnicodeDammit detector
resolves the document encoding as: byte-order mark, then the encoding
*declared inside the document* (``<meta charset>`` / ``http-equiv``
prescan), then trial decodes (UTF-8 first, a windows-1252-family
fallback last).  Until now this repo hardcoded
``decode("utf-8", errors="replace")`` — correct for the (all-UTF-8)
parity fixtures but wrong for real Common-Crawl HTML, of which a
meaningful share is windows-1252 / Shift_JIS / GBK / EUC-KR /
ISO-8859-x.  This module reproduces the detection *contract* with the
WHATWG algorithm (https://html.spec.whatwg.org/#determining-the-character-encoding):

1. BOM sniff (UTF-8, UTF-16 LE/BE) — authoritative, overrides any
   declaration.
2. Prescan of the first 1024 bytes for ``<meta charset=...>`` or
   ``<meta http-equiv="content-type" content="...charset=...">``
   (ASCII-superset scan, so it is safe before the encoding is known).
   Labels map per the WHATWG encodings registry — notably
   ``iso-8859-1``/``latin1``/``ascii`` → windows-1252 and a declared
   ``utf-16`` → decode as UTF-8 (the spec's rule: if the content were
   really UTF-16 the ASCII prescan could not have read the tag).
3. No declaration: strict-UTF-8 trial decode (valid UTF-8 is
   essentially never produced by a legacy encoder).
4. Fallback: windows-1252, the WHATWG default for unlabeled legacy
   content (decodes every byte; 0x81/0x8D/0x8F/0x90/0x9D gaps fall
   back to the C1 controls like browsers do).

Decode failures under a *declared* encoding degrade to
``errors="replace"`` under that encoding rather than raising — one
malformed page must never kill a 10^12-row extraction stage.
"""

from __future__ import annotations

import codecs
import re
from typing import Optional

__all__ = ["sniff_encoding", "sniff_encoding_detail", "decode_html"]

# WHATWG encoding-label table, restricted to labels that occur in crawl
# data and map onto stdlib codecs.  Keys are lowercased labels after
# trim; values are Python codec names.
_LABEL_MAP = {
    # UTF family
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    # WHATWG: windows-1252 superset serves the latin1/ascii label family
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "iso_8859-1": "windows-1252", "latin1": "windows-1252",
    "latin-1": "windows-1252", "l1": "windows-1252",
    "us-ascii": "windows-1252", "ascii": "windows-1252",
    "ansi_x3.4-1968": "windows-1252",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252",
    # other single-byte windows/iso pages common in crawls
    "windows-1250": "windows-1250", "windows-1251": "windows-1251",
    "cp1251": "windows-1251", "windows-1253": "windows-1253",
    "windows-1254": "windows-1254", "windows-1255": "windows-1255",
    "windows-1256": "windows-1256", "windows-1257": "windows-1257",
    "windows-1258": "windows-1258",
    "iso-8859-2": "iso8859-2", "iso-8859-3": "iso8859-3",
    "iso-8859-4": "iso8859-4", "iso-8859-5": "iso8859-5",
    "iso-8859-6": "iso8859-6", "iso-8859-7": "iso8859-7",
    "iso-8859-8": "iso8859-8", "iso-8859-9": "windows-1254",
    "iso-8859-13": "iso8859-13", "iso-8859-15": "iso8859-15",
    "koi8-r": "koi8-r", "koi8-u": "koi8-u",
    "macintosh": "mac-roman", "x-mac-roman": "mac-roman",
    # CJK
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis", "ms_kanji": "shift_jis",
    "euc-jp": "euc-jp", "x-euc-jp": "euc-jp",
    "iso-2022-jp": "iso2022_jp",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk",
    "gb_2312-80": "gbk", "x-gbk": "gbk", "chinese": "gbk",
    "csgb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs", "cn-big5": "big5",
    "x-x-big5": "big5",
    "euc-kr": "euc-kr", "korean": "euc-kr", "ks_c_5601-1987": "euc-kr",
    "csksc56011987": "euc-kr", "iso-ir-149": "euc-kr", "ksc5601": "euc-kr",
    "ksc_5601": "euc-kr", "windows-949": "euc-kr",
    # UTF-16 labels: a meta-declared utf-16 is decoded as utf-8 per
    # WHATWG (the prescan itself proves the bytes are ASCII-compatible)
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
    # x-user-defined: browsers map into a PUA; windows-1252 is the
    # closest total single-byte stand-in available in the stdlib
    "x-user-defined": "windows-1252",
}

# prescan tokenization: whole <meta ...> tags, then their attributes —
# `charset=` is honored only as an actual ATTRIBUTE of a meta tag (or
# inside an http-equiv content-type's content VALUE), never as loose
# text inside some other attribute (WHATWG prescan / UnicodeDammit
# both parse attributes; a bare `charset=` substring match mis-fires
# on e.g. <meta name=d content="see charset=iso-8859-1 docs">)
_META_TAG_RE = re.compile(rb"<meta\s[^>]{0,512}", re.IGNORECASE)
_ATTR_RE = re.compile(
    rb"""([a-zA-Z-]+)\s*=\s*("[^"]*"|'[^']*'|[^\s"'>]+)""",
)
_CONTENT_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]{1,40})""", re.IGNORECASE
)
# XML declaration (XHTML served as text/html): <?xml ... encoding="...">
_XML_DECL_RE = re.compile(
    rb"""<\?xml[^>]{0,256}?encoding\s*=\s*["']([a-zA-Z0-9._:-]{1,40})["']""",
    re.IGNORECASE,
)


def _resolve_label(label: bytes) -> Optional[str]:
    name = _LABEL_MAP.get(label.decode("ascii", "replace").strip().lower())
    if name is None:
        return None
    try:  # belt-and-braces: only return labels this Python can decode
        codecs.lookup(name)
    except LookupError:  # pragma: no cover - all table entries resolve
        return None
    return name


def _declared_encoding(head: bytes) -> Optional[str]:
    """WHATWG-style prescan of the head bytes for a declared encoding."""
    for tag in _META_TAG_RE.finditer(head):
        attrs = {}
        for am in _ATTR_RE.finditer(tag.group(0)):
            k = am.group(1).lower()
            if k not in attrs:  # first occurrence wins, like browsers
                attrs[k] = am.group(2).strip(b"\"'")
        label = attrs.get(b"charset")
        if label is None and (
            attrs.get(b"http-equiv", b"").lower() == b"content-type"
        ):
            cm = _CONTENT_CHARSET_RE.search(attrs.get(b"content", b""))
            if cm is not None:
                label = cm.group(1)
        if label is not None:
            name = _resolve_label(label)
            if name is not None:
                return name
    m = _XML_DECL_RE.search(head)
    if m is not None:
        return _resolve_label(m.group(1))
    return None


def _resolve(data: bytes) -> "tuple[Optional[str], str]":
    """Shared BOM + declaration resolution: ``(codec or None, source)``.

    ``None`` means undetermined — the caller runs the UTF-8 trial /
    windows-1252 fallback. The ``utf-16`` codec is the endian-detecting
    one, so the BOM is CONSUMED by the decode (WHATWG requires the BOM
    never reach the document text)."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if data[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16", "bom"
    name = _declared_encoding(data[:1024])
    if name is not None:
        return name, "declared"
    return None, ""


# Python's cp1252 leaves 0x81/0x8D/0x8F/0x90/0x9D undefined (→ U+FFFD
# under errors="replace"); the WHATWG windows-1252 decoder maps them to
# the C1 controls. Decode latin-1 (total, C1 passthrough) + translate
# the 27 defined high positions to their cp1252 characters.
_W1252_TABLE = {}
for _i in range(0x80, 0xA0):
    try:
        _W1252_TABLE[_i] = ord(bytes([_i]).decode("cp1252"))
    except UnicodeDecodeError:
        pass  # gap byte: latin-1's C1 control stands, per WHATWG


def _decode_windows_1252(data: bytes) -> str:
    """Total WHATWG windows-1252 decode (gap bytes → C1 controls)."""
    return data.decode("latin-1").translate(_W1252_TABLE)


def sniff_encoding_detail(data: bytes) -> "tuple[str, str]":
    """Return ``(codec, source)`` for an HTML payload (never raises).

    ``source`` names the step that decided: ``bom``, ``declared``,
    ``utf8-trial``, or ``fallback`` — the per-page provenance a crawl
    metrics table wants (fallback rate is a data-quality signal)."""
    enc, src = _resolve(data)
    if enc is not None:
        return enc, src
    # 3. strict UTF-8 trial — cheap (memchr-speed for pure ASCII) and
    #    decisive: legacy encoders essentially never emit valid UTF-8
    #    multi-byte sequences
    try:
        data.decode("utf-8")
        return "utf-8", "utf8-trial"
    except UnicodeDecodeError:
        pass
    # 4. WHATWG legacy default
    return "windows-1252", "fallback"


def sniff_encoding(data: bytes) -> str:
    """Return the Python codec name for an HTML payload (never raises)."""
    return sniff_encoding_detail(data)[0]


def decode_html(data: bytes) -> str:
    """Decode an HTML payload using the sniffed encoding (never raises).

    Single-pass on the dominant path: for undeclared content the strict
    UTF-8 *trial* decode IS the decode (no second scan of the payload)."""
    enc, _src = _resolve(data)
    if enc is None:
        try:
            # 3. trial — on success this already produced the text;
            # 4. WHATWG windows-1252 fallback (total by construction)
            return data.decode("utf-8")
        except UnicodeDecodeError:
            return _decode_windows_1252(data)
    try:
        return data.decode(enc)
    except (UnicodeDecodeError, ValueError):
        # malformed under its own declaration: degrade per-character,
        # never per-document (failure-isolation contract); a DECLARED
        # windows-1252 takes the same WHATWG-total path
        if enc == "windows-1252":
            return _decode_windows_1252(data)
        return data.decode(enc, errors="replace")
