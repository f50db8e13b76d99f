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

# <meta charset="..."> — attribute value with or without quotes
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]{1,40})""",
    re.IGNORECASE,
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


def sniff_encoding_detail(data: bytes) -> "tuple[str, str]":
    """Return ``(codec, source)`` for an HTML payload (never raises).

    ``source`` names the step that decided: ``bom``, ``declared``,
    ``utf8-trial``, or ``fallback`` — the per-page provenance a crawl
    metrics table wants (fallback rate is a data-quality signal)."""
    # 1. BOM — authoritative
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if data[:2] == b"\xff\xfe":
        return "utf-16-le", "bom"
    if data[:2] == b"\xfe\xff":
        return "utf-16-be", "bom"
    # 2. declaration prescan (first 1024 bytes per WHATWG)
    head = data[:1024]
    m = _META_CHARSET_RE.search(head)
    if m is None:
        m = _XML_DECL_RE.search(head)
    if m is not None:
        name = _resolve_label(m.group(1))
        if name is not None:
            return name, "declared"
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
    # 1. BOM — authoritative
    if data[:3] == b"\xef\xbb\xbf":
        enc = "utf-8-sig"
    elif data[:2] == b"\xff\xfe":
        enc = "utf-16-le"
    elif data[:2] == b"\xfe\xff":
        enc = "utf-16-be"
    else:
        # 2. declaration prescan
        head = data[:1024]
        m = _META_CHARSET_RE.search(head)
        if m is None:
            m = _XML_DECL_RE.search(head)
        enc = _resolve_label(m.group(1)) if m is not None else None
        if enc is None:
            # 3. strict UTF-8 trial — on success this already produced
            #    the decoded text; 4. windows-1252 fallback (total: every
            #    byte decodes, so no replace needed)
            try:
                return data.decode("utf-8")
            except UnicodeDecodeError:
                return data.decode("windows-1252", errors="replace")
    try:
        return data.decode(enc)
    except (UnicodeDecodeError, ValueError):
        # malformed under its own declaration: degrade per-character,
        # never per-document (failure-isolation contract)
        return data.decode(enc, errors="replace")
