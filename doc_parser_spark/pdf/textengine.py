"""Glyph-metric PDF text engine: fonts, matrices, positioned glyph runs.

Replaces the fixed-advance (0.5 em) text pass with the real PDF text
model (PDF 32000-1 §9): per-glyph advances from font /Widths (simple
fonts) and /W (CID fonts), the full Tm/Tlm/CTM matrix chain including
``cm``, ``q/Q`` and Form-XObject ``Do`` recursion, char/word spacing
(Tc/Tw), horizontal scaling (Tz) and TJ kern offsets.  Accurate glyph
origins are what make the downstream line assembly able to recover the
*spaces* and *column splits* that generators like TeX encode purely as
positioning (no space glyphs) — the behaviour the reference inherits
from docling-parse/pypdfium2 (``docling/backend/pypdfium2_backend.py:
120-252``, textline cells in ``tests/data/groundtruth/docling_v2/
*.pages.json``).

Fonts without usable metrics (e.g. non-embedded base-14 in synthetic
fixtures) fall back to the historical 0.5 em estimate with
position-derived spacing disabled, so explicit space glyphs remain the
only word separators — exactly the old engine's semantics.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

AVG_GLYPH_EM = 0.5  # historical fixed-advance estimate (metricless fonts)

# word gap as a fraction of font size; TeX inter-word kerns are ~0.25-0.35 em,
# intra-word kerning stays well under 0.1 em
SPACE_GAP_EM = 0.15
# gap that splits a visual row into separate cells. docling-parse splits
# textlines at sentence-size kerns (~0.55 em, measured against the
# *.pages.json goldens) and at font changes; metricless fonts keep the
# historical merge_horizontal_cells 1.0×height criterion
CELL_SPLIT_EM = 0.45
CELL_SPLIT_EM_UNSPACED = 1.0
# baseline clustering tolerance
LINE_TOL_EM = 0.4

Matrix = tuple[float, float, float, float, float, float]
IDENTITY: Matrix = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def mmul(m1: Matrix, m2: Matrix) -> Matrix:
    """m1 × m2 (both 2×3 affine, row-vector convention: p' = p·m1·m2)."""
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def translate(tx: float, ty: float) -> Matrix:
    return (1.0, 0.0, 0.0, 1.0, tx, ty)


# -- glyph-name → unicode (compact AGL subset) --------------------------------

_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "fi": "ﬁ", "fl": "ﬂ",
    "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ",
    "germandbls": "ß", "ae": "æ", "AE": "Æ",
    "oe": "œ", "OE": "Œ", "oslash": "ø", "Oslash": "Ø",
    "cent": "¢", "sterling": "£", "yen": "¥",
    "florin": "ƒ", "fraction": "⁄", "dagger": "†",
    "daggerdbl": "‡", "periodcentered": "·",
    "paragraph": "¶", "section": "§", "copyright": "©",
    "registered": "®", "trademark": "™", "degree": "°",
    "plusminus": "±", "multiply": "×", "divide": "÷",
    "exclamdown": "¡", "questiondown": "¿",
    "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "perthousand": "‰", "minus": "−", "middot": "·",
    "dotlessi": "ı", "circumflex": "ˆ", "caron": "ˇ",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "ogonek": "˛", "tilde": "˜", "hungarumlaut": "˝",
    "cedilla": "¸", "dieresis": "¨", "macron": "¯",
    "acute": "´", "Euro": "€", "currency": "¤",
    "brokenbar": "¦", "ordfeminine": "ª",
    "ordmasculine": "º", "nbspace": " ",
}


def glyph_name_to_unicode(name: str) -> str:
    if len(name) == 1:
        return name
    if name in _GLYPH_NAMES:
        return _GLYPH_NAMES[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return "".join(
                chr(int(name[i : i + 4], 16))
                for i in range(3, len(name) - 3, 4)
            )
        except ValueError:
            return ""
    if name.startswith("u") and len(name) in (5, 7):
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return ""
    # accented composites: 'aacute', 'Ecircumflex', 'ntilde', ...
    m = re.fullmatch(r"([A-Za-z])(grave|acute|circumflex|tilde|dieresis|"
                     r"ring|cedilla|macron|breve|caron|hungarumlaut|"
                     r"ogonek|dotaccent|slash)", name)
    if m:
        combining = {
            "grave": "̀", "acute": "́", "circumflex": "̂",
            "tilde": "̃", "macron": "̄", "breve": "̆",
            "dotaccent": "̇", "dieresis": "̈", "ring": "̊",
            "hungarumlaut": "̋", "caron": "̌", "cedilla": "̧",
            "ogonek": "̨", "slash": "̸",
        }[m.group(2)]
        return unicodedata.normalize("NFC", m.group(1) + combining)
    return ""


# Adobe Symbol charset (code → unicode), from the public Symbol font
# encoding vector. A PDF that subsets Symbol/SymbolMT often declares a
# Latin /Encoding (MacRoman/WinAnsi) that does NOT describe the glyphs —
# docling-parse resolves such fonts through the font's own symbol cmap,
# so code 0xA5 renders '∞', not MacRoman's '•'. Bracket/brace extension
# pieces (0xE6-0xF0, 0xF4-0xFE) are corporate-use glyph fragments and
# stay unmapped.
_SYMBOL_ENCODING: dict[int, str] = {
    0x20: " ", 0x21: "!", 0x22: "∀", 0x23: "#", 0x24: "∃", 0x25: "%",
    0x26: "&", 0x27: "∋", 0x28: "(", 0x29: ")", 0x2A: "∗", 0x2B: "+",
    0x2C: ",", 0x2D: "−", 0x2E: ".", 0x2F: "/",
    **{c: chr(c) for c in range(0x30, 0x3A)},  # digits
    0x3A: ":", 0x3B: ";", 0x3C: "<", 0x3D: "=", 0x3E: ">", 0x3F: "?",
    0x40: "≅", 0x41: "Α", 0x42: "Β", 0x43: "Χ", 0x44: "Δ", 0x45: "Ε",
    0x46: "Φ", 0x47: "Γ", 0x48: "Η", 0x49: "Ι", 0x4A: "ϑ", 0x4B: "Κ",
    0x4C: "Λ", 0x4D: "Μ", 0x4E: "Ν", 0x4F: "Ο", 0x50: "Π", 0x51: "Θ",
    0x52: "Ρ", 0x53: "Σ", 0x54: "Τ", 0x55: "Υ", 0x56: "ς", 0x57: "Ω",
    0x58: "Ξ", 0x59: "Ψ", 0x5A: "Ζ", 0x5B: "[", 0x5C: "∴", 0x5D: "]",
    0x5E: "⊥", 0x5F: "_", 0x61: "α", 0x62: "β", 0x63: "χ", 0x64: "δ",
    0x65: "ε", 0x66: "φ", 0x67: "γ", 0x68: "η", 0x69: "ι", 0x6A: "ϕ",
    0x6B: "κ", 0x6C: "λ", 0x6D: "μ", 0x6E: "ν", 0x6F: "ο", 0x70: "π",
    0x71: "θ", 0x72: "ρ", 0x73: "σ", 0x74: "τ", 0x75: "υ", 0x76: "ϖ",
    0x77: "ω", 0x78: "ξ", 0x79: "ψ", 0x7A: "ζ", 0x7B: "{", 0x7C: "|",
    0x7D: "}", 0x7E: "∼",
    0xA1: "ϒ", 0xA2: "′", 0xA3: "≤", 0xA4: "⁄", 0xA5: "∞", 0xA6: "ƒ",
    0xA7: "♣", 0xA8: "♦", 0xA9: "♥", 0xAA: "♠", 0xAB: "↔", 0xAC: "←",
    0xAD: "↑", 0xAE: "→", 0xAF: "↓", 0xB0: "°", 0xB1: "±", 0xB2: "″",
    0xB3: "≥", 0xB4: "×", 0xB5: "∝", 0xB6: "∂", 0xB7: "•", 0xB8: "÷",
    0xB9: "≠", 0xBA: "≡", 0xBB: "≈", 0xBC: "…", 0xBF: "↵",
    0xC0: "ℵ", 0xC1: "ℑ", 0xC2: "ℜ", 0xC3: "℘", 0xC4: "⊗", 0xC5: "⊕",
    0xC6: "∅", 0xC7: "∩", 0xC8: "∪", 0xC9: "⊃", 0xCA: "⊇", 0xCB: "⊄",
    0xCC: "⊂", 0xCD: "⊆", 0xCE: "∈", 0xCF: "∉", 0xD0: "∠", 0xD1: "∇",
    0xD2: "®", 0xD3: "©", 0xD4: "™", 0xD5: "∏", 0xD6: "√", 0xD7: "⋅",
    0xD8: "¬", 0xD9: "∧", 0xDA: "∨", 0xDB: "⇔", 0xDC: "⇐", 0xDD: "⇑",
    0xDE: "⇒", 0xDF: "⇓", 0xE0: "◊", 0xE1: "⟨", 0xE2: "®", 0xE3: "©",
    0xE4: "™", 0xE5: "∑", 0xF1: "⟩", 0xF2: "∫",
}


# -- font model ----------------------------------------------------------------


@dataclass
class Font:
    """Per-resource font: code decoding + glyph advances (text-space em)."""

    name: str = ""
    raw_name: str = ""  # /BaseFont verbatim incl. subset prefix (markers)
    bytes_per_code: int = 1
    widths: dict[int, float] = field(default_factory=dict)  # code → em
    default_width: float = AVG_GLYPH_EM
    has_metrics: bool = False
    to_unicode: object | None = None  # minipdf.CMap
    diffs: dict[int, str] = field(default_factory=dict)  # code → unicode
    base_encoding: str = ""  # 'WinAnsiEncoding' | 'MacRomanEncoding' | ''

    def _uni(self, code: int) -> str:
        if self.to_unicode is not None:
            u = self.to_unicode.map.get(code)
            if u is not None:
                return u
            if self.bytes_per_code == 2:
                return ""  # unmapped CID: no sensible fallback
        if code in self.diffs:
            return self.diffs[code]
        if self.base_encoding == "WinAnsiEncoding":
            ch = bytes([code & 0xFF]).decode("cp1252", errors="replace")
        elif self.base_encoding == "MacRomanEncoding":
            ch = bytes([code & 0xFF]).decode("mac_roman", errors="replace")
        else:
            ch = bytes([code & 0xFF]).decode("latin-1")
        if ch < " " and ch not in "\t\n\r\f" or "\x7f" <= ch <= "\x9f":
            # a control char is not a mapping — docling-parse emits the
            # GLYPH<c=..,font=..> marker (subset prefix kept) instead
            return f"GLYPH<c={code},font=/{self.raw_name}>"
        return ch

    def iter_codes(self, raw: bytes):
        """yield (code, unicode, advance_em, is_space_code)."""
        n = self.bytes_per_code
        for i in range(0, len(raw) - n + 1, n):
            code = int.from_bytes(raw[i : i + n], "big")
            w = self.widths.get(code, self.default_width)
            yield code, self._uni(code), w, (n == 1 and code == 32)


# sentinel for text shown while no font resource resolved — one shared
# identity so id()-keyed cell segmentation stays deterministic
_UNRESOLVED_FONT = Font()


def _resolve_array(body: bytes, key: bytes, objects: dict) -> bytes:
    """``/Key [ ... ]`` inline or ``/Key N 0 R`` → the array bytes."""
    m = re.search(key + rb"\s*\[", body)
    if m:
        # balanced scan: CID /W arrays nest bracket groups
        # (``[65 [500] 66 [600 700]]``) — a find(']') would truncate at
        # the first group and default every later code's advance
        depth, i = 1, m.end()
        while i < len(body) and depth:
            c = body[i]
            if c == 0x5B:
                depth += 1
            elif c == 0x5D:
                depth -= 1
            i += 1
        return body[m.end() : i - 1] if depth == 0 else b""
    m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", body)
    if m:
        ref_body = objects.get(int(m.group(1)), b"")
        a, b = ref_body.find(b"["), ref_body.rfind(b"]")
        if 0 <= a < b:
            return ref_body[a + 1 : b]
    return b""


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")


def parse_font(font_body: bytes, objects: dict, cmap_cache: dict, *,
               cmap_cls) -> Font:
    """Font dict bytes → Font (widths, encoding, ToUnicode)."""
    f = Font()
    sub = re.search(rb"/Subtype\s*/(\w+)", font_body)
    subtype = sub.group(1).decode() if sub else ""
    bf = re.search(rb"/BaseFont\s*/([^\s/<>\[\]()]+)", font_body)
    if bf:
        f.raw_name = bf.group(1).decode("latin-1")
        # strip the 6-letter subset prefix (ABCDEF+CourierNew → CourierNew)
        f.name = re.sub(r"^[A-Z]{6}\+", "", f.raw_name)
        if f.name in ("Symbol", "SymbolMT"):
            # the font's charset wins over any declared Latin /Encoding
            # (Differences, parsed below, still override per-code)
            f.diffs.update(_SYMBOL_ENCODING)

    tu = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", font_body)
    if tu:
        ref = int(tu.group(1))
        if ref not in cmap_cache:
            try:
                from doc_parser_spark.pdf.minipdf import _object_stream

                stream = _object_stream(objects.get(ref, b""))
                cmap_cache[ref] = cmap_cls(stream) if stream else None
            except Exception:
                cmap_cache[ref] = None
        f.to_unicode = cmap_cache[ref]

    if subtype == "Type0":
        f.bytes_per_code = 2
        f.default_width = 1.0  # CID default DW = 1000/1000
        desc = re.search(
            rb"/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R", font_body
        ) or re.search(rb"/DescendantFonts\s+(\d+)\s+\d+\s+R", font_body)
        dbody = b""
        if desc:
            dbody = objects.get(int(desc.group(1)), b"")
            if re.fullmatch(rb"\s*\[\s*\d+\s+\d+\s+R\s*\]\s*", dbody or b""):
                inner = re.search(rb"(\d+)\s+\d+\s+R", dbody)
                dbody = objects.get(int(inner.group(1)), b"")
        if dbody:
            dbf = re.search(rb"/BaseFont\s*/([^\s/<>\[\]()]+)", dbody)
            if dbf:
                # GLYPH<> markers name the descendant CIDFont (subset
                # prefix, no -Identity-H suffix) — docling-parse parity
                f.raw_name = dbf.group(1).decode("latin-1")
            dw = re.search(rb"/DW\s+([-\d.]+)", dbody)
            if dw:
                f.default_width = float(dw.group(1)) / 1000.0
            warr = _resolve_array(dbody, rb"/W", objects)
            if warr:
                f.has_metrics = True
                # format: c [w1 w2 ...] | cfirst clast w
                toks = re.findall(rb"\[|\]|[-+]?\d*\.?\d+", warr)
                i = 0
                while i < len(toks):
                    if toks[i] in (b"[", b"]"):
                        i += 1
                        continue
                    start = int(float(toks[i]))
                    if i + 1 < len(toks) and toks[i + 1] == b"[":
                        j = i + 2
                        c = start
                        while j < len(toks) and toks[j] != b"]":
                            f.widths[c] = float(toks[j]) / 1000.0
                            c += 1
                            j += 1
                        i = j + 1
                    elif i + 2 < len(toks):
                        last = int(float(toks[i + 1]))
                        w = float(toks[i + 2]) / 1000.0
                        for c in range(start, min(last, start + 65535) + 1):
                            f.widths[c] = w
                        i += 3
                    else:
                        break
        return f

    # simple fonts: /FirstChar + /Widths
    fc = re.search(rb"/FirstChar\s+(\d+)", font_body)
    warr = _resolve_array(font_body, rb"/Widths", objects)
    if fc and warr:
        first = int(fc.group(1))
        vals = [float(x) for x in _NUM_RE.findall(warr)]
        if vals:
            f.has_metrics = True
            for i, w in enumerate(vals):
                if w > 0:
                    f.widths[first + i] = w / 1000.0
            mw = re.search(rb"/MissingWidth\s+([\d.]+)", font_body)
            f.default_width = (
                float(mw.group(1)) / 1000.0 if mw else AVG_GLYPH_EM
            )

    enc_name = re.search(rb"/Encoding\s*/(\w+)", font_body)
    if enc_name:
        f.base_encoding = enc_name.group(1).decode()
    else:
        enc_ref = re.search(rb"/Encoding\s+(\d+)\s+\d+\s+R", font_body)
        enc_body = b""
        if enc_ref:
            enc_body = objects.get(int(enc_ref.group(1)), b"")
        else:
            ix = font_body.find(b"/Encoding")
            if ix >= 0:
                from doc_parser_spark.pdf.minipdf import _balanced_dict

                enc_body = _balanced_dict(font_body, ix)
        if enc_body:
            base = re.search(rb"/BaseEncoding\s*/(\w+)", enc_body)
            if base:
                f.base_encoding = base.group(1).decode()
            darr = _resolve_array(enc_body, rb"/Differences", objects)
            if darr:
                code = 0
                for tok in re.findall(rb"/[^\s/\[\]<>()]+|[-+]?\d+", darr):
                    if tok.startswith(b"/"):
                        name = tok[1:].decode("latin-1")
                        u = glyph_name_to_unicode(name)
                        # unknown glyph name (subset gNNN ids, vendor
                        # bullets like SM590000): docling-parse renders
                        # the name itself as "/name" — keep that parity
                        f.diffs[code] = u if u else "/" + name
                        code += 1
                    else:
                        code = int(tok)
    return f


# -- glyphs & assembly ---------------------------------------------------------


@dataclass
class Glyph:
    text: str
    x0: float
    x1: float
    y: float  # baseline, PDF bottom-left device space
    size: float  # effective (device) font size
    spaced: bool  # font has real metrics → positional spacing trustworthy
    font: int = 0  # font resource identity (cells split at font changes)
    font_name: str = ""  # /BaseFont sans subset prefix (layout labeling)
    # writing direction: 0 = horizontal; +1/-1 = vertical with the pen
    # advancing toward +y / -y in device space (rotated table headers)
    rot: int = 0
    # device-space ink advance along the reading direction — vertical
    # runs need it for gap/space decisions (x1-x0 collapses to ~0 there)
    adv: float = 0.0
    # character-spacing (Tc) in effect when the glyph was shown — a Tc
    # flip between show ops marks a styled sub-run (docling-parse starts
    # a new textline cell there, e.g. rtl_02's lone ':')
    tc: float = 0.0
    # positioning epoch: bumps at every explicit text-positioning op
    # (Td/TD/Tm/T*/'/"/BT).  Kern offsets inside one TJ array do NOT bump
    # it — docling-parse keeps a TJ's glyphs in one textline cell however
    # far the internal offsets jump, but starts a new cell where a
    # positioning op lands the pen discontinuously (RTL Word output
    # draws each directional segment under its own Tm)
    seg: int = 0


_RTL_RE = re.compile(
    "[֐-׿؀-ۿ܀-ݏݐ-ݿࢠ-ࣿ"
    "יִ-﷿ﹰ-﻿]"
)
_LTR_RE = re.compile(r"[A-Za-z0-9À-ɏͰ-ϿЀ-ӿ]")


def _direction(ch: str) -> int:
    if _RTL_RE.match(ch):
        return -1
    if _LTR_RE.match(ch):
        return 1
    return 0


def _bidi_cell_text(glyphs: list[Glyph]) -> list[list[Glyph]]:
    """Visual-order glyphs → logical-order direction runs.

    PDF shows RTL scripts in visual (left-to-right) glyph order; readers
    want logical order.  Split the visual sequence at strong-direction
    boundaries; if the line is RTL-dominant, reverse the run order and
    reverse the glyphs inside each RTL run (docling-parse emits one
    textline cell per direction run — tests/data/groundtruth
    right_to_left_*.pages.json)."""
    strong = [_direction(g.text[:1]) for g in glyphs]
    n_rtl = sum(1 for s in strong if s < 0)
    n_ltr = sum(1 for s in strong if s > 0)
    if n_rtl == 0:
        return [glyphs]
    # UAX#9-style terminator/separator attachment BEFORE the generic
    # neutral rule: a European terminator (%, ‰, °, ٪) or a dash beside
    # a digit joins the NUMBER run, not the surrounding RTL text —
    # rtl_03's golden keeps '%50' and '-2-5' as single number cells
    def _digit(i: int) -> bool:
        return 0 <= i < len(glyphs) and glyphs[i].text[:1].isdigit()

    for i, g in enumerate(glyphs):
        ch = g.text[:1]
        if strong[i] == 0 and ch in "%‰°٪-–−":
            if _digit(i + 1) or _digit(i - 1):
                strong[i] = 1
    # assign neutrals to the nearest preceding strong direction (fallback:
    # following), then split maximal runs. One UAX#9 N1 refinement: a
    # neutral whose preceding strong is a NUMBER (EN) and whose next
    # strong is RTL resolves RTL — European numbers count as R context
    # for neutral resolution, so the '(' after '2024' joins the Arabic
    # flow ('…ال لور (' in the rtl_02 golden), not the digit run.
    prev_cls = [0] * len(glyphs)   # -1 RTL / +1 letter / +2 digit
    pc = 0
    for i, g in enumerate(glyphs):
        if strong[i] != 0:
            pc = 2 if g.text[:1].isdigit() else strong[i]
        prev_cls[i] = pc
    next_cls = [0] * len(glyphs)
    nc = 0
    for i in range(len(glyphs) - 1, -1, -1):
        if strong[i] != 0:
            nc = 2 if glyphs[i].text[:1].isdigit() else strong[i]
        next_cls[i] = nc
    dirs: list[int] = []
    prev = 0
    for i, s in enumerate(strong):
        if s != 0:
            prev = s
            dirs.append(prev)
            continue
        if prev_cls[i] == 2 and next_cls[i] == -1:
            dirs.append(-1)
        else:
            dirs.append(prev)
    nxt = 0
    for i in range(len(dirs) - 1, -1, -1):
        if strong[i] != 0:
            nxt = strong[i]
        elif dirs[i] == 0:
            dirs[i] = nxt
    runs: list[list[Glyph]] = []
    run_dirs: list[int] = []
    for g, d in zip(glyphs, dirs):
        if runs and d == run_dirs[-1]:
            runs[-1].append(g)
        else:
            runs.append([g])
            run_dirs.append(d)
    rtl_line = n_rtl >= n_ltr
    out: list[list[Glyph]] = []
    order = range(len(runs) - 1, -1, -1) if rtl_line else range(len(runs))
    for i in order:
        run = runs[i]
        if run_dirs[i] < 0:
            run = list(reversed(run))
            # combining marks stay where the reversal puts them (BEFORE
            # their base): the reference's goldens carry marks in
            # reversed-visual position ('ووف ًخ', rtl_02; 'بناء ً',
            # rtl_01) — an r4 base-then-mark "restoration" matched zero
            # golden cells and cost one (measured r5)
        out.append(run)
    return out


def _same_face(
    id_a: int, name_a: str, id_b: int, name_b: str, by_name: bool = False
) -> bool:
    """Font-face identity for cell splitting. Default: resource
    identity (pdflatex faces are distinct resources and the LTR goldens
    split per resource — 'di|ffi|cult'). ``by_name=True`` (RTL pages):
    BaseFont-name identity — Word splits one family into several subset
    resources (Latin digits vs letters) and the reference keeps those
    in one cell ('Page 7', rtl_03 golden)."""
    if by_name and name_a and name_b:
        return name_a == name_b
    return id_a == id_b


def assemble_cells(
    glyphs: list[Glyph],
    page_height: float,
    page_no: int,
    cell_cls,
) -> list:
    """Positioned glyphs → textline cells.

    Baseline clustering → x-sort → cell split on gaps > 1 em (column
    gutters / table cells, mirroring merge_horizontal_cells' criterion)
    → positional space insertion (metric fonts only) → bidi runs."""
    if not glyphs:
        return []
    vertical = [g for g in glyphs if g.rot]
    glyphs = [g for g in glyphs if not g.rot]
    if not glyphs:
        return _assemble_vertical(vertical, page_height, page_no, cell_cls, 0)
    # cluster baselines (y in device space)
    glyphs = sorted(glyphs, key=lambda g: (-g.y, g.x0))
    lines: list[list[Glyph]] = []
    cur: list[Glyph] = [glyphs[0]]
    cur_y = glyphs[0].y
    for g in glyphs[1:]:
        tol = LINE_TOL_EM * max(g.size, cur[0].size, 1.0)
        if abs(g.y - cur_y) <= tol:
            cur.append(g)
        else:
            lines.append(cur)
            cur = [g]
            cur_y = g.y
    lines.append(cur)

    cells: list = []
    counter = 0
    page_rtl = any(_direction(g.text[:1]) < 0 for g in glyphs)
    for line in lines:
        line.sort(key=lambda g: g.x0)
        # double-paint dedup: the same character re-struck with its ink
        # nearly coincident (fake-bold double strikes; doubled kashida
        # stretch glyphs in justified Arabic) collapses to one glyph —
        # docling-parse sanitizes these the same way. Distinct repeats
        # (XX, oo, ...) advance past the 70% overlap bar and survive.
        pruned = [line[0]]
        for g in line[1:]:
            p = pruned[-1]
            w = max(p.x1 - p.x0, g.x1 - g.x0)
            if (
                g.text == p.text
                and not g.text.isspace()
                and w > 0
                and min(p.x1, g.x1) - max(p.x0, g.x0) >= 0.7 * w
            ):
                continue
            pruned.append(g)
        line = pruned
        rtl_line = any(_direction(g.text[:1]) < 0 for g in line)
        # Positioning-epoch segmentation (RTL lines): Word-generated RTL
        # PDFs draw each directional sub-run under its own BT/Td; the
        # reference's parser keeps those sub-runs as separate textline
        # cells when the text STATE differs across the boundary, and
        # merges x-abutting same-state runs (rtl_02 golden, verified
        # pair-by-pair):
        #   * font change between epochs → split (the lead-in face of
        #     'وعليه،', the Latin-font '2023' island);
        #   * Tc change between epochs → split ONLY when exactly one
        #     side's ink is Arabic (the lone ':' sub-run); Arabic↔Arabic
        #     and digit↔paren Tc flips stay merged (')2026').
        # Epoch attributes are segment-level, so glyph-wise font flips
        # inside one show op (digits inside an RTL run, rtl_01) merge.
        seg_font: dict[int, tuple] = {}
        seg_tc: dict[int, float] = {}
        seg_arabic: dict[int, bool] = {}
        seg_strong: dict[int, bool] = {}
        if rtl_line:
            for g in line:
                if g.seg not in seg_font and not g.text.isspace():
                    seg_font[g.seg] = (g.font, g.font_name)
                    seg_tc[g.seg] = g.tc
                seg_arabic[g.seg] = seg_arabic.get(g.seg, False) or (
                    not g.text.isspace() and _direction(g.text[:1]) < 0
                )
                seg_strong[g.seg] = seg_strong.get(g.seg, False) or (
                    not g.text.isspace() and _direction(g.text[:1]) != 0
                )

        def epoch_split(a: Glyph, b: Glyph) -> bool:
            if not rtl_line or a.seg == b.seg:
                return False
            fa, fb = seg_font.get(a.seg), seg_font.get(b.seg)
            if (
                fa is not None
                and fb is not None
                and not _same_face(*fa, *fb, by_name=True)
                # a neutral-only sub-run (a lone sentence '.') merges
                # across fonts — only strong-ink runs split on face, and
                # at least one side must be Arabic ink: an LTR header
                # pair ('Page' + '7' in different faces, rtl_03) stays
                # one cell in the goldens
                and seg_strong.get(a.seg, False)
                and seg_strong.get(b.seg, False)
                and (
                    seg_arabic.get(a.seg, False)
                    or seg_arabic.get(b.seg, False)
                )
            ):
                return True
            ta, tb = seg_tc.get(a.seg), seg_tc.get(b.seg)
            return (
                ta is not None
                and tb is not None
                and ta != tb
                and seg_arabic.get(a.seg, False)
                != seg_arabic.get(b.seg, False)
            )

        # split into cells on big gaps and — LTR lines only — font changes
        # (docling-parse starts a new textline cell per font run: the
        # zero-gap 'di|ffi|cult' / italic-span splits in the goldens; on
        # RTL lines font flips at every Latin digit/punct glyph and the
        # goldens keep those inside the run, splitting on state changes
        # at epoch boundaries and on gaps);
        # boundary spaces attach to the PREVIOUS group ('Note in ' |
        # 'Figure 7-26')
        groups: list[list[Glyph]] = [[line[0]]]
        last_solid_font = (
            (line[0].font, line[0].font_name)
            if not line[0].text.isspace()
            else None
        )
        for g in line[1:]:
            prev = groups[-1][-1]
            size = max(prev.size, g.size, 1.0)
            split_em = CELL_SPLIT_EM if (g.spaced and prev.spaced) \
                else CELL_SPLIT_EM_UNSPACED
            # a wide run of literal space GLYPHS is a cell separator
            # even though no positional gap exists (Word pads checkbox
            # labels with spaces: rtl_03's 'بلی        خير' golden
            # splits at the 2.4 em space run); 1.5 em keeps ordinary
            # double-spacing intact
            wide_spaces = False
            if not g.text.isspace():
                run_w = 0.0
                for p_g in reversed(groups[-1]):
                    if p_g.text.isspace():
                        run_w += p_g.x1 - p_g.x0
                    else:
                        break
                wide_spaces = run_w > 1.5 * size
            font_changed = (
                not rtl_line
                and not g.text.isspace()
                and last_solid_font is not None
                and not _same_face(
                    g.font, g.font_name, *last_solid_font,
                    by_name=page_rtl,
                )
            )
            if (
                g.x0 - prev.x1 > split_em * size
                or font_changed
                or wide_spaces
                or epoch_split(prev, g)
            ):
                groups.append([g])
            else:
                groups[-1].append(g)
            if not g.text.isspace():
                last_solid_font = (g.font, g.font_name)
        sub_runs = [
            run for group in groups for run in _bidi_cell_text(group)
        ]
        for run in sub_runs:
            parts: list[str] = []
            prev_g = None
            for g in run:
                if (
                    prev_g is not None
                    and g.spaced
                    and prev_g.spaced
                    and not g.text[:1].isspace()
                    and not (prev_g.text[-1:].isspace())
                    and g.x0 - prev_g.x1
                    > SPACE_GAP_EM * max(g.size, prev_g.size)
                ):
                    parts.append(" ")
                parts.append(g.text)
                prev_g = g
            text = "".join(parts)
            if text == "":
                continue
            size = max(g.size for g in run)
            x_l = min(g.x0 for g in run)
            x_r = max(g.x1 for g in run)
            y = max(g.y for g in run)
            ascent, descent = 0.8 * size, 0.2 * size
            cells.append(
                cell_cls(
                    index=counter,
                    text=text,
                    l=x_l,
                    t=page_height - (y + ascent),
                    r=x_r,
                    b=page_height - (y - descent),
                    font_size=size,
                    page_no=page_no,
                    # whitespace glyphs carry no typographic signal (a
                    # trailing space often rides the surrounding body
                    # face and would poison all-bold/all-mono tests)
                    font_name=next(
                        (
                            g.font_name
                            for g in run
                            if g.font_name and not g.text.isspace()
                        ),
                        "",
                    ),
                    font_names=tuple(
                        dict.fromkeys(
                            g.font_name
                            for g in run
                            if g.font_name and not g.text.isspace()
                        )
                    ),
                )
            )
            counter += 1
    cells.extend(
        _assemble_vertical(vertical, page_height, page_no, cell_cls, counter)
    )
    return cells


def _assemble_vertical(
    vertical: list[Glyph],
    page_height: float,
    page_no: int,
    cell_cls,
    counter: int,
) -> list:
    """Rotated runs → textline cells (the transposed twin of the
    horizontal path: the ``x`` position is the baseline, reading order
    runs along device ``y`` in the pen's advance direction — rotated
    table headers like redp5110's Table 2-2 read bottom-to-top).

    Reference behavior: docling-parse emits rotated headers as ordinary
    left-to-right strings (``*JOBCTL``), so the run is joined in reading
    order and boxed by its vertical extent."""
    cells: list = []
    for rot in (1, -1):
        vg = [g for g in vertical if g.rot == rot]
        if not vg:
            continue
        # cluster the x "baselines", then read each run along rot*y
        vg.sort(key=lambda g: (g.x0, rot * g.y))
        lines: list[list[Glyph]] = [[vg[0]]]
        for g in vg[1:]:
            prev = lines[-1][0]
            tol = LINE_TOL_EM * max(g.size, prev.size, 1.0)
            if abs(g.x0 - prev.x0) <= tol:
                lines[-1].append(g)
            else:
                lines.append([g])
        for line in lines:
            line.sort(key=lambda g: rot * g.y)
            groups: list[list[Glyph]] = [[line[0]]]
            for g in line[1:]:
                prev = groups[-1][-1]
                size = max(prev.size, g.size, 1.0)
                gap = rot * (g.y - prev.y) - prev.adv
                if gap > CELL_SPLIT_EM * size:
                    groups.append([g])
                else:
                    groups[-1].append(g)
            for run in groups:
                parts: list[str] = []
                prev_g = None
                for g in run:
                    if (
                        prev_g is not None
                        and g.spaced
                        and prev_g.spaced
                        and not g.text[:1].isspace()
                        and not prev_g.text[-1:].isspace()
                        and rot * (g.y - prev_g.y) - prev_g.adv
                        > SPACE_GAP_EM * max(g.size, prev_g.size)
                    ):
                        parts.append(" ")
                    parts.append(g.text)
                    prev_g = g
                text = "".join(parts)
                if not text.strip():
                    continue
                size = max(g.size for g in run)
                y_lo = min(g.y for g in run) - (run[-1].adv if rot < 0 else 0)
                y_hi = max(g.y for g in run) + (run[-1].adv if rot > 0 else 0)
                # glyph ink rises toward -x for +rot (90° CCW), +x for -rot
                x = min(g.x0 for g in run)
                x_l = x - (0.8 * size if rot > 0 else 0.2 * size)
                x_r = x + (0.2 * size if rot > 0 else 0.8 * size)
                cells.append(
                    cell_cls(
                        index=counter,
                        text=text,
                        l=x_l,
                        t=page_height - y_hi,
                        r=x_r,
                        b=page_height - y_lo,
                        font_size=size,
                        page_no=page_no,
                        font_name=next(
                            (
                                g.font_name
                                for g in run
                                if g.font_name and not g.text.isspace()
                            ),
                            "",
                        ),
                        font_names=tuple(
                            dict.fromkeys(
                                g.font_name
                                for g in run
                                if g.font_name and not g.text.isspace()
                            )
                        ),
                    )
                )
                counter += 1
    return cells


# -- content-stream interpreter -------------------------------------------------

_BI_RE = re.compile(rb"\bBI\b.*?\bEI\b", re.DOTALL)


class TextEngine:
    """Interprets content streams, accumulating positioned glyphs."""

    def __init__(self, fonts: dict[str, Font], xobjects=None):
        """``xobjects``: name → (content bytes, fonts dict, inner xobjects)
        resolver for Form XObject ``Do`` recursion (may be a callable)."""
        self.fonts = fonts
        self.xobjects = xobjects or {}
        self.glyphs: list[Glyph] = []
        # raster /Image Do placements: (x0, y0, x1, y1) in device space,
        # bottom-left origin (unit square mapped through the CTM) — the
        # engine's get_bitmap_rects analog (pypdfium2_backend.py:254-268)
        self.image_rects: list[tuple[float, float, float, float]] = []
        # painted axis-aligned path segments (x0, y0, x1, y1), device
        # space, bottom-left origin — table ruling lines (pdf/tables.py)
        self.rulings: list[tuple[float, float, float, float]] = []

    def run(self, content: bytes, token_re, decode_str, depth: int = 0):
        if depth > 8:
            return
        content = _BI_RE.sub(b" ", content)
        fonts = self.fonts
        ctm: Matrix = IDENTITY
        gstack: list = []
        tm: Matrix = IDENTITY
        tlm: Matrix = IDENTITY
        font: Font | None = None
        tfs = 12.0
        tc = 0.0
        tw = 0.0
        tz = 1.0
        tl = 0.0
        ts = 0.0
        in_text = False
        seg_epoch = 0
        stack: list = []
        # path construction state (PDF 32000-1 §8.5): segments collect in
        # user space until a paint op commits them (stroke/fill) or ``n``
        # discards them (clip-only paths)
        path_segs: list[tuple[float, float, float, float]] = []
        cur_pt: tuple[float, float] | None = None
        start_pt: tuple[float, float] | None = None

        def dev(x: float, y: float) -> tuple[float, float]:
            a, b_, c, d, e, f_ = ctm
            return (x * a + y * c + e, x * b_ + y * d + f_)

        def commit_path():
            # keep axis-aligned, non-degenerate segments: ruling lines
            for x0, y0, x1, y1 in path_segs:
                if len(self.rulings) >= 20000:
                    break
                dx, dy = abs(x1 - x0), abs(y1 - y0)
                if (dx <= 0.5 or dy <= 0.5) and max(dx, dy) >= 4.0:
                    self.rulings.append((x0, y0, x1, y1))
            path_segs.clear()

        def show(raw_text: str):
            nonlocal tm
            # shared sentinel, not a per-call Font(): glyphs key cell
            # splits on id(font), and a transient object's id is
            # allocation-order-dependent (nondeterministic segmentation)
            f = font or _UNRESOLVED_FONT
            raw = raw_text.encode("latin-1", errors="ignore")
            # Hot loop: the full chain is trm = S·(tm·ctm) with
            # S = (tfs·tz, 0, 0, tfs, 0, ts) and a translate-only tm
            # advance per glyph — so of tm·ctm only the e/f entries move
            # inside a run, and of trm only indices 0/3/4/5 are read.
            # The scalars below replicate mmul's exact expressions (same
            # multiply/add grouping → bit-identical coordinates); the
            # dropped terms are all 0·x against nonzero sums.
            qa, qb, qc_, qd, qe, qf = tm
            ca, cb, cc_, cd, ce, cf = ctm
            ta = qa * ca + qb * cc_
            tcc = qc_ * ca + qd * cc_
            tdd = qc_ * cb + qd * cd
            # rotated runs: the glyph-height direction maps to device x
            # through tcc (the text-space y-axis), so that is the second
            # fallback before the x-axis scale
            size = (
                abs(tfs * tdd)
                or abs(tfs * tcc)
                or abs((tfs * tz) * ta)
                or tfs
            )
            x_mul = ts * tcc
            y_mul = ts * tdd
            # device direction of the text-space x-axis: |dx|>=|dy| is
            # ordinary horizontal text; otherwise the run is rotated and
            # the pen advances along device y (sign = reading direction)
            dirx = qa * ca + qb * cc_
            diry = qa * cb + qb * cd
            if abs(dirx) >= abs(diry):
                rot = 0
            else:
                rot = 1 if diry > 0 else -1
            spaced = f.has_metrics
            fid = id(f)
            fname = f.name
            glyphs_append = self.glyphs.append
            for code, uni, w_em, is_space in f.iter_codes(raw):
                adv = (w_em * tfs + tc + (tw if is_space else 0.0)) * tz
                e2 = adv * qa + qe
                f2 = adv * qb + qf
                # glyph extent = ink advance only (w·tfs·tz); the pen
                # still moves by the Tc/Tw-inclusive advance.  A show op
                # like [(XX)]TJ with Tc≈5em paints X's five columns apart
                # (redp5110 Table 2-2) — folding Tc into x1 glues such
                # cells into "XX" where docling-parse splits them at the
                # inter-ink gap.
                ink = w_em * tfs * tz
                ei = ink * qa + qe
                fi = ink * qb + qf
                if uni:
                    glyphs_append(
                        Glyph(
                            text=uni,
                            x0=x_mul + (qe * ca + qf * cc_ + ce),
                            x1=x_mul + (ei * ca + fi * cc_ + ce),
                            y=y_mul + (qe * cb + qf * cd + cf),
                            size=size,
                            spaced=spaced,
                            font=fid,
                            font_name=fname,
                            rot=rot,
                            adv=abs(ink * diry) if rot else 0.0,
                            tc=tc,
                            seg=seg_epoch,
                        )
                    )
                qe, qf = e2, f2
            tm = (qa, qb, qc_, qd, qe, qf)

        for m in token_re.finditer(content):
            kind = m.lastgroup
            if kind == "str":
                stack.append(("str", decode_str(m.group())))
            elif kind == "hex":
                hex_body = re.sub(rb"\s", b"", m.group()[1:-1])
                if len(hex_body) % 2:
                    hex_body += b"0"
                stack.append(
                    ("str", bytes.fromhex(hex_body.decode()).decode("latin-1"))
                )
            elif kind == "num":
                stack.append(("num", float(m.group())))
            elif kind == "arr_open":
                stack.append(("mark", None))
            elif kind == "arr_close":
                items = []
                while stack and stack[-1][0] != "mark":
                    items.append(stack.pop())
                if stack:
                    stack.pop()
                stack.append(("arr", list(reversed(items))))
            elif kind == "name":
                stack.append(("name", m.group().decode("latin-1")))
            elif kind == "op":
                op = m.group()
                nums = [v for t, v in stack if t == "num"]
                if op == b"q":
                    gstack.append((ctm, font, tfs, tc, tw, tz, tl, ts))
                elif op == b"Q":
                    if gstack:
                        ctm, font, tfs, tc, tw, tz, tl, ts = gstack.pop()
                elif op == b"cm" and len(nums) >= 6:
                    ctm = mmul(tuple(nums[-6:]), ctm)
                elif op == b"BT":
                    in_text = True
                    seg_epoch += 1
                    tm = tlm = IDENTITY
                elif op == b"ET":
                    in_text = False
                elif op == b"Tf" and len(stack) >= 2:
                    if nums:
                        tfs = nums[-1]
                    names = [v for t, v in stack if t == "name"]
                    if names:
                        fname = names[-1].lstrip("/")
                        font = fonts.get(fname, font)
                elif op == b"Tc" and nums:
                    tc = nums[-1]
                elif op == b"Tw" and nums:
                    tw = nums[-1]
                elif op == b"Tz" and nums:
                    tz = nums[-1] / 100.0
                elif op == b"TL" and nums:
                    tl = nums[-1]
                elif op == b"Ts" and nums:
                    ts = nums[-1]
                elif op == b"Td" and len(nums) >= 2:
                    seg_epoch += 1
                    tlm = mmul(translate(nums[-2], nums[-1]), tlm)
                    tm = tlm
                elif op == b"TD" and len(nums) >= 2:
                    seg_epoch += 1
                    tl = -nums[-1]
                    tlm = mmul(translate(nums[-2], nums[-1]), tlm)
                    tm = tlm
                elif op == b"Tm" and len(nums) >= 6:
                    seg_epoch += 1
                    tm = tlm = tuple(nums[-6:])
                elif op == b"T*":
                    seg_epoch += 1
                    tlm = mmul(translate(0.0, -tl), tlm)
                    tm = tlm
                elif op == b"Tj" and in_text and stack and stack[-1][0] == "str":
                    show(stack[-1][1])
                elif op == b"'" and in_text and stack and stack[-1][0] == "str":
                    seg_epoch += 1
                    tlm = mmul(translate(0.0, -tl), tlm)
                    tm = tlm
                    show(stack[-1][1])
                elif op == b'"' and in_text and stack and stack[-1][0] == "str":
                    seg_epoch += 1
                    if len(nums) >= 2:
                        tw, tc = nums[-2], nums[-1]
                    tlm = mmul(translate(0.0, -tl), tlm)
                    tm = tlm
                    show(stack[-1][1])
                elif op == b"TJ" and in_text and stack and stack[-1][0] == "arr":
                    for t, v in stack[-1][1]:
                        if t == "str":
                            show(v)
                        elif t == "num":
                            tm = mmul(
                                translate(-v / 1000.0 * tfs * tz, 0.0), tm
                            )
                elif op == b"m" and len(nums) >= 2:
                    cur_pt = start_pt = dev(nums[-2], nums[-1])
                elif op == b"l" and len(nums) >= 2:
                    pt = dev(nums[-2], nums[-1])
                    if cur_pt is not None:
                        path_segs.append((*cur_pt, *pt))
                    cur_pt = pt
                elif op in (b"c", b"v", b"y") and len(nums) >= 2:
                    # curves: endpoints only (rulings are straight lines)
                    cur_pt = dev(nums[-2], nums[-1])
                elif op == b"re" and len(nums) >= 4:
                    x, y, w, h = nums[-4:]
                    p00, p10 = dev(x, y), dev(x + w, y)
                    p11, p01 = dev(x + w, y + h), dev(x, y + h)
                    path_segs.extend(
                        [
                            (*p00, *p10),
                            (*p10, *p11),
                            (*p11, *p01),
                            (*p01, *p00),
                        ]
                    )
                    cur_pt = start_pt = p00
                elif op == b"h":
                    if cur_pt is not None and start_pt is not None:
                        path_segs.append((*cur_pt, *start_pt))
                        cur_pt = start_pt
                elif op in (b"S", b"f", b"F", b"f*", b"B", b"B*"):
                    commit_path()
                elif op in (b"s", b"b", b"b*"):
                    if cur_pt is not None and start_pt is not None:
                        path_segs.append((*cur_pt, *start_pt))
                    commit_path()
                elif op == b"n":
                    path_segs.clear()  # clipping path, nothing painted
                elif op == b"Do" and stack and stack[-1][0] == "name":
                    xname = stack[-1][1].lstrip("/")
                    resolved = (
                        self.xobjects(xname)
                        if callable(self.xobjects)
                        else self.xobjects.get(xname)
                    )
                    if resolved is not None and resolved[0] == "image":
                        # image space is the unit square; its CTM image
                        # is the painted rect (PDF 32000-1 §8.9.5.2)
                        a, b_, c, d, e, f_ = ctm
                        xs = (e, a + e, c + e, a + c + e)
                        ys = (f_, b_ + f_, d + f_, b_ + d + f_)
                        self.image_rects.append(
                            (min(xs), min(ys), max(xs), max(ys))
                        )
                    elif resolved is not None and resolved[0] == "form":
                        _tag, xcontent, xfonts, xxobjects = resolved
                        # form glyphs map through the invoking CTM
                        self._run_form(
                            xcontent,
                            xfonts or fonts,
                            xxobjects or self.xobjects,
                            ctm,
                            token_re,
                            decode_str,
                            depth + 1,
                        )
                stack.clear()

    def _run_form(
        self, content, fonts, xobjects, ctm, token_re, decode_str, depth
    ):
        sub = TextEngine(fonts, xobjects)
        sub.run(content, token_re, decode_str, depth)
        # re-map the sub-engine's device coords through the invoking CTM
        a, b, c, d, e, f = ctm
        for rx0, ry0, rx1, ry1 in sub.image_rects:
            xs = tuple(x * a + y * c + e for x in (rx0, rx1) for y in (ry0, ry1))
            ys = tuple(x * b + y * d + f for x in (rx0, rx1) for y in (ry0, ry1))
            self.image_rects.append((min(xs), min(ys), max(xs), max(ys)))
        for sx0, sy0, sx1, sy1 in sub.rulings:
            self.rulings.append(
                (
                    sx0 * a + sy0 * c + e,
                    sx0 * b + sy0 * d + f,
                    sx1 * a + sy1 * c + e,
                    sx1 * b + sy1 * d + f,
                )
            )
        for g in sub.glyphs:
            x0 = g.x0 * a + g.y * c + e
            y0 = g.x0 * b + g.y * d + f
            x1 = g.x1 * a + g.y * c + e
            scale = abs(d) or abs(a) or 1.0
            self.glyphs.append(
                Glyph(
                    text=g.text,
                    x0=x0,
                    x1=x1,
                    y=y0,
                    size=g.size * scale,
                    spaced=g.spaced,
                    font=g.font,
                    font_name=g.font_name,
                )
            )
