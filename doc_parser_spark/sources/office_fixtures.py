"""Deterministic office-container fixture builders (tests + synthetic corpus).

Minimal-but-valid DOCX/XLSX/PPTX/HWPX archives built with stdlib zipfile;
used by the unit suite and by the synthetic page generator to exercise the
zip-routing branch end-to-end.
"""

from __future__ import annotations

import io
import zipfile


def _zip_bytes(members: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in members.items():
            zf.writestr(name, content)
    return buf.getvalue()


_W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def make_docx() -> bytes:
    document = f"""<?xml version="1.0"?>
<w:document {_W_NS}><w:body>
<w:p><w:pPr><w:pStyle w:val="Title"/></w:pPr><w:r><w:t>Doc Title</w:t></w:r></w:p>
<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Intro</w:t></w:r></w:p>
<w:p><w:r><w:t>First </w:t></w:r><w:r><w:t>paragraph.</w:t></w:r></w:p>
<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr></w:pPr><w:r><w:t>item one</w:t></w:r></w:p>
<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr></w:pPr><w:r><w:t>item two</w:t></w:r></w:p>
<w:tbl><w:tr><w:tc><w:p><w:r><w:t>H1</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>H2</w:t></w:r></w:p></w:tc></w:tr>
<w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
</w:body></w:document>"""
    return _zip_bytes(
        {"[Content_Types].xml": "<Types/>", "word/document.xml": document}
    )


def make_xlsx() -> bytes:
    shared = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>name</t></si><si><t>alice</t></si></sst>"""
    sheet = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>
<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>7</v></c></row>
</sheetData></worksheet>"""
    return _zip_bytes(
        {
            "[Content_Types].xml": "<Types/>",
            "xl/workbook.xml": "<workbook/>",
            "xl/sharedStrings.xml": shared,
            "xl/worksheets/sheet1.xml": sheet,
        }
    )


def make_pptx() -> bytes:
    slide = """<?xml version="1.0"?>
<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
       xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
<p:cSld><p:spTree>
<p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
  <p:txBody><a:p><a:r><a:t>Slide Title</a:t></a:r></a:p></p:txBody></p:sp>
<p:sp><p:nvSpPr><p:nvPr/></p:nvSpPr>
  <p:txBody><a:p><a:r><a:t>Bullet text</a:t></a:r></a:p></p:txBody></p:sp>
</p:spTree></p:cSld></p:sld>"""
    return _zip_bytes(
        {
            "[Content_Types].xml": "<Types/>",
            "ppt/presentation.xml": "<presentation/>",
            "ppt/slides/slide1.xml": slide,
        }
    )


def make_hwpx() -> bytes:
    section = """<?xml version="1.0"?>
<hs:sec xmlns:hs="http://www.hancom.co.kr/hwpml/2011/section"
        xmlns:hp="http://www.hancom.co.kr/hwpml/2011/paragraph">
<hp:p><hp:run><hp:t>한국어 본문 단락</hp:t></hp:run></hp:p>
<hp:tbl><hp:tr><hp:tc><hp:subList><hp:p><hp:run><hp:t>셀</hp:t></hp:run></hp:p></hp:subList></hp:tc></hp:tr></hp:tbl>
</hs:sec>"""
    return _zip_bytes(
        {
            "mimetype": "application/hwp+zip",
            "Contents/content.hpf": "<package/>",
            "Contents/section0.xml": section,
        }
    )




def make_hwp(i: int = 0) -> bytes:
    """Deterministic HWP v5 container (CFB + deflated record stream)."""
    import struct
    import zlib

    from doc_parser_spark.core.cfb import write_cfb

    def rec(tag: int, payload: bytes) -> bytes:
        return struct.pack("<I", tag | (len(payload) << 20)) + payload

    paras = [
        f"한글 문서 {i} 본문입니다.",
        f"둘째 문단 {i}: pure-Python HWP fixture.",
    ]
    body = b"".join(
        rec(66, b"\x00" * 8) + rec(67, p.encode("utf-16-le")) for p in paras
    )
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    header = (
        b"HWP Document File" + b"\x00" * 15
        + struct.pack("<II", 0x05000300, 1)
        + b"\x00" * 216
    )
    return write_cfb(
        {"FileHeader": header, "BodyText/Section0": co.compress(body) + co.flush()}
    )


def make_wav(i: int = 0, n_samples: int = 256) -> bytes:
    """Deterministic 8 kHz 16-bit mono WAV (triangle wave)."""
    import struct

    pcm = b"".join(
        struct.pack("<h", ((s * (37 + i)) % 2048) - 1024) for s in range(n_samples)
    )
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm))
    )
    return hdr + pcm
