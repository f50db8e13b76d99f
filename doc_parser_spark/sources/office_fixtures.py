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


def make_doc(i: int = 0) -> bytes:
    """Deterministic legacy .doc (MS-DOC FIB + CLX piece table in 1Table).

    Two text pieces — one CP1252-compressed, one UTF-16LE — plus a 2x2
    table region, exercising both piece encodings and the cell/row marks."""
    import struct

    from doc_parser_spark.core.cfb import write_cfb

    piece1 = f"Legacy doc {i} paragraph one.\r".encode("cp1252")
    table_text = "A\x07B\x07\x07c\x07d\x07\x07"
    piece2 = (f"Unicode piece – two ¶{i}.\r" + table_text).encode("utf-16-le")
    n1 = len(piece1)
    n2 = len(piece2) // 2
    ccp_text = n1 + n2

    header_len = 1024
    fc1 = header_len  # compressed piece: fc stored doubled
    fc2 = header_len + n1

    fib = bytearray(header_len)
    struct.pack_into("<HH", fib, 0, 0xA5EC, 0x00C1)
    struct.pack_into("<H", fib, 0x0A, 0x0200)  # fWhichTblStm -> 1Table
    struct.pack_into("<H", fib, 32, 14)  # csw
    struct.pack_into("<H", fib, 62, 22)  # cslw
    struct.pack_into("<i", fib, 64 + 3 * 4, ccp_text)  # FibRgLw97.ccpText
    struct.pack_into("<H", fib, 152, 93)  # cbRgFcLcb (Word97)
    # fcClx / lcbClx = pair 33 of the FcLcb blob at 154
    clx_off = 0x20

    pcd1 = struct.pack("<HIH", 0, (fc1 * 2) | 0x40000000, 0)
    pcd2 = struct.pack("<HIH", 0, fc2, 0)
    plc = struct.pack("<3i", 0, n1, ccp_text) + pcd1 + pcd2
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<II", fib, 154 + 33 * 8, clx_off, len(clx))

    word_stream = bytes(fib) + piece1 + piece2
    table_stream = b"\x00" * clx_off + clx
    return write_cfb({"WordDocument": word_stream, "1Table": table_stream})


def make_xls(i: int = 0) -> bytes:
    """Deterministic legacy .xls (BIFF8): SST split across a Continue,
    LABELSST/NUMBER/RK/MULRK cells, a merged header, two sheets."""
    import struct

    from doc_parser_spark.core.cfb import write_cfb

    def rec(rtype: int, payload: bytes) -> bytes:
        return struct.pack("<HH", rtype, len(payload)) + payload

    def bof(dt: int) -> bytes:
        return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))

    s0 = f"Header {i}".encode("latin-1")
    s1 = "wide ¶ string"  # forces fHighByte
    s2_head, s2_tail = "split", "string"  # spans the Continue boundary
    sst_payload = (
        struct.pack("<II", 4, 3)
        + struct.pack("<HB", len(s0), 0) + s0
        + struct.pack("<HB", len(s1), 1) + s1.encode("utf-16-le")
        + struct.pack("<HB", len(s2_head + s2_tail), 0) + s2_head.encode("latin-1")
    )
    # Continue restarts with a fresh grbit byte, then the rest of the chars
    continue_payload = b"\x00" + s2_tail.encode("latin-1")

    def labelsst(rw: int, col: int, isst: int) -> bytes:
        return rec(0x00FD, struct.pack("<HHHI", rw, col, 0, isst))

    def number(rw: int, col: int, x: float) -> bytes:
        return rec(0x0203, struct.pack("<HHHd", rw, col, 0, x))

    def rk_int(v: int) -> int:
        return ((v << 2) & 0xFFFFFFFF) | 0x02

    sheet1 = (
        bof(0x0010)
        + labelsst(0, 0, 0)
        + labelsst(0, 1, 1)
        + labelsst(0, 2, 2)
        + number(1, 0, 3.25)
        + rec(0x027E, struct.pack("<HHHI", 1, 1, 0, rk_int(42)))
        + rec(
            0x00BD,
            struct.pack("<HH", 1, 2)
            + struct.pack("<HI", 0, rk_int(7))
            + struct.pack("<H", 2),
        )
        + rec(0x00E5, struct.pack("<HHHHH", 1, 3, 3, 0, 1))  # merged A4:B4
        + labelsst(3, 0, 0)
        + rec(0x000A, b"")
    )
    sheet2 = bof(0x0010) + number(0, 0, float(100 + i)) + rec(0x000A, b"")

    def bsheet(name: str, pos: int) -> bytes:
        nm = name.encode("latin-1")
        return rec(0x0085, struct.pack("<IHBB", pos, 0, len(nm), 0) + nm)

    # two passes: globals size depends only on name lengths (offsets patched)
    def globals_blob(p1: int, p2: int) -> bytes:
        return (
            bof(0x0005)
            + rec(0x00FC, sst_payload)
            + rec(0x003C, continue_payload)
            + bsheet("Alpha", p1)
            + bsheet("Beta", p2)
            + rec(0x000A, b"")
        )

    glen = len(globals_blob(0, 0))
    wb = globals_blob(glen, glen + len(sheet1)) + sheet1 + sheet2
    return write_cfb({"Workbook": wb})


def make_ppt(i: int = 0) -> bytes:
    """Deterministic legacy .ppt: SlideListWithText with two slides
    (title + body text atoms, both encodings)."""
    import struct

    from doc_parser_spark.core.cfb import write_cfb

    def atom(rtype: int, payload: bytes, inst: int = 0) -> bytes:
        return struct.pack("<HHI", inst << 4, rtype, len(payload)) + payload

    def container(rtype: int, body: bytes) -> bytes:
        return struct.pack("<HHI", 0x000F, rtype, len(body)) + body

    def persist() -> bytes:
        return atom(0x03F3, b"\x00" * 20)

    def theader(kind: int) -> bytes:
        return atom(0x0F9F, struct.pack("<I", kind))

    slide_list = container(
        0x0FF0,
        persist()
        + theader(0)
        + atom(0x0FA0, f"Slide one title {i}".encode("utf-16-le"))
        + theader(1)
        + atom(0x0FA8, b"Body bullet one\rBody bullet two")
        + persist()
        + theader(0)
        + atom(0x0FA0, "Zwölf title".encode("utf-16-le")),
    )
    document = container(0x03E8, slide_list)
    return write_cfb({"PowerPoint Document": document, "Current User": b"\x00" * 8})


def make_mhtml(i: int = 0) -> bytes:
    """Deterministic MHTML snapshot: multipart/related with a
    quoted-printable HTML root part and a dummy image part."""
    import base64
    import quopri

    html = (
        f"<html><head><title>Archived page {i}</title></head><body>"
        f"<h1>Snapshot {i}</h1><p>Saved café content.</p>"
        "<ul><li>alpha</li><li>beta</li></ul></body></html>"
    ).encode("utf-8")
    qp = quopri.encodestring(html).decode("ascii")
    img = base64.b64encode(b"\x89PNG\r\n\x1a\nfakepng").decode("ascii")
    return (
        "From: <Saved by a crawler>\r\n"
        f"Subject: Archived page {i}\r\n"
        "Snapshot-Content-Location: https://example.org/page\r\n"
        "MIME-Version: 1.0\r\n"
        'Content-Type: multipart/related; type="text/html"; boundary="--bnd"\r\n'
        "\r\n"
        "----bnd\r\n"
        "Content-Type: text/html; charset=utf-8\r\n"
        "Content-Transfer-Encoding: quoted-printable\r\n"
        "Content-Location: https://example.org/page\r\n"
        "\r\n"
        f"{qp}\r\n"
        "----bnd\r\n"
        "Content-Type: image/png\r\n"
        "Content-Transfer-Encoding: base64\r\n"
        "\r\n"
        f"{img}\r\n"
        "----bnd--\r\n"
    ).encode("ascii")


def make_eml(i: int = 0) -> bytes:
    """Deterministic plain-text email."""
    return (
        f"From: sender{i}@example.com\r\n"
        f"To: list@example.org\r\n"
        f"Subject: Weekly report {i}\r\n"
        "Date: Mon, 1 Jan 2024 00:00:00 +0000\r\n"
        "MIME-Version: 1.0\r\n"
        "Content-Type: text/plain; charset=utf-8\r\n"
        "Content-Transfer-Encoding: 8bit\r\n"
        "\r\n"
        f"First paragraph of report {i}.\r\n"
        "\r\n"
        "Second paragraph with caf\xc3\xa9 bytes.\r\n".encode("latin-1").decode("latin-1")
    ).encode("latin-1")


def make_rtf(i: int = 0) -> bytes:
    """Deterministic RTF: destinations, hex + unicode escapes, a table."""
    return (
        b"{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Calibri;}}"
        b"{\\*\\generator fixture;}"
        b"\\pard Rtf fixture " + str(i).encode() + b" caf\\'e9 \\u8212? text.\\par "
        b"Second paragraph " + str(i).encode() + b".\\par "
        b"\\trowd\\cellx1\\cellx2 K\\cell V\\cell\\row "
        b"\\trowd\\cellx1\\cellx2 k" + str(i).encode() + b"\\cell v\\cell\\row "
        b"\\pard Tail.\\par }"
    )


def make_warc(i: int = 0) -> bytes:
    """Deterministic WARC slice: warcinfo record + HTML response record."""
    html = (
        f"<html><body><h1>Crawled {i}</h1><p>Warc wrapped paragraph.</p>"
        "</body></html>"
    ).encode()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    )
    info = b"software: fixture\r\n"
    rec1 = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"Content-Length: " + str(len(info)).encode() + b"\r\n\r\n" + info
    )
    rec2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://example.org/" + str(i).encode() + b"\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n" + http
    )
    return rec1 + b"\r\n\r\n" + rec2 + b"\r\n\r\n"


def make_epub(i: int = 0) -> bytes:
    """Deterministic EPUB 3: OCF container, 2-chapter spine, nav excluded."""
    ch1 = f"""<?xml version="1.0"?>
<html xmlns="http://www.w3.org/1999/xhtml"><head><title>c1</title></head>
<body><h1>Book {i}</h1><p>Opening paragraph {i}.</p>
<ul><li>first point</li><li>second point</li></ul></body></html>"""
    ch2 = f"""<?xml version="1.0"?>
<html xmlns="http://www.w3.org/1999/xhtml"><head><title>c2</title></head>
<body><h2>Chapter Two</h2><p>Closing paragraph {i}.</p>
<table><tr><th>k</th><th>v</th></tr><tr><td>a{i}</td><td>b</td></tr></table>
</body></html>"""
    opf = f"""<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="id">
<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
<dc:title>Fixture Book {i}</dc:title><dc:identifier id="id">urn:f{i}</dc:identifier>
</metadata>
<manifest>
<item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>
<item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/>
</manifest>
<spine><itemref idref="c1"/><itemref idref="c2"/></spine>
</package>"""
    container = """<?xml version="1.0"?>
<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
<rootfiles><rootfile full-path="OEBPS/content.opf"
 media-type="application/oebps-package+xml"/></rootfiles></container>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        # OCF: mimetype first, stored uncompressed
        zf.writestr("mimetype", "application/epub+zip",
                    compress_type=zipfile.ZIP_STORED)
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("OEBPS/content.opf", opf)
        zf.writestr("OEBPS/ch1.xhtml", ch1)
        zf.writestr("OEBPS/ch2.xhtml", ch2)
    return buf.getvalue()


_ODF_OFFICE = (
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
    'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0" '
    'xmlns:presentation="urn:oasis:names:tc:opendocument:xmlns:presentation:1.0"'
)


def _odf_zip(mimetype: str, content: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", mimetype, compress_type=zipfile.ZIP_STORED)
        zf.writestr("meta.xml", '<?xml version="1.0"?><meta/>')
        zf.writestr("content.xml", content)
    return buf.getvalue()


def make_odt(i: int = 0) -> bytes:
    """Deterministic ODT: heading, paragraphs (tab/space runs), list, table."""
    content = f"""<?xml version="1.0"?>
<office:document-content {_ODF_OFFICE}><office:body><office:text>
<text:h text:outline-level="1">Odt Report {i}</text:h>
<text:p>Lead<text:s text:c="2"/>paragraph<text:tab/>{i}.</text:p>
<text:list text:style-name="Numbering_20_1">
<text:list-item><text:p>alpha step</text:p></text:list-item>
<text:list-item><text:p>beta step</text:p></text:list-item>
</text:list>
<table:table table:name="T1">
<table:table-row><table:table-cell><text:p>k</text:p></table:table-cell>
<table:table-cell><text:p>v</text:p></table:table-cell></table:table-row>
<table:table-row><table:table-cell><text:p>row{i}</text:p></table:table-cell>
<table:table-cell><text:p>val</text:p></table:table-cell></table:table-row>
</table:table>
<text:p>Tail paragraph.</text:p>
</office:text></office:body></office:document-content>"""
    return _odf_zip("application/vnd.oasis.opendocument.text", content)


def make_ods(i: int = 0) -> bytes:
    """Deterministic ODS: two sheets, repeated columns, trailing padding."""
    content = f"""<?xml version="1.0"?>
<office:document-content {_ODF_OFFICE}><office:body><office:spreadsheet>
<table:table table:name="Data">
<table:table-row><table:table-cell><text:p>h1</text:p></table:table-cell>
<table:table-cell table:number-columns-repeated="2"><text:p>h2</text:p></table:table-cell>
</table:table-row>
<table:table-row><table:table-cell><text:p>{i}</text:p></table:table-cell>
<table:table-cell><text:p>x</text:p></table:table-cell>
<table:table-cell table:number-columns-repeated="1000"/></table:table-row>
<table:table-row table:number-rows-repeated="500">
<table:table-cell table:number-columns-repeated="1003"/></table:table-row>
</table:table>
<table:table table:name="Empty"/>
</office:spreadsheet></office:body></office:document-content>"""
    return _odf_zip("application/vnd.oasis.opendocument.spreadsheet", content)


def make_odp(i: int = 0) -> bytes:
    """Deterministic ODP: title slide + bullet slide with a table."""
    content = f"""<?xml version="1.0"?>
<office:document-content {_ODF_OFFICE}><office:body><office:presentation>
<draw:page draw:name="page1">
<draw:frame presentation:class="title"><draw:text-box>
<text:p>Deck {i}</text:p></draw:text-box></draw:frame>
<draw:frame presentation:class="subtitle"><draw:text-box>
<text:p>Subtitle line.</text:p></draw:text-box></draw:frame>
</draw:page>
<draw:page draw:name="page2">
<draw:frame presentation:class="title"><draw:text-box>
<text:p>Points</text:p></draw:text-box></draw:frame>
<draw:frame><draw:text-box>
<text:list><text:list-item><text:p>point one</text:p></text:list-item>
<text:list-item><text:p>point two {i}</text:p></text:list-item></text:list>
</draw:text-box></draw:frame>
<draw:frame><table:table>
<table:table-row><table:table-cell><text:p>c</text:p></table:table-cell>
<table:table-cell><text:p>d{i}</text:p></table:table-cell></table:table-row>
</table:table></draw:frame>
</draw:page>
</office:presentation></office:body></office:document-content>"""
    return _odf_zip("application/vnd.oasis.opendocument.presentation", content)
