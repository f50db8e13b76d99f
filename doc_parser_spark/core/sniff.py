"""Content-based format detection (SURVEY.md §2.1 Op-1).

Re-expresses the reference's format sniffing
(``docling/datamodel/document.py:306-506`` ``_guess_format`` /
``_guess_from_content`` / ``_detect_html_xhtml``; magic-byte variant
``doc_preprocessors/attachment_processor.py:1128-1142``) as a pure function
over the payload bytes. Designed to be applied per-row inside the Arrow
batch; the PDF/zip magic checks are also mirrored as native column
expressions in the extraction plan so Catalyst can route the cheap cases
without Python (see operators/extract.py).
"""

from __future__ import annotations

import re

from doc_parser_spark.core.image_backend import sniff_image

FORMAT_PDF = "pdf"
FORMAT_HTML = "html"
FORMAT_XML = "xml"
FORMAT_ZIP = "zip"  # office-container family (docx/xlsx/pptx/hwpx)
FORMAT_MD = "md"
FORMAT_ADOC = "asciidoc"
FORMAT_CSV = "csv"
FORMAT_JSON = "json"
FORMAT_DOC_JSON = "doc_json"  # this engine's lossless document JSON
FORMAT_TEXT = "text"
FORMAT_AUDIO = "audio"
FORMAT_IMAGE = "image"  # standalone raster payload (reference InputFormat.IMAGE)
FORMAT_CFB = "cfb"  # OLE2 compound file (HWP v5; legacy doc/xls/ppt)
FORMAT_MIME = "mime"  # MHTML web archive / RFC-822 email
FORMAT_RTF = "rtf"
FORMAT_WARC = "warc"
FORMAT_GZIP = "gzip"  # transport wrapper: inflate + re-sniff
FORMAT_UNKNOWN = "unknown"

# reference: docling/datamodel/document.py:440-478 (_detect_html_xhtml)
_HTML_RE = re.compile(
    rb"^\s*(?:<\?xml[^>]*\?>\s*)?(?:<!--.*?-->\s*)*<"
    rb"(?:!doctype\s+html|html\b|head\b|body\b)",
    re.IGNORECASE | re.DOTALL,
)
_ANY_TAG_RE = re.compile(rb"^\s*<[a-zA-Z!/]")
_XML_DECL_RE = re.compile(rb"^\s*<\?xml")
_MD_HINT_RE = re.compile(rb"(?m)^(#{1,6}\s+\S|[-*]\s+\S|```)")


def sniff_format(payload: bytes) -> str:
    """Classify raw page bytes into a processing format."""
    if not payload:
        return FORMAT_UNKNOWN
    head = payload[:4096].lstrip(b"\xef\xbb\xbf")  # strip UTF-8 BOM

    # magic bytes first (attachment_processor.py:1128-1142)
    if head.startswith(b"%PDF-"):
        return FORMAT_PDF
    if head.startswith(b"PK\x03\x04"):
        return FORMAT_ZIP
    if head[:5].lower() == b"{\\rtf":
        return FORMAT_RTF
    if head.startswith(b"WARC/"):
        return FORMAT_WARC
    if head[:2] == b"\x1f\x8b":
        return FORMAT_GZIP
    if head.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        # OLE2 compound container — HWP v5 is the supported member
        # (the FileHeader signature check needs the full payload, so the
        # CFB→HWP disambiguation happens in the dispatcher)
        return FORMAT_CFB
    # standalone raster images (reference InputFormat.IMAGE → pdf pipeline
    # + OCR, document_converter.py:193-195; jpg/png/tif/bmp/webp/gif per
    # base_models.py:82,107-112) — checked before audio so RIFF/WEBP wins
    # over the RIFF prefix
    if sniff_image(head) is not None:
        return FORMAT_IMAGE
    # audio containers (reference routes these to NoOpBackend + ASR,
    # docling/backend/noop_backend.py + pipeline/asr_pipeline.py).
    # Short text-like magics are structurally validated so a CSV/text
    # payload that merely STARTS with "ID3," or "fLaC..." is not misrouted:
    # ID3v2 requires version-major 2/3/4 (text bytes are >= 0x20), a flags
    # byte with the low nibble clear (spec: only the top bits are defined),
    # and 4 syncsafe size bytes (< 0x80 each, spec §3.1);
    # an MP4 ftyp box must have a sane 32-bit box size (high byte 0).
    if (
        (head.startswith(b"RIFF") and head[8:12] == b"WAVE")
        or (
            head.startswith(b"ID3")
            and len(head) >= 10
            and head[3] in (2, 3, 4)
            and head[4] != 0xFF
            and head[5] & 0x0F == 0
            and all(b < 0x80 for b in head[6:10])
        )
        or head.startswith((b"OggS\x00", b"fLaC\x00"))
        or head[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2")  # MP3 frame sync
        or (head[4:8] == b"ftyp" and head[0:1] == b"\x00")  # MP4/M4A
    ):
        return FORMAT_AUDIO

    if _HTML_RE.match(head):
        return FORMAT_HTML
    if _XML_DECL_RE.match(head):
        # XHTML served with an XML declaration still routes to HTML
        # (document.py:449-462 checks for an <html> root)
        if re.search(rb"<html\b", head, re.IGNORECASE):
            return FORMAT_HTML
        return FORMAT_XML
    if re.match(
        rb"\s*<\s*(rss|feed|rdf:RDF|urlset|sitemapindex)[\s>]",
        head,
        re.IGNORECASE,
    ):
        # syndication feeds served without an xml declaration — routed
        # as XML so the feed backend gets them, not the HTML walk
        return FORMAT_XML
    if _ANY_TAG_RE.match(head):
        # leading tag that isn't a recognized html/xml root: treat as HTML
        # fragment (real-world crawl pages frequently omit <html>)
        return FORMAT_HTML

    # MIME: MHTML page snapshots and RFC-822 mail. Conservative: a
    # MIME-Version/Content-Type header line near the top PLUS a second
    # classic header, so prose that merely mentions a header name is not
    # misrouted.
    header_block = head[:2048].split(b"\n\n", 1)[0].split(b"\r\n\r\n", 1)[0]
    lines = header_block.splitlines()[:30]
    has_mime = any(
        l[:13].lower() == b"mime-version:" or l[:13].lower() == b"content-type:"
        for l in lines
    )
    has_second = any(
        l.split(b":", 1)[0].strip().lower()
        in (b"from", b"to", b"subject", b"date", b"received", b"return-path",
            b"snapshot-content-location")
        for l in lines
        if b":" in l
    )
    if has_mime and has_second:
        return FORMAT_MIME

    # JSON payloads (docling-JSON analog routed by the "spans" key,
    # cf. the fork's JSON_DOCLING registration, document_converter.py:211-213)
    if head.lstrip().startswith((b"{", b"[")):
        return FORMAT_DOC_JSON if b'"spans"' in head else FORMAT_JSON

    # printable heuristic: mostly-text payloads fall back to text/markdown
    sample = head[:1024]
    if sample:
        nontext = sum(1 for b in sample if b < 9 or (13 < b < 32))
        if nontext / len(sample) > 0.05:
            return FORMAT_UNKNOWN
    # AsciiDoc: a document-title line "= Title" (asciidoc_backend.py:29+)
    first_line = head.lstrip().split(b"\n", 1)[0]
    if first_line.startswith(b"= ") and len(first_line) > 2:
        return FORMAT_ADOC
    if _MD_HINT_RE.search(head):
        return FORMAT_MD
    return FORMAT_TEXT
