"""Deterministic programmatic-PDF writer (test fixtures only).

The corpus this engine targets carries ``application/pdf`` payloads; no PDF
library ships in this environment, so fixtures are generated here as minimal
uncompressed PDF 1.4 files (Helvetica, ``BT/Td/Tj`` text operators, plain
xref). The fixture classes mirror FIXTURES.md: paragraph flow, two-column
text, hyphenated line breaks, unicode punctuation, fragmented cells.

Not part of the extraction path — production inputs come from the page
table; this module only synthesizes inputs for tests/bench.
"""

from __future__ import annotations

PAGE_W = 612.0
PAGE_H = 792.0


def _escape(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_stream(runs: list[tuple]) -> bytes:
    """runs: (x, y_baseline, font_size, text[, tag]) in PDF bottom-left
    coords; a 5th element of ``"mono"`` sets the run in /F2 (Courier),
    ``"math"`` in /F3 (CMMI10, the TeX math-italic face)."""
    parts = []
    for run in runs:
        x, y, size, text = run[:4]
        tag = run[4] if len(run) > 4 else ""
        font = {"mono": "/F2", "math": "/F3"}.get(tag, "/F1")
        parts.append(
            f"BT {font} {size:g} Tf {x:g} {y:g} Td ({_escape(text)}) Tj ET"
        )
    return ("\n".join(parts)).encode("latin-1", errors="replace")


def write_pdf(
    pages: list[list[tuple[float, float, float, str]]],
    extra_content: list[bytes] | None = None,
) -> bytes:
    """pages: one list of text runs per page → PDF bytes.

    ``extra_content``: optional raw content-stream bytes appended per page
    (graphics ops for ruled-table fixtures)."""
    objects: list[bytes] = []

    n_pages = len(pages)
    first_page_obj = 3
    # object layout: 1 catalog, 2 pages, then per page: page obj, content obj
    kids = " ".join(
        f"{first_page_obj + 2 * i} 0 R" for i in range(n_pages)
    )
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_obj = first_page_obj + 2 * n_pages
    for i, runs in enumerate(pages):
        content = _content_stream(runs)
        if extra_content is not None and extra_content[i]:
            content += b"\n" + extra_content[i]
        page_num = first_page_obj + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:g} {PAGE_H:g}] "
                f"/Contents {page_num + 1} 0 R "
                f"/Resources << /Font << /F1 {font_obj} 0 R "
                f"/F2 {font_obj + 1} 0 R /F3 {font_obj + 2} 0 R >> >> >>"
            ).encode()
        )
        objects.append(
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content
            + b"\nendstream"
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+CMMI10 >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def write_pdf_with_images(
    pages: list[
        tuple[
            list[tuple[float, float, float, str]],
            list[tuple[float, float, float, float]],
        ]
    ],
) -> bytes:
    """pages: (text runs, image placements) per page → PDF bytes.

    Image placements are ``(x, y, w, h)`` in bottom-left points; each
    paints a 1x1 /DeviceGray raster XObject scaled through ``cm`` —
    the shape OCR region detection consumes (scanned-page fixtures)."""
    objects: list[bytes] = []
    n_pages = len(pages)
    first_page_obj = 3
    kids = " ".join(f"{first_page_obj + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_obj = first_page_obj + 2 * n_pages
    img_obj = font_obj + 1
    for i, (runs, images) in enumerate(pages):
        content = _content_stream(runs)
        for x, y, w, h in images:
            content += (
                f"\nq {w:g} 0 0 {h:g} {x:g} {y:g} cm /Im1 Do Q".encode()
            )
        page_num = first_page_obj + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:g} {PAGE_H:g}] "
                f"/Contents {page_num + 1} 0 R "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> "
                f"/XObject << /Im1 {img_obj} 0 R >> >> >>"
            ).encode()
        )
        objects.append(
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content
            + b"\nendstream"
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objects.append(
        b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 1 >>\n"
        b"stream\n\x80\nendstream"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def table_ops(
    x: float,
    y_top: float,
    col_widths: list[float],
    row_heights: list[float],
) -> str:
    """Content-stream ops painting a full table grid (strokes) with the
    top-left corner at ``(x, y_top)`` in bottom-left page coords."""
    total_w = sum(col_widths)
    total_h = sum(row_heights)
    ops = []
    yy = y_top
    for h in [0.0, *row_heights]:
        yy -= h
        ops.append(f"{x:g} {yy:g} m {x + total_w:g} {yy:g} l S")
    xx = x
    for w in [0.0, *col_widths]:
        xx += w
        ops.append(f"{xx:g} {y_top - total_h:g} m {xx:g} {y_top:g} l S")
    return " ".join(ops)


def table_cell_runs(
    x: float,
    y_top: float,
    col_widths: list[float],
    row_heights: list[float],
    texts: list[list[str]],
    size: float = 9.0,
) -> list[tuple[float, float, float, str]]:
    """Text runs centered-ish inside each grid cell of ``table_ops``."""
    runs = []
    yy = y_top
    for r, h in enumerate(row_heights):
        xx = x
        for c, w in enumerate(col_widths):
            if r < len(texts) and c < len(texts[r]) and texts[r][c]:
                runs.append((xx + 4, yy - h / 2 - size / 2, size, texts[r][c]))
            xx += w
        yy -= h
    return runs


def write_pdf_with_graphics(
    pages: list[tuple[list[tuple[float, float, float, str]], str]],
) -> bytes:
    """pages: (text runs, raw graphics ops) per page → PDF bytes.

    Graphics ops (``m``/``l``/``re``/``S``/``f`` path paints) append after
    the text; used for ruled-table fixtures (pdf/tables.py)."""
    return write_pdf(
        [runs for runs, _ in pages],
        extra_content=[ops.encode("latin-1") for _, ops in pages],
    )


def paragraph_runs(
    lines: list[str],
    x: float = 72.0,
    top_y: float = 720.0,
    size: float = 11.0,
    leading: float = 14.0,
) -> list[tuple[float, float, float, str]]:
    """Lay consecutive lines down a column."""
    return [(x, top_y - i * leading, size, line) for i, line in enumerate(lines)]


def fragmented_runs(
    line: str,
    x: float,
    y: float,
    size: float = 11.0,
    pieces: int = 3,
) -> list[tuple[float, float, float, str]]:
    """Split one visual line into adjacent sub-word fragments, reproducing
    pypdfium2's fragmented cells (reference: pypdfium2_backend.py:155-156);
    exercises the horizontal-merge pass."""
    if pieces <= 1 or len(line) < pieces:
        return [(x, y, size, line)]
    step = max(1, len(line) // pieces)
    frags = [line[i : i + step] for i in range(0, len(line), step)]
    runs = []
    cx = x
    for frag in frags:
        runs.append((cx, y, size, frag))
        cx += 0.5 * size * len(frag)  # matches the parser's width model
    return runs
