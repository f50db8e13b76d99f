"""PDF → document tree (deterministic, rule-based pipeline).

Assembly order mirrors the reference's paginated pipeline
(``docling/pipeline/standard_pdf_pipeline.py:68-92`` build chain →
``:183-283`` assemble): per page, extract cells → horizontal merge →
quality score → reading order → block clustering → sanitize → items;
then concatenate pages into one document.

Labeling is the engine's rule-based stand-in for the reference's layout NN
(``docling/models/layout_model.py:148-219``, out of deterministic scope per
SURVEY.md §7): a single-line block whose font size clearly exceeds the page
median becomes TITLE (first, page 1) or SECTION_HEADER, and ``pdf/labels.py``
recovers PAGE_HEADER/PAGE_FOOTER furniture (cross-page repetition +
page-number patterns), LIST_ITEM groups (bullet/enumerator markers), CAPTION
blocks (cross-referenced onto adjacent tables/pictures), monospace CODE,
TeX-math-face FORMULA, FOOTNOTE small print, and PICTURE items clustered
from bitmap placements (``labels.cluster_picture_rects``).

The fallback chain mirrors ``doc_preprocessors/basic_processor.py:887-903``:
if the structured parse fails, the whole document is retried with the naive
string scan and the row is flagged ``fallback=True`` (surfaced into the
fleet's fallback-rate accumulator).
"""

from __future__ import annotations

import math

import numpy as np

from doc_parser_spark.core import model
from doc_parser_spark.core.model import Document
from doc_parser_spark.pdf import labels, layout, minipdf, ocr_regions, tables

_HEADING_SIZE_FACTOR = 1.25


def _build_document(pages: list[minipdf.PdfPage]) -> tuple[Document, float]:
    doc = Document()
    parse_scores: list[float] = []
    title_emitted = False
    current_parent: model.Node | None = None

    # -- pass 1: parse geometry per page; collect band blocks for the
    # cross-page furniture statistic (labels.repeated_furniture_keys)
    page_data = []  # (page, regions, blocks, median_size)
    band_blocks: list[tuple[int, str]] = []
    for page in pages:
        doc.page_sizes[page.page_no] = (page.width, page.height)
        # ruled-table grids (pdf/tables.py): detected on RAW cells — the
        # horizontal-merge pass below glues adjacent table columns into
        # one fragment (its gap threshold is tuned for broken words, not
        # column gutters); consumed cells leave the text flow and
        # re-emerge as table structs at their reading-order slot
        regions = tables.detect_tables(
            page.cells, getattr(page, "rulings", [])
        )
        pics = labels.cluster_picture_rects(
            getattr(page, "bitmap_rects", [])
        )
        # a "table" mostly inside a bitmap-picture cluster is figure
        # content (axis labels, part callouts over a raster): the
        # reference's layout NN assigns such regions PICTURE and never
        # runs TableFormer there (amt_handbook's hardware figure)
        def _in_picture(bbox) -> bool:
            l, t, r, b = bbox
            area = max((r - l) * (b - t), 1e-6)
            for pl, pt, pr, pb in pics:
                ox = max(0.0, min(r, pr) - max(l, pl))
                oy = max(0.0, min(b, pb) - max(t, pt))
                if ox * oy >= 0.8 * area:
                    return True
            return False

        regions = [r for r in regions if not _in_picture(r.bbox)]
        consumed: set[int] = set()
        for region in regions:
            consumed |= region.cell_ids
        remaining = (
            [c for c in page.cells if id(c) not in consumed]
            if consumed
            else page.cells
        )
        merged = layout.merge_horizontal_cells(remaining)
        score = layout.page_parse_score(merged)
        if not math.isnan(score):
            parse_scores.append(score)

        ordered = layout.order_cells(merged, page.width)
        blocks = layout.cluster_blocks(ordered)
        if merged:
            median_size = float(np.median([c.font_size for c in merged]))
        else:
            median_size = 12.0
        page_data.append((page, regions, pics, blocks, median_size))
        for block in blocks:
            bbox = layout.block_bbox(block)
            if labels.band_of(bbox, page.height) is not None:
                text = " ".join(
                    c.text.strip() for c in block if c.text.strip()
                )
                band_blocks.append(
                    (page.page_no, labels.furniture_key(text))
                )
    repeated = (
        labels.repeated_furniture_keys(band_blocks)
        if len(pages) >= 2
        else set()
    )

    # -- pass 2: classify and emit
    for page, regions, pics, blocks, median_size in page_data:
        pending = list(regions)  # already sorted by (top, left)
        pending_pics = list(pics)  # ditto
        last_anchor: model.Node | None = None  # table/picture captions ref
        last_anchor_bottom = 0.0
        pending_caption: model.Node | None = None
        pending_caption_bottom = 0.0

        def flush_regions(up_to_y: float | None) -> None:
            """Emit queued tables AND picture clusters whose top precedes
            ``up_to_y``, interleaved in reading order; a pending 'Figure
            N'/'Table N' caption within the gap window attaches."""
            nonlocal last_anchor, last_anchor_bottom, pending_caption
            while pending or pending_pics:
                t_top = pending[0].bbox[1] if pending else None
                p_top = pending_pics[0][1] if pending_pics else None
                take_table = p_top is None or (
                    t_top is not None and t_top <= p_top
                )
                top = t_top if take_table else p_top
                if up_to_y is not None and top > up_to_y:
                    break
                cap = None
                if (
                    pending_caption is not None
                    and top - pending_caption_bottom
                    <= labels.CAPTION_GAP_PT
                    # kind must match: 'Table N' never captions a figure
                    and labels.caption_kind(pending_caption.text)
                    == ("table" if take_table else "figure")
                ):
                    cap = pending_caption
                    pending_caption = None
                if take_table:
                    region = pending.pop(0)
                    last_anchor = doc.add_table(
                        region.data,
                        parent=current_parent,
                        page_no=page.page_no,
                        bbox=region.bbox,
                        caption=cap,
                    )
                    last_anchor_bottom = region.bbox[3]
                else:
                    box = pending_pics.pop(0)
                    node = doc.add_picture(
                        parent=current_parent,
                        caption=cap,
                        page_no=page.page_no,
                    )
                    node.bbox = box
                    last_anchor = node
                    last_anchor_bottom = box[3]

        sub_blocks = [
            sub2
            for b in blocks
            for sub in labels.split_label_runs(b)
            for sub2 in labels.split_leading_bold_heading(
                sub, median_size
            )
        ]
        # the folio is the bottom-most (top-most) block on its page —
        # stronger evidence than a fixed band when margins are generous
        page_max_b = max(
            (layout.block_bbox(b)[3] for b in sub_blocks), default=0.0
        )
        page_min_t = min(
            (layout.block_bbox(b)[1] for b in sub_blocks),
            default=page.height,
        )
        # running-head evidence that needs no cross-page repetition: a
        # block SHARING ITS LINE with a bare folio in the page-number
        # band is the running head ("Optimized Table Tokenization … 9"
        # on a single-page arXiv excerpt — the reference's NN labels it
        # page_header; repetition voting can't fire on one page)
        folio_lines = [
            layout.block_bbox(b)
            for b in sub_blocks
            if labels.is_page_number(
                " ".join(c.text.strip() for c in b if c.text.strip())
            )
            and labels.band_of(
                layout.block_bbox(b),
                page.height,
                labels.PAGENO_BAND_FRACTION,
            )
            is not None
        ]

        def _beside_folio(bbox) -> str | None:
            # the candidate must itself sit inside the page-number band —
            # a tall body block that merely brushes the folio's line
            # (full-height sidebar, first column) is content, not a head
            if (
                labels.band_of(
                    bbox, page.height, labels.PAGENO_BAND_FRACTION
                )
                is None
            ):
                return None
            for fl, ft, fr, fb in folio_lines:
                if min(bbox[3], fb) - max(bbox[1], ft) > 0:
                    return "header" if fb <= page.height / 2 else "footer"
            return None
        for block in sub_blocks:
            lines = [c.text.replace("\x02", "-").strip() for c in block if c.text.strip()]
            if not lines:
                continue
            text = layout.sanitize_text(lines)
            if not text:
                continue
            bbox = layout.block_bbox(block)
            flush_regions(bbox[1])

            # furniture: band-resident + (repeats across pages | page
            # number). Bare folios additionally qualify as the page's
            # extreme block inside a generous margin (LaTeX drops the
            # folio ~0.82h on A4 — outside any safe fixed band).
            band = labels.band_of(bbox, page.height)
            if labels.is_page_number(text) and band is None:
                band = labels.band_of(
                    bbox, page.height, labels.PAGENO_BAND_FRACTION
                )
                if band is None:
                    if (
                        bbox[3] >= page_max_b - 2.0
                        and bbox[1] >= 0.7 * page.height
                    ):
                        band = "footer"
                    elif (
                        bbox[1] <= page_min_t + 2.0
                        and bbox[3] <= 0.3 * page.height
                    ):
                        band = "header"
            if band is None:
                band = _beside_folio(bbox)
            if band is not None and (
                labels.furniture_key(text) in repeated
                or labels.is_page_number(text)
                or _beside_folio(bbox) is not None
            ):
                doc.add_text(
                    text=text,
                    label=model.PAGE_HEADER
                    if band == "header"
                    else model.PAGE_FOOTER,
                    content_layer=model.FURNITURE,
                    page_no=page.page_no,
                    bbox=bbox,
                )
                continue

            # code: whole block set in a monospace /BaseFont; a listing the
            # clusterer split (blank line / caption between runs) re-joins
            # when the immediately preceding node is code on the same page
            if labels.is_mono_block(block):
                prev = doc.nodes[-1] if doc.nodes else None
                if (
                    prev is not None
                    and prev.label == model.CODE
                    and prev.page_no == page.page_no
                    and prev.bbox is not None
                    and bbox[1] - prev.bbox[3] <= labels.CODE_MERGE_GAP_PT
                ):
                    prev.text += "\n" + "\n".join(lines)
                    prev.orig = prev.text
                    prev.bbox = (
                        min(prev.bbox[0], bbox[0]),
                        prev.bbox[1],
                        max(prev.bbox[2], bbox[2]),
                        bbox[3],
                    )
                    continue
                node = doc.add_code(
                    text="\n".join(lines),
                    parent=current_parent,
                    page_no=page.page_no,
                )
                node.bbox = bbox
                continue

            # display formula: TeX math faces + an operator glyph
            if labels.is_formula_block(block):
                doc.add_text(
                    text=text, label=model.FORMULA, parent=current_parent,
                    page_no=page.page_no, bbox=bbox,
                )
                continue

            # footnote: marker-led small print near the page bottom
            if labels.is_footnote(
                text,
                bbox,
                page.height,
                max(c.font_size for c in block),
                median_size,
            ):
                doc.add_text(
                    text=text, label=model.FOOTNOTE, parent=current_parent,
                    page_no=page.page_no, bbox=bbox,
                )
                continue

            # list: ≥2 marker-led lines → one group of items
            items = labels.split_list_items(lines)
            if items:
                enum = items[0][1]
                group = doc.add_list_group(
                    name="ordered list" if enum else "list",
                    parent=current_parent,
                )
                for item_text, item_enum in items:
                    doc.add_list_item(
                        text=layout.sanitize_text([item_text]),
                        enumerated=item_enum,
                        parent=group,
                        page_no=page.page_no,
                        bbox=bbox,
                    )
                continue

            # caption: "Figure N" / "Table N" block, cross-ref an adjacent table
            if labels.is_caption(text):
                cap_node = doc.add_text(
                    text=text, label=model.CAPTION, parent=current_parent,
                    page_no=page.page_no, bbox=bbox,
                )
                if (
                    last_anchor is not None
                    and last_anchor.caption_ref is None
                    and bbox[1] - last_anchor_bottom
                    <= labels.CAPTION_GAP_PT
                    and labels.caption_kind(text)
                    == (
                        "table"
                        if last_anchor.label == model.TABLE
                        else "figure"
                    )
                ):
                    last_anchor.caption_ref = cap_node.index
                else:
                    pending_caption = cap_node
                    pending_caption_bottom = bbox[3]
                continue

            block_size = max(c.font_size for c in block)
            size_heading = (
                len(block) == 1
                and block_size >= median_size * _HEADING_SIZE_FACTOR
            )
            # bold-at-body-size headings (Word-converted PDFs) rank as
            # section headers only — docling's TITLE needs display size
            is_heading = size_heading or labels.is_bold_heading(
                block, text, median_size
            )
            # TITLE needs true display scale (≥1.7× body): the reference
            # labels ordinary 1.2-1.5× section heads section_header even
            # when first on the page (no PDF golden carries a '#' title;
            # picture_classification's 14.3pt-over-10pt head is '##')
            if (
                size_heading
                and not title_emitted
                and page.page_no == 1
                and block_size >= median_size * 1.7
            ):
                current_parent = doc.add_text(
                    text=text, label=model.TITLE,
                    page_no=page.page_no, bbox=bbox,
                )
                title_emitted = True
            elif is_heading:
                current_parent = doc.add_heading(
                    text=text, level=1,
                    parent=doc.nodes[current_parent.parent]
                    if current_parent is not None and current_parent.label == model.SECTION_HEADER
                    else current_parent,
                    page_no=page.page_no, bbox=bbox,
                )
            else:
                doc.add_text(
                    text=text, label=model.TEXT, parent=current_parent,
                    page_no=page.page_no, bbox=bbox,
                )
        flush_regions(None)

    parse_score = float(np.mean(parse_scores)) if parse_scores else 0.0
    return doc, parse_score


def extract_pdf(
    payload: bytes,
    max_pages: int | None = None,
    page_range: tuple[int, int] | None = None,
    ocr_fn=None,
    parsed_pages: list | None = None,
    force_full_page_ocr: bool = False,
) -> tuple[Document, bool]:
    """PDF bytes → (Document, fallback_used).

    ``parsed_pages`` lets a caller that already ran ``minipdf.parse_pdf``
    (e.g. the multimodal page-record sink, which also needs the raw cells)
    reuse the parse instead of paying it twice.

    ``max_pages`` / ``page_range`` mirror the reference's pagination limits
    (docling/datamodel/settings.py:22-25, enforced at
    docling/pipeline/base_pipeline.py:140-143); pages outside the range are
    never parsed.

    ``ocr_fn`` is the OCR plug-point (reference Op-26..28: engines behind a
    factory, off by default in production — basic_processor.py:843). Region
    detection around it is real (pdf/ocr_regions.py, the numpy port of
    base_ocr_model.py:40-113): painted-bitmap rects are dilated and
    clustered, and the engine is called as ``ocr_fn(page, ocr_rects) ->
    list[TextCell]`` (or legacy ``ocr_fn(page)``) for pages whose bitmap
    coverage crosses the 5% threshold — plus, as before, for pages whose
    structured parse yields no cells at all. Returned cells are filtered
    against programmatic cells and merged (base_ocr_model.py:115-170),
    running per-executor inside the Arrow batch. No engine ships in this
    environment, so the default stays None.
    """
    pic_doc: Document | None = None
    try:
        pages = parsed_pages if parsed_pages is not None else minipdf.parse_pdf(payload)
        if page_range is not None:
            lo, hi = page_range
            pages = [p for p in pages if lo <= p.page_no <= hi]
        if max_pages is not None:
            pages = pages[:max_pages]
        if ocr_fn is not None:
            import inspect

            try:
                n_params = len(
                    [
                        p
                        for p in inspect.signature(
                            ocr_fn
                        ).parameters.values()
                        if p.kind
                        in (
                            p.POSITIONAL_ONLY,
                            p.POSITIONAL_OR_KEYWORD,
                            p.VAR_POSITIONAL,
                        )
                    ]
                )
            except (TypeError, ValueError):
                n_params = 2
            for page in pages:
                _cov, rects = ocr_regions.find_ocr_rects(
                    page.width,
                    page.height,
                    getattr(page, "bitmap_rects", []),
                    force_full_page_ocr=force_full_page_ocr,
                )
                if not rects and not page.cells:
                    # legacy scanned-page trigger: zero text parsed but no
                    # raster placements recovered either — full-page OCR
                    rects = [(0.0, 0.0, page.width, page.height)]
                if not rects:
                    continue
                ocr_cells = (
                    ocr_fn(page, rects) if n_params >= 2 else ocr_fn(page)
                )
                page.cells = ocr_regions.combine_cells(
                    page.cells,
                    list(ocr_cells or []),
                    force_full_page_ocr=force_full_page_ocr,
                )
        doc, _score = _build_document(pages)
        # has_text_items mirrors the reference's emptiness contract (empty
        # STRUCTURELESS tables count, populated ones don't) — but here a
        # page whose entire text landed inside a recovered ruled table is
        # real content, not an empty parse; falling back would throw the
        # table away and re-extract its cells as loose text
        has_table_cells = any(
            node.label == model.TABLE
            and node.table is not None
            and node.table.cells
            for node, _ in doc.iterate_items(layers=(model.BODY,))
        )
        if doc.has_text_items() or has_table_cells or not payload:
            return doc, False
        # parsed but produced no text: a picture-only doc is kept ONLY
        # if the naive scan recovers no text either — a text-bearing PDF
        # whose fonts defeated the structured parse must still fall back
        # rather than return just its figures
        pic_doc = (
            doc
            if any(
                node.label == model.PICTURE
                for node, _ in doc.iterate_items(layers=(model.BODY,))
            )
            else None
        )
        raise minipdf.PdfParseError("structured parse yielded no text")
    except Exception:
        pages = minipdf.fallback_scan(payload)
        doc, _score = _build_document(pages)
        if pic_doc is not None and not doc.has_text_items():
            return pic_doc, False  # genuine picture-only document
        return doc, True
