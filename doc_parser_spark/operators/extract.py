"""The extraction operator: Common-Crawl-style pages → documents_out / chunks_out.

This is the Spark materialization of the reference's whole conversion
lifecycle (SURVEY.md §3, EP-1/EP-2): everything
``DocumentConverter.convert`` + ``DocumentProcessor.__call__`` do per
document happens *inside one Arrow batch* of a ``mapInPandas`` kernel —
format sniffing, backend dispatch, tree build, serialization, chunking,
vector-metadata. No per-row Python UDFs, no driver-side loops, no
intermediate Spark rows for pages/cells (input_hint: "vectorized
pandas/Arrow UDFs (no per-row Python) throughout").

Scale design (north_rule):

* **Salt repartition by url-hash** (:func:`salt_repartition`) defuses
  host-level skew — Common-Crawl rows arrive host-clustered, and one host
  with MB-scale pages would otherwise stall a partition. ``xxhash64(url)``
  is JVM-side, uniform, and deterministic.
* **document_hash stays native** — ``sha2(html, 256)`` runs in the JVM
  (whole-stage codegen), not in the Python kernel
  (reference: docling/utils/utils.py:19-44 → ``F.sha2``).
* **chunks explode natively** — chunk rows are carried as a nested array
  column and exploded with ``F.explode`` (JVM), so chunks_out never
  re-enters Python.
* **Per-document failure isolation** — a pathological page (RecursionError
  on 10k-deep DOMs, undecodable bytes) yields a ``status='failure'`` row,
  never a dead executor; mirrors the reference's per-document
  ConversionStatus (docling/pipeline/base_pipeline.py:171-205).
* **Accumulator metrics** — optional parse-failure / fallback counters
  (north_star: "Spark accumulators tracking parse-failure and
  fallback-path rates per partition").
"""

from __future__ import annotations

import sys
import time
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from doc_parser_spark.core import model, schemas, sniff
from doc_parser_spark.core.chunker import chunk_document, compose_vectors
from doc_parser_spark.core.serialize import export_markdown, export_text, flatten_spans
from doc_parser_spark.core.simple_backends import (
    extract_csv,
    extract_markdown,
    extract_text_doc,
)
from doc_parser_spark.html.extractor import extract_html

# generous bound for adversarial DOM depth; per-document try/except is the
# real guard (reference caps pages/file-size instead: datamodel/settings.py:22-25)
_RECURSION_LIMIT = 20000

from doc_parser_spark.core.limits import DEFAULT_MAX_BYTES  # max_file_size gate
DEFAULT_REG_DATE = "1970-01-01T00:00:00Z"


def _get_pdf_extractor():
    """PDF branch loaded lazily (keeps the HTML-only path import-light)."""
    from doc_parser_spark.pdf.extractor import extract_pdf

    return extract_pdf


def _extract_doc_json(payload: bytes):
    from doc_parser_spark.core.serialize import doc_from_json

    return doc_from_json(payload)


def _extract_json_values(payload: bytes):
    """JSON router: BOK-shaped payloads (top-level ``body`` page list, the
    fork's registered default JSON backend) take the structured mapping;
    any other JSON degrades to text items from string leaves in document
    order."""
    import json

    from doc_parser_spark.core.bok_backend import extract_bok_json, looks_like_bok
    from doc_parser_spark.core.model import Document

    doc = Document()
    try:
        data = json.loads(payload.decode("utf-8", errors="replace"))
    except json.JSONDecodeError:
        return doc

    if looks_like_bok(data):
        return extract_bok_json(payload)

    def walk(node):
        if isinstance(node, str):
            text = node.strip()
            if text:
                doc.add_text(text=text)
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(data)
    return doc


def _extract_xml(payload: bytes):
    """XML router: USPTO patents and JATS articles get their structured
    backends, everything else the generic walk — mirroring the reference's
    XML format detection (docling/datamodel/document.py)."""
    from doc_parser_spark.core.feed_backend import extract_feed, looks_like_feed
    from doc_parser_spark.core.jats_backend import extract_jats, looks_like_jats
    from doc_parser_spark.core.simple_backends import extract_xml_generic
    from doc_parser_spark.core.uspto_backend import extract_uspto, uspto_dialect

    if uspto_dialect(payload) is not None:
        return extract_uspto(payload)
    if looks_like_jats(payload):
        return extract_jats(payload)
    if looks_like_feed(payload):
        return extract_feed(payload)
    return extract_xml_generic(payload)


def _extract_text(payload: bytes):
    """Text router: APS patent grants (a literal ``PATN`` line) get the
    USPTO backend; everything else is plain text."""
    from doc_parser_spark.core.uspto_backend import extract_uspto, uspto_dialect

    if uspto_dialect(payload) == "aps":
        return extract_uspto(payload)
    return extract_text_doc(payload)


def _lazy_backends():
    from doc_parser_spark.core.image_backend import extract_image
    from doc_parser_spark.core.simple_backends import (
        extract_asciidoc,
        extract_audio,
    )

    from doc_parser_spark.core.rtf_backend import extract_rtf

    return {
        sniff.FORMAT_RTF: extract_rtf,
        sniff.FORMAT_ADOC: extract_asciidoc,
        sniff.FORMAT_XML: _extract_xml,
        # NoOp + ASR plug-point: valid-but-empty doc without a transcriber
        # (reference noop_backend.py; whisper is a provider boundary)
        sniff.FORMAT_AUDIO: extract_audio,
        # one-page picture doc + OCR plug-point (reference InputFormat.IMAGE
        # → StandardPdfPipeline, document_converter.py:193-195)
        sniff.FORMAT_IMAGE: extract_image,
    }


_DISPATCH = {
    sniff.FORMAT_HTML: extract_html,
    sniff.FORMAT_TEXT: _extract_text,
    sniff.FORMAT_MD: extract_markdown,
    sniff.FORMAT_CSV: extract_csv,
    sniff.FORMAT_DOC_JSON: _extract_doc_json,
    sniff.FORMAT_JSON: _extract_json_values,
}


class UnsupportedFormatError(ValueError):
    """A recognized-but-deliberately-unsupported payload (e.g. legacy OLE2
    office). Recorded as STATUS_SKIPPED, not STATUS_FAILURE — the document
    is not broken, the engine just declines it (same status the unknown-
    format gate uses)."""


def convert_payload(payload: bytes, fmt: Optional[str] = None, _depth: int = 0):
    """bytes → (Document, format, fallback_used). Raises on hard failure."""
    if fmt is None:
        fmt = sniff.sniff_format(payload)
    fallback = False
    if fmt == sniff.FORMAT_GZIP:
        # transport wrapper: inflate (bomb-bounded) and re-dispatch; depth
        # guard stops gzip-of-gzip-of-... chains
        if _depth >= 3:
            raise UnsupportedFormatError("nested transport encodings too deep")
        import zlib

        from doc_parser_spark.core.limits import BombError, gunzip_members

        # ALL members, cumulative output cap: standard .warc.gz is one
        # gzip member per record, and the first is usually warcinfo —
        # a first-member-only inflate loses every response record
        try:
            inner = gunzip_members(payload, DEFAULT_MAX_BYTES)
        except BombError as exc:
            # mirrors the oversize gate: invalid -> FAILURE, not skip
            raise ValueError(str(exc)) from exc
        except zlib.error as exc:
            raise UnsupportedFormatError(f"bad gzip payload: {exc}") from exc
        doc, kind, fb = convert_payload(inner, _depth=_depth + 1)
        return doc, kind if kind.startswith("warc") else f"gz:{kind}", fb
    if fmt == sniff.FORMAT_PDF:
        extract_pdf = _get_pdf_extractor()
        doc, fallback = extract_pdf(payload)
        return doc, fmt, fallback
    if fmt == sniff.FORMAT_ZIP:
        from doc_parser_spark.core.office_backends import extract_office

        doc, kind = extract_office(payload)
        return doc, kind, fallback
    if fmt == sniff.FORMAT_CFB:
        from doc_parser_spark.core.cfb import CfbError, read_cfb
        from doc_parser_spark.core.hwp_backend import HwpError, extract_hwp
        from doc_parser_spark.core.legacy_office import (
            LegacyOfficeError,
            extract_legacy_office,
        )

        # parse the compound container ONCE, then route on stream names:
        # HWP v5 (FileHeader) vs legacy Office (WordDocument / Workbook /
        # PowerPoint Document — the formats the reference shells out to
        # LibreOffice for, read natively here)
        try:
            streams = read_cfb(payload)
        except CfbError as exc:
            raise UnsupportedFormatError(f"bad OLE2 container: {exc}") from exc
        if "FileHeader" in streams:
            try:
                return extract_hwp(payload), "hwp", fallback
            except HwpError as exc:
                raise UnsupportedFormatError(f"bad HWP container: {exc}") from exc
        try:
            doc, kind = extract_legacy_office(streams)
            return doc, kind, fallback
        except LegacyOfficeError as exc:
            raise UnsupportedFormatError(
                f"unsupported OLE2 payload: {exc}"
            ) from exc
    if fmt == sniff.FORMAT_WARC:
        from doc_parser_spark.core.warc_backend import WarcError, extract_warc

        try:
            doc, kind = extract_warc(payload)
            return doc, kind, fallback
        except WarcError as exc:
            raise UnsupportedFormatError(f"bad WARC payload: {exc}") from exc
    if fmt == sniff.FORMAT_MIME:
        from doc_parser_spark.core.mime_backend import MimeError, extract_mime

        try:
            doc, kind = extract_mime(payload)
            return doc, kind, fallback
        except MimeError as exc:
            raise UnsupportedFormatError(f"bad MIME payload: {exc}") from exc
    extractor = _DISPATCH.get(fmt) or _lazy_backends().get(fmt)
    if extractor is None:
        raise UnsupportedFormatError(f"unsupported format: {fmt}")
    return extractor(payload), fmt, fallback


def process_document(
    url: str,
    payload: Optional[bytes],
    reg_date: str = DEFAULT_REG_DATE,
    max_tokens: int = 2000,
    max_bytes: int = DEFAULT_MAX_BYTES,
    with_markdown: bool = True,
) -> dict:
    """One page → one documents_out record (pure function, testable)."""
    t0 = time.perf_counter()
    fmt = None
    try:
        if payload is None or len(payload) == 0:
            raise ValueError("empty payload")
        if len(payload) > max_bytes:
            # the reference marks oversize inputs invalid -> FAILURE, not
            # skipped (document.py:137-139 valid=False; pinned by
            # test_invalid_input.py::test_convert_too_small_filesize_limit*)
            return _result(
                url, "oversize", schemas.STATUS_FAILURE,
                error=f"payload {len(payload)} bytes > max {max_bytes}",
                t0=t0,
            )
        fmt = sniff.sniff_format(payload)
        if fmt == sniff.FORMAT_UNKNOWN:
            return _result(
                url, fmt, schemas.STATUS_SKIPPED,
                error=f"no deterministic backend for format {fmt}", t0=t0,
            )
        doc, fmt, fallback = convert_payload(payload, fmt)

        # spans BEFORE chunking: the chunker blanks page-header/footer text
        # in place (reference mutation, basic_processor.py:175-176)
        spans = flatten_spans(doc)
        text = export_text(doc)
        markdown = export_markdown(doc) if with_markdown else None
        chunks = chunk_document(doc, max_tokens=max_tokens)
        vectors = compose_vectors(doc, chunks, reg_date=reg_date)

        # parse quality: share of replacement chars (cheap analog of the
        # reference's per-cell garbage scoring, page_preprocessing_model.py:116-141)
        bad = text.count("�")
        parse_score = 1.0 if not text else max(0.0, 1.0 - 10.0 * bad / len(text))

        return {
            "url": url,
            "format": fmt,
            "status": schemas.STATUS_SUCCESS,
            "error": None,
            "text": text,
            "markdown": markdown,
            "title": doc.title_text(),
            "n_items": sum(1 for _ in doc.iterate_items(layers=(model.BODY, model.FURNITURE))),
            "n_chars": len(text),
            "n_pages": doc.num_pages(),
            "n_chunks": len(vectors),
            "fallback": fallback,
            "confidence": {"parse_score": parse_score, "layout_score": 1.0},
            "spans": spans,
            "chunks": vectors,
            "extract_ms": (time.perf_counter() - t0) * 1000.0,
        }
    except UnsupportedFormatError as exc:
        return _result(
            url, fmt or "unknown", schemas.STATUS_SKIPPED,
            error=str(exc)[:500], t0=t0,
        )
    except Exception as exc:  # noqa: BLE001 — per-document isolation
        return _result(
            url, fmt or "unknown", schemas.STATUS_FAILURE,
            error=f"{type(exc).__name__}: {exc}"[:500], t0=t0,
        )


def _result(url: str, fmt: str, status: str, error: str, t0: float) -> dict:
    return {
        "url": url,
        "format": fmt,
        "status": status,
        "error": error,
        "text": None,
        "markdown": None,
        "title": None,
        "n_items": 0,
        "n_chars": 0,
        "n_pages": 0,
        "n_chunks": 0,
        "fallback": False,
        "confidence": {"parse_score": 0.0, "layout_score": 0.0},
        "spans": None,
        "chunks": None,
        "extract_ms": (time.perf_counter() - t0) * 1000.0,
    }


def salt_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Shuffle rows uniformly by url-hash to defuse host-level skew
    (north_rule "salt-repartitions by url-hash"). One shuffle, JVM-side."""
    return df.repartition(num_partitions, F.xxhash64(F.col("url")))


def extract_documents(
    df: DataFrame,
    reg_date: str = DEFAULT_REG_DATE,
    max_tokens: int = 2000,
    max_bytes: int = DEFAULT_MAX_BYTES,
    with_markdown: bool = True,
    salt_partitions: Optional[int] = None,
    accumulators: Optional[dict] = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → documents_out DataFrame.

    ``accumulators`` may carry ``{"success": acc, "failure": acc,
    "fallback": acc}`` LongAccumulators for live fleet metrics.
    """
    if salt_partitions:
        df = salt_repartition(df, salt_partitions)

    # identity hash native (JVM, codegen) — not in the Python kernel
    df = df.withColumn("document_hash", F.sha2(F.col("html"), 256))

    acc_success = (accumulators or {}).get("success")
    acc_failure = (accumulators or {}).get("failure")
    acc_fallback = (accumulators or {}).get("fallback")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if sys.getrecursionlimit() < _RECURSION_LIMIT:
            sys.setrecursionlimit(_RECURSION_LIMIT)
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1

        for batch in batches:
            records = []
            for url, warc_ts, lang, payload, doc_hash in zip(
                batch["url"], batch["warc_ts"], batch["lang"],
                batch["html"], batch["document_hash"],
            ):
                rec = process_document(
                    url,
                    bytes(payload) if payload is not None else None,
                    reg_date=reg_date,
                    max_tokens=max_tokens,
                    max_bytes=max_bytes,
                    with_markdown=with_markdown,
                )
                rec["warc_ts"] = warc_ts
                rec["lang"] = lang
                rec["document_hash"] = doc_hash
                rec["partition_id"] = pid
                records.append(rec)
                if rec["status"] == schemas.STATUS_SUCCESS:
                    if acc_success is not None:
                        acc_success.add(1)
                elif rec["status"] == schemas.STATUS_FAILURE:
                    if acc_failure is not None:
                        acc_failure.add(1)
                if rec["fallback"] and acc_fallback is not None:
                    acc_fallback.add(1)

            # columns= keeps a 0-row batch schema-correct (an empty
            # pd.DataFrame([]) has no columns and the projection KeyErrors)
            out = pd.DataFrame(
                records,
                columns=[f.name for f in schemas.DOCUMENTS_OUT_SCHEMA.fields],
            )
            yield out

    return df.mapInPandas(kernel, schema=schemas.DOCUMENTS_OUT_SCHEMA)


def explode_chunks(documents_out: DataFrame) -> DataFrame:
    """documents_out → flat chunks_out (vector-DB shape). JVM-side explode;
    the Python kernel is never re-entered."""
    return (
        documents_out
        .where(F.col("chunks").isNotNull())
        .select(
            "url", "warc_ts", "lang", "format", "document_hash",
            F.explode("chunks").alias("chunk"),
        )
        .select("url", "warc_ts", "lang", "format", "document_hash", "chunk.*")
    )


BOILERPLATE_BLOCKS_SCHEMA = None  # built lazily to keep import cheap


def _boilerplate_schema():
    global BOILERPLATE_BLOCKS_SCHEMA
    if BOILERPLATE_BLOCKS_SCHEMA is None:
        from pyspark.sql import types as T

        BOILERPLATE_BLOCKS_SCHEMA = T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("block_id", T.IntegerType()),
                T.StructField("text", T.StringType()),
                T.StructField("n_words", T.IntegerType()),
                T.StructField("n_chars", T.IntegerType()),
                T.StructField("link_density", T.DoubleType()),
                T.StructField("text_density", T.DoubleType()),
                T.StructField("heading", T.BooleanType()),
                T.StructField("discarded", T.BooleanType()),
                T.StructField("content", T.BooleanType()),
            ]
        )
    return BOILERPLATE_BLOCKS_SCHEMA


def boilerplate_blocks(pages: DataFrame, max_bytes: int = DEFAULT_MAX_BYTES) -> DataFrame:
    """pages(url, html) → per-block densitometric features + the
    NumWordsRules content verdict (``html/boilerplate.py``) — the signal
    table a crawl-quality model trains on, and the precision complement
    to the structural extractor for markup-free crawl pages.

    Same execution contract as the extraction kernel: one Arrow-batched
    ``mapInPandas`` stage, per-document failure isolation (a pathological
    page contributes zero block rows, never a dead batch)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if sys.getrecursionlimit() < _RECURSION_LIMIT:
            sys.setrecursionlimit(_RECURSION_LIMIT)
        from doc_parser_spark.html.boilerplate import block_features

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None or len(payload) > max_bytes:
                    continue
                try:
                    feats = block_features(bytes(payload))
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
                for f in feats:
                    f["url"] = url
                    records.append(f)
            schema = _boilerplate_schema()
            out = pd.DataFrame(
                records,
                columns=[f.name for f in schema.fields],
            )
            yield out

    return pages.select("url", "html").mapInPandas(
        kernel, schema=_boilerplate_schema()
    )


def _links_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("link_no", T.LongType()),
            T.StructField("href", T.StringType()),
            T.StructField("resolved", T.StringType()),
            T.StructField("dst_host", T.StringType()),
            T.StructField("is_internal", T.BooleanType()),
            T.StructField("anchor", T.StringType()),
            T.StructField("rel", T.StringType()),
        ]
    )


def extract_links(
    pages: DataFrame,
    max_bytes: int = DEFAULT_MAX_BYTES,
    max_links_per_page: int = 1000,
) -> DataFrame:
    """pages(url, html) → one row per ``<a href>`` in document order —
    the outlink relation behind anchor-text corpora, crawl frontiers and
    the host graph :func:`doc_parser_spark.operators.web.host_pagerank`
    ranks (its synthetic-edge driver query stands in for exactly this).

    Per link: raw ``href``, RFC 3986 resolution against the page URL
    (stdlib ``urljoin``), destination host (lowercased netloc),
    ``is_internal`` (same lowercased host as the page), and the
    whitespace-normalized anchor text. ``javascript:``/``mailto:``/
    ``data:`` pseudo-links are skipped; fragments resolve onto the page
    URL like any reading system. ``rel`` carries the normalized token
    list (``nofollow``/``ugc``/``sponsored`` — the link-endorsement
    signal PageRank pipelines discount; '' when absent).
    ``max_links_per_page`` bounds link-farm
    pages (bound disclosed per SURVEY's no-silent-caps rule — the count
    is per-page deterministic, head-of-document order).

    Same execution contract as the extraction kernel: one Arrow-batched
    ``mapInPandas`` stage, per-document failure isolation.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if sys.getrecursionlimit() < _RECURSION_LIMIT:
            sys.setrecursionlimit(_RECURSION_LIMIT)
        from urllib.parse import urljoin, urlsplit

        from doc_parser_spark.core import sniff as _sniff
        from doc_parser_spark.html.dom import parse_html

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None or len(payload) > max_bytes:
                    continue
                data = bytes(payload)
                if _sniff.sniff_format(data) != _sniff.FORMAT_HTML:
                    continue
                try:
                    root = parse_html(data)
                    src_host = urlsplit(url).netloc.lower()
                    n = 0
                    for tag in root.descendants_tags():
                        if tag.name != "a":
                            continue
                        href = (tag.get("href") or "").strip()
                        if not href:
                            continue
                        scheme = href.split(":", 1)[0].lower() if ":" in href.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0] else ""
                        if scheme in ("javascript", "mailto", "data", "tel"):
                            continue
                        resolved = urljoin(url, href)
                        dst_host = urlsplit(resolved).netloc.lower()
                        anchor = " ".join(tag.text.split())
                        rel = " ".join((tag.get("rel") or "").lower().split())
                        records.append(
                            {
                                "url": url,
                                "link_no": n,
                                "href": href,
                                "resolved": resolved,
                                "dst_host": dst_host,
                                "is_internal": dst_host == src_host,
                                "anchor": anchor,
                                "rel": rel,
                            }
                        )
                        n += 1
                        if n >= max_links_per_page:
                            break
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
            schema = _links_schema()
            yield pd.DataFrame(
                records, columns=[f.name for f in schema.fields]
            )

    return pages.select("url", "html").mapInPandas(
        kernel, schema=_links_schema()
    )


def extract_spans(
    pages: DataFrame,
    max_bytes: int = DEFAULT_MAX_BYTES,
    salt_partitions: Optional[int] = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → one row per structured
    span in reading order — the exploded view of the ``spans`` nested
    column (title / section_header / text / list / list_item / table
    with grid shape), i.e. the north-star's "structured spans" as a
    first-class queryable relation.

    Spark-first: the extraction kernel runs ONCE (the same Arrow-batched
    ``mapInPandas`` stage every extraction query shares); the explosion
    and field projection are pure JVM ``posexplode`` + struct getters —
    no second Python pass, no shuffle. Table spans surface their grid
    shape as scalars (``table_rows``/``table_cols``/``table_cells``) so
    the relation stays hashable for oracle comparison; full cell payloads
    remain on the nested column for consumers that need them.
    """
    docs = extract_documents(
        pages,
        max_bytes=max_bytes,
        with_markdown=False,
        salt_partitions=salt_partitions,
    )
    s = F.col("s")
    return docs.select(
        "url", F.posexplode("spans").alias("span_no", "s")
    ).select(
        F.col("url"),
        F.col("span_no").cast("long").alias("span_no"),
        s["self_ref"].alias("self_ref"),
        s["parent_ref"].alias("parent_ref"),
        s["kind"].alias("kind"),
        s["label"].alias("label"),
        s["level"].cast("long").alias("level"),
        s["depth"].cast("long").alias("depth"),
        s["page_no"].cast("long").alias("page_no"),
        s["text"].alias("text"),
        s["table"]["num_rows"].cast("long").alias("table_rows"),
        s["table"]["num_cols"].cast("long").alias("table_cols"),
        F.when(
            s["table"].isNotNull(), F.size(s["table"]["cells"])
        ).cast("long").alias("table_cells"),
    )


def extract_table_cells(
    pages: DataFrame,
    max_bytes: int = DEFAULT_MAX_BYTES,
    salt_partitions: Optional[int] = None,
) -> DataFrame:
    """pages → one row per table cell across every extracted table —
    the cell-level grid relation (text, half-open row/col extents,
    spans, header flags) behind table-QA corpora and structured-table
    training data.

    Like :func:`extract_spans`: kernel once, then pure JVM — a
    ``posexplode`` over table spans and a second over their ``cells``
    arrays. ``table_no`` is the document-order table index (parsed from
    the span's ``#/tables/N`` self_ref); ``cell_no`` is the anchor-cell
    scan order (row-major) the HTML grid builder emits.
    """
    docs = extract_documents(
        pages,
        max_bytes=max_bytes,
        with_markdown=False,
        salt_partitions=salt_partitions,
    )
    s = F.col("s")
    tables = docs.select(
        "url", F.explode("spans").alias("s")
    ).where(s["table"].isNotNull()).select(
        "url",
        F.regexp_extract(s["self_ref"], "tables/([0-9]+)$", 1)
        .cast("long")
        .alias("table_no"),
        s["table"]["num_rows"].cast("long").alias("table_rows"),
        s["table"]["num_cols"].cast("long").alias("table_cols"),
        F.posexplode(s["table"]["cells"]).alias("cell_no", "c"),
    )
    c = F.col("c")
    return tables.select(
        "url",
        "table_no",
        "table_rows",
        "table_cols",
        F.col("cell_no").cast("long").alias("cell_no"),
        c["text"].alias("text"),
        c["start_row"].cast("long").alias("start_row"),
        c["end_row"].cast("long").alias("end_row"),
        c["start_col"].cast("long").alias("start_col"),
        c["end_col"].cast("long").alias("end_col"),
        c["row_span"].cast("long").alias("row_span"),
        c["col_span"].cast("long").alias("col_span"),
        c["column_header"].alias("column_header"),
        c["row_header"].alias("row_header"),
    )


def wet_records(docs: DataFrame) -> DataFrame:
    """documents_out(url, warc_ts, text) → (url, wet_record) — WET-style
    WARC/1.0 ``conversion`` records framing the extracted plain text, the
    Common-Crawl WET convention (CRLF header block, Content-Length in
    UTF-8 octets, record body followed by a blank line).

    Two disclosed determinism deltas vs crawler-produced WET: the record
    id is ``urn:md5:`` over (target-URI, date) instead of a random UUID,
    and the optional WARC-Block-Digest is omitted — both so records are
    reproducible and oracle-checkable. Pure JVM projection (concat /
    date_format / octet_length / md5): no Python, no shuffle; writing
    the single-column relation with ``text`` sinks yields a valid WET
    shard per partition.
    """
    crlf = "\r\n"
    # render the UTC wall time regardless of spark.sql.session.timeZone
    # (date_format alone prints session-local time, which would mislabel
    # the instant as Zulu AND make the md5 record id session-dependent)
    date = F.date_format(
        F.to_utc_timestamp(F.col("warc_ts"), F.current_timezone()),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )
    payload = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        "url",
        F.concat(
            F.lit("WARC/1.0" + crlf),
            F.lit("WARC-Type: conversion" + crlf),
            F.lit("WARC-Target-URI: "), F.col("url"), F.lit(crlf),
            F.lit("WARC-Date: "), date, F.lit(crlf),
            F.lit("WARC-Record-ID: <urn:md5:"),
            F.md5(F.concat(F.col("url"), F.lit("\n"), date)),
            F.lit(">" + crlf),
            F.lit("Content-Type: text/plain" + crlf),
            F.lit("Content-Length: "),
            F.octet_length(payload).cast("string"),
            F.lit(crlf + crlf),
            payload,
            F.lit(crlf + crlf),
        ).alias("wet_record"),
    )


def wat_records(meta: DataFrame) -> DataFrame:
    """meta(url, warc_ts, title, meta_description, n_links) → (url,
    wat_record) — WAT-style WARC ``metadata`` records whose body is the
    JSON envelope (Common Crawl's WAT convention: the per-page metadata
    sidecar consumers read instead of re-parsing payloads).  The
    envelope is the useful subset — WARC header echo plus
    HTML-Metadata head fields and the outlink count — rendered with
    ``to_json`` (compact, struct-ordered keys, raw UTF-8: byte-stable
    across engines, which is what makes the record oracle-checkable).

    Same two disclosed determinism deltas as :func:`wet_records`
    (md5-derived record id, no block digest).  NULL head fields fold to
    ``''`` so the envelope shape is fixed.  Pure JVM projection —
    no Python, no shuffle; each partition written with a ``text`` sink
    is a valid WAT shard.
    """
    crlf = "\r\n"
    date = F.date_format(
        F.to_utc_timestamp(F.col("warc_ts"), F.current_timezone()),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )
    body = F.to_json(
        F.struct(
            F.struct(
                F.lit("WARC").alias("Format"),
                F.struct(
                    F.col("url").alias("WARC-Target-URI"),
                    date.alias("WARC-Date"),
                    F.lit("response").alias("WARC-Type"),
                ).alias("WARC-Header-Metadata"),
                F.struct(
                    F.struct(
                        F.struct(
                            F.coalesce("title", F.lit("")).alias("Title"),
                            F.coalesce("meta_description", F.lit(""))
                            .alias("Meta-Description"),
                        ).alias("Head"),
                        F.coalesce(
                            F.col("n_links").cast("long"), F.lit(0)
                        ).alias("Links-Count"),
                    ).alias("HTML-Metadata")
                ).alias("Payload-Metadata"),
            ).alias("Envelope")
        )
    )
    return meta.select(
        "url",
        F.concat(
            F.lit("WARC/1.0" + crlf),
            F.lit("WARC-Type: metadata" + crlf),
            F.lit("WARC-Target-URI: "), F.col("url"), F.lit(crlf),
            F.lit("WARC-Date: "), date, F.lit(crlf),
            F.lit("WARC-Record-ID: <urn:md5:"),
            F.md5(F.concat(F.col("url"), F.lit("\nwat\n"), date)),
            F.lit(">" + crlf),
            F.lit("Content-Type: application/json" + crlf),
            F.lit("Content-Length: "),
            F.octet_length(body).cast("string"),
            F.lit(crlf + crlf),
            body,
            F.lit(crlf + crlf),
        ).alias("wat_record"),
    )


def _page_meta_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("lang_attr", T.StringType()),
            T.StructField("canonical", T.StringType()),
            T.StructField("og_title", T.StringType()),
            T.StructField("og_type", T.StringType()),
            T.StructField("meta_description", T.StringType()),
            T.StructField("published_time", T.StringType()),
            T.StructField("jsonld_types", T.StringType()),
            T.StructField("n_jsonld", T.LongType()),
        ]
    )


def extract_page_meta(
    pages: DataFrame,
    max_bytes: int = DEFAULT_MAX_BYTES,
) -> DataFrame:
    """pages(url, html) → one row per HTML page with its declared
    metadata — the WebDataCommons-style structured-data mining relation:
    ``<title>``, ``<html lang>``, canonical link, OpenGraph
    title/type, meta description, ``article:published_time``, and the
    sorted distinct ``@type`` set across every valid JSON-LD block
    (``n_jsonld`` counts VALID blocks; malformed JSON is ignored with
    per-block isolation — crawl reality). First occurrence wins for
    singleton fields, matching how consumers (and crawlers' own
    canonicalizers) read duplicated head tags. All strings
    whitespace-normalized; '' when absent.

    Same execution contract as the extraction kernel: one Arrow-batched
    ``mapInPandas`` stage, per-document failure isolation, no shuffle.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if sys.getrecursionlimit() < _RECURSION_LIMIT:
            sys.setrecursionlimit(_RECURSION_LIMIT)
        import json as _json

        from doc_parser_spark.core import sniff as _sniff
        from doc_parser_spark.html.dom import TextNode, parse_html

        def norm(v):
            return " ".join((v or "").split())

        def jsonld_types(obj):
            # @type may be a string or list; @graph nests entities
            found = []
            stack = [obj]
            while stack:
                node = stack.pop()
                if isinstance(node, dict):
                    t = node.get("@type")
                    if isinstance(t, str):
                        found.append(t)
                    elif isinstance(t, list):
                        found.extend(x for x in t if isinstance(x, str))
                    g = node.get("@graph")
                    if isinstance(g, list):
                        stack.extend(g)
                elif isinstance(node, list):
                    stack.extend(node)
            return found

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None or len(payload) > max_bytes:
                    continue
                data = bytes(payload)
                if _sniff.sniff_format(data) != _sniff.FORMAT_HTML:
                    continue
                try:
                    root = parse_html(data)
                    rec = {
                        "url": url, "title": "", "lang_attr": "",
                        "canonical": "", "og_title": "", "og_type": "",
                        "meta_description": "", "published_time": "",
                    }
                    types: list[str] = []
                    n_ld = 0
                    for tag in root.descendants_tags():
                        nm = tag.name
                        if nm == "html" and not rec["lang_attr"]:
                            rec["lang_attr"] = norm(tag.get("lang"))
                        elif nm == "title" and not rec["title"]:
                            rec["title"] = norm(tag.text)
                        elif nm == "link":
                            # rel is a space-separated token list
                            rel = (tag.get("rel") or "").lower().split()
                            if "canonical" in rel and not rec["canonical"]:
                                rec["canonical"] = norm(tag.get("href"))
                        elif nm == "meta":
                            prop = (tag.get("property") or "").strip().lower()
                            name = (tag.get("name") or "").strip().lower()
                            content = norm(tag.get("content"))
                            if prop == "og:title" and not rec["og_title"]:
                                rec["og_title"] = content
                            elif prop == "og:type" and not rec["og_type"]:
                                rec["og_type"] = content
                            elif (
                                prop == "article:published_time"
                                and not rec["published_time"]
                            ):
                                rec["published_time"] = content
                            elif (
                                name == "description"
                                and not rec["meta_description"]
                            ):
                                rec["meta_description"] = content
                        elif nm == "script":
                            st = (tag.get("type") or "").strip().lower()
                            if st != "application/ld+json":
                                continue
                            raw = "".join(
                                c.data
                                for c in tag.children
                                if isinstance(c, TextNode)
                            )
                            try:
                                obj = _json.loads(raw)
                            except Exception:  # noqa: BLE001 — bad block
                                continue
                            n_ld += 1
                            types.extend(jsonld_types(obj))
                    rec["jsonld_types"] = ",".join(sorted(set(types)))
                    rec["n_jsonld"] = n_ld
                    records.append(rec)
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
            schema = _page_meta_schema()
            yield pd.DataFrame(
                records, columns=[f.name for f in schema.fields]
            )

    return pages.select("url", "html").mapInPandas(
        kernel, schema=_page_meta_schema()
    )


def _image_refs_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("img_no", T.LongType()),
            T.StructField("src", T.StringType()),
            T.StructField("resolved", T.StringType()),
            T.StructField("dst_host", T.StringType()),
            T.StructField("alt", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("caption", T.StringType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
        ]
    )


def extract_image_refs(
    pages: DataFrame,
    max_bytes: int = DEFAULT_MAX_BYTES,
    max_images_per_page: int = 1000,
) -> DataFrame:
    """pages(url, html) → one row per ``<img src>`` in document order —
    the image–alt-text relation behind LAION-style multimodal pair
    mining (alt text as the caption signal) and image-dedup fetch lists.

    Per image: raw ``src``, RFC 3986 resolution against the page URL,
    destination host, whitespace-normalized ``alt`` and ``title``
    attributes ('' when absent — HTML treats a missing alt as an empty
    caption), the nearest enclosing ``<figure>``'s ``<figcaption>`` text
    ('' outside a figure), and declared ``width``/``height`` as BIGINT
    when the attribute is a bare decimal (NULL for ``auto``/percent/CSS
    units). ``data:`` URI images are inline payloads, not references —
    skipped without consuming an ``img_no``, like the pseudo-link skip
    in :func:`extract_links`. ``max_images_per_page`` bounds gallery
    spam (disclosed per SURVEY's no-silent-caps rule; head-of-document
    order is deterministic).

    Same execution contract as the extraction kernel: one Arrow-batched
    ``mapInPandas`` stage, per-document failure isolation, no shuffle.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if sys.getrecursionlimit() < _RECURSION_LIMIT:
            sys.setrecursionlimit(_RECURSION_LIMIT)
        from doc_parser_spark.core import sniff as _sniff
        from doc_parser_spark.html.dom import parse_html

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None or len(payload) > max_bytes:
                    continue
                data = bytes(payload)
                if _sniff.sniff_format(data) != _sniff.FORMAT_HTML:
                    continue
                try:
                    root = parse_html(data)
                    records.extend(
                        walk_image_refs(root, url, max_images_per_page)
                    )
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
            schema = _image_refs_schema()
            yield pd.DataFrame(
                records, columns=[f.name for f in schema.fields]
            )

    return pages.select("url", "html").mapInPandas(
        kernel, schema=_image_refs_schema()
    )


def _img_dim(tag, key):
    """Declared pixel dimension: bare ASCII-decimal attributes only
    (``auto``/percent/CSS units — and unicode digits int() would accept
    but no browser treats as pixel counts — are NULL)."""
    v = (tag.get(key) or "").strip()
    return int(v) if (v.isascii() and v.isdigit()) else None


def _figure_caption(tag):
    node = tag.parent
    while node is not None:
        if node.name == "figure":
            cap = node.find("figcaption")
            if cap is not None:
                return " ".join(cap.text.split())
            return ""
        node = node.parent
    return ""


def walk_image_refs(root, url: str, max_images: int) -> list[dict]:
    """The per-document walk behind :func:`extract_image_refs` — shared
    with the fuzz property tests so they exercise the shipped code, not
    a replica. Malformed references (``urljoin``/``urlsplit`` raising on
    hostile src values) are skipped per-image WITHOUT consuming an
    ``img_no``, like ``data:`` URIs — one bad attribute never drops the
    page's other images."""
    from urllib.parse import urljoin, urlsplit

    records: list[dict] = []
    n = 0
    for tag in root.descendants_tags():
        if tag.name != "img":
            continue
        src = (tag.get("src") or "").strip()
        if not src or src.lower().startswith("data:"):
            continue
        try:
            resolved = urljoin(url, src)
            dst_host = urlsplit(resolved).netloc.lower()
        except ValueError:
            continue  # malformed reference: skip, no numbering
        records.append(
            {
                "url": url,
                "img_no": n,
                "src": src,
                "resolved": resolved,
                "dst_host": dst_host,
                "alt": " ".join((tag.get("alt") or "").split()),
                "title": " ".join((tag.get("title") or "").split()),
                "caption": _figure_caption(tag),
                "width": _img_dim(tag, "width"),
                "height": _img_dim(tag, "height"),
            }
        )
        n += 1
        if n >= max_images:
            break
    return records


def _charset_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("charset", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )


def extract_charset(pages: DataFrame) -> DataFrame:
    """Per-page encoding verdict from the WHATWG sniffer
    (:mod:`doc_parser_spark.html.encoding`): which codec the extraction
    kernel will decode each payload with and WHY (``bom`` / ``declared``
    / ``utf8-trial`` / ``fallback``).

    A crawl-curation metrics surface: the fallback rate per host/wave is
    a data-quality signal (mislabeled legacy content mojibakes straight
    into the training set), and the charset mix drives tokenizer and
    language-id expectations downstream.

    Same execution contract as the extraction kernel: one Arrow-batched
    ``mapInPandas`` stage, per-document failure isolation, no shuffle —
    the sniffer reads a BOM, one regex over the first 1 KiB, and (worst
    case) one strict UTF-8 validation pass, so this runs at scan speed.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from doc_parser_spark.html.encoding import sniff_encoding_detail

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None:
                    continue
                data = bytes(payload)
                try:
                    enc, src = sniff_encoding_detail(data)
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
                records.append(
                    {
                        "url": url,
                        "charset": enc,
                        "source": src,
                        "n_bytes": len(data),
                    }
                )
            schema = _charset_schema()
            yield pd.DataFrame(
                records, columns=[f.name for f in schema.fields]
            )

    return pages.select("url", "html").mapInPandas(
        kernel, schema=_charset_schema()
    )


def _warc_records_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("rec_no", T.LongType()),
            T.StructField("warc_type", T.StringType()),
            T.StructField("target_uri", T.StringType()),
            T.StructField("http_status", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("record_length", T.LongType()),
            T.StructField("payload_sha256", T.StringType()),
            T.StructField("payload_length", T.LongType()),
        ]
    )


def warc_records(pages: DataFrame, max_bytes: int = DEFAULT_MAX_BYTES) -> DataFrame:
    """Crawl-ingestion relation: EVERY record of a WARC record chain as
    one row — the input-side complement of :func:`wet_records` (which
    writes the conversion artifact this reads back). Per record:
    WARC-Type, target URI, the HTTP status + Content-Type split off a
    ``response`` envelope, the declared record Content-Length, and the
    sha256 + octet length of the enveloped-stripped payload (the digest
    CDX revisit-dedup keys on).

    A cell whose bytes are not a WARC chain (or that overruns
    ``max_bytes``) contributes nothing — per-document failure isolation,
    matching the extraction kernel: a torn record chain in one crawl
    slice never kills the stage.

    Same execution contract as the extraction kernel: one Arrow-batched
    ``mapInPandas`` stage, no shuffle; gzip members inflate under the
    cumulative bounded-decompression cap (``limits.gunzip_members``).
    """
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from doc_parser_spark.core.warc_backend import (
            iter_records,
            strip_http_envelope,
        )

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None or len(payload) > max_bytes:
                    continue
                rows: list[dict] = []
                try:
                    for rec_no, (headers, body) in enumerate(
                        iter_records(bytes(payload))
                    ):
                        stripped, status, ctype = (
                            strip_http_envelope(body)
                            if headers.get("warc-type") == "response"
                            else (body, None, headers.get("content-type", ""))
                        )
                        rows.append(
                            {
                                "url": url,
                                "rec_no": rec_no,
                                "warc_type": headers.get("warc-type", ""),
                                "target_uri": headers.get(
                                    "warc-target-uri", ""
                                ),
                                "http_status": status,
                                "mime": ctype,
                                "record_length": len(body),
                                "payload_sha256": hashlib.sha256(
                                    stripped
                                ).hexdigest(),
                                "payload_length": len(stripped),
                            }
                        )
                except Exception:  # noqa: BLE001 — per-doc isolation:
                    continue  # a torn chain contributes NO rows at all
                records.extend(rows)
            schema = _warc_records_schema()
            yield pd.DataFrame(
                records, columns=[f.name for f in schema.fields]
            )

    return pages.select("url", "html").mapInPandas(
        kernel, schema=_warc_records_schema()
    )


def _http_headers_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("rec_no", T.LongType()),
            T.StructField("h_no", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("http_status", T.LongType()),
        ]
    )


def warc_http_headers(
    pages: DataFrame, max_bytes: int = DEFAULT_MAX_BYTES
) -> DataFrame:
    """Crawl-ops relation: every HTTP header of every WARC ``response``
    record as one wire-ordered row — the raw feed behind server-tech
    censuses, cache/compression audits, and security-header scans that
    crawl archives publish (one row per header keeps the relation
    joinable/aggregable without map-typed columns; duplicate headers
    like Set-Cookie stay distinct rows).

    Same execution contract as :func:`warc_records` (they share the
    record walk): Arrow-batched ``mapInPandas``, zero shuffles,
    per-document failure isolation — a torn chain contributes no rows;
    a response without an HTTP envelope contributes no header rows
    (its payload rows still surface via ``warc_records``).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from doc_parser_spark.core.warc_backend import (
            iter_records,
            parse_http_headers,
        )

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None or len(payload) > max_bytes:
                    continue
                rows: list[tuple] = []
                try:
                    for rec_no, (headers, body) in enumerate(
                        iter_records(bytes(payload))
                    ):
                        if headers.get("warc-type") != "response":
                            continue
                        status, hdrs = parse_http_headers(body)
                        for h_no, (name, value) in enumerate(hdrs):
                            rows.append(
                                (url, rec_no, h_no, name, value, status)
                            )
                except Exception:  # noqa: BLE001 — per-doc isolation:
                    continue  # a torn chain contributes NO rows at all
                records.extend(rows)
            schema = _http_headers_schema()
            yield pd.DataFrame(
                records, columns=[f.name for f in schema.fields]
            )

    return pages.select("url", "html").mapInPandas(
        kernel, schema=_http_headers_schema()
    )


def _microdata_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("item_no", T.LongType()),
            T.StructField("item_type", T.StringType()),
            T.StructField("parent_item", T.LongType()),
            T.StructField("prop", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("ref_item", T.LongType()),
        ]
    )


def extract_hreflang(
    pages: DataFrame, max_bytes: int = DEFAULT_MAX_BYTES
) -> DataFrame:
    """pages(url, html) → one row per ``<link rel="alternate"
    hreflang=... href=...>`` — the multilingual-site annotation relation
    (Google's hreflang contract / RFC 8288 ``alternate`` + ``hreflang``
    target attribute): the discovery channel multilingual crawls use to
    find translation variants, and the raw feed for
    :func:`doc_parser_spark.operators.web.hreflang_clusters`.

    Per row: the page URL, the ``hreflang`` value lowercased (BCP-47
    tags are case-insensitive; ``x-default`` is a valid label here),
    the ``href`` resolved absolute against the page URL (RFC 3986
    ``urljoin``), and the document-order position. Links missing either
    attribute emit nothing; ``rel`` is a space-separated token list, so
    ``rel="alternate nofollow"`` still matches.

    Same execution contract as the extraction kernel: one Arrow-batched
    ``mapInPandas`` stage, per-document failure isolation, zero
    shuffles.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if sys.getrecursionlimit() < _RECURSION_LIMIT:
            sys.setrecursionlimit(_RECURSION_LIMIT)
        from urllib.parse import urljoin

        from doc_parser_spark.core import sniff as _sniff
        from doc_parser_spark.html.dom import parse_html

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None or len(payload) > max_bytes:
                    continue
                data = bytes(payload)
                if _sniff.sniff_format(data) != _sniff.FORMAT_HTML:
                    continue
                try:
                    root = parse_html(data)
                    pos = 0
                    for tag in root.descendants_tags():
                        if tag.name != "link":
                            continue
                        rel = (tag.get("rel") or "").lower().split()
                        if "alternate" not in rel:
                            continue
                        hl = (tag.get("hreflang") or "").strip().lower()
                        href = (tag.get("href") or "").strip()
                        if not hl or not href:
                            continue
                        records.append(
                            (url, hl, urljoin(url, href), pos)
                        )
                        pos += 1
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
            yield pd.DataFrame(
                records, columns=["url", "hreflang", "href", "pos"]
            )

    return pages.select("url", "html").mapInPandas(
        kernel, schema="url string, hreflang string, href string, pos int"
    )


_DOM_BLOCK_TAGS = frozenset(
    ["p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
     "title", "nav", "footer", "header", "aside", "blockquote", "pre"]
)


def extract_dom_paths(
    pages: DataFrame, max_bytes: int = DEFAULT_MAX_BYTES
) -> DataFrame:
    """pages(url, html) → one row per block-level element with its DOM
    path — the raw feed for wrapper induction / site-template mining
    (``web.dom_templates``): elements that repeat at the same path with
    the same text across a host's pages are the template (nav, footer,
    cookie banner); same path + varying text is a content slot.

    Per row: ``dom_path`` (root→element lowercase tag chain joined with
    ``/``; positional indices deliberately omitted — template mining
    wants the SHAPE class, not the instance), ``text_hash`` (md5 of the
    whitespace-normalized subtree text), ``n_chars`` of that text, and
    the document-order position among emitted rows.  Block set:
    paragraph/heading/list/table-cell/sectioning tags
    (``_DOM_BLOCK_TAGS``); nested blocks each emit their own row.
    Empty-text blocks are kept — an empty nav cell is still template
    shape.

    Same execution contract as the extraction kernel: Arrow-batched
    ``mapInPandas``, per-document failure isolation, zero shuffles; the
    downstream census keys on host, which the crawl layout already
    partitions by.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if sys.getrecursionlimit() < _RECURSION_LIMIT:
            sys.setrecursionlimit(_RECURSION_LIMIT)
        import hashlib

        from doc_parser_spark.core import sniff as _sniff
        from doc_parser_spark.html.dom import Tag, parse_html

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None or len(payload) > max_bytes:
                    continue
                data = bytes(payload)
                if _sniff.sniff_format(data) != _sniff.FORMAT_HTML:
                    continue
                try:
                    root = parse_html(data)
                    pos = 0
                    # iterative walk carrying the path (no recursion cap)
                    stack = [(c, c.name) for c in reversed(root.children)
                             if isinstance(c, Tag)]
                    while stack:
                        node, path = stack.pop()
                        if node.name in _DOM_BLOCK_TAGS:
                            txt = " ".join(node.text.split())
                            records.append((
                                url, path,
                                hashlib.md5(txt.encode("utf-8")).hexdigest(),
                                len(txt), pos,
                            ))
                            pos += 1
                        stack.extend(
                            (c, f"{path}/{c.name}")
                            for c in reversed(node.children)
                            if isinstance(c, Tag)
                        )
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
            yield pd.DataFrame(
                records,
                columns=["url", "dom_path", "text_hash", "n_chars", "pos"],
            )

    return pages.select("url", "html").mapInPandas(
        kernel,
        schema="url string, dom_path string, text_hash string,"
        " n_chars int, pos int",
    )


def extract_robots_meta(
    pages: DataFrame, max_bytes: int = DEFAULT_MAX_BYTES
) -> DataFrame:
    """pages(url, html) → one row per ``<meta name="robots">`` (and
    crawler-specific ``googlebot``/``bingbot`` variants) with its raw
    ``content`` — the page-level half of the indexability contract
    (Google's robots-meta spec); the header half (``X-Robots-Tag``)
    comes from :func:`warc_http_headers`, and
    :func:`doc_parser_spark.operators.web.index_verdicts` combines the
    channels.

    One row per tag (pages can carry several; the combining rule is
    most-restrictive-wins, so every row matters). ``name`` matching is
    case-insensitive; content is surfaced verbatim (tokenization is the
    combiner's job). Same execution contract as the extraction kernel:
    Arrow-batched ``mapInPandas``, per-document failure isolation, zero
    shuffles.
    """
    names = {"robots", "googlebot", "bingbot"}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if sys.getrecursionlimit() < _RECURSION_LIMIT:
            sys.setrecursionlimit(_RECURSION_LIMIT)
        from doc_parser_spark.core import sniff as _sniff
        from doc_parser_spark.html.dom import parse_html

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None or len(payload) > max_bytes:
                    continue
                data = bytes(payload)
                if _sniff.sniff_format(data) != _sniff.FORMAT_HTML:
                    continue
                try:
                    for tag in parse_html(data).descendants_tags():
                        if tag.name != "meta":
                            continue
                        nm = (tag.get("name") or "").strip().lower()
                        if nm in names:
                            records.append(
                                (url, nm, (tag.get("content") or "").strip())
                            )
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
            yield pd.DataFrame(records, columns=["url", "name", "content"])

    return pages.select("url", "html").mapInPandas(
        kernel, schema="url string, name string, content string"
    )


def extract_microdata(
    pages: DataFrame, max_bytes: int = DEFAULT_MAX_BYTES
) -> DataFrame:
    """pages(url, html) → one row per (microdata item, property) —
    the WebDataCommons-style schema.org triple mine over crawl HTML
    (``html/microdata.py``; the itemscope/itemprop sibling of the
    JSON-LD surface in :func:`extract_page_meta`).

    Same execution contract as the extraction kernel: one Arrow-batched
    ``mapInPandas`` stage, zero shuffles, per-document failure
    isolation (a pathological page contributes zero item rows, never a
    dead batch).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if sys.getrecursionlimit() < _RECURSION_LIMIT:
            sys.setrecursionlimit(_RECURSION_LIMIT)
        from doc_parser_spark.html.microdata import microdata_rows

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                if payload is None or len(payload) > max_bytes:
                    continue
                try:
                    rows = microdata_rows(bytes(payload))
                except Exception:  # noqa: BLE001 — per-doc isolation
                    continue
                for r in rows:
                    r["url"] = url
                    records.append(r)
            schema = _microdata_schema()
            yield pd.DataFrame(
                records, columns=[f.name for f in schema.fields]
            )

    return pages.select("url", "html").mapInPandas(
        kernel, schema=_microdata_schema()
    )
