"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media alongside text. The pattern
here: payloads stay opaque ``binary`` columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages with
per-executor codec state — exactly the shape the text-extraction kernel
uses, so partitioning/skew/manifest plumbing is shared.

Codec reality in this environment: **PNG and baseline JPEG are real** —
``core/png.py`` (pure zlib/struct) and ``core/jpeg.py`` (pure numpy
huffman+IDCT) decode/encode actual image bytes, so page rendering
(``render_pdf_pages``), resizing (``resize_images``), bbox crops
(``crop_page_regions``) and embedded-image extraction
(``extract_pdf_images``) run end-to-end (reference analogs: pypdfium2
``render`` in ``docling/backend/docling_parse_v4_backend.py`` and
``Page.get_image`` crops in ``docling/datamodel/base_models.py``).
JPEG covers baseline AND progressive (SOF2) streams; audio/video codecs
stay behind the clearly-marked ``NotImplementedError`` in
``_decode_real``, with a deterministic fake container exercising the
plumbing.

Fake container formats (big-endian):

* image: ``b"FAKEIMG" | u16 width | u16 height | u8 channels | raw bytes``
* audio: ``b"FAKEAUD" | u32 sample_rate | u32 n_samples | raw bytes``
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from doc_parser_spark.core import png as pnglib
from doc_parser_spark.core import wav as wavlib

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

N_HIST_BUCKETS = 16


def make_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 256, size=width * height * channels, dtype=np.uint8)
    return b"FAKEIMG" + struct.pack(">HHB", width, height, channels) + raw.tobytes()


def make_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 256, size=n_samples * 2, dtype=np.uint8)  # 16-bit PCM
    return b"FAKEAUD" + struct.pack(">II", sample_rate, n_samples) + raw.tobytes()


def _decode_real(payload: bytes) -> dict:
    """The production decode path for formats without an own codec here.

    PNG/JPEG (baseline+progressive)/WAV-PCM decode for real in
    ``core/{png,jpeg,wav}.py``; everything else (MP3/AAC/video…) needs
    PIL/soundfile/pyav, which are not installed in this environment."""
    raise NotImplementedError(
        "compressed audio/video decode requires soundfile/pyav (not "
        "installed); the FAKEIMG/FAKEAUD deterministic container "
        "exercises the plumbing"
    )


def _byte_histogram_features(raw: np.ndarray) -> list[float]:
    """Deterministic feature vector: normalized 16-bucket byte histogram +
    mean/std (vectorized numpy over the whole batch slice)."""
    if raw.size == 0:
        return [0.0] * (N_HIST_BUCKETS + 2)
    hist, _ = np.histogram(raw, bins=N_HIST_BUCKETS, range=(0, 256))
    feats = (hist / raw.size).astype(np.float32).tolist()
    feats.append(float(np.float32(raw.mean() / 255.0)))
    feats.append(float(np.float32(raw.std() / 255.0)))
    return feats


def _image_array(payload: bytes):
    """Decodable raster payload → (status, uint8 (H, W, C) array | None).

    The single decode point shared by metadata extraction and resizing:
    PNG (``core/png.py``), JPEG — baseline or progressive —
    (``core/jpeg.py``) and baseline TIFF (``core/tiff.py``) decode for
    real; FAKEIMG serves the plumbing tests. Other codecs report
    ``codec_unavailable``."""
    if payload.startswith(pnglib.SIGNATURE):
        try:
            return "decoded", pnglib.decode_png(payload)
        except pnglib.PngError:
            return "corrupt", None
    if payload.startswith(b"\xff\xd8"):
        from doc_parser_spark.core.jpeg import JpegError, decode_jpeg

        try:
            arr = decode_jpeg(payload)
        except JpegError as exc:
            if "unsupported" in str(exc):
                return "codec_unavailable", None
            return "corrupt", None
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return "decoded", arr
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from doc_parser_spark.core.tiff import TiffError, decode_tiff

        try:
            arr = decode_tiff(payload)
        except TiffError as exc:
            if "unsupported" in str(exc):
                return "codec_unavailable", None
            return "corrupt", None
        return "decoded", arr
    if payload.startswith(b"BM") and len(payload) >= 26:
        from doc_parser_spark.core.bmp import BmpError, decode_bmp

        try:
            return "decoded", decode_bmp(payload)
        except BmpError as exc:
            if "unsupported" in str(exc) or "unknown" in str(exc):
                return "codec_unavailable", None
            return "corrupt", None
    if payload.startswith(b"FAKEIMG"):
        width, height, channels = struct.unpack(">HHB", payload[7:12])
        raw = np.frombuffer(payload[12:], dtype=np.uint8)
        if raw.size != width * height * channels or channels not in (1, 3, 4):
            return "corrupt", None
        return "decoded", raw.reshape(height, width, channels)
    return "codec_unavailable", None


def _decode_one(payload: bytes) -> dict:
    out = {
        "status": "decoded", "width": None, "height": None, "channels": None,
        "sample_rate": None, "n_samples": None,
        "n_bytes": len(payload) if payload else 0, "features": None,
    }
    if not payload:
        out["status"] = "empty"
        return out
    if payload.startswith(
        (pnglib.SIGNATURE, b"FAKEIMG", b"\xff\xd8", b"II*\x00", b"MM\x00*")
    ):
        status, arr = _image_array(payload)
        if status != "decoded":
            out["status"] = status
            return out
        out.update(
            width=int(arr.shape[1]), height=int(arr.shape[0]),
            channels=int(arr.shape[2]),
            features=_byte_histogram_features(arr.reshape(-1)),
        )
    elif payload.startswith(b"FAKEAUD"):
        sample_rate, n_samples = struct.unpack(">II", payload[7:15])
        raw = np.frombuffer(payload[15:], dtype=np.uint8)
        out.update(sample_rate=sample_rate, n_samples=n_samples,
                   features=_byte_histogram_features(raw))
    elif payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        # real PCM decode (core/wav.py); compressed WAV tags report
        # codec_unavailable like every other missing codec
        try:
            rate, frames = wavlib.decode_wav(payload)
        except wavlib.WavError as exc:
            out["status"] = (
                "codec_unavailable" if "unsupported" in str(exc) else "corrupt"
            )
            return out
        u8 = np.clip(
            np.round(frames.reshape(-1) * 128.0 + 128.0), 0, 255
        ).astype(np.uint8)
        out.update(
            sample_rate=int(rate), n_samples=int(frames.shape[0]),
            channels=int(frames.shape[1]),
            features=_byte_histogram_features(u8),
        )
    else:
        try:
            out.update(_decode_real(payload))
        except NotImplementedError:
            out["status"] = "codec_unavailable"
    return out


def decode_media(media: DataFrame) -> DataFrame:
    """media(url, media_type, payload) → decoded metadata + features.

    Arrow-batched; per-item failure isolation (a corrupt payload yields a
    status row, never a dead batch)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            records = []
            for url, mtype, payload in zip(
                batch["url"], batch["media_type"], batch["payload"]
            ):
                try:
                    rec = _decode_one(bytes(payload) if payload is not None else b"")
                except Exception as exc:  # noqa: BLE001
                    rec = {
                        "status": f"error:{type(exc).__name__}", "width": None,
                        "height": None, "channels": None, "sample_rate": None,
                        "n_samples": None, "n_bytes": 0, "features": None,
                    }
                rec["url"] = url
                rec["media_type"] = mtype
                records.append(rec)
            out = pd.DataFrame(records)
            yield out[[f.name for f in DECODED_SCHEMA.fields]]

    return media.mapInPandas(kernel, schema=DECODED_SCHEMA)


def _resize_one(payload: bytes, width: int, height: int) -> tuple[str, bytes | None]:
    """One image → (status, resized PNG). PNG and FAKEIMG decode for real;
    other formats report ``codec_unavailable`` (JPEG needs a DCT codec)."""
    if not payload:
        return "empty", None
    status, arr = _image_array(payload)
    if status != "decoded":
        return status, None
    out = pnglib.resize_nearest(arr, width, height)
    return "resized", pnglib.encode_png(out)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched image resize: PNG/FAKEIMG in → nearest-neighbor
    resized PNG out, per-item failure isolation."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            statuses, payloads = [], []
            for payload in batch["payload"]:
                try:
                    status, out = _resize_one(
                        bytes(payload) if payload is not None else b"",
                        width, height,
                    )
                except Exception as exc:  # noqa: BLE001 — corrupt bytes
                    status, out = f"error:{type(exc).__name__}", None
                statuses.append(status)
                payloads.append(out)
            yield pd.DataFrame(
                {
                    "url": batch["url"],
                    "media_type": batch["media_type"],
                    "status": statuses,
                    "payload": payloads,
                }
            )

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return media.mapInPandas(kernel, schema=schema)


PAGE_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("image", T.BinaryType()),
    ]
)


def render_pdf_pages(
    pages: DataFrame, scale: float = 1.0, max_pages: int | None = None
) -> DataFrame:
    """(url, html=PDF bytes) → one row per page with a rendered PNG.

    The page-image sink (reference: ``generate_page_images`` +
    ``_export_documents`` page PNG loop in the docling CLI/pipeline). One
    input row fans out to N page rows inside the same Arrow batch — no
    shuffle; downstream repartition governs placement at scale."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from doc_parser_spark.pdf import minipdf
        from doc_parser_spark.pdf.render import render_page

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                try:
                    parsed = minipdf.parse_pdf(
                        bytes(payload) if payload is not None else b""
                    )
                    if max_pages is not None:
                        parsed = parsed[:max_pages]
                    for page in parsed:
                        img = render_page(page, scale=scale)
                        records.append(
                            {
                                "url": url, "page_no": page.page_no,
                                "status": "rendered",
                                "width": int(img.shape[1]),
                                "height": int(img.shape[0]),
                                "image": pnglib.encode_png(img),
                            }
                        )
                except Exception as exc:  # noqa: BLE001 — parse failures
                    records.append(
                        {
                            "url": url, "page_no": 0,
                            "status": f"failure:{type(exc).__name__}",
                            "width": 0, "height": 0, "image": None,
                        }
                    )
            yield pd.DataFrame.from_records(
                records, columns=[f.name for f in PAGE_IMAGE_SCHEMA.fields]
            )

    return pages.mapInPandas(kernel, schema=PAGE_IMAGE_SCHEMA)


CROP_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("region_no", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("crop", T.BinaryType()),
    ]
)


def crop_page_regions(page_images: DataFrame) -> DataFrame:
    """(url, page_no, image=PNG, bboxes=array<array<double>>) → one row per
    cropped region (picture-crop sink; reference ``Page.get_image(scale,
    cropbox)``). Bboxes are [l, t, r, b] normalized to [0, 1] — the
    chunker's bbox contract."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from doc_parser_spark.pdf.render import crop_region

        for batch in batches:
            records = []
            for url, page_no, payload, bboxes in zip(
                batch["url"], batch["page_no"], batch["image"], batch["bboxes"]
            ):
                try:
                    arr = pnglib.decode_png(
                        bytes(payload) if payload is not None else b""
                    )
                    for i, box in enumerate(bboxes):
                        l, t, r, b = (float(v) for v in box)
                        cropped = crop_region(arr, l, t, r, b)
                        records.append(
                            {
                                "url": url, "page_no": int(page_no),
                                "region_no": i, "status": "cropped",
                                "width": int(cropped.shape[1]),
                                "height": int(cropped.shape[0]),
                                "crop": pnglib.encode_png(cropped),
                            }
                        )
                except Exception as exc:  # noqa: BLE001
                    records.append(
                        {
                            "url": url, "page_no": int(page_no),
                            "region_no": 0,
                            "status": f"failure:{type(exc).__name__}",
                            "width": 0, "height": 0, "crop": None,
                        }
                    )
            yield pd.DataFrame.from_records(
                records, columns=[f.name for f in CROP_SCHEMA.fields]
            )

    return page_images.mapInPandas(kernel, schema=CROP_SCHEMA)


def _video_timeline(payload: bytes):
    """Container sniff → ``(fmt, [(ts_ms, get_frame_bytes), ...])`` without
    decoding any pixels up front (AVI frames are lazy slices; GIF must
    composite sequentially so it decodes on demand inside the closure)."""
    from doc_parser_spark.core import avi as avilib
    from doc_parser_spark.core import gif as giflib

    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        usec, frames = avilib.parse_avi(payload)
        return "jpeg", [
            (i * usec / 1000.0, (lambda f=f: f)) for i, f in enumerate(frames)
        ]
    if payload[:6] in giflib.SIGNATURES:
        _, _, frames = giflib.decode_gif(payload)
        ts = 0.0
        timeline = []
        for arr, delay_ms in frames:
            timeline.append((ts, (lambda a=arr: pnglib.encode_png(a))))
            ts += delay_ms
        return "png", timeline
    return None, []


def _sample_picks(timestamps: list[float], every_n_seconds: float) -> list[int]:
    """ffmpeg-fps-filter semantics: for each target time 0, n, 2n, … pick
    the last frame whose presentation timestamp is ≤ the target; emit each
    source frame at most once."""
    import bisect

    step = max(every_n_seconds, 1e-3) * 1000.0
    duration = timestamps[-1]
    picks: list[int] = []
    t = 0.0
    while t <= duration + 1e-9:
        i = bisect.bisect_right(timestamps, t) - 1
        if i >= 0 and (not picks or picks[-1] != i):
            picks.append(i)
        t += step
    return picks


def sample_video_frames(media: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Video frame sampling: one input row per video, one output row per
    sampled frame, Arrow-batched ``mapInPandas`` with per-executor decoder
    state (the extraction-kernel shape — failures isolate per row).

    Real paths, own codecs end-to-end:

    * **MJPEG AVI** — RIFF walk (``core/avi.py``); sampled frames are the
      original JPEG payloads (decodable by ``core/jpeg.py`` /
      ``decode_images`` downstream), ``frame_format='jpeg'``.
    * **Animated GIF** — full LZW decode + disposal compositing
      (``core/gif.py``); sampled frames are re-encoded as PNG
      (``core/png.py``), ``frame_format='png'``.

    Inter-frame codecs (H.264/VP9/…) remain the marked codec boundary:
    those rows report ``codec_unavailable`` with zero frames."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {k: [] for k in ("url", "frame_no", "ts_ms", "frame_format", "status", "frame")}

            def emit(url, frame_no, ts_ms, fmt, status, frame):
                rows["url"].append(url)
                rows["frame_no"].append(frame_no)
                rows["ts_ms"].append(ts_ms)
                rows["frame_format"].append(fmt)
                rows["status"].append(status)
                rows["frame"].append(frame)

            for url, payload in zip(batch["url"], batch["payload"]):
                try:
                    fmt, timeline = _video_timeline(bytes(payload or b""))
                    if fmt is None:
                        emit(url, 0, 0.0, None, "codec_unavailable", None)
                        continue
                    stamps = [t for t, _ in timeline]
                    for i in _sample_picks(stamps, every_n_seconds):
                        emit(url, i, stamps[i], fmt, "sampled", timeline[i][1]())
                except Exception:
                    emit(url, 0, 0.0, None, "corrupt", None)
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("ts_ms", T.DoubleType()),
            T.StructField("frame_format", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    return media.mapInPandas(kernel, schema=schema)


MULTIMODAL_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("content_text", T.StringType()),
        T.StructField(
            "segments",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("index_in_doc", T.IntegerType()),
                        T.StructField("label", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("bbox", T.ArrayType(T.DoubleType())),
                    ]
                )
            ),
        ),
        T.StructField(
            "cells",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("text", T.StringType()),
                        T.StructField("bbox", T.ArrayType(T.DoubleType())),
                        T.StructField("ocr", T.BooleanType()),
                        T.StructField("ocr_confidence", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField("width", T.DoubleType()),
        T.StructField("height", T.DoubleType()),
        T.StructField("image", T.BinaryType()),
    ]
)


def multimodal_page_records(
    pages: DataFrame, scale: float = 1.0, with_images: bool = False
) -> DataFrame:
    """(url, html=PDF bytes) → one multimodal training record per page.

    Spark-first analog of the reference's ``generate_multimodal_pages``
    (docling/utils/export.py:13-146): per page, the main-content text, the
    labeled layout segments with [0,1]-normalized TOPLEFT bboxes, the raw
    text cells with normalized bboxes + OCR provenance, and (optionally)
    the rendered page PNG — the row shape a layout/VLM training pipeline
    ingests. One Arrow-batched stage; the PDF is parsed once and shared
    between cell extraction and the document build."""

    def _norm(l, t, r, b, w, h):
        return [l / w, t / h, r / w, b / h]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from doc_parser_spark.pdf import minipdf
        from doc_parser_spark.pdf.extractor import extract_pdf
        from doc_parser_spark.pdf.render import render_page

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                try:
                    raw = bytes(payload) if payload is not None else b""
                    parsed = minipdf.parse_pdf(raw)
                    doc, _fb = extract_pdf(raw, parsed_pages=parsed)
                    by_page: dict[int, list] = {}
                    for ix, (node, _d) in enumerate(doc.iterate_items()):
                        by_page.setdefault(node.page_no, []).append((ix, node))
                    for page in parsed:
                        w, h = max(page.width, 1.0), max(page.height, 1.0)
                        segs = []
                        texts = []
                        for ix, node in by_page.get(page.page_no, []):
                            if node.text:
                                texts.append(node.text)
                            if node.bbox is None:
                                continue
                            l, t, r, b = node.bbox
                            segs.append(
                                {
                                    "index_in_doc": ix,
                                    "label": node.label,
                                    "text": node.text or "",
                                    "bbox": _norm(l, t, r, b, w, h),
                                }
                            )
                        cells = [
                            {
                                "text": c.text,
                                "bbox": _norm(c.l, c.t, c.r, c.b, w, h),
                                # minipdf cells are structured-parse text
                                # (an ocr_fn would mark its own cells)
                                "ocr": False,
                                "ocr_confidence": 1.0,
                            }
                            for c in page.cells
                        ]
                        img = (
                            pnglib.encode_png(render_page(page, scale=scale))
                            if with_images
                            else None
                        )
                        records.append(
                            {
                                "url": url, "page_no": page.page_no,
                                "status": "ok",
                                "content_text": "\n\n".join(texts),
                                "segments": segs, "cells": cells,
                                "width": float(page.width),
                                "height": float(page.height),
                                "image": img,
                            }
                        )
                except Exception as exc:  # noqa: BLE001
                    records.append(
                        {
                            "url": url, "page_no": 0,
                            "status": f"failure:{type(exc).__name__}",
                            "content_text": "", "segments": [], "cells": [],
                            "width": 0.0, "height": 0.0, "image": None,
                        }
                    )
            yield pd.DataFrame.from_records(
                records, columns=[f.name for f in MULTIMODAL_PAGE_SCHEMA.fields]
            )

    return pages.mapInPandas(kernel, schema=MULTIMODAL_PAGE_SCHEMA)


EMBEDDED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("colorspace", T.StringType()),
        T.StructField("filter", T.StringType()),
        T.StructField("image", T.BinaryType()),
    ]
)


def extract_pdf_images(pages: DataFrame) -> DataFrame:
    """(url, html=PDF bytes) → one row per embedded raster XObject.

    The original picture payloads (figures + soft masks), not page
    rasterizations: DCTDecode streams decode through ``core/jpeg.py`` and
    re-encode as PNG; Flate bitmaps whose sample layout needs a palette
    (/Indexed) ship as raw samples with declared metadata
    (status=``raw_samples``)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from doc_parser_spark.core.jpeg import JpegError, decode_jpeg
        from doc_parser_spark.pdf.minipdf import extract_page_images

        for batch in batches:
            records = []
            for url, payload in zip(batch["url"], batch["html"]):
                try:
                    imgs = extract_page_images(
                        bytes(payload) if payload is not None else b""
                    )
                except Exception as exc:  # noqa: BLE001
                    records.append(
                        {
                            "url": url, "page_no": 0, "name": "",
                            "status": f"failure:{type(exc).__name__}",
                            "width": 0, "height": 0, "colorspace": "",
                            "filter": "", "image": None,
                        }
                    )
                    continue
                for im in imgs:
                    status, out = "raw_samples", im["payload"]
                    if im["filter"] == "DCTDecode":
                        try:
                            out = pnglib.encode_png(decode_jpeg(im["payload"]))
                            status = "decoded_png"
                        except Exception:  # noqa: BLE001 — per-item isolation
                            status, out = "corrupt", None
                    records.append(
                        {
                            "url": url, "page_no": im["page_no"],
                            "name": im["name"], "status": status,
                            "width": im["width"], "height": im["height"],
                            "colorspace": im["colorspace"],
                            "filter": im["filter"], "image": out,
                        }
                    )
            yield pd.DataFrame.from_records(
                records, columns=[f.name for f in EMBEDDED_IMAGE_SCHEMA.fields]
            )

    return pages.mapInPandas(kernel, schema=EMBEDDED_IMAGE_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual image hashing (dHash/aHash) — image near-dup dedup
# ---------------------------------------------------------------------------

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)

PHASH_ROWS = 8  # grid rows for both hashes
PHASH_COLS = 9  # dhash compares horizontally adjacent cells -> 8x8 bits


def _gray_i64(arr: np.ndarray) -> np.ndarray:
    """uint8 (H, W, C) → int64 (H, W) integer luma.

    3/4 channels use the ITU-R 601 integer weights (299/587/114, div
    1000, floor) — exact integer math so every engine/replica agrees;
    alpha is ignored (hash the pixels, not the compositing)."""
    a = arr.astype(np.int64)
    if a.shape[2] == 1:
        return a[:, :, 0]
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    return (r * 299 + g * 587 + b * 114) // 1000


def _cell_stats(gray: np.ndarray, rows: int, cols: int):
    """Integer box sums + areas on the (rows x cols) grid.

    The binning contract (shared verbatim with the DuckDB oracle): pixel
    (y, x) belongs to cell ((y*rows)//H, (x*cols)//W). Sums ride
    ``np.bincount`` with integer-valued float64 weights — exact because
    every partial sum stays far below 2^53 (MAX_PIXELS * 255 < 2^53)."""
    h, w = gray.shape
    if h < rows or w < cols:
        # upscale-by-repeat so no cell is ever empty (tiny icons)
        gray = np.repeat(
            np.repeat(gray, -(-rows // h), axis=0), -(-cols // w), axis=1
        )
        h, w = gray.shape
    ridx = (np.arange(h, dtype=np.int64) * rows) // h
    cidx = (np.arange(w, dtype=np.int64) * cols) // w
    cell = ridx[:, None] * cols + cidx[None, :]
    sums = np.bincount(
        cell.ravel(), weights=gray.ravel().astype(np.float64),
        minlength=rows * cols,
    ).astype(np.int64)
    areas = np.bincount(cell.ravel(), minlength=rows * cols).astype(np.int64)
    return sums.reshape(rows, cols), areas.reshape(rows, cols)


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _phash_one(payload: bytes) -> dict:
    """One image payload → dHash + aHash (both 64-bit, integer-exact).

    dHash (difference hash): bit (r, c) set iff cell (r, c) is brighter
    than cell (r, c+1) on a 8x9 grid — compared exactly via cross
    multiplication ``sum_l * area_r > sum_r * area_l`` (no float means).
    aHash (average hash): bit (r, c) set iff the 8x8 cell mean exceeds
    the global mean, again cross-multiplied. Python ints carry the
    products, so nothing can overflow."""
    out = {"status": "decoded", "width": None, "height": None,
           "dhash": None, "ahash": None}
    if not payload:
        out["status"] = "empty"
        return out
    status, arr = _image_array(payload)
    out["status"] = status
    if arr is None:
        return out
    out["width"], out["height"] = int(arr.shape[1]), int(arr.shape[0])
    gray = _gray_i64(arr)
    ds, da = _cell_stats(gray, PHASH_ROWS, PHASH_COLS)
    dhash = 0
    for r in range(PHASH_ROWS):
        for c in range(PHASH_COLS - 1):
            sl, al = int(ds[r, c]), int(da[r, c])
            sr, ar = int(ds[r, c + 1]), int(da[r, c + 1])
            if sl * ar > sr * al:
                dhash |= 1 << (r * (PHASH_COLS - 1) + c)
    as_, aa = _cell_stats(gray, PHASH_ROWS, PHASH_ROWS)
    total_sum, total_area = int(as_.sum()), int(aa.sum())
    ahash = 0
    for r in range(PHASH_ROWS):
        for c in range(PHASH_ROWS):
            if int(as_[r, c]) * total_area > total_sum * int(aa[r, c]):
                ahash |= 1 << (r * PHASH_ROWS + c)
    out["dhash"] = _to_signed64(dhash)
    out["ahash"] = _to_signed64(ahash)
    return out


def image_dhash(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media(doc_id, payload) → perceptual hashes (dHash + aHash).

    The image-side analog of ``dedup.simhash``: exact byte-level dedup
    misses re-encoded/resized copies of the same picture; a 64-bit
    difference hash puts visually-identical images within small Hamming
    distance, and ``image_dhash_neardup`` buckets them with the same
    banded join the text SimHash path uses.

    Arrow-batched ``mapInPandas`` over the native codecs (PNG/JPEG/TIFF/
    BMP/FAKEIMG); per-item failure isolation (corrupt payloads yield a
    status row, never a dead batch). Scale shape: embarrassingly
    parallel scan — no shuffle; the downstream near-dup join shuffles
    only the 16-byte hash relation, never pixels."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            records = []
            for doc_id, payload in zip(batch["doc_id"], batch[payload_col]):
                try:
                    rec = _phash_one(
                        bytes(payload) if payload is not None else b""
                    )
                except Exception as exc:  # noqa: BLE001
                    rec = {"status": f"error:{type(exc).__name__}",
                           "width": None, "height": None,
                           "dhash": None, "ahash": None}
                rec["doc_id"] = int(doc_id)
                records.append(rec)
            out = pd.DataFrame(records)
            yield out[[f.name for f in PHASH_SCHEMA.fields]]

    return media.mapInPandas(kernel, schema=PHASH_SCHEMA)


def image_dhash_neardup(
    hashes: DataFrame,
    bands: int = 8,
    max_hamming: int = 7,
    max_bucket: int = 2000,
) -> DataFrame:
    """Perceptual near-duplicate image pairs over ``image_dhash`` output.

    Rides :func:`dedup.banded_hamming_pairs` (Manku WWW'07) on the 64-bit
    dHash: 8 bands of 8 bits — exhaustive for Hamming <= 7, which is the
    standard dHash near-dup band. Undecodable rows (NULL hash) are
    filtered before banding."""
    from doc_parser_spark.operators.dedup import banded_hamming_pairs

    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be <= bands - 1 "
            f"({bands - 1}) for the pigeonhole guarantee"
        )
    if 64 % bands != 0:
        raise ValueError(f"bands ({bands}) must divide 64")
    return banded_hamming_pairs(
        hashes.where(F.col("dhash").isNotNull()).select("doc_id", "dhash"),
        hash_col="dhash",
        bits=64,
        bands=bands,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


# Synthetic image corpus parameters — shared verbatim with the DuckDB
# oracle, which recomputes the hashes from the same closed-form pixel
# function (the PNG encode/decode roundtrip is what Spark adds on top).
SYNTH_IMG_W = 24
SYNTH_IMG_H = 16
SYNTH_IMG_BASES = 5
SYNTH_IMG_VARIANTS = 4


def synth_pixel(doc_id: int, y: int, x: int) -> int:
    """Closed-form grayscale pixel — pure function of (doc_id, y, x).

    base picks a gradient family (5 of them), variant adds a sparse
    +v perturbation so images within a base are near- (not exact-)
    duplicates across variants."""
    base = doc_id % SYNTH_IMG_BASES
    v = (doc_id // SYNTH_IMG_BASES) % SYNTH_IMG_VARIANTS
    a, b = 3 + base * 5, 7 + base * 11
    p = (a * x + b * y) % 251
    if (x + 2 * y) % 17 == 0:
        p = min(p + v, 250)
    return p


def synth_image_corpus(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, payload): deterministic grayscale PNGs from
    :func:`synth_pixel`, encoded with the native codec. Arrow-batched."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    w, h = SYNTH_IMG_W, SYNTH_IMG_H

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs = np.arange(w, dtype=np.int64)[None, :]
        ys = np.arange(h, dtype=np.int64)[:, None]
        for batch in batches:
            ids, payloads = [], []
            for doc_id in batch["doc_id"]:
                d = int(doc_id)
                base = d % SYNTH_IMG_BASES
                v = (d // SYNTH_IMG_BASES) % SYNTH_IMG_VARIANTS
                a, b = 3 + base * 5, 7 + base * 11
                px = (a * xs + b * ys) % 251
                noisy = (xs + 2 * ys) % 17 == 0
                px = np.where(noisy, np.minimum(px + v, 250), px)
                ids.append(d)
                payloads.append(
                    pnglib.encode_png(px.astype(np.uint8))
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return documents.select("doc_id").mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Audio analytics through the real WAV codec.
#
# Same design as the image-hash pair above: a deterministic synthetic
# corpus whose samples are a CLOSED-FORM integer function of
# (doc_id, sample index), encoded to real RIFF/WAVE PCM16 bytes by
# core/wav.py — so the DuckDB oracle can recompute every statistic from
# the formula while Spark must round-trip the actual container. What the
# oracle then verifies is the codec + kernel end to end, not just the
# arithmetic. All emitted statistics are integers (no float RMS — energy
# is the raw sum of squares), so driver-style canonicalization is exact.
#
# s(d, i) = ((a·i + b) mod 65536) − 32768,  a = 17 + 2·(d mod 13),
#           b = (97·d) mod 65536
# rate(d) = 8000 + 4000·(d mod 3),  n(d) = 1600 + 800·(d mod 7)
#
# PCM16 round-trip exactness: encode stores round(s/32768·32768) = s (the
# division is dyadic-exact in float64), decode returns s/32768.0, and the
# kernel recovers rint(x·32768) = s. No quantization slack anywhere.

SYNTH_WAV_MOD = 65536


def synth_wav_params(doc_id: int) -> tuple[int, int, int, int]:
    """(rate, n_samples, a, b) for one synthetic audio doc."""
    d = int(doc_id)
    return (
        8000 + 4000 * (d % 3),
        1600 + 800 * (d % 7),
        17 + 2 * (d % 13),
        (97 * d) % SYNTH_WAV_MOD,
    )


def synth_audio_corpus(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, payload): real PCM16 mono WAV bytes whose
    samples follow the closed form above. Arrow-batched, zero-shuffle."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, payloads = [], []
            for doc_id in batch["doc_id"]:
                d = int(doc_id)
                rate, n, a, b = synth_wav_params(d)
                i = np.arange(n, dtype=np.int64)
                s = (a * i + b) % SYNTH_WAV_MOD - 32768
                ids.append(d)
                payloads.append(wavlib.encode_wav(s / 32768.0, rate, bits=16))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return documents.select("doc_id").mapInPandas(kernel, schema=schema)


WAV_SILENCE_ABS = 512  # |s| below this counts as silence (~ -36 dBFS)


def _wav_pcm16(payload) -> tuple:
    """Shared WAV ingestion prologue for every audio kernel:
    payload → (status, rate, int64 channel-0 samples at PCM16 scale).

    One definition so the hardening rules stay in sync across kernels:
    float-PCM WAVs pass through decode_wav unclipped, so NaN/Inf samples
    (which make ``rint(...).astype(int64)`` platform-undefined —
    observed INT64_MIN → negative "mean of absolute values") gate the
    row with ``error:NonFiniteSamples``, and finite out-of-range samples
    clamp to full scale like the integer paths (an unclamped square
    would overflow the int64 accumulators)."""
    if not payload:
        return "empty", 0, None
    try:
        rate, arr = wavlib.decode_wav(bytes(payload))
    except wavlib.WavError as exc:
        return f"error:{type(exc).__name__}", 0, None
    ch0 = arr[:, 0]
    if len(ch0) and not np.isfinite(ch0).all():
        return "error:NonFiniteSamples", 0, None
    # positive full scale is 32767/32768 — a hard-limited float WAV at
    # +1.0 must land on 32767 (inside PCM16, seen by the clip detector),
    # not 32768 (outside range, invisible to `s == 32767`)
    s = np.rint(np.clip(ch0, -1.0, 32767.0 / 32768.0) * 32768.0).astype(np.int64)
    return "decoded", int(rate), s

WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("mean_abs", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("clip_count", T.LongType()),
        T.StructField("silence_permille", T.LongType()),
    ]
)


def _wav_stats_one(payload: bytes) -> dict:
    """One WAV payload → integer loudness/shape statistics.

    The audio half of the curation feature panel: peak/energy/mean-abs
    catch digital silence and constant tones, clip_count catches
    hard-limited rips, zero_crossings is the classic cheap
    voiced/unvoiced proxy, silence_permille the dead-air share. Stereo
    is folded to channel 0 (stats are per-stream, not per-mix)."""
    out = {
        "status": "decoded", "sample_rate": None, "n_samples": None,
        "duration_ms": None, "peak": None, "energy": None, "mean_abs": None,
        "zero_crossings": None, "clip_count": None, "silence_permille": None,
    }
    status, rate, s = _wav_pcm16(payload)
    if status != "decoded":
        out["status"] = status
        return out
    n = len(s)
    out["sample_rate"] = int(rate)
    out["n_samples"] = n
    out["duration_ms"] = n * 1000 // rate
    if n == 0:
        out.update(peak=0, energy=0, mean_abs=0, zero_crossings=0,
                   clip_count=0, silence_permille=0)
        return out
    sabs = np.abs(s)
    out["peak"] = int(sabs.max())
    out["energy"] = int((s * s).sum())
    out["mean_abs"] = int(sabs.sum()) // n
    out["zero_crossings"] = int(((s[:-1] * s[1:]) < 0).sum())
    out["clip_count"] = int(((s == 32767) | (s == -32768)).sum())
    out["silence_permille"] = 1000 * int((sabs < WAV_SILENCE_ABS).sum()) // n
    return out


def wav_stats(audio: DataFrame, payload_col: str = "payload") -> DataFrame:
    """audio(doc_id, payload) → per-clip integer statistics via the real
    RIFF/WAVE decoder. Embarrassingly parallel (one Arrow-batched
    projection, zero shuffles) — at 100 TB this is a pure map stage whose
    partitioning is inherited from the scan, like the text-extraction
    kernel. Per-row failure isolation via the status column (the
    per-document contract of operators/extract.py)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            recs = []
            for doc_id, payload in zip(batch["doc_id"], batch[payload_col]):
                rec = _wav_stats_one(
                    payload if payload is None else bytes(payload)
                )
                rec["doc_id"] = int(doc_id)
                recs.append(rec)
            yield pd.DataFrame(
                recs, columns=[f.name for f in WAV_STATS_SCHEMA.fields]
            )

    return audio.select("doc_id", payload_col).mapInPandas(
        kernel, schema=WAV_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video container stats through the real RIFF/AVI walk — same
# closed-form-corpus design as the WAV pair: frame COUNT, timing and
# SIZES are pure functions of (doc_id, frame index), so the oracle
# recomputes them while Spark must parse the actual container bytes.
# Frame payloads are opaque filler (container stats don't decode pixels;
# MJPEG pixel decode stays on the sample_video_frames path).
#
# n_frames(d) = 4 + d mod 5,  fps(d) = 5 + 5·(d mod 3)
# len(d, j) = 100 + (7·d + 13·j) mod 50


def synth_video_params(doc_id: int) -> tuple[int, int]:
    """(n_frames, fps) for one synthetic video doc."""
    d = int(doc_id)
    return 4 + d % 5, 5 + 5 * (d % 3)


def synth_video_corpus(documents: DataFrame) -> DataFrame:
    """documents → (doc_id, payload): real RIFF/AVI containers with
    closed-form frame sizes. Arrow-batched, zero-shuffle."""
    from doc_parser_spark.core import avi as avilib

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, payloads = [], []
            for doc_id in batch["doc_id"]:
                d = int(doc_id)
                n, fps = synth_video_params(d)
                frames = [
                    bytes([(17 * j + d) % 256]) * (100 + (7 * d + 13 * j) % 50)
                    for j in range(n)
                ]
                ids.append(d)
                payloads.append(avilib.build_avi(frames, fps=fps))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return documents.select("doc_id").mapInPandas(kernel, schema=schema)


VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("usec_per_frame", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("total_frame_bytes", T.LongType()),
        T.StructField("min_frame_bytes", T.LongType()),
        T.StructField("max_frame_bytes", T.LongType()),
    ]
)


def _video_stats_one(payload: bytes) -> dict:
    """One video payload → container-level integer statistics (the shard
    planner's inputs: how many frames, how long, how heavy).

    Two header-only container walks share the output contract: RIFF/AVI
    (frame payloads enumerated directly) and ISO BMFF/MP4 with H.264
    inside (frame count/sizes from stsz, timing from mdhd — the
    dominant real-world container, still never decoding a frame; the
    compressed-bitstream boundary stays NotImplementedError)."""
    from doc_parser_spark.core import avi as avilib
    from doc_parser_spark.core import mp4 as mp4lib

    out = {
        "status": "parsed", "n_frames": None, "usec_per_frame": None,
        "duration_ms": None, "total_frame_bytes": None,
        "min_frame_bytes": None, "max_frame_bytes": None,
    }
    if not payload:
        out["status"] = "empty"
        return out
    data = bytes(payload)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        try:
            info = mp4lib.parse_mp4(data)
        except (mp4lib.Mp4Error, IndexError) as exc:
            # IndexError guards the per-document error-isolation
            # contract against any residual raw byte access on a
            # malformed payload — one bad crawl row must never fail
            # the Spark task (same contract as the AVI path)
            out["status"] = f"error:{type(exc).__name__}"
            return out
        if not info.n_frames or not info.timescale:
            out["status"] = "error:Mp4Error"
            return out
        usec = info.duration * 1_000_000 // info.timescale // info.n_frames
        out["n_frames"] = info.n_frames
        out["usec_per_frame"] = int(usec)
        out["duration_ms"] = info.duration * 1000 // info.timescale
        out["total_frame_bytes"] = info.size_total
        out["min_frame_bytes"] = info.size_min
        out["max_frame_bytes"] = info.size_max
        return out
    try:
        usec, frames = avilib.parse_avi(data)
    except avilib.AviError as exc:
        out["status"] = f"error:{type(exc).__name__}"
        return out
    sizes = [len(f) for f in frames]
    out["n_frames"] = len(frames)
    out["usec_per_frame"] = int(usec)
    out["duration_ms"] = len(frames) * int(usec) // 1000
    out["total_frame_bytes"] = sum(sizes)
    out["min_frame_bytes"] = min(sizes)
    out["max_frame_bytes"] = max(sizes)
    return out


def video_stats(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media(doc_id, payload) → per-clip container statistics via the
    real AVI walk. Pure map stage (Arrow-batched, zero shuffles), per-row
    failure isolation via status — the multimodal twin of wav_stats."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            recs = []
            for doc_id, payload in zip(batch["doc_id"], batch[payload_col]):
                rec = _video_stats_one(
                    payload if payload is None else bytes(payload)
                )
                rec["doc_id"] = int(doc_id)
                recs.append(rec)
            yield pd.DataFrame(
                recs, columns=[f.name for f in VIDEO_STATS_SCHEMA.fields]
            )

    return media.select("doc_id", payload_col).mapInPandas(
        kernel, schema=VIDEO_STATS_SCHEMA
    )


def media_filter(
    wav: DataFrame,
    video: DataFrame,
    min_duration_ms: int = 150,
    max_duration_ms: int = 60_000,
    max_silence_permille: int = 900,
    max_clip_permille: int = 10,
    min_frames: int = 2,
) -> DataFrame:
    """Multimodal curation gate — the audio/video twin of the text-side
    ``curate_flags``: keep verdicts per doc from the codec-stats panels
    (the deterministic gates an AV training mix applies before any ML
    scoring; CLAP/CLIP-style model filters are the usual plug-point on
    top).

    Audio keeps: decoded, duration in bounds, not mostly silence, not
    hard-limited (clipped samples per-mille over ``max_clip_permille``).
    Video keeps: parsed, frame count ≥ ``min_frames``, duration in
    bounds. ``keep`` = both modalities pass (flags-not-filters, like the
    text funnel — downstream picks its own policy).

    One doc_id-keyed full-outer join of two already-narrow stat
    relations — co-partitioned, no corpus rescan."""
    a = wav.select(
        "doc_id",
        (
            (F.col("status") == "decoded")
            & F.col("duration_ms").between(min_duration_ms, max_duration_ms)
            & (F.col("silence_permille") <= max_silence_permille)
            & (
                (F.col("clip_count") * 1000)
                <= F.lit(max_clip_permille) * F.col("n_samples")
            )
        ).alias("pass_audio"),
        F.col("status").alias("audio_status"),
    )
    v = video.select(
        "doc_id",
        (
            (F.col("status") == "parsed")
            & (F.col("n_frames") >= min_frames)
            & F.col("duration_ms").between(min_duration_ms, max_duration_ms)
        ).alias("pass_video"),
        F.col("status").alias("video_status"),
    )
    return a.join(v, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("pass_audio", F.lit(False)).alias("pass_audio"),
        F.coalesce("pass_video", F.lit(False)).alias("pass_video"),
        F.coalesce("audio_status", F.lit("missing")).alias("audio_status"),
        F.coalesce("video_status", F.lit("missing")).alias("video_status"),
        (
            F.coalesce("pass_audio", F.lit(False))
            & F.coalesce("pass_video", F.lit(False))
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Audio fingerprint dedup: a 32-bit energy-profile dHash per clip
# (Shazam-family intuition reduced to its deterministic core: the
# coarse loudness envelope survives re-encoding and small edits), then
# near-dup pairs through the SAME banded-Hamming engine text SimHash
# and image dHash use. The envelope is computed from integer sample
# energies, so the DuckDB oracle rebuilds every bit from the synthetic
# sample formula.

WAV_FP_WINDOWS = 33  # 33 energy windows -> 32 comparison bits


def _wav_fp_one(payload: bytes) -> dict:
    """One WAV payload → 32-bit energy-envelope fingerprint.

    Bit i is set iff window i's energy exceeds window i+1's (strict,
    like image dHash); windows are ``n // 33`` samples, the trailing
    remainder ignored. Clips shorter than 33 samples report status
    ``short``."""
    out = {"status": "decoded", "fp": None}
    status, _rate, s = _wav_pcm16(payload)
    if status != "decoded":
        out["status"] = status
        return out
    w = len(s) // WAV_FP_WINDOWS
    if w == 0:
        out["status"] = "short"
        return out
    e = (s[: WAV_FP_WINDOWS * w] ** 2).reshape(WAV_FP_WINDOWS, w).sum(axis=1)
    fp = 0
    for i in range(WAV_FP_WINDOWS - 1):
        if int(e[i]) > int(e[i + 1]):
            fp |= 1 << i
    out["fp"] = fp
    return out


WAV_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("fp", T.LongType()),
    ]
)


def wav_fingerprint(audio: DataFrame, payload_col: str = "payload") -> DataFrame:
    """audio(doc_id, payload) → 32-bit energy-envelope fingerprints.
    Pure map stage like wav_stats; per-row failure isolation."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            recs = []
            for doc_id, payload in zip(batch["doc_id"], batch[payload_col]):
                rec = _wav_fp_one(
                    payload if payload is None else bytes(payload)
                )
                rec["doc_id"] = int(doc_id)
                recs.append(rec)
            yield pd.DataFrame(
                recs, columns=[f.name for f in WAV_FP_SCHEMA.fields]
            )

    return audio.select("doc_id", payload_col).mapInPandas(
        kernel, schema=WAV_FP_SCHEMA
    )


def wav_neardup_pairs(
    fps: DataFrame, max_hamming: int = 3, max_bucket: int = 2000
) -> DataFrame:
    """Fingerprint relation → near-dup clip pairs via the shared
    banded-Hamming engine (4×8-bit bands over the 32-bit envelope hash;
    pigeonhole guarantees recall for ``max_hamming ≤ 3``). Same
    count-filtered-bucket discipline as every other near-dup path:
    ``max_bucket`` drops viral identical-fingerprint groups whole — a
    disclosed recall cap, so the brute-force oracle twin matches only
    while the largest group stays under it (on the synthetic corpus
    groups grow ~6 per 1000 docs: safe to ~300k docs at the default)."""
    from doc_parser_spark.operators.dedup import banded_hamming_pairs

    if max_hamming > 4 - 1:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be <= 3: the 4-band "
            "pigeonhole guarantee does not hold past bands-1, silently "
            "losing recall"
        )
    return banded_hamming_pairs(
        fps.where(F.col("fp").isNotNull()).select("doc_id", "fp"),
        hash_col="fp",
        bits=32,
        bands=4,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


RESIZE_CHECK_W = 10
RESIZE_CHECK_H = 6

RESIZE_CHECK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def resize_check(documents: DataFrame) -> DataFrame:
    """Oracle-verifiable proof of the image RESIZE path: synth pixels →
    real PNG encode → decode → :func:`core.png.resize_nearest` →
    re-encode → decode again → position-weighted integer checksum. The
    dHash pair proves decode; this proves the resize index math
    (``src = min((dst·n) // N, n-1)``) and the encode/decode round-trip
    UNDER it, because the DuckDB twin recomputes every output pixel from
    the closed pixel form + the same index arithmetic. Pure map stage."""
    w, h = RESIZE_CHECK_W, RESIZE_CHECK_H

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs = np.arange(SYNTH_IMG_W, dtype=np.int64)[None, :]
        ys = np.arange(SYNTH_IMG_H, dtype=np.int64)[:, None]
        for batch in batches:
            recs = []
            for doc_id in batch["doc_id"]:
                d = int(doc_id)
                base = d % SYNTH_IMG_BASES
                v = (d // SYNTH_IMG_BASES) % SYNTH_IMG_VARIANTS
                a, b = 3 + base * 5, 7 + base * 11
                px = (a * xs + b * ys) % 251
                noisy = (xs + 2 * ys) % 17 == 0
                px = np.where(noisy, np.minimum(px + v, 250), px).astype(
                    np.uint8
                )
                png1 = pnglib.encode_png(px)
                status, arr = _image_array(png1)
                if status != "decoded":
                    recs.append({"doc_id": d, "status": status,
                                 "out_w": None, "out_h": None,
                                 "pixel_sum": None, "checksum": None})
                    continue
                small = pnglib.resize_nearest(arr, w, h)
                out = pnglib.decode_png(pnglib.encode_png(small))
                flat = out.reshape(-1).astype(np.int64)
                weights = np.arange(1, flat.size + 1, dtype=np.int64)
                recs.append({
                    "doc_id": d, "status": "resized",
                    "out_w": int(out.shape[1]), "out_h": int(out.shape[0]),
                    "pixel_sum": int(flat.sum()),
                    "checksum": int((flat * weights).sum()),
                })
            yield pd.DataFrame(
                recs, columns=[f.name for f in RESIZE_CHECK_SCHEMA.fields]
            )

    return documents.select("doc_id").mapInPandas(
        kernel, schema=RESIZE_CHECK_SCHEMA
    )
