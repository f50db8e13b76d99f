"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media alongside text. The pattern
here: payloads stay opaque ``binary`` columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages with
per-executor codec state — exactly the shape the text-extraction kernel
uses, so partitioning/skew/manifest plumbing is shared.

Codec reality in this environment: no PIL/ffmpeg are installed, so the
*real* image/audio decode path is stubbed behind a clearly-marked
``NotImplementedError`` (``_decode_real``), and a deterministic fake
container format (``FAKEIMG``/``FAKEAUD`` headers, documented below) stands
in so the Spark-side plumbing — schemas, batch iteration, partitioning,
failure isolation, feature extraction — is real and tested end-to-end.
Swapping in PIL is a one-function change.

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
from pyspark.sql import types as T

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
    """The production decode path (PIL / soundfile / pyav).

    STUB: media codecs are not installed in this environment."""
    raise NotImplementedError(
        "real image/audio decode requires PIL/soundfile/pyav (not installed); "
        "the FAKEIMG/FAKEAUD deterministic container exercises the plumbing"
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


def _decode_one(payload: bytes) -> dict:
    out = {
        "status": "decoded", "width": None, "height": None, "channels": None,
        "sample_rate": None, "n_samples": None,
        "n_bytes": len(payload) if payload else 0, "features": None,
    }
    if not payload:
        out["status"] = "empty"
        return out
    if payload.startswith(b"FAKEIMG"):
        width, height, channels = struct.unpack(">HHB", payload[7:12])
        raw = np.frombuffer(payload[12:], dtype=np.uint8)
        expected = width * height * channels
        if raw.size != expected:
            out["status"] = "corrupt"
            return out
        out.update(width=width, height=height, channels=channels,
                   features=_byte_histogram_features(raw))
    elif payload.startswith(b"FAKEAUD"):
        sample_rate, n_samples = struct.unpack(">II", payload[7:15])
        raw = np.frombuffer(payload[15:], dtype=np.uint8)
        out.update(sample_rate=sample_rate, n_samples=n_samples,
                   features=_byte_histogram_features(raw))
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


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — STUB (needs PIL). The mapInPandas wiring is in
    place; each row reports ``codec_unavailable`` until a codec ships."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "url": batch["url"],
                    "media_type": batch["media_type"],
                    "status": ["codec_unavailable"] * len(batch),
                    "payload": batch["payload"],
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


def sample_video_frames(media: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Video frame-sampling stage — STUB (needs pyav/ffmpeg).

    The Spark-side plumbing is the real contract: one input row per video,
    one output row per sampled frame (posexplode shape), Arrow-batched with
    per-executor decoder state. Until a codec ships every row reports
    ``codec_unavailable`` with zero frames."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "url": batch["url"],
                    "frame_no": [0] * len(batch),
                    "ts_ms": [0.0] * len(batch),
                    "status": ["codec_unavailable"] * len(batch),
                    "frame": [None] * len(batch),
                }
            )

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("ts_ms", T.DoubleType()),
            T.StructField("status", T.StringType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    return media.mapInPandas(kernel, schema=schema)
