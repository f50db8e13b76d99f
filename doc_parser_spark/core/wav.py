"""Minimal pure-Python RIFF/WAVE PCM codec (struct + numpy only).

Makes the multimodal operators' audio path real for the one container
whose payload needs no entropy codec: chunk-walked RIFF parsing, PCM
8/16/24/32-bit integer and 32/64-bit IEEE-float sample formats
(WAVE_FORMAT_EXTENSIBLE unwrapped to its subformat), any channel count.
Compressed codecs (MP3/AAC/Vorbis…) remain the documented provider
boundary in ``operators/multimodal.py`` — same split the reference makes
by routing audio to ``NoOpBackend`` + an external ASR model.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["WavError", "decode_wav", "encode_wav"]

_PCM = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE


class WavError(ValueError):
    pass


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, float64 array (frames, channels) in [-1, 1]).

    Integer PCM is scaled by its full-scale value (uint8 is offset-binary
    per the spec); float samples pass through unscaled."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavError("fmt chunk truncated")
            tag, n_ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag == _EXTENSIBLE:
                if len(body) < 26:
                    raise WavError("extensible fmt chunk truncated")
                # subformat GUID starts with the 16-bit format tag
                (tag,) = struct.unpack_from("<H", body, 24)
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavError("missing fmt chunk")
    if payload is None:
        raise WavError("missing data chunk")
    tag, n_ch, rate, bits = fmt
    if n_ch < 1 or rate < 1:
        raise WavError(f"degenerate fmt: {n_ch} channels @ {rate} Hz")
    if tag == _PCM:
        if bits == 8:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            n = len(payload) // 2
            x = np.frombuffer(payload, dtype="<i2", count=n).astype(np.float64) / 32768.0
        elif bits == 24:
            n = len(payload) // 3
            b = np.frombuffer(payload, dtype=np.uint8, count=n * 3).reshape(n, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            n = len(payload) // 4
            x = np.frombuffer(payload, dtype="<i4", count=n).astype(np.float64) / float(
                1 << 31
            )
        else:
            raise WavError(f"{bits}-bit integer PCM unsupported")
    elif tag == _IEEE_FLOAT:
        if bits == 32:
            x = np.frombuffer(payload, dtype="<f4", count=len(payload) // 4).astype(
                np.float64
            )
        elif bits == 64:
            x = np.frombuffer(payload, dtype="<f8", count=len(payload) // 8).copy()
        else:
            raise WavError(f"{bits}-bit float PCM unsupported")
    else:
        raise WavError(f"compressed WAV format tag {tag} unsupported")
    frames = len(x) // n_ch
    return rate, x[: frames * n_ch].reshape(frames, n_ch)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """float array (frames,) or (frames, channels) in [-1, 1] → WAV bytes
    (integer PCM at ``bits`` ∈ {8, 16, 24, 32}, or ``bits=-32`` for
    float32)."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n_ch = a.shape[1]
    a = np.clip(a, -1.0, 1.0)
    if bits == -32:
        raw = a.astype("<f4").tobytes()
        tag, nbits = _IEEE_FLOAT, 32
    elif bits == 8:
        raw = np.clip(np.round(a * 128.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
        tag, nbits = _PCM, 8
    elif bits == 16:
        raw = np.clip(np.round(a * 32768.0), -32768, 32767).astype("<i2").tobytes()
        tag, nbits = _PCM, 16
    elif bits == 24:
        v = np.clip(np.round(a * float(1 << 23)), -(1 << 23), (1 << 23) - 1).astype(
            np.int32
        )
        v = np.where(v < 0, v + (1 << 24), v)
        flat = v.reshape(-1)
        b = np.empty((len(flat), 3), dtype=np.uint8)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        raw = b.tobytes()
        tag, nbits = _PCM, 24
    elif bits == 32:
        v = np.clip(np.round(a * float(1 << 31)), -(1 << 31), (1 << 31) - 1)
        raw = v.astype("<i4").tobytes()
        tag, nbits = _PCM, 32
    else:
        raise WavError(f"unsupported encode depth {bits}")
    block = n_ch * nbits // 8
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(raw))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, tag, n_ch, rate, rate * block, block, nbits)
        + b"data"
        + struct.pack("<I", len(raw))
    )
    return hdr + raw
