"""Minimal RIFF/AVI container walk for MJPEG frame extraction, plus a
builder for test fixtures.

AVI is the one mainstream video container whose dominant intra-only codec
(MJPEG) this engine can decode end-to-end with its own pure-Python JPEG
codec (``core/jpeg.py``) — so Motion-JPEG AVIs are a *real* path for
``operators/multimodal.sample_video_frames``; inter-frame codecs
(H.264 etc.) remain a marked codec boundary.

Format: ``RIFF <size> AVI `` followed by chunks; ``LIST`` chunks nest
(``hdrl`` holds the ``avih`` main header whose first dword is
microseconds-per-frame; ``movi`` holds the frame data as ``NNdc``/``NNdb``
chunks, optionally wrapped in ``rec `` LISTs). All sizes little-endian,
chunks padded to even offsets.
"""

from __future__ import annotations

import struct


class AviError(ValueError):
    pass


def _walk_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        body_end = min(body_start + size, end)
        yield fourcc, body_start, body_end
        pos = body_start + size + (size & 1)


def parse_avi(data: bytes):
    """AVI bytes → ``(micro_sec_per_frame, [frame_bytes, ...])`` for
    stream-0 video chunks (``00dc``/``00db``)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not an AVI (RIFF/AVI  header missing)")
    usec_per_frame = None
    frames: list[bytes] = []

    # explicit iterator-stack DFS (identical in-order traversal to the
    # natural recursion, so interleaved 'rec ' lists keep frame order): a
    # hostile container of thousands of nested LIST chunks (12 bytes buys
    # one level) must stay inside the per-row error contract, never blow
    # the Python recursion limit
    stack = [_walk_chunks(data, 12, len(data))]
    while stack:
        try:
            fourcc, b0, b1 = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if fourcc == b"LIST":
            stack.append(_walk_chunks(data, b0 + 4, b1))  # skip list type
        elif fourcc == b"avih" and b1 - b0 >= 4:
            (usec_per_frame,) = struct.unpack("<I", data[b0 : b0 + 4])
        elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
            if fourcc[:2] == b"00" and b1 > b0:
                frames.append(data[b0:b1])
    if usec_per_frame is None or usec_per_frame == 0:
        usec_per_frame = 33333  # spec default ~30fps when header absent
    if not frames:
        raise AviError("no stream-0 video frames")
    return usec_per_frame, frames


def build_avi(frames: list[bytes], fps: float = 10.0) -> bytes:
    """Frame payloads (e.g. JPEG bytes) → minimal MJPEG AVI fixture."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<IIIII", int(1e6 / fps), 0, 0, 0, len(frames)) + b"\x00" * 36
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
