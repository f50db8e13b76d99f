"""Decompression bounds for untrusted crawl payloads.

Every inflate over crawl bytes must be output-capped *while inflating*:
a ~1 KB deflate bomb can expand to tens of GB, and a post-hoc size check
(``len(zlib.decompress(x)) > cap``) OOM-kills the executor before the
check runs — defeating the per-document failure-isolation contract the
transport-gzip path (operators/extract.py) was hardened for.  Reference
behaviour being reproduced: the max_file_size validity gate at
docling/datamodel/document.py:133-169.
"""

from __future__ import annotations

import zipfile
import zlib

# max_file_size gate (docling/datamodel/document.py:133-169)
DEFAULT_MAX_BYTES = 20 * 1024 * 1024

# reject absurd declared raster dimensions before allocating
MAX_PIXELS = 64_000_000


class BombError(ValueError):
    """Inflated output exceeded its declared/allowed bound."""


def _inflate_into(d, data: bytes, out: bytearray, cap: int) -> None:
    """Drive one decompressobj over ``data`` into ``out``, enforcing the
    cumulative ``cap`` while inflating (shared by every bounded path —
    the cap arithmetic lives exactly once)."""
    buf = data
    while True:
        out += d.decompress(buf, cap + 1 - len(out))
        if len(out) > cap:
            raise BombError(f"inflated data exceeds {cap} bytes")
        if d.eof or not d.unconsumed_tail:
            break
        buf = d.unconsumed_tail


def inflate_bounded(
    data: bytes, cap: int, wbits: int = 15, require_end: bool = False
) -> bytes:
    """zlib-inflate with a hard output cap enforced *during* inflation.

    Streams through ``zlib.decompressobj`` so at most ``cap`` bytes are
    ever materialized; raises :class:`BombError` the moment output would
    exceed ``cap``.  Truncated input returns the bytes inflated so far
    unless ``require_end`` is set, in which case a stream that does not
    reach its deflate end-marker raises ``zlib.error`` — callers whose
    format declares no expected length (e.g. HWP section streams) use
    this so silent truncation cannot masquerade as success."""
    d = zlib.decompressobj(wbits)
    out = bytearray()
    _inflate_into(d, data, out, cap)
    if require_end and not d.eof:
        raise zlib.error("truncated deflate stream")
    return bytes(out)


def gunzip_members(data: bytes, cap: int = DEFAULT_MAX_BYTES) -> bytes:
    """Inflate ALL gzip members, cumulatively capped at ``cap`` bytes.

    Standard ``.warc.gz`` files are one gzip member per record; a
    one-shot ``zlib.decompress`` yields only the FIRST member and
    silently drops the rest.  A truncated trailing member stops the walk
    with what inflated cleanly (record-level parsers handle short data).
    """
    out = bytearray()
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(47)
        _inflate_into(d, data, out, cap)
        if not d.eof:
            break  # truncated final member
        data = d.unused_data
    return bytes(out)


class BoundedZipFile(zipfile.ZipFile):
    """ZipFile whose ``read`` refuses members declared over the cap.

    stdlib zipfile never inflates past a member's declared
    ``file_size`` (ZipExtFile tracks the remaining budget), so the
    declared size IS the output bound — checking it up front makes every
    member read bomb-safe without streaming wrappers."""

    max_member_bytes = DEFAULT_MAX_BYTES

    def read(self, name, pwd=None):  # noqa: A003 - zipfile API
        info = (
            name
            if isinstance(name, zipfile.ZipInfo)
            else self.getinfo(name)
        )
        if info.file_size > self.max_member_bytes:
            raise BombError(
                f"zip member {info.filename!r} declares "
                f"{info.file_size} bytes > cap {self.max_member_bytes}"
            )
        return super().read(name, pwd)
