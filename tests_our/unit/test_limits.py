"""Decompression bounds (core/limits.py): deflate bombs over untrusted
crawl payloads must fail fast with a bounded allocation, per-document —
never inflate-then-check (which OOMs the executor before the check)."""

import io
import struct
import zipfile
import zlib

import pytest

from doc_parser_spark.core import png
from doc_parser_spark.core.limits import (
    DEFAULT_MAX_BYTES,
    BombError,
    BoundedZipFile,
    gunzip_members,
    inflate_bounded,
)


def test_inflate_bounded_roundtrip():
    data = b"hello world " * 1000
    assert inflate_bounded(zlib.compress(data), len(data)) == data


def test_inflate_bounded_caps_bomb():
    bomb = zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)  # ~64 KB compressed
    assert len(bomb) < 100_000
    with pytest.raises(BombError):
        inflate_bounded(bomb, 1024 * 1024)


def test_inflate_bounded_raw_deflate():
    data = b"abc" * 500
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    raw = comp.compress(data) + comp.flush()
    assert inflate_bounded(raw, len(data), wbits=-15) == data


def test_inflate_bounded_truncated_returns_partial():
    data = b"x" * 10000
    comp = zlib.compress(data)
    out = inflate_bounded(comp[: len(comp) // 2], len(data))
    assert len(out) < len(data)  # partial, no exception


def test_gunzip_members_inflates_all():
    import gzip

    blob = gzip.compress(b"first|") + gzip.compress(b"second")
    assert gunzip_members(blob) == b"first|second"
    # single member unchanged
    assert gunzip_members(gzip.compress(b"only")) == b"only"


def test_gunzip_members_cumulative_cap():
    import gzip

    member = gzip.compress(b"\x00" * (8 * 1024 * 1024), 9)
    with pytest.raises(BombError):
        gunzip_members(member * 4, cap=20 * 1024 * 1024)


def test_bounded_zipfile_rejects_oversized_member():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("big.xml", b"\x00" * (DEFAULT_MAX_BYTES + 1))
        zf.writestr("ok.xml", b"<a/>")
    zf = BoundedZipFile(io.BytesIO(buf.getvalue()))
    assert zf.read("ok.xml") == b"<a/>"
    with pytest.raises(BombError):
        zf.read("big.xml")


def test_zip_bomb_docx_isolated_per_document():
    # a zip-bombed "docx" must come back status=failure, not OOM the kernel
    from doc_parser_spark.operators.extract import process_document

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("word/document.xml", b"\x00" * (DEFAULT_MAX_BYTES + 1))
    rec = process_document("u", buf.getvalue())
    assert rec["status"] == "failure"


def _png_with_idat(idat: bytes, w: int, h: int) -> bytes:
    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        png.SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_png_idat_bomb_rejected():
    # declared 4x4 RGB, but IDAT inflates to 32 MB: must raise, not allocate
    bomb = zlib.compress(b"\x00" * (32 * 1024 * 1024), 9)
    with pytest.raises(png.PngError):
        png.decode_png(_png_with_idat(bomb, 4, 4))


def test_png_implausible_dimensions_rejected():
    tiny = zlib.compress(b"\x00" * 16)
    with pytest.raises(png.PngError):
        png.decode_png(_png_with_idat(tiny, 1 << 16, 1 << 16))


def test_png_valid_roundtrip_still_works():
    import numpy as np

    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert (png.decode_png(png.encode_png(arr)) == arr).all()


def test_hwp_section_bomb_rejected():
    from doc_parser_spark.core.hwp_backend import HwpError
    from doc_parser_spark.sources.office_fixtures import make_hwp

    # sanity: fixture path still works after the bounded-inflate change
    from doc_parser_spark.core.hwp_backend import extract_hwp

    assert extract_hwp(make_hwp(1)) is not None

    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    bomb = comp.compress(b"\x00" * (DEFAULT_MAX_BYTES * 2)) + comp.flush()
    with pytest.raises((HwpError, BombError)):
        inflate_bounded(bomb, DEFAULT_MAX_BYTES, wbits=-15)


def test_banded_hamming_caps_bind_at_hash_granularity(spark):
    """The rewritten engine caps viral identical-signature GROUPS and
    band buckets of DISTINCT hashes — pin both binding behaviors (the
    sf0.01 oracles never exercise them: hashes there are near-distinct)."""
    from doc_parser_spark.operators.dedup import banded_hamming_pairs

    # exact group {1,2}, near pair hamming=1, plus a viral group of 10
    rows = [(1, 0b1010), (2, 0b1010), (3, 0b1011)]
    rows += [(100 + i, 0b111100001111) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, h long")
    out = sorted(
        (r["doc_id_a"], r["doc_id_b"], r["hamming"])
        for r in banded_hamming_pairs(
            df, "h", bits=32, bands=4, max_hamming=3, max_bucket=5
        ).collect()
    )
    # the 10-member group exceeds max_bucket=5: dropped whole (its 45
    # internal pairs AND any cross pairs), while small groups survive
    assert out == [(1, 2, 0), (1, 3, 1), (2, 3, 1)]


def test_simhash_neardup_param_validation(spark):
    from doc_parser_spark.operators import dedup

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole|max_hamming"):
        dedup.simhash_neardup_pairs(df, bits=32, bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="divisible"):
        dedup.simhash_neardup_pairs(df, bits=32, bands=5, max_hamming=3)


def test_line_dedup_null_text(spark):
    from doc_parser_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, None), (2, "a\nb"), (3, "a\nc")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.line_dedup(df).collect()}
    assert rows[1].n_lines_dropped == 0  # was -1 (size(NULL) quirk)
    assert rows[1].n_lines_kept == 0 and rows[1].clean_text == ""
    assert rows[2].n_lines_kept == 1 and rows[2].clean_text == "b"
