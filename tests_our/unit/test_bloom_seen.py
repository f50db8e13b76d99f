"""Bloom-filter membership dedup: no false negatives ever; false
positives exactly as the md5-derived bit positions dictate (the whole
output is precomputed in Python and asserted row-for-row)."""

import hashlib

import pytest


def _positions(text: str, m: int, k: int):
    key = hashlib.md5(text.encode()).hexdigest()
    return [
        int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:12], 16) % m
        for j in range(k)
    ]


def test_bloom_seen_matches_python_reference(spark):
    from doc_parser_spark.operators.dedup import bloom_seen

    m, k = 256, 2
    seen_texts = [f"seen document number {i} body" for i in range(50)]
    new_rows = [(i, t) for i, t in enumerate(seen_texts)] + [
        (100 + i, f"fresh document number {i} body") for i in range(200)
    ]
    seen = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(seen_texts)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    bits = set()
    for t in seen_texts:
        bits.update(_positions(t, m, k))
    expected = {}
    seen_set = set(seen_texts)
    for i, t in new_rows:
        expected[i] = (
            all(p in bits for p in _positions(t, m, k)),
            t in seen_set,
        )

    out = {r["doc_id"]: (r["bloom_seen"], r["exact_seen"])
           for r in bloom_seen(new, seen, m_bits=m, k=k).collect()}
    assert out == expected
    # no false negatives: exact_seen -> bloom_seen
    assert all(b for b, e in out.values() if e)
    # this fixture (50*2 bits in 256) must exhibit observable false positives
    assert sum(1 for b, e in out.values() if b and not e) > 0


def test_bloom_seen_validates_args(spark):
    from doc_parser_spark.operators.dedup import bloom_seen

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bloom_seen(df, df, m_bits=0)
    with pytest.raises(ValueError):
        bloom_seen(df, df, k=0)


def test_bloom_and_exact_agree_on_null_text(spark):
    """NULL text keys as '' on BOTH paths — previously every NULL-text
    doc shared one bit set while the exact join could never match."""
    from doc_parser_spark.operators.dedup import bloom_seen

    seen = spark.createDataFrame(
        [(1, None), (2, "real text")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, None), (11, ""), (12, "fresh")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bloom_seen(new, seen).collect()}
    # NULL and '' key identically; both were 'seen' (doc 1 had NULL->'' )
    assert out[10]["exact_seen"] and out[10]["bloom_seen"]
    assert out[11]["exact_seen"] and out[11]["bloom_seen"]
    assert not out[12]["exact_seen"]


def test_lsh_rejects_nonpositive_hashes(spark):
    import pytest

    from doc_parser_spark.operators.dedup import lsh_candidate_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lsh_candidate_pairs(docs, n_hashes=0, n_bands=4)
