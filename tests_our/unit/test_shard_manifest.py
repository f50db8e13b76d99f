"""shard_manifest: lineage spans + order-insensitive content digests."""

import hashlib

import pytest

from pyspark.sql import functions as F

from doc_parser_spark.operators import text_analysis as ta


def _docs(spark, rows, parts=1):
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(
        parts
    )


@pytest.mark.unit
def test_manifest_matches_hand_computation(spark):
    rows = [(i, " ".join(["w"] * 10)) for i in range(10)]  # 10 tokens each
    out = {
        r["shard_id"]: r.asDict()
        for r in ta.shard_manifest(
            _docs(spark, rows), budget_tokens=30, num_partitions=4
        ).collect()
    }
    # offsets 0,10,20 -> shard 0; 30..50 -> shard 1; 60..80 -> 2; 90 -> 3
    assert sorted(out) == [0, 1, 2, 3]
    assert (out[0]["first_doc_id"], out[0]["last_doc_id"]) == (0, 2)
    assert (out[1]["first_doc_id"], out[1]["last_doc_id"]) == (3, 5)
    assert out[3]["n_docs"] == 1 and out[3]["token_start"] == 90
    assert all(r["total_tokens"] == r["n_docs"] * 10 for r in out.values())

    digests = sorted(
        hashlib.md5(f"{i}:{t}".encode()).hexdigest() for i, (_, t) in
        zip(range(3), rows[:3])
    )
    expect = hashlib.sha256("".join(digests).encode()).hexdigest()
    assert out[0]["content_sha256"] == expect


@pytest.mark.unit
def test_digest_is_partitioning_invariant(spark):
    """The exactly-once property: a restarted run that reassembles the
    same shards from a different partitioning/arrival order must emit
    byte-identical manifest rows."""
    rows = [(i, f"doc {i} body " + "tok " * (i % 7)) for i in range(40)]
    a = ta.shard_manifest(_docs(spark, rows, parts=1), budget_tokens=25,
                          num_partitions=2).collect()
    shuffled = _docs(spark, rows, parts=7).orderBy(F.rand(seed=3))
    b = ta.shard_manifest(shuffled, budget_tokens=25,
                          num_partitions=5).collect()
    key = lambda r: r["shard_id"]
    assert sorted((r.asDict() for r in a), key=key) == sorted(
        (r.asDict() for r in b), key=key
    )


@pytest.mark.unit
def test_null_text_counts_zero_tokens(spark):
    rows = [(1, None), (2, "a b c")]
    out = ta.shard_manifest(_docs(spark, rows), budget_tokens=100).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n_docs"] == 2 and r["total_tokens"] == 3
