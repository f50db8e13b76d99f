

def test_pack_shards_partition_invariant(spark):
    """The shard assignment is a global contract — it must not depend on
    how many partitions computed it (the distributed prefix sum has to
    equal the sequential one at every parallelism level)."""
    from doc_parser_spark.operators.text_analysis import pack_shards

    rows = [(i, " ".join(["tok"] * (7 + (i * 13) % 50))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: (r["token_offset"], r["shard_id"])
         for r in pack_shards(docs, budget_tokens=500, num_partitions=1).collect()}
    b = {r["doc_id"]: (r["token_offset"], r["shard_id"])
         for r in pack_shards(docs, budget_tokens=500, num_partitions=13).collect()}
    assert a == b
    # sequential reference
    acc = 0
    for i in range(200):
        n = 7 + (i * 13) % 50
        assert a[i] == (acc, acc // 500)
        acc += n


def test_gopher_filter_rules(spark):
    from doc_parser_spark.operators.text_analysis import gopher_filter

    good = ("the quick brown fox jumps with energy and grace that nobody "
            "can have doubted of late ") * 5  # 80 words, plenty stopwords
    soup = "key value " * 40  # no stopwords
    short = "the of and"  # < 50 words
    symbols = ("the of and that have with be to " + "### " * 30 + "word " * 50)
    docs = spark.createDataFrame(
        [(0, good), (1, soup), (2, short), (3, symbols)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_filter(docs).collect()}
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["n_stopwords_present"] == 0
    assert out[2]["keep"] is False and out[2]["n_words"] == 3
    assert out[3]["keep"] is False and out[3]["symbol_word_ratio"] > 0.1
