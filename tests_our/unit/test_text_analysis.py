from pyspark.sql import Row, functions as F




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


def test_repetition_filter_signals(spark):
    """Hand-computed Gopher repetition signals on crafted docs."""
    from doc_parser_spark.operators.text_analysis import repetition_filter

    # doc 0: distinct lines/words — every dup signal 0, top-gram mass small
    # relative to doc length, keep
    clean = "\n".join(
        " ".join(f"w{i:02d}" for i in range(r * 10, r * 10 + 10)) for r in range(4)
    )
    # doc 1: "spam spam" line repeated 3x of 4 lines
    liney = "spam spam\nspam spam\nspam spam\nunique line here okay"
    # doc 2: one 10-gram (and everything under it) repeated — dup-gram heavy
    gramy = ("one two three four five six seven eight nine ten " * 3).strip()
    # doc 3: empty-ish (sentinel path: no words, no lines)
    blank = "   "
    docs = spark.createDataFrame(
        [(0, clean), (1, liney), (2, gramy), (3, blank)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in repetition_filter(docs).collect()}
    assert set(out) == {0, 1, 2, 3}

    r0 = out[0]
    assert r0["dup_line_frac"] == 0.0 and r0["dup_line_char_frac"] == 0.0
    assert r0["dup_5gram_char_frac"] == 0.0 and r0["dup_10gram_char_frac"] == 0.0
    assert r0["keep"] is True

    r1 = out[1]
    # 3 of 4 lines are the duplicate "spam spam" (9 chars each); line_chars =
    # 9*3 + len("unique line here okay")=21 -> 48
    assert r1["dup_line_frac"] == 0.75
    assert r1["dup_line_char_frac"] == 27 / 48
    assert r1["keep"] is False

    r2 = out[2]
    # text = 30 words, every 10-gram occurs >1 time across the 3 repeats
    assert r2["dup_10gram_char_frac"] > 0.10
    assert r2["dup_5gram_char_frac"] > 0.15
    assert r2["top_2gram_char_frac"] > 0.20
    assert r2["keep"] is False

    r3 = out[3]  # sentinel row: all-zero signals, keep=True
    assert r3["dup_line_frac"] == 0.0 and r3["top_4gram_char_frac"] == 0.0
    assert r3["keep"] is True


def test_hash_sample_deterministic_and_partition_invariant(spark):
    from doc_parser_spark.operators.text_analysis import hash_sample

    docs = spark.createDataFrame([(i, "x") for i in range(1000)], "doc_id long, text string")
    a = sorted(r["doc_id"] for r in hash_sample(docs, rate=0.10).collect())
    b = sorted(r["doc_id"] for r in hash_sample(docs.repartition(17), rate=0.10).collect())
    assert a == b and len(a) > 0
    # ~10% of 1000 with a uniform 32-bit key; generous 3-sigma-ish bounds
    assert 60 <= len(a) <= 140
    # nested: a lower rate is a strict subset (same key, smaller threshold)
    c = sorted(r["doc_id"] for r in hash_sample(docs, rate=0.05).collect())
    assert set(c) <= set(a)


def test_stratified_sample_per_stratum(spark):
    from doc_parser_spark.operators.text_analysis import stratified_sample

    rows = [(i, "x", ["en", "de", "es"][i % 3]) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = stratified_sample(docs, per_stratum=7).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "de", "es"}
    for lang, rs in by_lang.items():
        assert len(rs) == 7
        assert sorted(r["rk"] for r in rs) == list(range(1, 8))
        # ranked by hash key ascending
        ks = [r["sample_key"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert ks == sorted(ks)


def test_lm_fit_score_hand_computed(spark):
    from doc_parser_spark.operators.text_analysis import lm_fit_score

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "z")], "doc_id long, text string"
    )
    # corpus bigram counts: (a,b):3 (b,a):1 (b,c):1; histories a:3 b:2; V=4
    # P(ab)=(3+1)/(3+4)=4/7  P(ba)=(1+1)/(2+4)=2/6  P(bc)=(1+1)/(2+4)=2/6
    out = {r["doc_id"]: r for r in lm_fit_score(docs).collect()}
    p_ab = int(1e12 * (4 / 7))
    p_b = int(1e12 * (2 / 6))
    assert out[0]["n_bigrams"] == 3
    import math
    assert out[0]["lm_fit"] == math.floor(1e6 * (((2 * p_ab + p_b) / 1e12) / 3)) / 1e6
    assert out[1]["n_bigrams"] == 2
    assert out[1]["lm_fit"] == math.floor(1e6 * (((p_ab + p_b) / 1e12) / 2)) / 1e6
    assert out[2]["n_bigrams"] == 0 and out[2]["lm_fit"] == 0.0


def test_top_terms_linear_tfidf(spark):
    from doc_parser_spark.operators.text_analysis import top_terms

    rows = [
        (1, "en", "apple apple banana"),
        (2, "en", "apple cherry"),
        (3, "de", "banana banana banana"),
        (4, "de", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = top_terms(df, k=2).collect()
    by = {(r["lang"], r["term"]): r for r in out}
    # en/apple: tf=3, df=2, N=4 -> 1e6*3*4 // 2
    assert by[("en", "apple")]["score"] == 1_000_000 * 3 * 4 // 2
    assert by[("en", "apple")]["rnk"] == 1
    # banana: df=2 (docs 1 and 3); de tf=3 -> score 6e6
    assert by[("de", "banana")]["score"] == 1_000_000 * 3 * 4 // 2
    # k=2 cap per language
    assert max(r["rnk"] for r in out) <= 2
    # deterministic tie-break: same score -> lexicographic term
    en = sorted(
        (r for r in out if r["lang"] == "en"), key=lambda r: r["rnk"]
    )
    assert [r["term"] for r in en] == ["apple", "banana"] or [
        r["term"] for r in en
    ] == ["apple", "cherry"]


def test_dup_spans_cross_doc_only(spark):
    from doc_parser_spark.operators.text_analysis import dup_spans

    ten = "a b c d e f g h i j"
    rows = [
        (1, ten + " unique tail one"),       # shares the 10-gram with 2
        (2, ten + " different ending two"),  # shares with 1
        (3, "totally different words " * 5), # self-repeats, no cross-doc dup
        (4, "short doc"),                    # < 10 words -> 0 spans
        (5, None),                           # NULL text -> 0 spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_spans(df).collect()}
    assert len(out) == 5
    assert out[1]["n_dup_spans"] >= 1 and out[2]["n_dup_spans"] >= 1
    # within-doc repetition is NOT cross-doc duplication
    assert out[3]["n_dup_spans"] == 0 and out[3]["n_spans"] > 0
    assert out[4] == out[4].__class__(doc_id=4, n_spans=0, n_dup_spans=0, dup_span_frac=0.0) or (
        out[4]["n_spans"] == 0 and out[4]["dup_span_frac"] == 0.0
    )
    assert out[5]["n_spans"] == 0 and out[5]["n_dup_spans"] == 0


def test_dsir_weights_hand_computed(spark):
    """DSIR contract on a collision-free toy corpus: the ratio model is
    exactly (ct+1)(Nr+B) // ((cr+1)(Nt+B)) per gram occurrence, target
    grams score above 1, off-target grams below, short docs get 0."""
    import hashlib
    import math

    from doc_parser_spark.operators.text_analysis import dsir_weights

    docs = spark.createDataFrame(
        [
            (0, "a b", "en"),      # target; gram "a b"
            (1, "a b", "en"),      # target; gram "a b"
            (2, "x y", "de"),      # raw-only gram "x y"
            (3, "solo", "de"),     # <2 words -> no grams
        ],
        "doc_id long, text string, lang string",
    )
    B = 1024
    out = {r["doc_id"]: r for r in dsir_weights(docs, n_buckets=B).collect()}

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    assert bucket("a b") != bucket("x y")  # no collision in the fixture
    # counts: "a b" cr=2 ct=2; "x y" cr=1 ct=0; Nr=3 Nt=2
    w_ab = (1000000 * 3 * (3 + B)) // (3 * (2 + B))
    w_xy = (1000000 * 1 * (3 + B)) // (2 * (2 + B))
    assert out[0]["n_grams"] == 1
    assert out[0]["imp_weight"] == math.floor(1e6 * (w_ab / 1e6)) / 1e6
    assert out[0]["imp_weight"] > 1.0  # target-heavy gram upweighted
    assert out[2]["imp_weight"] == math.floor(1e6 * (w_xy / 1e6)) / 1e6
    assert out[2]["imp_weight"] < 1.0  # target-absent gram downweighted
    assert out[3]["n_grams"] == 0 and out[3]["imp_weight"] == 0.0
    assert len(out) == 4  # every doc present (left join)


def test_dsir_weights_custom_target_pred(spark):
    """target_pred is an arbitrary SQL predicate, not hardwired to lang."""
    from doc_parser_spark.operators.text_analysis import dsir_weights

    docs = spark.createDataFrame(
        [(0, "p q", "xx"), (1, "p q", "xx"), (2, "r s", "xx")],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r["imp_weight"]
        for r in dsir_weights(docs, target_pred="doc_id < 2").collect()
    }
    assert out[0] == out[1] > 1.0 > out[2]


def test_perplexity_buckets_terciles(spark):
    """Per-language terciles: equal-size buckets when divisible, and the
    head bucket holds the highest lm_fit values (CCNet §4.3 contract)."""
    from doc_parser_spark.operators.text_analysis import perplexity_buckets

    rows = []
    # en: 6 docs of varying repetitiveness; de: 3 docs
    for i in range(6):
        body = " ".join(["alpha beta"] * (i + 2)) + f" tail{i} end{i}"
        rows.append((i, body, "en"))
    for i in range(3):
        rows.append((10 + i, " ".join(["der satz"] * (i + 2)) + f" w{i}", "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(docs).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert sorted(r["ppl_bucket"] for r in by_lang["en"]) == [
        "head", "head", "middle", "middle", "tail", "tail"]
    assert sorted(r["ppl_bucket"] for r in by_lang["de"]) == [
        "head", "middle", "tail"]
    for lang, rs in by_lang.items():
        head = [r["lm_fit"] for r in rs if r["ppl_bucket"] == "head"]
        mid = [r["lm_fit"] for r in rs if r["ppl_bucket"] == "middle"]
        tail = [r["lm_fit"] for r in rs if r["ppl_bucket"] == "tail"]
        assert min(head) >= max(mid) >= min(mid) >= max(tail)


def test_domain_mix_weights_hand_computed(spark):
    import math

    from doc_parser_spark.operators.text_analysis import domain_mix_weights

    docs = spark.createDataFrame(
        [(0, " ".join(["t"] * 90), "big"), (1, " ".join(["t"] * 10), "small")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in domain_mix_weights(docs).collect()}
    wi = {s: math.floor(1e9 * math.sqrt(n / 100.0)) for s, n in
          (("big", 90), ("small", 10))}
    tot = sum(wi.values())
    for s, n in (("big", 90), ("small", 10)):
        assert out[s]["n_docs"] == 1 and out[s]["n_tokens"] == n
        assert out[s]["mix_weight"] == math.floor(1e6 * wi[s] / tot) / 1e6
        assert out[s]["sample_quota"] == (100_000 * wi[s]) // tot
    # alpha=0.5 up-weights the small domain vs its raw share
    assert out["small"]["mix_weight"] > 0.1


def test_linear_classifier_argmax_and_tiebreak(spark):
    import hashlib

    from doc_parser_spark.operators.text_analysis import linear_classifier

    n_buckets = 64
    bkt = {w: int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % n_buckets
           for w in ("aa", "bb")}
    assert bkt["aa"] != bkt["bb"]  # fixture sanity
    weights = spark.createDataFrame(
        [
            (bkt["aa"], "clean", 5), (bkt["aa"], "spam", 1),
            (bkt["bb"], "clean", -2), (bkt["bb"], "spam", 9),
        ],
        "bucket long, cls string, wgt long",
    )
    docs = spark.createDataFrame(
        [(0, "aa aa bb"), (1, ""), (2, "bb")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           linear_classifier(docs, weights, n_buckets=n_buckets).collect()}
    # doc0: clean = 2*5 - 2 = 8, spam = 2*1 + 9 = 11
    assert (out[0]["label"], out[0]["score"], out[0]["margin"]) == ("spam", 11, 3)
    # empty doc: no features -> sentinel row
    assert (out[1]["label"], out[1]["score"], out[1]["margin"]) == ("", 0, 0)
    assert (out[2]["label"], out[2]["score"], out[2]["margin"]) == ("spam", 9, 11)
    # tie -> lexicographically smallest class, margin 0
    tie = spark.createDataFrame(
        [(bkt["aa"], "clean", 5), (bkt["aa"], "spam", 5)],
        "bucket long, cls string, wgt long",
    )
    r = linear_classifier(docs.where("doc_id = 0"), tie, n_buckets=n_buckets).collect()[0]
    # doc0 has no bb weights in this table: both classes score 2*5 = 10
    assert (r["label"], r["margin"]) == ("clean", 0)


def test_corpus_profile_nulls_and_stats(spark):
    from doc_parser_spark.operators.text_analysis import corpus_profile

    df = spark.createDataFrame(
        [(1, "ab", "en"), (2, None, "en"), (3, "abcd", None)],
        "doc_id long, text string, lang string",
    )
    out = {r["column"]: r for r in corpus_profile(df).collect()}
    assert set(out) == {"doc_id", "text", "lang"}
    assert all(r["n_rows"] == 3 for r in out.values())
    t = out["text"]
    assert (t["n_null"], t["n_distinct"]) == (1, 2)
    assert (t["min_value"], t["max_value"]) == ("ab", "abcd")
    assert t["avg_len"] == 3.0  # (2 + 4) / 2 non-null
    d = out["doc_id"]
    assert (d["n_null"], d["n_distinct"], d["min_value"], d["max_value"]) == (
        0, 3, "1", "3")
    assert out["lang"]["n_null"] == 1


def test_null_text_behaves_as_empty_document(spark):
    """Extraction failure rows carry text=NULL; every operator must treat
    them as the empty document, never as size(NULL) = -1 poison."""
    from doc_parser_spark.operators.text_analysis import (
        fingerprint,
        lang_id,
        pack_shards,
        repetition_filter,
        token_stats,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "the cat and the dog is of to")],
        "doc_id long, text string",
    )
    ts = {r["doc_id"]: r for r in token_stats(docs).collect()}
    # empty/NULL doc counts ZERO tokens (split('') yields [''] — the
    # phantom token is filtered; pack_shards agrees on 0)
    assert ts[1]["n_tokens"] == 0 and ts[1]["n_chars_actual"] == 0
    li = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert li[1] == "und" and li[3] == "en"
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    assert fp[1] == fp[2] and fp[1] is not None  # empty-doc identity, not NULL
    # the sentinel design must keep null-text docs in the output
    assert {r["doc_id"] for r in repetition_filter(docs).collect()} == {1, 2, 3}
    assert {r["doc_id"] for r in pack_shards(docs).collect()} == {1, 2, 3}


def test_parameter_validation(spark):
    import pytest

    from doc_parser_spark.operators.dedup import lsh_candidate_pairs
    from doc_parser_spark.operators.text_analysis import pack_shards

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="budget_tokens"):
        pack_shards(docs, budget_tokens=0)
    with pytest.raises(ValueError, match="n_hashes"):
        lsh_candidate_pairs(docs, n_hashes=10, n_bands=4)


def test_ivf_train_small_and_empty_tables(spark):
    import pytest

    from doc_parser_spark.operators.similarity import ivf_train

    few = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    cents = ivf_train(few, k=8, iters=2)  # fewer vectors than cells
    assert len(cents) == 3 and all(len(c) == 2 for c in cents)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        ivf_train(empty, k=4)


def test_c4_clean_line_and_page_rules(spark):
    from doc_parser_spark.operators.text_analysis import c4_clean

    rows = [
        # 3 kept sentences -> keep
        (1, "Good long sentence with many words here.\n"
            "short line.\n"                       # <5 words: dropped
            "No terminal punctuation in this one\n"  # dropped
            "Another proper sentence with enough words too!\n"
            "A third proper sentence with enough words here?"),
        # javascript line dropped; lorem ipsum kills the page
        (2, "Enable javascript to view this page properly now.\n"
            "Lorem ipsum dolor sit amet consectetur adipiscing elit today.\n"
            "Second proper sentence with plenty of words inside.\n"
            "Third proper sentence with plenty of words inside."),
        # curly brace kills the page even when lines pass
        (3, "function f() { return 1; } is mentioned in this sentence.\n"
            "Second full sentence with plenty of words inside.\n"
            "Third full sentence with plenty of words inside."),
        (4, None),  # NULL text -> zero counts, keep=False
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in c4_clean(docs).collect()}

    assert out[1]["n_lines_kept"] == 3 and out[1]["n_lines_dropped"] == 2
    assert out[1]["keep"] is True
    assert "short line." not in out[1]["clean_text"]

    # the javascript line is gone but page-kill comes from lorem ipsum
    assert "javascript" not in out[2]["clean_text"]
    assert out[2]["n_lines_kept"] == 3 and out[2]["keep"] is False

    assert out[3]["n_lines_kept"] == 3 and out[3]["keep"] is False

    assert out[4] == {"doc_id": 4, "clean_text": "", "n_lines_total": 0,
                      "n_lines_kept": 0, "n_lines_dropped": 0,
                      "n_sentences": 0, "keep": False}


def test_c4_clean_terminal_quote_counts(spark):
    from doc_parser_spark.operators.text_analysis import c4_clean

    # closing-quote terminal (C4 keeps quoted dialogue lines)
    rows = [(1, 'He said the words were "good enough for anyone."\n'
                "A second proper sentence with enough words here.\n"
                "A third proper sentence with enough words here.")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    row = c4_clean(docs).collect()[0]
    assert row["n_lines_kept"] == 3 and row["keep"] is True


def test_bpe_train_hand_computed(spark):
    from doc_parser_spark.operators.text_analysis import bpe_train

    # Sennrich et al. toy corpus shape: 'low' x3 dominates
    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    rows = bpe_train(docs, 5).orderBy("merge_rank").collect()
    got = [(r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
           for r in rows]
    # (l,o) appears in low/lower/lowest x4 + low = 6; then (lo,w) = 6;
    # (e,w) in new/newer/newest = 3; (n,ew) = 3; ties broken lexicographic
    assert got[:4] == [(1, "l", "o", "lo", 6), (2, "lo", "w", "low", 6),
                       (3, "e", "w", "ew", 3), (4, "n", "ew", "new", 3)]
    assert got[4] == (5, "e", "r", "er", 2)


def test_bpe_merge_application_is_greedy_left_to_right(spark):
    from doc_parser_spark.operators.text_analysis import bpe_train

    # 'aaaa': pairs (a,a) x3 -> merge (a,a). Greedy reapply gives
    # [aa, aa]; rank-2 merge must therefore be (aa, aa), NOT (a, a) again
    # and NOT an overlap artifact like (aa, a)
    docs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    rows = bpe_train(docs, 2).orderBy("merge_rank").collect()
    assert (rows[0]["lhs"], rows[0]["rhs"]) == ("a", "a")
    assert (rows[1]["lhs"], rows[1]["rhs"], rows[1]["merged"]) == ("aa", "aa", "aaaa")


def test_bpe_train_early_stop_and_validation(spark):
    from doc_parser_spark.operators.text_analysis import bpe_train
    import pytest

    # single-char words only: no pairs exist -> 0 merges, empty result
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bpe_train(docs, 3).count() == 0
    with pytest.raises(ValueError):
        bpe_train(docs, 0)


def test_bpe_apply_hand_computed(spark):
    from doc_parser_spark.operators.text_analysis import bpe_apply

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low"),
         (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bpe_apply(docs, 5).collect()}
    # merges: lo, low, ew, new, er. doc1: low x3 = 1 tok each,
    # lower -> [low, er] = 2, lowest -> [low, e, s, t] = 4 -> 9 total
    assert out[1]["n_words"] == 5 and out[1]["n_bpe_tokens"] == 9
    # doc2: new=1, newer -> [new, er]=2, newest -> [new, e, s, t]=4, low=1
    assert out[2]["n_words"] == 4 and out[2]["n_bpe_tokens"] == 8
    assert out[3].asDict() == {"doc_id": 3, "n_words": 0, "n_bpe_tokens": 0,
                               "n_chars_norm": 0, "compression_pct": 0}
    # compression: doc1 norm chars = 24, 9*100 DIV 24 = 37
    assert out[1]["compression_pct"] == 37


def test_script_profile_counts_and_dominant(spark):
    from pyspark.sql import Row

    from doc_parser_spark.operators.text_analysis import script_profile

    rows = [
        Row(doc_id=1, text="hello мир мир"),       # 5 latin, 6 cyrillic
        Row(doc_id=2, text="你好 world"),           # 2 cjk, 5 latin -> latin
        Row(doc_id=3, text="... 123 !!!"),          # no script chars
        Row(doc_id=4, text=None),                   # NULL text -> empty
        Row(doc_id=5, text="γειά"),                 # greek only
    ]
    out = {r.doc_id: r for r in script_profile(spark.createDataFrame(rows)).collect()}
    assert out[1].n_latin == 5 and out[1].n_cyrillic == 6
    assert out[1].dominant_script == "cyrillic"
    # tie-free argmax: latin 5 > cjk 2
    assert out[2].dominant_script == "latin" and out[2].n_cjk == 2
    assert out[3].dominant_script == "none" and out[3].script_ratio == 0.0
    assert out[4].n_chars == 0 and out[4].dominant_script == "none"
    assert out[5].dominant_script == "greek" and out[5].script_ratio == 1.0
    # equal counts tie -> earliest key in SCRIPT_RANGES (latin before greek)
    tie = script_profile(
        spark.createDataFrame([Row(doc_id=9, text="ab γδ")])
    ).collect()[0]
    assert tie.n_latin == tie.n_greek == 2
    assert tie.dominant_script == "latin"


def test_bm25_topk_matches_integer_replica(spark):
    import re

    from pyspark.sql import Row

    from doc_parser_spark.operators.text_analysis import bm25_topk

    docs = {
        1: "data data data table filler words here",
        2: "query table data",
        3: "nothing relevant at all in this one",
        4: "data",
        5: None,
        6: "table table table table query",
    }
    terms = ("data", "table", "query")
    out = bm25_topk(
        spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs.items()]),
        terms=terms,
        k=10,
    ).collect()

    # python replica of the exact BIGINT formula
    tok = {
        i: [t for t in re.split("[^a-z]+", (t or "").lower()) if len(t) >= 2]
        for i, t in docs.items()
    }
    n, s = len(tok), sum(len(w) for w in tok.values())
    df = {t: sum(1 for w in tok.values() if t in w) for t in terms}
    want = {}
    for i, w in tok.items():
        sc, hits = 0, 0
        for t in terms:
            tf = w.count(t)
            if not tf:
                continue
            hits += 1
            idf = (10000 * (2 * n - 2 * df[t] + 1)) // (2 * df[t] + 1)
            sc += idf * 44 * tf * s // (20 * tf * s + 6 * s + 18 * len(w) * n)
        if hits:
            want[i] = (hits, sc)
    got = {r.doc_id: (r.n_terms_hit, r.score) for r in out}
    assert got == want
    # rank follows (score desc, doc_id)
    order = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == [i for i, _ in sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))]


def test_lang_length_quantiles_discrete_exact(spark):
    import math

    from pyspark.sql import Row

    from doc_parser_spark.operators import text_analysis

    lens = {"en": [10, 20, 30, 40, 50, 60, 70, 80, 90, 100], "de": [7, 5, 9]}
    rows = [
        Row(doc_id=i * 100 + j, lang=lang, n_chars=n)
        for i, (lang, ls) in enumerate(sorted(lens.items()))
        for j, n in enumerate(ls)
    ]
    out = {
        r.lang: r
        for r in text_analysis.lang_length_quantiles(
            spark.createDataFrame(rows)
        ).collect()
    }

    def disc(vals, q):
        s = sorted(vals)
        return s[math.ceil(q * len(s)) - 1]

    for lang, ls in lens.items():
        r = out[lang]
        assert r.n_docs == len(ls)
        assert (r.p25, r.p50, r.p75, r.p90) == tuple(
            disc(ls, q) for q in (0.25, 0.5, 0.75, 0.9)
        ), lang


def test_badword_stats_token_exact(spark):
    from doc_parser_spark.operators.text_analysis import badword_stats

    rows = [
        Row(doc_id=1, text="A classic assessment of Scunthorpe grass."),
        Row(doc_id=2, text="Online CASINO! Jackpot, viagra."),
        Row(doc_id=3, text=None),
        Row(doc_id=4, text="casino"),
    ]
    out = {r.doc_id: r for r in
           badword_stats(spark.createDataFrame(rows)).collect()}
    # substring hits ("ass" in classic/assessment/grass) must NOT fire
    assert out[1].n_bad == 0 and out[1].keep
    # punctuation-wrapped + case-insensitive tokens all fire
    assert out[2].n_bad == 3 and not out[2].keep
    assert out[3].n_tokens == 0 and out[3].bad_ppm == 0 and out[3].keep
    assert out[4].bad_ppm == 1000000


def test_normalize_text_rules_and_idempotence(spark):
    from doc_parser_spark.operators.text_analysis import normalize_text

    rows = [
        Row(doc_id=1, text="a\tb  c\x07d\r\n  e  \n\n\n\nf"),
        Row(doc_id=2, text="already clean"),
        Row(doc_id=3, text=None),
    ]
    df = spark.createDataFrame(rows)
    out = {r.doc_id: r for r in normalize_text(df).collect()}
    # controls stripped (BEL, CR), tabs/runs collapsed, line edges
    # trimmed, blank runs capped at one empty line
    assert out[1].norm_text == "a b cd\ne\n\nf"
    assert out[1].changed
    assert not out[2].changed and out[2].norm_text == "already clean"
    assert out[3].norm_text == "" and out[3].n_chars_raw == 0
    # idempotence: normalizing the normalized text is the identity
    again = {
        r.doc_id: r
        for r in normalize_text(
            normalize_text(df).select(
                "doc_id", F.col("norm_text").alias("text"))
        ).collect()
    }
    for i in (1, 2, 3):
        assert again[i].norm_text == out[i].norm_text
        assert not again[i].changed


def test_perceptron_train_learns_separable_corpus(spark):
    from pyspark.sql import functions as F

    from doc_parser_spark.operators.text_analysis import perceptron_train

    # two disjoint vocabularies -> linearly separable in hashed-unigram
    # space (n_buckets large enough that the two vocabularies don't
    # collide into the same bucket with opposite labels)
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "en", "the quick brown fox and the lazy dog"))
        else:
            rows.append((i, "xx", "zug blorp weeva klam dret vonk snee"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    wdf = perceptron_train(docs, label_pred="lang = 'en'", n_buckets=64, epochs=4)
    w = {r["bucket"]: r["weight"] for r in wdf.collect()}
    assert len(w) == 65  # all buckets + bias, deterministic row count

    # score both classes under the learned model: every doc classified right
    def score(text):
        import hashlib

        s = w[64]  # bias
        for t in text.split():
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64
            s += w[b]
        return s

    assert score("the quick brown fox and the lazy dog") > 0
    assert score("zug blorp weeva klam dret vonk snee") < 0


def test_perceptron_train_validates_params(spark):
    import pytest as _pytest

    from doc_parser_spark.operators.text_analysis import perceptron_train

    docs = spark.createDataFrame(
        [(1, "en", "a b")], "doc_id long, lang string, text string"
    )
    with _pytest.raises(ValueError):
        perceptron_train(docs, epochs=0)
    with _pytest.raises(ValueError):
        perceptron_train(docs, n_buckets=0)


def test_cm_sketch_overestimates_and_merges(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from doc_parser_spark.operators.text_analysis import cm_estimate, cm_sketch

    texts = [
        "a a a b c", "b b d e a", "c c c c f", "a e e e e", "g g h h h",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    true = Counter(" ".join(texts).split())
    # width 8 forces collisions -> the overestimate property must bind
    W, D = 8, 3
    sk = cm_sketch(docs, width=W, depth=D)
    terms = spark.createDataFrame(
        [(t,) for t in list(true) + ["absent"]], "term string"
    )
    est = {r["term"]: r["est_count"] for r in cm_estimate(sk, terms, W, D).collect()}
    for t, c in true.items():
        assert est[t] >= c  # CM NEVER underestimates
    assert est["absent"] >= 0
    # total sketch mass per row == total token occurrences
    mass = sk.groupBy("row").agg(F.sum("cnt").alias("m")).collect()
    assert {r["m"] for r in mass} == {sum(true.values())}

    # MERGE property: shard sketches added cell-wise == whole-corpus sketch
    sk1 = cm_sketch(docs.where("doc_id < 2"), width=W, depth=D)
    sk2 = cm_sketch(docs.where("doc_id >= 2"), width=W, depth=D)
    merged = (
        sk1.unionByName(sk2)
        .groupBy("row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, sk.collect()))


def test_cm_sketch_validates_params(spark):
    import pytest as _pytest

    from doc_parser_spark.operators.text_analysis import cm_sketch

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        cm_sketch(docs, width=0)


def test_pack_sequences_contiguous_stream(spark):
    from doc_parser_spark.operators import text_analysis

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i % 4))) for i in range(40)],
        "doc_id long, text string",
    )
    out = text_analysis.pack_sequences(docs, seq_len=10, num_partitions=4)
    rows = sorted(out.collect(), key=lambda r: r.tok_offset)
    # the shuffled stream is gapless: offsets are an exact prefix sum
    acc = 0
    for r in rows:
        assert r.tok_offset == acc
        acc += r.n_tokens
        assert r.seq_first == r.tok_offset // 10
        assert r.seq_last == (r.tok_offset + r.n_tokens - 1) // 10
        assert r.offset_in_seq == r.tok_offset % 10
    # boundary crossing happens (docs of 3-6 tokens over len-10 seqs)
    assert any(r.seq_last > r.seq_first for r in rows)
    # deterministic: same seed -> identical layout; other seed -> not
    again = sorted(
        text_analysis.pack_sequences(docs, seq_len=10, num_partitions=4)
        .collect(), key=lambda r: r.tok_offset)
    assert [r.doc_id for r in again] == [r.doc_id for r in rows]
    other = sorted(
        text_analysis.pack_sequences(
            docs, seq_len=10, seed="ep1", num_partitions=4
        ).collect(), key=lambda r: r.tok_offset)
    assert [r.doc_id for r in other] != [r.doc_id for r in rows]


def test_pack_sequences_empty_and_validation(spark):
    import pytest

    from doc_parser_spark.operators import text_analysis

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in
           text_analysis.pack_sequences(docs, seq_len=5).collect()}
    # empty and NULL text are 0 tokens (not the non-ANSI size()=-1 trap)
    assert (out[1].n_tokens, out[2].n_tokens, out[3].n_tokens) == (0, 0, 2)
    for r in out.values():
        if r.n_tokens == 0:
            assert r.seq_first == r.seq_last == r.tok_offset // 5
    with pytest.raises(ValueError):
        text_analysis.pack_sequences(docs, seq_len=0)


# --- winnowing fingerprints --------------------------------------------------


def _ref_winnow(text, k, w):
    import hashlib
    wd = text.lower().split()
    if len(wd) < k:
        return set(), 0
    grams = [
        hashlib.md5(" ".join(wd[i:i + k]).encode()).hexdigest()
        for i in range(len(wd) - k + 1)
    ]
    if len(grams) <= w:
        return {min(grams)}, len(grams)
    return (
        {min(grams[j:j + w]) for j in range(len(grams) - w + 1)},
        len(grams),
    )


def test_winnow_matches_python_reference(spark):
    import random
    from doc_parser_spark.operators.text_analysis import winnow_fingerprints

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    counts = {}
    for r in winnow_fingerprints(docs, k=5, w=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
        counts[r.doc_id] = (r.n_grams, r.n_fps)
    for doc_id, text in rows:
        ref, n_grams = _ref_winnow(text, 5, 4)
        assert got.get(doc_id, set()) == ref, doc_id
        if ref:
            assert counts[doc_id] == (n_grams, len(ref))


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # the paper's correctness property: a shared run of k+w-1 words
    # forces a shared fingerprint
    from doc_parser_spark.operators.text_analysis import winnow_fingerprints

    run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = 5+4-1
    docs = spark.createDataFrame(
        [
            (1, f"completely different lead in text {run} and a tail"),
            (2, f"{run} with another unrelated continuation entirely"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnow_fingerprints(docs, k=5, w=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "shared k+w-1 run must share a fingerprint"


def test_winnow_short_docs_and_validation(spark):
    import pytest
    from doc_parser_spark.operators.text_analysis import winnow_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "one two three four"),        # < k words: nothing
            (2, "one two three four five"),   # exactly k: one gram
            (3, None),
        ],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(docs, k=5, w=4).collect()
    assert {r.doc_id for r in rows} == {2}
    assert len(rows) == 1 and rows[0].n_grams == 1 and rows[0].n_fps == 1
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, k=0)


def test_winnow_pairs_finds_spliced_boilerplate(spark):
    import pytest
    from doc_parser_spark.operators.text_analysis import winnow_pairs

    run = " ".join(f"tok{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, f"first document lead {run} first tail words here"),
            (2, f"{run} entirely different continuation of the second"),
            (3, "unrelated text with no shared spans at all in it ok"),
        ],
        "doc_id long, text string",
    )
    rows = winnow_pairs(docs, min_shared=1).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(1, 2)]
    r = rows[0]
    assert r.n_shared >= 1 and 0 < r.share_ppm <= 1_000_000
    with pytest.raises(ValueError):
        winnow_pairs(docs, min_shared=0)


def test_winnow_pairs_hot_fingerprint_bucket_is_dropped(spark):
    from doc_parser_spark.operators.text_analysis import winnow_pairs

    # one viral 9-word boilerplate run across 6 docs; max_bucket=3
    # drops its fingerprints entirely -> no pairs survive
    run = " ".join(f"b{i}" for i in range(9))
    docs = spark.createDataFrame(
        [(i, f"{run} unique trailer {i} {i} {i} {i} {i}") for i in range(6)],
        "doc_id long, text string",
    )
    assert winnow_pairs(docs, min_shared=1, max_bucket=3).collect() == []


# --- mojibake / encoding-damage audit ----------------------------------------


def test_mojibake_detects_cp1252_damage(spark):
    from doc_parser_spark.operators.text_analysis import mojibake_stats

    moji = "café menü – done…".encode("utf-8").decode("cp1252")
    docs = spark.createDataFrame(
        [
            (1, f"clean ascii text here"),
            (2, f"damaged: {moji}"),
            (3, "torn � byte � twice"),
            (4, f"both {moji} and �"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in mojibake_stats(docs).collect()}
    assert rows[1].verdict == "clean" and rows[1].n_mojibake == 0
    # é, ü, –, … -> 4 signature hits
    assert rows[2].verdict == "mojibake" and rows[2].n_mojibake == 4
    assert rows[2].moji_ppm > 0
    assert rows[3].verdict == "decode_loss" and rows[3].n_replacement == 2
    # mojibake outranks decode_loss (repairable beats unrepairable)
    assert rows[4].verdict == "mojibake" and rows[4].n_replacement == 1
    assert (rows[5].verdict, rows[5].n_chars) == ("clean", 0)


def test_mojibake_signatures_are_true_cp1252_images(spark):
    from doc_parser_spark.operators.text_analysis import MOJIBAKE_SIGS

    truth = {c.encode("utf-8").decode("cp1252") for c in "’“–—…éèüöñáó"}
    assert set(MOJIBAKE_SIGS) <= truth
    assert len(MOJIBAKE_SIGS) == len(set(MOJIBAKE_SIGS)) == 12


# --- code-vs-prose routing ---------------------------------------------------


def test_code_score_routes_code_and_prose(spark):
    from doc_parser_spark.operators.text_analysis import code_score

    c_code = "int main() {\n  int x = 1;\n  return x;\n}\n// end\n"
    py_code = "def f():\n  import os\n  return os.path\n# comment\n"
    prose = ("The quick brown fox jumps over the lazy dog and keeps "
             "running through the quiet field toward the river bank.")
    docs = spark.createDataFrame(
        [(1, c_code), (2, py_code), (3, prose), (4, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in code_score(docs).collect()}
    assert rows[1].is_code and rows[1].sym_permille >= 30
    # python path: keywords + indentation, not braces
    assert rows[2].is_code and rows[2].kw_per_10k >= 50
    assert rows[2].indent_permille >= 200
    assert not rows[3].is_code and rows[3].sym_permille == 0
    assert not rows[4].is_code and rows[4].n_sym == 0
    assert rows[1].comment_permille > 0 and rows[2].comment_permille > 0


def test_code_score_keyword_needs_structure(spark):
    from doc_parser_spark.operators.text_analysis import code_score

    # prose that happens to contain keywords but no indentation/symbols
    # must NOT route to code ("return policy", "class action")
    text = ("our return policy is simple and the class action suit "
            "will not import any function of the const var kind")
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = code_score(docs).collect()[0]
    assert r.kw_per_10k >= 50 and not r.is_code


def test_doc_features_is_dense_and_complete(spark):
    from doc_parser_spark.operators.text_analysis import doc_features

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "int main() { return 0; }"),
         (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in doc_features(docs).collect()}
    assert set(rows) == {1, 2, 3}
    # dense: no NULL anywhere, even for the textless row
    for r in rows.values():
        assert all(v is not None for v in r.asDict().values()), r
    assert rows[2].is_code and not rows[1].is_code
    assert rows[1].n_tokens > 0 and rows[3].n_tokens == 0
    assert rows[3].moji_verdict == "clean"


def test_slop_score_detects_assistant_voice(spark):
    from doc_parser_spark.operators.text_analysis import slop_score

    docs = spark.createDataFrame(
        [
            (1, "As an AI language model, I cannot browse. "
                "It's important to note that this repeats: "
                "it's important to note that."),
            (2, "A perfectly ordinary paragraph about gardening and soil."),
            (3, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in slop_score(docs).collect()}
    # 1 'as an ai language model' + 2 'it's important to note that'
    assert rows[1].n_slop_hits == 3 and rows[1].n_phrases == 2
    assert rows[1].is_suspect and rows[1].slop_per_10k > 0
    assert not rows[2].is_suspect and rows[2].n_slop_hits == 0
    assert (rows[3].n_slop_hits, rows[3].is_suspect) == (0, False)


def test_vocab_spectrum_hand_computed(spark):
    from doc_parser_spark.operators.text_analysis import vocab_spectrum

    docs = spark.createDataFrame(
        [(1, "a a a b b d"), (2, "a a c c e f"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.bucket: r for r in vocab_spectrum(docs).collect()}
    # freqs: a=5 (bucket 2), b=2, c=2 (bucket 1), d,e,f=1 (bucket 0)
    assert set(rows) == {0, 1, 2}
    assert (rows[0].n_types, rows[0].n_tokens, rows[0].min_freq) == (3, 3, 1)
    assert (rows[1].n_types, rows[1].n_tokens, rows[1].min_freq) == (2, 4, 2)
    assert (rows[2].n_types, rows[2].n_tokens, rows[2].min_freq) == (1, 5, 4)
    # shares against tt=6 types, tk=12 tokens
    assert rows[0].type_share_ppm == 500_000
    assert rows[2].token_share_ppm == (1_000_000 * 5) // 12


def test_mix_sample_quotas_and_determinism(spark):
    from doc_parser_spark.operators import text_analysis

    rows = []
    for i in range(40):
        rows.append((i, "tok " * 20, "big"))
    for i in range(40, 50):
        rows.append((i, "tok " * 20, "small"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = text_analysis.mix_sample(df, epoch_docs=20)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert len(got) == 50  # flags, not filters
    quotas = {
        r["source"]: r["sample_quota"]
        for r in text_analysis.domain_mix_weights(df, 20).collect()
    }
    for src in ("big", "small"):
        kept = [d for d, r in got.items() if r["source"] == src and r["keep"]]
        assert len(kept) == min(
            quotas[src], sum(1 for r in got.values() if r["source"] == src)
        ), src
    # temperature alpha=0.5 up-weights the small source beyond its share
    assert quotas["small"] / 10 > quotas["big"] / 40

    # deterministic under repartitioning
    again = {
        r["doc_id"]: r.asDict()
        for r in text_analysis.mix_sample(df.repartition(7), epoch_docs=20)
        .collect()
    }
    assert again == got

    # the bucket-threshold selection keeps exactly the quota smallest
    # (hk, doc_id) per source — the rank formulation, recomputed here
    from pyspark.sql import functions as F

    keys = {
        r["doc_id"]: r["hk"]
        for r in df.select(
            "doc_id", text_analysis._hash_key("s0").alias("hk")
        ).collect()
    }
    for src, n in (("big", 40), ("small", 10)):
        members = sorted(
            (d for d, r in got.items() if r["source"] == src),
            key=lambda d: (keys[d], d),
        )
        want_kept = set(members[: quotas[src]])
        assert {
            d for d, r in got.items() if r["source"] == src and r["keep"]
        } == want_kept, src

    # scale gate: no corpus-wide per-source sort — the only row_number
    # window partitions by (source, bucket) and runs after the boundary
    # filter; a tiny n_buckets forces real boundary refinement
    tiny = text_analysis.mix_sample(df, epoch_docs=20, n_buckets=4)
    assert {r["doc_id"] for r in tiny.collect() if r["keep"]} == {
        d for d, r in got.items() if r["keep"]
    }
    import re

    plan = tiny._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(
        r"row_number\(\) windowspecdefinition\(source#\d+, (\w+)#", plan
    )
    assert specs and all(c == "bucket" for c in specs), specs


def test_quality_grid_partitions_the_corpus(spark):
    from doc_parser_spark.operators import text_analysis

    rows = [(i, ("word " * 60 + ". ") if i % 2 == 0 else "x", "s")
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = [r.asDict() for r in text_analysis.quality_grid(df).collect()]
    # the cells partition the corpus exactly
    assert sum(r["n_docs"] for r in out) == 20
    assert sum(r["share_permille"] for r in out) <= 1000
    for r in out:
        assert r["share_permille"] == 1000 * r["n_docs"] // 20
        for k in ("gopher_keep", "rep_keep", "is_code", "slop_suspect"):
            assert isinstance(r[k], bool)


def test_bpe_train_offline_first_merges_equal_spark_trainer(spark):
    """VERDICT r4 directive #6: the driver-side incremental trainer and
    the per-merge Spark trainer implement the same algorithm — their
    merge tables must be identical wherever both run (checked on the
    Sennrich toy corpus AND a word-salad corpus with ties)."""
    from doc_parser_spark.operators.text_analysis import (
        bpe_train,
        bpe_train_offline,
    )

    for rows in (
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        [(1, "aaaa aaaa baab"), (2, "abab aab b")],
        [(1, "spark scan sort shuffle spill spark scan")],
    ):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        a = [tuple(r) for r in bpe_train(docs, 6).orderBy("merge_rank").collect()]
        b = [tuple(r) for r in
             bpe_train_offline(docs, 6).orderBy("merge_rank").collect()]
        assert a == b, rows


def test_bpe_train_offline_sustains_production_merge_counts(spark):
    """A 1k-merge run must complete (the point of the offline trainer),
    stay internally consistent (contiguous ranks, positive counts), and
    early-stop cleanly when the vocabulary is fully merged."""
    import pytest

    from doc_parser_spark.operators.text_analysis import bpe_train_offline

    # deterministic pseudo-word vocabulary rich enough for 1000+ merges
    words = []
    for i in range(3000):
        h = i * 2654435761 % 2**32
        w = "".join("abcdefghijklmnop"[(h >> (4 * j)) & 0xF]
                    for j in range(3 + i % 6))
        words.append(w)
    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = bpe_train_offline(docs, 1000).orderBy("merge_rank").collect()
    assert len(rows) == 1000
    assert [r["merge_rank"] for r in rows] == list(range(1, 1001))
    assert all(r["pair_count"] >= 1 for r in rows)
    assert all(r["merged"] == r["lhs"] + r["rhs"] for r in rows)

    # fully-merged early stop: 'aa' exhausts after one merge
    tiny = spark.createDataFrame([(1, "aa aa")], "doc_id long, text string")
    assert bpe_train_offline(tiny, 50).count() == 1
    with pytest.raises(ValueError):
        bpe_train_offline(tiny, 0)
