"""Connected-components dedup grouping (large-star/small-star)."""

import random

from pyspark.sql import functions as F

from doc_parser_spark.operators.dedup import dup_clusters


def _uf_reference(n_nodes, edges):
    """Driver-side union-find ground truth: min doc_id per component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in range(n_nodes):
        comp.setdefault(find(i), []).append(i)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_random_graphs_match_union_find(spark):
    rng = random.Random(23)
    for _ in range(4):
        n = rng.randint(10, 90)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(0, 2 * n))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        ref = _uf_reference(n, edges)
        pairs = spark.createDataFrame(edges or [(0, 1)], "doc_a long, doc_b long")
        if not edges:
            pairs = pairs.where(F.lit(False))
        docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs, docs).collect()}
        assert got == ref


def test_worst_case_chain_converges(spark):
    """A path graph maximizes diameter — the case plain min-label
    propagation needs O(n) rounds for and star-contraction needs O(log n)."""
    chain = [(i, i + 1) for i in range(63)]
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert len(got) == 64 and set(got.values()) == {0}


def test_singletons_and_duplicate_pairs(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 5), (5, 9), (20, 21)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame([(i,) for i in range(25)], "doc_id long")
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs, docs).collect()}
    assert got[5] == got[9] == 5
    assert got[20] == got[21] == 20
    assert all(got[i] == i for i in range(25) if i not in (9, 21))


def test_line_dedup_drops_global_boilerplate(spark):
    from doc_parser_spark.operators.dedup import line_dedup

    boiler = "Copyright 2024 Example Corp"
    docs = spark.createDataFrame(
        [
            (0, f"{boiler}\nunique alpha content\nmore alpha text"),
            (1, f"{boiler}\nunique beta content"),
            (2, "  \n\n"),  # only blank lines
            (3, "solo gamma line"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["clean_text"] == "unique alpha content\nmore alpha text"
    assert out[0]["n_lines_kept"] == 2 and out[0]["n_lines_dropped"] == 1
    assert out[1]["clean_text"] == "unique beta content"
    assert out[2]["clean_text"] == "" and out[2]["n_lines_kept"] == 0
    assert out[3]["clean_text"] == "solo gamma line"
    # threshold: allow up to 2 occurrences -> boilerplate survives
    out2 = {r["doc_id"]: r for r in line_dedup(docs, max_occurrences=2).collect()}
    assert out2[0]["clean_text"].startswith(boiler)
    assert out2[0]["n_lines_dropped"] == 0


def test_cluster_representatives_keep_longest(spark):
    from pyspark.sql import Row

    from doc_parser_spark.operators.dedup import cluster_representatives

    clusters = spark.createDataFrame(
        [
            Row(doc_id=1, cluster_id=1),
            Row(doc_id=2, cluster_id=1),
            Row(doc_id=3, cluster_id=1),
            Row(doc_id=4, cluster_id=4),   # singleton
            Row(doc_id=5, cluster_id=5),
            Row(doc_id=6, cluster_id=5),   # tie on length -> min doc_id
        ]
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="short"),
            Row(doc_id=2, text="the longest capture of the page"),
            Row(doc_id=3, text="mid length"),
            Row(doc_id=4, text=None),
            Row(doc_id=5, text="same len"),
            Row(doc_id=6, text="len same"),
        ]
    )
    out = {
        r.cluster_id: r
        for r in cluster_representatives(clusters, docs).collect()
    }
    assert out[1].rep_doc_id == 2 and out[1].n_members == 3
    assert out[1].rep_chars == len("the longest capture of the page")
    # NULL text -> 0 chars, singleton keeps itself
    assert out[4].rep_doc_id == 4 and out[4].rep_chars == 0
    # length tie resolved to the lowest doc_id
    assert out[5].rep_doc_id == 5 and out[5].n_members == 2


def test_containment_catches_wrapper_jaccard_misses(spark):
    from pyspark.sql import Row

    from doc_parser_spark.operators import dedup

    quote = "alpha beta gamma delta epsilon zeta"
    wrapper = (
        "nav home products pricing about "
        + quote
        + " footer copyright legal privacy terms sitemap newsletter "
        "subscribe social links partner one partner two partner three"
    )
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=quote), Row(doc_id=2, text=wrapper)]
    )
    out = dedup.containment_pairs(docs, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    # every shingle of the quote appears verbatim inside the wrapper
    assert r.cont_a_in_b == 1.0
    assert r.cont_b_in_a < 0.5
    # and symmetric jaccard would have missed it at the same bar
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert jac == []


def test_containment_threshold_validation(spark):
    import pytest

    from pyspark.sql import Row

    from doc_parser_spark.operators import dedup

    df = spark.createDataFrame([Row(doc_id=1, text="a b c d")])
    with pytest.raises(ValueError):
        dedup.containment_pairs(df, threshold=1.5)


def test_containment_matches_python_replica_randomized(spark):
    """Randomized property: the distributed containment relation equals a
    brute-force python set computation (same 3-gram shingling, same 1e6
    integer-floor, same hot-shingle cap) on a corpus with heavy overlap."""
    import math
    import random

    from pyspark.sql import Row

    from doc_parser_spark.operators import dedup

    rng = random.Random(0x5EED)
    vocab = [f"w{i}" for i in range(30)]
    docs = {}
    for d in range(24):
        base = [rng.choice(vocab) for _ in range(rng.randint(4, 40))]
        if d % 3 == 0 and docs:  # splice a previous doc in verbatim
            prev = docs[rng.choice(list(docs))]
            at = rng.randrange(len(base) + 1)
            base = base[:at] + prev + base[at:]
        docs[d] = base
    sdf = spark.createDataFrame(
        [Row(doc_id=d, text=" ".join(ws)) for d, ws in docs.items()]
    )
    got = {
        (r.doc_a, r.doc_b): (r.cont_a_in_b, r.cont_b_in_a)
        for r in dedup.containment_pairs(
            sdf, threshold=0.5, max_shingle_freq=10
        ).collect()
    }

    def sh(ws):
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sets = {d: sh(ws) for d, ws in docs.items()}
    freq = {}
    for s in sets.values():
        for g in s:
            freq[g] = freq.get(g, 0) + 1
    hot = {g for g, c in freq.items() if c > 10}
    want = {}
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            common = len((sets[a] & sets[b]) - hot)
            if not common:
                continue
            ca = math.floor(1e6 * common / len(sets[a])) / 1e6
            cb = math.floor(1e6 * common / len(sets[b])) / 1e6
            if ca >= 0.5 or cb >= 0.5:
                want[(a, b)] = (ca, cb)
    assert got == want
