"""Semantics of the embedding near-dup operator on a toy corpus.

End-to-end value parity runs via the DuckDB oracle (`emb_cosine_neardup`);
this pins the operator's contract on hand-checkable vectors: identical
vectors score 1.0, opposite-bucket vectors are never candidates, the
degenerate-bucket cap drops viral buckets before pairing.
"""

import pytest

pytestmark = pytest.mark.unit


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_neardup_identical_vectors(spark):
    from doc_parser_spark.operators.similarity import cosine_neardup_pairs

    v = [1.0, 2.0, 3.0, 4.0, 1.0, 1.0, 1.0, 1.0]
    w = [-1.0, -2.0, -3.0, 4.0, 1.0, 1.0, 1.0, 1.0]  # different sign bucket
    rows = [(0, v, 0), (1, v, 0), (2, w, 0), (3, w, 0)]
    got = cosine_neardup_pairs(_emb(spark, rows), threshold=0.9).collect()
    pairs = {(r.vec_id_a, r.vec_id_b): r.cosine for r in got}
    # identical pairs inside each bucket; never across buckets
    assert set(pairs) == {(0, 1), (2, 3)}
    assert all(c == pytest.approx(1.0, abs=1e-6) for c in pairs.values())


def test_neardup_threshold_filters(spark):
    from doc_parser_spark.operators.similarity import cosine_neardup_pairs

    a = [1.0] * 8
    b = [1.0] * 4 + [0.1] * 4  # same all-positive bucket, lower cosine
    rows = [(0, a, 0), (1, b, 0)]
    df = _emb(spark, rows)
    assert cosine_neardup_pairs(df, threshold=0.999).count() == 0
    assert cosine_neardup_pairs(df, threshold=0.5).count() == 1


def test_neardup_viral_bucket_capped(spark):
    from doc_parser_spark.operators.similarity import cosine_neardup_pairs

    v = [1.0] * 8
    rows = [(i, v, 0) for i in range(10)]
    # cap below the bucket size: the whole bucket is dropped pre-join
    assert cosine_neardup_pairs(_emb(spark, rows), threshold=0.0, max_bucket=5).count() == 0
    # cap at the bucket size: all C(10,2) pairs survive
    assert (
        cosine_neardup_pairs(_emb(spark, rows), threshold=0.0, max_bucket=10).count()
        == 45
    )


def test_user_retention_boundary_ratio(spark):
    """41/80 retained hits a .xx5 double boundary: multiply-before-divide
    (the oracle's op order) gives floor(1e6*41/80)=512500; the reversed
    order gives 512499 — pin the parity-correct result."""
    import datetime as dt

    from doc_parser_spark.operators.relational import user_retention

    d1, d2 = dt.datetime(2024, 5, 1, 9), dt.datetime(2024, 5, 2, 9)
    rows = [(i, d1, i, "v", 0.0, "") for i in range(80)]
    rows += [(1000 + i, d2, i, "v", 0.0, "") for i in range(41)]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {r["day"].isoformat(): r for r in user_retention(events).collect()}
    day2 = out["2024-05-02"]
    assert (day2["n_active"], day2["n_retained"]) == (41, 41)
    day2_rate = out["2024-05-02"]["retention_rate"]
    assert day2_rate == 1.0
    # the boundary day: 41 of 80 retained
    rows2 = [(2000 + i, d2, 500 + i, "v", 0.0, "") for i in range(39)]
    events2 = events.union(spark.createDataFrame(rows2, events.schema))
    out2 = {r["day"].isoformat(): r for r in user_retention(events2).collect()}
    assert out2["2024-05-02"]["retention_rate"] == 0.5125


def test_ivf_codebook_and_probe(spark):
    """IVF: deterministic Lloyd's codebook + cell-probed top-k. The probe
    plan must touch only nprobe cells per query, and every reported
    neighbor must belong to one of the query's probed cells."""
    import numpy as np
    from pyspark.sql import functions as F

    from doc_parser_spark.operators.similarity import (
        _nearest_cid,
        ivf_topk,
        ivf_train,
    )

    rng = np.random.default_rng(5)
    # three well-separated blobs so k-means has an unambiguous optimum
    centers = np.array([[4.0] * 8, [-4.0] * 8, [4.0, -4.0] * 4])
    rows = []
    for i in range(90):
        v = centers[i % 3] + rng.normal(0, 0.1, 8)
        rows.append((i, [float(x) for x in v], i % 3))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = ivf_train(emb, k=3, iters=2)
    assert len(cents) == 3 and len(cents[0]) == 8
    # training is deterministic: same input → identical floats
    assert cents == ivf_train(emb, k=3, iters=2)
    # each blob lands in its own cell
    assigned = emb.select("vec_id", "label", _nearest_cid(cents).alias("cid"))
    per_label = (
        assigned.groupBy("label").agg(F.countDistinct("cid").alias("k")).collect()
    )
    assert all(r["k"] == 1 for r in per_label)

    out = ivf_topk(emb, k=3, iters=2, nprobe=1, n_queries=3, knn=4)
    got = out.collect()
    assert len(got) == 12
    lab = {r[0]: r[2] for r in rows}
    for r in got:
        # nprobe=1 on separated blobs → neighbors share the query's blob
        assert lab[r["neighbor_id"]] == lab[r["query_id"]]


def test_semdedup_toy_clusters(spark):
    """SemDeDup contract on hand-checkable vectors: two tight groups far
    apart → two clusters; within each group the min vec_id survives, the
    rest point their dup_of at it; a lone outlier below threshold keeps."""
    from doc_parser_spark.operators.similarity import semdedup

    g1 = [10.0] * 4 + [0.0] * 4
    g1b = [10.0, 10.0, 10.0, 9.0, 0.5, 0.0, 0.0, 0.0]  # cos(g1,g1b) ~ 0.998
    g2 = [0.0] * 4 + [10.0] * 4
    g2b = [0.0, 0.5, 0.0, 0.0, 9.0, 10.0, 10.0, 10.0]
    lone = [5.0, -5.0, 5.0, -5.0, 5.0, -5.0, 5.0, -5.0]  # near-orthogonal
    rows = [(0, g1, 0), (1, g1b, 0), (2, g2, 0), (3, g2b, 0), (4, lone, 0)]
    got = {
        r.vec_id: r
        for r in semdedup(_emb(spark, rows), k=2, iters=2, threshold=0.9).collect()
    }
    assert len(got) == 5
    # min-id survivor per duplicate group
    assert got[0].keep and got[0].dup_of == -1
    assert not got[1].keep and got[1].dup_of == 0
    # second group: whichever of 2/3 is in a cluster with the other, min id wins
    assert got[2].keep and got[2].dup_of == -1
    assert not got[3].keep and got[3].dup_of == 2
    # outlier never crosses the 0.9 threshold with anything
    assert got[4].keep and got[4].dup_of == -1


def test_semdedup_cluster_locality(spark):
    """Duplicate pairs split across clusters are NOT compared — the
    paper's accepted recall trade for cluster-local pairing."""
    from doc_parser_spark.operators.similarity import (
        ivf_train,
        _nearest_cid,
        semdedup,
    )
    import pyspark.sql.functions as F

    g1 = [10.0] * 4 + [0.0] * 4
    g2 = [0.0] * 4 + [10.0] * 4
    rows = [(0, g1, 0), (1, g1, 0), (2, g2, 0), (3, g2, 0)]
    df = _emb(spark, rows)
    cents = ivf_train(df, k=2, iters=2)
    cids = {
        r.vec_id: r.cid
        for r in df.select("vec_id", _nearest_cid(cents).alias("cid")).collect()
    }
    got = {r.vec_id: r for r in semdedup(df, k=2, iters=2, threshold=0.9).collect()}
    for a, b in ((0, 1), (2, 3)):
        assert cids[a] == cids[b]
        assert got[max(a, b)].dup_of == min(a, b)
    # identical vectors in DIFFERENT clusters would not pair; here the two
    # groups land in different clusters and indeed never reference each other
    assert {got[i].cid for i in (0, 1)} != {got[i].cid for i in (2, 3)}


def test_pq_codebooks_and_adc(spark):
    """PQ: per-subspace codebooks reconstruct blob structure; ADC ranks
    same-blob vectors ahead of other blobs (Jégou et al. 2011 contract:
    approximate distance preserves coarse neighborhood order)."""
    import numpy as np

    from doc_parser_spark.operators.similarity import (
        pq_adc_topk,
        pq_codes,
        pq_train,
    )

    rng = np.random.default_rng(7)
    centers = np.array([[4.0] * 8, [-4.0] * 8])
    rows = []
    for i in range(60):
        v = centers[i % 2] + rng.normal(0, 0.1, 8)
        rows.append((i, [float(x) for x in v], i % 2))
    emb = _emb(spark, rows)

    books = pq_train(emb, m=2, ksub=2, iters=2)
    assert len(books) == 2 and len(books[0]) == 2 and len(books[0][0]) == 4
    # deterministic: same input → identical floats
    assert books == pq_train(emb, m=2, ksub=2, iters=2)

    codes = pq_codes(emb, m=2, ksub=2, iters=2).collect()
    assert len(codes) == 60 * 2  # one row per (vector, subspace)
    assert all(0 <= r["code"] < 2 for r in codes)
    # two separated blobs → each vector's subspace codes agree across
    # subspaces and split the corpus exactly by blob
    by_vec = {}
    for r in codes:
        by_vec.setdefault(r["vec_id"], set()).add(r["code"])
    assert all(len(s) == 1 for s in by_vec.values())
    lab = {i: i % 2 for i in range(60)}
    blob_codes = {lab[v]: s.pop() for v, s in by_vec.items()}
    assert blob_codes[0] != blob_codes[1]

    out = pq_adc_topk(emb, m=2, ksub=2, iters=2, n_queries=2, knn=5).collect()
    assert len(out) == 10
    for r in out:
        # ADC top-k stays inside the query's blob
        assert lab[r["neighbor_id"]] == lab[r["query_id"]]
        assert r["adist"] >= 0
    # ranks are dense and ordered by (adist, neighbor_id)
    for qid in (0, 1):
        rs = sorted(
            (r for r in out if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        assert all(
            (a["adist"], a["neighbor_id"]) <= (b["adist"], b["neighbor_id"])
            for a, b in zip(rs, rs[1:])
        )


def test_pq_validates_dims_divisible(spark):
    from doc_parser_spark.operators.similarity import pq_train

    emb = _emb(spark, [(0, [1.0] * 6, 0)])
    with pytest.raises(ValueError):
        pq_train(emb, m=4, ksub=2, iters=1)


def test_ivfpq_topk_blob_locality(spark):
    """IVF-PQ composition: candidates come only from probed coarse
    cells; ADC ranking keeps same-blob neighbors first."""
    import numpy as np

    from doc_parser_spark.operators.similarity import ivfpq_topk

    rng = np.random.default_rng(11)
    centers = np.array([[5.0] * 8, [-5.0] * 8, [5.0, -5.0] * 4])
    rows = []
    for i in range(90):
        v = centers[i % 3] + rng.normal(0, 0.1, 8)
        rows.append((i, [float(x) for x in v], i % 3))
    emb = _emb(spark, rows)
    out = ivfpq_topk(
        emb, k=3, iters=2, nprobe=1, m=2, ksub=3, n_queries=3, knn=4
    ).collect()
    assert len(out) == 12
    lab = {r[0]: r[2] for r in rows}
    for r in out:
        # nprobe=1 on separated blobs → neighbors share the query's blob
        assert lab[r["neighbor_id"]] == lab[r["query_id"]]
        assert r["adist"] >= 0


def test_ivfpq_residual_encoding_lifts_recall(spark):
    """faiss residual layout (by_residual): quantizing x − centroid(cid)
    beats raw-vector PQ at the same code budget once the coarse probe is
    not the bottleneck. Blobs with a strong shared mean make the effect
    hand-predictable: raw PQ wastes its codes spanning the blob offsets,
    residual PQ spends them all on within-blob structure."""
    import numpy as np

    from doc_parser_spark.operators.similarity import (
        ivfpq_res_topk,
        ivfpq_topk,
    )

    rng = np.random.default_rng(7)
    # MORE blob offsets (6) than codes per subquantizer (ksub=4): a raw
    # subquantizer must spend its whole codebook approximating the ±8
    # blob means and has nothing left for within-blob structure, while
    # the residual subquantizer sees only the N(0, 0.5) structure
    centers = rng.choice([-8.0, 8.0], size=(6, 8))
    rows = []
    for i in range(180):
        v = centers[i % 6] + rng.normal(0, 0.5, 8)
        rows.append((i, [float(x) for x in v], i % 6))
    emb = _emb(spark, rows)
    V = {i: np.array(v) for i, v, _ in rows}

    def truth(qid, knn=5):
        ds = sorted(
            (float(((v - V[qid]) ** 2).sum()), vid)
            for vid, v in V.items()
            if vid != qid
        )
        return {vid for _, vid in ds[:knn]}

    gt = {q: truth(q) for q in range(5)}

    def recall(fn):
        got = {}
        out = fn(emb, k=6, iters=2, nprobe=6, m=2, ksub=4, n_queries=5,
                 knn=5).collect()
        for r in out:
            got.setdefault(int(r["query_id"]), set()).add(
                int(r["neighbor_id"])
            )
        return sum(len(got.get(q, set()) & gt[q]) for q in gt) / (5 * len(gt))

    r_raw, r_res = recall(ivfpq_topk), recall(ivfpq_res_topk)
    # measured on this fixed seed: raw 0.16, residual 0.48
    assert r_res > r_raw
    assert r_res >= 0.4


def test_semantic_decontaminate_flags_bucket_mates(spark):
    from pyspark.sql import Row

    from doc_parser_spark.operators.similarity import semantic_decontaminate

    # dims=2 buckets: sign of first two components
    corpus = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 1.0, 0.0]),    # ~ bench 100
            Row(vec_id=2, embedding=[1.0, 1.0, -1.0]),   # same bucket, lower cos
            Row(vec_id=3, embedding=[-1.0, -1.0, 0.0]),  # bucket w/o bench -> clean
        ]
    )
    bench = spark.createDataFrame(
        [Row(vec_id=100, embedding=[2.0, 2.0, 0.1])]
    )
    out = {
        r.vec_id: r
        for r in semantic_decontaminate(corpus, bench, threshold=0.9, dims=2).collect()
    }
    assert out[1].contaminated and out[1].n_bench_hits == 1
    assert out[1].max_cosine_fp6 >= 900000
    # cos([1,1,-1],[2,2,.1]) = 3.9/(sqrt(3)*sqrt(8.01)) ~ 0.796 < 0.9
    assert not out[2].contaminated and out[2].max_cosine_fp6 == -1
    assert not out[3].contaminated and out[3].n_bench_hits == 0


# --- SQ8 scalar quantization -------------------------------------------------


def test_sq8_codes_match_numpy_replica(spark):
    import math
    from doc_parser_spark.operators.similarity import sq8_codes

    vecs = [
        (0, [0.0, 1.0, -2.0, 5.0]),
        (1, [1.0, 1.0, 2.0, 0.0]),
        (2, [2.0, 1.0, 6.0, 2.5]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {(r.vec_id, r.dim): r.code for r in sq8_codes(df).collect()}
    mins = [min(v[d] for _, v in vecs) for d in range(4)]
    maxs = [max(v[d] for _, v in vecs) for d in range(4)]
    for vid, v in vecs:
        for d in range(4):
            if maxs[d] == mins[d]:
                exp = 0  # constant dimension (dim 1) codes 0
            else:
                exp = min(255, max(0, math.floor(
                    (v[d] - mins[d]) * 255.0 / (maxs[d] - mins[d]))))
            assert got[(vid, d)] == exp, (vid, d)
    # endpoints: corpus min -> 0, corpus max -> 255 (exact division here)
    assert got[(0, 0)] == 0 and got[(2, 0)] == 255


def test_sq8_topk_ranks_by_code_distance(spark):
    import pytest
    from doc_parser_spark.operators.similarity import sq8_topk

    # query 0 at origin; 1 close, 2 far, 3 farther
    vecs = [
        (0, [0.0, 0.0]), (1, [0.1, 0.1]), (2, [5.0, 5.0]), (3, [9.0, 9.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    rows = [r for r in sq8_topk(df, n_queries=1, knn=3).collect()]
    assert [r.neighbor_id for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3]
    assert all(r.query_id == 0 for r in rows)
    with pytest.raises(ValueError):
        sq8_topk(df, n_queries=0)


def test_pca_power_iteration_matches_numpy_on_structured_data(spark):
    """On data with a dominant direction, 48 power iterations recover
    numpy's top eigenvector to high cosine, eigenvalues come out in
    descending order, and the result is partition-order-proof."""
    import numpy as np

    from doc_parser_spark.operators.similarity import pca_train

    rng = np.random.default_rng(3)
    u1 = rng.normal(0, 1, 8); u1 /= np.linalg.norm(u1)
    u2 = rng.normal(0, 1, 8); u2 -= (u2 @ u1) * u1; u2 /= np.linalg.norm(u2)
    rows = []
    for i in range(200):
        v = 5.0 * rng.normal() * u1 + 2.0 * rng.normal() * u2 \
            + rng.normal(0, 0.1, 8)
        rows.append((i, [float(x) for x in v], 0))
    emb = _emb(spark, rows)
    mu, comps, eigs = pca_train(emb, k=2, iters=48, sample=200)
    assert eigs[0] > eigs[1] > 0
    assert abs(float(np.dot(comps[0], u1))) > 0.99
    assert abs(float(np.dot(comps[1], u2))) > 0.95

    mu2, comps2, eigs2 = pca_train(emb.repartition(7), k=2, iters=48,
                                   sample=200)
    assert comps2 == comps and eigs2 == eigs and mu2 == mu


def test_pca_project_is_centered_dot_product(spark):
    import math

    import numpy as np

    from doc_parser_spark.operators.similarity import pca_project, pca_train

    rows = [(i, [float(i % 5), float(i % 3), 1.0, 0.0], 0)
            for i in range(40)]
    emb = _emb(spark, rows)
    mu, comps, _ = pca_train(emb, k=1, iters=8, sample=40)
    got = {(r["vec_id"], r["comp"]): r["proj_fp6"]
           for r in pca_project(emb, k=1, iters=8).collect()}
    for i, v, _l in rows[:10]:
        # replicate the JVM left-fold: ((x-mu)*comp) accumulated in order
        acc = 0.0
        for x, m, c in zip(v, mu, comps[0]):
            acc += (x - m) * c
        assert got[(i, 0)] == math.floor(acc * 1e6)


def test_pca_degenerate_corpus_engine_and_oracle_agree(spark):
    """ADVICE r4: on a constant-embedding corpus the covariance is all
    zeros, so power iteration hits ||y|| = 0 immediately. pca_train
    breaks and keeps the previous v; the DuckDB twin's unrolled chain
    must mirror that guard (CASE on zero norm) instead of dividing into
    NaN — engine and oracle return identical component rows."""
    import duckdb

    import __spark_entry__ as entry
    from doc_parser_spark.operators.similarity import pca_components

    dims, k, iters = 4, 2, 8
    const = [0.25, -0.5, 0.75, 1.0]  # exactly fp6-representable
    rows = [(i, const, 0) for i in range(16)]
    emb = _emb(spark, rows)
    got = sorted(
        (r.comp, r.dim, r.value_fp6, r.eigenvalue_floor)
        for r in pca_components(emb, k=k, iters=iters).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT i AS vec_id,"
        " [0.25, -0.5, 0.75, 1.0]::DOUBLE[] AS embedding"
        " FROM range(16) t(i)"
    )
    sql = entry._pca_components_sql(dims=dims, k=k, iters=iters)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    con.close()

    assert got == want
    # init direction survives untouched: every value is 1/sqrt(4) = 0.5
    assert all(v == 500000 and lam == 0 for (_, _, v, lam) in got)


def test_opq_rotation_is_orthogonal_and_exact(spark):
    """H/sqrt(d) must preserve norms exactly (orthogonality) and match
    the closed-form signs; power-of-two gate raises on bad dims."""
    import numpy as np
    import pytest

    from doc_parser_spark.operators.similarity import (
        hadamard_signs,
        opq_rotate,
    )

    H = np.array(hadamard_signs(64), dtype=float) / 8.0
    assert np.allclose(H @ H.T, np.eye(64))
    with pytest.raises(ValueError):
        hadamard_signs(48)

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 64)], 0)
            for i in range(8)]
    emb = _emb(spark, rows)
    got = {r["vec_id"]: np.array(r["embedding"])
           for r in opq_rotate(emb).collect()}
    for i, v, _l in rows:
        # the table column is float32: compare against the stored values
        v32 = np.array(v, dtype=np.float32).astype(np.float64)
        assert abs(np.linalg.norm(got[i]) - np.linalg.norm(v32)) < 1e-12


def test_opq_rotation_lifts_recall_on_anisotropic_data(spark):
    """The OPQ effect (Ge et al. 2013): on variance-skewed data, plain
    PQ wastes its code budget — one subspace holds all the energy —
    while the rotated quantizer spreads distortion evenly and ADC
    ranking improves. Pinned: recall@10 of opq_adc_topk beats
    pq_adc_topk by >= 0.05 absolute on an exp-decay spectrum corpus
    (numpy prototype: 0.100 -> 0.208 at m=8, ksub=16)."""
    import numpy as np

    from doc_parser_spark.operators.similarity import (
        opq_adc_topk,
        pq_adc_topk,
    )

    rng = np.random.default_rng(7)
    n, d, knn, n_q = 600, 64, 10, 12
    scales = np.exp(-np.arange(d) / 8.0)
    X = rng.normal(0, 1, (n, d)) * scales
    rows = [(i, [float(x) for x in X[i]], 0) for i in range(n)]
    emb = _emb(spark, rows).cache()

    exact = {}
    for q in range(n_q):
        ed = ((X - X[q]) ** 2).sum(1)
        ed[q] = np.inf
        exact[q] = set(int(i) for i in np.argsort(ed)[:knn])

    def recall(df):
        hits = tot = 0
        for r in df.collect():
            tot += 1
            hits += int(r["neighbor_id"] in exact[r["query_id"]])
        assert tot == n_q * knn
        return hits / tot

    kw = dict(m=8, ksub=16, iters=4, n_queries=n_q, knn=knn)
    r_plain = recall(pq_adc_topk(emb, **kw))
    r_opq = recall(opq_adc_topk(emb, **kw))
    emb.unpersist()
    assert r_opq >= r_plain + 0.05, (r_plain, r_opq)
