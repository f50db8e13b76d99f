"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Over an ``embeddings(vec_id, embedding float[], label)`` table.

Scale design:

* **cosine_topk** — the query side is tiny (a handful of probe vectors) so it
  is explicitly ``broadcast()``: the big side streams through one stage with
  no shuffle; the only shuffle is the final per-query top-k aggregation,
  which carries k rows per query. Dot products run JVM-side via
  ``aggregate(zip_with(...))`` — no Python, no UDF.
* **ann_lsh** — sign-bit bucketing (random-hyperplane LSH degenerate case:
  coordinate hyperplanes, deterministic and SQL-replicable). At 10^12 scale
  the bucket id becomes the shuffle/bucketing key and probes only touch one
  bucket; here the same plan shape is exercised end-to-end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

COSINE = (
    "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v) / "
    "(sqrt(aggregate(a.embedding, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))) * "
    " sqrt(aggregate(b.embedding, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))))"
)


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """Brute-force exact top-k cosine neighbors for the first n query vectors."""
    queries = embeddings.where(F.col("vec_id") < n_queries).alias("a")
    corpus = embeddings.alias("b")
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .where(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            (F.floor(F.expr(COSINE) * F.lit(1000000.0)) / F.lit(1000000.0)).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def sign_bucket_expr(dims: int = 8) -> str:
    """Sign-bit bucket id over the first ``dims`` dimensions (1-indexed
    element_at, matching SQL array indexing)."""
    terms = [
        f"CASE WHEN element_at(embedding, {i + 1}) > 0 THEN {1 << i} ELSE 0 END"
        for i in range(dims)
    ]
    return " + ".join(terms)


def ann_buckets(embeddings: DataFrame, dims: int = 8) -> DataFrame:
    """LSH bucket histogram (the data layout a bucketed ANN index uses)."""
    return (
        embeddings.select(F.expr(sign_bucket_expr(dims)).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.30,
    dims: int = 8,
    max_bucket: int = 200,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-by-embedding path).

    Candidates are restricted to the vector's sign-bit LSH bucket — at
    100 TB the bucket id is the bucketing key and the self-join is
    bucket-local, never all-pairs. Degenerate buckets are **count-filtered
    before the self-join** (the LSH-pairs lesson: never materialize a viral
    bucket's membership only to discard it). Cosine runs JVM-side via
    ``aggregate(zip_with(...))``; the score is floor-truncated to 1e-6 so
    the threshold compare is engine-portable.
    """
    with_bucket = embeddings.withColumn(
        "bucket", F.expr(sign_bucket_expr(dims)).cast("long")
    )
    ok_buckets = (
        with_bucket.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") >= 2) & (F.col("n") <= max_bucket))
        .select("bucket")
    )
    survivors = with_bucket.join(ok_buckets, "bucket")
    a = survivors.alias("a")
    b = survivors.alias("b")
    return (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            (F.floor(F.expr(COSINE) * F.lit(1000000.0)) / F.lit(1000000.0)).alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(threshold))
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.30,
    dims: int = 8,
) -> DataFrame:
    """Embedding-space benchmark decontamination (the semantic complement
    of ``web.decontaminate``'s n-gram overlap): flag every corpus vector
    whose cosine to ANY benchmark vector reaches ``threshold``. Catches
    paraphrased / reformatted eval contamination that exact n-grams miss
    (the Phi / Llama-3 decon recipe).

    Candidates are restricted to the shared sign-bit LSH bucket — the
    same bucketed layout as ``cosine_neardup_pairs``, so at 100 TB the
    probe is an equi-join on the bucket id, never corpus × benchmark.
    The benchmark side is small in production (a few hundred eval sets)
    but still joins with a plain shuffle join — AQE promotes it to a
    broadcast when genuinely tiny, and a pathological benchmark list
    can't OOM executors. Cosines are floor-scaled to fp6 BIGINT before
    the max, so the aggregate is order-independent and the DuckDB twin
    hashes identically.

    Output one row per corpus vector: ``vec_id, n_bench_hits,
    max_cosine_fp6`` (-1 when no hit), ``contaminated``."""
    thr = int(round(threshold * 1e6))
    bucket = F.expr(sign_bucket_expr(dims)).cast("long").alias("bucket")
    ca = corpus.select("vec_id", "embedding", bucket).alias("a")
    bb = benchmark.select("embedding", bucket).alias("b")
    scored = ca.join(bb, F.col("a.bucket") == F.col("b.bucket")).select(
        F.col("a.vec_id").alias("vec_id"),
        F.floor(F.expr(COSINE) * F.lit(1000000.0)).cast("long").alias("cos_fp6"),
    )
    hits = (
        scored.where(F.col("cos_fp6") >= thr)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bench_hits"),
            F.max("cos_fp6").cast("long").alias("max_cosine_fp6"),
        )
    )
    return corpus.select("vec_id").join(hits, "vec_id", "left").select(
        "vec_id",
        F.coalesce("n_bench_hits", F.lit(0)).cast("long").alias("n_bench_hits"),
        F.coalesce("max_cosine_fp6", F.lit(-1)).cast("long").alias("max_cosine_fp6"),
        F.col("n_bench_hits").isNotNull().alias("contaminated"),
    )


def ann_lsh_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 3, dims: int = 8
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.

    The bucket equi-join replaces the cross join — this is the scale path
    (bucket id would be the table's bucketing key at 100 TB)."""
    with_bucket = embeddings.withColumn(
        "bucket", F.expr(sign_bucket_expr(dims)).cast("long")
    )
    queries = with_bucket.where(F.col("vec_id") < n_queries).alias("a")
    corpus = with_bucket.alias("b")
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("a.bucket") == F.col("b.bucket"))
        .where(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            (F.floor(F.expr(COSINE) * F.lit(1000000.0)) / F.lit(1000000.0)).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# -- IVF: k-means coarse quantizer + cell-probed ANN --------------------------
#
# The scale path the LSH buckets approximate: train a small codebook
# (Lloyd's over a sample — centroids are MODEL STATE, a few KB held on
# the driver exactly like MLlib's KMeans broadcasts them), assign every
# vector to its nearest centroid once (one broadcast-literal pass, no
# shuffle beyond the final write), and answer queries by probing only the
# ``nprobe`` nearest cells — an equi-join on cell id replaces the cross
# join. Everything is bit-exactly reproducible in DuckDB: centroid
# updates sum floor(x*1e6) BIGINTs (exact, order-independent) and divide
# once in double; distances fold left in double via aggregate(zip_with)
# ↔ list_sum(list_transform); argmin ties break on centroid id.

IVF_K = 8
IVF_ITERS = 2
IVF_NPROBE = 2


def _sqdist_sql(centroid: list[float]) -> str:
    lits = ", ".join(f"{c!r}d" for c in centroid)
    return (
        f"aggregate(zip_with(embedding, array({lits}), "
        "(x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _nearest_cid(cents: list[list[float]]):
    arr = F.array(
        *[
            F.struct(
                F.expr(_sqdist_sql(c)).alias("d"), F.lit(ci).alias("cid")
            )
            for ci, c in enumerate(cents)
        ]
    )
    return F.sort_array(arr)[0]["cid"].cast("long")


IVF_TRAIN_SAMPLE = 256 * IVF_K  # faiss's default training budget


def _train_vectors(embeddings: DataFrame, sample: int):
    """The deterministic training sample: the ``sample`` lowest vec_ids,
    as a float64 matrix (row-major, one row per vector)."""
    import numpy as np

    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("quantizer training: embeddings table is empty")
    return np.array(
        [[float(v) for v in r["embedding"]] for r in rows], dtype="float64"
    )


def _lloyd(vecs, cents, iters: int) -> list[list[float]]:
    """Lloyd's over a driver-held float64 sample, arithmetic-exact to
    the SQL twin: distances fold LEFT over dimensions (sequential
    ``acc + (x-c)²`` — accumulated per-dimension over vectorized rows so
    every IEEE add happens in the same order as ``aggregate(zip_with)``
    / DuckDB ``list_sum``), argmin ties break on the lowest centroid id
    (``np.argmin`` picks the first minimum), and centroid updates sum
    exact ``floor(x*1e6)`` int64s divided once in double — the same two
    IEEE divisions the SQL twin performs. Empty cells keep their
    previous centroid."""
    import numpy as np

    n, dims = vecs.shape
    k = len(cents)
    scaled = np.floor(vecs * 1000000.0).astype("int64")
    for _ in range(iters):
        dist = np.empty((n, k), dtype="float64")
        for ci in range(k):
            acc = np.zeros(n, dtype="float64")
            c = cents[ci]
            for d in range(dims):
                diff = vecs[:, d] - c[d]
                acc = acc + diff * diff
            dist[:, ci] = acc
        asg = np.argmin(dist, axis=1)
        new = []
        for ci in range(k):
            mask = asg == ci
            cnt = int(mask.sum())
            if cnt == 0:
                new.append(cents[ci])
            else:
                s = scaled[mask].sum(axis=0)
                new.append([(int(s[d]) / cnt) / 1e6 for d in range(dims)])
        cents = new
    return cents


def ivf_train(
    embeddings: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    sample: int = IVF_TRAIN_SAMPLE,
) -> list[list[float]]:
    """Lloyd's iterations; returns the codebook (k lists of doubles).

    faiss-style bounded training: the coarse quantizer trains on the
    ``sample`` (default 256·k, faiss's budget) lowest vec_ids — a
    deterministic driver-held sample, like the codebook itself. Running
    Lloyd's over the full corpus would cost iters full-corpus passes
    (10^12-row jobs whose giant codegen'd distance expressions dominated
    even the 5 000-row bench: 6.7 s → <0.2 s with sampling) for codebook
    movement that plateaus long before that. Init = the k lowest
    vec_ids; update arithmetic is exact-replicable (see :func:`_lloyd`)
    so the DuckDB twin reproduces the codebook bit-for-bit."""
    vecs = _train_vectors(embeddings, max(sample, k))
    # fewer vectors than requested cells: shrink the codebook (every
    # assignment cid stays a valid index) rather than indexing past it
    k = min(k, len(vecs))
    cents = [[float(v) for v in vecs[i]] for i in range(k)]
    return _lloyd(vecs, cents, iters)


def ivf_centroids(
    embeddings: DataFrame, k: int = IVF_K, iters: int = IVF_ITERS
) -> DataFrame:
    """Final codebook as exploded scalar rows (cid, dim, value).

    Exploded rather than array<double> so the result is a plain sortable
    relation — comparison harnesses that canonicalize via pandas frames
    cannot sort/hash an array column."""
    cents = ivf_train(embeddings, k, iters)
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [
            (ci, d, float(v))
            for ci, c in enumerate(cents)
            for d, v in enumerate(c)
        ],
        "cid long, dim long, value double",
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    n_queries: int = 5,
    knn: int = 5,
) -> DataFrame:
    """Cell-probed approximate top-k cosine: each query scans only its
    ``nprobe`` nearest cells (an equi-join on cid — the IVF plan shape)."""
    cents = ivf_train(embeddings, k, iters)
    assigned = embeddings.select(
        "vec_id", "embedding", _nearest_cid(cents).alias("cid")
    )
    dist_arr = F.array(
        *[
            F.struct(F.expr(_sqdist_sql(c)).alias("d"), F.lit(ci).alias("cid"))
            for ci, c in enumerate(cents)
        ]
    )
    probes = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding", F.posexplode(F.sort_array(dist_arr)))
        .where(F.col("pos") < nprobe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("col.cid").cast("long").alias("cid"),
        )
    )
    scored = (
        F.broadcast(probes)
        .join(assigned, "cid")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.floor(
                    F.expr(
                        COSINE.replace("a.embedding", "q_emb").replace(
                            "b.embedding", "embedding"
                        )
                    )
                    * F.lit(1000000.0)
                )
                / F.lit(1000000.0)
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= knn)
        .select(
            "query_id", "neighbor_id", "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def semdedup(
    embeddings: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    threshold: float = 0.30,
) -> DataFrame:
    """SemDeDup: semantic deduplication via embedding clusters (Abbas et
    al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication", arXiv:2303.09540).

    The paper's algorithm: k-means-cluster the embedding space, then
    compare pairs ONLY within each cluster and drop all but one member of
    every group whose pairwise cosine exceeds the threshold. Clustering is
    what makes it tractable at web scale — the cross-document comparison
    is cluster-local, never corpus-all-pairs.

    Determinism/portability contract (matches the rest of this module):
    the codebook comes from :func:`ivf_train` (exact scaled-integer
    Lloyd's, argmin ties on cid), cosine folds left in double and is
    floor-truncated to 1e-6 before the threshold compare, and the survivor
    of a duplicate group is the **lowest vec_id** (the convention
    ``web.url_dedup`` uses). The paper keeps the member with the lowest
    centroid-distance; min-id is used here so the result is reproducible
    under re-embedding noise — documented deviation.

    Output: one row per vector — ``(vec_id, cid, keep, dup_of)`` where
    ``dup_of`` is the smallest same-cluster vec_id with cosine >=
    threshold (-1 when none; then ``keep`` is true).

    Scale shape: assignment is a stateless projection against the
    driver-held codebook (like MLlib KMeansModel.transform); the pairing
    is a self-equi-join ON cid, so cid is the shuffle key and at 100 TB
    the bucketing key; with k grown ~ sqrt(n) per the paper, per-cluster
    membership stays bounded. No corpus broadcast, no cross join.
    """
    cents = ivf_train(embeddings, k, iters)
    assigned = embeddings.select(
        "vec_id", "embedding", _nearest_cid(cents).alias("cid")
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    dup_of = (
        a.join(b, F.col("a.cid") == F.col("b.cid"))
        .where(F.col("b.vec_id") < F.col("a.vec_id"))
        .where(
            (F.floor(F.expr(COSINE) * F.lit(1000000.0)) / F.lit(1000000.0))
            >= F.lit(threshold)
        )
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.min(F.col("b.vec_id")).alias("dup_of"))
    )
    return (
        assigned.join(dup_of, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.col("dup_of").isNull().alias("keep"),
            F.coalesce("dup_of", F.lit(-1)).cast("long").alias("dup_of"),
        )
    )


# -- PQ: product quantization + asymmetric-distance ANN -----------------------
#
# The compression path 100 TB ANN actually runs on (Jégou et al. 2011,
# "Product Quantization for Nearest Neighbor Search", TPAMI 33(1); the
# IVF-PQ layout in faiss/SCANN): the D-dim vector splits into M
# subvectors, each quantized by its own KSUB-centroid codebook, so a
# vector stores as M small codes (here 4 bytes vs 256 bytes of floats —
# the corpus fits in RAM and scans touch codes, not vectors). Queries
# never decompress: asymmetric distance (ADC) sums per-subspace lookup
# distances between the RAW query subvector and each centroid.
#
# Determinism/oracle contract (same as IVF above): per-subspace Lloyd's
# with init = subvectors of the KSUB lowest vec_ids, exact scaled-integer
# centroid sums, argmin ties on code id; ADC entries floor(d * 1e6) to
# BIGINT so the per-vector sum is integer-exact and order-independent.
#
# Scale shape: training shuffles only (sub, code, count, D/M sums) per
# iteration — ONE aggregation job for all subspaces (codes explode to
# narrow rows, map-side combine collapses them before the exchange).
# Encoding is a stateless projection against the driver-held codebooks
# (model state, like MLlib's KMeansModel). ADC is a broadcast equi-join
# of the (query, sub, code) lookup table against the codes relation —
# shuffle key (query_id, vec_id), k rows per query survive.

PQ_M = 4
PQ_KSUB = 4
PQ_ITERS = 2


def _sub_sqdist_sql(
    centroid: list[float], off: int, col: str = "embedding"
) -> str:
    """Squared L2 between col[off+1 .. off+len] and a literal
    centroid, folded left in double (zip_with ↔ list_transform parity)."""
    lits = ", ".join(f"{c!r}d" for c in centroid)
    return (
        f"aggregate(zip_with(slice({col}, {off + 1}, {len(centroid)}), "
        f"array({lits}), "
        "(x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _nearest_code(book: list[list[float]], off: int, col: str = "embedding"):
    arr = F.array(
        *[
            F.struct(
                F.expr(_sub_sqdist_sql(c, off, col)).alias("d"),
                F.lit(ci).alias("code"),
            )
            for ci, c in enumerate(book)
        ]
    )
    return F.sort_array(arr)[0]["code"].cast("long")


PQ_TRAIN_SAMPLE = 256 * PQ_KSUB  # faiss's per-subquantizer budget


def pq_train(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    sample: int = PQ_TRAIN_SAMPLE,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's; returns ``codebooks[sub][code] -> centroid``.

    Same faiss-style bounded training as :func:`ivf_train`: all M
    subquantizers train driver-side over the ``sample`` lowest vec_ids
    with the exact-replicable :func:`_lloyd` arithmetic (init = the
    ``ksub`` lowest vec_ids' subvectors). The corpus-side encode —
    ``_codes_arr`` in :func:`pq_codes` — remains the distributed,
    scan-shaped stage."""
    vecs = _train_vectors(embeddings, max(sample, ksub))
    dims = vecs.shape[1]
    if dims % m != 0:
        raise ValueError(f"dims ({dims}) must divide into m ({m}) subspaces")
    dsub = dims // m
    ksub = min(ksub, len(vecs))
    books = []
    for j in range(m):
        sub = vecs[:, j * dsub : (j + 1) * dsub]
        init = [[float(v) for v in sub[i]] for i in range(ksub)]
        books.append(_lloyd(sub, init, iters))
    return books


def _codes_arr(books: list, dsub: int, col: str = "embedding"):
    """JVM expression: array of the M nearest-code ids for a vector."""
    return F.array(
        *[_nearest_code(book, j * dsub, col) for j, book in enumerate(books)]
    )


def _assign_cids(vecs, cents) -> list[int]:
    """Driver-side nearest-centroid assignment, arithmetic-exact to the
    SQL twins: distances fold LEFT per dimension over the vectorized
    rows, argmin ties break on the lowest cid (np.argmin first-min)."""
    import numpy as np

    n, dims = vecs.shape
    dist = np.empty((n, len(cents)), dtype="float64")
    for ci, c in enumerate(cents):
        acc = np.zeros(n, dtype="float64")
        for d in range(dims):
            diff = vecs[:, d] - c[d]
            acc = acc + diff * diff
        dist[:, ci] = acc
    return [int(a) for a in np.argmin(dist, axis=1)]


def pq_train_residual(
    embeddings: DataFrame,
    cents: list[list[float]],
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    sample: int = PQ_TRAIN_SAMPLE,
) -> list[list[list[float]]]:
    """faiss-layout residual PQ training: codebooks learn
    ``x − centroid(cid)`` instead of raw vectors (faiss IndexIVFPQ's
    ``by_residual=true`` default — residual energy is much smaller than
    vector energy once the coarse quantizer has soaked up the cluster
    mean, so the same code budget buys finer quantization and higher
    recall).

    Same bounded driver-side training as :func:`pq_train`; the residual
    subtraction is plain per-element float64 — identical IEEE ops to the
    SQL twin's ``CAST(emb[i] AS DOUBLE) - c.c[i]``."""
    import numpy as np

    vecs = _train_vectors(embeddings, max(sample, ksub))
    dims = vecs.shape[1]
    if dims % m != 0:
        raise ValueError(f"dims ({dims}) must divide into m ({m}) subspaces")
    asg = _assign_cids(vecs, cents)
    res = vecs - np.array([cents[ci] for ci in asg], dtype="float64")
    dsub = dims // m
    ksub = min(ksub, len(res))
    books = []
    for j in range(m):
        sub = res[:, j * dsub : (j + 1) * dsub]
        init = [[float(v) for v in sub[i]] for i in range(ksub)]
        books.append(_lloyd(sub, init, iters))
    return books


def _adc_lut_rows(
    queries: list, books: list, dsub: int
) -> list[tuple[int, int, int, int]]:
    """(query_id, sub, code, floor(d*1e6)) rows for the ADC lookup table.

    Left-fold double accumulation — the same order the SQL twins'
    ``list_sum(list_transform(...))`` uses, so the scaled-integer entry
    is bit-identical on both sides."""
    rows = []
    for q in queries:
        emb = [float(v) for v in q["embedding"]]
        qid = int(q["vec_id"])
        for j, book in enumerate(books):
            sub = emb[j * dsub : (j + 1) * dsub]
            for ci, cent in enumerate(book):
                d = 0.0
                for x, c in zip(sub, cent):
                    d += (x - c) * (x - c)
                rows.append((qid, j, ci, int(math.floor(d * 1e6))))
    return rows


def pq_codes(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    books: list | None = None,
) -> DataFrame:
    """Every vector's PQ code as exploded scalar rows (vec_id, sub, code).

    Encoding is a stateless JVM projection against the driver-held
    codebooks — no shuffle, no Python in the executor path. Pass
    pre-trained ``books`` to skip the training scans."""
    if books is None:
        books = pq_train(embeddings, m, ksub, iters)
    first = embeddings.select("embedding").first()
    dsub = len(first["embedding"]) // m
    return embeddings.select(
        "vec_id", F.posexplode(_codes_arr(books, dsub)).alias("sub", "code")
    ).select(F.col("vec_id").cast("long"), F.col("sub").cast("long"), "code")


def pq_adc_topk(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    n_queries: int = 5,
    knn: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k: queries scan CODES, never raw vectors.

    The (query, sub, code) -> distance lookup table is M*KSUB rows per
    query (driver-computed model state, broadcast); approx distance =
    integer sum of the M looked-up entries (each floor(d*1e6) — exact,
    order-independent). Output (query_id, neighbor_id, adist, rank)."""
    books = pq_train(embeddings, m, ksub, iters)
    first = embeddings.select("embedding").first()
    dsub = len(first["embedding"]) // m
    spark = embeddings.sparkSession
    queries = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    lut = spark.createDataFrame(
        _adc_lut_rows(queries, books, dsub),
        "query_id long, sub long, code long, d long",
    )
    codes = pq_codes(embeddings, m, ksub, iters, books=books)
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= knn)
        .select(
            "query_id", "neighbor_id", "adist",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def hadamard_signs(dims: int) -> list[list[int]]:
    """Sylvester Walsh-Hadamard sign matrix: H[i][j] = (-1)^popcount(i&j)
    for 0-indexed i, j. Requires power-of-two dims; H/sqrt(dims) is
    orthogonal, and for dims = 64 the 1/8 scale is IEEE-exact."""
    if dims & (dims - 1) or dims <= 0:
        raise ValueError(f"dims ({dims}) must be a power of two")
    return [
        [1 if bin(i & j).count("1") % 2 == 0 else -1 for j in range(dims)]
        for i in range(dims)
    ]


def opq_rotate(embeddings: DataFrame, col: str = "embedding") -> DataFrame:
    """Orthogonal pre-rotation for PQ — the OPQ composition (Ge et al.,
    CVPR 2013 "Optimized Product Quantization"): quantize R·x instead of
    x so per-subspace variance balances and the ADC distance distortion
    spreads evenly across subquantizers.

    The rotation here is the deterministic Walsh-Hadamard matrix
    H/sqrt(dims) — the OPQ paper's random-rotation (RR) baseline made
    reproducible: structured, orthogonal, entries exactly ±1/8 at 64
    dims, so both engines can reproduce every rotated coordinate
    bit-for-bit (ascending-j left fold, then one exact *0.125). The
    paper's learned R (alternating Procrustes/SVD) is a documented
    boundary like the NN models — SVD is not cross-engine-replicable
    arithmetic; on variance-skewed data the structured rotation already
    delivers the OPQ effect (recall lift pinned in
    `test_opq_rotation_lifts_recall_on_anisotropic_data`), and on the
    isotropic test corpus rotation is variance-neutral by construction.

    Scan-shaped: one JVM projection per vector, no shuffle, no Python.
    """
    first = embeddings.select(col).first()
    dims = len(first[col])
    signs = hadamard_signs(dims)
    scale = 1.0 / math.sqrt(dims)
    outs = []
    for i in range(dims):
        lits = ", ".join(f"{float(s)!r}D" for s in signs[i])
        outs.append(
            f"{scale!r}D * aggregate(zip_with({col}, array({lits}), "
            "(x, s) -> cast(x as double) * s), cast(0.0 as double), "
            "(a, v) -> a + v)"
        )
    return embeddings.select(
        "vec_id", F.expr("array(" + ", ".join(outs) + ")").alias(col)
    )


def opq_codes(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
) -> DataFrame:
    """PQ codes in the rotated space: rotate (scan-shaped projection),
    then the standard per-subspace train/encode. Output identical in
    shape to :func:`pq_codes` — (vec_id, sub, code)."""
    return pq_codes(opq_rotate(embeddings), m, ksub, iters)


def opq_adc_topk(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    n_queries: int = 5,
    knn: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k in the rotated space. Rotation is
    orthogonal, so true L2 distances are preserved exactly; only the
    quantization grid changes — which is the whole OPQ point. Output
    matches :func:`pq_adc_topk`: (query_id, neighbor_id, adist, rank)."""
    return pq_adc_topk(opq_rotate(embeddings), m, ksub, iters, n_queries, knn)


def ivfpq_topk(
    embeddings: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    n_queries: int = 5,
    knn: int = 5,
) -> DataFrame:
    """IVF-PQ: the composed faiss ANN layout — the coarse quantizer
    restricts each query to ``nprobe`` cells, asymmetric PQ distance
    ranks the candidates. Scans touch (cid, codes), never raw vectors.

    Plan shape: both quantizers are driver-held model state; the corpus
    projects once to (vec_id, cid, sub, code) with no shuffle; the probe
    set and ADC lookup table (a few hundred rows) broadcast; the only
    exchange is the final (query_id, vec_id) aggregation. At 10^12 rows
    cid doubles as the bucketing/partition key, so a probe reads only
    its cells' partitions (partition pruning on the coarse code).

    PQ here codes RAW vectors; :func:`ivfpq_res_topk` is the faiss
    residual layout (``by_residual``) with the same plan shape — kept
    separate so both encodings stay individually oracle-verified and the
    recall gap is measurable (test_ivfpq_residual_encoding_lifts_recall).
    """
    cents = ivf_train(embeddings, k, iters)
    books = pq_train(embeddings, m, ksub, iters)
    first = embeddings.select("embedding").first()
    dsub = len(first["embedding"]) // m
    spark = embeddings.sparkSession

    corpus = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _nearest_cid(cents).alias("cid"),
        F.posexplode(_codes_arr(books, dsub)).alias("sub", "code"),
    )

    queries = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    probe_rows = []
    for qr in queries:
        emb = [float(v) for v in qr["embedding"]]
        qid = int(qr["vec_id"])
        # nprobe nearest coarse cells: left-fold double distance, ties
        # on cid — the same ordering the SQL twin's row_number uses
        dists = []
        for ci, c in enumerate(cents):
            d = 0.0
            for x, cc in zip(emb, c):
                d += (x - cc) * (x - cc)
            dists.append((d, ci))
        dists.sort()
        probe_rows += [(qid, ci) for _, ci in dists[:nprobe]]
    probes = spark.createDataFrame(probe_rows, "query_id long, cid long")
    lut = spark.createDataFrame(
        _adc_lut_rows(queries, books, dsub),
        "query_id long, sub long, code long, d long",
    )

    scored = (
        corpus.join(F.broadcast(probes), "cid")
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .where(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= knn)
        .select(
            "query_id", "neighbor_id", "adist",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivfpq_res_topk(
    embeddings: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    n_queries: int = 5,
    knn: int = 5,
) -> DataFrame:
    """IVF-PQ with faiss's residual encoding layout (IndexIVFPQ
    ``by_residual=true``): PQ codes quantize ``x − centroid(cid)`` and
    the ADC lookup table is built per probed cell against the query's
    OWN residual in that cell — closing :func:`ivfpq_topk`'s documented
    raw-vector deviation.

    Plan shape matches :func:`ivfpq_topk` — both quantizers are
    driver-held model state; the corpus projects once to
    (vec_id, cid, sub, code) with no shuffle (the residual is a JVM
    ``zip_with`` against the broadcast centroid literal, computed inside
    the same projection); probes and the now cell-keyed ADC table
    (nprobe·M·KSUB rows per query) broadcast; the only exchange is the
    final (query_id, vec_id) aggregation. The extra cost vs raw-vector
    PQ is only the LUT factor nprobe — the scan side is identical."""
    cents = ivf_train(embeddings, k, iters)
    books = pq_train_residual(embeddings, cents, m, ksub, iters)
    first = embeddings.select("embedding").first()
    dims = len(first["embedding"])
    dsub = dims // m
    spark = embeddings.sparkSession

    cent_arr = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in cents]
    )
    assigned = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "embedding",
        _nearest_cid(cents).alias("cid"),
    ).withColumn(
        "res",
        F.zip_with(
            "embedding",
            F.element_at(cent_arr, (F.col("cid") + 1).cast("int")),
            lambda x, c: x.cast("double") - c,
        ),
    )
    corpus = assigned.select(
        "vec_id",
        "cid",
        F.posexplode(_codes_arr(books, dsub, "res")).alias("sub", "code"),
    )

    queries = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    probe_rows: list[tuple[int, int]] = []
    lut_rows: list[tuple[int, int, int, int, int]] = []
    for qr in queries:
        emb = [float(v) for v in qr["embedding"]]
        qid = int(qr["vec_id"])
        dists = []
        for ci, c in enumerate(cents):
            d = 0.0
            for x, cc in zip(emb, c):
                d += (x - cc) * (x - cc)
            dists.append((d, ci))
        dists.sort()
        for _, ci in dists[:nprobe]:
            probe_rows.append((qid, ci))
            rq = [x - cc for x, cc in zip(emb, cents[ci])]
            for j, book in enumerate(books):
                sub = rq[j * dsub : (j + 1) * dsub]
                for code, cv in enumerate(book):
                    d = 0.0
                    for x, cc in zip(sub, cv):
                        d += (x - cc) * (x - cc)
                    lut_rows.append(
                        (qid, ci, j, code, int(math.floor(d * 1e6)))
                    )
    probes = spark.createDataFrame(probe_rows, "query_id long, cid long")
    lut = spark.createDataFrame(
        lut_rows, "query_id long, cid long, sub long, code long, d long"
    )

    scored = (
        corpus.join(F.broadcast(probes), "cid")
        .join(F.broadcast(lut), ["query_id", "cid", "sub", "code"])
        .where(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= knn)
        .select(
            "query_id", "neighbor_id", "adist",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def sq8_codes(embeddings: DataFrame) -> DataFrame:
    """SQ8 scalar quantization — the third faiss quantizer family beside
    IVF and PQ (``ScalarQuantizer QT_8bit``): each dimension maps
    linearly onto 0..255 between its corpus min and max, 4× compression
    at near-zero recall cost on normalized embeddings.

    Fully declarative, no driver-held model state (unlike the k-means
    quantizers, whose codebooks are iterative): the per-dimension bounds
    are a 64-row aggregate broadcast back onto the exploded vector
    stream. ``code = floor((v - min) * 255.0 / (max - min))`` clamped to
    [0, 255]; a degenerate constant dimension codes 0. The float
    expression is written in one fixed evaluation order so both engines
    produce identical correctly-rounded doubles, then a single floor.

    Scale shape (10^9+ vectors): posexplode is narrow and shuffle-free;
    the only exchange is the 64-row bounds aggregate; encoding is a
    broadcast equi-join on ``dim``. Output (vec_id, dim, code) — the
    columnar code layout a scan-based ADC consumer reads.
    """
    ex = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.posexplode("embedding").alias("dim", "v0"),
    ).select("vec_id", "dim", F.col("v0").cast("double").alias("v"))
    bounds = ex.groupBy("dim").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    return ex.join(F.broadcast(bounds), "dim").select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.expr(
            "CASE WHEN mx = mn THEN CAST(0 AS BIGINT)"
            " ELSE CAST(least(255, greatest(0,"
            " floor((v - mn) * 255.0 / (mx - mn)))) AS BIGINT) END"
        ).alias("code"),
    )


def sq8_topk(
    embeddings: DataFrame, n_queries: int = 5, knn: int = 5
) -> DataFrame:
    """Symmetric-distance top-k over SQ8 codes: queries and corpus both
    live in code space, distance = Σ (code_q − code_v)² — pure BIGINT,
    order-independent, so the ranking is bit-stable in any engine.

    Plan shape: one encode pass (see :func:`sq8_codes`), the query-side
    codes (``n_queries × dims`` rows) broadcast against the corpus code
    stream on ``dim``, one map-side-combined (query, vector) aggregation,
    and the usual rank-1..k window with deterministic ties.
    """
    if n_queries < 1 or knn < 1:
        raise ValueError(
            f"n_queries ({n_queries}) and knn ({knn}) must be >= 1"
        )
    codes = sq8_codes(embeddings)
    q = codes.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        "dim",
        F.col("code").alias("qcode"),
    )
    scored = (
        codes.join(F.broadcast(q), "dim")
        .where(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.sum(
                (F.col("qcode") - F.col("code"))
                * (F.col("qcode") - F.col("code"))
            ).cast("long").alias("adist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= knn)
        .select(
            "query_id",
            "neighbor_id",
            "adist",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _cosine_trunc_expr(dims: int) -> str:
    """COSINE over the first ``dims`` dimensions only (prefix slice,
    prefix norms) — the Matryoshka truncation contract."""
    sl = f"slice({{side}}.embedding, 1, {dims})"
    dot = (
        f"aggregate(zip_with({sl.format(side='a')}, {sl.format(side='b')}, "
        "(x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )
    norm = (
        "sqrt(aggregate({s}, cast(0.0 as double), "
        "(acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    return (
        f"{dot} / ({norm.format(s=sl.format(side='a'))} * "
        f"{norm.format(s=sl.format(side='b'))})"
    )


def matryoshka_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    dims_trunc: int = 16,
    expand: int = 4,
) -> DataFrame:
    """Two-stage Matryoshka retrieval (Kusupati et al. 2022, the
    adaptive-retrieval recipe): stage 1 shortlists ``k·expand``
    candidates per query by cosine over the FIRST ``dims_trunc``
    dimensions (MRL-trained prefixes are themselves valid embeddings);
    stage 2 re-ranks only the shortlist with full-dimension cosine and
    keeps the top k.

    Scale shape: stage 1 is the only corpus-wide pass and it touches a
    d′/d fraction of the vector bytes (with the prefix stored as its own
    column/chunk the scan prunes to it); stage 2's inputs are
    ``n_queries·k·expand`` rows — a broadcast hash join against the full
    table, no second corpus scan shuffle. Both stages quantize scores to
    1e-6 before ranking (module convention) so candidate-set and rank
    boundaries are engine-stable; ties break on neighbor_id.
    """
    if dims_trunc < 1:
        raise ValueError(f"dims_trunc ({dims_trunc}) must be >= 1")
    if k < 1 or expand < 1 or n_queries < 1:
        raise ValueError(
            f"k ({k}), expand ({expand}) and n_queries ({n_queries}) "
            "must all be >= 1"
        )
    queries = embeddings.where(F.col("vec_id") < n_queries).alias("a")
    corpus = embeddings.alias("b")
    scored_t = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .where(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            (
                F.floor(F.expr(_cosine_trunc_expr(dims_trunc)) * F.lit(1e6))
                / F.lit(1e6)
            ).alias("cosine_trunc"),
        )
    )
    w_t = Window.partitionBy("query_id").orderBy(
        F.col("cosine_trunc").desc(), F.col("neighbor_id").asc()
    )
    cands = (
        scored_t.withColumn("trunc_rank", F.row_number().over(w_t))
        .where(F.col("trunc_rank") <= k * expand)
        .select("query_id", "neighbor_id", "cosine_trunc")
    )
    # stage 2: full-dim exact cosine on the shortlist only. The
    # shortlist is tiny -> broadcast; the full-vector fetches are hash
    # joins on vec_id, never a corpus rescan.
    full_q = embeddings.where(F.col("vec_id") < n_queries).alias("a")
    # each join carries its own broadcast hint (hints don't propagate
    # through a join result): shortlist ⋈ corpus streams the corpus once,
    # then the tiny query side broadcasts onto the 25-row shortlist
    reranked = (
        F.broadcast(cands.alias("c"))
        .join(
            embeddings.alias("b"),
            F.col("c.neighbor_id") == F.col("b.vec_id"),
        )
        .join(F.broadcast(full_q), F.col("c.query_id") == F.col("a.vec_id"))
        .select(
            "c.query_id",
            "c.neighbor_id",
            "c.cosine_trunc",
            (F.floor(F.expr(COSINE) * F.lit(1e6)) / F.lit(1e6)).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            "cosine_trunc",
            F.col("rank").cast("long").alias("rank"),
        )
    )


PCA_K = 2
PCA_ITERS = 48
PCA_TRAIN_SAMPLE = 512


def pca_train(
    embeddings: DataFrame,
    k: int = PCA_K,
    iters: int = PCA_ITERS,
    sample: int = PCA_TRAIN_SAMPLE,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Deterministic top-k PCA via power iteration + deflation — the
    dimensionality-reduction primitive real ANN stacks run before
    quantization (faiss ``PCAMatrix`` / OPQ's rotation cousin).

    Engine-portable arithmetic, the quantizer-family discipline:

    * the mean uses the exact scaled-integer trick of :func:`_lloyd`
      (``Σ floor(x·1e6)`` int64s, two IEEE divides);
    * the covariance is **integer-exact by construction**: entries are
      ``Σ q_i·q_j`` over ``q = floor((x−μ)·1e6)`` int64s — plain
      order-independent integer sums, so the SQL twin needs no ordered
      folds to reproduce it bit-for-bit (a documented fp6 quantization,
      like every scaled metric in this module);
    * power iteration (fixed ``iters``), Rayleigh quotient, and rank-1
      deflation run in pinned left-fold double arithmetic (ascending
      dim index), each normalize a correctly-rounded ``sqrt`` + divide;
    * init = the all-ones direction; sign fixed by making the largest-
      magnitude coordinate positive (eigenvector sign is arbitrary).

    Returns ``(mu, components[k][dims], eigenvalues[k])`` — driver-held
    model state (like the k-means codebooks), broadcast into scan-shaped
    projections by :func:`pca_project`.
    """
    import math as _math

    vecs = _train_vectors(embeddings, sample)
    n, dims = vecs.shape
    scaled = [[int(_math.floor(float(vecs[r][d]) * 1e6)) for d in range(dims)]
              for r in range(n)]
    mu = [((sum(scaled[r][d] for r in range(n)) / n) / 1e6)
          for d in range(dims)]
    q = [[int(_math.floor((float(vecs[r][d]) - mu[d]) * 1e6))
          for d in range(dims)] for r in range(n)]
    # integer covariance (row-major accumulation; ints are associative)
    cov = [[0] * dims for _ in range(dims)]
    for r in range(n):
        qr = q[r]
        for i in range(dims):
            qi = qr[i]
            if qi:
                row = cov[i]
                for j in range(dims):
                    row[j] += qi * qr[j]
    c = [[float(v) for v in row] for row in cov]
    comps: list[list[float]] = []
    eigs: list[float] = []
    for _ in range(k):
        v = [1.0] * dims
        s = 0.0
        for i in range(dims):
            s += v[i] * v[i]
        nrm = _math.sqrt(s)
        v = [x / nrm for x in v]
        for _t in range(iters):
            y = []
            for i in range(dims):
                acc = 0.0
                ci = c[i]
                for j in range(dims):
                    acc += ci[j] * v[j]
                y.append(acc)
            s = 0.0
            for i in range(dims):
                s += y[i] * y[i]
            nrm = _math.sqrt(s)
            if nrm == 0.0:
                break
            v = [x / nrm for x in y]
        # Rayleigh quotient λ = vᵀCv (pinned i-then-j fold)
        lam = 0.0
        for i in range(dims):
            acc = 0.0
            ci = c[i]
            for j in range(dims):
                acc += ci[j] * v[j]
            lam += v[i] * acc
        # sign convention: largest-|coordinate| positive
        big = 0
        for i in range(dims):
            if abs(v[i]) > abs(v[big]):
                big = i
        if v[big] < 0:
            v = [-x for x in v]
        comps.append(v)
        eigs.append(lam)
        for i in range(dims):
            for j in range(dims):
                c[i][j] = c[i][j] - lam * v[i] * v[j]
    return mu, comps, eigs


def pca_components(
    embeddings: DataFrame,
    k: int = PCA_K,
    iters: int = PCA_ITERS,
) -> DataFrame:
    """Trained components as exploded scalar rows (comp, dim, value_fp6,
    eigenvalue_fp6) — the ivf_centroids convention (arrays break the
    comparison harness's pandas canonicalizer)."""
    mu, comps, eigs = pca_train(embeddings, k, iters)
    import math as _math

    spark = embeddings.sparkSession
    rows = []
    for ci, (v, lam) in enumerate(zip(comps, eigs)):
        for d, x in enumerate(v):
            rows.append(
                (ci, d, int(_math.floor(x * 1e6)), int(_math.floor(lam)))
            )
    return spark.createDataFrame(
        rows, "comp long, dim long, value_fp6 long, eigenvalue_floor long"
    )


def pca_project(
    embeddings: DataFrame,
    k: int = PCA_K,
    iters: int = PCA_ITERS,
) -> DataFrame:
    """Corpus projection onto the trained components: one JVM left-fold
    expression per component against the broadcast model literals —
    scan-shaped, zero shuffles (beside the posexplode), no Python in the
    executor path. Output (vec_id, comp, proj_fp6)."""
    mu, comps, _ = pca_train(embeddings, k, iters)
    projs = []
    for v in comps:
        mu_lits = ", ".join(f"{m!r}d" for m in mu)
        v_lits = ", ".join(f"{x!r}d" for x in v)
        projs.append(
            F.expr(
                f"aggregate(zip_with(zip_with(embedding, array({mu_lits}),"
                " (x, m) -> cast(x as double) - m),"
                f" array({v_lits}), (cx, vv) -> cx * vv),"
                " cast(0.0 as double), (acc, t) -> acc + t)"
            )
        )
    return embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.posexplode(F.array(*projs)).alias("comp", "p"),
    ).select(
        "vec_id",
        F.col("comp").cast("long").alias("comp"),
        F.floor(F.col("p") * F.lit(1000000.0)).cast("long").alias("proj_fp6"),
    )


def embedding_dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension embedding-corpus health panel — the drift monitor a
    production embedding pipeline runs per batch (a upstream model or
    preprocessing change shows up as a shifted per-dim mean/range long
    before retrieval metrics move).

    Float discipline: every ELEMENT is quantized to ``floor(1e6·v)``
    first, then all aggregation is exact BIGINT — so the result is
    independent of accumulation order (a float sum is not: Spark's
    partition tree and DuckDB's single-threaded fold round differently).
    NaN elements are counted out-of-band (``n_nan``) and excluded from
    the moments.

    Scale shape: one ``posexplode`` + one map-side-combined groupBy on
    n_dims keys — the shuffle carries n_dims·n_partitions partial rows,
    nothing corpus-sized."""
    ex = embeddings.select(
        F.posexplode("embedding").alias("pos", "v")
    ).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("v").cast("double").alias("v"),
    )
    q = ex.select(
        "dim",
        F.when(F.isnan("v"), None)
        .otherwise(F.floor(F.col("v") * F.lit(1e6)))
        .cast("long")
        .alias("vq"),
    )
    return q.groupBy("dim").agg(
        F.count("vq").cast("long").alias("n_values"),
        F.count(F.when(F.col("vq").isNull(), 1)).cast("long").alias("n_nan"),
        F.sum("vq").cast("long").alias("sum_x1e6"),
        F.min("vq").cast("long").alias("min_x1e6"),
        F.max("vq").cast("long").alias("max_x1e6"),
        F.count(F.when(F.col("vq") == 0, 1)).cast("long").alias("n_zeroish"),
    )


def recall_eval(
    embeddings: DataFrame, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """ANN index QA: recall@k of each approximate method against the
    exact brute-force baseline — the acceptance gate a production vector
    index ships behind (faiss's own benchmark protocol), run as one
    declarative job.

    Methods evaluated at the same k: sign-bucket LSH
    (:func:`ann_lsh_topk`), SQ8 symmetric code distance
    (:func:`sq8_topk`), and two-stage Matryoshka
    (:func:`matryoshka_topk`). IVF variants are excluded on purpose —
    their codebooks are driver-held model state, so their recall is a
    property of a trained artifact, not of this corpus-only job.

    Output one row per (method, query): ``k_exact`` (exact-neighbor
    count, the denominator), ``n_hits``, ``recall_x1000``. The corpus
    passes happen inside the method queries; everything after is
    row-counted in n_queries·k — the joins here never touch the corpus.
    """
    # the exact baseline is read twice (denominator aggregate + hits
    # join) and is the expensive corpus-wide pass — persist so it runs
    # once (module convention: LSH/jaccard persist their reused
    # projections; bench.py clearCache releases the blocks)
    exact = (
        cosine_topk(embeddings, n_queries, k)
        .select("query_id", "neighbor_id")
        .persist()
    )
    per_method = [
        ("lsh", ann_lsh_topk(embeddings, n_queries, k=k)),
        ("sq8", sq8_topk(embeddings, n_queries, knn=k)),
        ("matryoshka", matryoshka_topk(embeddings, n_queries, k=k)),
    ]
    union = None
    for name, df in per_method:
        part = df.select(
            F.lit(name).alias("method"), "query_id", "neighbor_id"
        )
        union = part if union is None else union.unionByName(part)
    ex_n = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("k_exact")
    )
    hits = (
        union.join(
            exact.withColumn("hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("method", "query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"))
    )
    methods_df = embeddings.sparkSession.createDataFrame(
        [(name,) for name, _ in per_method], "method string"
    )
    grid = ex_n.crossJoin(F.broadcast(methods_df))
    return grid.join(hits, ["method", "query_id"], "left").select(
        "method",
        "query_id",
        "k_exact",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.expr("(1000 * coalesce(n_hits, 0)) DIV k_exact")
        .cast("long")
        .alias("recall_x1000"),
    )


def knn_label_eval(
    embeddings: DataFrame, n_queries: int = 20, k: int = 5
) -> DataFrame:
    """Embedding-quality probe via k-NN label voting — the classic
    "do nearest neighbors share labels?" sanity eval (the cheap stand-in
    for a linear-probe benchmark, run entirely in-engine): for each of
    the first ``n_queries`` vectors, predict its label as the majority
    label of its exact top-k cosine neighbors and compare to its own.

    Deterministic by construction: neighbor ranking is the module's
    floor-quantized cosine with vec_id tie-break; the vote breaks ties
    on (count DESC, label ASC). Output one row per query:
    ``true_label, pred_label, n_votes, correct``.

    The corpus pass is :func:`cosine_topk`'s broadcast scan; everything
    after operates on n_queries·k rows."""
    topk = cosine_topk(embeddings, n_queries, k).select(
        "query_id", "neighbor_id"
    )
    labels = embeddings.select("vec_id", "label")
    votes = (
        F.broadcast(topk)
        .join(labels, topk["neighbor_id"] == labels["vec_id"])
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("label").alias("pred_label"),
            "n_votes",
        )
    )
    truth = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
    )
    return truth.join(F.broadcast(pred), "query_id").select(
        "query_id",
        "true_label",
        "pred_label",
        "n_votes",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )
