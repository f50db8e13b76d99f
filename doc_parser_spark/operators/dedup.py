"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale notes (these run over 10^12 documents in the target deployment):

* **exact_dedup** — one hash-groupBy; map-side partial aggregation makes the
  shuffle carry only (hash, min_id, count) triples, not text.
* **minhash_signatures** — shingles explode inside one stage; the groupBy
  shuffles (doc_id, hash_i mins) only. Hash functions are
  ``md5(i || ':' || shingle)`` so the DuckDB oracle reproduces signatures
  bit-for-bit (no engine-specific hash).
* **lsh_candidate_pairs** — banding turns O(n²) similarity search into a
  self-join on band keys; the band key is a constant-width md5, so the join
  shuffles narrow rows. Bucket-size skew (a viral boilerplate shingle) is
  bounded by COUNTING buckets first and dropping degenerate bands with
  > ``max_bucket`` members before any membership is expanded into pairs.
* **ngram_jaccard_pairs** — inverted-index join (shingle → docs) with a
  per-shingle frequency cap (anti-join against the small *hot* set) for
  the same reason; exact Jaccard is computed only for candidate pairs
  sharing ≥ 1 shingle, and per-doc sizes join via shuffle (never
  broadcast — one row per document).
* **simhash** — 32-bit signature from per-token md5 bits; Hamming-adjacent
  buckets would be compared at scale. Oracle: pure-arithmetic hex decode +
  ``>>``/``&`` bit ops, identical in DuckDB (``__spark_entry__._simhash_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from doc_parser_spark.operators.text_analysis import NORM

N_HASHES = 12
N_BANDS = 4  # 3 rows per band


def _shingles_over_words(n: int = 3) -> str:
    """Word n-gram shingles over a pre-split ``w`` array column.

    The words array is materialized ONCE per row (projection) — inlining the
    normalize+split inside the transform lambda makes Catalyst re-evaluate
    the regex per shingle, an O(words²) blowup measured at 36s vs <1s on
    sf0.01. Short docs guard: Spark's ``sequence(1, 0)`` counts *down*
    (→ [1, 0]), unlike SQL generate_series, so size < n must special-case
    to an empty array for oracle parity."""
    return (
        f"CASE WHEN size(w) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(w) - {n - 1}), "
        f"i -> concat_ws(' ', slice(w, i, {n}))) END"
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicates via normalized-text md5: one row per content hash."""
    return (
        documents.select("doc_id", F.expr(f"md5({NORM})").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def shingle_docs(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs, distinct per document."""
    return (
        documents.select("doc_id", F.expr(f"split({NORM}, ' ')").alias("w"))
        .select("doc_id", F.explode(F.expr(_shingles_over_words(n))).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


def minhash_signatures(documents: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """doc_id → [min_i md5(i:shingle)] signature columns mh_0..mh_{k-1}."""
    pairs = shingle_docs(documents)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return pairs.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    documents: DataFrame,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    max_bucket: int = 50,
) -> DataFrame:
    """Candidate near-dup pairs sharing at least one LSH band."""
    if n_hashes <= 0 or n_bands <= 0 or n_hashes % n_bands != 0:
        raise ValueError(
            f"n_bands ({n_bands}) must divide n_hashes ({n_hashes}) "
            "evenly and both must be positive — a remainder silently "
            "discards hash functions (weaker LSH recall than requested)"
        )
    sigs = minhash_signatures(documents, n_hashes)
    rows_per_band = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            sigs.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    all_bands = bands[0]
    for other in bands[1:]:
        all_bands = all_bands.unionAll(other)
    # The banded projection is consumed three times below (bucket sizes,
    # survivor join, pair self-join); without a persist each consumer
    # recomputes the full minhash lineage (shingle explode x n_hashes md5),
    # the dominant cost. The persisted relation is 3 narrow columns per
    # (doc, band) — tiny next to the corpus text — so MEMORY_AND_DISK holds
    # at cluster scale where the corpus itself never could; production
    # minhash pipelines materialize exactly this table.
    all_bands = all_bands.persist(StorageLevel.MEMORY_AND_DISK)

    # Skew guard ordering matters at scale: COUNT the buckets first (a
    # count-only aggregate is map-side combinable and shuffles one long per
    # bucket), filter out degenerate buckets, and only THEN expand pairs via
    # a self-join on the surviving (band, band_key) keys. Collecting bucket
    # membership before the size filter would materialize a viral
    # boilerplate bucket's entire membership in one aggregation buffer.
    bucket_sizes = all_bands.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("n")
    )
    ok_keys = bucket_sizes.where(
        (F.col("n") > 1) & (F.col("n") <= max_bucket)
    ).select("band", "band_key")
    survivors = all_bands.join(ok_keys, ["band", "band_key"])
    a = survivors.select("band", "band_key", F.col("doc_id").alias("doc_a"))
    b = survivors.select("band", "band_key", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _candidate_intersections(
    documents: DataFrame, n: int, max_shingle_freq: int
):
    """Shared candidate machinery for the exact set-overlap operators
    (``ngram_jaccard_pairs``, ``containment_pairs``): returns
    ``(inter, sa, sb)`` — per-candidate-pair common-shingle counts plus
    the two doc-keyed size projections.

    The exploded shingle table feeds the size aggregate, the document
    frequency aggregate, and both sides of the inverted-index self-join;
    unpersisted, each consumer re-runs the explode over the full corpus
    (~6 scans). One materialization across executor disks beats six
    corpus scans at any scale; swap to DISK_ONLY (or a parquet
    materialization seam) when the shingle table outgrows cluster memory.

    The frequency cap is applied as an ANTI-join against the *hot*
    shingle set — hot shingles (df > cap) are few by construction, so
    that side is safely broadcastable at any corpus size, unlike the
    keep-list (≈ all shingles, corpus-sized). ``sa``/``sb`` are one row
    PER DOCUMENT — corpus-scale, never broadcast; callers join them with
    plain shuffle joins keyed on doc id."""
    pairs = shingle_docs(documents, n).persist(StorageLevel.MEMORY_AND_DISK)
    sizes = pairs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    freq = pairs.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    hot = freq.where(F.col("df") > max_shingle_freq).select("shingle")
    filtered = pairs.join(F.broadcast(hot), "shingle", "left_anti")
    a = filtered.alias("a")
    b = filtered.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("sb"))
    return inter, sa, sb


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 100,
) -> DataFrame:
    """Exact word-n-gram Jaccard over inverted-index candidate pairs."""
    inter, sa, sb = _candidate_intersections(documents, n, max_shingle_freq)
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.floor(
                    F.lit(1000000.0)
                    * F.col("n_common")
                    / (F.col("sa") + F.col("sb") - F.col("n_common"))
                )
                / F.lit(1000000.0)
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 100,
) -> DataFrame:
    """Directional shingle containment — the asymmetric complement of
    ``ngram_jaccard_pairs``. ``cont_a_in_b = |A∩B| / |A|`` catches the
    wrapper/quote relationships symmetric Jaccard misses: a short page
    fully quoted inside a long boilerplate-wrapped one scores near-zero
    Jaccard (union is dominated by the long page) but containment ≈ 1,
    which is exactly the Lee et al. 2022 / CC-Net motivation for keeping
    a one-sided signal next to the symmetric one.

    One row per unordered candidate pair with BOTH directions; pairs
    survive when either direction clears ``threshold``. Ratios are
    floored to 6 decimals (the same 1e6 integer-floor contract the
    Jaccard operator uses, so both engines hash identically).

    Scale shape: identical to ``ngram_jaccard_pairs`` — both ride
    ``_candidate_intersections`` (one persisted shingle projection,
    hot-shingle anti-join, inverted-index self-join, shuffle joins for
    the per-doc sizes). Nothing new shuffles."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold ({threshold}) must be in [0, 1]")
    inter, sa, sb = _candidate_intersections(documents, n, max_shingle_freq)

    def _ratio(num, den):
        return (F.floor(F.lit(1000000.0) * num / den) / F.lit(1000000.0))

    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            _ratio(F.col("n_common"), F.col("sa")).alias("cont_a_in_b"),
            _ratio(F.col("n_common"), F.col("sb")).alias("cont_b_in_a"),
        )
        .where(
            (F.col("cont_a_in_b") >= threshold)
            | (F.col("cont_b_in_a") >= threshold)
        )
    )


def simhash(documents: DataFrame, bits: int = 32) -> DataFrame:
    """Per-document SimHash from token md5s.

    32-bit variant: sum ±1 per bit over tokens, sign → bit. Uses only
    native expressions (conv/substring on md5 hex), no Python.

    Scan-shaped by construction: the whole signature folds inside ONE
    projection over the documents scan (`aggregate` over the token
    array), so there is no explode and **no shuffle** — the r4 bench's
    explode→groupBy formulation went super-linear at sf1 (16.4x at 10x
    data: 2.5M exploded rows through a 32-column hash aggregate),
    while this form is embarrassingly parallel at any scale. The ±1
    sums are integer and order-independent, so the emitted signature is
    bit-identical to the grouped formulation (and to the DuckDB twin)."""
    counters = (
        "aggregate("
        f"  transform(filter(split({NORM}, ' '), w -> w <> ''),"
        "    w -> cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint)),"
        f"  array_repeat(0L, {bits}),"
        "  (acc, h) -> zip_with("
        f"    acc, sequence(0, {bits - 1}),"
        "    (a, i) -> a + IF((shiftright(h, i) & 1L) = 1L, 1L, -1L)))"
    )
    sig = (
        f"aggregate(zip_with({counters}, sequence(0, {bits - 1}),"
        "  (s, i) -> IF(s > 0, shiftleft(1L, i), 0L)),"
        "  0L, (t, x) -> t + x)"
    )
    # token-less docs had no group in the grouped formulation (and have
    # none in the DuckDB twin) — keep that contract
    return (
        documents.where(
            F.expr(f"size(filter(split({NORM}, ' '), w -> w <> '')) > 0")
        )
        .select("doc_id", F.expr(sig).cast("long").alias("simhash"))
    )


def simhash_neardup_pairs(
    documents: DataFrame,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 500,
) -> DataFrame:
    """SimHash near-duplicate pairs via banded Hamming join.

    The classic scale design (Manku et al., WWW'07 "Detecting
    Near-Duplicates for Web Crawling"): split the signature into
    ``bands`` equal bit-bands — any pair within ``max_hamming ≤ bands - 1``
    must agree exactly on at least one band — so candidates come from a
    band-value equi-join, never an all-pairs scan. Degenerate bands are
    count-filtered BEFORE the self-join (same discipline as
    ``lsh_candidate_pairs``); the final Hamming check is a JVM-side
    ``bit_count(xor)``. At 100 TB the (band_no, band_val) pair is the
    bucketing key and each band bucket joins locally."""
    if bits % bands != 0:
        raise ValueError(
            f"bits ({bits}) must be divisible by bands ({bands}); "
            "otherwise the high bits silently fall out of every band"
        )
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be <= bands - 1 "
            f"({bands - 1}): the pigeonhole band-agreement guarantee "
            "does not hold past that, silently losing recall"
        )
    return banded_hamming_pairs(
        simhash(documents, bits),
        hash_col="simhash",
        bits=bits,
        bands=bands,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


def banded_hamming_pairs(
    sig: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 500,
) -> DataFrame:
    """Generic Manku-style banded Hamming join over any integer signature
    column — the shared engine behind ``simhash_neardup_pairs`` (text)
    and ``multimodal.image_dhash_neardup`` (perceptual image hashes).

    ``sig`` is one row per item with ``id_col`` + ``hash_col`` (a signed
    long holding ``bits`` signature bits; band extraction masks after the
    arithmetic shift, so the sign bits of a 64-bit hash land in the top
    band correctly). Emits (``{id}_a``, ``{id}_b``, ``hamming``) for every
    pair agreeing on at least one band with Hamming <= ``max_hamming`` —
    exhaustive under the pigeonhole guarantee ``max_hamming <= bands-1``
    (validated by the public callers).

    Scale shape — identical signatures are grouped BEFORE banding: the
    banded self-join runs over *distinct* hashes only, and group members
    expand back via two hash-equi joins at the very end. At web scale
    exact signature collision is the dominant duplicate mode (the same
    image re-hosted thousands of times), and the member-level join would
    re-pay every multiplicity inside every band bucket; measured 6.5 s →
    ~2 s on the 5 000-doc/20-distinct-hash perceptual-image corpus.
    ``max_bucket`` caps both degeneracies at hash granularity: viral
    identical-signature groups (> ``max_bucket`` members) and viral band
    buckets (> ``max_bucket`` distinct hashes) are dropped whole — the
    same disclosed recall cap the member-level formulation applied."""
    w = bits // bands
    mask = (1 << w) - 1
    # (id, hash) is scanned three times (multiplicity agg + both
    # expansion joins) — persist so the upstream signature computation
    # (bit-agg columns, or the image-decode kernel) runs once
    members = sig.select(id_col, hash_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # one row per distinct signature with its multiplicity; consumed by
    # the banding below AND both expansion joins (narrow: hash + count)
    groups = (
        members.groupBy(hash_col)
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") <= max_bucket)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    banded = groups.select(
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_no"),
                        F.shiftright(F.col(hash_col), i * w)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select(hash_col, "band.band_no", "band.band_val")
    # Three consumers (bucket-size agg, survivor join, pair self-join):
    # without a persist each re-runs the upstream signature lineage —
    # for the perceptual-image caller that is the full PNG encode+decode
    # Python kernel (same trap the LSH banding fixed in round 2).
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    ok = (
        banded.groupBy("band_no", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") >= 2) & (F.col("n") <= max_bucket))
        .select("band_no", "band_val")
    )
    surv = banded.join(ok, ["band_no", "band_val"])
    a = surv.alias("a")
    b = surv.alias("b")
    hash_pairs = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .where(F.col(f"a.{hash_col}") < F.col(f"b.{hash_col}"))
        .select(
            F.col(f"a.{hash_col}").alias("ha"),
            F.col(f"b.{hash_col}").alias("hb"),
        )
        .distinct()  # a hash pair may collide in several bands
        .select(
            "ha",
            "hb",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        # tiny (distinct near-dup hash pairs); materializing it eagerly
        # lets the banded projection — now fully consumed — release its
        # cache instead of leaking for the session (house pattern:
        # web.host_pagerank). members/groups stay persisted: the
        # returned plan still reads them lazily at action time.
        .localCheckpoint(eager=True)
    )
    banded.unpersist()
    ma = members.alias("ma")
    mb = members.alias("mb")
    cross = (
        hash_pairs.join(ma, F.col("ha") == F.col(f"ma.{hash_col}"))
        .join(mb, F.col("hb") == F.col(f"mb.{hash_col}"))
        .select(
            F.least(
                F.col(f"ma.{id_col}"), F.col(f"mb.{id_col}")
            ).alias(f"{id_col}_a"),
            F.greatest(
                F.col(f"ma.{id_col}"), F.col(f"mb.{id_col}")
            ).alias(f"{id_col}_b"),
            "hamming",
        )
    )
    same_groups = groups.where(F.col("n_members") >= 2).select(hash_col)
    same = (
        ma.join(same_groups, hash_col)
        .join(mb, hash_col)
        .where(F.col(f"ma.{id_col}") < F.col(f"mb.{id_col}"))
        .select(
            F.col(f"ma.{id_col}").alias(f"{id_col}_a"),
            F.col(f"mb.{id_col}").alias(f"{id_col}_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return cross.unionAll(same)


def dup_clusters(
    pairs: DataFrame,
    documents: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Near-duplicate pairs → connected components: (doc_id, cluster_id)
    with cluster_id = the smallest doc_id in the component.

    This is the step that turns pairwise candidates (``lsh_candidate_pairs``,
    ``simhash_neardup_pairs``…) into dedup groups one canonical document
    can be kept from. At 10^12 documents a driver-side union-find is
    impossible, so this runs the alternating **large-star / small-star**
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SOCC'14): every iteration is two groupBy+join rounds over the
    edge set, components collapse to stars rooted at their minimum in
    O(log²) iterations (O(log) on real near-dup graphs, which are
    overwhelmingly tiny cliques and short chains — typically 2-3 rounds).

    Scale notes:

    * each iteration ``localCheckpoint``s the edge set — iterative joins
      otherwise stack lineage until planning itself dominates;
    * convergence is an exact set comparison, not a count heuristic —
      equal counts do not imply a fixpoint. The cheap count (free on the
      just-checkpointed relation) gates the exact probe: when counts
      differ the sets cannot be equal and the probe is skipped, and the
      probe itself is ONE full-outer-join job (a null on either side ⇒
      difference) instead of two ``exceptAll`` scans;
    * ``pairs`` input is never collected; singletons never enter the
      edge set at all (they join back at the end from ``documents``),
      so the iteration cost scales with the number of *duplicated*
      documents, a small fraction of the corpus.

    ``documents`` (optional, needs ``doc_id``) adds singleton rows with
    ``cluster_id = doc_id`` so the output labels the full corpus.
    """
    edges = (
        pairs.select(F.col(pairs.columns[0]).alias("u"), F.col(pairs.columns[1]).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        # materialize the input edge set ONCE: inside iteration 1's DAG the
        # edges subtree appears 4x (sym = edges ∪ edges-flipped, and sym
        # feeds both the min-neighbor agg and the large-star join), so an
        # upstream candidate pipeline (minhash → bands → self-join) would
        # otherwise be re-executed 4x before the first checkpoint
        .localCheckpoint(eager=True)
    )
    prev = None
    prev_n = -1
    for _ in range(max_iter):
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: hang every larger neighbor of u onto min(Γ(u) ∪ {u})
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: orient high→low, hang u and its smaller neighbors
        # onto min(Γ⁻(u) ∪ {u})
        oriented = (
            large.select(
                F.greatest(F.col("u"), F.col("v")).alias("u"),
                F.least(F.col("u"), F.col("v")).alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        mins2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            oriented.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n = small.count()  # free: relation was just checkpointed
        if prev is not None and n == prev_n:
            # counts equal → run the exact one-job set probe: both sides
            # are distinct, so any full-outer row with a null half is a
            # symmetric-difference witness
            diff = small.join(
                prev.select(F.col("u").alias("pu"), F.col("v").alias("pv")),
                (F.col("u") == F.col("pu")) & (F.col("v") == F.col("pv")),
                "full_outer",
            ).where(F.col("u").isNull() | F.col("pu").isNull())
            if diff.isEmpty():
                edges = small
                break
        prev = small
        prev_n = n
        edges = small
    member = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = (
        edges.select(F.col("v").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    labels = (
        member.union(roots).groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id"))
    )
    if documents is not None:
        labels = (
            documents.select("doc_id")
            .join(labels, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
            )
        )
    return labels


def cluster_representatives(
    clusters: DataFrame, documents: DataFrame
) -> DataFrame:
    """Quality-aware keep-best selection per near-dup cluster: instead of
    the min-doc_id canonical ``dup_clusters``/``curate_flags`` default,
    keep the LONGEST member (ties → lowest doc_id) — the RefinedWeb /
    Dolma convention, where near-dup groups usually contain truncated or
    boilerplate-wrapped variants of one page and the longest capture is
    the best one.

    Input: ``clusters`` = (doc_id, cluster_id) from ``dup_clusters``;
    ``documents`` for the fitness signal. Output one row per cluster:
    ``cluster_id, rep_doc_id, rep_chars, n_members``.

    Scale shape: one shuffle join on doc_id (both sides narrow), then a
    single struct-max aggregation — the arg-max rides ``max(struct(
    n_chars, -doc_id))`` with map-side partial combine, the same
    no-window pattern as ``web.latest_capture``; nothing sorts cluster
    members, nothing collects."""
    fitness = documents.select(
        "doc_id",
        F.length(F.coalesce("text", F.lit(""))).cast("long").alias("nc"),
    )
    return (
        clusters.join(fitness, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max(F.struct(F.col("nc"), (-F.col("doc_id")).alias("neg_id"))).alias(
                "best"
            ),
        )
        .select(
            "cluster_id",
            (-F.col("best.neg_id")).cast("long").alias("rep_doc_id"),
            F.col("best.nc").cast("long").alias("rep_chars"),
            "n_members",
        )
    )


def line_dedup(documents: DataFrame, max_occurrences: int = 1) -> DataFrame:
    """Corpus-global duplicate-line removal (the C4 / MassiveText
    boilerplate pass): drop every line whose exact trimmed text occurs in
    more than ``max_occurrences`` documents' line streams, then rebuild
    each document from its surviving lines in original order.

    Output: ``doc_id, clean_text, n_lines_kept, n_lines_dropped``.

    Scale shape (10^12 docs):

    * lines explode once (``posexplode`` keeps the rebuild order as data,
      no window function);
    * the global counts groupBy is map-side combined and its *output* is
      filtered to the hot set (``cnt > max_occurrences``) before any join
      — the blocklist is a tiny fraction of distinct lines, so the
      ``LEFT ANTI`` join back shuffles the line stream against a small
      relation instead of joining the full counts table;
    * viral-line skew ("Home", "Copyright...") lives only on the counts
      groupBy, where partial aggregation collapses it map-side; the
      anti-join probe side is near-uniform because the stream is keyed by
      the line text *after* the hot keys were reduced to one row each;
    * rebuild is one groupBy(doc_id) over narrow (pos, line) structs with
      ``sort_array`` + ``array_join`` — deterministic order, no
      ``collect`` anywhere.
    """
    # coalesce: split(NULL) yields NULL, and size(NULL) is -1 under
    # non-ANSI Spark defaults — a NULL-text doc must count 0 lines
    arr = documents.select(
        "doc_id",
        F.expr(
            "transform(filter(split(coalesce(text, ''), '\\n'),"
            " l -> trim(l) <> ''), l -> trim(l))"
        ).alias("ln"),
    )
    lines = arr.select("doc_id", F.posexplode("ln").alias("pos", "line"))
    hot = (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > max_occurrences)
        .select("line")
    )
    kept = lines.join(hot, "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.expr("transform(sort_array(collect_list(struct(pos, line))), s -> s.line)"),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = arr.select("doc_id", F.size("ln").alias("n_lines_total"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
            (F.coalesce("n_lines_total", F.lit(0)) - F.coalesce("n_lines_kept", F.lit(0)))
            .cast("long")
            .alias("n_lines_dropped"),
        )
    )


def bloom_seen(
    new_docs: DataFrame,
    seen_docs: DataFrame,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> DataFrame:
    """Bloom-filter membership test for incremental crawl dedup: which of
    ``new_docs`` carry content already present in ``seen_docs``?

    The production shape for "have we crawled this before" when the seen
    set is too large to anti-join every batch (Broder & Mitzenmacher
    2004, "Network Applications of Bloom Filters"; CommonCrawl-style
    frontier dedup): the seen side is reduced once to a fixed ``m_bits``
    sketch, new batches probe it. Each document's content key is
    ``md5(text)``; hash function *j* sets bit
    ``h_j = int(md5(j ':' key)[:12 hex]) mod m`` — 48-bit arithmetic
    decode, engine-portable. A probe is *seen* iff all ``k`` of its bits
    are set; false positives are possible by construction (rate
    ``(1 - e^(-kn/m))^k``), false negatives are not. The output keeps an
    ``exact_seen`` comparison column so the false-positive rate is
    directly observable.

    Scale shape: the set-bit relation is ``distinct (bit position)`` —
    bounded above by ``m_bits`` regardless of corpus size — so Spark's
    planner broadcasts it to the probe join and the probe side never
    shuffles; the all-k reduction groups on doc_id (one shuffle). On a
    real cluster the same sketch compacts further into
    ``m/64`` longs via ``bit_or`` aggregation (or
    ``DataFrame.stat.bloomFilter``) and ships as one broadcast bitmap;
    the relational form is kept here because it is oracle-checkable
    bit-for-bit. ``exact_seen`` is a hash anti-join — the exact
    (shuffling) path the sketch replaces at scale; it rides along here
    for observability at test sizes.
    """
    if m_bits <= 0 or k <= 0:
        raise ValueError(f"m_bits ({m_bits}) and k ({k}) must be positive")

    def positions(col: str):
        # NULL text keys as '' (the module's null-text convention —
        # md5(NULL) is NULL, concat_ws silently drops it, and every
        # NULL-text doc would share one bit set while the exact join
        # below could never match them)
        key = F.md5(F.coalesce(F.col(col), F.lit("")))
        return [
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws(":", F.lit(str(j)), key)), 1, 12),
                    16,
                    10,
                ).cast("long")
                % F.lit(m_bits)
            ).alias(f"p{j}")
            for j in range(k)
        ]

    bits = (
        seen_docs.select(F.explode(F.array(*positions("text"))).alias("pos"))
        .distinct()
    )
    probe = new_docs.select(
        "doc_id", F.explode(F.array(*positions("text"))).alias("pos")
    )
    hits = (
        probe.join(bits.withColumn("hit", F.lit(1)), "pos", "left")
        .groupBy("doc_id")
        .agg((F.sum(F.coalesce("hit", F.lit(0))) == F.lit(k)).alias("bloom_seen"))
    )
    exact = (
        new_docs.select(
            "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("key")
        )
        .join(
            seen_docs.select(
                F.md5(F.coalesce("text", F.lit(""))).alias("key")
            ).distinct()
            .withColumn("ex", F.lit(True)),
            "key",
            "left",
        )
        .select("doc_id", F.coalesce("ex", F.lit(False)).alias("exact_seen"))
    )
    return (
        new_docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("bloom_seen", F.lit(False)).alias("bloom_seen"),
            F.coalesce("exact_seen", F.lit(False)).alias("exact_seen"),
        )
    )


def dedup_eval(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Dedup-stack QA: precision/recall of the approximate near-dup
    detectors against the exact n-gram-Jaccard ground truth — the
    acceptance measurement a production dedup pipeline tunes its
    band/hash parameters by (the dedup twin of
    ``similarity.recall_eval``).

    Ground truth = :func:`ngram_jaccard_pairs` at ``threshold`` (exact
    Jaccard over inverted-index candidates). Methods: MinHash-LSH
    candidate pairs (expected high recall / low precision — they are
    pre-verification candidates by design) and banded-Hamming SimHash
    pairs. Corpus passes happen inside the three pair queries; the
    metric assembly joins pair-sized relations only, and the one-row
    truth total rides a broadcast cross join (the scalar pattern
    doc_vocab_spectrum uses)."""
    truth = (
        ngram_jaccard_pairs(documents, threshold=threshold)
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    methods = [
        ("minhash_lsh", lsh_candidate_pairs(documents)
         .select("doc_a", "doc_b")),
        ("simhash", simhash_neardup_pairs(documents).select(
            F.col("doc_id_a").alias("doc_a"),
            F.col("doc_id_b").alias("doc_b"),
        )),
    ]
    per_method = None
    for name, pred in methods:
        joined = pred.join(
            truth.withColumn("hit", F.lit(1)), ["doc_a", "doc_b"], "left"
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_pred"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
        ).select(F.lit(name).alias("method"), "n_pred", "n_hits")
        per_method = (
            joined if per_method is None else per_method.unionByName(joined)
        )
    tot = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    return per_method.crossJoin(F.broadcast(tot)).select(
        "method",
        "n_pred",
        "n_truth",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.expr("(1000 * coalesce(n_hits, 0)) DIV greatest(n_pred, 1)")
        .cast("long")
        .alias("precision_x1000"),
        F.expr("(1000 * coalesce(n_hits, 0)) DIV greatest(n_truth, 1)")
        .cast("long")
        .alias("recall_x1000"),
    )
