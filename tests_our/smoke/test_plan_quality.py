"""Physical-plan quality gates (the 100 TB questions, SURVEY.md §4).

Would this plan survive a 100× scale-up? These tests pin the properties
that make it so: column pruning reaching the parquet scan, predicate
pushdown, broadcast joins for small sides, map-side partial aggregation,
and no accidental extra shuffles around the extraction kernel.
"""

import contextlib
import io

import pytest

pytestmark = pytest.mark.smoke

SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_column_pruning_reaches_scan(spark):
    # text analytics must scan only (doc_id, text) — never lang/source/n_chars
    for q in ("doc_token_stats", "doc_exact_dedup", "doc_fingerprint"):
        plan = plan_of(spark, q)
        read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert read_schemas, q
        assert all("doc_id:bigint,text:string" in l for l in read_schemas), (
            q, read_schemas,
        )
        assert all("n_chars" not in l and "source" not in l for l in read_schemas)


def test_predicate_pushdown(spark):
    plan = plan_of(spark, "q3_top_unshipped")
    assert "GreaterThan(l_shipdate" in plan  # reached the lineitem scan
    assert "LessThan(o_orderdate" in plan  # reached the orders scan
    plan = plan_of(spark, "emb_cosine_topk")
    assert "LessThan(vec_id,5)" in plan  # query-side filter pushed


def test_map_stage_ops_have_zero_exchanges(spark):
    # the session-12 projections/codec kernels claim pure-map scale
    # shape — pin it: no Exchange anywhere in the physical plan
    for q in ("av_wav_stats", "av_video_stats", "doc_readability",
              "doc_ttr"):
        plan = plan_of(spark, q)
        assert "Exchange" not in plan, q


def test_matryoshka_rerank_is_hash_joined(spark):
    # stage 1 is the intentional BNLJ shortlist; stage 2's two shortlist
    # joins must be explicit-hint broadcast HASH joins (never sort-merge
    # — hints don't propagate through a join result, so each carries its
    # own). autoBroadcast disabled => any BHJ present is hint-pinned.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(spark, "emb_matryoshka_topk")
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_small_dims_broadcast(spark):
    # true dims (part, nation) carry explicit hints; the tiny ANN query side
    # rides a broadcast nested-loop
    plan = plan_of(spark, "part_revenue_rank")
    assert "BroadcastHashJoin" in plan
    plan = plan_of(spark, "supplier_balance_rank")
    assert "BroadcastHashJoin" in plan
    plan = plan_of(spark, "emb_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan  # tiny query side broadcast


def test_no_fact_table_broadcast_hints(spark):
    # With autoBroadcastJoinThreshold disabled, a BroadcastHashJoin can only
    # come from an EXPLICIT hint. Fact-scale tables (lineitem/orders/
    # customer) must not carry one — at 100× they OOM the executors; AQE is
    # free to choose broadcast at runtime when a side is actually small.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(spark, "q3_top_unshipped")
        assert "BroadcastHashJoin" not in plan  # no hints on orders/customer
        plan = plan_of(spark, "segment_order_stats")
        assert "BroadcastHashJoin" not in plan  # no hint on customer
        plan = plan_of(spark, "q5_revenue_by_nation")
        # exactly the three dim hints: supplier, nation, region
        # (formatted explain renders each node twice: tree + detail)
        assert plan.count("BroadcastHashJoin") == 2 * 3
        plan = plan_of(spark, "emb_cosine_neardup")
        assert "BroadcastHashJoin" not in plan  # corpus-sized self-join: no hints
        plan = plan_of(spark, "doc_simhash_neardup")
        assert "BroadcastHashJoin" not in plan  # band self-join: no hints
        plan = plan_of(spark, "doc_ngram_jaccard")
        # the only hinted broadcast is the (tiny) hot-shingle ANTI-join
        # side, which shows up once per side of the self-join; the
        # corpus-sized sizes/inverted-index joins must not broadcast
        assert plan.count("BroadcastHashJoin Inner") == 0
        assert plan.count("BroadcastHashJoin LeftAnti") <= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partial_aggregation(spark):
    # groupBy must plan a map-side partial HashAggregate before the shuffle
    plan = plan_of(spark, "doc_exact_dedup")
    assert plan.count("HashAggregate") >= 2
    plan = plan_of(spark, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_extraction_has_single_intentional_shuffle(spark):
    # salt repartition is the ONLY exchange; kernel output flows straight out
    from doc_parser_spark.operators.extract import extract_documents
    from doc_parser_spark.sources.pages import pages_df

    df = extract_documents(pages_df(spark, 50, num_partitions=2), salt_partitions=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Exchange") <= 2  # one per AQE plan rendering
    assert "xxhash64(url" in plan  # and it is the salt
    assert plan.count("MapInPandas") >= 1


def test_web_ops_plan_shape(spark):
    # URL dedup: one hash groupBy, no join; PII: pure projection, no exchange
    plan = plan_of(spark, "web_url_dedup")
    assert "Join" not in plan and plan.count("HashAggregate") >= 2
    plan = plan_of(spark, "doc_pii_stats")
    assert "Exchange" not in plan and "Join" not in plan
    # C4 cleaning: codegen'd array expressions only — scan-speed projection
    plan = plan_of(spark, "doc_c4_clean")
    assert "Exchange" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    # robots verdict: equi-joins only (host, then doc_id) — a nested-loop
    # against the corpus would be quadratic at crawl scale
    plan = plan_of(spark, "web_robots_filter")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semi_anti_join_plan_shape(spark):
    # EXISTS/NOT EXISTS must plan as hash semi/anti joins (the extra
    # range predicate rides as the join condition), never nested loops
    plan = plan_of(spark, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    plan = plan_of(spark, "q22_inactive_customers")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_curation_funnel_no_cartesian(spark):
    # the composed funnel joins 6 doc_id-keyed relations — all equi-joins;
    # a cartesian/nested-loop anywhere would explode at corpus scale
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(spark, "doc_curation_funnel")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" not in plan  # no corpus-sized broadcasts
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_top_terms_plan_shape(spark):
    # per-lang rank must ride the WindowGroupLimit pushdown (top-k
    # maintained per partition before the final sort — without it every
    # (lang, term) row crosses the window shuffle); the corpus-size
    # scalar must broadcast, never shuffle the term table against it
    plan = plan_of(spark, "doc_top_terms")
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row n_corpus scalar
    assert plan.count("HashAggregate") >= 4  # partial+final for tf and df
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas and all("source" not in l for l in read_schemas)


def test_host_stats_plan_shape(spark):
    # one aggregation tree on the canonical host (the exact-distinct adds
    # an Expand, not a join); nothing corpus-sized joins or broadcasts
    plan = plan_of(spark, "web_host_stats")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial combine


def test_dsir_plan_shape(spark):
    # the bucket model (<= n_buckets rows) must BROADCAST into the scoring
    # join — the corpus side never shuffles for it; exactly ONE bucket-key
    # exchange (totals ride a window over the counts relation, not a
    # second corpus-wide gram aggregation)
    plan = plan_of(spark, "doc_dsir_weights")
    assert "BroadcastHashJoin" in plan
    lines = plan.splitlines()
    bucket_exchanges = [
        l for l in lines if "hashpartitioning(bucket" in l
    ]
    assert len(bucket_exchanges) == 1, bucket_exchanges
    read_schemas = [l for l in lines if "ReadSchema" in l]
    assert read_schemas and all("source" not in l for l in read_schemas)


def test_semdedup_plan_shape(spark):
    # cluster-local pairing: the self-join must be a shuffle equi-join ON
    # cid (cid is the 100 TB bucketing key) — never a cartesian/nested-loop
    # over the corpus
    plan = plan_of(spark, "emb_semdedup")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_classifier_plan_shape(spark):
    # the model relation (n_buckets x |classes| rows) must BROADCAST into
    # the scoring join — the corpus side never shuffles for it — and the
    # scan must read only (doc_id, text)
    plan = plan_of(spark, "doc_classifier_label")
    assert "BroadcastHashJoin" in plan
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas and all(
        "lang" not in l and "source" not in l for l in read_schemas
    )


def test_bloom_seen_plan_shape(spark):
    # both the sketch probe and the exact ridealong must be equi-joins —
    # a membership test that degenerates to a cartesian would melt at scale
    plan = plan_of(spark, "doc_bloom_seen")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_domain_mix_plan_shape(spark):
    # one map-side-combined aggregation on source; the normalizing window
    # runs over the per-source relation (SinglePartition over ~|domains|
    # rows), never over the corpus
    plan = plan_of(spark, "doc_domain_mix")
    lines = plan.splitlines()
    assert any("partial" in l.lower() for l in lines)
    src_exchanges = [l for l in lines if "hashpartitioning(source" in l]
    assert len(src_exchanges) == 1, src_exchanges
    read_schemas = [l for l in lines if "ReadSchema" in l]
    assert read_schemas and all("doc_id" not in l for l in read_schemas)


def test_ppl_buckets_plan_shape(spark):
    # lm_fit model joins stay equi-joins; the scan reads only the three
    # needed columns
    plan = plan_of(spark, "doc_ppl_buckets")
    assert "CartesianProduct" not in plan
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas and all(
        "source" not in l and "n_chars" not in l for l in read_schemas
    )


def test_pagerank_plan_shape(spark):
    # every sweep is an equi-join on the host key + a map-side-combined
    # aggregation; a cartesian anywhere would melt on a 10^8-host graph
    plan = plan_of(spark, "web_host_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_plan_shape(spark):
    # the merge-sorted-union rewrite must cost exactly ONE key shuffle
    # (the window) — no range/theta join, no cartesian — and the
    # event_type filters must reach both parquet scans
    plan = plan_of(spark, "events_asof_click")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    lines = plan.splitlines()
    key_exchanges = [l for l in lines if "hashpartitioning(user_id" in l]
    assert len(key_exchanges) == 1, key_exchanges
    pushed = [l for l in lines if "PushedFilters" in l]
    assert pushed and all("EqualTo(event_type" in l for l in pushed)


def test_interval_join_plan_shape(spark):
    # the bucketized rewrite must plan as an EQUI-join on (key, bucket) —
    # a raw range predicate would fall back to a per-key nested loop
    plan = plan_of(spark, "events_error_click_window")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_ivfpq_plan_broadcasts_model_state_only(spark):
    """IVF-PQ: the probe set and ADC lookup table (driver-held model
    state, a few hundred rows) broadcast; the corpus never does, and
    nothing degenerates to a cartesian product."""
    plan = plan_of(spark, "emb_ivfpq_topk")
    assert "BroadcastHashJoin" in plan  # probes + lut ride broadcasts
    assert "CartesianProduct" not in plan
    # the only exchange keys are the final per-(query, vector) agg /
    # rank window — the corpus side is a stateless projection (no
    # corpus-wide broadcast exchange of the embeddings relation)
    assert "embeddings" not in [
        l for l in plan.splitlines() if "BroadcastExchange" in l
    ]


def test_pq_adc_plan_no_cartesian(spark):
    plan = plan_of(spark, "emb_pq_adc_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_latest_capture_plan_is_single_hash_agg(spark):
    # struct-max survivor: one hash groupBy (partial + final), no window
    # sort, no join — the window-rank formulation would plan a full sort
    # of every capture inside each url partition
    # struct-typed agg buffers aren't hash-agg mutable, so Spark plans
    # SortAggregate — the part that matters at scale is still there:
    # partial_max BEFORE the exchange (map-side combine: one combined row
    # per partition×url shuffles) and exactly one exchange
    plan = plan_of(spark, "web_latest_capture")
    assert "partial_max" in plan
    # formatted explain renders each node twice (tree + detail): <=2 means
    # exactly one Exchange, like test_extraction_has_single_intentional_shuffle
    assert plan.count("Exchange") <= 2
    assert "Window" not in plan and "Join" not in plan


def test_extract_incremental_plan_shape(spark):
    # anti-join on (url, content_hash): the prior snapshot is corpus-sized
    # in production, so the operator must carry NO broadcast hint (with the
    # threshold disabled, any BroadcastHashJoin could only come from a
    # hint; AQE may still pick one at runtime when a side is truly small).
    # sha256 stays JVM-side: no Python eval nodes.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(spark, "extract_incremental")
        assert "LeftAnti" in plan
        assert "BroadcastHashJoin" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_script_profile_plan_is_scan_speed(spark):
    # per-row projection only: no exchange, no join, no Python nodes
    plan = plan_of(spark, "doc_script_profile")
    assert "Exchange" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_template_strip_plan_shape(spark):
    # pure relational plan: no Python nodes, no cartesian blowup; the
    # line stream must reach the template set via a hash-keyed anti join
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "web_template_strip")
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "LeftAnti" in plan
        # the doc-frequency groupBy combines map-side before its exchange
        assert "partial_count" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bm25_plan_shape(spark):
    # term filter lands before aggregation; df + corpus scalar broadcast;
    # final top-k is TakeOrderedAndProject, not a global Sort
    plan = plan_of(spark, "doc_bm25_topk")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan


# Queries whose plans legitimately carry a special node. Everything else
# must be pure relational: no cartesian blowup, no Python in the plan.
_BNLJ_OK = {
    # tiny broadcast sides by construction: query vectors, driver-held
    # models (classifier weights, LM, perplexity buckets), corpus scalar
    "emb_cosine_topk", "doc_classifier_label", "doc_lm_fit",
    "doc_ppl_buckets", "doc_top_terms",
    # one-row bigram-type-count relation cross-joined back (scalar)
    "doc_kn_bigrams",
    # inference half of the KN model: same scalar n_types cross join
    "doc_kn_score",
    # feature panel composes the KN channel, inheriting that scalar
    "doc_features",
    # grid over the feature panel: inherits the KN scalar (its own total
    # is a ≤16-row window sum now, not a cross join)
    "doc_quality_grid",
    # spectrum totals: one-row aggregate cross-joined back (scalar)
    "doc_vocab_spectrum",
    # stage-1 brute-force shortlist: tiny query side broadcast, like
    # emb_cosine_topk (stage 2 is pinned to hash joins by its own test)
    "emb_matryoshka_topk",
    # composes the matryoshka + cosine baselines, inheriting their
    # intentional query-side BNLJ
    "emb_recall_eval",
    # one-row truth-total cross-joined back (scalar)
    "doc_dedup_eval",
    # rides the cosine_topk brute-force baseline (query-side broadcast)
    "emb_knn_label_eval",
}
_PANDAS_OK = {
    # the Arrow-batched extraction kernel IS the operator here
    "extract_pages", "extract_chunks", "extract_wrapped_docs",
    "extract_links", "extract_image_refs", "extract_spans",
    "extract_table_cells", "extract_wet", "extract_page_meta",
    "extract_boilerplate_blocks", "extract_charset", "extract_warc_records",
    "web_link_graph", "web_anchor_text", "web_frontier_urls",
    # politeness schedule rides the kernel-extracted frontier
    "web_polite_schedule",
    # the Arrow-batched native image decode IS the operator
    "img_dhash", "img_dhash_neardup",
    # Arrow-batched ingestion kernels: WARC header walk, microdata DOM
    # walk, sitemap XML parse
    "extract_http_headers", "extract_microdata", "web_sitemap_urls",
    "web_header_census",
    # session-10 Arrow-batched kernels: RSS/Atom XML parse, magic-byte
    # sniff, hreflang DOM walk
    "web_feed_entries", "web_mime_verdicts", "web_hreflang_clusters",
    "web_index_verdicts", "web_dom_templates",
    "web_link_graph_dofollow", "web_page_link_features", "web_pagerank_real",
    # LAION-pair curation rides the image-refs extraction kernel
    "web_image_candidates",
    # coverage reconciliation rides the sitemap XML kernel
    "web_sitemap_coverage",
    # the Arrow-batched native WAV/AVI codecs ARE the operator (and the
    # curation gate / fingerprint pair compose those kernels)
    "av_wav_stats", "av_video_stats", "av_media_filter",
    "av_wav_fingerprint", "av_wav_neardup", "img_resize_check",
}


def test_every_query_plan_is_anti_pattern_free(spark):
    """Global gate: every registered driver query's physical plan is free
    of scale anti-patterns — CartesianProduct never, row-at-a-time
    BatchEvalPython never, BroadcastNestedLoopJoin / MapInPandas only on
    the documented allowlists. Catches a regression in ANY query, not
    just the individually-pinned ones."""
    import __spark_entry__ as entry

    failures = []
    for name, fn in sorted(entry.queries().items()):
        plan = plan_of(spark, name)
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-at-a-time Python UDF")
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_OK:
            failures.append(f"{name}: unexpected BroadcastNestedLoopJoin")
        if (
            ("MapInPandas" in plan or "FlatMapGroupsInPandas" in plan)
            and name not in _PANDAS_OK
        ):
            failures.append(f"{name}: unexpected Pandas node")
    assert not failures, failures


def test_extract_spans_plan_shape(spark):
    # the extraction kernel runs ONCE; the span explosion + struct
    # projection stay JVM-side (posexplode + getters, no second Python
    # stage, no shuffle after the salt exchange)
    plan = plan_of(spark, "extract_spans")
    # one kernel stage (formatted explain names each node twice:
    # once in the tree, once in the detail section)
    assert plan.count("MapInPandas") <= 2
    assert "Generate" in plan  # JVM posexplode, not a Python flatten


def test_fetch_waves_plan_shape(spark):
    # one window over a host-hash exchange; narrow payload; no Python,
    # no joins at all — the rank IS the operator
    plan = plan_of(spark, "web_fetch_waves")
    assert plan.count("Exchange") <= 2  # one per AQE plan rendering
    assert "Window" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_lang_length_quantiles_plan_shape(spark):
    # corpus touches exactly one wide shuffle (the (lang, n_chars)
    # histogram groupBy, map-side combined); the rank window and the
    # totals join ride the tiny histogram; totals broadcast
    plan = plan_of(spark, "doc_lang_length_quantiles")
    assert "partial_count" in plan  # map-side combine on the histogram
    assert "BroadcastHashJoin" in plan  # one-row-per-lang totals
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_containment_plan_shape(spark):
    # same shape as ngram_jaccard: hot-set LeftAnti broadcast (tiny side),
    # inverted-index self-join, shuffle size-joins; no Python, no cartesian
    plan = plan_of(spark, "doc_containment")
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_host_lang_profile_plan_shape(spark):
    # two map-side-combined groupBys, struct-min argmax — no window, no join
    plan = plan_of(spark, "web_host_lang_profile")
    assert "partial_count" in plan or "partial_sum" in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_session5_projection_ops_are_scan_speed(spark):
    # soft404 / badwords / normalize are per-row curation passes: the
    # plan must be projection-only — no exchange, join, or Python node
    for q in ("web_soft404", "doc_badwords", "doc_normalize"):
        plan = plan_of(spark, q)
        assert "Exchange" not in plan and "Join" not in plan, q
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, q


def test_image_dhash_neardup_plan_no_cartesian(spark):
    # the image near-dup candidates must come from the banded equi-join
    # (count-filtered buckets), never an all-pairs scan over the hashes
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "img_dhash_neardup")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # bucket degeneracy filter aggregates before the self-join
        assert "partial_count" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_capture_drift_plan_shape(spark):
    # lag window + groupBy both key on canonical_url: Catalyst reuses the
    # window's exchange, so the whole drift profile is ONE shuffle; the
    # count-distinct runs as extra aggregate passes over the same
    # partitioning, never a second exchange; no joins, no Python
    plan = plan_of(spark, "web_capture_drift")
    assert plan.count("Exchange (") <= 1, plan.count("Exchange (")
    assert "Window" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_crawl_diff_plan_shape(spark):
    # each snapshot reduces with ONE struct-max groupBy on canonical_url
    # and the full-outer join keys on the same column: both sides arrive
    # pre-partitioned, so the join adds NO third exchange; neither
    # corpus-scale side ever broadcasts
    plan = plan_of(spark, "web_crawl_diff")
    assert plan.count("Exchange (") <= 2, plan.count("Exchange (")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
