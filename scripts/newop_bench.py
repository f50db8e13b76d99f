"""One-off timing of the round-3 session's new operators at sf0.1
(local[32], same noop-sink forcing as bench.py). Results recorded in
BASELINE.md; not part of the driver's headline bench."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

NEW_OPS = [
    "doc_ppl_buckets", "doc_domain_mix", "doc_classifier_label",
    "doc_bloom_seen", "web_host_pagerank", "events_asof_click",
    "events_error_click_window", "events_props_stats",
    "doc_corpus_profile", "extract_boilerplate_blocks",
    # session 3
    "doc_script_profile", "web_template_strip", "doc_bm25_topk",
    "doc_cluster_reps", "emb_decontaminate",
    # session 4
    "web_fetch_waves", "doc_lang_length_quantiles", "doc_containment",
    "web_host_lang_profile",
    # session 5
    "web_soft404", "doc_badwords", "doc_normalize",
    "img_dhash", "img_dhash_neardup",
    # session 6
    "extract_image_refs", "extract_spans", "extract_table_cells",
    "extract_wet", "extract_page_meta",
    # session 7
    "extract_charset", "web_cdx_index", "doc_perceptron_weights",
    "extract_warc_records", "doc_cm_term_estimates",
    # session 8
    "web_host_hits", "web_host_components", "web_host_hll",
    "web_sitemap_urls", "doc_kn_bigrams", "extract_http_headers",
    "extract_microdata", "web_revisit_records",
    # session 10
    "web_host_trustrank", "web_host_spam_mass", "web_host_budgets",
    "web_host_features", "web_feed_entries", "web_redirect_chains",
    "web_mime_verdicts", "web_hreflang_clusters",
    "web_canonical_verdicts", "web_index_verdicts",
    "web_revisit_schedule", "web_lang_consistency", "web_dom_templates",
    "extract_wat", "web_robots_wildcard", "web_robots_posture",
    # session 11
    "doc_kn_score", "web_image_candidates", "web_host_communities",
    "doc_winnow_fps", "doc_winnow_pairs",
    # session 12
    "av_wav_stats", "av_video_stats", "doc_readability",
    "doc_shard_manifest", "doc_ttr", "emb_matryoshka_topk",
    "emb_dim_stats", "emb_recall_eval", "events_bot_sessions",
    "doc_dedup_eval", "web_pld_graph", "web_pld_pagerank",
    "av_media_filter", "doc_lang_audit", "doc_bpe_fertility",
    "web_host_dup_rate", "emb_knn_label_eval", "web_host_hops",
    "av_wav_fingerprint", "av_wav_neardup", "doc_mix_sample",
    "web_degree_spectrum",
]


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("newop-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    # --all sweeps EVERY queries() entry (the full-surface regression
    # radar that caught the winnow_fps O(grams²) inlining); default stays
    # the per-session new-op list
    names = list(queries) if "--all" in sys.argv else NEW_OPS
    results = {}
    for name in names:
        fn = queries[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warmup
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        spark.catalog.clearCache()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "sec": results}))


if __name__ == "__main__":
    main()
