"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink so the number
measures engine execution (scan→compute→shuffle), not driver-side
row deserialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: covers scan+agg, broadcast join+topk, star join,
# window, anti-join, scalar-function pipelines, and the full decision
# cascade (incl. the one pandas UDF).
HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "revenue_by_nation",
    "top_orders_per_customer",
    "customers_without_orders",
    "url_functions",
    "clean_role_pipeline",
    "decide_cascade",
    "enqueue_antijoin",
    "writeback_merge",
    "text_stats",
    "exact_dedup",
    "minhash_pairs",
    "simhash_docs",
    "knn_bruteforce",
    "tumbling_counts",
    "session_windows",
    "events_asof_join",
    "stratified_sample",
    "shard_packing",
    "repetition_scores",
    "ngram_decontam",
    "pii_redaction",
    "token_budget_sample",
    "kmv_distinct_users",
    "corpus_report",
    "embedding_quantize",
    "tfidf_pairs",
    "tfidf_top_terms",
    "salted_join_agg",
    "event_attribution",
    "cosine_near_dups_lsh",
    "lineitem_cube",
    "value_percentiles",
    "user_event_matrix",
    "curation_pipeline",
    "incremental_near_dups",
    "customer_order_coverage",
    "conversion_funnel",
    "chunk_documents",
    "heavy_hitters",
    "consensus_near_dups",
    "user_activity_scd2",
    "exact_dedup_salted",
    "throttled_links",
    "stream_interval_join",
    "repeated_spans",
    "upsample_epochs",
    "zorder_key",
    "kmeans_clusters",
    "training_corpus",
    "audio_decode",
    "bloom_decontam",
    "pq_codes",
    "knn_pq",
    "cms_user_counts",
    "histogram_quantiles",
    "band_registry",
    "hard_negatives",
    "knn_ivfpq",
    "mv_incremental",
    "user_sequences",
    "temperature_mixture",
    "retention_cohorts",
    "feature_bins",
    "temperature_sample",
    "bm25_rank",
    "hybrid_retrieval",
    "robust_outliers",
    "video_decode",
    "time_weighted_avg",
    "multimodal_examples",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from joblink_etl_spark.plans import registry
    from joblink_etl_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]
    # warm the JVM + parquet footers so timings measure steady state
    qs[names[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # each query's cached intermediates (minhash shingles etc.)
        # are query-private; dropping them between queries keeps one
        # query's cache from evicting the next one's mid-flight
        # (observed: a 3x swing on the minhash family late in a long
        # run). The drop is outside the timed window — the cache
        # WRITE cost stays inside each query's own time.
        spark.catalog.clearCache()

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "n_queries": len(timings),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
