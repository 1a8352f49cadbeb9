"""Registers every query plan with the registry.

ORDERING MATTERS: the driver's correctness gate checks the first 50
registered queries. STANDING ROTATION POLICY (steady state as of
round 12 — the r03→r11 burn-down of never-checked and oldest
single-streak queries is complete, every query has >=1 driver green):
at ROUND START the window becomes the 50 queries whose LATEST driver
green is OLDEST, ties broken by their order inside that prior window;
everything else cedes its slot. With 252 registered queries and a
50-slot window this guarantees a staleness bound of
ceil(252/50) = 6 rounds — no query's latest driver-green row is ever
older than 6 rounds, checkable from the CORRECTNESS_r*.json series.
Ceded queries remain fully checked every round by
tools/oracle_check.py (Arrow-dtype-sensitive since round 6) + pytest.
Rotate at ROUND START only, and bank full-registry sweeps at sf0.01
AND sf0.1 in the rotation commit so the rotation itself is proven
harmless.

Round-12 window (50) — first steady-state window, oldest-first:
  * the 6 remaining r09-window greens (latest green r09, the oldest
    cohort), in r09 order: t_closeness -> shiplag_priority_counts;
  * the 6 round-10 additions (single r10 streak), in r10 order:
    product_type_profit -> lrs_exact_fixed;
  * the 38 oldest r10-window re-streaks (r08+r10 double streaks), in
    r10 window order: jl_project -> top_revenue_supplier.
r13 queue head = the 6 remaining r10-window re-streaks (chunk_salvage
-> shard_manifest), then the r11 window's 50 (latest green r11) in
r11 order — i.e. r13's window is those 6 + the first 44 of the r11
window, mechanically derivable from this policy.

Round-11 window (50) — historical: re-streak burn-down completed
(6 r08 leftovers + 44 oldest r09 re-streaks); landed 50/50
triple-green in CORRECTNESS_r11. Round-10 and earlier window history
lives in the git history of this docstring.

Registry total 252 (249 with SQL oracles; bpe_merges / bpe_encode /
lrs_exact rows-only by design, each fixture/twin-covered —
lrs_exact's algorithm has a hash-exact driver row via
lrs_exact_fixed). Round-12 pre-rotation sweeps: full registry green
at sf0.01 AND sf0.1 (banked in the rotation commit).
"""
from __future__ import annotations

from . import relational as R
from . import scalar as S
from .registry import register

from . import pipeline_q as PQ  # noqa: E402
from . import events_q as EV  # noqa: E402
from . import ext_q as E  # noqa: E402
from . import graph_q as GQ  # noqa: E402
from . import maint_q as MQ  # noqa: E402
from . import select_q as SQ  # noqa: E402

# === ROUND-12 WINDOW (50): steady state — the 50 oldest-verified ======
# --- the 6 remaining r09-window greens (r09 order) --------------------
register("t_closeness", E.t_closeness_q, E.T_CLOSENESS_SQL)
register("forecast_revenue", R.forecast_revenue, R.FORECAST_REVENUE_SQL)
register("late_order_priority", R.late_order_priority, R.LATE_ORDER_PRIORITY_SQL)
register("nation_market_share", R.nation_market_share, R.NATION_MARKET_SHARE_SQL)
register("returned_item_report", R.returned_item_report, R.RETURNED_ITEM_REPORT_SQL)
register("shiplag_priority_counts", R.shiplag_priority_counts, R.SHIPLAG_PRIORITY_COUNTS_SQL)
# --- the 6 round-10 additions (r10 order, single r10 streak each) -----
register("product_type_profit", R.product_type_profit, R.PRODUCT_TYPE_PROFIT_SQL)
register("important_stock", R.important_stock, R.IMPORTANT_STOCK_SQL)
register(
    "customer_order_distribution",
    R.customer_order_distribution,
    R.CUSTOMER_ORDER_DISTRIBUTION_SQL,
)
register("supplier_part_variety", R.supplier_part_variety, R.SUPPLIER_PART_VARIETY_SQL)
register("promo_stock_suppliers", R.promo_stock_suppliers, R.PROMO_STOCK_SUPPLIERS_SQL)
register("lrs_exact_fixed", E.lrs_exact_fixed_q, E.LRS_EXACT_FIXED_SQL)
# --- the 38 oldest r10-window re-streaks (r10 window order) -----------
register("jl_project", SQ.jl_project_q, SQ.JL_PROJECT_SQL)
register("line_dedup", E.line_dedup, E.LINE_DEDUP_SQL)
register("gopher_quality", E.gopher_quality, E.GOPHER_QUALITY_SQL)
register("semantic_decontam", E.semantic_decontam, E.SEMANTIC_DECONTAM_SQL)
register("incremental_line_dedup", E.incremental_line_dedup_q, E.INCREMENTAL_LINE_DEDUP_SQL)
register("line_registry", E.line_registry_q, E.LINE_REGISTRY_SQL)
register("encoding_report", E.encoding_report, E.ENCODING_REPORT_SQL)
register("gopher_funnel", E.gopher_funnel, E.GOPHER_FUNNEL_SQL)
register("fertility_by_lang", E.fertility_by_lang, E.FERTILITY_BY_LANG_SQL)
register("preference_pairs", E.preference_pairs_q, E.PREFERENCE_PAIRS_SQL)
register("curriculum_order", SQ.curriculum_order_q, SQ.CURRICULUM_ORDER_SQL)
register("web_curation_pipeline", E.web_curation_pipeline, E.WEB_CURATION_PIPELINE_SQL)
register("mixture_epochs", SQ.mixture_epochs_q, SQ.MIXTURE_EPOCHS_SQL)
register("doremi_weights", SQ.doremi_weights_q, SQ.DOREMI_WEIGHTS_SQL)
register("length_bias", SQ.length_bias_q, SQ.LENGTH_BIAS_SQL)
register("corpus_drift", SQ.corpus_drift_q, SQ.CORPUS_DRIFT_SQL)
register("vocab_growth", SQ.vocab_growth_q, SQ.VOCAB_GROWTH_SQL)
register("template_dedup", E.template_dedup_q, E.TEMPLATE_DEDUP_SQL)
register("sft_render", SQ.sft_render_q, SQ.SFT_RENDER_SQL)
register("packing_contamination", E.packing_contamination_q, E.PACKING_CONTAMINATION_SQL)
register("normalized_dedup", E.normalized_dedup_q, E.NORMALIZED_DEDUP_SQL)
register("math_code_routing", E.math_code_routing_q, E.MATH_CODE_ROUTING_SQL)
register("k_anonymity", E.k_anonymity_q, E.K_ANONYMITY_SQL)
register("blocklist_filter", E.blocklist_filter_q, E.BLOCKLIST_FILTER_SQL)
register("retrieval_metrics", E.retrieval_metrics_q, E.RETRIEVAL_METRICS_SQL)
register("waterfill_alloc", E.waterfill_alloc_q, E.WATERFILL_ALLOC_SQL)
register("quantile_norm", E.quantile_norm_q, E.QUANTILE_NORM_SQL)
register("k_anon_gate", E.k_anon_gate_q, E.K_ANON_GATE_SQL)
register("containment_pairs", E.containment_pairs_q, E.CONTAINMENT_PAIRS_SQL)
register("source_gate", E.source_gate_q, E.SOURCE_GATE_SQL)
register("ngram_diversity", E.ngram_diversity_q, E.NGRAM_DIVERSITY_SQL)
register("cluster_sample", SQ.cluster_sample_q, SQ.CLUSTER_SAMPLE_SQL)
register("preference_cycles", SQ.preference_cycles_q, SQ.PREFERENCE_CYCLES_SQL)
register("pii_source_report", E.pii_source_report_q, E.PII_SOURCE_REPORT_SQL)
register("small_quantity_revenue", R.small_quantity_revenue, R.SMALL_QUANTITY_REVENUE_SQL)
register("sole_returned_supplier", R.sole_returned_supplier, R.SOLE_RETURNED_SUPPLIER_SQL)
register("embedding_drift", E.embedding_drift_q, E.EMBEDDING_DRIFT_SQL)
register("top_revenue_supplier", R.top_revenue_supplier, R.TOP_REVENUE_SUPPLIER_SQL)
# === END ROUND-12 WINDOW (slot 50 = top_revenue_supplier) =============
# --- r13 queue head: the 6 remaining r10-window re-streaks ------------
register("chunk_salvage", E.chunk_salvage_q, E.CHUNK_SALVAGE_SQL)
register("grouped_priority_sample", SQ.grouped_priority_sample_q, SQ.GROUPED_PRIORITY_SAMPLE_SQL)
register("triangle_docs", GQ.triangle_docs_q, GQ.TRIANGLE_DOCS_SQL)
register("regex_token_report", E.regex_token_report_q, E.REGEX_TOKEN_REPORT_SQL)
register("patch_grid", E.patch_grid_q, E.PATCH_GRID_SQL)
register("shard_manifest", E.shard_manifest_q, E.SHARD_MANIFEST_SQL)
# --- ceded: the round-11 window (50/50 triple-green in
# --- CORRECTNESS_r11, latest green r11) — completes the r13 window
# --- after the six above, then heads the r14 queue --------------------
register("dedup_ttl_decay", E.dedup_ttl_decay_q, E.DEDUP_TTL_DECAY_SQL)
register("rejection_reasons", E.rejection_reasons_q, E.REJECTION_REASONS_SQL)
register("events_pit_join", EV.events_pit_join, EV.EVENTS_PIT_JOIN_SQL)
register("merged_quantiles", EV.merged_quantiles, EV.MERGED_QUANTILES_SQL)
register("ab_test_report", EV.ab_test_report, EV.AB_TEST_REPORT_SQL)
register("bpe_encode_fixed", E.bpe_encode_fixed_q, E.BPE_ENCODE_FIXED_SQL)
register("engagement_ratios", EV.engagement_ratios, EV.ENGAGEMENT_RATIOS_SQL)
register("frequent_pairs", EV.frequent_pairs, EV.FREQUENT_PAIRS_SQL)
register("ingestion_islands", EV.ingestion_islands, EV.INGESTION_ISLANDS_SQL)
register("type_bitmap_overlap", EV.type_bitmap_overlap, EV.TYPE_BITMAP_OVERLAP_SQL)
register("scalar_functions_v2", S.scalar_functions_v2, S.SCALAR_FUNCTIONS_V2_SQL)
register("volume_shipping", R.volume_shipping, R.VOLUME_SHIPPING_SQL)
register("promo_revenue_share", R.promo_revenue_share, R.PROMO_REVENUE_SHARE_SQL)
register("large_volume_customers", R.large_volume_customers, R.LARGE_VOLUME_CUSTOMERS_SQL)
register("disjunctive_revenue", R.disjunctive_revenue, R.DISJUNCTIVE_REVENUE_SQL)
register("acctbal_prospects", R.acctbal_prospects, R.ACCTBAL_PROSPECTS_SQL)
register("zipf_fit", E.zipf_fit_q, E.ZIPF_FIT_SQL)
register("ivf_nprobe_sweep", E.ivf_nprobe_sweep_q, E.IVF_NPROBE_SWEEP_SQL)
register("ppl_bucket_mixture", E.ppl_bucket_mixture_q, E.PPL_BUCKET_MIXTURE_SQL)
register("quality_classifier", E.quality_classifier_q, E.QUALITY_CLASSIFIER_SQL)
register("scene_cuts", E.scene_cuts_q, E.SCENE_CUTS_SQL)
register("sensitive_homogeneity", E.sensitive_homogeneity_q, E.SENSITIVE_HOMOGENEITY_SQL)
register("cheapest_supplier", E.cheapest_supplier_q, E.CHEAPEST_SUPPLIER_SQL)
register("winrate_matrix", E.winrate_matrix_q, E.WINRATE_MATRIX_SQL)
register("hierarchy_rollup", GQ.hierarchy_rollup_q, GQ.HIERARCHY_ROLLUP_SQL)
register("canary_scan", E.canary_scan_q, E.CANARY_SCAN_SQL)
register("record_linkage", E.record_linkage_q, E.RECORD_LINKAGE_SQL)
register("pca_power", E.pca_power_q, E.PCA_POWER_SQL)
register("simhash_pairs", E.simhash_pairs_q, E.SIMHASH_PAIRS_SQL)
register("minhash_band_sweep", E.minhash_band_sweep_q, E.MINHASH_BAND_SWEEP_SQL)
register("span_unit_repeats", E.span_unit_repeats_q, E.SPAN_UNIT_REPEATS_SQL)
register("knn_ivfpq_res", E.knn_ivfpq_res_q, E.KNN_IVFPQ_RES_SQL)
register("header_self_heal", PQ.header_self_heal, PQ.HEADER_SELF_HEAL_SQL)
register("queue_tracker_lookup", PQ.queue_tracker_lookup, PQ.QUEUE_TRACKER_LOOKUP_SQL)
register("stratified_sample", E.stratified_sample_q, E.STRATIFIED_SAMPLE_SQL)
register("ngram_decontam", E.ngram_decontam, E.NGRAM_DECONTAM_SQL)
register("cms_user_counts", E.cms_user_counts_q, E.CMS_USER_COUNTS_SQL)
register("histogram_quantiles", E.histogram_quantiles_q, E.HISTOGRAM_QUANTILES_SQL)
register("band_registry", E.band_registry_q, E.BAND_REGISTRY_SQL)
register("mv_incremental", E.mv_incremental_q, E.MV_INCREMENTAL_SQL)
register("user_sequences", E.user_sequences_q, E.USER_SEQUENCES_SQL)
register("temperature_sample", E.temperature_sample_q, E.TEMPERATURE_SAMPLE_SQL)
register("hybrid_retrieval", E.hybrid_retrieval_q, E.HYBRID_RETRIEVAL_SQL)
register("robust_outliers", EV.robust_outliers, EV.ROBUST_OUTLIERS_SQL)
register("time_weighted_avg", EV.time_weighted_avg, EV.TIME_WEIGHTED_AVG_SQL)
register("multimodal_examples", E.multimodal_examples_q, E.MULTIMODAL_EXAMPLES_SQL)
register("retention_cohorts", E.retention_cohorts_q, E.RETENTION_COHORTS_SQL)
register("feature_bins", E.feature_bins_q, E.FEATURE_BINS_SQL)
register("bpe_merges_fixed", E.bpe_merges_fixed_q, E.BPE_MERGES_FIXED_SQL)
register("llm_json_extract", S.llm_json_extract, S.LLM_JSON_EXTRACT_SQL)
# --- ceded: the full r09-and-earlier streak holders; every query
# --- below stays in the per-round full oracle sweep -------------------
register("session_windows", EV.session_windows, EV.SESSION_WINDOWS_SQL)
register("epoch_shuffle", SQ.epoch_shuffle_q, SQ.EPOCH_SHUFFLE_SQL)
register("length_bucket_batches", SQ.length_bucket_batches_q, SQ.LENGTH_BUCKET_BATCHES_SQL)
register("bpe_encode", E.bpe_encode_q, None)
register("semdedup_ivf", SQ.semdedup_ivf_q, SQ.SEMDEDUP_IVF_SQL)
register("dedup_method_recall", E.dedup_method_recall_q, E.DEDUP_METHOD_RECALL_SQL)
register("ann_method_recall", E.ann_method_recall_q, E.ANN_METHOD_RECALL_SQL)
register("embedding_outliers", SQ.embedding_outliers_q, SQ.EMBEDDING_OUTLIERS_SQL)
register("ivf_cell_profile", SQ.ivf_cell_profile_q, SQ.IVF_CELL_PROFILE_SQL)
register("ngram_coverage", E.ngram_coverage_q, E.NGRAM_COVERAGE_SQL)
register("dedup_inflation", E.dedup_inflation_q, E.DEDUP_INFLATION_SQL)
register("cosine_near_dups", E.cosine_near_dups, E.COSINE_NEAR_DUPS_SQL)
register("cosine_near_dups_blocked", E.cosine_near_dups_blocked, E.COSINE_NEAR_DUPS_BLOCKED_SQL)
register("top_orders_per_customer", R.top_orders_per_customer, R.TOP_ORDERS_PER_CUSTOMER_SQL,)
register("customers_without_orders", R.customers_without_orders, R.CUSTOMERS_WITHOUT_ORDERS_SQL,)
register("customers_with_open_orders", R.customers_with_open_orders, R.CUSTOMERS_WITH_OPEN_ORDERS_SQL,)
register("order_priority_rollup", R.order_priority_rollup, R.ORDER_PRIORITY_ROLLUP_SQL)
register("customer_order_coverage", R.customer_order_coverage, R.CUSTOMER_ORDER_COVERAGE_SQL)
register("repeat_profile", E.repeat_profile_q, E.REPEAT_PROFILE_SQL)
register("scrub_spans", E.scrub_spans_q, E.SCRUB_SPANS_SQL)
register("bpe_pair_counts", E.bpe_pair_counts_q, E.BPE_PAIR_COUNTS_SQL)
register("bpe_merges", E.bpe_merges_q, None)
register("ngram_lm_score", E.ngram_lm_score_q, E.NGRAM_LM_SCORE_SQL)
register("cdc_chunks", E.cdc_chunks_q, E.CDC_CHUNKS_SQL)
register("dedup_clusters_star", E.dedup_clusters_star_q, E.DEDUP_CLUSTERS_SQL)
register("winnowing_pairs", E.winnowing_pairs_q, E.WINNOWING_PAIRS_SQL)
register("incremental_repeat_spans", E.incremental_repeat_spans_q, E.INCREMENTAL_REPEAT_SPANS_SQL)
register("scrubbed_corpus", E.scrubbed_corpus_q, E.SCRUBBED_CORPUS_SQL)
register("fuzzy_key_join", E.fuzzy_key_join_q, E.FUZZY_KEY_JOIN_SQL)
register("interval_join", E.interval_join_q, E.INTERVAL_JOIN_SQL)
register("kmv_merge", E.kmv_merge_q, E.KMV_MERGE_SQL)
register("snapshot_diff", E.snapshot_diff_q, E.SNAPSHOT_DIFF_SQL)
register("hll_user_counts", E.hll_user_counts_q, E.HLL_USER_COUNTS_SQL)
register("kmv_overlap", E.kmv_overlap_q, E.KMV_OVERLAP_SQL)
register("embedding_moments", E.embedding_moments_q, E.EMBEDDING_MOMENTS_SQL)
register("user_value_trend", EV.user_value_trend, EV.USER_VALUE_TREND_SQL)
register("event_transitions", EV.event_transitions, EV.EVENT_TRANSITIONS_SQL)
register("weighted_percentiles", EV.weighted_percentiles, EV.WEIGHTED_PERCENTILES_SQL)
register("lrs_exact", E.lrs_exact_q, None)
register("pagerank_docs", GQ.pagerank_docs, GQ.PAGERANK_DOCS_SQL)
register("leakage_split", GQ.leakage_split, GQ.LEAKAGE_SPLIT_SQL)
register("priority_sample", SQ.priority_sample_q, SQ.PRIORITY_SAMPLE_SQL)
register("dsir_scores", SQ.dsir_scores_q, SQ.DSIR_SCORES_SQL)
register("novelty_scores", SQ.novelty_scores_q, SQ.NOVELTY_SCORES_SQL)
register("semdedup_prune", SQ.semdedup_prune_q, SQ.SEMDEDUP_SQL)
register("mmr_rerank", SQ.mmr_rerank_q, SQ.MMR_RERANK_SQL)
register("join_view_delta", MQ.join_view_delta_q, MQ.JOIN_VIEW_DELTA_SQL)
register("cdc_apply", MQ.cdc_apply_q, MQ.CDC_APPLY_SQL)
register("bloom_semi_join", MQ.bloom_semi_join_q, MQ.BLOOM_SEMI_JOIN_SQL)
register("gap_fill_hourly", EV.gap_fill_hourly, EV.GAP_FILL_HOURLY_SQL)
register("winsorized_stats", EV.winsorized_stats, EV.WINSORIZED_STATS_SQL)
register("multi_touch_attribution", EV.multi_touch_attribution, EV.MULTI_TOUCH_ATTRIBUTION_SQL)
register("snm_pairs", E.snm_pairs_q, E.SNM_PAIRS_SQL)
register("rocchio_classify", SQ.rocchio_classify_q, SQ.ROCCHIO_CLASSIFY_SQL)
register("label_separation", SQ.label_separation_q, SQ.LABEL_SEPARATION_SQL)
register("join_cardinality", MQ.join_cardinality_q, MQ.JOIN_CARDINALITY_SQL)
register("ann_index_add", MQ.ann_index_add_q, MQ.ANN_INDEX_ADD_SQL)
register("hilbert_key", R.hilbert_key_q, R.HILBERT_KEY_SQL)
register("trailing_window_sums", EV.trailing_window_sums, EV.TRAILING_WINDOW_SUMS_SQL)
register("ppr_docs", GQ.ppr_docs, GQ.PPR_DOCS_SQL)
register("nb_classify", SQ.nb_classify_q, SQ.NB_CLASSIFY_SQL)
register("canonical_source_pick", GQ.canonical_source_pick, GQ.CANONICAL_SOURCE_PICK_SQL)
register("ivf_mmr", SQ.ivf_mmr_q, SQ.IVF_MMR_SQL)
register("event_matrix_unpivot", EV.event_matrix_unpivot, EV.EVENT_MATRIX_UNPIVOT_SQL)
register("user_purge_audit", EV.user_purge_audit, EV.USER_PURGE_AUDIT_SQL)
register("skew_report", EV.skew_report, EV.SKEW_REPORT_SQL)
register("prefix_jaccard", E.prefix_jaccard_q, E.PREFIX_JACCARD_SQL)
register("label_propagation", GQ.label_propagation_docs, GQ.LABEL_PROPAGATION_SQL)
register("pagerank_weighted", GQ.pagerank_weighted_docs, GQ.PAGERANK_WEIGHTED_SQL)
register("quality_gate", MQ.quality_gate_q, MQ.QUALITY_GATE_SQL)
register("table_profile", MQ.table_profile_q, MQ.TABLE_PROFILE_SQL)
register("soft_dedup_weights", GQ.soft_dedup_weights_q, GQ.SOFT_DEDUP_WEIGHTS_SQL)
register("contrastive_triplets", SQ.contrastive_triplets_q, SQ.CONTRASTIVE_TRIPLETS_SQL)
register("event_cooccurrence", EV.event_cooccurrence, EV.EVENT_COOCCURRENCE_SQL)
register("curation_funnel", E.curation_funnel_q, E.CURATION_FUNNEL_SQL)
register("knn_pq", E.knn_pq_q, E.KNN_PQ_SQL)
register("knn_ivfpq", E.knn_ivfpq_q, E.KNN_IVFPQ_SQL)
register("bm25_rank", E.bm25_rank_q, E.BM25_RANK_SQL)
register("hard_negatives", E.hard_negatives_q, E.HARD_NEGATIVES_SQL)
register("audio_decode", E.audio_decode_q, E.AUDIO_DECODE_SQL)
register("video_decode", E.video_decode_q, E.VIDEO_DECODE_SQL)
register("temperature_mixture", E.temperature_mixture_q, E.TEMPERATURE_MIXTURE_SQL)
register("value_cdf", EV.value_cdf, EV.VALUE_CDF_SQL)
register("decide_cascade_mvp", PQ.decide_cascade_mvp, PQ.DECIDE_CASCADE_MVP_SQL)
register("html_signals", E.html_signals, E.HTML_SIGNALS_SQL)
register("embedding_quantize", E.embedding_quantize, E.EMBEDDING_QUANTIZE_SQL)
register("exact_dedup", E.exact_dedup, E.EXACT_DEDUP_SQL)
register("knn_bruteforce", E.knn_bruteforce, E.KNN_BRUTEFORCE_SQL)
register("ngram_jaccard", E.ngram_jaccard, E.NGRAM_JACCARD_SQL)
register("heavy_hitters", E.heavy_hitters, E.HEAVY_HITTERS_SQL)
register("kmv_distinct_users", E.kmv_distinct_users, E.KMV_DISTINCT_USERS_SQL)
register("shard_packing", E.shard_packing, E.SHARD_PACKING_SQL)
register("event_props_json", E.event_props_json, E.EVENT_PROPS_JSON_SQL)
register("salted_join_agg", R.salted_join_agg, R.SALTED_JOIN_AGG_SQL)
register("lineitem_cube", R.lineitem_cube, R.LINEITEM_CUBE_SQL)
register("revenue_by_nation", R.revenue_by_nation, R.REVENUE_BY_NATION_SQL)
register("top_revenue_orders", R.top_revenue_orders, R.TOP_REVENUE_ORDERS_SQL)
register("decide_cascade", PQ.decide_cascade, PQ.DECIDE_CASCADE_SQL)
register("enqueue_antijoin", PQ.enqueue_antijoin, PQ.ENQUEUE_ANTIJOIN_SQL)
register("fetch_cascade", PQ.fetch_cascade, PQ.FETCH_CASCADE_SQL)
register("notes_template", PQ.notes_template, PQ.NOTES_TEMPLATE_SQL)
register("writeback_incremental", PQ.writeback_incremental, PQ.WRITEBACK_INCREMENTAL_SQL)
register("writeback_merge", PQ.writeback_merge, PQ.WRITEBACK_MERGE_SQL)
register("sliding_avg", EV.sliding_avg, EV.SLIDING_AVG_SQL)
register("event_dedup", EV.event_dedup, EV.EVENT_DEDUP_SQL)
register("user_hourly_rates", EV.user_hourly_rates, EV.USER_HOURLY_RATES_SQL)
register("event_attribution", EV.event_attribution, EV.EVENT_ATTRIBUTION_SQL)
register("value_percentiles", EV.value_percentiles, EV.VALUE_PERCENTILES_SQL)
register("user_event_matrix", EV.user_event_matrix, EV.USER_EVENT_MATRIX_SQL)
register("conversion_funnel", EV.conversion_funnel, EV.CONVERSION_FUNNEL_SQL)
register("user_activity_scd2", EV.user_activity_scd2, EV.USER_ACTIVITY_SCD2_SQL)
register("throttled_links", EV.throttled_links_q, EV.THROTTLED_LINKS_SQL)
register("stream_interval_join", EV.stream_interval_join_q, EV.STREAM_INTERVAL_JOIN_SQL)
register("exact_dedup_salted", E.exact_dedup_salted, E.EXACT_DEDUP_SALTED_SQL)
register("repeated_spans", E.repeated_spans_q, E.REPEATED_SPANS_SQL)
register("kmeans_clusters", E.kmeans_clusters_q, E.KMEANS_CLUSTERS_SQL)
register("bloom_decontam", E.bloom_decontam_q, E.BLOOM_DECONTAM_SQL)
register("tfidf_top_terms", E.tfidf_top_terms_q, E.TFIDF_TOP_TERMS_SQL)
register("training_corpus", E.training_corpus_q, E.TRAINING_CORPUS_SQL)
register("upsample_epochs", E.upsample_epochs_q, E.UPSAMPLE_EPOCHS_SQL)
register("zorder_key", R.zorder_key_q, R.ZORDER_KEY_SQL)
register("pricing_summary", R.pricing_summary, R.PRICING_SUMMARY_SQL)
register("pq_codes", E.pq_codes_q, E.PQ_CODES_SQL)
register("tfidf_pairs", E.tfidf_pairs, E.TFIDF_PAIRS_SQL)
register("duplicate_guard", R.duplicate_guard, R.DUPLICATE_GUARD_SQL)
register("parts_never_ordered", R.parts_never_ordered, R.PARTS_NEVER_ORDERED_SQL)
register("url_functions", S.url_functions, S.URL_FUNCTIONS_SQL)
register("clean_role_pipeline", S.clean_role_pipeline, S.CLEAN_ROLE_PIPELINE_SQL)
register("provenance_tokens", S.provenance_tokens, S.PROVENANCE_TOKENS_SQL)
register("tumbling_counts", EV.tumbling_counts, EV.TUMBLING_COUNTS_SQL)
register("text_stats", E.text_stats, E.TEXT_STATS_SQL)
register("minhash_pairs", E.minhash_pairs, E.MINHASH_PAIRS_SQL)
register("incremental_near_dups", E.incremental_near_dups_q, E.INCREMENTAL_NEAR_DUPS_SQL)
register("consensus_near_dups", E.consensus_near_dups, E.CONSENSUS_NEAR_DUPS_SQL)
register("simhash_docs", E.simhash_docs, E.SIMHASH_DOCS_SQL)
register("cosine_near_dups_lsh", E.cosine_near_dups_lsh, E.COSINE_NEAR_DUPS_LSH_SQL)
register("knn_ivf", E.knn_ivf_q, E.KNN_IVF_SQL)
register("multimodal_decode", E.multimodal_decode_q, E.MULTIMODAL_DECODE_SQL)
register("dedup_clusters", E.dedup_clusters, E.DEDUP_CLUSTERS_SQL)
register("events_asof_join", E.events_asof_join, E.EVENTS_ASOF_JOIN_SQL)
register("repetition_scores", E.repetition_scores, E.REPETITION_SCORES_SQL)
register("pii_redaction", E.pii_redaction, E.PII_REDACTION_SQL)
register("token_budget_sample", E.token_budget_sample_q, E.TOKEN_BUDGET_SAMPLE_SQL)
register("corpus_report", E.corpus_report, E.CORPUS_REPORT_SQL)
register("curation_pipeline", E.curation_pipeline, E.CURATION_PIPELINE_SQL)
register("chunk_documents", E.chunk_documents_q, E.CHUNK_DOCUMENTS_SQL)
