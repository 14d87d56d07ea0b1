package graft

/** The FROZEN round-11 catalog (143 queries, names from
  * CORRECTNESS_r11.json) — the like-for-like bench series' constant
  * workload. The full-catalog bench total drifts upward as queries are
  * added each round (mix drift, not regression); totals over THIS set
  * compare constant work across rounds. Do not edit: the set's whole
  * value is that it never changes.
  */
object R11Subset {
  val names: Set[String] = Set(
    "ann01_bruteforce_topk", "ann02_lsh_topk", "ann03_topk_aggregator",
    "ann04_ivf", "ann05_centroid_update", "ann06_pq_topk", "ann07_recall",
    "ann08_kmeans_train", "ann09_pq_train", "ann10_pq_adc_topk",
    "dd01_exact_dedup", "dd02_minhash_lsh", "dd03_simhash",
    "dd04_ngram_jaccard", "dd05_embed_neardup", "dd06_dup_clusters",
    "dd07_cdc_chunking", "dd08_incremental_neardup", "dd09_shared_chunks",
    "dd10_bloom_prefilter", "dd11_containment", "dd12_substring_spans",
    "dd13_semantic_dedup", "dd14_incremental_spans",
    "dd15_semantic_decontam", "dd16_dup_coverage", "dd17_lsh_recall",
    "dp01_curation_pipeline", "dp02_hash_split", "dp03_seq_packing",
    "dp03b_shard_packing", "dp04_snapshot_diff", "dp05_scd_merge",
    "dp06_domain_cap", "dp07_weighted_sample", "dp08_ingest_gate",
    "dp09_decontam", "dp10_quality_threshold", "dp11_mixture_sample",
    "dp12_split_leakage", "dp13_token_budget", "dp14_leakage_quarantine",
    "dp15_temperature_mixture", "dp16_pps_sample", "dp17_curriculum_rank",
    "dp18_epoch_mixture", "mm01_binary_meta", "mm02_frame_sample",
    "mm03_byte_histogram", "mm04_resample", "mm05_batch_infer",
    "q01_pricing_summary", "q02_filter_pushdown", "q03_join_agg",
    "q04_multijoin_region", "q05_broadcast_dim", "q06_anti_join",
    "q07_semi_join", "q08_window_topk", "q09_window_running", "q10_top_n",
    "q11_distinct", "q12_rollup", "q13_setops", "q14_string_funcs",
    "q15_case_bucket", "q16_clean_codes", "q17_json_extract",
    "q18_exists_subq", "q19_count_distinct", "q20_having", "q21_sessionize",
    "q22_tumbling_daily", "q23_stream_windows", "q24_cube",
    "q25_grouping_sets", "q26_window_shift", "q27_union_all",
    "q28_approx_distinct", "q29_scalar_subq", "q30_asof_join",
    "q31_range_join", "q32_min_per_group", "q33_conditional_agg",
    "q34_percentiles", "q35_pivot", "q36_unpivot", "q37_explode_ordinal",
    "q38_stats_moments", "q39_full_outer", "q40_argminmax",
    "q41_string_agg", "q42_ntile_pctrank", "q43_range_frame",
    "q44_first_last", "q45_date_funcs", "q46_kmv_distinct",
    "q47_latest_per_key", "q48_regexp_all", "q49_bitwise_agg",
    "q50_stream_dedup", "q51_stream_join", "q52_array_funcs",
    "q53_correlated_avg", "q54_exists_combo", "q55_not_in",
    "q56_cte_argmax", "q57_session_window", "q58_salted_join",
    "q59_higher_order", "q60_json_roundtrip", "q61_try_cast",
    "q62_stream_sessions", "q63_percentile_disc", "q64_lateral_topk",
    "q65_interval_bin_join", "q66_stream_upsert", "q67_rule_range_join",
    "q68_pagerank", "q69_zorder_value", "q70_recursive_cte",
    "q71_zorder_range_join", "q72_stream_enrich", "q73_funnel",
    "q74_cohort_retention", "ref01_extract_short_desc",
    "ref02_extract_modifiers", "ref03_extract_deleted", "ref04_extract_ndc",
    "tx01_token_stats", "tx02_quality", "tx03_langid", "tx04_fingerprint",
    "tx05_subword_stats", "tx06_tfidf", "tx07_bigrams", "tx08_commonness",
    "tx09_repetition", "tx10_pii_redaction", "tx11_vocab_coverage",
    "tx12_gopher_gate", "tx13_novelty", "tx14_bigram_lm")
}
