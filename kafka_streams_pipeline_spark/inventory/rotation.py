"""Driver-certification window rotation bookkeeping.

The driver's per-round correctness gate covers only the FIRST 50
entries of ``__spark_entry__.queries()``; these lists rotate every
query through that window so each accumulates (and refreshes) a green
driver row. ``tools/rotate.py`` derives the per-round edits to these
lists from the recorded CORRECTNESS_r*.json evidence.

As of round 8 every registered query has at least one green driver
row (166/166 after round 7 — the terminal parity milestone), so the
window's job is purely freshness: re-certify the stalest rows first
so no query's latest evidence ages past ~3 rounds, with _RECHECK
pulling code-changed rows to the front.
"""

from __future__ import annotations

from kafka_streams_pipeline_spark.inventory._registry import QUERIES

# Queries with a GREEN driver correctness row, ordered
# oldest-evidence-first so the spare window slots re-certify the
# stalest rows as a regression guard. The driver's per-round gate
# only covers the first 50 entries of ``__spark_entry__.queries()``,
# so rotation is required for every operator to accumulate a driver
# row: certified names go to the back of the returned dict,
# never-checked names to the front (VERDICT r2 "Next round" item 3,
# VERDICT r3 items 1-2, VERDICT r4 items 1-2).
# Round-5 evidence (CORRECTNESS_r05.json residue after round 9
# re-certified the head of this list; these 17 are now the stalest
# rows and head the round-10 window tail — VERDICT r9 item 3):
_CERTIFIED_R5: list[str] = [
]
# Round-6 evidence (CORRECTNESS_r06.json residue): empty — the whole
# tier was re-certified in the round-11 window (CORRECTNESS_r11.json,
# 50/50 green) and now lives in _CERTIFIED_R11.
_CERTIFIED_R6: list[str] = [
]
# Round-7 evidence (CORRECTNESS_r07.json residue): empty — the whole
# tier was re-certified in the round-13 window (CORRECTNESS_r13.json,
# 50/50 green) and now lives in _CERTIFIED_R13.
_CERTIFIED_R7: list[str] = [
]
# Round-8 evidence residue (CORRECTNESS_r08.json): the round-14
# window re-certified 43 of the 45 r8-vintage rows (now in
# _CERTIFIED_R14); these 2 are the stalest rows in the repo and head
# the round-15 re-cert tail.
_CERTIFIED_R8: list[str] = []
# in window order: the 30 round-9 additions (auto-head), the 5
# _RECHECK re-certifications, then the stalest r5/r6 re-certs
# (CORRECTNESS_r09.json, 50/50 green).
_CERTIFIED_R9: list[str] = []

# in window order: the 16 round-10 additions + q_streaming_semi_join,
# the 11 _RECHECK re-certifications, then the 22 stalest r5/r6
# re-certs (CORRECTNESS_r10.json, 50/50 green; derived by
# tools/rotate.py).
_CERTIFIED_R10: list[str] = [
    "q_maxsim_topk",
    "q_ivf_knn_join",
    "q_ivf_recall",
    "q_decontaminate",
    "q_local_clustering",
    "q_profile_drift",
    "q_dsir_select",
    "q_shard_balance",
    "q_join_size_estimate",
    "q_streaming_decontaminate",
    "q_store_tags",
    "q_streaming_drift",
    "q_store_text_index",
    "q_streaming_semi_join",
    "q_dedup_recall",
    "q_dedup_incremental",
    "q_corpus_versioning",
    "q_corpus_checkpoint",
    "q_corpus_vacuum",
    "q_corpus_upsert",
    "q_store_history",
    "q_streaming_store_ingest",
    "q_weighted_sample",
    "q_histogram_by_group",
    "q_histogram_incremental",
    "q_supplier_volume",
    "q_quantiles",
    "q_pivot",
    "q_corr_stats",
    "q_group_mode",
    "q_hash_sample",
    "q_dedup_exact",
    "q_dedup_normalized",
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_dedup_simhash",
    "q_dedup_embed",
    "q_dedup_embed_lsh",
    "q_sim_topk",
    "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    "q_array_stats",
    "q_streaming_dedup",
    "q_streaming_hll",
    "q_bm25",
    "q_knn_join",
    "q_skew_report",
]

# in window order: the 7 round-11 headline registrations, the 3
# _RECHECK re-certifications (code changed in r11: two-phase
# negative_samples rank, prefix-filtered containment default,
# AQE-chosen k_anonymize join), then the full 40-row r6-vintage
# re-cert tail (CORRECTNESS_r11.json, 50/50 green; derived by
# tools/rotate.py).
_CERTIFIED_R11: list[str] = [
    "q_hard_negatives",
    "q_boilerplate_scrub",
    "q_budget_select",
    "q_ngram_diversity",
    "q_store_version_diff",
    "q_streaming_neardup",
    "q_negative_sampling",
    "q_k_anonymity",
    "q_streaming_totals",
    "q_streaming_alerts",
    "q_csv_source",
    "q_orc_source",
    "q_disjunctive_revenue",
    "q_top_supplier",
    "q_profit_by_nation",
    "q_component_sizes",
    "q_hll_by_group",
    "q_trailing_window",
    "q_snapshot_ring",
    "q_media_features",
    "q_rag_chunks",
    "q_embed_rp_reduce",
    "q_join_full",
    "q_join_cross",
    "q_vocab_coverage",
    "q_text_tokens",
    "q_text_wordcount",
    "q_lang_id",
    "q_lang_stats",
    "q_pii_scrub",
    "q_doc_length_hist",
    "q_quality_score",
    "q_fingerprint",
    "q_multimodal_meta",
    "q_sliding_window",
    "q_session_window",
    "q_text_bigrams",
    "q_dedup_edit",
    "q_repetition_stats",
    "q_heuristic_filter",
    "q_hash_split",
    "q_ivf_train",
    "q_embed_quantize",
    "q_corpus_stats",
    "q_pack_sequences",
    "q_mixture_sample",
    "q_corpus_pipeline",
]

# Promoted from the round-12 driver window (CORRECTNESS_r12.json,
# 50/50 green; derived by tools/rotate.py): the 9 round-12 headline
# registrations, the 23 r11 on-deck rows, the 3 dedup _RECHECK
# re-certifications, then the 15 stalest r7 re-certs.
_CERTIFIED_R12: list[str] = [
    "q_media_warc_gz",
    "q_warc_cdx",
    "q_table_profile_approx",
    "q_anomaly_mad_approx",
    "q_event_pattern_gaps",
    "q_store_retention",
    "q_streaming_event_pattern",
    "q_sensor_gaps",
    "q_percentile_binned",
    "q_group_quantile_filter",
    "q_ref_integrity",
    "q_recursive_reachability",
    "q_counter_rate",
    "q_time_weighted_avg",
    "q_ohlc_bars",
    "q_anomaly_mad",
    "q_rrf_fusion",
    "q_keyword_extract",
    "q_streaming_ohlc",
    "q_cusum_alarms",
    "q_streaming_twa",
    "q_gapfill_locf",
    "q_streaming_cusum",
    "q_media_warc_shards",
    "q_sensor_scorecard",
    "q_store_phrase_search",
    "q_winsorized_stats",
    "q_ann_filtered",
    "q_media_zip_shards",
    "q_streaming_counter",
    "q_event_pattern",
    "q_store_partition_evolution",
    "q_dedup_containment",
    "q_dedup_prefix_join",
    "q_spend_quartile_scalable",
    "q_streaming_cms",
    "q_streaming_join",
    "q_streaming_sessions",
    "q_streaming_restart",
    "q_view_compaction",
    "q_streaming_late_update",
    "q_streaming_late_drop",
    "q_pipeline_audit",
    "q_vocab_build",
    "q_temperature_mixture",
    "q_term_stats",
    "q_range_band_join",
    "q_interval_join",
    "q_window_ntile",
]

# Promoted from the round-13 driver window (CORRECTNESS_r13.json,
# 50/50 green; derived by tools/rotate.py): the 14 round-13 headline
# registrations, the 6 r12 on-deck continuation rows, the 1 _RECHECK
# re-certification (q_dedup_hamming after the identical-signature
# collapse), then the 29 stalest re-certs (the full 28-row r7-vintage
# tier + q_media_binary_source from r8).
_CERTIFIED_R13: list[str] = [
    "q_span_dedup",
    "q_record_linkage",
    "q_token_cooccurrence",
    "q_streaming_ivm_join",
    "q_ivm_agg",
    "q_streaming_ivm_agg",
    "q_streaming_table_join",
    "q_streaming_full_join",
    "q_streaming_skyline",
    "q_streaming_record_linkage",
    "q_streaming_span_dedup",
    "q_lttb_prereduced",
    "q_lttb_downsample",
    "q_streaming_gaps",
    "q_ivm_join",
    "q_ivm_join_retract",
    "q_kcore",
    "q_linear_attribution",
    "q_dedup_hamming",
    "q_grouping_sets",
    "q_minmax_by",
    "q_sessionize",
    "q_order_priority",
    "q_priority_shipmode",
    "q_chunk_dedup",
    "q_contamination",
    "q_stratified_sample",
    "q_daily_rollup",
    "q_precision_reagg",
    "q_unpivot",
    "q_history_ordered",
    "q_unigram_surprisal",
    "q_small_qty_revenue",
    "q_large_orders",
    "q_customer_distribution",
    "q_hll_distinct",
    "q_radius_search",
    "q_decayed_engagement",
    "q_kmv_distinct",
    "q_source_cap",
    "q_revenue_forecast",
    "q_volume_shipping",
    "q_market_share",
    "q_returned_items",
    "q_waiting_suppliers",
    "q_sales_opportunity",
    "q_pq_encode",
    "q_media_binary_source",
]

# Promoted from the round-14 driver window (CORRECTNESS_r14.json,
# 50/50 green; derived by tools/rotate.py): the 1 round-14 headline
# registration (q_entity_golden_alt — the forced-alternating entity
# closure, VERDICT r13 item 7), the 6 r13 on-deck continuation rows,
# then the 43 r8-vintage re-certs.
_CERTIFIED_R14: list[str] = [
    "q_entity_golden_alt",
    "q_bipartite_cooccurrence",
    "q_streaming_heavy_hitters",
    "q_entity_golden",
    "q_sliding_distinct",
    "q_streaming_entity_golden",
    "q_streaming_sliding_distinct",
    "q_encode_documents",
    "q_bigram_surprisal_hashed",
    "q_repeated_ngrams_hashed",
    "q_salted_join",
    "q_semantic_dedup",
    "q_repeated_ngrams",
    "q_bigram_surprisal",
    "q_pq_adc_topk",
    "q_window_cume",
    "q_scan_project",
    "q_filter_time_range",
    "q_json_extract",
    "q_event_time_valid",
    "q_hourly_view",
    "q_history",
    "q_history_interval",
    "q_snapshot",
    "q_reagg_merge",
    "q_gapfill",
    "q_date_trunc_funcs",
    "q_string_funcs",
    "q_math_funcs",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_group_distinct",
    "q_dedup_components",
    "q_dedup_components_alt",
    "q_dedup_best_keeper",
    "q_media_decode",
    "q_media_audio_energy",
    "q_media_image_decode",
    "q_media_image_resize",
    "q_media_video_frames",
    "q_media_jpeg_decode",
    "q_media_mjpeg_frames",
    "q_media_png_decode",
    "q_media_mp4_frames",
    "q_bloom_prefilter",
    "q_cms_heavy_hitters",
    "q_rollup",
]
# in window order: the r15 registration q_streaming_cosine_refresh
# (headed the window per VERDICT r14 item 7), the 4 r14 on-deck
# continuation rows, the 2 _RECHECK re-certifications (skyline
# literal-map carry fusion, MG summary return path), then the 43
# stalest re-certs (r8 residue + 41 of the r9 stratum)
# (CORRECTNESS_r15.json, 50/50 green).
_CERTIFIED_R15: list[str] = [
    "q_streaming_cosine_refresh",
    "q_cosine_pairs",
    "q_acf",
    "q_streaming_cosine_pairs",
    "q_streaming_acf",
    "q_skyline",
    "q_heavy_hitters_exact",
    "q_cube",
    "q_salted_agg",
    "q_media_gif_frames",
    "q_media_tar_shards",
    "q_ivf_pq_topk",
    "q_tokenizer_pipeline",
    "q_epoch_shuffle",
    "q_table_profile",
    "q_quality_checks",
    "q_textrank",
    "q_bpe_train",
    "q_triangle_count",
    "q_decode_documents",
    "q_cdc_chunk_dedup",
    "q_epoch_manifest",
    "q_kmv_set_ops",
    "q_streaming_outer_join",
    "q_zorder_layout",
    "q_hll_incremental",
    "q_store_bloom_index",
    "q_store_minmax_index",
    "q_cms_incremental",
    "q_gated_ingest",
    "q_gzip_source",
    "q_streaming_histogram",
    "q_avro_source",
    "q_corpus_schema_evolution",
    "q_streaming_view",
    "q_asof_attribution",
    "q_window_rank",
    "q_window_lag",
    "q_retention",
    "q_funnel",
    "q_latest_by_key",
    "q_scd2_intervals",
    "q_rolling_zscore",
    "q_set_ops",
    "q_union",
    "q_topk_limit",
    "q_tpch_pricing",
    "q_shipping_priority",
    "q_local_supplier_volume",
    "q_promo_share",
]

# The NEWLY certified rows of the r16 window (CORRECTNESS_r16.json):
# the 4 round-16 registrations + the 5 r15 on-deck continuation rows.
# The window's other 41 green rows were RE-certifications of names
# already in older tiers (incl. the q_streaming_acf _RECHECK) —
# their freshness lives in the CORRECTNESS evidence rotate.py reads,
# not in the tier lists, so they are not repeated here.
_CERTIFIED_R16: list[str] = [
    "q_kll_quantiles",
    "q_streaming_kll",
    "q_streaming_privacy",
    "q_theil_sen_windowed",
    "q_ccf",
    "q_l_diversity",
    "q_theil_sen",
    "q_streaming_theil_sen",
    "q_streaming_ccf",
]

DRIVER_CERTIFIED: list[str] = (
    _CERTIFIED_R5 + _CERTIFIED_R6 + _CERTIFIED_R7 + _CERTIFIED_R8
    + _CERTIFIED_R9 + _CERTIFIED_R10 + _CERTIFIED_R11 + _CERTIFIED_R12
    + _CERTIFIED_R13 + _CERTIFIED_R14 + _CERTIFIED_R15 + _CERTIFIED_R16
)
# Queries awaiting their first green driver row. Empty since round 7:
# all queries registered before this round carry a green row.
_UNCERTIFIED_RED: list[str] = []
_PENDING: list[str] = []
# Queries added after the last driver window that should certify
# before the stalest re-certs: the 4 round-14 continuation rows
# rotated out of _DEFERRED for the round-15 window (VERDICT r14
# item 1). All 4 were oracle-verified green by the r14 judge's own
# check_oracle.py run; this rotation converts that into driver rows.
# The 12 round-16 _DEFERRED rows rotate forward for the round-17
# window (each was oracle-verified green at sf0.001/sf0.01 + the
# vanilla-TZ driver-sim before parking, NOTES_r16; re-verified in the
# r17 full sweeps).
_ON_DECK: list[str] = [
    "q_t_closeness",
    "q_streaming_theil_sen_windowed",
    "q_leakage_safe_split",
    "q_seasonal_decompose",
    "q_streaming_seasonal",
    "q_streaming_t_closeness",
    "q_changepoint_amoc",
    "q_ewma",
    "q_streaming_ewma",
    "q_seasonal_naive_backtest",
    "q_asof_tolerance",
    "q_streaming_backtest",
]
# Certified queries whose backing operator code changed materially
# since their last green driver row (ADVICE r4): list them here to
# pull them to the window front for re-certification without losing
# their certified status bookkeeping. ADVICE r14 item 2: round 14
# rewrote skyline banding (fixed-width -> quantile edges) and the MG
# summary return path after their r13 certification rows, so both
# re-certify in the r15 window against the unchanged oracles.
# Round-17 optimization changes: operators whose backing code changed
# materially after their last green row (xxhash64 shingle/gram keys in
# prefix_jaccard_join/boilerplate_scrub, the simhash64 codegen
# aggregation, the one-barrier _oriented_edges, the fused
# q_corpus_upsert liveness guard, the KLL qs assert, the bm25/rrf
# materialize flags). Each re-verified oracle-exact at
# sf0.001/0.01/0.1 this round; these convert that into driver rows.
_RECHECK: list[str] = [
    "q_dedup_prefix_join",
    "q_boilerplate_scrub",
    "q_dedup_hamming",
    "q_triangle_count",
    "q_local_clustering",
    "q_corpus_upsert",
    "q_kll_quantiles",
    "q_streaming_kll",
    "q_bm25",
    "q_rrf_fusion",
]
# New queries deliberately parked at the BACK of the rotation for one
# round so the current window's composition is preserved; moved to
# _ON_DECK next round. Entries parked here must be oracle-verified
# green at sf0.001 / sf0.01 and under the vanilla-TZ driver-sim
# before parking. The round-16 window is budgeted: 4 new
# registrations (q_theil_sen_windowed, q_kll_quantiles,
# q_streaming_kll, q_streaming_privacy — VERDICT r15 items 3/4/8
# want driver rows) + 5 on-deck + 41 stalest re-certs = 50, so the
# THREE other round-16 additions park here (each verified green at
# sf0.001 + sf0.01 + vanilla-TZ sim before parking, NOTES_r16).
# Empty for round 17: no new registrations (optimization round); the
# round-16 parkees moved to _ON_DECK above. Window budget: 12 on-deck
# + 10 _RECHECK + 28 stalest re-certs = 50.
_DEFERRED: list[str] = []


def driver_order() -> list[str]:
    """Registration names reordered for the driver's 50-query
    correctness window: every query lacking a green driver row first
    (unlisted new registrations, then red/pending/on-deck backlogs),
    then certified queries whose code changed since certification
    (_RECHECK), then the certified backlog oldest-evidence-first so
    spare slots re-certify the stalest green rows."""
    back = (
        set(DRIVER_CERTIFIED)
        | set(_UNCERTIFIED_RED)
        | set(_PENDING)
        | set(_ON_DECK)
        | set(_DEFERRED)
    )
    head = [n for n in QUERIES if n not in back]
    recheck = [n for n in _RECHECK if n not in head]
    certified_tail = [n for n in DRIVER_CERTIFIED if n not in recheck]
    return (
        head + _UNCERTIFIED_RED + _PENDING + _ON_DECK
        + recheck + certified_tail + _DEFERRED
    )
