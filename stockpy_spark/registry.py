"""Combined query registry: reference parity + scale extensions.

QUERIES maps name -> spark_fn (spark, sf_dir) -> DataFrame.
ORACLES maps name -> ANSI SQL for DuckDB (absent => rows-only check).
"""

from __future__ import annotations

from stockpy_spark.registry_core import CORE_QUERIES
from stockpy_spark.registry_hive import HIVE_QUERIES
from stockpy_spark.registry_tpch2 import TPCH2_QUERIES
from stockpy_spark.registry_graph import GRAPH_QUERIES
from stockpy_spark.registry_stream import STREAM_QUERIES
from stockpy_spark.registry_ts import TS_QUERIES
from stockpy_spark.registry_r6 import R6_QUERIES
from stockpy_spark.registry_r6b import R6B_QUERIES
from stockpy_spark.registry_r6c import R6C_QUERIES
from stockpy_spark.registry_r6d import R6D_QUERIES
from stockpy_spark.registry_r6e import R6E_QUERIES
from stockpy_spark.registry_r7 import R7_QUERIES
from stockpy_spark.registry_r13 import R13_QUERIES
from stockpy_spark.registry_r15 import R15_QUERIES

try:
    from stockpy_spark.registry_ext import EXT_QUERIES
except ImportError:  # extensions land incrementally
    EXT_QUERIES = {}

_ALL = {**CORE_QUERIES, **EXT_QUERIES, **TPCH2_QUERIES, **HIVE_QUERIES, **TS_QUERIES, **GRAPH_QUERIES, **STREAM_QUERIES, **R6_QUERIES, **R6B_QUERIES, **R6C_QUERIES, **R6D_QUERIES, **R6E_QUERIES, **R7_QUERIES, **R13_QUERIES, **R15_QUERIES}

# The driver's correctness gate checks the FIRST 50 queries in dict
# insertion order. Round-16 rotation (r15 verdict item #1, the staged
# split applied): pack_boundary_masks LEADS (the round-15 landing, the
# only never-driver-checked query), then stats_kde_grid (the fill row
# the r15 touched-block displaced), then the 21 queries whose OPERATOR
# CODE moved in this optimization round — the admitter/dedup spine
# (stream_minhash_admit, dedup_incremental, dedup_minhash_assign,
# pipeline_clean_corpus, pipeline_data_release: subtree pins + bounded
# delta width), the zero-shuffle line-op family (text_boilerplate,
# text_line_dedup_intra, corpus_line_dedup), the spread-guard/codec
# family (decontaminate_eval, mm_video_frames + gate_jpeg_fidelity on
# the rewritten JPEG kernel, mm_gif_frames + mm_equalize_hist +
# mm_decode_gif on the rewritten GIF kernel, mm_phash_neardup), the CC
# consumers (pipeline_dedup_cc, graph_dedup_components,
# mm_phash_dedup_cc, pipeline_image_dedup: explode symmetrization +
# probe-on-pin), stats_spearman (census fusion + rank broadcast) and
# sample_dsir_weights (census pin) — every one re-greened same-session
# via tools/check.py before entering — then 27 oldest-green fill
# members in their standing freshest-last order. 2 + 21 + 27 = 50.
#
# Round-17 STAGING (positions 51+): no new query landed in r16, so
# nothing is window-due by the landing rule; lead with any query whose
# code changes in r17 (re-greened same session), then the standing
# freshest-last fill (the r10-r14 cohorts in list order, then the 41
# r15-window members rotated out this round, whose driver greens are
# newest), and the five rows-only queries (no SQL oracle by design)
# pinned PERMANENTLY at the end so the driver never burns a sampled
# slot on a guaranteed no_oracle row.
DRIVER_PRIORITY = [
    "pack_boundary_masks",
    "stats_kde_grid",
    "stream_minhash_admit",
    "dedup_incremental",
    "mm_video_frames",
    "gate_jpeg_fidelity",
    "mm_gif_frames",
    "mm_equalize_hist",
    "mm_phash_dedup_cc",
    "mm_phash_neardup",
    "pipeline_image_dedup",
    "mm_decode_gif",
    "corpus_line_dedup",
    "decontaminate_eval",
    "stats_spearman",
    "dedup_minhash_assign",
    "text_boilerplate",
    "text_line_dedup_intra",
    "pipeline_data_release",
    "sample_dsir_weights",
    "graph_dedup_components",
    "pipeline_clean_corpus",
    "pipeline_dedup_cc",
    "stream_blob_ingest",
    "stream_cm_merge",
    "stream_late_accounting",
    "text_despan",
    "text_dup_spans",
    "text_gopher_quality",
    "text_pmi_collocations",
    "ts_acf",
    "w6_rank_family",
    "w7_range_frame",
    "w8_lead_first_last",
    "a10_pivot",
    "a1_group_agg",
    "a4_dedup_first",
    "a6_count_distinct",
    "a7_minmax_stddev",
    "a8_rollup",
    "a9_cube",
    "attr_last_touch",
    "chunk_documents",
    "dedup_bloom_screen",
    "emb_kmeans_assign",
    "emb_kmeans_summary",
    "emb_pq_codes",
    "er_fellegi_sunter",
    "f14_variant_props",
    "f9_posexplode_tokens",
    "j1_broadcast_enrich",
    "j2_agg_backjoin",
    "j2w_window_stats",
    "j3_inner_join_agg",
    "j4_semi_join",
    "j5_anti_join",
    "p1_conditional_cast",
    "p8_p9_dropna_cast",
    "pipeline_training_prep",
    "privacy_k_anonymity",
    "profile_events",
    "q11_important_parts",
    "q2_min_cost_supplier",
    "quality_robust_clip",
    "sample_weighted",
    "stream_hopping_agg",
    "stream_hourly_agg",
    "stream_running_stats",
    "stream_static_enrich",
    "text_bm25_topk",
    "text_top_terms",
    "ts_ewma",
    "ts_trend",
    "w1_lag_delta",
    "w2_rolling_mean",
    "w3_topk_per_group",
    "w4_running_sum",
    "agg_price_volume",
    "agg_top_movers",
    "basket_rules",
    "cohort_retention_weekly",
    "dedup_containment",
    "dq_benford_prices",
    "dq_constraint_suite",
    "dq_key_skew",
    "dq_mahalanobis_outliers",
    "drift_ks_value",
    "drift_psi_value",
    "er_fuzzy_match",
    "ev_concurrency",
    "event_transitions",
    "feat_quantile_bins",
    "funnel_conversion",
    "gate_hll_rollup",
    "gate_pca_variance",
    "graph_bfs_hops",
    "graph_triangles",
    "hist_event_values",
    "mm_audio_dsp",
    "pareto_frontier",
    "part_pagerank",
    "plan_domain_mixture",
    "profile_entropy",
    "sample_matched_controls",
    "sample_negative_pairs",
    "sample_temperature",
    "scd2_event_history",
    "setsim_jaccard_join",
    "stats_cat_association",
    "stats_corr_matrix",
    "stats_gini_revenue",
    "stats_welch_ttest",
    "stream_dedup_keys",
    "stream_join_attribution",
    "text_bpe_vocab",
    "text_inverted_index",
    "ts_anomaly_zscore",
    "ts_cusum_alarm",
    "ts_gap_fill_linear",
    "ts_incremental_state",
    "ts_session_window",
    "w9_rank_fractions",
    "web_domain_filter",
    "a2_count_star",
    "a3_distinct",
    "decontaminate_fuzzy",
    "dedup_embedding_cosine",
    "dedup_exact_docs",
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash64",
    "dedup_temporal",
    "dedup_word_jaccard",
    "drift_psi_series",
    "f12_conditional",
    "f13_array_funcs",
    "f1_regexp_date_json",
    "f7_string_funcs",
    "feat_target_encode",
    "flagship_event_enrichment",
    "fmt_xml_events",
    "gate_hll_by_type",
    "gate_kll_rollup",
    "gate_theta_overlap",
    "graph_sssp_weighted",
    "hive_incremental_cycle",
    "hive_partition_counts",
    "hive_prune_day",
    "hive_prune_range",
    "mm_decode_pixels",
    "mm_decode_png",
    "o1_topk",
    "p2_rename_literal",
    "p4_fuzzy_align",
    "p6_filter_range",
    "p7_cross_column_equal",
    "pack_chunks_ordered",
    "pack_efficiency",
    "pipeline_extract_stocks",
    "pipeline_web_curation",
    "q14_promo_revenue",
    "sample_score_calibration",
    "sample_shard_shuffle",
    "stream_psi_monitor",
    "text_nb_quality",
    "text_normalize",
    "web_url_canonical",
    "q16_supplier_variety",
    "q18_large_orders",
    "q19_disjunctive",
    "q1_pricing_summary",
    "q20_heavy_shippers",
    "q21_blame_supplier",
    "q3_top_unshipped",
    "q8_market_share",
    "semdedup_prune",
    "set1_union_by_name",
    "sim_cosine_topk",
    "stats_ols2",
    "pipeline_release_funnel",
    "stream_shard_positions",
    "text_kn_perplexity",
    "text_lm_perplexity",
    "text_gopher_repetition",
    "asof_purchase_view",
    "dp_event_counts",
    "dq_snapshot_diff",
    "emb_label_centroids",
    "fmt_csv_events",
    "fmt_json_events",
    "fmt_orc_events",
    "gate_ann_recall",
    "gate_embedding_lsh_recall",
    "gate_heavy_hitters",
    "gate_ivf_recall",
    "merge_incremental_upsert",
    "mm_decode_features",
    "mm_decode_wav",
    "mm_resize_pixels",
    "pack_context_bins",
    "pack_materialize",
    "q12_late_shipments",
    "q7_volume_shipping",
    "q9_product_profit",
    "rj1_price_band",
    "rj2_event_windows",
    "rj3_promo_overlap",
    "sample_hash_docs",
    "sample_stratified",
    "split_train_test",
    "stream_cdc_upsert",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_redact_pii",
    "text_repetition",
    "text_rolling_fingerprint",
    "text_tfidf",
    "text_token_count",
    "ts_bucket_rollup",
    "ts_gap_fill_locf",
    "ts_hopping_rollup",
    "ts_rollup_two_level",
    "ts_seasonal_outliers",
    "w5_sessionize",
    "a11_percentiles",
    "a12_grouping_sets",
    "a13_conditional_agg",
    "f10_string_funcs",
    "f11_date_funcs",
    "f8_math_funcs",
    "gate_approx_distinct_err",
    "graph_label_prop",
    "j6_salted_join",
    "mm_blob_pointer_read",
    "p10_unpivot",
    "q10_returned_revenue",
    "q13_custdist",
    "q15_scalar_subquery",
    "q17_small_qty",
    "q22_idle_rich_customers",
    "q4_priority_exists",
    "q5_multi_join",
    "q6_forecast_revenue",
    "sample_kcenter_coreset",
    "set2_intersect",
    "set3_except",
    "sketch_cm_counts",
    "split_group_guard",
    "stats_cuped",
    "text_bpe_merges",
    "dedup_embedding_lsh",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "approx_distinct_users",
]


_ORDERED = {name: _ALL[name] for name in DRIVER_PRIORITY if name in _ALL}
_ORDERED.update({name: spec for name, spec in _ALL.items() if name not in _ORDERED})

QUERIES = {name: fn for name, (fn, _sql) in _ORDERED.items()}
ORACLES = {name: sql for name, (_fn, sql) in _ORDERED.items() if sql is not None}
