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

try:
    from stockpy_spark.registry_ext import EXT_QUERIES
except ImportError:  # extensions land incrementally
    EXT_QUERIES = {}

_ALL = {**CORE_QUERIES, **EXT_QUERIES, **TPCH2_QUERIES, **HIVE_QUERIES, **TS_QUERIES, **GRAPH_QUERIES, **STREAM_QUERIES, **R6_QUERIES, **R6B_QUERIES, **R6C_QUERIES, **R6D_QUERIES, **R6E_QUERIES, **R7_QUERIES}

# The driver's correctness gate checks the FIRST 50 queries in dict
# insertion order. Round-9 rotation: the 7 remaining r04-stale queries
# lead (after this, no query's newest driver row is older than r05),
# then the 5 changed + 6 NEW round-9 queries so the driver
# validates the new code, then 32 of the 50 r05-green queries,
# oldest rows first. Past the window: r05 spill heads the round-10
# queue, then r06/r07/r08 blocks freshest-last, and the five
# rows-only queries (no SQL oracle by design) pinned PERMANENTLY at
# the end so the driver never burns a sampled slot on a guaranteed
# `no_oracle` err row (r07's only non-green row).
DRIVER_PRIORITY = [
    # --- round-9 window (50, all oracle-backed) ---
    # the 7 remaining r04-stale queries (newest driver row is r04)
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_tfidf",
    "text_redact_pii",
    "asof_purchase_view",
    "pipeline_clean_corpus",
    # round-9 code changes: the seasonal NULL-sigma coalesce, the
    # snapshot_diff empty-input guards, the interval_concurrency
    # broadcast-policy rework, the CDC sink's collision-safe
    # snapshot naming + marker-based recovery, and the GIF
    # transparency/disposal-3 compositing (new fixture + oracle) --
    # each needs a fresh driver row on the NEW code
    "ts_seasonal_outliers",
    "dq_snapshot_diff",
    "stream_cdc_upsert",
    "ev_concurrency",
    "mm_gif_frames",
    # round-9 NEW query: the eighth streaming class (observe() +
    # numRowsDroppedByWatermark late-data audit)
    "stream_late_accounting",
    # round-9 NEW query: leakage-guarded group split
    "split_group_guard",
    "mm_blob_pointer_read",
    "dp_event_counts",
    "gate_heavy_hitters",
    "text_dup_spans",
    # r05-green refresh, oldest rows first (32 fit the window)
    "mm_decode_features",
    "text_fingerprint",
    "text_repetition",
    "sample_hash_docs",
    "split_train_test",
    "pack_context_bins",
    "rj1_price_band",
    "rj2_event_windows",
    "rj3_promo_overlap",
    "ts_bucket_rollup",
    "ts_rollup_two_level",
    "mm_decode_wav",
    "graph_dedup_components",
    "fmt_csv_events",
    "fmt_json_events",
    "fmt_orc_events",
    "emb_label_centroids",
    "merge_incremental_upsert",
    "sample_stratified",
    "pipeline_dedup_cc",
    "ts_gap_fill_locf",
    "mm_resize_pixels",
    "ts_hopping_rollup",
    "text_rolling_fingerprint",
    "q7_volume_shipping",
    "q9_product_profit",
    "q12_late_shipments",
    "w5_sessionize",
    "pack_materialize",
    "gate_ann_recall",
    "gate_ivf_recall",
    "gate_embedding_lsh_recall",
    "gate_approx_distinct_err",
    # --- first-50 window closes above; r05 spill heads the r10 queue ---
    "q4_priority_exists",
    "q22_idle_rich_customers",
    "q10_returned_revenue",
    "set2_intersect",
    "set3_except",
    "f10_string_funcs",
    "f11_date_funcs",
    "q13_custdist",
    "q17_small_qty",
    "q15_scalar_subquery",
    "w8_lead_first_last",
    "a13_conditional_agg",
    "q5_multi_join",
    "q6_forecast_revenue",
    "j6_salted_join",
    "a11_percentiles",
    "a12_grouping_sets",
    # r06-green block
    "w6_rank_family",
    "w7_range_frame",
    "p10_unpivot",
    "f8_math_funcs",
    "f9_posexplode_tokens",
    "p1_conditional_cast",
    "p8_p9_dropna_cast",
    "j1_broadcast_enrich",
    "j2_agg_backjoin",
    "j2w_window_stats",
    "j3_inner_join_agg",
    "j4_semi_join",
    "j5_anti_join",
    "a1_group_agg",
    "a4_dedup_first",
    "a6_count_distinct",
    "a7_minmax_stddev",
    "a8_rollup",
    "a9_cube",
    "a10_pivot",
    "w1_lag_delta",
    "w2_rolling_mean",
    "w3_topk_per_group",
    "w4_running_sum",
    "stream_hourly_agg",
    "stream_hopping_agg",
    "mm_decode_gif",
    "chunk_documents",
    "emb_pq_codes",
    "dedup_incremental",
    "sample_weighted",
    "text_top_terms",
    "gate_jpeg_fidelity",
    "f14_variant_props",
    "ts_ewma",
    "profile_events",
    "stream_static_enrich",
    "ts_trend",
    "pipeline_training_prep",
    "stream_running_stats",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "text_bm25_topk",
    "emb_kmeans_assign",
    "emb_kmeans_summary",
    "quality_robust_clip",
    # r07-green block
    "gate_hll_rollup",
    "ts_session_window",
    "stream_dedup_keys",
    "funnel_conversion",
    "cohort_retention_weekly",
    "part_pagerank",
    "scd2_event_history",
    "basket_rules",
    "event_transitions",
    "graph_triangles",
    "stream_join_attribution",
    "text_lm_perplexity",
    "decontaminate_eval",
    "w9_rank_fractions",
    "hist_event_values",
    "corpus_line_dedup",
    "sample_temperature",
    "er_fuzzy_match",
    "ts_gap_fill_linear",
    "ts_anomaly_zscore",
    "dq_constraint_suite",
    "pareto_frontier",
    "text_inverted_index",
    "graph_bfs_hops",
    "feat_quantile_bins",
    "dedup_containment",
    "dq_benford_prices",
    "setsim_jaccard_join",
    "drift_psi_value",
    "drift_ks_value",
    "stats_corr_matrix",
    "stats_cat_association",
    "ts_cusum_alarm",
    "stats_welch_ttest",
    "dq_mahalanobis_outliers",
    "profile_entropy",
    "sample_negative_pairs",
    "dq_key_skew",
    "stats_gini_revenue",
    "agg_top_movers",
    "sample_matched_controls",
    "plan_domain_mixture",
    "ts_incremental_state",
    "mm_audio_dsp",
    "gate_pca_variance",
    "text_bpe_vocab",
    "agg_price_volume",
    # r08-green block (freshest driver rows)
    "semdedup_prune",
    "gate_kll_rollup",
    "gate_theta_overlap",
    "stats_ols2",
    "fmt_xml_events",
    "graph_sssp_weighted",
    "dedup_temporal",
    "gate_hll_by_type",
    "a2_count_star",
    "a3_distinct",
    "p2_rename_literal",
    "p6_filter_range",
    "p7_cross_column_equal",
    "f12_conditional",
    "hive_prune_day",
    "hive_partition_counts",
    "hive_prune_range",
    "hive_incremental_cycle",
    "mm_decode_png",
    "flagship_event_enrichment",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "o1_topk",
    "set1_union_by_name",
    "f1_regexp_date_json",
    "f7_string_funcs",
    "p4_fuzzy_align",
    "pipeline_extract_stocks",
    "mm_decode_pixels",
    "q8_market_share",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    "q21_blame_supplier",
    "q16_supplier_variety",
    "q20_heavy_shippers",
    "f13_array_funcs",
    "dedup_exact_stats",
    "dedup_exact_docs",
    "dedup_word_jaccard",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_assign",
    "dedup_simhash",
    "dedup_simhash64",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    # rows-only queries (no SQL-expressible oracle by design) pinned
    # PERMANENTLY last so the driver never burns a sampled slot on a
    # guaranteed no_oracle row
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
