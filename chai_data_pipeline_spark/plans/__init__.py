"""Query registry package — import all plan modules to populate QUERIES/ORACLES."""

from .registry import AS_OF, AS_OF_DATE, ORACLES, QUERIES, query  # noqa: F401

# Each import registers its queries as a side effect.
from . import flagship  # noqa: F401,E402
from . import projections  # noqa: F401,E402
from . import joins  # noqa: F401,E402
from . import aggregates  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import gold  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import advanced  # noqa: F401,E402
from . import classic  # noqa: F401,E402
from . import tpch_more  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
from . import training  # noqa: F401,E402
from . import tpch2  # noqa: F401,E402
from . import tpch3  # noqa: F401,E402
from . import tpch4  # noqa: F401,E402
from . import medallion  # noqa: F401,E402
from . import diagnostics  # noqa: F401,E402
from . import sketches  # noqa: F401,E402
from . import retrieval  # noqa: F401,E402
from . import graph_analytics  # noqa: F401,E402
from . import spatial  # noqa: F401,E402
from . import pca  # noqa: F401,E402
from . import layout  # noqa: F401,E402
from . import sinks  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Registration ORDER is part of the driver contract: the per-round
# correctness gate checks queries in `queries()` dict order up to a cap
# (~50). To maximize the set of queries with at least one driver-green
# CORRECTNESS row across rounds, queries that already earned a green
# hash row in ANY past round are moved to the BACK of the dicts (they
# keep local sf0.001/sf0.01 parity protection against regression);
# everything still unverified by the driver comes first. Reorder is
# in-place so registry.QUERIES and plans.QUERIES stay the same objects.
#
# EACH ROUND (CLAUDE.md): fold the newest CORRECTNESS_r{N}.json greens
# into _DRIVER_GREEN below and rebuild _FRONT from what's still
# unchecked.
# ---------------------------------------------------------------------------

# Union of hash-green rows across CORRECTNESS_r01..r04
# (computed directly from the JSON files — 183 names).
_DRIVER_GREEN = {
    "anomaly_days_zscore", "anti_join_orphans", "argmax_top_segment",
    "asof_forward_attribution", "asof_join_last_signup",
    "asof_nearest_event", "audit_lineage_columns", "broadcast_dim_join",
    "cdc_apply_changes", "cms_heavy_hitters_checked",
    "conditional_counts", "corpus_overlap_sources",
    "cross_join_scalar_stats", "cube_revenue", "curation_end_to_end",
    "daily_summary", "daily_value_percentile_bands", "date_functions",
    "date_range_violations", "decontaminate_bloom",
    "decontaminate_exact", "dedup_cluster_components",
    "dedup_embedding_cosine", "dedup_exact_content", "dedup_fuzzy_names",
    "dedup_graph_degree_census", "dedup_keep_canonical",
    "dedup_keep_first", "dedup_minhash_lsh_checked",
    "dedup_ngram_jaccard", "dedup_simhash_checked", "deterministic_mode",
    "doc_chunking", "doc_contamination", "doc_fingerprints",
    "doc_quality_scores", "doc_repetition", "doc_sentiment",
    "doc_unigram_stats", "dq_single_pass", "dup_cluster_size_histogram",
    "embedding_centroid_drift", "embedding_centroids",
    "embedding_kmeans_checked", "eval_set_fixed_k",
    "event_transition_matrix", "event_type_cooccurrence",
    "except_inactive_users", "explode_word_counts",
    "fk_integrity_profile", "flagship_daily_event_trends",
    "freshness_union", "funnel_conversion", "gap_fill_daily",
    "gap_fill_interpolate", "global_asof_summary", "group_quantiles",
    "grouping_sets_priority", "heavy_hitters",
    "incremental_daily_refresh", "intersect_users",
    "interval_coalesce_user_activity", "inventory_running_balance",
    "json_extraction", "json_typed_parse", "key_frequency_histogram",
    "lag_dod_wow", "lang_id", "latest_partition_summary",
    "mad_robust_outliers", "manual_correlation", "manual_variance",
    "medallion_gold_summary", "medallion_pipeline_summary",
    "minmax_normalize_lengths", "mixture_weighted_sample",
    "monthly_kpis", "multimodal_decode_meta", "multimodal_frame_sample",
    "multimodal_metadata", "ntile_percentiles", "out_of_order_profile",
    "pagerank_trade_graph", "pca_power_iteration_checked",
    "peak_concurrency_daily", "per_source_cap", "percent_rank_cume_dist",
    "pii_redaction", "pivot_status_counts", "profile_orders",
    "proj_filter_pushdown", "psi_value_drift", "quantile_length_trim",
    "quantile_length_trim_approx", "range_partition_planner",
    "range_predicate_join", "range_window_trailing_7d",
    "rank_nations_by_balance", "recency_filter", "regex_extract_groups",
    "retention_cohorts", "revenue_pareto_by_nation", "rfm_segmentation",
    "rolling_distinct_users_7d", "rolling_user_avg", "rollup_revenue",
    "running_totals", "safe_arithmetic", "salted_event_counts",
    "sample_hash_deterministic", "scd2_history",
    "scd2_point_in_time_join", "segment_dedup_stats",
    "segment_nation_profile", "semi_join_active_customers",
    "sequence_packing", "sequence_packing_sharded",
    "session_funnel_conversion", "sessionization",
    "sessionized_bounce_rate", "similarity_ann_ivf_checked",
    "similarity_ann_lsh_checked", "similarity_ann_pq_checked",
    "similarity_cosine_topk", "similarity_knn_join",
    "sink_append_roundtrip", "sink_partitioned_roundtrip",
    "split_leakage_audit", "star_join_revenue",
    "streaming_dedup_delivery", "streaming_session_window",
    "streaming_sliding_counts", "streaming_stateful_totals",
    "streaming_stream_join", "streaming_tumbling_counts",
    "streaming_upsert_latest", "string_agg_segments",
    "string_cleaning_suite", "table_diff_reconcile", "text_stats",
    "tfidf_top_terms", "time_to_conversion_cohorts",
    "token_budget_allocation", "token_counts",
    "topk_customers_per_nation", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q12_priority_classes",
    "tpch_q13_customer_distribution", "tpch_q14_promo_effect",
    "tpch_q15_top_supplier", "tpch_q16_parts_supplier_count",
    "tpch_q17_small_quantity_revenue", "tpch_q18_large_volume_customers",
    "tpch_q19_discounted_revenue", "tpch_q1_pricing_summary",
    "tpch_q20_excess_suppliers", "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority", "tpch_q4_priority_check",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "train_test_split",
    "transition_dwell_times", "trend_applyinpandas",
    "trend_classification", "trend_slope", "two_level_agg",
    "unpivot_measures", "upsert_merge_by_key", "user_engagement",
    "user_event_bitmask", "user_value_diff", "value_histogram",
    "weekly_aggregates", "window_navigation", "zipf_slope_by_lang",
    "zorder_layout_audit",
}

# Permanently oracle-less (rows-only by nature: approx sketches,
# float32 features, iterative fp-dependent) — still worth ONE rows-only
# driver row each, but never ahead of an oracle-bearing unchecked query.
_NO_ORACLE_LAST = [
    "multimodal_features", "approx_distinct_users",
    "group_quantiles_approx", "dedup_minhash_lsh", "dedup_simhash",
    "similarity_ann_lsh", "similarity_ann_ivf", "embedding_kmeans",
]

# Round 5 front (cap ~50): re-checks of the two queries FIXED this
# round and the one whose oracle was extended, the new r5 query, then
# the VERDICT-r4 flagship never-checked oracle queries and as much of
# the 90-deep never-checked backlog as fits. The ~41 never-checked
# queries that do not fit are NOT listed: rank 1 in _rank() places
# every unchecked oracle query ahead of all greens anyway, so they are
# next in line if the cap stretches, and lead round 6.
_FRONT = [
    "skyline_cheapest_latest_per_nation",
    "capture_recapture_users",
    "medallion_gold_summary",
    "pipeline_weekly_aggregates",
    "hll_set_algebra_checked",
    "bm25_doc_retrieval",
    "unigram_lm_perplexity",
    "null_semantics_conformance",
    "approx_quantile_error_bounded",
    "approx_distinct_error_bounded",
    "histogram_quantiles_checked",
    "approx_distinct_hll_checked",
    "streaming_hll_distinct",
    "pq_reconstruction_error",
    "lsh_recall_audit",
    "embedding_norm_outliers",
    "hard_negative_mining",
    "retrieval_ndcg_audit",
    "triangle_count_trade_graph",
    "label_propagation_communities",
    "schema_evolution_union",
    "k_anonymity_audit",
    "golden_record_merge",
    "content_defined_chunking",
    "sorted_neighborhood_pairs",
    "doc_containment_pairs",
    "dedup_survivor_bias_audit",
    "quality_dup_calibration",
    "langid_confusion_matrix",
    "langid_cohens_kappa",
    "distinctive_terms_by_lang",
    "token_fertility_by_lang",
    "quality_classifier_scores",
    "classifier_reliability_bins",
    "classifier_auc_dup_separation",
    "word_pmi_cooccurrence",
    "ngram_novelty_by_source",
    "quantile_normalize_lengths",
    "mixture_temperature_weights",
    "weighted_sample_priority",
    "pps_systematic_sample",
    "bloom_fpp_audit",
    "chi_square_type_dow",
    "order_total_consistency",
    "rollup_cascade_consistency",
    "hierarchical_revenue_shares",
    "multiset_except_intersect",
    "gini_by_nation",
    "basket_affinity_parts",
    "pythagorean_means_by_type",
]


def _rank(name: str) -> tuple[int, int, int]:
    if name in _FRONT:
        return (0, 0, _FRONT.index(name))
    if name in _NO_ORACLE_LAST:
        # rows-only entries queue directly BEHIND the unchecked
        # oracle-bearing queries (VERDICT r4 item 9): once the oracle
        # backlog drains below the cap, they fill the spare slots
        # without needing a registry edit that round.
        return (1, 1, _NO_ORACLE_LAST.index(name))
    if name in _DRIVER_GREEN:
        return (2, 0, 0)
    return (1, 0, 0)


def _reorder_for_driver() -> None:
    order = sorted(QUERIES, key=_rank)  # stable within each rank class
    q = {n: QUERIES[n] for n in order}
    o = {n: ORACLES[n] for n in order if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


_reorder_for_driver()
