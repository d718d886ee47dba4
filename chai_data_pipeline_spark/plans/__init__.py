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

# Union of hash-green rows across CORRECTNESS_r01 + r02 + r03
# (computed directly from the JSON files — 137 names).
_DRIVER_GREEN = {
    "anti_join_orphans", "argmax_top_segment", "asof_join_last_signup",
    "audit_lineage_columns", "broadcast_dim_join", "cdc_apply_changes",
    "conditional_counts", "cross_join_scalar_stats", "cube_revenue",
    "curation_end_to_end", "daily_summary", "date_functions",
    "date_range_violations", "decontaminate_exact",
    "dedup_cluster_components", "dedup_embedding_cosine",
    "dedup_exact_content", "dedup_fuzzy_names", "dedup_keep_canonical",
    "dedup_keep_first", "dedup_minhash_lsh_checked",
    "dedup_ngram_jaccard", "dedup_simhash_checked", "doc_chunking",
    "doc_contamination", "doc_fingerprints", "doc_quality_scores",
    "doc_repetition", "doc_sentiment", "doc_unigram_stats",
    "dq_single_pass", "embedding_centroids", "embedding_kmeans_checked",
    "except_inactive_users", "explode_word_counts",
    "flagship_daily_event_trends", "freshness_union", "funnel_conversion",
    "gap_fill_daily", "gap_fill_interpolate", "global_asof_summary",
    "group_quantiles", "grouping_sets_priority", "heavy_hitters",
    "incremental_daily_refresh", "intersect_users", "json_extraction",
    "json_typed_parse", "lag_dod_wow", "lang_id",
    "latest_partition_summary", "manual_correlation", "manual_variance",
    "medallion_pipeline_summary", "mixture_weighted_sample",
    "monthly_kpis", "multimodal_decode_meta", "multimodal_frame_sample",
    "multimodal_metadata", "ntile_percentiles", "per_source_cap",
    "pii_redaction", "pivot_status_counts", "profile_orders",
    "proj_filter_pushdown", "quantile_length_trim",
    "quantile_length_trim_approx", "range_predicate_join",
    "range_window_trailing_7d", "rank_nations_by_balance",
    "recency_filter", "regex_extract_groups", "retention_cohorts",
    "rolling_user_avg", "rollup_revenue", "running_totals",
    "safe_arithmetic", "sample_hash_deterministic", "scd2_history",
    "segment_dedup_stats", "segment_nation_profile",
    "semi_join_active_customers", "sequence_packing",
    "sequence_packing_sharded", "sessionization",
    "similarity_ann_ivf_checked", "similarity_ann_lsh_checked",
    "similarity_ann_pq_checked", "similarity_cosine_topk",
    "similarity_knn_join", "star_join_revenue",
    "streaming_dedup_delivery", "streaming_session_window",
    "streaming_sliding_counts", "streaming_stateful_totals",
    "streaming_stream_join", "streaming_tumbling_counts",
    "streaming_upsert_latest", "string_cleaning_suite", "text_stats",
    "tfidf_top_terms", "token_counts", "topk_customers_per_nation",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q12_priority_classes", "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_count", "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers", "tpch_q19_discounted_revenue",
    "tpch_q1_pricing_summary", "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_supplier", "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_priority_check", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit", "train_test_split",
    "trend_applyinpandas", "trend_classification", "trend_slope",
    "two_level_agg", "unpivot_measures", "upsert_merge_by_key",
    "user_engagement", "user_value_diff", "value_histogram",
    "weekly_aggregates", "window_navigation",
}

# Permanently oracle-less (rows-only by nature: approx sketches,
# float32 features, iterative fp-dependent) — still worth ONE rows-only
# driver row each, but never ahead of an oracle-bearing unchecked query.
_NO_ORACLE_LAST = [
    "multimodal_features", "approx_distinct_users",
    "group_quantiles_approx", "dedup_minhash_lsh", "dedup_simhash",
    "similarity_ann_lsh", "similarity_ann_ivf", "embedding_kmeans",
]

# Round 4 front: the 5 never-checked oracle-bearing analytics queries
# first, then new round-4 queries, then first-ever rows-only rows
# (multimodal_features newly canonicalizer-safe; six sketch/float ops
# whose checked twins are green but which never got even a rows-only
# row), then re-checks of queries whose oracle or plan CHANGED this
# round, then stale-green rotation: the oldest/highest-traffic r1
# greens were earned on testdata regenerated twice since (ns → µs-NTZ)
# — local parity covers them, but a fresh driver hash under current
# data closes that gap. Rotation is the TAIL on purpose: cap
# truncation drops the lowest-value checks first.
_FRONT = [
    # never-checked, oracle-bearing analytics (round-3 additions)
    "salted_event_counts", "revenue_pareto_by_nation",
    "anomaly_days_zscore", "event_type_cooccurrence",
    "session_funnel_conversion",
    # new round-4 queries
    "medallion_gold_summary", "key_frequency_histogram",
    "out_of_order_profile", "table_diff_reconcile",
    "rolling_distinct_users_7d", "asof_forward_attribution",
    "minmax_normalize_lengths", "fk_integrity_profile",
    "token_budget_allocation", "percent_rank_cume_dist",
    "deterministic_mode", "string_agg_segments", "user_event_bitmask",
    "peak_concurrency_daily", "event_transition_matrix",
    "time_to_conversion_cohorts",
    "range_partition_planner", "zorder_layout_audit",
    "dup_cluster_size_histogram", "corpus_overlap_sources",
    "psi_value_drift", "mad_robust_outliers", "rfm_segmentation",
    "zipf_slope_by_lang", "transition_dwell_times",
    "daily_value_percentile_bands", "split_leakage_audit",
    "eval_set_fixed_k", "decontaminate_bloom", "scd2_point_in_time_join",
    "sink_partitioned_roundtrip", "sink_append_roundtrip",
    "interval_coalesce_user_activity", "asof_nearest_event",
    "skyline_cheapest_latest_per_nation", "sessionized_bounce_rate",
    "inventory_running_balance", "dedup_graph_degree_census",
    "embedding_centroid_drift",
    # oracle/plan changed THIS round → re-check (ahead of the rows-only
    # block: a changed-plan green is worth more than a rows-only row)
    "incremental_daily_refresh", "medallion_pipeline_summary",
    # first-ever rows-only driver row (VERDICT r3 item 2)
    "multimodal_features",
    # round-4b flagship additions: never-checked ORACLE-bearing ops
    # outrank first-ever rows-only rows for sketches whose checked
    # twins are already green (those six fall back to _NO_ORACLE_LAST)
    "cms_heavy_hitters_checked", "pca_power_iteration_checked",
    "pagerank_trade_graph", "hll_set_algebra_checked",
    "bm25_doc_retrieval", "unigram_lm_perplexity",
    # r3-changed oracles, one more green under unchanged definitions
    "streaming_session_window", "sessionization",
    "tpch_q11_important_stock",
    # stale-green rotation (r1 vintage, oldest data-generation first)
    "flagship_daily_event_trends", "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority", "tpch_q6_forecast_revenue",
    "rank_nations_by_balance", "lag_dod_wow", "user_value_diff",
    "rolling_user_avg", "topk_customers_per_nation",
    "trend_classification", "range_window_trailing_7d",
    "dq_single_pass", "upsert_merge_by_key", "daily_summary",
    "date_functions", "two_level_agg", "conditional_counts",
    "argmax_top_segment", "group_quantiles", "rollup_revenue",
    "json_extraction", "cdc_apply_changes", "star_join_revenue",
    "broadcast_dim_join", "anti_join_orphans",
    "semi_join_active_customers", "monthly_kpis", "weekly_aggregates",
    "user_engagement", "text_stats", "token_counts", "lang_id",
    "doc_quality_scores", "dedup_exact_content",
    "streaming_tumbling_counts",
]


def _rank(name: str) -> tuple[int, int]:
    if name in _FRONT:
        return (0, _FRONT.index(name))
    if name in _NO_ORACLE_LAST:
        return (3, _NO_ORACLE_LAST.index(name))
    return (2, 0) if name in _DRIVER_GREEN else (1, 0)


def _reorder_for_driver() -> None:
    order = sorted(QUERIES, key=_rank)  # stable within each rank class
    q = {n: QUERIES[n] for n in order}
    o = {n: ORACLES[n] for n in order if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


_reorder_for_driver()
