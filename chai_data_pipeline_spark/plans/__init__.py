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

# Union of hash-green rows across CORRECTNESS_r01 + r02 (computed
# directly from the JSON files — 92 names).
_DRIVER_GREEN = {
    "anti_join_orphans", "argmax_top_segment",
    "audit_lineage_columns", "broadcast_dim_join",
    "cdc_apply_changes", "conditional_counts",
    "cross_join_scalar_stats", "daily_summary", "date_functions",
    "date_range_violations", "dedup_cluster_components",
    "dedup_embedding_cosine", "dedup_exact_content",
    "dedup_fuzzy_names", "dedup_keep_canonical", "dedup_keep_first",
    "dedup_minhash_lsh_checked", "dedup_ngram_jaccard",
    "doc_contamination", "doc_fingerprints", "doc_quality_scores",
    "doc_repetition", "doc_sentiment", "doc_unigram_stats",
    "dq_single_pass", "embedding_centroids", "except_inactive_users",
    "flagship_daily_event_trends", "freshness_union",
    "global_asof_summary", "group_quantiles", "json_extraction",
    "json_typed_parse", "lag_dod_wow", "lang_id",
    "latest_partition_summary", "monthly_kpis",
    "multimodal_decode_meta", "multimodal_metadata",
    "proj_filter_pushdown", "range_window_trailing_7d",
    "rank_nations_by_balance", "recency_filter",
    "regex_extract_groups", "rolling_user_avg", "rollup_revenue",
    "safe_arithmetic", "segment_nation_profile",
    "semi_join_active_customers", "sessionization",
    "similarity_ann_lsh_checked", "similarity_cosine_topk",
    "similarity_knn_join", "star_join_revenue",
    "streaming_dedup_delivery", "streaming_session_window",
    "streaming_sliding_counts", "streaming_stateful_totals",
    "streaming_stream_join", "streaming_tumbling_counts",
    "string_cleaning_suite", "text_stats", "token_counts",
    "topk_customers_per_nation", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q12_priority_classes",
    "tpch_q13_customer_distribution", "tpch_q14_promo_effect",
    "tpch_q15_top_supplier", "tpch_q16_parts_supplier_count",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers", "tpch_q19_discounted_revenue",
    "tpch_q1_pricing_summary", "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_supplier", "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_priority_check", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "trend_classification", "two_level_agg", "upsert_merge_by_key",
    "user_engagement", "user_value_diff", "weekly_aggregates",
}

# Permanently oracle-less (rows-only by nature: approx sketches,
# float32 features, iterative fp-dependent) — still worth ONE rows-only
# driver row each, but never ahead of an oracle-bearing unchecked query.
_NO_ORACLE_LAST = [
    "multimodal_features", "approx_distinct_users",
    "group_quantiles_approx", "dedup_minhash_lsh", "dedup_simhash",
    "similarity_ann_lsh", "similarity_ann_ivf", "embedding_kmeans",
]

# Round 3 front: the 31 never-checked oracle-bearing queries first
# (ID order groups related plans), then new _checked twins / variants
# added this round (registered but absent from both lists land in the
# middle rank automatically), then regression re-checks of the two
# round-1-fixed oracles + flagship fill spare cap slots.
_FRONT = [
    # never-checked, oracle-bearing (31)
    "asof_join_last_signup", "range_predicate_join",
    "pivot_status_counts", "unpivot_measures", "cube_revenue",
    "grouping_sets_priority", "running_totals", "window_navigation",
    "ntile_percentiles", "manual_variance", "manual_correlation",
    "trend_applyinpandas", "explode_word_counts", "intersect_users",
    "gap_fill_daily", "value_histogram", "trend_slope",
    "tfidf_top_terms", "scd2_history", "doc_chunking",
    "decontaminate_exact", "sample_hash_deterministic",
    "train_test_split", "per_source_cap", "pii_redaction",
    "heavy_hitters", "quantile_length_trim", "mixture_weighted_sample",
    "sequence_packing", "curation_end_to_end",
    "multimodal_frame_sample",
    # new this round, oracle-bearing (checked twins + scale variants)
    "dedup_simhash_checked", "similarity_ann_ivf_checked",
    "embedding_kmeans_checked", "quantile_length_trim_approx",
    "sequence_packing_sharded", "medallion_pipeline_summary",
    "similarity_ann_pq_checked", "streaming_upsert_latest",
    "incremental_daily_refresh", "segment_dedup_stats",
    "profile_orders", "funnel_conversion", "retention_cohorts",
    "gap_fill_interpolate",
    # never-checked, rows-only (first driver row still valuable)
    "multimodal_features", "approx_distinct_users",
    # regression re-checks: ONLY the three whose oracles changed this
    # round (session-gap '>' revert ×2, q11 decimal total). Queries
    # green in r1/r2 with unchanged oracles stay in the back-set —
    # re-checking them spends cap slots for no new signal.
    "streaming_session_window", "sessionization",
    "tpch_q11_important_stock",
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
