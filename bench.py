#!/usr/bin/env python
"""Benchmark: run the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the noop sink (forces the whole plan —
scan, shuffles, windows — without collect/driver materialization).
Quadratic-by-design verification queries (blocked Jaccard, MinHash
verify, cluster components) are excluded: their cost is a function of
planted-duplicate density, not engine throughput; the scale-path
variants (LSH, SimHash) are in.

Round-over-round comparison: the headline set only GROWS (superset
rule), so the total rises as coverage widens — compare per-query
timings for regressions, and note the six streaming queries carry a
~1.5-6 s fixed micro-batch/state cost each that is overhead of the
streaming harness, not plan throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Superset of the round-1 headline keys (keep it that way: the per-round
# BENCH_r{N}.json files are only regression-comparable if keys persist).
HEADLINE = [
    "flagship_daily_event_trends",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_check",
    "tpch_q6_forecast_revenue",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q12_priority_classes",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_count",
    "tpch_q20_excess_suppliers",
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_session_window",
    "streaming_stateful_totals",
    "streaming_stream_join",
    "streaming_dedup_delivery",
    "group_quantiles_approx",
    "similarity_knn_join",
    "similarity_ann_ivf",
    "dedup_simhash",
    "doc_repetition",
    "doc_contamination",
    "doc_chunking",
    "doc_unigram_stats",
    "decontaminate_exact",
    "curation_end_to_end",
    "embedding_kmeans",
    "star_join_revenue",
    "asof_join_last_signup",
    "broadcast_dim_join",
    "daily_summary",
    "rollup_revenue",
    "dq_single_pass",
    "two_level_agg",
    "group_quantiles",
    "lag_dod_wow",
    "topk_customers_per_nation",
    "sessionization",
    "user_engagement",
    "dedup_exact_content",
    "dedup_keep_first",
    "text_stats",
    "lang_id",
    "token_counts",
    "similarity_cosine_topk",
    "similarity_ann_lsh",
    "upsert_merge_by_key",
    "heavy_hitters",
    "pii_redaction",
    "per_source_cap",
    "train_test_split",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_volume_customers",
    "cdc_apply_changes",
    "scd2_history",
    "range_window_trailing_7d",
    "embedding_centroids",
    "sequence_packing",
    "mixture_weighted_sample",
    # round 3 additions: the scale-safe curation variants + the
    # medallion bronze→silver surface (checked twins are correctness
    # scaffolding, not throughput paths — their production variants
    # are already above)
    "quantile_length_trim_approx",
    "sequence_packing_sharded",
    "medallion_pipeline_summary",
    "streaming_upsert_latest",
    # round 4 additions: the product-analytics set + the gold/latin-1
    # medallion leg
    "salted_event_counts",
    "revenue_pareto_by_nation",
    "anomaly_days_zscore",
    "event_type_cooccurrence",
    "session_funnel_conversion",
    "funnel_conversion",
    "retention_cohorts",
    "gap_fill_interpolate",
    "medallion_gold_summary",
    "key_frequency_histogram",
    "out_of_order_profile",
    "table_diff_reconcile",
    "rolling_distinct_users_7d",
    "asof_forward_attribution",
    "minmax_normalize_lengths",
    "fk_integrity_profile",
    "token_budget_allocation",
    "percent_rank_cume_dist",
    "deterministic_mode",
    "string_agg_segments",
    "user_event_bitmask",
    "peak_concurrency_daily",
    "event_transition_matrix",
    "time_to_conversion_cohorts",
    "range_partition_planner",
    "zorder_layout_audit",
    "dup_cluster_size_histogram",
    "corpus_overlap_sources",
    "psi_value_drift",
    "mad_robust_outliers",
    "rfm_segmentation",
    "zipf_slope_by_lang",
    "transition_dwell_times",
    "daily_value_percentile_bands",
    "split_leakage_audit",
    "eval_set_fixed_k",
    "decontaminate_bloom",
    "scd2_point_in_time_join",
    # sink round-trips are correctness-gated (CORRECTNESS, plan tests)
    # but stay OUT of the timing suite: write-path entries are the most
    # I/O-noise-prone and the envelope needs margin, not breadth
    "asof_nearest_event",
    "sessionized_bounce_rate",
    "inventory_running_balance",
    "embedding_centroid_drift",
    "time_weighted_avg_value",
    "chi_square_type_dow",
    "theil_sen_trend",
    "autocorrelation_daily",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from chai_data_pipeline_spark import plans
    from chai_data_pipeline_spark.session import get_spark

    spark = get_spark("chai-bench")
    # Warm-up: run every headline query once at the smallest SF before
    # timing. First execution of each plan pays one-time costs that are
    # per-PROCESS, not per-query — JIT/whole-stage-codegen compilation,
    # Arrow/pandas-UDF worker startup, shuffle service init. On a real
    # cluster those amortize over long-running executors; warming at
    # sf0.001 (~1s total) makes the sf0.1 numbers measure steady-state
    # plan throughput instead of JVM warm-up.
    spark.range(1).count()
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
        print(
            f"warning: {warm_dir!r} used for warm-up (sf0.001 missing) — "
            "each headline query runs twice at full scale",
            file=sys.stderr,
        )
    from chai_data_pipeline_spark import plans as _p

    for name in HEADLINE:
        _p.QUERIES[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    # Two timed passes, report the per-query MINIMUM: single-shot
    # timings on a shared local JVM carry ±5-8 s of GC/scheduler noise
    # across the suite; the min is the standard noise-robust statistic
    # for steady-state plan cost (it cannot hide data-dependent work —
    # both passes execute the full plan at the target SF).
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            fn = plans.QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
