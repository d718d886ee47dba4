"""Semantic invariants for the round-8 operator wave.

The DuckDB parity suite proves Spark == oracle; these pin properties
the hash comparison cannot express (monotonicity, conservation,
superset guarantees) so a future edit that breaks the MATH on both
engines simultaneously still fails.
"""

from __future__ import annotations

import pytest

from chai_data_pipeline_spark import plans


def _rows(spark, sf_dir, name):
    return plans.QUERIES[name](spark, sf_dir).collect()


def test_padding_audit_orderings(spark, sf_dir):
    rows = {r["strategy"]: r for r in _rows(spark, sf_dir, "padding_efficiency_audit")}
    assert set(rows) == {"fixed_512", "pow2_bucket", "step_64"}
    totals = {r["total_tokens"] for r in rows.values()}
    assert len(totals) == 1  # same corpus mass on every row
    for r in rows.values():
        assert r["padded_tokens"] >= 0
        assert 0.0 <= r["pad_ratio"] < 1.0
    # every pow2 bucket <= 512, so pad-to-512 wastes at least as much
    assert rows["pow2_bucket"]["padded_tokens"] <= rows["fixed_512"]["padded_tokens"]
    # every 64-step bucket <= its pow2 bucket... does NOT hold in
    # general (lt=10 -> pow2 16 vs step 64); only the fixed bound is an
    # invariant, so that's all we pin.


def test_semdedup_conservation(spark, sf_dir):
    rows = _rows(spark, sf_dir, "semdedup_centroid_cosine")
    assert rows, "assignment must produce clusters"
    for r in rows:
        assert r["n_dropped"] + r["n_kept"] == r["n_members"]
        assert r["n_dropped"] >= 0 and r["n_kept"] >= 1
    # every vector lands in exactly one cluster
    emb_count = 500  # sf0.001 embeddings rows (TESTDATA.md)
    assert sum(r["n_members"] for r in rows) == emb_count
    # the drop leg must actually fire (tau is data-calibrated; a
    # threshold above the data's cosine ceiling is vacuous)
    assert sum(r["n_dropped"] for r in rows) > 0


def test_ivf_probe_ladder_monotone(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "ivf_probe_recall_tradeoff"),
        key=lambda r: r["n_probe"],
    )
    assert [r["n_probe"] for r in rows] == [1, 2, 4]
    cands = [r["n_candidates"] for r in rows]
    hits = [r["hits_at_10"] for r in rows]
    assert cands == sorted(cands)  # more probes never shrink the set
    assert hits == sorted(hits)  # recall non-decreasing in n_probe
    for r in rows:
        assert 0 <= r["hits_at_10"] <= 10
        assert r["recall_at_10"] == r["hits_at_10"] / 10.0


def test_cms_join_estimate_upper_bounds_exact(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "join_cardinality_cms_estimate")
    assert r["exact_pairs"] > 0
    # CMS counters only ever over-count: the inner product is a
    # guaranteed upper bound on the true join cardinality
    assert r["cms_estimate"] >= r["exact_pairs"]
    assert r["overestimate"] == r["cms_estimate"] - r["exact_pairs"]


def test_holt_backtest_sane(spark, sf_dir):
    rows = _rows(spark, sf_dir, "holt_smoothing_backtest")
    assert rows
    for r in rows:
        assert r["n_days_scored"] > 0
        assert r["holt_mae"] >= 0.0
        assert r["naive_mae"] >= 0.0
        if r["mae_improvement"] is not None:
            # improvement = 1 - holt/naive, so it can't exceed 1
            assert r["mae_improvement"] <= 1.0


def test_epoch_plan_cap_consistency(spark, sf_dir):
    rows = _rows(spark, sf_dir, "epoch_repetition_plan")
    assert rows
    for r in rows:
        assert r["tokens"] > 0  # zero-token sources are filtered
        assert r["effective_epochs"] <= r["epochs"] + 1e-9
        assert r["deficit_tokens"] >= 0
        assert r["over_repetition_cap"] == (r["deficit_tokens"] > 0)
        if r["over_repetition_cap"]:
            assert r["effective_epochs"] == pytest.approx(4.0, abs=1e-6)


def test_file_skipping_superset_property(spark, sf_dir):
    rows = _rows(spark, sf_dir, "file_skipping_effectiveness")
    assert len(rows) == 8  # 2 layouts x 4 predicates
    for r in rows:
        assert 0 <= r["files_read"] <= r["files_total"]
        # zone-map pruning is conservative: the files kept must contain
        # every matching row
        assert r["rows_read"] >= r["rows_matching"]
        assert 0.0 <= r["skip_ratio"] <= 1.0
    # monthly time-partitioning must skip at least as well as the
    # ingest key-range layout for every date predicate
    by = {(r["layout"], r["pred"]): r for r in rows}
    for _, pred in [k for k in by if k[0] == "monthly"]:
        assert (
            by[("monthly", pred)]["skip_ratio"]
            >= by[("keyrange", pred)]["skip_ratio"]
        )


def test_perplexity_band_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "perplexity_band_prune")
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0 <= r["kept_words"] <= r["total_words"]
        # the band is the middle half: kept count is within one of n/2
        assert abs(r["n_kept"] - r["n_docs"] / 2) <= 1


def test_corpus_datasheet_metrics(spark, sf_dir):
    rows = {r["metric"]: r["value"] for r in _rows(spark, sf_dir, "corpus_datasheet")}
    assert set(rows) == {
        "n_docs", "n_sources", "n_langs", "total_tokens", "total_chars",
        "n_empty_docs", "n_dup_docs", "dup_doc_rate", "mean_doc_tokens",
    }
    assert rows["n_docs"] == 500  # sf0.001 documents rows (TESTDATA.md)
    assert rows["n_dup_docs"] >= 0
    assert 0.0 <= rows["dup_doc_rate"] < 1.0
    assert rows["mean_doc_tokens"] == pytest.approx(
        rows["total_tokens"] / rows["n_docs"], abs=1e-3
    )


def test_shapley_efficiency(spark, sf_dir):
    """Shapley values must sum to v(grand coalition) = conversions of
    users who touched at least one channel... which with the monotone
    closure is ALL converting users (efficiency axiom)."""
    import pyspark.sql.functions as F

    rows = _rows(spark, sf_dir, "shapley_channel_attribution")
    assert {r["channel"] for r in rows} == {"signup", "click", "view", "error"}
    total_shap = sum(r["shapley_conversions"] for r in rows)
    from chai_data_pipeline_spark.session import load_tables

    events = load_tables(spark, sf_dir, "events")["events"]
    conv_users = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .agg(F.sum("conv").alias("n"))
        .collect()[0]["n"]
    )
    assert total_shap == pytest.approx(conv_users, abs=1e-3)


def test_mix_rate_decomposition_identity(spark, sf_dir):
    """Oaxaca-Kitagawa identity: sum(mix) + sum(rate) == delta of the
    overall mean between the two periods (up to the x1e6 rounding of
    the published contributions)."""
    import pyspark.sql.functions as F

    from chai_data_pipeline_spark.session import load_tables

    rows = _rows(spark, sf_dir, "mix_rate_decomposition")
    assert rows
    total = sum(r["mix_contribution"] + r["rate_contribution"] for r in rows)

    events = load_tables(spark, sf_dir, "events")["events"]
    base = events.filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1
        ).otherwise(2).alias("period"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    means = {
        r["period"]: r["m"]
        for r in base.groupBy("period")
        .agg((F.sum("cents") / F.count("*") / 100.0).alias("m"))
        .collect()
    }
    delta = means[2] - means[1]
    assert total == pytest.approx(delta, abs=1e-4)


def test_price_index_fisher_bounds(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "price_index_fisher")
    assert r["n_common_parts"] > 0
    lo, hi = sorted([r["laspeyres"], r["paasche"]])
    # Fisher is the geometric mean: always between L and P
    assert lo - 1e-6 <= r["fisher"] <= hi + 1e-6
    for v in (r["laspeyres"], r["paasche"], r["fisher"]):
        assert v > 0


def test_formerly_vacuous_queries_nonempty(spark, sf_dir):
    """Round-8 empty-result audit: these three were hash-green on
    empty==empty after a testdata regeneration. Re-pinned to the data;
    pin that they stay non-empty so the vacuous state can't return."""
    for name in (
        "interrupted_time_series",
        "dedup_embedding_cosine",
        "golden_record_merge",
    ):
        assert plans.QUERIES[name](spark, sf_dir).count() > 0, name


def test_repinned_queries_live_legs(spark, sf_dir):
    """Second audit wave: every formerly-dead leg must stay live (the
    degenerate-column audit found these all-zero/all-NULL after the
    corpus regeneration; each was re-pinned to the data)."""
    r = _rows(spark, sf_dir, "cuped_ab_analysis")
    assert r and all(row["mean_raw"] != 0 for row in r)
    r = _rows(spark, sf_dir, "difference_in_differences")
    assert r and all(row["mean_post"] != 0 for row in r)
    (row,) = _rows(spark, sf_dir, "capture_recapture_users")
    assert row["day2_users"] > 0 and row["recaptured"] > 0
    r = _rows(spark, sf_dir, "multiset_except_intersect")
    assert any(row["set_op"] == "intersect_all" for row in r)
    r = _rows(spark, sf_dir, "dup_cluster_size_histogram")
    assert any(row["n_redundant"] > 0 for row in r)
    r = _rows(spark, sf_dir, "dedup_survivor_bias_audit")
    assert any(row["n_dropped"] > 0 for row in r)
    r = _rows(spark, sf_dir, "quality_dup_calibration")
    assert any(row["n_duplicated"] > 0 for row in r)
    r = _rows(spark, sf_dir, "classifier_reliability_bins")
    assert any(row["n_dups"] > 0 for row in r)
    r = _rows(spark, sf_dir, "classifier_auc_dup_separation")
    assert all(row["auc"] is not None for row in r)
    r = _rows(spark, sf_dir, "doc_unigram_stats")
    assert any(row["rare_word_ratio"] > 0 for row in r)
    r = _rows(spark, sf_dir, "campaign_overlap_exposure")
    assert {row["campaign"] for row in r} == {"launch", "retarget", "winback"}
    r = _rows(spark, sf_dir, "schema_evolution_union")
    assert any(row["total_value_new_era"] is not None for row in r)
    r = _rows(spark, sf_dir, "date_range_violations")
    assert all(row["n_violations"] > 0 for row in r)


def test_attribution_comparison_conservation(spark, sf_dir):
    """Credit conservation: first-touch and last-touch totals both
    equal the number of journeys; linear and position credits sum to
    (approximately, up to per-touch floor loss) the same total."""
    rows = _rows(spark, sf_dir, "attribution_model_comparison")
    assert rows
    n_first = sum(r["first_touch_conversions"] for r in rows)
    n_last = sum(r["last_touch_conversions"] for r in rows)
    assert n_first == n_last and n_first > 0
    lin = sum(r["linear_credit"] for r in rows)
    pos = sum(r["position_credit"] for r in rows)
    # floor-division loses < 1e-6 * touches per journey
    assert n_first - 1 < lin <= n_first + 1e-6
    assert n_first - 1 < pos <= n_first + 1e-6


def test_knn_label_accuracy_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "knn_label_accuracy")
    assert sum(r["n_queries"] for r in rows) == 200  # the query cap
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_queries"]
        assert 0.0 <= r["accuracy"] <= 1.0


def test_rtbf_cascade_consistency(spark, sf_dir):
    rows = {r["table_name"]: r for r in _rows(spark, sf_dir, "rtbf_delete_impact")}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    assert rows["customer"]["rows_deleted"] > 0
    # a deleted customer cascades: orders of deleted customers exist,
    # and every deleted order drags its lineitems
    assert rows["orders"]["rows_deleted"] > 0
    assert rows["lineitem"]["rows_deleted"] >= rows["orders"]["rows_deleted"]
    for r in rows.values():
        assert 0 <= r["rows_deleted"] <= r["rows_total"]


def test_minhash_estimator_audit_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "minhash_estimate_error_audit")
    assert rows
    for r in rows:
        # |bias| can never exceed the mean absolute error
        assert abs(r["mean_bias"]) <= r["mean_abs_error"] + 1e-9
        assert 0.0 <= r["mean_estimate"] <= 1.0 + 1e-9
        assert 0.0 <= r["mean_exact_j"] <= 1.0 + 1e-9


def test_target_encoding_optimism_nonnegative_overall(spark, sf_dir):
    """Out-of-fold MSE should exceed naive MSE in aggregate (each row's
    own label inflates the naive encoding's fit)."""
    rows = _rows(spark, sf_dir, "target_encoding_oof_audit")
    assert rows
    total_gap = sum(r["optimism_gap"] * r["n_users"] for r in rows)
    assert total_gap >= 0


def test_sprt_decision_consistency(spark, sf_dir):
    rows = _rows(spark, sf_dir, "sprt_sequential_test")
    assert {r["arm"] for r in rows} == {"A", "B"}
    for r in rows:
        if r["decision"] == "continue":
            assert r["decision_day"] is None
        else:
            assert r["decision_day"] is not None
        assert 0 <= r["conversions_total"] <= r["users_total"]
