"""Semantic invariants for the round-10 session-2 operator wave.

Parity proves Spark == oracle; these pin conservation, bounds, and
live-leg properties a hash match cannot express, plus a direct unit
check of the Hilbert transform against the reference automaton.
"""

from __future__ import annotations

from chai_data_pipeline_spark import plans


def _rows(spark, sf_dir, name):
    return plans.QUERIES[name](spark, sf_dir).collect()


def test_blocklist_conservation_and_live(spark, sf_dir):
    rows = _rows(spark, sf_dir, "blocklist_filter_apply")
    assert rows
    for r in rows:
        assert r["tokens_kept"] + r["tokens_blocked"] == r["tokens_total"]
        assert 0 <= r["n_blocked"] <= r["n_docs"]
        # a blocked doc has >= 10% blocklisted mass by construction
        if r["n_blocked"]:
            assert r["blocked_term_hits"] * 10 >= r["tokens_blocked"]
    # live filter: blocks somewhere AND keeps somewhere
    assert any(r["n_blocked"] > 0 for r in rows)
    assert any(r["n_blocked"] < r["n_docs"] for r in rows)


def test_kmv_bounds_and_live(spark, sf_dir):
    rows = {r["metric"]: r for r in _rows(spark, sf_dir, "approx_distinct_kmv_checked")}
    assert set(rows) == {"kmv_a", "kmv_b", "kmv_union_merged", "kmv_intersection"}
    a, b = rows["kmv_a"], rows["kmv_b"]
    u, i = rows["kmv_union_merged"], rows["kmv_intersection"]
    # exact set algebra: |A∪B| >= max, |A∩B| <= min, inclusion-exclusion
    assert u["exact_count"] >= max(a["exact_count"], b["exact_count"])
    assert i["exact_count"] <= min(a["exact_count"], b["exact_count"])
    assert u["exact_count"] + i["exact_count"] == a["exact_count"] + b["exact_count"]
    # estimator sanity: within 30% of exact on every leg that has data
    for r in rows.values():
        if r["exact_count"] > 0:
            assert r["estimate"] > 0
            assert r["err_ppm"] < 300_000


def test_retrieval_eval_bounds_and_live(spark, sf_dir):
    rows = _rows(spark, sf_dir, "retrieval_eval_mrr_pk")
    assert rows
    for r in rows:
        assert 0.0 <= r["p_at_k"] <= 1.0
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert 0.0 <= r["mrr"] <= 1.0
        assert r["hits_at_k"] <= min(10, r["n_relevant"]) or r["n_relevant"] == 0
    assert any(r["hits_at_k"] > 0 for r in rows)
    assert any(r["mrr"] > 0 for r in rows)


def test_changepoint_split_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "changepoint_binary_segmentation")
    assert len(rows) == 1
    r = rows[0]
    assert r["n_left"] >= 5 and r["n_right"] >= 5
    assert r["sse_split"] <= r["sse_total"]
    assert 0.0 <= r["var_reduction"] < 1.0


def test_closeness_bounds_and_varied(spark, sf_dir):
    rows = _rows(spark, sf_dir, "closeness_centrality_trade")
    assert rows
    for r in rows:
        assert 0.0 <= r["closeness"] <= 1.0
        assert r["harmonic"] <= r["n_reachable"]
        assert r["sum_dist"] >= r["n_reachable"]
    # the backbone cut must leave a NON-complete graph (the complete
    # trade graph made closeness a constant 1.0 — vacuous-output class)
    assert len({r["closeness"] for r in rows}) > 1
    assert any(r["sum_dist"] > r["n_reachable"] for r in rows)


def test_hilbert_beats_zorder_and_linear_degenerate(spark, sf_dir):
    rows = {r["layout"]: r for r in _rows(spark, sf_dir, "hilbert_layout_audit")}
    assert set(rows) == {"hilbert", "zorder", "linear_x"}
    h, z, lx = rows["hilbert"], rows["zorder"], rows["linear_x"]
    # every layout files the same rows
    assert h["n_rows"] == z["n_rows"] == lx["n_rows"]
    # the headline claim: unit-step locality beats Morton seams
    assert h["total_span_area"] < z["total_span_area"]
    # single-column clustering cannot prune the second dimension
    assert lx["avg_y_span"] > 4 * h["avg_y_span"]


def test_hilbert_transform_matches_reference_automaton(spark):
    # direct unit check of the per-bit rotation fold on a random sample
    import random

    from pyspark.sql import functions as F

    from chai_data_pipeline_spark.plans.layout import _hilbert_spark

    def ref_xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    rng = random.Random(7)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(64)]
    df = spark.createDataFrame(pts, ["x", "y"]).select(
        "x", "y", _hilbert_spark("x", "y").alias("hd")
    )
    for x, y, hd in df.collect():
        assert hd == ref_xy2d(256, x, y), (x, y, hd)


def test_bayes_posterior_matches_lgamma_reference(spark, sf_dir):
    import math

    rows = _rows(spark, sf_dir, "bayes_beta_binomial_ab")
    assert len(rows) == 1
    r = rows[0]
    aa, ba = r["conversions_a"] + 1, r["n_a"] - r["conversions_a"] + 1
    ab, bb = r["conversions_b"] + 1, r["n_b"] - r["conversions_b"] + 1

    def lbeta(a, b):
        return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)

    p = sum(
        math.exp(
            lbeta(aa + i, ba + bb)
            - math.log(bb + i)
            - lbeta(1 + i, bb)
            - lbeta(aa, ba)
        )
        for i in range(ab)
    )
    assert abs(r["p_b_beats_a"] - p) < 5e-6
    assert 0.0 < r["p_b_beats_a"] < 1.0
    assert r["conversions_a"] > 0 and r["conversions_b"] > 0  # live legs


def test_curriculum_shards_balanced(spark, sf_dir):
    rows = _rows(spark, sf_dir, "curriculum_shard_interleave")
    assert len(rows) == 8
    docs = [r["n_docs"] for r in rows]
    toks = [r["tokens_total"] for r in rows]
    # rotated round-robin over (lang x decile) strata: each stratum
    # contributes a +/-1 spread, so the bound is the stratum count
    assert max(docs) - min(docs) <= 20
    # every shard must carry the full curriculum mix
    assert all(r["n_deciles"] == 10 for r in rows)
    # token mass balanced within 35%
    assert max(toks) <= 1.35 * min(toks)


def test_dtw_bounds_and_live(spark, sf_dir):
    rows = _rows(spark, sf_dir, "dtw_event_type_daily")
    # 5 event types -> 10 unordered pairs
    assert len(rows) == 10
    for r in rows:
        # warping can only HELP vs the lockstep alignment
        assert 0 <= r["dtw_cost"] <= r["lockstep_cost"]
        assert 0 <= r["alignment_gain_ppm"] <= 1_000_000
        assert r["n_steps"] == 30
    # live: alignment actually buys something on at least one pair
    assert any(r["alignment_gain_ppm"] > 0 for r in rows)


def test_kn_perplexity_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "kn_bigram_perplexity")
    assert rows
    for r in rows:
        assert r["ppl_kn"] > 1.0
        assert 0 <= r["n_unseen_bigrams"] <= r["n_test_bigrams"]
    # near-uniform synthetic corpus: ppl should sit near vocab size (31)
    assert all(5 < r["ppl_kn"] < 40 for r in rows)


def test_sax_words_well_formed(spark, sf_dir):
    rows = _rows(spark, sf_dir, "sax_motif_census")
    assert rows
    for r in rows:
        assert len(r["sax_word"]) == 10
        assert set(r["sax_word"]) <= set("abcd")
        assert len(r["top_motif"]) == 3
        assert 1 <= r["top_motif_count"] <= 8
        assert 1 <= r["n_distinct_trigrams"] <= 8
    # z-normalization must actually spread symbols somewhere
    assert any(len(set(r["sax_word"])) >= 3 for r in rows)


def test_binary_quantization_signal(spark, sf_dir):
    rows = _rows(spark, sf_dir, "binary_quantization_hamming_audit")
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r["overlap_at_k"] <= 10
        assert 0 <= r["cos_top1_hamming"] <= 64
        assert 0.0 <= r["ham_mean_cos_topk"] <= 64.0
    # the 1-bit code must carry SOME cosine signal on average: cosine
    # top-10 neighbors are closer in Hamming than the corpus mean
    better = sum(
        1 for r in rows if r["ham_mean_cos_topk"] < r["ham_mean_all"]
    )
    assert better >= 6


def test_rerandomization_null_is_calibrated(spark, sf_dir):
    rows = _rows(spark, sf_dir, "rerandomization_test_arms")
    assert len(rows) == 1
    r = rows[0]
    assert r["n_a"] + r["n_b"] == r["n_users"]
    assert 0.0 < r["p_value"] <= 1.0
    # arms are hash splits of the SAME population: the null is true by
    # construction, so the test must NOT reject at alpha=0.01
    assert r["p_value"] > 0.01


def test_silhouette_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "embedding_silhouette_by_label")
    assert rows
    for r in rows:
        assert -1.0 <= r["avg_silhouette"] <= 1.0
        assert r["mean_a"] > 0 and r["mean_b"] > 0
    # synthetic labels are not geometric clusters: |s| should be small,
    # and the metric must not be a constant
    assert len({r["avg_silhouette"] for r in rows}) > 1


def test_unigram_js_bounds_and_live(spark, sf_dir):
    import math

    rows = _rows(spark, sf_dir, "unigram_js_by_source")
    assert rows
    for r in rows:
        assert 0.0 <= r["js_divergence"] <= math.log(2) + 1e-9
        assert r["top_word_lift"] >= 1.0 - 1e-9
    assert len({r["js_divergence"] for r in rows}) > 1


def test_gbm_stumps_monotone_fit(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "gradient_boosted_stumps"),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [1, 2, 3]
    total = rows[0]["n_left"] + rows[0]["n_right"]
    for r in rows:
        # every stump partitions the whole corpus
        assert r["n_left"] + r["n_right"] == total
        assert r["n_left"] > 0 and r["n_right"] > 0
    # squared-loss boosting with exact leaf means NEVER increases
    # training SSE: cumulative R² must be non-decreasing
    r2 = [r["r2_cumulative"] for r in rows]
    assert r2 == sorted(r2)
    assert r2[0] >= 0.0


def test_nelson_aalen_dominates_km(spark, sf_dir):
    na = {r["day"]: r for r in _rows(spark, sf_dir, "nelson_aalen_hazard")}
    km = {r["day"]: r for r in _rows(spark, sf_dir, "survival_curve_km")}
    assert na and set(na) == set(km)
    prev_h = 0.0
    for day in sorted(na):
        r = na[day]
        # hazard accumulates; variance is positive once deaths occur
        assert r["cum_hazard"] >= prev_h
        prev_h = r["cum_hazard"]
        assert r["hazard_var"] > 0
        # Fleming-Harrington exp(-H) never dips below Kaplan-Meier
        assert r["survival_na"] >= km[day]["survival"] - 1e-9


def test_shuffle_quality_separates_layouts(spark, sf_dir):
    rows = {r["layout"]: r for r in _rows(spark, sf_dir, "shuffle_quality_audit")}
    assert set(rows) == {"by_source", "by_doc_id", "hash_shuffle"}
    # clustering by source is the worst case
    assert rows["by_source"]["same_rate"] > 0.9
    # the hash shuffle must sit near the independence expectation
    hs = rows["hash_shuffle"]
    assert abs(hs["same_rate"] - hs["expected_rate"]) < 0.05


def test_james_stein_contraction(spark, sf_dir):
    rows = _rows(spark, sf_dir, "james_stein_source_means")
    assert rows
    gm_approx = sum(r["raw_mean"] * r["n_docs"] for r in rows) / sum(
        r["n_docs"] for r in rows
    )
    b = rows[0]["shrink_weight"]
    assert all(abs(r["shrink_weight"] - b) < 1e-9 for r in rows)
    assert 0.0 <= b <= 1.0
    for r in rows:
        # shrunk estimate lies between the raw mean and the grand mean
        lo, hi = sorted((r["raw_mean"], gm_approx))
        assert lo - 0.01 <= r["shrunk_mean"] <= hi + 0.01
    # the INPUT must be non-degenerate even when shrinkage is total
    assert len({r["raw_mean"] for r in rows}) > 1
