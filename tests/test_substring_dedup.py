"""Conservation proof for substring_dedup_apply: tokens_kept is
re-derived INDEPENDENTLY by materializing every surviving token
position (explode 1..n_tok per doc, anti-mark positions covered by
any masked span) — so the gaps-and-islands coalescing arithmetic in
the query (sum of island widths == size of the span union) is proven
against a per-position ground truth, not against itself."""

from __future__ import annotations


def _independent_kept(duck, sf_dir) -> dict:
    """lang -> (tokens_total, tokens_dropped) via per-position marks."""
    from chai_data_pipeline_spark.operators.text import (
        word_ngrams_sql_duckdb,
    )
    from chai_data_pipeline_spark.plans.dedup import _SUBSTR_K

    grams = word_ngrams_sql_duckdb("text", _SUBSTR_K)
    rows = duck.execute(
        f"""
WITH base AS (
    SELECT lang, doc_id, {grams} AS gl,
           CASE WHEN text IS NULL THEN 0
                ELSE len(string_split_regex(TRIM(text), '\\s+')) END
               AS n_tok
    FROM documents
),
occ AS (
    SELECT doc_id,
           unnest(range(1, len(gl) + 1)) AS pos,
           unnest(gl) AS gram
    FROM base
),
keyed AS (
    SELECT gram, doc_id, pos, doc_id * 1000000000 + pos AS k FROM occ
),
gmin AS (SELECT gram, MIN(k) AS mk FROM keyed GROUP BY 1),
spans AS (
    SELECT o.doc_id, o.pos AS s, o.pos + {_SUBSTR_K - 1} AS e
    FROM keyed o JOIN gmin g ON o.gram = g.gram
    WHERE o.k > g.mk
),
tokpos AS (
    SELECT lang, doc_id, unnest(range(1, n_tok + 1)) AS p FROM base
),
marked AS (
    SELECT t.lang, t.doc_id, t.p,
           EXISTS (
               SELECT 1 FROM spans s
               WHERE s.doc_id = t.doc_id AND t.p BETWEEN s.s AND s.e
           ) AS covered
    FROM tokpos t
)
SELECT lang, COUNT(*) AS total,
       COUNT(*) FILTER (covered) AS dropped
FROM marked GROUP BY 1
"""
    ).fetchall()
    return {r[0]: (r[1], r[2]) for r in rows}


def test_conservation_against_per_position_ground_truth(
    spark, duck, sf_dir
):
    from chai_data_pipeline_spark import plans

    got = {
        r["lang"]: r
        for r in (
            plans.QUERIES["substring_dedup_apply"](spark, sf_dir)
            .collect()
        )
    }
    truth = _independent_kept(duck, sf_dir)
    assert set(got) == set(truth)
    # the corpus must actually exercise the operator (vacuous-parity
    # guard): at least one language must have dropped token mass
    assert any(d for _, d in truth.values()), (
        "no duplicated 8-token windows in the corpus — the apply "
        "semantics are untested; re-audit after a data regeneration"
    )
    for lang, (total, dropped) in truth.items():
        row = got[lang]
        assert row["tokens_total"] == total, lang
        assert row["tokens_dropped"] == dropped, lang
        assert row["tokens_kept"] == total - dropped, lang
        # full accounting: kept + dropped == total, kept >= 0
        assert row["tokens_kept"] + row["tokens_dropped"] == total
        assert 0 <= row["tokens_dropped"] <= total


def test_decontaminate_span_mask_conservation(spark, duck, sf_dir):
    """Same per-position ground truth for the benchmark-span masking
    apply: a corpus token is dropped iff covered by some 8-gram that
    appears in the src0 benchmark."""
    from chai_data_pipeline_spark import plans
    from chai_data_pipeline_spark.operators.text import (
        word_ngrams_sql_duckdb,
    )
    from chai_data_pipeline_spark.plans.dedup import _SUBSTR_K

    grams = word_ngrams_sql_duckdb("text", _SUBSTR_K)
    truth = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            f"""
WITH base AS (
    SELECT source, doc_id, {grams} AS gl,
           CASE WHEN text IS NULL THEN 0
                ELSE len(string_split_regex(TRIM(text), '\\s+')) END
               AS n_tok
    FROM documents
),
occ AS (
    SELECT doc_id, unnest(range(1, len(gl) + 1)) AS pos,
           unnest(gl) AS gram
    FROM base
),
bench AS (
    SELECT DISTINCT o.gram FROM occ o
    JOIN base b ON o.doc_id = b.doc_id WHERE b.source = 'src0'
),
spans AS (
    SELECT o.doc_id, o.pos AS s, o.pos + {_SUBSTR_K - 1} AS e
    FROM occ o JOIN base d ON o.doc_id = d.doc_id
    JOIN bench bn ON o.gram = bn.gram
    WHERE d.source <> 'src0'
),
tokpos AS (
    SELECT source, doc_id, unnest(range(1, n_tok + 1)) AS p
    FROM base WHERE source <> 'src0'
),
marked AS (
    SELECT t.source, t.doc_id, t.p,
           EXISTS (
               SELECT 1 FROM spans s
               WHERE s.doc_id = t.doc_id AND t.p BETWEEN s.s AND s.e
           ) AS covered
    FROM tokpos t
)
SELECT source, COUNT(*), COUNT(*) FILTER (covered)
FROM marked GROUP BY 1
"""
        ).fetchall()
    }
    got = {
        r["source"]: r
        for r in plans.QUERIES["decontaminate_span_mask"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(truth)
    assert any(d for _, d in truth.values()), (
        "no benchmark-overlapping 8-token windows — decontamination "
        "semantics untested; re-audit after a data regeneration"
    )
    for source, (total, dropped) in truth.items():
        row = got[source]
        assert row["tokens_total"] == total, source
        assert row["tokens_dropped"] == dropped, source
        assert row["tokens_kept"] == total - dropped, source


def test_coalesce_span_token_mass_edge_cases(spark):
    """Unit edge cases for the shared gaps-and-islands operator:
    overlap, containment, adjacency (NOT merged — separate islands
    still sum correctly), duplicates-free multi-doc isolation."""
    from chai_data_pipeline_spark.operators.dedup import (
        coalesce_span_token_mass,
    )

    spans = spark.createDataFrame(
        [
            # doc 1: [1,5] + [3,8] overlap -> union [1,8] = 8 tokens
            (1, 1, 5),
            (1, 3, 8),
            # doc 1: [9,12] adjacent to [1,8] -> own island, 4 tokens
            (1, 9, 12),
            # doc 2: [2,10] contains [4,6] -> union [2,10] = 9 tokens
            (2, 2, 10),
            (2, 4, 6),
            # doc 3: single span
            (3, 7, 14),
        ],
        "doc_id long, s long, e long",
    )
    got = {
        r["doc_id"]: (r["dropped"], r["n_spans"])
        for r in coalesce_span_token_mass(spans).collect()
    }
    assert got == {1: (12, 2), 2: (9, 1), 3: (8, 1)}
