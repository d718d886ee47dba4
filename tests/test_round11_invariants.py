"""Round-11 invariants: the streaming near-dup guard."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(spark, sf_dir, name):
    from chai_data_pipeline_spark import plans

    return plans.QUERIES[name](spark, sf_dir).collect()


def test_neardup_guard_admits_deterministically(spark, sf_dir):
    rows = _rows(spark, sf_dir, "streaming_neardup_guard")
    admitted = {r.doc_id for r in rows}
    assert admitted, "guard admitted nothing"
    # re-run: state/output dirs are fresh per run; same admissions
    rows2 = _rows(spark, sf_dir, "streaming_neardup_guard")
    assert {r.doc_id for r in rows2} == admitted

    from chai_data_pipeline_spark.session import load_tables

    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("text").isNotNull()
    )
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    # the lowest-id doc has no lower-id collision partner by definition
    assert min(ids) in admitted
    assert admitted <= set(ids)
    # guard must be LIVE: the corpus plants near-duplicates (exact dups
    # are Hamming-0), so some doc must be rejected — an all-admitted
    # result means the collision leg silently died (vacuous-green class)
    assert len(admitted) < len(ids)


def test_neardup_guard_matches_batch_rule(spark, sf_dir):
    """The streaming run (2 micro-batches, committed state between)
    must equal the batching-independent one-shot rule computed in
    batch Spark — the cross-batch state handoff is exactly what this
    pins (the DuckDB parity suite re-proves the same thing
    cross-engine)."""
    from chai_data_pipeline_spark import plans
    from chai_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CHK_CHUNKS,
        _SIMHASH_CHK_HAM,
        _SIMHASH_SPARK,
    )
    from chai_data_pipeline_spark.session import load_tables

    streamed = {
        (r.doc_id, r.simhash)
        for r in plans.QUERIES["streaming_neardup_guard"](
            spark, sf_dir
        ).collect()
    }

    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("text").isNotNull()
    )
    sig = docs.select("doc_id", F.expr(_SIMHASH_SPARK).alias("simhash"))
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_SIMHASH_CHK_CHUNKS - 1}),"
                " c -> struct(c AS chunk_idx,"
                " shiftright(simhash, c * 8) & 255 AS chunk_val))"
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_idx", "ch.chunk_val")
    d = chunks.alias("d")
    e = chunks.alias("e")
    rejected = (
        d.join(
            e,
            (F.col("d.chunk_idx") == F.col("e.chunk_idx"))
            & (F.col("d.chunk_val") == F.col("e.chunk_val"))
            & (F.col("e.doc_id") < F.col("d.doc_id")),
        )
        .filter(
            F.expr("bit_count(d.simhash ^ e.simhash)")
            <= _SIMHASH_CHK_HAM
        )
        .select(F.col("d.doc_id").alias("doc_id"))
        .distinct()
    )
    expected = {
        (r.doc_id, r.simhash)
        for r in sig.join(rejected, "doc_id", "left_anti").collect()
    }
    assert streamed == expected
