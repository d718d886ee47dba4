"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting is the deterministic fallback for the cases
AQE can't fix — e.g. a single hot key on the BUILD side of a sort-merge
join, or a skewed high-cardinality groupBy where one reducer would
receive a hot key's entire partition.

``salted_join`` replicates the small side R times and splits the big
side's hot keys across R salt buckets: the join stays an equi-join on
(key, salt), so each hot key fans across R reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted
    across ``salts`` buckets and the small side replicated per salt.

    Use when ``on`` has hot keys and ``small`` is too large to
    broadcast outright. Output columns = natural join output.

    Only join types that never emit unmatched SMALL-side rows are
    allowed: the small side is replicated once per salt, so a right or
    full outer join would emit each unmatched small-side row ``salts``
    times (duplicated null-extended rows). Salt the other side instead.
    """
    allowed = {"inner", "left", "left_outer", "leftsemi", "left_semi"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only; got {how!r} — "
            "the replicated small side would duplicate unmatched rows"
        )
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    )
    small_replicated = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {salts - 1})"))
    )
    out = big_salted.join(small_replicated, [on, "__salt"], how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame, key: str, salts: int = 16
) -> DataFrame:
    """Two-stage count per key: partial count on (key, salt), then final
    combine on key — the hot key's rows spread across ``salts`` reducers
    in stage 1. (Spark's hash agg already does map-side partials; this
    is for the pathological case where even the merge of one key's
    partials overwhelms a reducer — mostly documentation-by-code.)"""
    stage1 = (
        df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts)),
        )
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return stage1.groupBy(key).agg(F.sum("__partial").alias("n"))
