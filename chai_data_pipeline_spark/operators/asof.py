"""As-of join — Spark has no native one; this is the scalable
union+window implementation (the standard trick: interleave both sides
on the time axis, then carry the last right-side row forward).

vs the alternatives: a per-group ``pd.merge_asof`` via applyInPandas
ships both sides through Arrow (slow path); a windowed-bucket join
duplicates right rows per bucket. The union+window form is one shuffle
on the join key + one sort — the same cost as a sort-merge join, and it
never materializes candidate pairs.

Determinism: right-side ties on (key, ts) are pre-reduced with an
explicit tiebreak before the union, so exactly one right row can win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[right_ts] <= left[left_ts]`` within the same ``on`` key.

    ``value_cols`` are the right-side columns to carry. Right rows with
    equal (on, right_ts) are reduced to one via max(tiebreak) first.

    The carried columns are packed into ONE struct and carried with a
    single last(ignorenulls=True): the whole most-recent right ROW is
    attached atomically. Carrying each column independently would (a)
    skip a legitimate NULL in the most-recent row (attaching a stale
    older value for just that column) and (b) let values from different
    right rows mix across columns.
    """
    from pyspark.sql import types as T

    r = right
    if tiebreak:
        w_tb = Window.partitionBy(on, right_ts).orderBy(F.desc(tiebreak))
        r = (
            r.withColumn("__tb", F.row_number().over(w_tb))
            .filter(F.col("__tb") == 1)
            .drop("__tb")
        )

    left_cols = left.columns
    val_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left_cols).alias("__l"),
        F.lit(None).cast(val_type).alias("__v"),
    )
    r_tagged = r.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
    )
    # right rows sort BEFORE left rows at equal ts (asof is <=, so a
    # right row at exactly left_ts is eligible)
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__is_left",
        "__l",
        F.last("__v", ignorenulls=True).over(w).alias("__v"),
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__v.{c}").alias(c) for c in value_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right[right_ts] >= left[left_ts]`` within the same ``on`` key
    (pandas ``merge_asof(direction="forward")``) — the attribution
    join: "the next purchase after this click".

    Same union+window shape as :func:`asof_join`, time-reversed: order
    DESC and carry the last right row seen, which at any left row is
    the nearest FUTURE one. With ``tolerance_seconds``, matches farther
    than the tolerance are nulled out (the whole struct at once, so
    columns never mix between rows). Right ties on (key, ts) reduce to
    min(tiebreak) — the earliest deterministic winner.

    One shuffle on the key + one per-key sort, identical cost to the
    backward join; no candidate-pair materialization.
    """
    from pyspark.sql import types as T

    r = right
    if tiebreak:
        w_tb = Window.partitionBy(on, right_ts).orderBy(F.asc(tiebreak))
        r = (
            r.withColumn("__tb", F.row_number().over(w_tb))
            .filter(F.col("__tb") == 1)
            .drop("__tb")
        )

    left_cols = left.columns
    val_fields = [
        T.StructField(c, right.schema[c].dataType) for c in value_cols
    ]
    val_type = T.StructType(
        val_fields + [T.StructField("__rts", right.schema[right_ts].dataType)]
    )
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left_cols).alias("__l"),
        F.lit(None).cast(val_type).alias("__v"),
    )
    r_tagged = r.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(right_ts).alias("__rts"),
        ).alias("__v"),
    )
    # DESC time, right rows first at equal ts: forward asof is >=, so a
    # right row at exactly left_ts is eligible
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.desc("__t"), F.asc("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__is_left",
        "__l",
        F.col("__t").alias("__lt"),
        F.last("__v", ignorenulls=True).over(w).alias("__v"),
    )
    if tolerance_seconds is not None:
        within = F.col("__v.__rts") <= F.col("__lt") + F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECOND"
        )
        carried = carried.withColumn(
            "__v", F.when(within, F.col("__v"))
        )
    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__v.{c}").alias(c) for c in value_cols],
        F.col("__v.__rts").alias("__matched_ts"),
    ).drop("__matched_ts")
