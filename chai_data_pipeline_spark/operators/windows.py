"""Reusable window-shaped operators: sessionization, diff, rolling.

These wrap the window idioms the plans use so the medallion layers and
ad-hoc users share one implementation with pinned determinism rules
(explicit ordering tiebreaks everywhere — SURVEY §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids per user (batch analog of streaming
    session windows). Adds a ``session_id`` column (1-based per user).

    Boundary matches Spark's ``session_window`` exactly: an event
    arriving EXACTLY ``gap_seconds`` after the previous one is MERGED
    into that session (verified empirically against ``F.session_window``
    in batch and streaming — the half-open ``[t, t+gap)`` window label is
    touched, and touching sessions merge). A new session starts only when
    the gap is STRICTLY greater than ``gap_seconds`` (``>``).

    Scale: one shuffle on ``user_col``; per-user partitions are small in
    any realistic event stream, and the two stacked windows share the
    same partitioning so Catalyst plans a single exchange + sort.
    """
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    from ..functions.numeric import epoch_seconds

    is_new = F.when(
        prev_ts.isNull()
        | (
            (epoch_seconds(F.col(ts_col)) - epoch_seconds(prev_ts))
            > gap_seconds
        ),
        1,
    ).otherwise(0)
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("__is_new", is_new).withColumn(
        "session_id", F.sum("__is_new").over(w_run)
    ).drop("__is_new")


def grouped_diff(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str,
    fill: float | int | None = 0,
) -> DataFrame:
    """value - lag(value) within each partition (pandas groupby().diff()
    analog, reference scripts/silver/transform_silver.py:312-314, but
    with explicit per-series partitioning — the reference diffs
    interleaved provinces within a country, SURVEY §7.4.2)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    delta = F.col(value_col) - F.lag(value_col).over(w)
    if fill is not None:
        delta = F.coalesce(delta, F.lit(fill))
    return df.withColumn(out_col, delta)


def rolling_mean(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str,
    window_rows: int = 7,
) -> DataFrame:
    """Trailing rolling mean over the last ``window_rows`` rows
    (min_periods=1 semantics match Spark's partial leading frames;
    reference scripts/silver/transform_silver.py:316-317)."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(out_col, F.avg(value_col).over(w))


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number (caller supplies deterministic
    order_cols incl. tiebreak; reference scripts/gold/model_gold.py:332-335)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def salted_top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list,
    k: int,
    salt_on: str,
    rank_col: str = "rn",
    n_salt: int = 64,
) -> DataFrame:
    """Hot-key-proof exact top-k per group: rank within
    (group, salt) first — an ``n_salt``-way salt bounds every phase-1
    window partition even when one group holds most of the rows — keep
    ≤ k per salt, then re-rank the ≤ k×n_salt survivors per group.
    Identical output to :func:`top_k_per_group` whenever ``order_cols``
    is a total order (caller supplies the tiebreak; ``salt_on`` is any
    deterministic per-row column, e.g. the row id — the salt VALUES
    never affect the result, only the partition bound)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(salt_on), F.lit(n_salt))
    )
    w1 = Window.partitionBy(*partition_cols, "__salt").orderBy(*order_cols)
    cand = (
        salted.withColumn("__lrn", F.row_number().over(w1))
        .filter(F.col("__lrn") <= k)
        .drop("__salt", "__lrn")
    )
    return top_k_per_group(cand, partition_cols, order_cols, k, rank_col)


def interpolate_daily(
    df: DataFrame,
    series_col: str,
    date_col: str,
    value_col: str,
    out_col: str = "v_filled",
) -> DataFrame:
    """Dense daily calendar per series + linear interpolation of missing
    days (the pandas ``interpolate`` analog). Missing days get
    prev + (next-prev)·(day-fraction); edge days with one neighbor keep
    that neighbor. One IGNORE NULLS window pass per direction,
    per-series partitions (no global sort); the dense calendar is
    bounded by series×span, not row count. Returns (series, date,
    out_col, was_gap)."""
    from pyspark.sql.window import Window as _W

    bounds = df.groupBy(series_col).agg(
        F.min(date_col).alias("lo"), F.max(date_col).alias("hi")
    )
    calendar = bounds.select(
        series_col,
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias(
            date_col
        ),
    )
    joined = calendar.join(df, [series_col, date_col], "left")
    w_prev = (
        _W.partitionBy(series_col)
        .orderBy(date_col)
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    w_next = (
        _W.partitionBy(series_col)
        .orderBy(date_col)
        .rowsBetween(0, _W.unboundedFollowing)
    )
    v = F.col(value_col)
    known_d = F.when(v.isNotNull(), F.col(date_col))
    ctx = joined.select(
        series_col,
        date_col,
        value_col,
        F.last(value_col, ignorenulls=True).over(w_prev).alias("__pv"),
        F.last(known_d, ignorenulls=True).over(w_prev).alias("__pd"),
        F.first(value_col, ignorenulls=True).over(w_next).alias("__nv"),
        F.first(known_d, ignorenulls=True).over(w_next).alias("__nd"),
    )
    interp = F.col("__pv") + (F.col("__nv") - F.col("__pv")) * (
        F.datediff(F.col(date_col), F.col("__pd"))
        * 1.0
        / F.datediff(F.col("__nd"), F.col("__pd"))
    )
    filled = (
        F.when(v.isNotNull(), v)
        .when(F.col("__pv").isNotNull() & F.col("__nv").isNotNull(), interp)
        .otherwise(F.coalesce("__pv", "__nv"))
    )
    return ctx.select(
        series_col,
        date_col,
        filled.alias(out_col),
        v.isNull().alias("was_gap"),
    )
