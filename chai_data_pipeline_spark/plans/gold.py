"""Gold-layer model queries (SURVEY §2.12 build targets + A6/J2 rewrite).

These are the testdata analogs of the reference's gold models:
user_engagement_metrics, weekly_aggregates, monthly_kpis
(reference: scripts/gold/model_gold.py:93-103,
scripts/gold/aggregate_gold.py:44-72 — declared-but-unpopulated tables)
and the global as-of summary whose reference implementation fans out
across provinces via a country-only self-join
(scripts/gold/model_gold.py:246-287); ours uses window lags over one
pre-aggregated daily frame (SURVEY §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import davg, dround, dsum, sql_davg, sql_dround, sql_dsum
from ..session import load_tables
from .registry import query

# --------------------------------------------------------------------------
# user_engagement_metrics: per-user activity + CASE bucketing
# (reference: scripts/gold/model_gold.py:93-103)
# --------------------------------------------------------------------------


@query(
    "user_engagement",
    oracle=f"""
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_event_types,
       {sql_dround(sql_dsum('value'))} AS total_value,
       {sql_dround(sql_davg('value'))} AS avg_value,
       CASE WHEN COUNT(*) >= 200 THEN 'HIGH'
            WHEN COUNT(*) >= 100 THEN 'MEDIUM'
            ELSE 'LOW' END AS activity_level
FROM events
GROUP BY user_id
""",
)
def user_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split=: groupBy(user_id) = the events split key — the exchange
    # is the group shuffle (A/B 0.30 -> 0.20 s,
    # plans/r13/ab_split_kill.json)
    events = load_tables(spark, sf_dir, "events", split=("events",))[
        "events"
    ]
    n = F.count("*")
    return events.groupBy("user_id").agg(
        n.alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        dround(dsum("value")).alias("total_value"),
        dround(davg("value")).alias("avg_value"),
        F.when(n >= 200, "HIGH")
        .when(n >= 100, "MEDIUM")
        .otherwise("LOW")
        .alias("activity_level"),
    )


# --------------------------------------------------------------------------
# weekly_aggregates: ISO week grouping over the daily frame
# (reference: scripts/gold/aggregate_gold.py:44-56)
# --------------------------------------------------------------------------


@query(
    "weekly_aggregates",
    oracle=f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
    FROM events GROUP BY 1
)
SELECT CAST(isoyear(d) AS INTEGER) AS iso_year,
       CAST(weekofyear(d) AS INTEGER) AS week_num,
       CAST(SUM(n) AS BIGINT) AS total_events,
       {sql_dround('AVG(n)')} AS avg_daily_events,
       CAST(MAX(n) AS BIGINT) AS peak_daily_events,
       COUNT(*) AS n_days
FROM daily GROUP BY 1, 2
""",
)
def weekly_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    return daily.groupBy(
        F.expr("extract(YEAROFWEEK FROM d)").cast("int").alias("iso_year"),
        F.weekofyear("d").alias("week_num"),
    ).agg(
        F.sum("n").alias("total_events"),
        dround(F.avg("n")).alias("avg_daily_events"),
        F.max("n").alias("peak_daily_events"),
        F.count("*").alias("n_days"),
    )


# --------------------------------------------------------------------------
# monthly_kpis: month truncation + month-over-month growth window
# (reference: scripts/gold/aggregate_gold.py:58-72)
# --------------------------------------------------------------------------


@query(
    "monthly_kpis",
    oracle=f"""
WITH m AS (
    SELECT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS month_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_dround(sql_dsum('value'))} AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT month_start, n_events, n_users, total_value,
       {sql_dround('''CASE WHEN LAG(n_events) OVER (ORDER BY month_start) > 0
            THEN (n_events - LAG(n_events) OVER (ORDER BY month_start)) * 100.0
                 / LAG(n_events) OVER (ORDER BY month_start)
       END''')} AS mom_growth_pct
FROM m
""",
)
def monthly_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timeless events are excluded on both sides: a NULL month bucket
    # would ride the MoM lag where the engines sort NULLs differently
    events = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull()
    )
    m = events.groupBy(F.trunc("ts", "month").alias("month_start")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dround(dsum("value")).alias("total_value"),
    )
    w = Window.orderBy("month_start")
    prev = F.lag("n_events").over(w)
    return m.select(
        "month_start",
        "n_events",
        "n_users",
        "total_value",
        dround(
            F.when(prev > 0, (F.col("n_events") - prev) * 100.0 / prev)
        ).alias("mom_growth_pct"),
    )


# --------------------------------------------------------------------------
# global as-of summary: latest day vs prev-day vs week-ago via lags over
# ONE daily frame (replaces the reference's fanning self-join J2/A6)
# --------------------------------------------------------------------------


@query(
    "global_asof_summary",
    oracle=f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
           {sql_dround(sql_dsum('value'))} AS v
    FROM events GROUP BY 1
), w AS (
    SELECT d, n, v,
           LAG(n, 1) OVER (ORDER BY d) AS prev_n,
           LAG(n, 7) OVER (ORDER BY d) AS week_n
    FROM daily
), mx AS (SELECT MAX(d) AS maxd FROM daily)
SELECT w.d AS summary_date,
       n AS total_events,
       v AS total_value,
       COALESCE(prev_n, 0) AS prev_day_events,
       n - COALESCE(prev_n, 0) AS day_delta,
       COALESCE(week_n, 0) AS week_ago_events
FROM w JOIN mx ON w.d = mx.maxd
""",
)
def global_asof_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n"), dround(dsum("value")).alias("v")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d",
        "n",
        "v",
        F.lag("n", 1).over(w).alias("prev_n"),
        F.lag("n", 7).over(w).alias("week_n"),
    )
    mx = daily.agg(F.max("d").alias("maxd"))
    return (
        lagged.join(F.broadcast(mx), F.col("d") == F.col("maxd"))
        .select(
            F.col("d").alias("summary_date"),
            F.col("n").alias("total_events"),
            F.col("v").alias("total_value"),
            F.coalesce("prev_n", F.lit(0)).alias("prev_day_events"),
            (F.col("n") - F.coalesce("prev_n", F.lit(0))).alias("day_delta"),
            F.coalesce("week_n", F.lit(0)).alias("week_ago_events"),
        )
    )


# --------------------------------------------------------------------------
# Incremental materialized-view maintenance (M3 made driver-checkable):
# a daily-rollup matview is refreshed by combining the EXISTING base
# aggregate (events before the cutoff) with a DELTA aggregate (events
# since) — partial n/decimal-sum states merge with a full-outer
# coalesce-add, finalized once at the end. Because the partials are
# BIGINT counts and exact DECIMAL sums (associative, order-independent
# — the engine-wide numeric contract in functions/numeric.py), the
# incrementally-maintained view is BIT-IDENTICAL to the full recompute
# the oracle runs: the refresh never drifts, no matter how many deltas
# are applied or how the data is partitioned. At 100 TB this is the
# difference between rescanning the corpus nightly and scanning one
# day: the delta scan prunes to ts >= cutoff (partition pruning on a
# date-partitioned lake), and the merge touches only matview-sized
# state.
# --------------------------------------------------------------------------

_REFRESH_CUTOFF = "2024-01-24"


@query(
    "incremental_daily_refresh",
    oracle=f"""
SELECT CAST(ts AS DATE) AS d, event_type,
       COUNT(*) AS n_events,
       {sql_dround(sql_dsum('value'))} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def incremental_daily_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]

    def partial(df: DataFrame) -> DataFrame:
        # partial state: count + EXACT decimal sum (no double cast yet —
        # finalization happens once, after the merge)
        return df.groupBy(
            F.col("ts").cast("date").alias("d"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(27,4)")).alias("qsum"),
        )

    # NULL-ts rows route into the BASE side (ts < cutoff is NULL-false,
    # which would drop them from both partials while the oracle's full
    # GROUP BY keeps a NULL-date group). Current testdata has no NULL
    # ts, but the maintenance identity must not depend on that.
    base = partial(
        events.filter(
            (F.col("ts") < F.lit(_REFRESH_CUTOFF)) | F.col("ts").isNull()
        )
    )
    delta = partial(events.filter(F.col("ts") >= F.lit(_REFRESH_CUTOFF)))
    b = base.alias("b")
    dl = delta.alias("dl")
    # Null-safe equality on BOTH merge keys: plain equality never
    # matches NULL to NULL, so a NULL-keyed group with state on both
    # sides would emit two rows where the full recompute's GROUP BY
    # emits one merged row. (Today d determines the cutoff side, so
    # only the event_type key can be NULL-split in practice, but the
    # maintenance identity must not depend on the routing rule.)
    merged = b.join(
        dl,
        F.col("b.d").eqNullSafe(F.col("dl.d"))
        & F.col("b.event_type").eqNullSafe(F.col("dl.event_type")),
        "full_outer",
    ).select(
        F.coalesce(F.col("b.d"), F.col("dl.d")).alias("d"),
        F.coalesce(F.col("b.event_type"), F.col("dl.event_type")).alias(
            "event_type"
        ),
        (
            F.coalesce(F.col("b.n"), F.lit(0))
            + F.coalesce(F.col("dl.n"), F.lit(0))
        ).alias("n_events"),
        # SQL SUM-merge semantics: NULL only when BOTH partials are
        # NULL (an all-NULL-value group), else skip-null addition —
        # coalescing to 0 unconditionally minted a 0.0 the full
        # recompute reports as NULL
        F.coalesce(
            F.col("b.qsum") + F.col("dl.qsum"),
            F.col("b.qsum"),
            F.col("dl.qsum"),
        ).alias("qsum"),
    )
    return merged.select(
        "d",
        "event_type",
        "n_events",
        dround(F.col("qsum").cast("double")).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Incremental maintenance of a DISTINCT-based aggregate. Counts and
# decimal sums merge associatively (incremental_daily_refresh); a
# "daily NEW users" matview does not — a user is new only on their
# globally-first day, which a delta cannot know alone. The maintained
# state that makes it incremental is the per-user first-seen day
# (user-cardinality, the minimal sufficient state): merging base and
# delta states is LEAST(first_day), and the view re-derives from the
# merged state. The driver oracle is the FULL recompute, so the hash
# match proves the maintenance identity end to end.
# --------------------------------------------------------------------------


@query(
    "incremental_new_users_refresh",
    oracle="""
WITH firsts AS (
    -- NULL user_id excluded on both sides: a full join on the state
    -- key never matches NULL to NULL, so an identityless "user" would
    -- split into two state rows and double-count
    SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d
    FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT first_d AS d, COUNT(*) AS new_users
FROM firsts
GROUP BY 1
""",
)
def incremental_new_users_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("user_id").isNotNull()
    )

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.min(F.col("ts").cast("date")).alias("first_d")
        )

    base = state(
        events.filter(
            (F.col("ts") < F.lit(_REFRESH_CUTOFF)) | F.col("ts").isNull()
        )
    )
    delta = state(events.filter(F.col("ts") >= F.lit(_REFRESH_CUTOFF)))
    b = base.withColumnRenamed("first_d", "b_d")
    d = delta.withColumnRenamed("first_d", "d_d")
    merged = b.join(d, "user_id", "full").select(
        "user_id",
        F.least(
            F.coalesce("b_d", "d_d"), F.coalesce("d_d", "b_d")
        ).alias("first_d"),
    )
    return merged.groupBy(F.col("first_d").alias("d")).agg(
        F.count("*").alias("new_users")
    )


# --------------------------------------------------------------------------
# gold.weekly_aggregates, pipeline-metadata flavor (reference:
# aggregate_gold.py:44-56 schema — week_start_date, week_number, year,
# total_records_processed, avg_daily_records, peak_day_records,
# avg_quality_score, trend_direction — declared but never populated;
# daily_aggregates population semantics at aggregate_gold.py:83-176).
# Each event day stands in for one pipeline run: bronze = rows landed,
# silver = rows surviving cleaning, gold = distinct users modeled; the
# daily quality score is the integer silver/bronze percentage (exact
# integer division on both engines). The weekly trend compares totals
# against the previous week at ±10% using integer cross-multiplication
# (total*10 vs prev*11 / prev*9) — no float boundary to diverge on.
# Scale: one groupBy(day) with map-side partials, then O(weeks) rows
# through the rollup and the unpartitioned lag window.
# --------------------------------------------------------------------------


@query(
    "pipeline_weekly_aggregates",
    oracle=f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d,
           COUNT(*) AS bronze_records,
           COUNT(*) FILTER (WHERE user_id IS NOT NULL
                            AND event_type IS NOT NULL) AS silver_records,
           COUNT(DISTINCT user_id) AS gold_records
    FROM events WHERE ts IS NOT NULL GROUP BY 1
),
scored AS (
    SELECT d,
           bronze_records + silver_records + gold_records AS total_records,
           CAST((silver_records * 100) // bronze_records AS INTEGER)
               AS quality_score
    FROM daily
),
weekly AS (
    SELECT CAST(date_trunc('week', d) AS DATE) AS week_start_date,
           CAST(SUM(total_records) AS BIGINT) AS total_records_processed,
           {sql_dround('CAST(SUM(total_records) AS DOUBLE) / COUNT(*)', 2)}
               AS avg_daily_records,
           CAST(MAX(total_records) AS BIGINT) AS peak_day_records,
           {sql_dround('CAST(SUM(quality_score) AS DOUBLE) / COUNT(*)', 2)}
               AS avg_quality_score
    FROM scored GROUP BY 1
)
SELECT week_start_date,
       CAST(weekofyear(week_start_date) AS INTEGER) AS week_number,
       CAST(year(week_start_date) AS INTEGER) AS year,
       total_records_processed,
       avg_daily_records,
       peak_day_records,
       avg_quality_score,
       CASE WHEN LAG(total_records_processed)
                     OVER (ORDER BY week_start_date) IS NULL
                 OR LAG(total_records_processed)
                     OVER (ORDER BY week_start_date) = 0
            THEN 'STABLE'
            WHEN total_records_processed * 10
                 > LAG(total_records_processed)
                     OVER (ORDER BY week_start_date) * 11
            THEN 'INCREASING'
            WHEN total_records_processed * 10
                 < LAG(total_records_processed)
                     OVER (ORDER BY week_start_date) * 9
            THEN 'DECREASING'
            ELSE 'STABLE' END AS trend_direction
FROM weekly
""",
)
def pipeline_weekly_aggregates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekly pipeline-throughput rollup over per-day layer counts."""
    events = load_tables(spark, sf_dir, "events")["events"]
    # NULL-ts rows would form a NULL date/week group that rides the
    # unpartitioned lag window, where Spark orders NULLS FIRST and
    # DuckDB NULLS LAST — filter on BOTH sides (oracle has the same
    # WHERE), matching the monthly_kpis pattern.
    daily = (
        events.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count("*").alias("bronze_records"),
            F.count_if(
                F.col("user_id").isNotNull()
                & F.col("event_type").isNotNull()
            ).alias("silver_records"),
            F.countDistinct("user_id").alias("gold_records"),
        )
    )
    scored = daily.select(
        "d",
        (
            F.col("bronze_records")
            + F.col("silver_records")
            + F.col("gold_records")
        ).alias("total_records"),
        F.expr(
            "CAST((silver_records * 100) DIV bronze_records AS INT)"
        ).alias("quality_score"),
    )
    weekly = scored.groupBy(
        F.date_trunc("week", "d").cast("date").alias("week_start_date")
    ).agg(
        F.sum("total_records").cast("bigint").alias(
            "total_records_processed"
        ),
        dround(
            F.sum("total_records").cast("double") / F.count("*"), 2
        ).alias("avg_daily_records"),
        F.max("total_records").cast("bigint").alias("peak_day_records"),
        dround(
            F.sum("quality_score").cast("double") / F.count("*"), 2
        ).alias("avg_quality_score"),
    )
    w = Window.orderBy("week_start_date")
    prev = F.lag("total_records_processed").over(w)
    total = F.col("total_records_processed")
    trend = (
        F.when(prev.isNull() | (prev == 0), "STABLE")
        .when(total * 10 > prev * 11, "INCREASING")
        .when(total * 10 < prev * 9, "DECREASING")
        .otherwise("STABLE")
    )
    return weekly.select(
        "week_start_date",
        F.weekofyear("week_start_date").cast("int").alias("week_number"),
        F.year("week_start_date").cast("int").alias("year"),
        "total_records_processed",
        "avg_daily_records",
        "peak_day_records",
        "avg_quality_score",
        trend.alias("trend_direction"),
    )


# --------------------------------------------------------------------------
# Incremental maintenance of a JOIN view: the enriched matview
# events ⋈ customer ⋈ nation rolled up to (nation, event_type). With a
# static dimension side the delta rule is Δ(F ⋈ D) = ΔF ⋈ D, so
# maintenance = merge(base_agg, agg(Δevents ⋈ dims)) — the fact delta
# is the ONLY re-scanned input, which is the entire point of
# incremental view maintenance at 100 TB (the dims stay broadcast).
# Merge discipline identical to incremental_daily_refresh: null-safe
# keys, NULL-ts routed to base, SUM-merge via coalesce(b+d, b, d).
# --------------------------------------------------------------------------


@query(
    "incremental_join_refresh",
    oracle=f"""
SELECT n.n_name AS nation, e.event_type,
       COUNT(*) AS n_events,
       {sql_dround(sql_dsum('e.value'))} AS total_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1, 2
""",
)
def incremental_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-maintained enriched join view vs its full recompute."""
    t = load_tables(spark, sf_dir, "events", "customer", "nation")
    dims = F.broadcast(
        t["customer"]
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )

    def partial(df: DataFrame) -> DataFrame:
        return (
            df.join(dims, "user_id")
            .groupBy(F.col("n_name").alias("nation"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(27,4)")).alias("qsum"),
            )
        )

    events = t["events"]
    base = partial(
        events.filter(
            (F.col("ts") < F.lit(_REFRESH_CUTOFF)) | F.col("ts").isNull()
        )
    )
    delta = partial(events.filter(F.col("ts") >= F.lit(_REFRESH_CUTOFF)))
    b = base.alias("b")
    dl = delta.alias("dl")
    merged = b.join(
        dl,
        F.col("b.nation").eqNullSafe(F.col("dl.nation"))
        & F.col("b.event_type").eqNullSafe(F.col("dl.event_type")),
        "full_outer",
    ).select(
        F.coalesce(F.col("b.nation"), F.col("dl.nation")).alias("nation"),
        F.coalesce(F.col("b.event_type"), F.col("dl.event_type")).alias(
            "event_type"
        ),
        (
            F.coalesce(F.col("b.n"), F.lit(0))
            + F.coalesce(F.col("dl.n"), F.lit(0))
        ).alias("n_events"),
        F.coalesce(
            F.col("b.qsum") + F.col("dl.qsum"),
            F.col("b.qsum"),
            F.col("dl.qsum"),
        ).alias("qsum"),
    )
    return merged.select(
        "nation",
        "event_type",
        "n_events",
        dround(F.col("qsum").cast("double")).alias("total_value"),
    )
