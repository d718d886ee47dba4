"""Window-function queries (SURVEY §2.5-§2.7) + sessionization.

All windows partition by a bounded-cardinality key *after* a
pre-aggregation shrinks the data (daily grain), or by a high-cardinality
key (user_id) where per-partition row counts stay small — both shapes
survive a 100x scale-up. Global (unpartitioned) windows appear only
over pre-aggregated frames of ≤ a few hundred rows (rank over nations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import dround, dsum, epoch_seconds, sql_dround, sql_dsum
from ..session import load_tables
from .registry import query

# --------------------------------------------------------------------------
# W1 — ranking over a pre-aggregated frame; rank on the ROUNDED measure
# so cross-engine ulp differences can't reorder ties
# (reference: scripts/gold/model_gold.py:319-330 country rank)
# --------------------------------------------------------------------------


@query(
    "rank_nations_by_balance",
    oracle=f"""
WITH t AS (
    SELECT n_name, {sql_dround(sql_dsum('c_acctbal', 2), 2)} AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
)
SELECT n_name, total_bal,
       CAST(ROW_NUMBER() OVER (ORDER BY total_bal DESC, n_name) AS INTEGER)
           AS bal_rank
FROM t
""",
)
def rank_nations_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation")
    totals = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dround(dsum("c_acctbal", 2), 2).alias("total_bal"))
    )
    w = Window.orderBy(F.desc("total_bal"), F.asc("n_name"))
    return totals.withColumn("bal_rank", F.row_number().over(w))


# --------------------------------------------------------------------------
# W2+W7+W8 — lag-1 / lag-7, day-over-day delta, week-over-week growth %
# (reference: scripts/gold/aggregate_gold.py:222-242 v_trend_analysis)
# --------------------------------------------------------------------------


@query(
    "lag_dod_wow",
    oracle=f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
)
SELECT d, event_type, n,
       n - COALESCE(LAG(n, 1) OVER w, 0) AS dod_delta,
       {sql_dround('''CASE WHEN LAG(n, 7) OVER w > 0
                  THEN (n - LAG(n, 7) OVER w) * 100.0 / LAG(n, 7) OVER w
             END''', 4)} AS wow_growth_pct
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY d)
""",
)
def lag_dod_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts IS NOT NULL on both sides: a NULL date group would ride the
    # series window where the engines place NULLs on opposite ends
    events = load_tables(spark, sf_dir, "events")["events"]
    daily = events.filter(F.col("ts").isNotNull()).groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("d")
    lag7 = F.lag("n", 7).over(w)
    return daily.select(
        "d",
        "event_type",
        "n",
        (F.col("n") - F.coalesce(F.lag("n", 1).over(w), F.lit(0))).alias(
            "dod_delta"
        ),
        dround(
            F.when(lag7 > 0, (F.col("n") - lag7) * 100.0 / lag7), 4
        ).alias("wow_growth_pct"),
    )


# --------------------------------------------------------------------------
# W3 — grouped discrete derivative (diff) with deterministic ordering
# (reference: scripts/silver/transform_silver.py:312-314 groupby().diff();
#  ours orders by (ts, event_id) — explicit tiebreak, SURVEY §7.4.1/2)
# --------------------------------------------------------------------------


@query(
    "user_value_diff",
    oracle=f"""
SELECT user_id, event_id,
       {sql_dround('''value - COALESCE(
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0
       )''', 4)} AS value_delta
FROM events
WHERE ts IS NOT NULL
""",
)
def user_value_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timeless events cannot be sequenced — filtered on both sides
    events = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        dround(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0)), 4
        ).alias("value_delta"),
    )


# --------------------------------------------------------------------------
# W4 — rolling mean with partial leading frame (min_periods=1 semantics)
# (reference: scripts/silver/transform_silver.py:316-317 rolling(7))
# --------------------------------------------------------------------------


@query(
    "rolling_user_avg",
    oracle=f"""
SELECT user_id, event_id,
       {sql_dround('''CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / COUNT(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       )''', 4)} AS rolling_3
FROM events
WHERE ts IS NOT NULL
""",
)
def rolling_user_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timeless events cannot be sequenced — filtered on both sides
    events = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    # exact decimal frame-sum / count: order-independent, matches oracle
    return events.select(
        "user_id",
        "event_id",
        dround(
            F.sum(F.col("value").cast("decimal(27,4)")).over(w).cast("double")
            / F.count("value").over(w),
            4,
        ).alias("rolling_3"),
    )


# --------------------------------------------------------------------------
# W5+O3 — top-k per group via rank filter, explicit tiebreak
# (reference: scripts/gold/model_gold.py:332-335 top/bottom 5)
# --------------------------------------------------------------------------


@query(
    "topk_customers_per_nation",
    oracle=f"""
WITH ranked AS (
    SELECT n_name, c_name, c_acctbal, c_custkey,
           ROW_NUMBER() OVER (
               PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey
           ) AS rn
    FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, c_name, {sql_dround('c_acctbal', 2)} AS acctbal,
       CAST(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= 3
""",
)
def topk_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation")
    joined = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "n_name",
            "c_name",
            dround("c_acctbal", 2).alias("acctbal"),
            "rn",
        )
    )


# --------------------------------------------------------------------------
# W6 — trailing-vs-prior mean trend classification (the reference's one
# genuinely UDAF-shaped computation, rewritten as conditional window aggs)
# (reference: scripts/gold/model_gold.py:463-493 calculate_trend)
# --------------------------------------------------------------------------


@query(
    "trend_classification",
    oracle=f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC) AS rn
    FROM daily
), s AS (
    SELECT event_type,
           AVG(CASE WHEN rn <= 7 THEN n END) AS recent_avg,
           AVG(CASE WHEN rn > 7 THEN n END) AS earlier_avg
    FROM r GROUP BY event_type
)
SELECT event_type,
       {sql_dround('recent_avg', 4)} AS recent_avg,
       {sql_dround('earlier_avg', 4)} AS earlier_avg,
       CASE WHEN earlier_avg IS NULL OR earlier_avg = 0 THEN 'STABLE'
            WHEN recent_avg > earlier_avg * 1.1 THEN 'INCREASING'
            WHEN recent_avg < earlier_avg * 0.9 THEN 'DECREASING'
            ELSE 'STABLE' END AS trend
FROM s
""",
)
def trend_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]
    daily = (
        events.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("d"))
    r = daily.withColumn("rn", F.row_number().over(w))
    s = r.groupBy("event_type").agg(
        F.avg(F.when(F.col("rn") <= 7, F.col("n"))).alias("recent_avg"),
        F.avg(F.when(F.col("rn") > 7, F.col("n"))).alias("earlier_avg"),
    )
    return s.select(
        "event_type",
        dround("recent_avg", 4).alias("recent_avg"),
        dround("earlier_avg", 4).alias("earlier_avg"),
        F.when(
            F.col("earlier_avg").isNull() | (F.col("earlier_avg") == 0), "STABLE"
        )
        .when(F.col("recent_avg") > F.col("earlier_avg") * 1.1, "INCREASING")
        .when(F.col("recent_avg") < F.col("earlier_avg") * 0.9, "DECREASING")
        .otherwise("STABLE")
        .alias("trend"),
    )


# --------------------------------------------------------------------------
# U2 — dedup-by-key keeping a DETERMINISTIC survivor (earliest ts, then
# smallest event_id) — reference's drop_duplicates keeps whatever row
# pandas saw first (scripts/silver/transform_silver.py:232,354);
# SURVEY §7.4.1 pins the survivor explicitly.
# --------------------------------------------------------------------------


@query(
    "dedup_keep_first",
    oracle=f"""
WITH r AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id
    ) AS rn
    FROM events
)
SELECT event_id, user_id, event_type, {sql_dround('value', 4)} AS value
FROM r WHERE rn = 1
""",
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_by_key

    # split=: the survivor window clusters on (user_id, event_type) —
    # a user_id partitioning is a subset, so the split exchange IS the
    # window shuffle (A/B 0.20 -> 0.16 s, plans/r13/ab_split_kill.json)
    events = load_tables(spark, sf_dir, "events", split=("events",))[
        "events"
    ]
    deduped = dedup_by_key(
        events, keys=["user_id", "event_type"], order_by=["ts", "event_id"]
    )
    return deduped.select(
        "event_id", "user_id", "event_type", dround("value", 4).alias("value")
    )


# --------------------------------------------------------------------------
# Sessionization (beyond-reference; lag-gap + cumulative-sum session ids,
# the batch analog of streaming session windows)
# --------------------------------------------------------------------------


@query(
    "sessionization",
    oracle=f"""
WITH e AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN LAG(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
    SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
    ) AS session_id
    FROM e
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       {sql_dround(sql_dsum('value'))} AS session_value,
       {sql_dround('(epoch(MAX(ts)) - epoch(MIN(ts))) / 60.0', 4)} AS session_minutes
FROM s GROUP BY user_id, session_id
""",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import sessionize

    # split=: sessionize windows on user_id = the events split key, so
    # the split's exchange is the session-window shuffle (interleaved
    # A/B 0.60 -> 0.33 s, plans/r13/ab_split.json)
    events = load_tables(spark, sf_dir, "events", split=("events",))[
        "events"
    ]
    # Sessions are undefined for timeless/anonymous rows; the shared
    # NULL-key filter (plan AND oracle) also avoids the Spark NULLS
    # FIRST vs DuckDB NULLS LAST window-order divergence over ts.
    events = events.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    s = sessionize(
        events, user_col="user_id", ts_col="ts", gap_seconds=1800,
        order_tiebreak="event_id",
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        dround(dsum("value")).alias("session_value"),
        dround(
            (F.max(epoch_seconds("ts")) - F.min(epoch_seconds("ts"))) / 60.0,
            4,
        ).alias("session_minutes"),
    )


# --------------------------------------------------------------------------
# Time-RANGE window frame: trailing 7 *calendar days* per user — NOT 7
# rows. With gappy activity the two differ: a row frame reaches back
# through idle weeks, a range frame sees only what actually happened in
# the time interval. Spark expresses range frames over an epoch-seconds
# ordering key; the oracle uses DuckDB's native RANGE INTERVAL frame —
# agreeing results prove the epoch encoding is faithful.
# --------------------------------------------------------------------------


@query(
    "range_window_trailing_7d",
    oracle=f"""
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS event_date,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS day_value
    FROM events
    GROUP BY 1, 2
)
SELECT user_id, event_date,
       CAST(SUM(n_events) OVER w AS BIGINT) AS events_7d,
       {sql_dround('''SUM(day_value) OVER w''')} AS value_7d,
       CAST(COUNT(*) OVER w AS INTEGER) AS active_days_7d
FROM daily
WINDOW w AS (
    PARTITION BY user_id ORDER BY event_date
    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
)
""",
)
def range_window_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: split-by-user_id is reused by BOTH the daily groupBy and the
    # trailing window partitioning (guide §2.4); measured 0.66->0.42 s
    events = load_tables(spark, sf_dir, "events", split=("events",))["events"]
    daily = events.groupBy(
        "user_id", F.to_date("ts").alias("event_date")
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("day_value"),
    )
    # range frame over a DAY-NUMBER key (days since epoch), not epoch
    # seconds: unix_timestamp depends on the session time zone, and the
    # external driver runs a vanilla session — across a DST fall-back a
    # "6 days earlier" date would be 6d+1h of epoch seconds and fall
    # out of the frame. datediff is calendar arithmetic, tz-independent.
    day_key = F.datediff(F.col("event_date"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(day_key)
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "user_id",
        "event_date",
        F.sum("n_events").over(w).alias("events_7d"),
        dround(F.sum("day_value").over(w)).alias("value_7d"),
        F.count("*").over(w).cast("int").alias("active_days_7d"),
    )


# --------------------------------------------------------------------------
# Sweep-line peak concurrency: how many sessions were active at once,
# per day. Sessions (the pinned 1800 s lag-gap rule) become ±1
# boundary events, day-clipped so every day is an independent
# partition; deltas are NET-SUMMED per distinct (day, ts) BEFORE the
# sweep — one map-combined shuffle that shrinks the sweep input to
# distinct boundary timestamps — then one running sum + max per day.
# Concurrency is therefore measured just after each distinct boundary
# instant (a start and an end at the same microsecond net to zero,
# the standard sampled-interval-count semantic). At extreme scale the
# remaining per-day sort is bounded by coarsening boundaries to second
# grain (≤ 2×86400 rows/day) — same plan, one extra date_trunc.
# --------------------------------------------------------------------------


@query(
    "peak_concurrency_daily",
    oracle="""
WITH e AS (
    SELECT user_id, ts, event_id,
           CASE WHEN LAG(ts) OVER w IS NULL
                     OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
    SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
    ) AS session_id
    FROM e
), sess AS (
    SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
    FROM s GROUP BY 1, 2
), spans AS (
    SELECT CAST(unnest(generate_series(
               CAST(s_start AS DATE), CAST(s_end AS DATE),
               INTERVAL 1 DAY)) AS DATE) AS d,
           s_start, s_end
    FROM sess
), clipped AS (
    SELECT d,
           GREATEST(s_start, CAST(d AS TIMESTAMP)) AS cs,
           LEAST(s_end, CAST(d + 1 AS TIMESTAMP)) AS ce
    FROM spans
), bounds AS (
    SELECT d, ts, CAST(SUM(delta) AS BIGINT) AS delta FROM (
        SELECT d, cs AS ts, 1 AS delta FROM clipped
        UNION ALL
        SELECT d, ce, -1 FROM clipped
    ) GROUP BY 1, 2
), run AS (
    SELECT d, SUM(delta) OVER (
        PARTITION BY d ORDER BY ts ROWS UNBOUNDED PRECEDING
    ) AS c
    FROM bounds
), active AS (
    SELECT d, COUNT(*) AS n_active FROM clipped GROUP BY 1
)
SELECT r.d, CAST(MAX(r.c) AS BIGINT) AS peak_concurrent,
       CAST(MAX(a.n_active) AS BIGINT) AS n_active_sessions
FROM run r JOIN active a USING (d)
GROUP BY r.d
""",
)
def peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import sessionize

    events = load_tables(spark, sf_dir, "events")["events"]
    s = sessionize(
        events, user_col="user_id", ts_col="ts", gap_seconds=1800,
        order_tiebreak="event_id",
    )
    sess = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    spans = sess.select(
        F.explode(
            F.sequence(F.to_date("s_start"), F.to_date("s_end"))
        ).alias("d"),
        "s_start",
        "s_end",
    )
    clipped = spans.select(
        "d",
        F.greatest("s_start", F.col("d").cast("timestamp_ntz")).alias("cs"),
        F.least(
            "s_end", F.date_add("d", 1).cast("timestamp_ntz")
        ).alias("ce"),
    )
    starts = clipped.select("d", F.col("cs").alias("ts"), F.lit(1).alias("delta"))
    ends = clipped.select("d", F.col("ce").alias("ts"), F.lit(-1).alias("delta"))
    bounds = (
        starts.unionByName(ends)
        .groupBy("d", "ts")
        .agg(F.sum("delta").alias("delta"))
    )
    w = (
        Window.partitionBy("d")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = bounds.select("d", F.sum("delta").over(w).alias("c"))
    active = clipped.groupBy("d").agg(F.count("*").alias("n_active"))
    return (
        run.groupBy("d")
        .agg(F.max("c").alias("peak_concurrent"))
        .join(active, "d")
        .select(
            "d",
            "peak_concurrent",
            F.col("n_active").alias("n_active_sessions"),
        )
    )
