"""Flagship query — the tracer bullet (SURVEY §7.2 step 1).

Daily event trends over the ``events`` table: per-day/per-type
aggregation, day-over-day delta via lag, 7-day rolling average, and an
in-day ranking — one plan exercising projection/filter (P1-P2), grouped
multi-agg (A1, reference scripts/gold/model_gold.py:106-116), lag-based
diff (W2/W3, reference scripts/silver/transform_silver.py:312-314),
rolling mean with partial leading frame (W4, transform_silver.py:316-317),
and ranking (W1, model_gold.py:319-330) — all as window/agg expressions,
no UDFs, one shuffle for the groupBy and one for each window family.

Scale posture: the aggregation shuffles on (day, type) — high cardinality,
no skew; windows partition by event_type (bounded cardinality but each
partition holds only ~days rows post-agg, so a single executor per type
is tiny). At 100 TB the pre-aggregation shrinks data by orders of
magnitude before any window sees it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import dround, dsum, sql_dround, sql_dsum
from ..session import load_tables
from .registry import query

_ORACLE = f"""
WITH daily AS (
    SELECT
        CAST(ts AS DATE)            AS event_date,
        event_type,
        COUNT(*)                    AS n_events,
        COUNT(DISTINCT user_id)     AS n_users,
        {sql_dround(sql_dsum('value'))} AS total_value
    FROM events
    -- ts IS NOT NULL: an event without a time cannot join a daily
    -- trend, and a NULL date group would ride the series windows where
    -- Spark (NULLS FIRST) and DuckDB (NULLS LAST) order it differently
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
)
SELECT
    event_date,
    event_type,
    n_events,
    n_users,
    total_value,
    n_events - COALESCE(
        LAG(n_events) OVER (PARTITION BY event_type ORDER BY event_date), 0
    ) AS daily_delta,
    {sql_dround('''AVG(n_events) OVER (
        PARTITION BY event_type ORDER BY event_date
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
    )''')} AS rolling_7d,
    CAST(ROW_NUMBER() OVER (
        PARTITION BY event_date ORDER BY n_events DESC, event_type
    ) AS INTEGER) AS rank_in_day
FROM daily
"""


@query("flagship_daily_event_trends", oracle=_ORACLE)
def flagship_daily_event_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]

    daily = (
        events.filter(
            F.col("event_type").isNotNull() & F.col("ts").isNotNull()
        )
        .groupBy(
            F.to_date("ts").alias("event_date"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dround(dsum("value")).alias("total_value"),
        )
    )

    w_series = Window.partitionBy("event_type").orderBy("event_date")
    w_roll = w_series.rowsBetween(-6, 0)
    w_rank = Window.partitionBy("event_date").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )

    return daily.select(
        "event_date",
        "event_type",
        "n_events",
        "n_users",
        "total_value",
        (F.col("n_events") - F.coalesce(F.lag("n_events").over(w_series), F.lit(0)))
        .alias("daily_delta"),
        dround(F.avg("n_events").over(w_roll)).alias("rolling_7d"),
        F.row_number().over(w_rank).alias("rank_in_day"),
    )
