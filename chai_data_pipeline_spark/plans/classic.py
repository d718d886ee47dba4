"""Classic OLAP shapes: TPC-H Q1 pricing summary, array explode word
counts, INTERSECT — the recognizable benchmark queries that anchor the
engine against standard workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import davg, dround, dsum, sql_davg, sql_dround, sql_dsum
from ..session import load_tables
from .registry import query

# --------------------------------------------------------------------------
# TPC-H Q1: the canonical pricing summary (groupBy 2 + 8 aggregates,
# one scan, partial+final hash agg)
# --------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dround(sql_dsum('l_quantity', 2), 2)} AS sum_qty,
       {sql_dround(sql_dsum('l_extendedprice', 2), 2)} AS sum_base_price,
       {sql_dround(sql_dsum('l_extendedprice * (1 - l_discount)', 4), 2)}
           AS sum_disc_price,
       {sql_dround(sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6), 2)}
           AS sum_charge,
       {sql_dround(sql_davg('l_quantity', 2), 4)} AS avg_qty,
       {sql_dround(sql_davg('l_extendedprice', 2), 4)} AS avg_price,
       {sql_dround(sql_davg('l_discount', 2), 4)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: first-stage compute bound (9 decimal aggs over the full scan);
    # unsplittable-input split measured 1.41->0.96 s (guide §2.5)
    li = load_tables(spark, sf_dir, "lineitem", split=("lineitem",))["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(dsum("l_quantity", 2), 2).alias("sum_qty"),
            dround(dsum("l_extendedprice", 2), 2).alias("sum_base_price"),
            dround(dsum(disc_price, 4), 2).alias("sum_disc_price"),
            # 2dp x 2dp x 2dp = 6 true decimals → scale 6 (see numeric.py)
            dround(
                dsum(disc_price * (1 + F.col("l_tax")), 6), 2
            ).alias("sum_charge"),
            dround(davg("l_quantity", 2), 4).alias("avg_qty"),
            dround(davg("l_extendedprice", 2), 4).alias("avg_price"),
            dround(davg("l_discount", 2), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Array explode → global word counts (lateral-view shape)
# --------------------------------------------------------------------------


@query(
    "explode_word_counts",
    oracle="""
WITH words AS (
    SELECT unnest(string_split_regex(TRIM(LOWER(text)), '\\s+')) AS word
    FROM documents
)
SELECT word, COUNT(*) AS n
FROM words GROUP BY word
""",
)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# INTERSECT (distinct set semantics)
# --------------------------------------------------------------------------


@query(
    "intersect_users",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_common
FROM (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
)
""",
)
def intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]
    signups = events.filter(F.col("event_type") == "signup").select("user_id")
    errors = events.filter(F.col("event_type") == "error").select("user_id")
    return signups.intersect(errors).agg(F.count("*").alias("n_common"))
