"""Decision-support join/subquery shapes (TPC-H Q4/Q5/Q13/Q17/Q18/Q19,
adapted to the testdata's slimmed schemas).

These six cover the relational surface the engine had not yet
demonstrated as whole queries: correlated EXISTS (semi join with a
non-equi conjunct), a six-table join cycle, outer-join count
distribution, correlated scalar subquery (decorrelated to a broadcast
agg join), HAVING-filtered IN (agg → join back), and a disjunctive
multi-conjunct join predicate.

The reference itself has no multi-table analytics beyond its
gold-layer joins (scripts/gold/model_gold.py:246-287); these anchor
the engine against standard OLAP workloads the way tpch_q1/q3/q6 do.

Scale posture: every plan is one pass over lineitem (the fact table)
with dimension sides small enough for AQE to broadcast; the Q17/Q18
self-aggregations produce key-sized intermediates (per-part averages,
per-order sums) that shuffle on the same key as the subsequent join,
so Catalyst reuses the exchange where possible. Adapted predicates
(no l_commitdate / o_comment in the testdata) keep each operator
shape intact while remaining oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import davg, dround, dsum, sql_davg, sql_dround, sql_dsum
from ..session import load_tables
from .registry import query

# --------------------------------------------------------------------------
# Q4 shape: correlated EXISTS → left-semi join with a non-equi conjunct
# (adapted: "late shipment" = l_shipdate > o_orderdate + 30 days, since
# the testdata has no l_commitdate/l_receiptdate)
# --------------------------------------------------------------------------


@query(
    "tpch_q4_priority_check",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
""",
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q5 shape: six-table join cycle (customer/orders/lineitem/supplier/
# nation/region) with the local-supplier closing condition
# --------------------------------------------------------------------------


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       {sql_dround(sql_dsum('l_extendedprice * (1 - l_discount)', 4), 2)}
           AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier",
        "nation", "region",
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # nation×region is fixed-cardinality (25×5 at any SF) → hard
    # broadcast hint; supplier GROWS with SF, so no forced hint — AQE
    # broadcasts it at small SF and falls back to shuffle join at scale
    asia_nations = F.broadcast(
        t["nation"]
        .join(
            t["region"].filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    suppliers = (
        t["supplier"].join(
            asia_nations, F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            suppliers,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            dround(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q13 shape: outer join + two-level aggregate (customer order-count
# distribution; priority filter stands in for the missing o_comment)
# --------------------------------------------------------------------------


@query(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    orders = t["orders"].filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q17 shape: correlated scalar subquery (per-part average), decorrelated
# to a broadcast aggregate join
# --------------------------------------------------------------------------


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
SELECT {sql_dround(f"{sql_dsum('l_extendedprice', 2)} / 7.0", 2)}
           AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#3'
  AND l_quantity < 0.2 * (
      SELECT {sql_davg('l_quantity', 2)}
      FROM lineitem l2
      WHERE l2.l_partkey = part.p_partkey
  )
""",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated average is decorrelated to a per-part aggregate
    joined back on partkey. No forced broadcast: the intermediate is
    part-cardinality, which grows with SF — AQE broadcasts it when it
    measures small, and at 100 TB the agg's shuffle on l_partkey
    co-partitions it with the join key, so the fallback shuffle join
    reuses the exchange. The decimal-exact dsum-based average keeps
    the `<` boundary comparison bit-identical cross-engine
    (numeric.py scale rule)."""
    # split on l_partkey (key override): the per-part agg AND the
    # join-back both cluster on it, so the split exchange is the only
    # shuffle the plan needs (A/B in plans/r13/ab_split.json)
    t = load_tables(
        spark, sf_dir, "lineitem", "part", split=("lineitem:l_partkey",)
    )
    li = t["lineitem"]
    part = t["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    per_part_avg = (
        li.groupBy("l_partkey").agg(
            davg("l_quantity", 2).alias("avg_qty")
        ).withColumnRenamed("l_partkey", "ap_partkey")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part_avg, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            dround(dsum("l_extendedprice", 2) / 7.0, 2).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: HAVING-filtered IN → aggregate then join back (large-volume
# orders)
# --------------------------------------------------------------------------


@query(
    "tpch_q18_large_volume_customers",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {sql_dround(sql_dsum('l_quantity', 2), 2)} AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING {sql_dsum('l_quantity', 2)} > 250
)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: lineitem split by l_orderkey feeds the HAVING pre-aggregate,
    # the semi-join AND the orders join without re-exchange (guide §2.4);
    # measured 1.33->1.17 s
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem",
        split=("lineitem", "orders"),
    )
    li = t["lineitem"]
    # r14: the output group is per o_orderkey (the orders PK — every
    # other group column is functionally determined by it), and its
    # total_qty is EXACTLY the per-order decimal sum the HAVING filter
    # already computed — the same dsum over the same lineitem rows. So
    # the qualifying aggregate IS the result: no semi-join back to
    # lineitem, no second pass over the big orders' detail rows, no
    # detail-grain final aggregation. One lineitem scan + one
    # order-grain aggregate, then order/customer joins on the
    # HAVING-filtered (small) side. Plan diff + A/B in
    # plans/r14/{tpch_q18_*_{before,after}.txt, ab_twolevel.json}.
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", 2).alias("_sq"))
        .filter(F.col("_sq") > 250)
    )
    return (
        big_orders.join(
            t["orders"], F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(
            t["customer"].select("c_custkey", "c_name"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            dround(F.col("_sq"), 2).alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive multi-conjunct join predicate (OR of brand ×
# size-range × quantity-range triples)
# --------------------------------------------------------------------------

_Q19_PRED_SQL = """(
    (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
     AND l_quantity BETWEEN 1 AND 20)
 OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
     AND l_quantity BETWEEN 10 AND 30)
 OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
     AND l_quantity BETWEEN 20 AND 50)
)"""


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
SELECT {sql_dround(sql_dsum('l_extendedprice * (1 - l_discount)', 4), 2)}
           AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey AND {_Q19_PRED_SQL}
""",
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    pred = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(pred)
        .agg(
            dround(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
            ).alias("revenue")
        )
    )
