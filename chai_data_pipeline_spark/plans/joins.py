"""Join queries (SURVEY §2.3) + the upsert merge (M1).

Scale posture: dimension tables (region/nation, and customer relative
to lineitem) are broadcast explicitly — at 100 TB the fact side never
shuffles for a dim join. The fact⋈fact join (lineitem⋈orders) shuffles
on the join key; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import davg, dround, dsum, sql_davg, sql_dround, sql_dsum
from ..session import load_tables
from .registry import query

# --------------------------------------------------------------------------
# J1 — left-anti orphan check (referential integrity)
# (reference: scripts/silver/validate_silver.py:164-169 orphaned posts)
# --------------------------------------------------------------------------


@query(
    "anti_join_orphans",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
""",
)
def anti_join_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    return (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            t["orders"].o_custkey == t["customer"].c_custkey,
            "left_anti",
        )
        .agg(F.count("*").alias("n_orphans"))
    )


# --------------------------------------------------------------------------
# J1-adjacent — left-semi (EXISTS) aggregation
# --------------------------------------------------------------------------


@query(
    "semi_join_active_customers",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
GROUP BY c_mktsegment
""",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    finished = t["orders"].filter(F.col("o_orderstatus") == "F")
    return (
        t["customer"]
        .join(finished, t["customer"].c_custkey == finished.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# J4 — cross join of scalar aggregates (layer-stats combine)
# (reference: scripts/gold/aggregate_gold.py:88-111 bronze×silver×gold stats)
# --------------------------------------------------------------------------


@query(
    "cross_join_scalar_stats",
    oracle=f"""
WITH o AS (SELECT COUNT(*) AS n_orders,
                  {sql_dround(sql_dsum('o_totalprice', 2), 2)} AS total_order_value
           FROM orders),
     l AS (SELECT COUNT(*) AS n_lineitems,
                  {sql_dround(sql_davg('l_quantity', 2), 4)} AS avg_qty
           FROM lineitem),
     c AS (SELECT COUNT(*) AS n_customers FROM customer)
SELECT * FROM o CROSS JOIN l CROSS JOIN c
""",
)
def cross_join_scalar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem", "customer")
    o = t["orders"].agg(
        F.count("*").alias("n_orders"),
        dround(dsum("o_totalprice", 2), 2).alias("total_order_value"),
    )
    l = t["lineitem"].agg(
        F.count("*").alias("n_lineitems"),
        dround(davg("l_quantity", 2), 4).alias("avg_qty"),
    )
    c = t["customer"].agg(F.count("*").alias("n_customers"))
    return o.crossJoin(l).crossJoin(c)


# --------------------------------------------------------------------------
# J5 — broadcast dimension join (customer ⋈ nation ⋈ region)
# (reference: scripts/gold/model_gold.py:492-493 dict-map lookup join)
# --------------------------------------------------------------------------


@query(
    "broadcast_dim_join",
    oracle=f"""
SELECT r_name, n_name, COUNT(*) AS n_customers,
       {sql_dround(sql_davg('c_acctbal', 2), 2)} AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dround(davg("c_acctbal", 2), 2).alias("avg_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Star-schema join: fact⋈fact shuffle join + broadcast dims, scalar
# subquery for the region pick (A7-style). TPC-H Q5 shape.
# --------------------------------------------------------------------------


@query(
    "star_join_revenue",
    oracle=f"""
SELECT n_name AS nation,
       {sql_dround(sql_dsum('l_extendedprice * (1 - l_discount)', 4), 2)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = (SELECT MIN(r_name) FROM region)
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY n_name
""",
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    # scalar "subquery": 1-row agg joined via crossJoin-broadcast, no collect
    min_region = t["region"].agg(F.min("r_name").alias("min_r_name"))
    region = (
        t["region"]
        .crossJoin(F.broadcast(min_region))
        .filter(F.col("r_name") == F.col("min_r_name"))
        .select("r_regionkey", "r_name")
    )
    orders = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                t["customer"]
                .join(
                    F.broadcast(t["nation"]),
                    F.col("c_nationkey") == F.col("n_nationkey"),
                )
                .join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("c_custkey", "n_name")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dround(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# M1 — upsert (merge by key): source snapshot overrides target on
# conflicting keys, both sides' non-conflicting keys kept.
# (reference: scripts/gold/model_gold.py:354-378 ON CONFLICT DO UPDATE;
#  plain-parquet engine: full-outer coalesce, or partition-overwrite on
#  write — see operators/merge.py)
# --------------------------------------------------------------------------


@query(
    "upsert_merge_by_key",
    oracle="""
WITH target AS (
    -- NULL merge keys are undefined for an upsert: SQL equality never
    -- matches them while a union-dedup merge groups them — exclude
    SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
    FROM events
    WHERE CAST(ts AS DATE) <= DATE '2024-01-20'
      AND event_type IS NOT NULL
    GROUP BY 1, 2
), source AS (
    SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-15'
      AND event_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT COALESCE(s.d, t.d) AS d,
       COALESCE(s.event_type, t.event_type) AS event_type,
       COALESCE(s.n, t.n) AS n
FROM target t FULL OUTER JOIN source s
  ON t.d = s.d AND t.event_type = s.event_type
""",
)
def upsert_merge_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import upsert

    events = load_tables(spark, sf_dir, "events")["events"]
    daily = lambda pred: (  # noqa: E731
        events.filter(pred & F.col("event_type").isNotNull())
        .groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    target = daily(F.to_date("ts") <= F.lit("2024-01-20").cast("date"))
    source = daily(F.to_date("ts") >= F.lit("2024-01-15").cast("date"))
    return upsert(target, source, keys=["d", "event_type"])


# --------------------------------------------------------------------------
# CDC apply: latest-change-wins compaction + tombstone deletes over a
# snapshot (operators/merge.apply_cdc). The change log is synthesized
# deterministically from the customer snapshot: two competing updates
# (seq 1: +50, seq 2: +100 — latest must win), deletes, and inserts.
# The oracle derives the FINAL state directly (no window), so the two
# sides agree only if compaction picks exactly the right change per key.
# --------------------------------------------------------------------------


@query(
    "cdc_apply_changes",
    oracle="""
SELECT c_custkey, c_name, c_nationkey,
       CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100 ELSE c_acctbal END
           AS c_acctbal,
       c_mktsegment
FROM customer
WHERE c_custkey % 7 <> 1
UNION ALL
SELECT c_custkey + 1000000, c_name, c_nationkey, 0.0, c_mktsegment
FROM customer
WHERE c_custkey % 7 = 2
""",
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import apply_cdc

    cust = load_tables(spark, sf_dir, "customer")["customer"]
    cols = cust.columns
    k = F.col("c_custkey")

    upd1 = (
        cust.filter(k % 7 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 50)
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(1))
    )
    upd2 = (
        cust.filter(k % 7 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 100)
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(2))
    )
    dels = (
        cust.filter(k % 7 == 1)
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.lit(1))
    )
    ins = (
        cust.filter(k % 7 == 2)
        .withColumn("c_custkey", k + 1000000)
        .withColumn("c_acctbal", F.lit(0.0))
        .withColumn("op", F.lit("I"))
        .withColumn("seq", F.lit(1))
    )
    changes = upd1.unionByName(upd2).unionByName(dels).unionByName(ins)
    return apply_cdc(cust, changes, ["c_custkey"]).select(*cols)


# --------------------------------------------------------------------------
# Referential-integrity profile: EVERY foreign-key edge of the schema
# audited in one result table — the whole-warehouse version of the J1
# orphan check (reference: validate_silver.py:164-169 checks one edge;
# a production DQ run checks them all). Per edge: one left join against
# the DISTINCT parent keys (key-only shuffle — the parent's payload
# never moves; bounded dims broadcast), one count. Output is
# edge-cardinality.
# --------------------------------------------------------------------------

_FK_ORPHAN_SQL = """
SELECT '{name}' AS fk, COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey}
       )) AS n_orphans
FROM {child} c
"""


@query(
    "fk_integrity_profile",
    oracle=" UNION ALL ".join(
        _FK_ORPHAN_SQL.format(
            name=name, child=child, ckey=ckey, parent=parent, pkey=pkey
        )
        for name, child, ckey, parent, pkey in [
            ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
            ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
            ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
            ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
            ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
            ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ]
    ),
)
def fk_integrity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark,
        sf_dir,
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    )

    def edge(
        name: str,
        child: DataFrame,
        ckey: str,
        parent: DataFrame,
        pkey: str,
        broadcast_parent: bool,
    ) -> DataFrame:
        pk = parent.select(pkey).distinct()
        if broadcast_parent:
            pk = F.broadcast(pk)
        j = child.select(F.col(ckey).alias("__k")).join(
            pk, F.col("__k") == F.col(pkey), "left"
        )
        return j.agg(
            F.lit(name).alias("fk"),
            F.count("*").alias("n_rows"),
            F.count_if(F.col(pkey).isNull()).alias("n_orphans"),
        )

    # bounded dims broadcast; table-sized parents (customer, orders,
    # part) co-partition — their distinct-key side is key-only
    edges = [
        edge("orders->customer", t["orders"], "o_custkey", t["customer"], "c_custkey", False),
        edge("customer->nation", t["customer"], "c_nationkey", t["nation"], "n_nationkey", True),
        edge("nation->region", t["nation"], "n_regionkey", t["region"], "r_regionkey", True),
        edge("lineitem->orders", t["lineitem"], "l_orderkey", t["orders"], "o_orderkey", False),
        edge("lineitem->part", t["lineitem"], "l_partkey", t["part"], "p_partkey", False),
        edge("lineitem->supplier", t["lineitem"], "l_suppkey", t["supplier"], "s_suppkey", True),
        edge("supplier->nation", t["supplier"], "s_nationkey", t["nation"], "n_nationkey", True),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out
