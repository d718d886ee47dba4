"""Round-14 interleaved A/B: rollup_revenue pre-agg, q18 aggregate
reuse, q11 per_part localCheckpoint — old (r13) form vs in-tree form.

Each pass asserts row identity at sf0.1 once, then times old/new
interleaved with the noop sink, min-of-N.

Usage: python plans/r14/ab_twolevel.py out.json [n_passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"


def old_rollup(spark, sf_dir):
    from pyspark.sql import functions as F

    from chai_data_pipeline_spark.functions import dround, dsum
    from chai_data_pipeline_spark.session import load_tables

    li = load_tables(spark, sf_dir, "lineitem", split=("lineitem",))[
        "lineitem"
    ]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            dround(dsum("l_extendedprice", 2), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_items",
        )
    )


def old_q18(spark, sf_dir):
    from pyspark.sql import functions as F

    from chai_data_pipeline_spark.functions import dround, dsum
    from chai_data_pipeline_spark.session import load_tables

    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem",
        split=("lineitem", "orders"),
    )
    li = t["lineitem"]
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", 2).alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(
            big_orders,
            F.col("l_orderkey") == F.col("big_orderkey"),
            "left_semi",
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t["customer"].select("c_custkey", "c_name"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice",
        )
        .agg(dround(dsum("l_quantity", 2), 2).alias("total_qty"))
    )


def old_q11(spark, sf_dir):
    from pyspark.sql import functions as F

    from chai_data_pipeline_spark.functions import dround, dsum
    from chai_data_pipeline_spark.session import load_tables

    t = load_tables(
        spark, sf_dir, "lineitem", "part", split=("lineitem:l_partkey",)
    )
    per_part = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey")
        .agg(
            dround(
                dsum(F.col("p_retailprice") * F.col("l_quantity"), 2), 2
            ).alias("part_value")
        )
    )
    total = per_part.agg(
        dsum("part_value", 2).alias("tv"), F.count("*").alias("np")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 1.5 * F.col("tv") / F.col("np"))
        .select("l_partkey", "part_value")
    )


PAIRS = {
    "rollup_revenue": old_rollup,
    "tpch_q18_large_volume_customers": old_q18,
    "tpch_q11_important_stock": old_q11,
}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "ab_twolevel.json"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from chai_data_pipeline_spark import plans
    from chai_data_pipeline_spark.session import get_spark

    spark = get_spark("ab-twolevel")
    spark.sparkContext.setLogLevel("ERROR")

    identity = {}
    for name, old_fn in PAIRS.items():
        o = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
        n = sorted(
            map(tuple, plans.QUERIES[name](spark, SF_DIR).collect())
        )
        identity[name] = {"rows": len(o), "identical": o == n}
        assert o == n, f"{name}: old/new rows differ"

    for name, old_fn in PAIRS.items():  # warm-up
        old_fn(spark, WARM).write.format("noop").mode("overwrite").save()
        plans.QUERIES[name](spark, WARM).write.format("noop").mode(
            "overwrite"
        ).save()

    timings = {nm: {"old": [], "new": []} for nm in PAIRS}
    for _ in range(n_passes):
        for name, old_fn in PAIRS.items():
            for label, fn in (("old", old_fn), ("new", plans.QUERIES[name])):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[name][label].append(
                    round(time.perf_counter() - t0, 3)
                )

    result = {
        "identity": identity,
        "raw": timings,
        "min": {
            nm: {k: min(v) for k, v in d.items()}
            for nm, d in timings.items()
        },
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["min"]))


if __name__ == "__main__":
    main()
