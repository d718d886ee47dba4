"""Round-14 interleaved A/B: q21 semi-join elimination.

old: late rows semi-joined against qualifying orders (2 lineitem
     scans, SMJ left-semi with a 600k-row Exchange+Sort on the left).
new (in-tree): pair agg carries (late supplier, late-row count); the
     waiting rows are derived from the per-order agg alone (1 scan).

Usage: python plans/r14/ab_q21.py out.json [n_passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"


def q21_old(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from chai_data_pipeline_spark.session import load_tables

    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    l = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ).alias("late"),
        )
    )
    pairs = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    per_order = pairs.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count("*").alias("n_supps"),
        F.count_if(F.col("late")).alias("n_late_supps"),
    )
    waiting = l.filter(F.col("late")).join(
        per_order.filter(
            (F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1)
        ),
        F.col("l_orderkey") == F.col("ok"),
        "left_semi",
    )
    counts = (
        waiting.join(
            t["supplier"], F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
    topk = counts.orderBy(F.desc("numwait"), F.asc("s_name")).limit(10)
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.desc("numwait"), F.asc("s_name")
    )
    return topk.withColumn("rn", F.row_number().over(w))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "ab_q21.json"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from chai_data_pipeline_spark import plans
    from chai_data_pipeline_spark.session import get_spark

    spark = get_spark("ab-q21")
    spark.sparkContext.setLogLevel("ERROR")

    new_fn = plans.QUERIES["tpch_q21_waiting_supplier"]

    # identity check first: same rows either way at sf0.1
    old_rows = sorted(map(tuple, q21_old(spark, SF_DIR).collect()))
    new_rows = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
    assert old_rows == new_rows, "old/new results differ!"

    for fn in (q21_old, new_fn):  # warm-up
        fn(spark, WARM).write.format("noop").mode("overwrite").save()

    timings = {"old": [], "new": []}
    for _ in range(n_passes):
        for label, fn in (("old", q21_old), ("new", new_fn)):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[label].append(round(time.perf_counter() - t0, 3))

    result = {
        "identical_rows": len(old_rows),
        "raw": timings,
        "min": {k: min(v) for k, v in timings.items()},
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["min"]), "rows:", len(old_rows))


if __name__ == "__main__":
    main()
