"""Micro-profile of embedding_kmeans: where do its ~1.4 s go, and does
fanning the PERSISTED training projection out to the session's cores
(repartition before persist — the cache then holds 32 partitions, so
every Lloyd iteration's assign+explode+partial-agg stage parallelizes)
help? Values are provably partition-independent: the update sums are
fixed-point integers (associative), init is orderBy(id).limit(k).

Run idle:  python plans/r13/ab_kmeans_phases.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from chai_data_pipeline_spark.session import get_spark, load_tables  # noqa: E402
from chai_data_pipeline_spark.operators import kmeans as KM  # noqa: E402


def timed_fit(df, k, iters, repartition_to=None):
    t = {}
    t0 = time.perf_counter()
    work = df.select("vec_id", "embedding")
    if repartition_to:
        work = work.repartition(repartition_to, F.col("vec_id"))
    work = work.persist()
    try:
        init = (
            work.orderBy("vec_id").limit(k)
            .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("v"))
            .collect()
        )
        t["init"] = round(time.perf_counter() - t0, 3)
        codebook = [[float(x) for x in r.v] for r in init]
        for i in range(iters):
            ti = time.perf_counter()
            assigned = KM.kmeans_assign(work, codebook, "embedding")
            sums = (
                assigned.select(
                    "cluster_id", F.posexplode("embedding").alias("dim", "val")
                )
                .groupBy("cluster_id", "dim")
                .agg(
                    F.sum(
                        F.floor(F.col("val").cast("double") * KM._Q).cast("long")
                    ).alias("qsum"),
                    F.count("*").alias("n"),
                )
                .collect()
            )
            new_book = [list(c) for c in codebook]
            acc = {}
            for r in sums:
                acc.setdefault(int(r.cluster_id), []).append(
                    (int(r.dim), int(r.qsum), int(r.n))
                )
            for cid, entries in acc.items():
                vec = new_book[cid]
                for dim, qsum, n in entries:
                    vec[dim] = qsum / KM._Q / n
            codebook = new_book
            t[f"iter{i}"] = round(time.perf_counter() - ti, 3)
        ts = time.perf_counter()
        KM.kmeans_summary(df, codebook).write.format("noop").mode(
            "overwrite"
        ).save()
        t["summary_noop"] = round(time.perf_counter() - ts, 3)
        t["total"] = round(time.perf_counter() - t0, 3)
        return t, codebook
    finally:
        work.unpersist()


def main():
    spark = get_spark("ab-km-phases")
    emb = load_tables(spark, SF_DIR, "embeddings")["embeddings"]
    print("rows:", emb.count(), "partitions:", emb.rdd.getNumPartitions())
    cores = spark.sparkContext.defaultParallelism

    results = {"base": [], "fan": []}
    books = {}
    for _pass in range(3):
        for mode in ("base", "fan"):
            t, book = timed_fit(
                emb, 8, 3, repartition_to=cores if mode == "fan" else None
            )
            results[mode].append(t)
            if mode in books:
                assert books[mode] == book, "codebook not reproducible!"
            books[mode] = book
            print(mode, t)
    assert books["base"] == books["fan"], "fan-out changed the codebook!"
    print("codebooks identical across modes: OK")
    out = Path(__file__).with_suffix(".json")
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
