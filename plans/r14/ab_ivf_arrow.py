"""Round-14: Arrow/numpy IVF path for the rows-only similarity_ann_ivf
(VERDICT r13 item 6).

Checks, old (fold) vs new (arrow=True):
1. FULL coarse-assignment identity (every vec_id -> centroid_id) at
   each SF — stronger than output identity, rules out argmax flips.
2. Query-result row identity (top-10 with dround-6 cosine) at each SF.
3. Interleaved min-of-N timing at sf0.1 and the 10x sf1 point.

Usage: python plans/r14/ab_ivf_arrow.py out.json [n_passes]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/scale/sf1",
}
TIMED = ["sf0.1", "sf1"]
WARM = "/root/testdata/sf0.001"


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "ab_ivf_arrow.json"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from chai_data_pipeline_spark.operators.similarity import (
        ann_topk_ivf,
        ivf_assign,
        ivf_assign_arrow,
    )
    from chai_data_pipeline_spark.session import get_spark, load_tables

    spark = get_spark("ab-ivf-arrow")
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir, arrow):
        emb = load_tables(
            spark, sf_dir, "embeddings", split=("embeddings",)
        )["embeddings"]
        qdf = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
        return ann_topk_ivf(emb, qdf, k=10, arrow=arrow)

    identity = {}
    for label, sf_dir in SFS.items():
        emb = load_tables(
            spark, sf_dir, "embeddings", split=("embeddings",)
        )["embeddings"]
        a_fold = {
            r[0]: r[1]
            for r in ivf_assign(emb)
            .select("vec_id", "centroid_id")
            .collect()
        }
        a_arrow = {
            r[0]: r[1]
            for r in ivf_assign_arrow(emb)
            .select("vec_id", "centroid_id")
            .collect()
        }
        assign_mism = sum(
            1 for kk in a_fold if a_fold[kk] != a_arrow.get(kk)
        )
        out_fold = sorted(map(tuple, run(sf_dir, False).collect()))
        out_arrow = sorted(map(tuple, run(sf_dir, True).collect()))
        identity[label] = {
            "n_vectors": len(a_fold),
            "assign_mismatches": assign_mism,
            "result_identical": out_fold == out_arrow,
        }
        assert assign_mism == 0, f"{label}: assignment mismatch"
        assert out_fold == out_arrow, f"{label}: result rows differ"

    for arrow in (False, True):  # warm-up
        run(WARM, arrow).write.format("noop").mode("overwrite").save()

    timings = {lbl: {"fold": [], "arrow": []} for lbl in TIMED}
    for _ in range(n_passes):
        for lbl in TIMED:
            for name, arrow in (("fold", False), ("arrow", True)):
                t0 = time.perf_counter()
                run(SFS[lbl], arrow).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[lbl][name].append(
                    round(time.perf_counter() - t0, 3)
                )

    result = {
        "identity": identity,
        "raw": timings,
        "min": {
            lbl: {k: min(v) for k, v in d.items()}
            for lbl, d in timings.items()
        },
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["min"]))
    print(json.dumps(identity))


if __name__ == "__main__":
    main()
