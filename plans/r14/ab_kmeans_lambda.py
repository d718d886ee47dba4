"""Round-14 probe: single-literal transform-lambda codebook argmax
(operators/kmeans._best_struct_expr) vs the r13 k-inlined-struct form.

Two parts:

1. BIT-IDENTITY over every sf0.1 vector: the old and new expressions
   must agree on (sim, neg_cid) exactly — the checked twins
   (embedding_kmeans_checked, embedding_cluster_purity_nmi) hash the
   fold arithmetic against DuckDB, so any drift is a correctness bug,
   not a perf tradeoff.

2. Interleaved min-of-N A/B of the three kmeans-family query paths
   (embedding_kmeans iters=3, embedding_kmeans_checked iters=0,
   embedding_cluster_purity_nmi iters=0) with _best_struct_expr
   monkeypatched to each form, timing the FULL query (build+exec via
   noop sink) under bench conditions.

Usage: python plans/r14/ab_kmeans_lambda.py out.json [n_passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from chai_data_pipeline_spark.session import get_spark, load_tables  # noqa: E402
from chai_data_pipeline_spark.operators import kmeans as KM  # noqa: E402
from chai_data_pipeline_spark.operators.similarity import (  # noqa: E402
    dot_sql_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"


def old_best_struct_expr(codebook, vec_col):
    """The r13 form: k inlined struct elements, each with its own
    zip_with/aggregate dot tree (verbatim from git history)."""
    elems = []
    for cid, vec in enumerate(codebook):
        arr = f"array({', '.join(f'cast({x!r} AS double)' for x in vec)})"
        elems.append(
            f"struct(({dot_sql_spark(vec_col, arr)})"
            f" / (__vnorm * {KM._centroid_norm(vec)!r}) AS sim, "
            f"{-cid} AS neg_cid)"
        )
    return f"array_max(array({', '.join(elems)}))"


def queries(spark, sf_dir):
    from chai_data_pipeline_spark import plans

    return {
        "embedding_kmeans": plans.QUERIES["embedding_kmeans"],
        "embedding_kmeans_checked": plans.QUERIES["embedding_kmeans_checked"],
        "embedding_cluster_purity_nmi": plans.QUERIES[
            "embedding_cluster_purity_nmi"
        ],
    }


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "ab_kmeans_lambda.json"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("ab-kmeans-lambda")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- part 1: bit identity over every SF_DIR vector -------------
    emb = load_tables(spark, SF_DIR, "embeddings")["embeddings"]
    codebook = KM.kmeans_fit(emb, k=8, iters=3)
    base = emb.withColumn(
        "__vnorm", F.expr(f"sqrt({dot_sql_spark('embedding', 'embedding')})")
    )
    both = base.select(
        F.expr(old_best_struct_expr(codebook, "embedding")).alias("o"),
        F.expr(KM._best_struct_expr(codebook, "embedding")).alias("n"),
    )
    total = both.count()
    mismatches = both.filter(
        "o.neg_cid != n.neg_cid OR o.sim != n.sim "
        "OR (o.sim IS NULL) != (n.sim IS NULL)"
    ).count()

    # ---- part 2: interleaved A/B over the three query paths --------
    qs = queries(spark, SF_DIR)
    new_form = KM._best_struct_expr
    forms = {"old": old_best_struct_expr, "new": new_form}
    # warm both forms once
    for fname, form in forms.items():
        KM._best_struct_expr = form
        for q in qs.values():
            q(spark, WARM).write.format("noop").mode("overwrite").save()
    timings = {fn: {q: [] for q in qs} for fn in forms}
    for _ in range(n_passes):
        for fname, form in forms.items():
            KM._best_struct_expr = form
            for qname, q in qs.items():
                t0 = time.perf_counter()
                q(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[fname][qname].append(
                    round(time.perf_counter() - t0, 3)
                )
    KM._best_struct_expr = new_form

    result = {
        "sf_dir": SF_DIR,
        "identity": {"total": total, "mismatches": mismatches},
        "raw": timings,
        "min": {
            fn: {q: min(v) for q, v in d.items()}
            for fn, d in timings.items()
        },
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["identity"]))
    print(json.dumps(result["min"]))


if __name__ == "__main__":
    main()
