"""Probe: literal-heavy similarity expressions — where does the time go,
and do two candidate rewrites (a) double-literal `D` syntax instead of
`cast(x AS double)` per element, (b) skipping the identity
`transform(..., x -> cast(x AS double))` wrap on an already-double
LITERAL array side of dot_sql_spark — change values AT ALL (they must
be bit-identical) and how much build/exec they save.

Run on an idle box:  python plans/r13/ab_litdot.py
Writes plans/r13/ab_litdot.json.
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
from chai_data_pipeline_spark.operators.kmeans import (  # noqa: E402
    _centroid_norm,
    kmeans_fit,
)
from chai_data_pipeline_spark.operators.similarity import (  # noqa: E402
    dot_sql_spark,
)


def _as_double(arr: str) -> str:
    return f"transform({arr}, x -> cast(x AS double))"


def lit_arr_cast(vec):
    return "array(" + ", ".join(f"cast({x!r} AS double)" for x in vec) + ")"


def lit_arr_d(vec):
    return "array(" + ", ".join(f"{x!r}D" for x in vec) + ")"


def dot_lit_raw(vec_col: str, arr: str) -> str:
    """dot where `arr` is already array<double>: no identity transform."""
    return (
        f"aggregate(zip_with({_as_double(vec_col)}, {arr}, (x, y) -> x * y),"
        f" cast(0 AS double), (acc, v) -> acc + v)"
    )


def best_struct(codebook, vec_col, litf, dotf):
    elems = []
    for cid, vec in enumerate(codebook):
        arr = litf(vec)
        elems.append(
            f"struct(({dotf(vec_col, arr)})"
            f" / (__vnorm * {_centroid_norm(vec)!r}) AS sim, "
            f"{-cid} AS neg_cid)"
        )
    return f"array_max(array({', '.join(elems)}))"


VARIANTS = {
    "cast_wrap": (lit_arr_cast, dot_sql_spark),    # current form
    "cast_raw": (lit_arr_cast, dot_lit_raw),       # skip identity transform
    "d_wrap": (lit_arr_d, dot_sql_spark),          # D literal, keep wrap
    "d_raw": (lit_arr_d, dot_lit_raw),             # both rewrites
}


def main():
    spark = get_spark("ab-litdot")
    emb = load_tables(spark, SF_DIR, "embeddings")["embeddings"]
    codebook = kmeans_fit(emb, k=8, iters=0)  # first-k init, no jobs beyond init

    # -- bit-identity check: every variant's struct vs the current form,
    # over EVERY row at sf0.1; any mismatch in sim bits or cid fails loudly
    base_expr = best_struct(codebook, "embedding", *VARIANTS["cast_wrap"])
    probe = emb.withColumn(
        "__vnorm", F.expr(f"sqrt({dot_sql_spark('embedding', 'embedding')})")
    )
    for name, (litf, dotf) in VARIANTS.items():
        if name == "cast_wrap":
            continue
        ex = best_struct(codebook, "embedding", litf, dotf)
        n_bad = (
            probe.withColumn("a", F.expr(base_expr))
            .withColumn("b", F.expr(ex))
            .filter(
                "a.neg_cid <> b.neg_cid OR "
                "cast(a.sim AS string) <> cast(b.sim AS string)"
            )
            .count()
        )
        print(f"identity {name}: mismatches={n_bad}")
        assert n_bad == 0, f"{name} diverges from current form"

    # -- timing: build (expr string + parse + analysis) and exec (noop)
    results = {}
    for _pass in range(3):
        for name, (litf, dotf) in VARIANTS.items():
            t0 = time.perf_counter()
            ex = best_struct(codebook, "embedding", litf, dotf)
            df = (
                probe.withColumn("__best", F.expr(ex))
                .select(
                    (-F.col("__best.neg_cid")).alias("cluster_id"),
                    F.col("__best.sim").alias("sim"),
                )
            )
            df.schema  # force analysis
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            r = results.setdefault(name, {"build": [], "exec": []})
            r["build"].append(round(t1 - t0, 4))
            r["exec"].append(round(t2 - t1, 4))
    for name, r in results.items():
        print(
            f"{name}: build_min={min(r['build']):.3f} "
            f"exec_min={min(r['exec']):.3f}"
        )
    out = Path(__file__).with_suffix(".json")
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
