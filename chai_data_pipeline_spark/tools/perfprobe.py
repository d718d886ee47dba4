"""Per-query perf decomposition probe for optimization rounds.

For each requested query (default: bench.py HEADLINE) under bench
conditions (get_spark, $SPARK_GRAFT_SF_DIR / sf0.1, sf0.001 warm-up,
noop sink), measures separately:

- ``build_s``  — wall time of ``QUERIES[name](spark, sf_dir)``: pure
  driver-side plan construction (Py4J round trips + analysis), zero
  execution.
- ``exec_s``   — min over N of the noop-sink write of a pre-built
  DataFrame: optimization + scheduling + actual compute.

The split tells you which guide lever applies: a query dominated by
``build_s`` needs a smaller expression tree / fewer Py4J calls
(guide §7.3 "planning time itself can become the bottleneck"), one
dominated by ``exec_s`` needs plan-shape work (guide §2-§4).

Usage:
    python -m chai_data_pipeline_spark.tools.perfprobe out.json [names...]
    # env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PROBE_N (default 3)

Also writes ``.explain("formatted")`` for each probed query to
$SPARK_GRAFT_PLAN_DIR/<name>_<tag>.txt when SPARK_GRAFT_PLAN_DIR is set
(tag from SPARK_GRAFT_PLAN_TAG, default "before").
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "perfprobe.json"
    names = sys.argv[2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_passes = int(os.environ.get("SPARK_GRAFT_PROBE_N", "3"))
    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR")
    plan_tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if repo not in sys.path:
        sys.path.insert(0, repo)

    import bench
    from chai_data_pipeline_spark import plans
    from chai_data_pipeline_spark.session import get_spark

    if not names:
        names = list(bench.HEADLINE)

    spark = get_spark("chai-perfprobe")
    spark.range(1).count()

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        plans.QUERIES[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    if plan_dir:
        os.makedirs(plan_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for _pass in range(n_passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"perfprobe:{name}")
            t0 = time.perf_counter()
            df = plans.QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            r = results.setdefault(
                name, {"build_s": [], "exec_s": []}
            )
            r["build_s"].append(round(t1 - t0, 3))
            r["exec_s"].append(round(t2 - t1, 3))
            if plan_dir and _pass == 0:
                with open(
                    os.path.join(plan_dir, f"{name}_{plan_tag}.txt"), "w"
                ) as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    ))
    spark.sparkContext.setJobDescription(None)

    summary = {
        name: {
            "build_min": min(r["build_s"]),
            "exec_min": min(r["exec_s"]),
            "total_min": round(min(r["build_s"]) + min(r["exec_s"]), 3),
            "build_s": r["build_s"],
            "exec_s": r["exec_s"],
        }
        for name, r in results.items()
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    tot_b = round(sum(v["build_min"] for v in summary.values()), 2)
    tot_e = round(sum(v["exec_min"] for v in summary.values()), 2)
    print(f"n={len(summary)} build_total={tot_b}s exec_total={tot_e}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
