"""A/B probe: per-query effect of the unsplittable-input split.

For each candidate query, times build+exec (noop sink) min-of-3 with
SPARK_GRAFT_SPLIT_FORCE=1 vs unset, same session, interleaved A/B/A/B
to cancel regime drift. Not part of the product; measurement only.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from chai_data_pipeline_spark import plans  # noqa: E402
from chai_data_pipeline_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = sys.argv[1:]

spark = get_spark("ab-split")
spark.range(1).count()
warm = "/root/testdata/sf0.001"
for n in names:
    plans.QUERIES[n](spark, warm).write.format("noop").mode("overwrite").save()

res = {}
for _pass in range(3):
    for n in names:
        for mode in ("off", "on"):
            if mode == "on":
                os.environ["SPARK_GRAFT_SPLIT_FORCE"] = "1"
            else:
                os.environ.pop("SPARK_GRAFT_SPLIT_FORCE", None)
            t0 = time.perf_counter()
            df = plans.QUERIES[n](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            key = (n, mode)
            if key not in res or dt < res[key]:
                res[key] = dt
os.environ.pop("SPARK_GRAFT_SPLIT_FORCE", None)

out = {}
print(f"{'query':40s} {'off':>7s} {'on':>7s} {'delta':>7s}")
for n in names:
    off, on = res[(n, "off")], res[(n, "on")]
    out[n] = {"off": round(off, 3), "on": round(on, 3)}
    print(f"{n:40s} {off:7.3f} {on:7.3f} {on-off:+7.3f}")
json.dump(out, open("/tmp/ab_split.json", "w"), indent=1)
