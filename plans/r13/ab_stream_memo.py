"""A/B probe: _events_stream source-plan memo, via its kill switch.

Same methodology as ab_split_kill.py: full query run (streaming
queries execute a real Structured Streaming run inside the query fn,
then the noop sink forces the returned batch frame), min-of-3,
interleaved off/on in one session to cancel regime drift. "off" =
SPARK_GRAFT_STREAM_MEMO=0 (build the batch-schema read + readStream
plan every call), "on" = memo hit from the second build onward.
Measurement only, not product.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from chai_data_pipeline_spark import plans  # noqa: E402
from chai_data_pipeline_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = sys.argv[1:] or [
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_session_window",
    "streaming_stateful_totals",
    "streaming_stream_join",
    "streaming_dedup_delivery",
    "streaming_upsert_latest",
]

spark = get_spark("ab-stream-memo")
spark.range(1).count()
warm = "/root/testdata/sf0.001"
for n in names:
    plans.QUERIES[n](spark, warm).write.format("noop").mode("overwrite").save()

res = {}
for _pass in range(3):
    for n in names:
        for mode in ("off", "on"):
            if mode == "off":
                os.environ["SPARK_GRAFT_STREAM_MEMO"] = "0"
            else:
                os.environ.pop("SPARK_GRAFT_STREAM_MEMO", None)
            t0 = time.perf_counter()
            df = plans.QUERIES[n](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            key = (n, mode)
            if key not in res or dt < res[key]:
                res[key] = dt
os.environ.pop("SPARK_GRAFT_STREAM_MEMO", None)

out = {}
print(f"{'query':40s} {'off':>7s} {'on':>7s} {'delta':>7s}")
for n in names:
    off, on = res[(n, "off")], res[(n, "on")]
    out[n] = {"off": round(off, 3), "on": round(on, 3)}
    print(f"{n:40s} {off:7.3f} {on:7.3f} {on-off:+7.3f}")
json.dump(out, open("/tmp/ab_stream_memo.json", "w"), indent=1)
