"""Round-14 probe: decompose the streaming micro-batch floor.

For each streaming headline key, runs the full query under bench
conditions and captures every micro-batch's ``durationMs`` breakdown
(addBatch / queryPlanning / walCommit / commitOffsets / getBatch /
latestOffset / triggerExecution) plus wall-clock segments around the
run (build → start → processAllAvailable → stop → readback). The sum
tells us which component of the ~0.5-1.4 s/key fixed cost is
addressable (guide §1: measure first; VERDICT r13 item 3).

Usage: python plans/r14/probe_stream_floor.py out.json [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"

STREAM_KEYS = [
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_session_window",
    "streaming_stateful_totals",
    "streaming_stream_join",
    "streaming_dedup_delivery",
    "streaming_upsert_latest",
]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "stream_floor.json"
    names = sys.argv[2:] or STREAM_KEYS

    from pyspark.sql.streaming import StreamingQueryListener

    from chai_data_pipeline_spark import plans
    from chai_data_pipeline_spark.session import get_spark

    spark = get_spark("probe-stream-floor")
    spark.sparkContext.setLogLevel("ERROR")

    progress_log: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            progress_log.append(
                {"ev": "started", "t": time.perf_counter()}
            )

        def onQueryProgress(self, event):
            p = event.progress
            progress_log.append(
                {
                    "ev": "progress",
                    "t": time.perf_counter(),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs),
                }
            )

        def onQueryTerminated(self, event):
            progress_log.append(
                {"ev": "terminated", "t": time.perf_counter()}
            )

    listener = Capture()
    spark.streams.addListener(listener)

    # warm-up (per-process costs: codegen, Arrow workers)
    for name in names:
        plans.QUERIES[name](spark, WARM).write.format("noop").mode(
            "overwrite"
        ).save()

    out = {}
    for name in names:
        progress_log.clear()
        t0 = time.perf_counter()
        df = plans.QUERIES[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        out[name] = {
            "run_s": round(t1 - t0, 3),  # includes the streaming run
            "readback_s": round(t2 - t1, 3),
            "events": [
                {**e, "t": round(e["t"] - t0, 3)} for e in progress_log
            ],
        }

    spark.streams.removeListener(listener)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    for name, d in out.items():
        batches = [e for e in d["events"] if e["ev"] == "progress"]
        trig = sum(
            e["durationMs"].get("triggerExecution", 0) for e in batches
        )
        print(
            f"{name}: run={d['run_s']}s readback={d['readback_s']}s "
            f"batches={len(batches)} trigger_total={trig}ms"
        )


if __name__ == "__main__":
    main()
