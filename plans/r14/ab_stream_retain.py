"""Round-14 focused A/B: base vs minBatchesToRetain=2 only (5 passes).

Interleaved min-of-N over the seven streaming headline keys, bench
conditions, for each knob set:

- base:   session defaults (what the bench runs today)
- retain: spark.sql.streaming.minBatchesToRetain=2 (default 100 —
          bounds state/WAL versions kept; affects cleanup work only,
          never what a batch computes)
- maint:  spark.sql.streaming.stateStore.maintenanceInterval=1h
          (default 60s — the background snapshot/cleanup thread never
          fires inside a short run; affects maintenance cadence only)
- both:   retain + maint

Usage: python plans/r14/ab_stream_knobs.py out.json [n_passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"

KEYS = [
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_session_window",
    "streaming_stateful_totals",
    "streaming_stream_join",
    "streaming_dedup_delivery",
    "streaming_upsert_latest",
]

KNOBS = {
    "base": {},
    "retain": {"spark.sql.streaming.minBatchesToRetain": "2"},
}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "ab_stream_knobs.json"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from chai_data_pipeline_spark import plans
    from chai_data_pipeline_spark.session import get_spark

    spark = get_spark("ab-stream-knobs")
    spark.sparkContext.setLogLevel("ERROR")

    defaults = {
        k: spark.conf.get(k, None)
        for ks in KNOBS.values()
        for k in ks
    }

    def apply(conf):
        for k, dflt in defaults.items():
            v = conf.get(k)
            if v is None:
                if dflt is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, dflt)
            else:
                spark.conf.set(k, v)

    for name in KEYS:  # warm-up
        plans.QUERIES[name](spark, WARM).write.format("noop").mode(
            "overwrite"
        ).save()

    timings = {kn: {q: [] for q in KEYS} for kn in KNOBS}
    for _ in range(n_passes):
        for kn, conf in KNOBS.items():
            apply(conf)
            for name in KEYS:
                t0 = time.perf_counter()
                plans.QUERIES[name](spark, SF_DIR).write.format(
                    "noop"
                ).mode("overwrite").save()
                timings[kn][name].append(
                    round(time.perf_counter() - t0, 3)
                )
    apply({})

    result = {
        "raw": timings,
        "min": {
            kn: {q: min(v) for q, v in d.items()}
            for kn, d in timings.items()
        },
        "totals": {
            kn: round(sum(min(v) for v in d.values()), 3)
            for kn, d in timings.items()
        },
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["totals"]))
    print(json.dumps(result["min"]))


if __name__ == "__main__":
    main()
