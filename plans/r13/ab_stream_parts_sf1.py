"""Scale check for the streaming state_partitions default: the r12
re-measure picked 2 at sf0.1 (per-partition commit files dominate a
100k-event run). At the 10x point the data share grows — does 2 stay
right, or is it a local-scale constant? Interleaved min-of-N of the
full stream-join and dedup-delivery runs at a given SF for each
candidate partition count.

Usage: SPARK_GRAFT_SF_DIR=... python plans/r13/ab_stream_parts_sf1.py out.json
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/scale/sf1")
OUT = sys.argv[1] if len(sys.argv) > 1 else "plans/r13/ab_stream_parts.json"

from chai_data_pipeline_spark.session import get_spark  # noqa: E402
from chai_data_pipeline_spark.streaming.windows import (  # noqa: E402
    purchase_click_join_stream,
    dedup_delivery_stream,
    run_streaming_query,
)

CANDS = [2, 8, 16]
N_PASS = 3

BUILDERS = {
    "stream_join": (purchase_click_join_stream, "append"),
    "dedup_delivery": (dedup_delivery_stream, "append"),
}


def main():
    spark = get_spark("ab-stream-parts")
    spark.range(1).count()
    results: dict[str, dict[str, list[float]]] = {}
    # warm one run so JIT/codegen is out of the measurement
    for name, (builder, mode) in BUILDERS.items():
        run_streaming_query(
            builder(spark, SF_DIR), f"warm_{name}", output_mode=mode,
            state_partitions=2,
        ).count()
    for _pass in range(N_PASS):
        for name, (builder, mode) in BUILDERS.items():
            for p in CANDS:
                t0 = time.perf_counter()
                run_streaming_query(
                    builder(spark, SF_DIR),
                    f"ab_{name}_{p}",
                    output_mode=mode,
                    state_partitions=p,
                ).count()
                dt = round(time.perf_counter() - t0, 3)
                results.setdefault(name, {}).setdefault(str(p), []).append(dt)
                print(f"pass{_pass} {name} p={p}: {dt}")
    for name, by_p in results.items():
        print(name, {p: min(v) for p, v in by_p.items()})
    Path(OUT).write_text(json.dumps(results, indent=1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
