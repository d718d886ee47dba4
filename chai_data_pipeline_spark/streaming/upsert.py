"""Streaming foreachBatch upsert — the production CDC-apply sink.

The pattern every streaming lakehouse pipeline runs: each micro-batch
reduces to one row per key, then MERGEs into the target table. Because
the merge is idempotent (latest-by-event-time wins, not
latest-by-arrival), an at-least-once source redelivering records yields
EXACTLY-ONCE state — the delivery guarantee is recovered at the sink,
not assumed from the transport. The test harness stages the same events
file twice with maxFilesPerTrigger=1, so the merge genuinely runs
across multiple micro-batches including a full redelivery.

Scale posture: per batch, one (key)-shuffle to pick the batch-latest
row and one copy-on-write merge (at 100 TB: a table-format MERGE whose
rewrite cost is bounded by touched files — see writers.merge_into's
docstring). State lives in the TARGET TABLE, not the state store, so
the streaming query itself is stateless and restarts are cheap.

No reference analog (the reference's closest is the pending-flag
micro-batch pattern, scripts/silver/transform_silver.py:251-257 —
re-validated rows overwrite by key); this is that idea made a real
streaming sink.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def streaming_upsert_latest(
    spark: SparkSession,
    sf_dir: str,
    keys: tuple[str, ...] = ("user_id",),
    on_batch=None,
) -> DataFrame:
    """Run an events stream through a foreachBatch idempotent upsert;
    return the final target state (latest event per key) as a batch
    DataFrame. Same bounded-temp-dir discipline as run_streaming_query:
    one live result per process, anchored cleanup glob."""
    from ..sources.writers import atomic_replace
    from .windows import _events_stream, stream_scratch_dir

    base = "chai_stream_upsert"
    # Sweep covers the live dirs AND a crashed merge_into's debris
    # (target__old_<hex>, target__merge_<hex>, target__merge_marker) —
    # without the extra alternatives those leaked in /tmp forever. Any
    # matched target is first run through recover_merge so a marker-file
    # crash state resolves to a consistent dir before removal.
    from ..sources.writers import recover_merge, remove_path

    stale_re = re.compile(
        rf"{base}_[0-9a-f]{{8}}"
        rf"(_chk|__old_[0-9a-f]+|__merge_[0-9a-f]+|__merge_marker)?$"
    )
    for stale in glob.glob(os.path.join(stream_scratch_dir(), f"{base}_*")):
        name = os.path.basename(stale)
        if stale_re.search(name):
            if re.fullmatch(rf"{base}_[0-9a-f]{{8}}", name):
                try:
                    recover_merge(stale)
                except Exception:
                    pass
            # remove_path, not rmtree: the __merge_marker match is a
            # FILE and rmtree silently no-ops on files
            remove_path(stale)
    target = os.path.join(
        stream_scratch_dir(), f"{base}_{uuid.uuid4().hex[:8]}"
    )

    ev = _events_stream(
        spark, sf_dir, duplicate_delivery=True, max_files_per_trigger=1
    )

    key_list = list(keys)

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_id)
        # latest per key by EVENT TIME (ts, event_id tiebreak) across
        # target ∪ batch — arrival order never decides, so a redelivered
        # or out-of-order batch can only re-derive the same state, never
        # regress it. (A plain source-wins merge would let a late batch
        # clobber newer state.)
        sp = bdf.sparkSession
        cand = bdf
        if os.path.exists(target):
            cand = sp.read.parquet(target).unionByName(bdf)
        w = Window.partitionBy(*key_list).orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        latest = (
            cand.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # `latest` IS the complete new table state (it derives from
        # target ∪ batch, so it covers every existing key) — commit it
        # directly; merge_into here would re-read the target and pay a
        # second, redundant key-upsert shuffle before the same swap.
        atomic_replace(target, latest)

    # Pin the per-batch shuffle width for the stream's lifetime (same
    # rationale as run_streaming_query's state_partitions): the window
    # and checkpoint shuffles are keyed on user_id at table grain, and a
    # vanilla session's 200 partitions are pure task-launch overhead at
    # this state volume. Production sizes this to target-table volume.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            ev.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", target + "_chk")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    from ..functions import dround

    final = spark.read.parquet(target)
    # project the driver-facing shape: no instant-typed ts in the
    # output (collect would convert via the host OS zone)
    return final.select(
        "user_id",
        "event_id",
        "event_type",
        dround("value", 4).alias("value"),
    )
