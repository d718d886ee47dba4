"""Round-12 invariants: the disabled-no-data-micro-batch fence.

run_streaming_query forces noDataMicroBatches off (r11 fixed-cost cut).
That is safe for every registered topology, but an append-mode WINDOWED
aggregate would silently never emit its trailing windows — the runner
must refuse that topology loudly instead of truncating output.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_append_windowed_aggregate_is_rejected(spark, sf_dir):
    from chai_data_pipeline_spark.streaming.windows import (
        _events_stream,
        run_streaming_query,
    )

    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count("*").alias("n"))
    )
    with pytest.raises(ValueError, match="noDataMicroBatches"):
        run_streaming_query(agg, "r12_trap_probe", output_mode="append")


def test_append_non_aggregate_still_allowed(spark, sf_dir):
    """The fence must not catch the registered append topologies
    (processing-time emitters: stream join, delivery dedup)."""
    from chai_data_pipeline_spark.streaming.windows import (
        _events_stream,
        run_streaming_query,
    )

    stream = _events_stream(spark, sf_dir).select("event_id", "user_id")
    out = run_streaming_query(
        stream, "r12_passthrough_probe", output_mode="append"
    )
    assert out.count() > 0
