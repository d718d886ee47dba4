"""chai_api Python DataSource: partition-parallel JSON endpoint reads."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _write_endpoint(tmp_path, name, payload):
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return f"file://{p}"


def test_api_source_reads_endpoints_in_parallel(spark, tmp_path):
    from chai_data_pipeline_spark.sources.api_source import register_api_source

    u1 = _write_endpoint(
        tmp_path, "list.json", [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
    )
    u2 = _write_endpoint(tmp_path, "object.json", {"id": 3, "v": "c"})

    register_api_source(spark)
    df = (
        spark.read.format("chai_api")
        .option("urls", f"{u1},{u2}")
        .load()
    )
    # one partition per endpoint (parallel fetch)
    assert df.rdd.getNumPartitions() == 2
    rows = df.collect()
    assert len(rows) == 3  # list-or-object contract
    assert {r.endpoint for r in rows} == {u1, u2}

    # raw_data round-trips through from_json with an explicit schema —
    # the bronze parsing convention
    parsed = df.select(
        F.from_json("raw_data", "id int, v string").alias("j")
    ).select("j.id", "j.v")
    got = {(r.id, r.v) for r in parsed.collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_api_source_requires_urls(spark):
    import pytest as _pytest

    from chai_data_pipeline_spark.sources.api_source import register_api_source

    register_api_source(spark)
    with _pytest.raises(Exception):
        spark.read.format("chai_api").load().collect()


def test_api_stream_reader_incremental_offsets(spark, tmp_path):
    """Streaming reads are incremental: records appended to the
    endpoint between micro-batches arrive exactly once (offset = count
    already emitted)."""
    p = tmp_path / "feed.json"
    p.write_text(json.dumps([{"id": 1}, {"id": 2}]))
    url = f"file://{p}"

    from chai_data_pipeline_spark.sources.api_source import register_api_source

    register_api_source(spark)
    chk = str(tmp_path / "chk")
    q = (
        spark.readStream.format("chai_api")
        .option("urls", url)
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_api_stream")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.table("t_api_stream").count()
        assert first == 2
        # append one record; next batch must emit ONLY the new one
        p.write_text(json.dumps([{"id": 1}, {"id": 2}, {"id": 3}]))
        q.processAllAvailable()
        rows = spark.table("t_api_stream").collect()
    finally:
        q.stop()
    assert len(rows) == 3
    ids = sorted(json.loads(r.raw_data)["id"] for r in rows)
    assert ids == [1, 2, 3]
