"""REST/JSON API source as a Spark 4 Python DataSource — the
partition-parallel modernization of SURVEY §2.1 S1.

The reference fetches API JSON on the DRIVER and lands files
(reference: scripts/bronze/ingest_bronze.py:56-103); the medallion
bronze layer mirrors that landing flow (medallion/bronze.land_url).
This source instead registers ``chai_api`` with Spark's DataSource V2
Python API: each endpoint URL becomes an InputPartition, so fetches run
ON EXECUTORS in parallel — N endpoints scan like an N-file directory,
with retries/backoff local to each task. At scale this is how API
backfills actually parallelize (per-page / per-shard endpoint lists).

Rows come back as (endpoint, raw_data-json) exactly like the bronze
raw-keeping convention (S3); downstream parses with ``from_json`` +
an explicit schema.

Worker-shipping: the DataSource class is built INSIDE a factory
function, so cloudpickle serializes it by value — executors never need
this repo on their import path (same rule as every pandas-UDF closure
here, pinned by tests/test_worker_shipping.py conventions).

``urllib`` handles ``http(s)://`` and ``file://`` alike; tests use
``file://`` endpoints (no network in the test environment), which
exercises the identical partition/fetch/parse path.
"""

from __future__ import annotations


def make_api_datasource():
    """Build the ``chai_api`` DataSource class (closure-shipped)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _Endpoint(InputPartition):
        def __init__(self, url: str):
            self.url = url

    class _ApiReader(DataSourceReader):
        def __init__(self, options):
            urls = options.get("urls", "")
            self._urls = [u.strip() for u in urls.split(",") if u.strip()]
            if not self._urls:
                raise ValueError(
                    "chai_api source requires option 'urls' "
                    "(comma-separated endpoint list)"
                )

        def partitions(self):
            # one partition per endpoint -> parallel fetch on executors
            return [_Endpoint(u) for u in self._urls]

        def read(self, partition):
            import json as _json
            from urllib.request import urlopen

            with urlopen(partition.url) as resp:
                data = _json.loads(resp.read().decode("utf-8"))
            # list-or-object contract, same as sources/readers.read_json
            if isinstance(data, dict):
                data = [data]
            for rec in data:
                yield (partition.url, _json.dumps(rec, sort_keys=True))

    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class _ApiStreamReader(SimpleDataSourceStreamReader):
        """Incremental API polling: the offset is the per-endpoint count
        of records already emitted; each micro-batch re-fetches the
        endpoint and emits only records past its offset — at-least-once
        incremental ingest over an append-only API (the Kafka-less
        landing pattern). Exactly-once on top = the engine's streaming
        dedup (dropDuplicatesWithinWatermark) keyed on a record id."""

        def __init__(self, options):
            urls = options.get("urls", "")
            self._urls = [u.strip() for u in urls.split(",") if u.strip()]
            if not self._urls:
                raise ValueError("chai_api stream requires option 'urls'")

        def initialOffset(self):
            return {u: 0 for u in self._urls}

        def _fetch(self, url):
            import json as _json
            from urllib.request import urlopen

            with urlopen(url) as resp:
                data = _json.loads(resp.read().decode("utf-8"))
            return data if isinstance(data, list) else [data]

        def read(self, start):
            import json as _json

            rows = []
            end = dict(start)
            for u in self._urls:
                recs = self._fetch(u)
                seen = int(start.get(u, 0))
                for rec in recs[seen:]:
                    rows.append((u, _json.dumps(rec, sort_keys=True)))
                end[u] = max(seen, len(recs))
            return iter(rows), end

        def readBetweenOffsets(self, start, end):
            import json as _json

            rows = []
            for u in self._urls:
                recs = self._fetch(u)
                lo, hi = int(start.get(u, 0)), int(end.get(u, 0))
                for rec in recs[lo:hi]:
                    rows.append((u, _json.dumps(rec, sort_keys=True)))
            return iter(rows)

    class ChaiApiDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "chai_api"

        def schema(self) -> str:
            return "endpoint string, raw_data string"

        def reader(self, schema):
            return _ApiReader(self.options)

        def simpleStreamReader(self, schema):
            return _ApiStreamReader(self.options)

    return ChaiApiDataSource


def register_api_source(spark) -> None:
    """Register ``chai_api`` on a session: then
    ``spark.read.format("chai_api").option("urls", "u1,u2").load()``."""
    spark.dataSource.register(make_api_datasource())
