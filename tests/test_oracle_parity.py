"""DuckDB-differential parity tests — one per registered oracle query.

Mirrors the driver's correctness gate (row-count + schema +
order-insensitive values) at sf0.001 so every registered operator is
validated locally before the driver's sf0.01 run.
"""

from __future__ import annotations

import pytest

from chai_data_pipeline_spark import plans
from chai_data_pipeline_spark.testing import compare_query


def _oracle_names():
    return sorted(plans.ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_parity(spark, duck, sf_dir, name):
    res = compare_query(
        spark, duck, name, plans.QUERIES[name], plans.ORACLES[name], sf_dir
    )
    assert res.ok, f"{name}: {res.detail}"


def test_all_queries_run(spark, sf_dir):
    """Queries without oracles must still run and have a stable schema."""
    for name, fn in sorted(plans.QUERIES.items()):
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "event_date" in df.columns
