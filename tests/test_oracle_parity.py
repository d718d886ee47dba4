"""DuckDB-differential parity tests — one per registered oracle query.

Mirrors the driver's correctness gate (row-count + schema +
order-insensitive values) at sf0.001 so every registered operator is
validated locally before the driver's sf0.01 run.
"""

from __future__ import annotations

import pytest

from chai_data_pipeline_spark import plans
from chai_data_pipeline_spark.testing import compare_query, parity_selection


def _oracle_names():
    # SPARK_GRAFT_PARITY_CHANGED=1 restricts to queries whose plan
    # module changed vs git base — the <10-min inner dev loop; the
    # full sweep (env unset) stays the pre-gate rehearsal standard.
    return parity_selection(sorted(plans.ORACLES))


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


@pytest.mark.parametrize(
    "name", ["range_window_trailing_7d", "flagship_daily_event_trends"]
)
def test_tz_independent_under_dst_session(spark, duck, sf_dir, name):
    """The external driver's session is vanilla (host-default tz).
    Date bucketing and range frames over the events instant column
    must not follow a DST session zone — load_tables pins UTC at read
    time (CLAUDE.md contract), which this test exercises by starting
    from America/New_York."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        res = compare_query(
            spark, duck, name, plans.QUERIES[name], plans.ORACLES[name], sf_dir
        )
        assert res.ok, res.detail
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
