"""Arrow/value-class parity for every registered oracle (driver-hash contract).

The driver's value hash is sensitive to the Python type each cell
materializes as (int vs Decimal vs float vs date ...). Round 1 lost two
otherwise-correct queries to DuckDB count_if returning HUGEINT (Arrow
decimal128(38,0)) while Spark returned int64 — invisible to the
value-normalizing compare in testing.compare_query. This sweep catches
any such artifact locally: Spark schema analysis (no job) vs DuckDB
DESCRIBE (no execution), compared at value-class granularity including
decimal scale and instant-vs-naive timestamps.
"""

from __future__ import annotations

import pytest

from chai_data_pipeline_spark import plans
from chai_data_pipeline_spark.testing import (
    oracle_type_mismatches,
    parity_selection,
)


def _oracle_names():
    # see test_oracle_parity._oracle_names — changed-only dev filter
    return parity_selection(sorted(plans.ORACLES))


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_value_classes(spark, duck, sf_dir, name):
    mism = oracle_type_mismatches(
        spark, duck, plans.QUERIES[name], plans.ORACLES[name], sf_dir
    )
    assert not mism, (
        f"{name}: column value-class mismatch (col, spark, duckdb): {mism}"
    )
