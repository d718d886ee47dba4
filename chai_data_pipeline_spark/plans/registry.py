"""Query registry — the driver-contract surface.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is
registered here as a named query: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, an
equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. The driver compares the two by row-count + schema +
order-insensitive value hash.

Determinism rules encoded here (SURVEY §7.4):
- every computed/aggregate column is aliased identically in Spark and SQL;
- every floating-point output is ROUNDed identically on both sides so
  summation-order ulp differences can't flip the value hash;
- every "keep one of the ties" operator has an explicit tiebreak;
- no wall-clock dependence — "as of" timestamps are fixed literals.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a driver-contract query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# Fixed "as of" instant for wall-clock-dependent logic (freshness checks,
# recency predicates). The events table spans Jan-Feb 2024; pinning the
# clock keeps oracle comparison reproducible (SURVEY §7.4.7).
AS_OF = "2024-03-01 00:00:00"
AS_OF_DATE = "2024-03-01"
