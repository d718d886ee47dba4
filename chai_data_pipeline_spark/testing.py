"""Local DuckDB-differential harness.

Mimics the driver's correctness gate: run a registered Spark query and
its oracle SQL over the same parquet tables, then compare row-count,
schema (column names) and an order-insensitive value comparison. Used
by tests/ and by dev iteration; the real gate is the driver's
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession

from .schemas import TESTDATA_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # both sides ROUND in-query; this guards repr noise only
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:  # pragma: no cover
        pass
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


@dataclass
class DiffResult:
    name: str
    rowcount_match: bool
    schema_match: bool
    values_match: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    spark_cols: list[str] = field(default_factory=list)
    oracle_cols: list[str] = field(default_factory=list)
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.rowcount_match and self.schema_match and self.values_match


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    spark_fn,
    oracle: str,
    sf_dir: str,
) -> DiffResult:
    sdf = spark_fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [
        tuple(_norm(r[c]) for c in spark_cols) for r in sdf.collect()
    ]

    rel = con.execute(oracle)
    oracle_cols_raw = [d[0] for d in rel.description]
    order = sorted(range(len(oracle_cols_raw)), key=lambda i: oracle_cols_raw[i])
    oracle_cols = [oracle_cols_raw[i] for i in order]
    oracle_rows = [
        tuple(_norm(row[i]) for i in order) for row in rel.fetchall()
    ]

    res = DiffResult(
        name=name,
        rowcount_match=len(spark_rows) == len(oracle_rows),
        schema_match=spark_cols == oracle_cols,
        values_match=False,
        spark_rows=len(spark_rows),
        oracle_rows=len(oracle_rows),
        spark_cols=spark_cols,
        oracle_cols=oracle_cols,
    )
    if not res.rowcount_match or not res.schema_match:
        res.detail = (
            f"rows spark={res.spark_rows} oracle={res.oracle_rows}; "
            f"cols spark={spark_cols} oracle={oracle_cols}"
        )
        return res

    s_sorted = sorted(spark_rows, key=_sort_key)
    o_sorted = sorted(oracle_rows, key=_sort_key)
    if s_sorted == o_sorted:
        res.values_match = True
    else:
        for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
            if a != b:
                res.detail = f"first diff at sorted row {i}:\n  spark={a}\n  duck ={b}"
                break
    return res
