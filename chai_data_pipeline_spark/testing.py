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


_DUCK_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def spark_value_class(dt) -> str:
    """Canonical value class a Spark column materializes as via Arrow.

    The driver's value hash is sensitive to the PYTHON TYPE of each cell
    (int vs Decimal vs float vs date...), not to physical width. Two
    engines agree iff every column lands in the same class — and, for
    decimals, the same SCALE (str(Decimal('5.00')) != str(Decimal('5.0'))).
    """
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return f"decimal(s={dt.scale})"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.TimestampType):
        # Instant-typed output converts through the HOST OS zone on
        # collect() — banned from the contract surface (CLAUDE.md).
        return "timestamp_instant"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_value_class(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{spark_value_class(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return dt.simpleString()


def duckdb_value_class(type_str: str) -> str:
    """Canonical value class for a DuckDB type string (from DESCRIBE)."""
    t = type_str.strip().upper()
    if t.endswith("[]"):
        return f"list<{duckdb_value_class(t[:-2])}>"
    if t in _DUCK_INT_TYPES:
        return "int"
    if t == "HUGEINT":
        # DuckDB HUGEINT surfaces as Arrow decimal128(38,0) → Python
        # Decimal — hash-mismatches a Spark int64. count_if/SUM(int)
        # produce it; oracles must CAST or use COUNT(*) FILTER.
        return "decimal(s=0)"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        scale = t.rsplit(",", 1)[-1].rstrip(")") if "," in t else "0"
        return f"decimal(s={int(scale)})"
    if t == "BOOLEAN":
        return "bool"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if t in ("BLOB", "BYTEA"):
        return "binary"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP WITH TIME ZONE") or t == "TIMESTAMPTZ":
        return "timestamp_instant"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("STRUCT"):
        return "struct<...>"  # compared loosely; no struct outputs today
    return t


def oracle_type_mismatches(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    spark_fn,
    oracle: str,
    sf_dir: str,
) -> list[tuple[str, str, str]]:
    """(column, spark_class, duck_class) for every class-level mismatch.

    Spark side is pure schema analysis (no job); DuckDB side uses
    DESCRIBE (no execution). Catches oracle type artifacts (e.g. DuckDB
    count_if → HUGEINT → Decimal vs Spark int64) locally, before the
    driver's type-sensitive value hash sees them.
    """
    sdf = spark_fn(spark, sf_dir)
    spark_classes = {f.name: spark_value_class(f.dataType) for f in sdf.schema.fields}
    duck_classes = {
        row[0]: duckdb_value_class(row[1])
        for row in con.execute(f"DESCRIBE {oracle}").fetchall()
    }
    out = []
    for col in sorted(set(spark_classes) | set(duck_classes)):
        s, d = spark_classes.get(col, "<missing>"), duck_classes.get(col, "<missing>")
        if s != d:
            out.append((col, s, d))
    return out


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


def parity_selection(names):
    """Changed-only filter for the registry-parametrized parity/type
    suites (VERDICT r8 item 6: the full gate grew past 18 min and
    scales with every registered query).

    Default (env unset): return ``names`` unchanged — the full sweep.
    With ``SPARK_GRAFT_PARITY_CHANGED=1``: restrict to queries whose
    defining ``plans/<module>.py`` differs from the git base
    (``SPARK_GRAFT_PARITY_BASE``, default HEAD — i.e. uncommitted
    work), plus untracked plan modules. Conservative fallbacks:

    - any changed package file OUTSIDE plans/ (operators, functions,
      session, testing, medallion, streaming, sources) → full sweep,
      since every query may depend on shared code;
    - git unavailable / not a repo → full sweep.

    The full sweep remains the standard for the pre-gate rehearsal
    (.claude/skills/verify) — this filter is for the inner dev loop.
    """
    import subprocess

    if os.environ.get("SPARK_GRAFT_PARITY_CHANGED") != "1":
        return names
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.environ.get("SPARK_GRAFT_PARITY_BASE", "HEAD")
    try:
        diff = subprocess.run(
            ["git", "diff", "--name-only", base],
            cwd=repo, capture_output=True, text=True, check=True,
        ).stdout.splitlines()
        untracked = subprocess.run(
            ["git", "ls-files", "--others", "--exclude-standard"],
            cwd=repo, capture_output=True, text=True, check=True,
        ).stdout.splitlines()
    except (OSError, subprocess.CalledProcessError):
        return names
    pkg = "chai_data_pipeline_spark/"
    plans_prefix = pkg + "plans/"
    changed_mods = set()
    for path in diff + untracked:
        if not path.startswith(pkg) or not path.endswith(".py"):
            continue
        if path.startswith(plans_prefix):
            mod = os.path.basename(path)[:-3]
            if mod not in ("__init__", "registry"):
                changed_mods.add(mod)
                continue
        # shared package code changed — every query is suspect
        return names
    from . import plans as _plans

    return [
        n
        for n in names
        if _plans.QUERIES[n].__module__.rsplit(".", 1)[-1] in changed_mods
    ]
