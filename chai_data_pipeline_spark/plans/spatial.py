"""Spatial operators: grid-bucketed nearest-neighbor join.

The classic way to make a spatial NN join scale is to snap points to a
grid and join only a cell with its 8 neighbors — candidate generation
becomes an equi-join on cell ids (shuffle-partitionable, never an
all-pairs cross join), exactly like the LSH/IVF bucketing used for
embeddings in operators/similarity.py but in 2-D coordinate space.

Coordinates are synthesized deterministically from sha256 of the keys
(the testdata has no geo columns): 13 hex chars = 52 bits → an exact
dyadic fraction in [0,1), bit-identical in both engines. Distances are
identical single expressions per candidate pair, so comparisons and
the (dist2, key) tiebreak order match across engines with no rounding
tricks needed.

Semantics note (mirrored in the oracle): the result is the nearest
supplier within the 3×3 neighborhood — the grid-bounded NN, which is
what a production system computes with a grid sized to the distance
cutoff. Customers whose neighborhood holds no supplier drop out.

Reference analog: none — LLM-pipeline/analytics extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import dround, sql_dround
from ..session import load_tables
from .registry import query

_GRID = 8  # cells per axis
_DENOM = float(1 << 52)  # 13 hex chars = 52 bits


def _coord(prefix: str, key: str):
    h = F.sha2(F.concat(F.lit(prefix), F.col(key).cast("string")), 256)
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint") / F.lit(_DENOM)


def _sql_coord(prefix: str, key: str) -> str:
    return (
        f"(CAST(concat('0x', substring(sha256('{prefix}' || CAST({key} AS VARCHAR)),"
        f" 1, 13)) AS BIGINT) / {_DENOM})"
    )


@query(
    "grid_nearest_supplier",
    oracle=f"""
WITH cust AS (
    SELECT c_custkey, {_sql_coord('cx', 'c_custkey')} AS x,
           {_sql_coord('cy', 'c_custkey')} AS y
    FROM customer
),
supp AS (
    SELECT s_suppkey, {_sql_coord('sx', 's_suppkey')} AS x,
           {_sql_coord('sy', 's_suppkey')} AS y,
           CAST(FLOOR({_sql_coord('sx', 's_suppkey')} * {_GRID}) AS BIGINT) AS cx,
           CAST(FLOOR({_sql_coord('sy', 's_suppkey')} * {_GRID}) AS BIGINT) AS cy
    FROM supplier
),
probes AS (
    SELECT c.c_custkey, c.x, c.y,
           CAST(FLOOR(c.x * {_GRID}) AS BIGINT) + d1.dx AS px,
           CAST(FLOOR(c.y * {_GRID}) AS BIGINT) + d2.dy AS py
    FROM cust c
    CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) d1
    CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) d2
    WHERE CAST(FLOOR(c.x * {_GRID}) AS BIGINT) + d1.dx BETWEEN 0 AND {_GRID - 1}
      AND CAST(FLOOR(c.y * {_GRID}) AS BIGINT) + d2.dy BETWEEN 0 AND {_GRID - 1}
),
cand AS (
    SELECT p.c_custkey, s.s_suppkey,
           (p.x - s.x) * (p.x - s.x) + (p.y - s.y) * (p.y - s.y) AS dist2
    FROM probes p JOIN supp s ON s.cx = p.px AND s.cy = p.py
),
ranked AS (
    SELECT c_custkey, s_suppkey, dist2,
           COUNT(*) OVER (PARTITION BY c_custkey) AS n_candidates,
           ROW_NUMBER() OVER (
               PARTITION BY c_custkey ORDER BY dist2, s_suppkey
           ) AS rn
    FROM cand
)
SELECT c_custkey, s_suppkey AS nearest_suppkey,
       {sql_dround('dist2', 8)} AS dist2, n_candidates
FROM ranked WHERE rn = 1
""",
)
def grid_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier per customer via a 3×3 grid-neighborhood join.

    Scale: candidates come from an equi-join on cell ids — fan-out is
    9 probes per point and ~|suppliers|/cells matches per probe, so
    the join cost is (9/ cells)·|C|·|S| instead of |C|·|S|; at larger
    scale the grid refines (cells ∝ point count) keeping per-cell
    occupancy constant. The argmin window partitions by customer — no
    global sort. This is IVF/LSH bucketing specialized to metric space.
    """
    t = load_tables(spark, sf_dir, "customer", "supplier")
    cust = t["customer"].select(
        "c_custkey",
        _coord("cx", "c_custkey").alias("x"),
        _coord("cy", "c_custkey").alias("y"),
    )
    supp = t["supplier"].select(
        "s_suppkey",
        _coord("sx", "s_suppkey").alias("x"),
        _coord("sy", "s_suppkey").alias("y"),
    ).select(
        "s_suppkey",
        "x",
        "y",
        F.floor(F.col("x") * _GRID).cast("bigint").alias("cx"),
        F.floor(F.col("y") * _GRID).cast("bigint").alias("cy"),
    )
    # 9-offset fan-out as a map-side array explode (zero join nodes —
    # a broadcast cross join would plan a BroadcastNestedLoopJoin)
    offsets = F.expr(
        "explode(array("
        + ", ".join(
            f"struct(CAST({dx} AS BIGINT) AS dx, CAST({dy} AS BIGINT) AS dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    probes = (
        cust.select("c_custkey", "x", "y", offsets.alias("o"))
        .select("c_custkey", "x", "y", "o.dx", "o.dy")
        .select(
            "c_custkey",
            "x",
            "y",
            (F.floor(F.col("x") * _GRID).cast("bigint") + F.col("dx")).alias("px"),
            (F.floor(F.col("y") * _GRID).cast("bigint") + F.col("dy")).alias("py"),
        )
        .filter(
            F.col("px").between(0, _GRID - 1) & F.col("py").between(0, _GRID - 1)
        )
    )
    s = supp.select(
        "s_suppkey",
        F.col("x").alias("sx_"),
        F.col("y").alias("sy_"),
        F.col("cx").alias("px"),
        F.col("cy").alias("py"),
    )
    dist2 = (F.col("x") - F.col("sx_")) * (F.col("x") - F.col("sx_")) + (
        F.col("y") - F.col("sy_")
    ) * (F.col("y") - F.col("sy_"))
    cand = probes.join(s, ["px", "py"]).select(
        "c_custkey", "s_suppkey", dist2.alias("dist2")
    )
    w = Window.partitionBy("c_custkey")
    ranked = cand.select(
        "c_custkey",
        "s_suppkey",
        "dist2",
        F.count("*").over(w).alias("n_candidates"),
        F.row_number().over(w.orderBy("dist2", "s_suppkey")).alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "c_custkey",
        F.col("s_suppkey").alias("nearest_suppkey"),
        dround("dist2", 8).alias("dist2"),
        "n_candidates",
    )
