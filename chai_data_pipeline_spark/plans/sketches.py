"""Hash-checked frequency sketches.

``cms_heavy_hitters_checked`` completes the checked-sketch family
(MinHash, SimHash, LSH, IVF, PQ, k-means, HLL — see dedup.py,
similarity.py, advanced.py) with a Count-Min sketch: the workhorse
structure for approximate per-key frequency at 100-TB scale, where a
full per-key GROUP BY may be too wide to materialize but a (depth ×
width) table of counters always fits in memory.

Like the HLL twin, every hash is derived from sha256 so Spark and the
DuckDB oracle build bit-identical counter tables — the driver's value
hash then proves the sketch math end-to-end, not just "rows came back":

- counter update is a map-side-combinable integer aggregation over
  (depth, bucket) — 4×512 cells regardless of key cardinality;
- the point query for a key is ``min`` over its 4 cells, which
  upper-bounds the true count (CMS guarantee — surfaced as the
  always-non-negative ``overestimate`` column);
- candidate keys come from an exact top-k (TakeOrdered, no full sort);
  in production the candidate stream would be the keys themselves.

Reference analog: none (the reference has no sketches) — this extends
SURVEY §2's aggregation family for the LLM-pipeline scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from .registry import query

_CMS_W = 512  # buckets per row
_CMS_D = 4  # independent hash rows
_CMS_TOPK = 20


def _cms_bucket_cols(key):
    """The _CMS_D bucket indices of a key: disjoint 8-hex-char (32-bit)
    slices of one sha256, reduced mod the width."""
    hexh = F.sha2(key.cast("string"), 256)
    return [
        (F.conv(F.substring(hexh, 1 + 8 * j, 8), 16, 10).cast("bigint") % _CMS_W).alias(
            f"b{j}"
        )
        for j in range(_CMS_D)
    ]


def _sql_bucket(j: int) -> str:
    return (
        f"(CAST(concat('0x', substring(sha256(CAST(user_id AS VARCHAR)), "
        f"{1 + 8 * j}, 8)) AS BIGINT) % {_CMS_W})"
    )


@query(
    "cms_heavy_hitters_checked",
    oracle=f"""
WITH h AS (
    SELECT {_sql_bucket(0)} AS b0, {_sql_bucket(1)} AS b1,
           {_sql_bucket(2)} AS b2, {_sql_bucket(3)} AS b3
    FROM events
),
cells AS (
              SELECT 0 AS depth, b0 AS bucket, COUNT(*) AS c FROM h GROUP BY 2
    UNION ALL SELECT 1, b1, COUNT(*) FROM h GROUP BY 2
    UNION ALL SELECT 2, b2, COUNT(*) FROM h GROUP BY 2
    UNION ALL SELECT 3, b3, COUNT(*) FROM h GROUP BY 2
),
top AS (
    SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY 1
    ORDER BY n_exact DESC, user_id LIMIT {_CMS_TOPK}
),
th AS (
    SELECT user_id, n_exact,
           {_sql_bucket(0)} AS b0, {_sql_bucket(1)} AS b1,
           {_sql_bucket(2)} AS b2, {_sql_bucket(3)} AS b3
    FROM top
),
probes AS (
              SELECT user_id, n_exact, 0 AS depth, b0 AS bucket FROM th
    UNION ALL SELECT user_id, n_exact, 1, b1 FROM th
    UNION ALL SELECT user_id, n_exact, 2, b2 FROM th
    UNION ALL SELECT user_id, n_exact, 3, b3 FROM th
)
SELECT p.user_id, p.n_exact,
       MIN(c.c) AS cms_estimate,
       MIN(c.c) - p.n_exact AS overestimate
FROM probes p JOIN cells c ON c.depth = p.depth AND c.bucket = p.bucket
GROUP BY 1, 2
""",
)
def cms_heavy_hitters_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point queries vs exact counts for the top-20 keys.

    Scale: the sketch build is one narrow projection + a GROUP BY over
    at most depth×width = 2048 cells (map-side combine collapses each
    task's contribution to ≤2048 partials — the shuffle is constant-size
    no matter how many events or distinct users exist). The exact top-k
    side exists only to CHECK the estimates; its TakeOrdered finisher
    never materializes a full sort. The probe join broadcasts 80 rows.
    """
    events = load_tables(spark, sf_dir, "events")["events"]
    h = events.select(*_cms_bucket_cols(F.col("user_id")))
    cells = (
        h.select(
            F.posexplode(F.array(*[F.col(f"b{j}") for j in range(_CMS_D)])).alias(
                "depth", "bucket"
            )
        )
        .groupBy("depth", "bucket")
        .agg(F.count("*").alias("c"))
    )
    top = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), "user_id")
        .limit(_CMS_TOPK)
    )
    probes = top.select(
        "user_id", "n_exact", *_cms_bucket_cols(F.col("user_id"))
    ).select(
        "user_id",
        "n_exact",
        F.posexplode(F.array(*[F.col(f"b{j}") for j in range(_CMS_D)])).alias(
            "depth", "bucket"
        ),
    )
    return (
        F.broadcast(probes)
        .join(cells, ["depth", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "user_id",
            "n_exact",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("n_exact")).alias("overestimate"),
        )
    )
