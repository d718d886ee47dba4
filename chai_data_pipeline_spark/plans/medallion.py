"""Driver-checkable medallion-pipeline summary.

The bronze/silver surface (REST/CSV/JSON sources, filename routing,
encoding fallback, blank→NULL, dedup survivors — SURVEY §2.1/§2.2) was
previously covered only by golden/unit tests. This query runs the REAL
bronze→silver path over the checked-in fixture landing dir and reduces
it to a deterministic (dataset, n_rows) summary; the DuckDB oracle
re-reads the same fixture files with read_json_auto/read_csv and
re-derives the same counts in plain SQL — so file routing, JSON
list-form parsing, CSV header handling, the users dedup survivor
count, and the email-validation regex all land under the driver's
value-hash gate.

The telco latin-1 CSV (the S5 encoding-fallback fixture) is excluded:
this DuckDB build has no CSV encoding option, so it cannot read the
file at all — telco stays covered by tests/test_medallion.py.

Reference: orchestration/medallion_pipeline.py:180-237 (run_pipeline),
scripts/bronze/load_bronze.py:381-423 (routing + per-dataset loads),
scripts/silver/transform_silver.py:144-257 (users cleanse/dedup).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import AS_OF, query

_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)

# silver.EMAIL_RE, shared verbatim by the oracle (RE2 and Java agree on
# this ASCII-class pattern; anchors make partial-match == full-match)
_EMAIL_RE = r"(?i)^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


@query(
    "medallion_pipeline_summary",
    oracle=f"""
SELECT 'bronze_users' AS dataset, COUNT(*) AS n_rows
FROM read_json_auto('{_FIXTURES}/users_*.json')
UNION ALL
SELECT 'bronze_posts', COUNT(*)
FROM read_json_auto('{_FIXTURES}/posts_*.json')
UNION ALL
SELECT 'bronze_covid', COUNT(*)
FROM read_csv('{_FIXTURES}/covid_*.csv', header=true)
UNION ALL
SELECT 'silver_users',
       -- dedup_by_key keeps a survivor row for a NULL-id group too;
       -- COUNT(DISTINCT id) alone ignores NULLs, so add the NULL-id
       -- group back explicitly (fixture currently has none — the
       -- oracle must not depend on that)
       COUNT(DISTINCT id)
         + CAST(COUNT(*) FILTER (WHERE id IS NULL) > 0 AS BIGINT)
FROM read_json_auto('{_FIXTURES}/users_*.json')
UNION ALL
SELECT 'users_valid_email',
       COUNT(*) FILTER (
           WHERE regexp_matches(lower(trim(email)), '{_EMAIL_RE}'))
FROM read_json_auto('{_FIXTURES}/users_*.json')
""",
)
def medallion_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze→silver over the fixture landing dir, reduced to counts.

    ``sf_dir`` is unused (the medallion surface has its own landing
    files); the fixture dir resolves relative to the repo so the query
    runs from any CWD. All counts are tiny aggregates — the unioned
    result is 5 rows regardless of input size.
    """
    from ..medallion.bronze import load_bronze
    from ..medallion.silver import EMAIL_RE, transform_users

    br = load_bronze(spark, _FIXTURES)
    users = br.tables["users"]
    clean = transform_users(users, AS_OF)

    def _one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("dataset"), F.count("*").alias("n_rows")
        )

    valid = users.agg(
        F.lit("users_valid_email").alias("dataset"),
        F.count_if(
            F.lower(F.trim("email")).rlike(EMAIL_RE)
        ).alias("n_rows"),
    )
    out = (
        _one("bronze_users", users)
        .unionByName(_one("bronze_posts", br.tables["posts"]))
        .unionByName(_one("bronze_covid", br.tables["covid"]))
        .unionByName(_one("silver_users", clean))
        .unionByName(valid)
    )
    return out
