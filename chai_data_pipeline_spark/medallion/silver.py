"""Silver layer: cleansing + enrichment as pure DataFrame→DataFrame
functions (reference: scripts/silver/transform_silver.py — which does
this row-by-row with iterrows/apply; ours is all column expressions, so
the same logic is vectorized, codegen'd, and scale-free).

Determinism decisions (SURVEY §7.4):
- dedup keeps an explicit survivor (min data_hash per key), not
  "whatever pandas saw first" (transform_silver.py:232,354);
- covid window derivations partition by (country, province) — the
  reference diffs interleaved province rows within a country
  (transform_silver.py:312-314), a latent bug we fix and document;
- processing_timestamp is injected (``asof``) so runs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import dround
from ..operators import text as TX
from ..operators.dedup import dedup_by_key
from ..operators.windows import grouped_diff, rolling_mean

EMAIL_RE = r"(?i)^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def transform_users(bronze_users: DataFrame, asof: str) -> DataFrame:
    """users bronze → clean_users (reference: transform_silver.py:144-257).

    Email/phone normalization + validation, nested address/company
    projection with typed geo casts, per-row quality score, dedup by
    user_id with deterministic survivor.
    """
    df = bronze_users
    email_norm = F.lower(F.trim("email"))
    digits = F.regexp_replace("phone", "[^0-9]", "")
    quality = (
        F.lit(100)
        - F.when(~email_norm.rlike(EMAIL_RE), 30).otherwise(0)
        - F.when(F.length(digits) < 7, 20).otherwise(0)
        - F.when(F.col("address.city").isNull(), 10).otherwise(0)
        - F.when(F.col("company.name").isNull(), 10).otherwise(0)
    )
    cleaned = df.select(
        F.col("id").alias("user_id"),
        F.trim("name").alias("name"),
        F.col("username"),
        email_norm.alias("email"),
        email_norm.rlike(EMAIL_RE).alias("email_valid"),
        F.when(
            email_norm.contains("@"), F.substring_index(email_norm, "@", -1)
        ).alias("email_domain"),
        F.length(F.trim("name")).alias("name_length"),
        F.col("phone"),
        digits.alias("formatted_phone"),
        (F.length(digits) >= 7).alias("phone_valid"),
        F.col("website"),
        F.col("address.street").alias("street"),
        F.col("address.suite").alias("suite"),
        F.col("address.city").alias("city"),
        F.col("address.zipcode").alias("zipcode"),
        F.coalesce(F.col("address.geo.lat").cast("double"), F.lit(0.0)).alias(
            "latitude"
        ),
        F.coalesce(F.col("address.geo.lng").cast("double"), F.lit(0.0)).alias(
            "longitude"
        ),
        F.col("company.name").alias("company_name"),
        F.col("company.catchPhrase").alias("company_catchphrase"),
        F.col("company.bs").alias("company_bs"),
        quality.cast("int").alias("data_quality_score"),
        F.lit(asof).cast("timestamp").alias("processing_timestamp"),
        F.col("data_hash"),
    )
    return dedup_by_key(cleaned, ["user_id"], ["data_hash"]).drop("data_hash")


def transform_posts(bronze_posts: DataFrame, asof: str) -> DataFrame:
    """posts bronze → clean_posts — the reference DECLARES this table
    (transform_silver.py:82-95) but never populates it; this implements
    the declared spec (SURVEY §2.12): lengths, word stats, link
    detection, lexicon sentiment."""
    df = bronze_posts
    return df.select(
        "post_id",
        "user_id",
        F.col("title"),
        F.col("body"),
        F.length("title").alias("title_length"),
        F.length("body").alias("body_length"),
        TX.word_count("body").alias("word_count"),
        F.round(TX.avg_word_length("body"), 4).alias("avg_word_length"),
        TX.has_links("body").alias("has_links"),
        F.round(TX.sentiment_score("body"), 4).alias("sentiment_score"),
        F.lit(asof).cast("timestamp").alias("processing_timestamp"),
    )


def transform_covid(bronze_covid: DataFrame, asof: str) -> DataFrame:
    """covid bronze → clean_covid (reference: transform_silver.py:259-370).

    Rates, active cases, per-series daily deltas + 7-day rolling mean,
    outlier flag. Windows partition by (country, province) — per-series
    semantics; the oracle/gold layers aggregate back to country level.
    """
    df = bronze_covid.select(
        F.col("date").alias("record_date"),
        "country",
        "province",
        "confirmed",
        "recovered",
        "deaths",
    ).dropDuplicates(["record_date", "country", "province"])

    df = df.withColumn(
        "active_cases",
        F.greatest(
            F.lit(0),
            F.col("confirmed") - F.col("recovered") - F.col("deaths"),
        ),
    ).withColumn(
        # dround (floor(x*100+0.5)/100) instead of F.round: the rate
        # feeds the oracle-hashed covid_global_summary averages, and
        # Spark/DuckDB round() diverge on x.xx5 boundaries
        # (functions/numeric.py SCALE RULE).
        "mortality_rate",
        F.when(
            F.col("confirmed") > 0,
            dround(
                F.col("deaths").cast("double")
                * 100
                / F.col("confirmed"),
                2,
            ),
        ).otherwise(0.0),
    ).withColumn(
        "recovery_rate",
        F.when(
            F.col("confirmed") > 0,
            dround(
                F.col("recovered").cast("double")
                * 100
                / F.col("confirmed"),
                2,
            ),
        ).otherwise(0.0),
    )

    series = ["country", "province"]
    order = ["record_date"]
    df = grouped_diff(df, series, order, "confirmed", "daily_new_cases")
    df = grouped_diff(df, series, order, "deaths", "daily_new_deaths")
    df = rolling_mean(df, series, order, "daily_new_cases", "weekly_avg_cases", 7)
    df = df.withColumn("weekly_avg_cases", F.round("weekly_avg_cases", 2))

    # outlier: negative daily delta (cumulative went down) or a spike
    # >5x the trailing weekly average
    df = df.withColumn(
        "outlier_flag",
        (F.col("daily_new_cases") < 0)
        | (
            (F.col("weekly_avg_cases") > 0)
            & (F.col("daily_new_cases") > 5 * F.col("weekly_avg_cases"))
        ),
    )
    return df.withColumn(
        "processing_timestamp", F.lit(asof).cast("timestamp")
    )


def transform_telco(bronze_telco: DataFrame, asof: str) -> DataFrame:
    """Generic-path silver: typed telco churn table with tenure buckets
    (proves the schema-agnostic bronze→silver path, SURVEY §2.12)."""
    df = bronze_telco
    return df.select(
        F.col("customerid").alias("customer_id"),
        "gender",
        F.col("seniorcitizen").alias("senior_citizen"),
        "tenure",
        F.col("monthlycharges").alias("monthly_charges"),
        F.coalesce(F.col("totalcharges"), F.lit(0.0)).alias("total_charges"),
        (F.col("churn") == "Yes").alias("churned"),
        F.when(F.col("tenure") < 12, "0-1y")
        .when(F.col("tenure") < 36, "1-3y")
        .otherwise("3y+")
        .alias("tenure_bucket"),
        F.lit(asof).cast("timestamp").alias("processing_timestamp"),
    )
