"""Explicit StructTypes for every dataset the engine ingests.

The reference coerces inputs into hand-declared Postgres DDL
(reference: scripts/bronze/load_bronze.py:88-152 for bronze tables,
scripts/silver/transform_silver.py:54-130 for silver). Here the same
contract is a StructType per dataset: production readers never use
schema inference — inference is a full extra pass over the data and
nondeterministic under dirty input, both unacceptable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference input datasets (FIXTURES.md §A)
# --------------------------------------------------------------------------

# users — REST-API JSON, nested address/geo/company
# (reference: scripts/bronze/load_bronze.py:223-273 flattens these by hand;
#  we keep the nested struct and let column expressions project it.)
USERS_RAW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("website", T.StringType()),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("street", T.StringType()),
                    T.StructField("suite", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("zipcode", T.StringType()),
                    T.StructField(
                        "geo",
                        T.StructType(
                            [
                                # lat/lng arrive as decimal *strings*; cast in silver
                                T.StructField("lat", T.StringType()),
                                T.StructField("lng", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "company",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("catchPhrase", T.StringType()),
                    T.StructField("bs", T.StringType()),
                ]
            ),
        ),
    ]
)

# posts — REST-API JSON, flat (reference: scripts/bronze/load_bronze.py:244-261)
POSTS_RAW = T.StructType(
    [
        T.StructField("userId", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)

# covid — CSV time series, raw headers renamed on load
# (reference: scripts/bronze/load_bronze.py:338-346). We read the raw
# header names and rename via COVID_RENAME.
COVID_RAW = T.StructType(
    [
        T.StructField("Date", T.StringType()),
        T.StructField("Country/Region", T.StringType()),
        T.StructField("Province/State", T.StringType()),
        T.StructField("Confirmed", T.StringType()),  # blanks → coerce in bronze
        T.StructField("Recovered", T.StringType()),
        T.StructField("Deaths", T.StringType()),
    ]
)

# applied AFTER identifier sanitization (readers.sanitize_identifier
# lowercases and replaces "/" with "_"), so keys are the sanitized forms
COVID_RENAME = {
    "country_region": "country",
    "province_state": "province",
}

# telco — generic CSV path (FIXTURES.md §A4; declared-but-unrouted in the
# reference, SURVEY §2.12). Strings except the four typed columns;
# TotalCharges is double-as-string with blanks → coerced in bronze.
TELCO_RAW = T.StructType(
    [T.StructField(c, T.StringType()) for c in [
        "customerID", "gender", "SeniorCitizen", "Partner", "Dependents",
        "tenure", "PhoneService", "MultipleLines", "InternetService",
        "OnlineSecurity", "OnlineBackup", "DeviceProtection", "TechSupport",
        "StreamingTV", "StreamingMovies", "Contract", "PaperlessBilling",
        "PaymentMethod", "MonthlyCharges", "TotalCharges", "Churn",
    ]]
)

# --------------------------------------------------------------------------
# Silver target schemas (reference: scripts/silver/transform_silver.py:54-130)
# --------------------------------------------------------------------------

CLEAN_USERS = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("email_valid", T.BooleanType()),
        T.StructField("email_domain", T.StringType()),
        T.StructField("name_length", T.IntegerType()),
        T.StructField("phone", T.StringType()),
        T.StructField("formatted_phone", T.StringType()),
        T.StructField("phone_valid", T.BooleanType()),
        T.StructField("website", T.StringType()),
        T.StructField("street", T.StringType()),
        T.StructField("suite", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("zipcode", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("company_name", T.StringType()),
        T.StructField("company_catchphrase", T.StringType()),
        T.StructField("company_bs", T.StringType()),
        T.StructField("data_quality_score", T.IntegerType()),
        T.StructField("processing_timestamp", T.TimestampType()),
    ]
)

CLEAN_POSTS = T.StructType(
    [
        T.StructField("post_id", T.LongType(), False),
        T.StructField("user_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("title_length", T.IntegerType()),
        T.StructField("body_length", T.IntegerType()),
        T.StructField("word_count", T.IntegerType()),
        T.StructField("avg_word_length", T.DoubleType()),
        T.StructField("has_links", T.BooleanType()),
        T.StructField("sentiment_score", T.DoubleType()),
        T.StructField("processing_timestamp", T.TimestampType()),
    ]
)

CLEAN_COVID = T.StructType(
    [
        T.StructField("record_date", T.DateType()),
        T.StructField("country", T.StringType()),
        T.StructField("province", T.StringType()),
        T.StructField("confirmed", T.LongType()),
        T.StructField("recovered", T.LongType()),
        T.StructField("deaths", T.LongType()),
        T.StructField("active_cases", T.LongType()),
        T.StructField("mortality_rate", T.DoubleType()),
        T.StructField("recovery_rate", T.DoubleType()),
        T.StructField("daily_new_cases", T.LongType()),
        T.StructField("daily_new_deaths", T.LongType()),
        T.StructField("weekly_avg_cases", T.DoubleType()),
        T.StructField("outlier_flag", T.BooleanType()),
        T.StructField("processing_timestamp", T.TimestampType()),
    ]
)

# --------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md §B) — for reference;
# parquet is self-describing so these are used only for validation/tests.
# --------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
