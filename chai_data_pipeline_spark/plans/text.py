"""Text-analysis queries over the documents table (LLM-pipeline ops +
the realized clean_posts spec, SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dround, sql_dround
from ..operators import text as T
from ..session import load_tables
from .registry import query

# --------------------------------------------------------------------------
# word/char stats + link detection (clean_posts columns)
# --------------------------------------------------------------------------


_WC = "len(string_split_regex(TRIM(text), '\\s+'))"
_AWL = sql_dround(
    "LENGTH(REGEXP_REPLACE(text, '\\s', '', 'g')) / " + _WC, 4
)
_DWR = sql_dround(
    "len(list_distinct(string_split_regex(TRIM(text), '\\s+'))) * 1.0 / " + _WC,
    4,
)


@query(
    "text_stats",
    oracle=f"""
SELECT doc_id,
       CAST(LENGTH(text) AS INTEGER) AS text_len,
       CAST({_WC} AS INTEGER) AS word_count,
       {_AWL} AS avg_word_length,
       regexp_matches(text, 'https?://') AS has_links,
       {_DWR} AS distinct_word_ratio
FROM documents
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        F.length("text").alias("text_len"),
        T.word_count("text").alias("word_count"),
        dround(T.avg_word_length("text"), 4).alias("avg_word_length"),
        T.has_links("text").alias("has_links"),
        dround(T.distinct_word_ratio("text"), 4).alias("distinct_word_ratio"),
    )


# --------------------------------------------------------------------------
# BPE-ish token counting (regex tokenizer)
# --------------------------------------------------------------------------


@query(
    "token_counts",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{T.TOKEN_PATTERN}')) AS INTEGER)
           AS n_tokens,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_number_tokens
FROM documents
""",
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias(
            "n_number_tokens"
        ),
    )


# --------------------------------------------------------------------------
# language ID (marker-word n-gram heuristic, engine-identical arithmetic)
# --------------------------------------------------------------------------


@query(
    "lang_id",
    oracle=f"""
WITH s AS (
    SELECT doc_id, lang AS labeled_lang,
           {T.lang_scores_sql('text')['en']} AS score_en,
           {T.lang_scores_sql('text')['es']} AS score_es,
           {T.lang_scores_sql('text')['de']} AS score_de,
           {T.lang_scores_sql('text')['fr']} AS score_fr
    FROM documents
)
SELECT doc_id, labeled_lang, score_en, score_es, score_de, score_fr,
       {T.PREDICT_LANG_SQL.format(en='score_en', es='score_es',
                                  de='score_de', fr='score_fr')}
           AS predicted_lang
FROM s
""",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    scores = T.lang_scores("text")
    s = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        scores["en"],
        scores["es"],
        scores["de"],
        scores["fr"],
    )
    return s.withColumn(
        "predicted_lang",
        T.predict_lang(
            F.col("score_en"),
            F.col("score_es"),
            F.col("score_de"),
            F.col("score_fr"),
        ),
    )


# --------------------------------------------------------------------------
# quality scoring (reference F8 penalty-chain shape) + rating bucket
# --------------------------------------------------------------------------


@query(
    "doc_quality_scores",
    oracle="""
WITH q AS (
    SELECT doc_id,
           100
           - CASE WHEN len(string_split_regex(TRIM(text), '\\s+')) < 10
                  THEN 30 ELSE 0 END
           - CASE WHEN n_chars < 80 THEN 20 ELSE 0 END
           - CASE WHEN len(list_distinct(string_split_regex(TRIM(text), '\\s+')))
                       * 1.0 / len(string_split_regex(TRIM(text), '\\s+')) < 0.5
                  THEN 20 ELSE 0 END AS quality_score
    FROM documents
)
SELECT doc_id, CAST(quality_score AS INTEGER) AS quality_score,
       CASE WHEN quality_score >= 90 THEN 'EXCELLENT'
            WHEN quality_score >= 70 THEN 'GOOD'
            WHEN quality_score >= 50 THEN 'FAIR'
            ELSE 'POOR' END AS quality_rating
FROM q
""",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    score = T.quality_score("text", "n_chars")
    return docs.select(
        "doc_id",
        score.cast("int").alias("quality_score"),
        T.quality_rating(score).alias("quality_rating"),
    )


# --------------------------------------------------------------------------
# sentiment (lexicon hits; the reference declares sentiment_score on
# clean_posts but never populates it — transform_silver.py:89)
# --------------------------------------------------------------------------


_SENT = sql_dround(
    T.sentiment_score_sql("text") + " * 1.0 / " + _WC, 4
)


@query(
    "doc_sentiment",
    oracle=f"""
SELECT doc_id,
       {_SENT} AS sentiment_score
FROM documents
""",
)
def doc_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        dround(T.sentiment_score("text"), 4).alias("sentiment_score"),
    )


# --------------------------------------------------------------------------
# document fingerprinting (normalized content hash)
# --------------------------------------------------------------------------


@query(
    "doc_fingerprints",
    oracle="""
SELECT doc_id,
       SUBSTRING(sha256(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))), 1, 16)
           AS fingerprint
FROM documents
""",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return docs.select(
        "doc_id", F.substring(F.sha2(norm, 256), 1, 16).alias("fingerprint")
    )
