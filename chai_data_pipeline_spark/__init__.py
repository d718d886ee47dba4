"""chai_data_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first implementation of the query and
data-processing capabilities of the reference medallion pipeline
(mahamealfred/chai-data-pipeline), plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale.

Layout:
    session.py    SparkSession factory (AQE, UTC, Arrow, sane shuffle conf)
    schemas.py    explicit StructTypes for all datasets (no inference in prod)
    sources/      readers (json/csv/parquet, encoding fallback, audit cols)
                  and writers (overwrite/append/upsert-by-key)
    functions/    scalar column-expression helpers (cleaning, scoring)
    operators/    reusable dataflow operators (windows, dedup, similarity,
                  text analysis, multimodal plumbing)
    plans/        the query registry: every SURVEY §2 operator as a named
                  (spark_fn, oracle_sql) pair over the testdata tables
    medallion/    bronze → silver → gold pipeline + config-driven DQ engine
    streaming/    Structured Streaming ingest (watermarked windows, sessions)
"""

__version__ = "0.1.0"
