"""Bronze → Silver → Gold medallion pipeline (the reference's product
surface, rebuilt on Spark): multi-format ingestion with lineage, column-
expression cleansing/enrichment, a config-driven data-quality engine,
and gold business models — all lazy DataFrame plans over a parquet lake.
"""
