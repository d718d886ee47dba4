"""Multimodal queries for the driver contract.

``multimodal_metadata`` is oracle-checked (byte lengths / hashes are
engine-identical); the decode/feature/frame queries are rows-only (the
stub outputs are deterministic but hash-derived Python-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_fake_payload,
    decode_image_meta,
    extract_features,
    sample_frames,
)
from ..session import load_tables
from .registry import query


@query(
    "multimodal_metadata",
    oracle="""
SELECT doc_id AS asset_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       -- sha256 over the utf-8 bytes: DuckDB's sha256 takes VARCHAR and
       -- hashes its utf-8 encoding, identical to Spark's sha2(binary)
       SUBSTRING(sha256(text), 1, 16) AS payload_hash
FROM documents
""",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    assets = attach_fake_payload(docs)
    return assets.select(
        "asset_id",
        F.length("payload").alias("n_bytes"),
        F.substring(F.sha2("payload", 256), 1, 16).alias("payload_hash"),
    )


@query("multimodal_decode_meta")
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return decode_image_meta(attach_fake_payload(docs))


@query("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return extract_features(attach_fake_payload(docs))


@query("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return sample_frames(attach_fake_payload(docs))
