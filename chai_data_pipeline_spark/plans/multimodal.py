"""Multimodal queries for the driver contract.

``multimodal_metadata``, ``multimodal_decode_meta`` and
``multimodal_frame_sample`` are oracle-checked: the stub decode derives
dimensions from sha256 digest bytes and frame offsets from integer
arithmetic, both reproducible in DuckDB SQL (hex-substring of sha256 =
digest bytes; ``//`` = Python floor division on non-negatives), so even
the pandas-UDF outputs get full value-hash checks. Only
``multimodal_features`` stays rows-only — its unit vector is computed
in numpy float32, which double-precision SQL cannot reproduce bit-wise.
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
       CAST(octet_length(encode(COALESCE(text, ''))) AS INTEGER) AS n_bytes,
       -- sha256 over the utf-8 bytes: DuckDB's sha256 takes VARCHAR and
       -- hashes its utf-8 encoding, identical to Spark's sha2(binary)
       SUBSTRING(sha256(COALESCE(text, '')), 1, 16) AS payload_hash
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


@query(
    "multimodal_decode_meta",
    oracle="""
SELECT doc_id AS asset_id,
       CAST(octet_length(encode(COALESCE(text, ''))) AS INTEGER) AS n_bytes,
       'fake' AS format,
       -- stub dims = 64 + digest_byte % 192; hex-substring of sha256
       -- IS the digest byte (text payloads can never carry PNG/JPEG
       -- magic: 0x89/0xFF are invalid UTF-8 lead bytes)
       CAST(64 + CAST(('0x' || substring(sha256(COALESCE(text, '')), 1, 2)) AS INTEGER) % 192
            AS INTEGER) AS width,
       CAST(64 + CAST(('0x' || substring(sha256(COALESCE(text, '')), 3, 2)) AS INTEGER) % 192
            AS INTEGER) AS height,
       'stub' AS decoder
FROM documents
""",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return decode_image_meta(attach_fake_payload(docs))


@query("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only by nature (float32 numpy math), but the OUTPUT must be
    canonicalizer-safe: the driver's harness pandas-sorts every column,
    and a raw ``array<float>`` column crashes it (``TypeError:
    unhashable type: 'list'`` — CORRECTNESS_r03). Project scalar stats
    plus a deterministic digest of the ``round(x, 4)``-mapped vector
    instead; the raw-vector operator stays in
    ``operators.multimodal.extract_features`` for library users."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    feats = extract_features(attach_fake_payload(docs))
    rounded = F.transform("feature", lambda x: F.round(x.cast("double"), 4))
    return feats.select(
        "asset_id",
        F.size("feature").alias("dim"),
        F.round(
            F.sqrt(F.aggregate(rounded, F.lit(0.0), lambda acc, x: acc + x * x)), 2
        ).alias("l2_norm_approx"),
        F.substring(F.sha2(F.to_json(rounded), 256), 1, 16).alias("feature_digest"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id AS asset_id,
       CAST(f AS INTEGER) AS frame_index,
       CAST(octet_length(encode(COALESCE(text, ''))) * f // 4 AS BIGINT)
           AS frame_offset_bytes
FROM documents, (SELECT unnest(range(0, 4)) AS f) frames
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return sample_frames(attach_fake_payload(docs))
