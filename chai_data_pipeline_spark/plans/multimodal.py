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


# --------------------------------------------------------------------------
# Content-addressed dedup / storage accounting — the dedup arc for the
# multimodal family. At 100 TB of media, exact dedup is the
# content-addressed-storage shape: shuffle 32-byte digests (never
# payloads), group, keep-first; savings are computable from the
# (digest, n_copies, n_bytes) grain alone. Modality is derived from a
# digest byte (same stub recipe as multimodal_decode_meta — the
# image/audio libs aren't in this container), so the per-modality
# rollup exercises the real production grouping without real media.
# --------------------------------------------------------------------------

from ..functions import dround, sql_dround  # noqa: E402


@query(
    "multimodal_dedup_storage",
    oracle=f"""
WITH a AS (
    SELECT doc_id AS asset_id,
           sha256(COALESCE(text, '')) AS h,
           CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS nb
    FROM documents
),
m AS (
    SELECT h,
           CAST(('0x' || substring(h, 5, 2)) AS INTEGER) % 3 AS mod3,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(nb) AS nb
    FROM a GROUP BY 1, 2
)
SELECT CASE mod3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                 ELSE 'video' END AS modality,
       CAST(SUM(n_copies) AS BIGINT) AS n_assets,
       COUNT(*) AS n_unique,
       CAST(SUM(n_copies * nb) AS BIGINT) AS bytes_total,
       CAST(SUM(nb) AS BIGINT) AS bytes_unique,
       CAST(SUM((n_copies - 1) * nb) AS BIGINT) AS bytes_saved,
       {sql_dround(
           '''CASE WHEN SUM(n_copies * nb) > 0 THEN
                SUM((n_copies - 1) * nb) * 1.0 / SUM(n_copies * nb)
              END''', 6)} AS saved_frac
FROM m GROUP BY 1
""",
)
def multimodal_dedup_storage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality exact-dedup storage savings on the digest grain.

    Scale: one map-side digest + byte-length projection, one
    groupBy(h) of 32-byte keys with map-side combine, one 3-row
    modality rollup — payload bytes never shuffle. Copies of the same
    digest have identical length by construction (MIN(nb) pins it), so
    savings are exact integers. saved_frac is non-vacuous at sf0.01:
    the regenerated corpus plants exact duplicates
    (dedup_exact_content precedent).
    """
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    a = attach_fake_payload(docs).select(
        "asset_id",
        F.sha2("payload", 256).alias("h"),
        F.length("payload").cast("bigint").alias("nb"),
    )
    mod3 = (
        F.conv(F.substring(F.col("h"), 5, 2), 16, 10).cast("int") % 3
    )
    m = a.groupBy("h").agg(
        F.count("*").cast("bigint").alias("n_copies"),
        F.min("nb").alias("nb"),
    ).select(
        "h", "n_copies", "nb", mod3.alias("mod3")
    )
    total = F.sum(F.col("n_copies") * F.col("nb"))
    saved = F.sum((F.col("n_copies") - 1) * F.col("nb"))
    return m.groupBy(
        F.when(F.col("mod3") == 0, "image")
        .when(F.col("mod3") == 1, "audio")
        .otherwise("video")
        .alias("modality")
    ).agg(
        F.sum("n_copies").cast("bigint").alias("n_assets"),
        F.count("*").alias("n_unique"),
        total.cast("bigint").alias("bytes_total"),
        F.sum("nb").cast("bigint").alias("bytes_unique"),
        saved.cast("bigint").alias("bytes_saved"),
        dround(
            F.when(total > 0, saved * 1.0 / total), 6
        ).alias("saved_frac"),
    )
