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
# Perceptual-dedup storage accounting — the dedup arc for the
# multimodal family. Exact content-addressed dedup is vacuous on this
# corpus (zero byte-identical payloads at the gate SF — checked), so
# the dedup key is a PERCEPTUAL-HASH STUB: the digest of the payload's
# first 32 bytes (real pipelines use pHash/chromaprint; the image/
# audio libs are not in this container — the Spark-side plumbing is
# what is exercised). Near-dup media of the same family share the
# prefix, so copies are NOT byte-identical: the accounting keeps the
# lowest-id copy per key and reports KEPT vs DROPPED bytes honestly
# (never "saved", which would imply byte equality). At 100 TB this is
# the real shape: shuffle small digests, group, keep-first; payload
# bytes never shuffle.
# --------------------------------------------------------------------------

from ..functions import dround, sql_dround  # noqa: E402


@query(
    "multimodal_dedup_storage",
    oracle=f"""
WITH a AS (
    SELECT doc_id AS asset_id,
           sha256(substring(COALESCE(text, ''), 1, 32)) AS ph,
           CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS nb
    FROM documents
),
g AS (
    SELECT ph,
           CAST(('0x' || substring(ph, 5, 2)) AS INTEGER) % 3 AS mod3,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(SUM(nb) AS BIGINT) AS bytes_g,
           MIN(asset_id) AS keep_id
    FROM a GROUP BY 1, 2
),
k AS (
    SELECT g.ph, g.mod3, g.n_copies, g.bytes_g, a.nb AS bytes_kept_g
    FROM g JOIN a ON a.asset_id = g.keep_id AND a.ph = g.ph
)
SELECT CASE mod3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                 ELSE 'video' END AS modality,
       CAST(SUM(n_copies) AS BIGINT) AS n_assets,
       COUNT(*) AS n_keys,
       CAST(SUM(bytes_g) AS BIGINT) AS bytes_total,
       CAST(SUM(bytes_kept_g) AS BIGINT) AS bytes_kept,
       CAST(SUM(bytes_g - bytes_kept_g) AS BIGINT) AS bytes_dropped,
       {sql_dround(
           '''CASE WHEN SUM(bytes_g) > 0 THEN
                SUM(bytes_g - bytes_kept_g) * 1.0 / SUM(bytes_g)
              END''', 6)} AS dropped_frac
FROM k GROUP BY 1
""",
)
def multimodal_dedup_storage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality perceptual-dedup byte accounting on the digest grain.

    Scale: one map-side prefix-digest + byte-length projection, one
    groupBy of 32-byte keys (map-side combined), one keep-copy lookup
    join on (key, kept id) — same key domain, co-partitionable — and a
    3-row modality rollup. Non-vacuous at the gate SF: 476/500
    distinct prefixes (24 dropped copies). Modality derives from a
    digest byte (multimodal_decode_meta stub recipe).
    """
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    a = attach_fake_payload(docs).select(
        "asset_id",
        F.sha2(F.substring(F.col("payload").cast("string"), 1, 32), 256)
        .alias("ph"),
        F.length("payload").cast("bigint").alias("nb"),
    )
    mod3 = F.conv(F.substring(F.col("ph"), 5, 2), 16, 10).cast("int") % 3
    g = a.groupBy("ph").agg(
        F.count("*").cast("bigint").alias("n_copies"),
        F.sum("nb").cast("bigint").alias("bytes_g"),
        F.min("asset_id").alias("keep_id"),
    ).select("ph", mod3.alias("mod3"), "n_copies", "bytes_g", "keep_id")
    k = g.join(
        a.select(
            F.col("ph").alias("ph2"),
            F.col("asset_id").alias("keep_id2"),
            F.col("nb").alias("bytes_kept_g"),
        ),
        (F.col("ph") == F.col("ph2"))
        & (F.col("keep_id") == F.col("keep_id2")),
    )
    total = F.sum("bytes_g")
    dropped = F.sum(F.col("bytes_g") - F.col("bytes_kept_g"))
    return k.groupBy(
        F.when(F.col("mod3") == 0, "image")
        .when(F.col("mod3") == 1, "audio")
        .otherwise("video")
        .alias("modality")
    ).agg(
        F.sum("n_copies").cast("bigint").alias("n_assets"),
        F.count("*").alias("n_keys"),
        total.cast("bigint").alias("bytes_total"),
        F.sum("bytes_kept_g").cast("bigint").alias("bytes_kept"),
        dropped.cast("bigint").alias("bytes_dropped"),
        dround(
            F.when(total > 0, dropped * 1.0 / total), 6
        ).alias("dropped_frac"),
    )
