"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extraction / frame-sampling as Arrow-batched
Pandas UDFs over mapInPandas.

Design (the part that matters at 100 TB):
- media lives as a ``binary`` column next to a typed metadata struct —
  one row per asset, co-partitioned with its features, no side files;
- every transform is ``mapInPandas`` over an iterator of Arrow batches:
  constant memory per task regardless of asset count, media bytes never
  pass through the driver;
- decode libraries (PIL/ffmpeg/torchaudio) are NOT in this image, so the
  pixel-level step is stubbed: ``decode_image_meta`` parses real header
  bytes for PNG/JPEG when present and otherwise yields a deterministic
  fake derived from the payload hash, clearly marked via ``decoder``;
  the Spark-side plumbing (schema, batching, partitioning, UDF
  signatures) is real and tested.

The driver testdata has no binary tables; :func:`attach_fake_payload`
derives a payload from the documents table so the plumbing runs against
driver fixtures too.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_META_SCHEMA = (
    "asset_id long, n_bytes int, format string, width int, height int, "
    "decoder string"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"asset_id long, feature array<float>"

FRAME_SCHEMA = "asset_id long, frame_index int, frame_offset_bytes long"


def attach_fake_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic binary payload column from text — a
    stand-in for real media bytes so plumbing is exercised end-to-end.

    The payload is TOTAL (never NULL): a NULL text becomes an empty
    payload, so downstream pandas UDFs never see None where they expect
    bytes and the DuckDB oracles mirror with COALESCE(text, '')."""
    text = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.encode(text, "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/fake").alias("mime"),
            F.length(F.encode(text, "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_meta(assets: DataFrame) -> DataFrame:
    """Decode step: real PNG/JPEG header parse when the payload is a
    real image; deterministic hash-derived fake dimensions otherwise
    (decoder column says which path ran). Pixel decode itself requires
    PIL — stubbed per environment constraints."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        # nested (not module-level) so cloudpickle ships it by VALUE:
        # executors don't have this repo on their PYTHONPATH
        def _parse_image_header(b: bytes):
            if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
                w, h = struct.unpack(">II", b[16:24])
                return "png", w, h
            if len(b) >= 4 and b[:2] == b"\xff\xd8":
                i = 2
                while i + 9 < len(b):
                    if b[i] != 0xFF:
                        i += 1
                        continue
                    marker = b[i + 1]
                    seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                    if marker in (0xC0, 0xC2):
                        h = int.from_bytes(b[i + 5 : i + 7], "big")
                        w = int.from_bytes(b[i + 7 : i + 9], "big")
                        return "jpeg", w, h
                    i += 2 + seg_len
            return None

        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                parsed = _parse_image_header(b)
                if parsed:
                    fmt, w, h = parsed
                    decoder = "header" if not have_pil else "pil"
                else:
                    digest = hashlib.sha256(b).digest()
                    fmt = "fake"
                    w = 64 + digest[0] % 192
                    h = 64 + digest[1] % 192
                    decoder = "stub"
                rows.append((aid, len(b), fmt, w, h, decoder))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_bytes", "format", "width", "height",
                    "decoder",
                ],
            )

    return assets.mapInPandas(op, DECODED_META_SCHEMA)


def extract_features(assets: DataFrame) -> DataFrame:
    """Feature extraction: deterministic FEATURE_DIM-dim unit vector
    derived from the payload hash (a real model would run here; the
    Arrow batch shape and output schema are what production needs)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, feats = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                digest = hashlib.sha256(bytes(payload)).digest()
                raw = np.frombuffer(
                    (digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4],
                    dtype=np.uint8,
                ).astype(np.float32)
                v = raw.reshape(FEATURE_DIM, 4).mean(axis=1) / 255.0 - 0.5
                norm = float(np.linalg.norm(v)) or 1.0
                ids.append(aid)
                feats.append((v / norm).tolist())
            yield pd.DataFrame({"asset_id": ids, "feature": feats})

    return assets.mapInPandas(op, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for "video" payloads: deterministic evenly-spaced
    byte offsets (a real demuxer would seek keyframes; the fan-out shape
    — one row per sampled frame — is the production contract)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n = len(bytes(payload))
                for i in range(n_frames):
                    rows.append((aid, i, (n * i) // n_frames))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_index", "frame_offset_bytes"]
            )

    return assets.mapInPandas(op, FRAME_SCHEMA)
