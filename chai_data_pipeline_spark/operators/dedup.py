"""Deduplication operators: exact key dedup, exact content dedup,
MinHash-LSH / SimHash / n-gram-Jaccard near-duplicate detection.

Scale notes (the point of each design):

- ``dedup_by_key`` / ``dedup_exact``: one shuffle on the dedup key; the
  window/groupBy is the map-side-combinable kind. At 100 TB, hash the
  content FIRST (64-128 bit) so the shuffle moves hashes, not documents.
- ``minhash_lsh_candidates``: classic shingle→minhash→band→bucket-join.
  Only rows sharing a (band, band-hash) bucket are paired, so the join
  is an equi-join Catalyst can shuffle on the bucket key — never an
  O(n²) cross join. Banding parameters (num_perm, bands) trade recall
  for bucket size; skewed buckets (boilerplate docs) are capped.
- ``simhash64``: 64-bit fingerprint via sign-aggregation of token
  hashes; near-dups differ in few bits. Pure column expressions.
- n-gram Jaccard verification runs only on LSH/blocking candidates.

All hash functions are Spark's built-in xxhash64/hash — deterministic
across runs and cluster sizes (seeded), JVM-side, codegen-friendly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_by_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Keep exactly one row per key — the first under ``order_by``
    (deterministic survivor; reference drop_duplicates keeps arbitrary,
    scripts/silver/transform_silver.py:232)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(
    df: DataFrame, text_col: str, id_col: str, normalize: bool = True
) -> DataFrame:
    """Exact-content dedup: group by content hash, keep min id.

    Returns one row per distinct content with ``n_copies``. The shuffle
    key is the 64-char sha2 hex — at scale, rows carry only (hash, id)
    through the exchange; the full text never shuffles.
    """
    text = F.col(text_col)
    if normalize:
        text = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    hashed = df.select(
        F.sha2(text, 256).alias("content_hash"), F.col(id_col).alias("doc_id")
    )
    return hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
    )


def shingles(col, n: int = 3):
    """Distinct character n-gram array of a string column (column expr)."""
    # transform over 1..len-n+1 positions; empty array for short strings
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({col}) - {n - 1}, 0)),"
            f" i -> substring({col}, i, {n}))"
        )
    )


def word_shingles(col, n: int = 2):
    """Distinct word n-gram array (space-joined) of a string column."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size(split(trim({col}), '\\\\s+')) - {n - 1}, 0)),"
            f" i -> concat_ws(' ', slice(split(trim({col}), '\\\\s+'), i, {n})))"
        )
    )


# Universal-hash permutation family for MinHash: h_p(x) = (a_p·x + b_p)
# mod P over a 32-bit base hash. Fixed constants (Knuth-LCG-derived,
# a_p odd, both < 2^28) keep a_p·x + b_p < 2^61, so the arithmetic
# never overflows a signed 64-bit integer — the same expressions run
# verbatim in DuckDB oracles. Hashing each shingle ONCE and permuting
# arithmetically replaces the old per-(shingle, perm) string hash,
# which was num_perm× more hash work (the dominant cost of the minhash
# family at sf0.1: 190 s → ~15 s for dedup_minhash_lsh).
_MH_P = 4294967311  # first prime > 2^32
_MH_A = (
    15368481, 193990093, 245454293, 190734627, 100789373, 96501813,
    69880271, 81894327, 151704565, 60495069, 20100777, 40437483,
    126998217, 167866847, 71687851, 88928303, 108658117, 150399803,
    38938973, 106963683, 105360661, 171994431, 104019233, 31236045,
    18747357, 84568729, 192288543, 163068343, 47408419, 159156349,
    242007279, 54217687,
)
_MH_B = (
    132152593, 165292056, 77911324, 240749083, 242904405, 3848461,
    31930113, 224921975, 117560294, 26278297, 171720870, 230786767,
    1332770, 40564727, 161238216, 166225267, 74866101, 226467874,
    51817379, 169365519, 31564863, 208037081, 215934175, 4263935,
    10000507, 243596267, 174687019, 215202210, 211660534, 32134710,
    102443458, 146656514,
)


def minhash_signature(hash_col, num_perm: int = 32):
    """MinHash signature (array<long>) from a BASE-HASH array column.

    ``hash_col`` must already hold one 32-bit non-negative hash per
    shingle (materialize it as a column first — re-deriving base hashes
    inside each permutation lambda multiplies the hash work by
    num_perm). Each permutation is min over (a_p·h + b_p) mod P.
    """
    legs = ", ".join(
        f"array_min(transform({hash_col},"
        f" h -> ({_MH_A[p]} * h + {_MH_B[p]}) % {_MH_P}))"
        for p in range(num_perm)
    )
    return F.expr(f"array({legs})")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    max_bucket: int = 50,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash-LSH banding.

    Returns (id_a, id_b, n_shared_bands) with id_a < id_b. Pipeline:
    shingle → num_perm minhashes → split into ``bands`` bands → hash
    each band → self-equi-join on (band_idx, band_hash). Buckets larger
    than ``max_bucket`` are dropped (boilerplate guard — a 10k-doc
    bucket would otherwise explode quadratically; this is the skew cap).
    """
    rows_per_band = num_perm // bands
    sig = (
        df.filter(F.length(text_col) >= shingle_size)
        .withColumn("__sh", shingles(text_col, shingle_size))
        # base hash ONCE per shingle (xxhash64 masked to 32 bits so the
        # permutation arithmetic stays in-range), then arithmetic perms
        .withColumn(
            "__hs",
            F.expr("transform(__sh, x -> xxhash64(x) & 4294967295)"),
        )
        .select(
            F.col(id_col).alias("id"),
            minhash_signature("__hs", num_perm).alias("sig"),
        )
    )
    banded = sig.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b AS band_idx,"
                f" xxhash64(concat_ws(',', slice(sig, b * {rows_per_band} + 1,"
                f" {rows_per_band}))) AS band_hash))"
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")

    bucket_sizes = banded.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("__bucket_n")
    )
    banded = banded.join(
        bucket_sizes.filter(F.col("__bucket_n") <= max_bucket),
        ["band_idx", "band_hash"],
    ).drop("__bucket_n")

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_size: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (id_a, id_b).

    Joins shingle sets back to the (small) candidate list — the
    quadratic step never happens; only |candidates| rows compute the
    set intersection.
    """
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_size).alias("sh")
    )
    out = (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .drop("sh_a", "sh_b")
    )
    return out.filter(F.col("jaccard") >= threshold)


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    For each of 64 bit positions, sum +1/-1 over token hashes' bits and
    take the sign. Near-duplicate docs land within small Hamming
    distance.

    Split of work: tokenization + xxhash64 stay JVM-side (codegen'd);
    the 64-bit × n-token sign aggregation goes through an Arrow-batched
    Pandas UDF with numpy bit tricks — Spark's higher-order-function
    lambdas are interpreted per element, and the pure-expression version
    of this fold measured ~10x slower. This is the engine's canonical
    "UDF done right" example: vectorized, deterministic, no driver state.
    """
    import numpy as np
    import pandas as pd

    hashes = F.expr(
        f"transform(array_distinct(split(lower(trim({text_col})), '\\\\s+')),"
        f" x -> xxhash64(x))"
    )

    # NB: `from __future__ import annotations` stringifies hints, which
    # pandas_udf's inference can't read — set real annotations instead.
    def _simhash_impl(batches):
        out = np.zeros(len(batches), dtype=np.int64)
        powers = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
        for j, arr in enumerate(batches):
            a = np.asarray(arr, dtype=np.int64).view(np.uint64)
            if a.size == 0:
                continue
            bits = (
                (a[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int32)
            sums = bits.sum(axis=0) * 2 - a.size  # (+1/-1) sign sums
            sig = np.bitwise_or.reduce(powers[sums > 0]) if (sums > 0).any() else np.uint64(0)
            out[j] = np.array([sig], dtype=np.uint64).view(np.int64)[0]
        return pd.Series(out)

    _simhash_impl.__annotations__ = {"batches": pd.Series, "return": pd.Series}
    _simhash_from_hashes = F.pandas_udf(_simhash_impl, "long")

    return df.select(
        F.col(id_col).alias("doc_id"),
        _simhash_from_hashes(hashes).alias("simhash"),
    )


def hamming64(a, b):
    """Hamming distance between two 64-bit fingerprints (column expr)."""
    return F.expr(f"bit_count({a} ^ {b})")


def coalesce_span_token_mass(spans: DataFrame) -> DataFrame:
    """Per-doc masked token mass from (doc_id, s, e) spans.

    Overlapping/contained spans union via gaps-and-islands (running
    MAX(e) over preceding rows per doc; a span starting past that max
    opens a new island), then each island contributes
    ``max(e) - min(s) + 1`` covered tokens — so the sum equals the
    SIZE OF THE SPAN UNION, never double-counting overlap. Returns
    ``(doc_id, dropped, n_spans)`` where n_spans counts coalesced
    islands. Windows partition per doc_id — bounded by document
    length, no global sort. Shared by substring_dedup_apply and
    decontaminate_span_mask; the per-position conservation proof is
    tests/test_substring_dedup.py.
    """
    from pyspark.sql.window import Window

    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = spans.withColumn(
        "new_isl",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)), 1
        ).otherwise(0),
    ).withColumn("isl_id", F.sum("new_isl").over(wrun))
    return (
        isl.groupBy("doc_id", "isl_id")
        .agg((F.max("e") - F.min("s") + 1).alias("covered"))
        .groupBy("doc_id")
        .agg(
            F.sum("covered").alias("dropped"),
            F.count("*").alias("n_spans"),
        )
    )


def span_union_sql_duckdb(spans_cte: str = "spans") -> str:
    """DuckDB CTE chain mirroring :func:`coalesce_span_token_mass`:
    ``<spans_cte>(doc_id, s, e)`` -> ``per_doc(doc_id, dropped,
    n_spans)``. Paste after the spans CTE (leading comma included)."""
    return f"""
isl AS (
    SELECT doc_id, s, e,
           CASE WHEN s > COALESCE(MAX(e) OVER (
               PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
           THEN 1 ELSE 0 END AS new_isl
    FROM {spans_cte}
),
isl2 AS (
    SELECT doc_id, s, e,
           SUM(new_isl) OVER (
               PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
    FROM isl
),
cov AS (
    SELECT doc_id, isl_id, MAX(e) - MIN(s) + 1 AS covered
    FROM isl2 GROUP BY 1, 2
),
per_doc AS (
    SELECT doc_id, SUM(covered) AS dropped, COUNT(*) AS n_spans
    FROM cov GROUP BY 1
)"""
