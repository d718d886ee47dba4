"""Distributed Lloyd's k-means over an embedding column — trains the
IVF codebook (operators/similarity.ivf_assign ships with a first-k
stand-in; this is the production path it names).

Design for determinism AND scale:

- **Assignment is map-only**: the codebook is a plan-time literal
  (k × dim doubles — a model artifact, same posture as the LSH
  hyperplanes in operators/similarity._hyperplane), so each vector
  scores every centroid in-row and argmaxes without any shuffle.
- **Update is one partial-aggregated shuffle** keyed (cluster, dim)
  after a posexplode — k×dim keys total, so the shuffle moves bounded
  partials regardless of corpus size (same layout as the
  embedding_centroids plan).
- **Bit-reproducible across partitionings**: per-dimension sums are
  fixed-point quantized (floor(x·2²⁰), an exact IEEE op) so integer
  summation is associative — the resulting codebook is identical on
  any cluster size, which keeps every downstream assignment
  deterministic too.
- **Init**: the k lowest-id vectors (deterministic; k-means++ would add
  a sampling pass whose benefit at IVF codebook sizes is marginal).
- Ties in assignment break to the LOWEST centroid id (matches
  ivf_assign).

The driver-side state per iteration is k×dim floats — O(model), never
O(data); at 100 TB this is exactly how a codebook trainer must look.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q = 1 << 20  # fixed-point scale (2^20): exact for unit-scale floats


def _centroid_norm(vec: list[float]) -> float:
    """sqrt of the sequential-fold self-dot — the SAME left-to-right
    IEEE-double accumulation the engine's fold performs, so the literal
    equals what an in-plan sqrt(dot(c,c)) would produce bit-for-bit."""
    import math

    acc = 0.0
    for x in vec:
        acc += x * x
    return math.sqrt(acc)


def _best_struct_expr(codebook: list[list[float]], vec_col: str) -> str:
    """SQL expr: the winning (sim, neg_cid) struct by cosine against
    literal centroids — struct max orders by sim first, then neg_cid,
    so ties break to the LOWEST cluster id. Uses the same
    sequential-fold dot product as operators/similarity (bit-identical
    across engines/partitions). Centroid norms are baked in as literals
    and the row norm is read from a pre-hoisted ``__vnorm`` column —
    the naive form recomputes both k times per row."""
    from .similarity import dot_sql_spark

    elems = []
    for cid, vec in enumerate(codebook):
        arr = f"array({', '.join(f'cast({x!r} AS double)' for x in vec)})"
        elems.append(
            f"struct(({dot_sql_spark(vec_col, arr)})"
            f" / (__vnorm * {_centroid_norm(vec)!r}) AS sim, "
            f"{-cid} AS neg_cid)"
        )
    return f"array_max(array({', '.join(elems)}))"


def _assign_expr(codebook: list[list[float]], vec_col: str) -> str:
    """SQL expr: argmax cluster id by cosine (ties to the lowest id)."""
    return f"-{_best_struct_expr(codebook, vec_col)}.neg_cid"


def kmeans_assign(
    df: DataFrame,
    codebook: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Map-only nearest-centroid assignment against a literal codebook."""
    from .similarity import dot_sql_spark

    return (
        df.withColumn(
            "__vnorm", F.expr(f"sqrt({dot_sql_spark(vec_col, vec_col)})")
        )
        .withColumn(out_col, F.expr(_assign_expr(codebook, vec_col)))
        .drop("__vnorm")
    )


def kmeans_assign_scored(
    df: DataFrame,
    codebook: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assignment plus the WINNING cosine in one argmax pass: adds
    ``cluster_id`` and ``__sim``. The k×dim dot-product fan is built
    once — re-deriving the similarity afterwards (e.g. a CASE chain on
    cluster_id, as kmeans_summary once did) duplicates the entire
    literal-codebook expression tree in the plan, which at codebook
    scale is the dominant per-query cost (plan construction + codegen,
    not data). ``__sim`` is bit-identical to the recomputed form: both
    are the same sequential-fold dot over the same literals."""
    from .similarity import dot_sql_spark

    return (
        df.withColumn(
            "__vnorm", F.expr(f"sqrt({dot_sql_spark(vec_col, vec_col)})")
        )
        .withColumn("__best", F.expr(_best_struct_expr(codebook, vec_col)))
        .select(
            "*",
            (-F.col("__best.neg_cid")).alias("cluster_id"),
            F.col("__best.sim").alias("__sim"),
        )
        .drop("__vnorm", "__best")
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Train a k-centroid codebook; returns it as plain Python floats
    (the model artifact — bounded k×dim driver state, NOT a data-path
    collect).

    The (id, vector) projection is cached for the training loop —
    Lloyd re-reads the same rows every iteration, and re-decoding
    parquet ``iters`` times is pure waste (MLlib's trainers persist
    their input for the same reason; MEMORY_AND_DISK spills instead of
    failing when the projection outgrows executor memory). Unpersisted
    before return.
    """
    work = df.select(id_col, vec_col).persist()
    try:
        return _kmeans_fit_loop(work, k, iters, vec_col, id_col)
    finally:
        work.unpersist()


def _kmeans_fit_loop(
    work: DataFrame,
    k: int,
    iters: int,
    vec_col: str,
    id_col: str,
) -> list[list[float]]:
    init = (
        work.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("v"))
        .collect()
    )
    codebook = [[float(x) for x in r.v] for r in init]
    for _ in range(iters):
        assigned = kmeans_assign(work, codebook, vec_col)
        sums = (
            assigned.select(
                "cluster_id", F.posexplode(vec_col).alias("dim", "val")
            )
            .groupBy("cluster_id", "dim")
            .agg(
                F.sum(
                    F.floor(F.col("val").cast("double") * _Q).cast("long")
                ).alias("qsum"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new_book = [list(c) for c in codebook]  # empty cluster keeps its centroid
        acc: dict[int, list[tuple[int, int, int]]] = {}
        for r in sums:
            acc.setdefault(int(r.cluster_id), []).append(
                (int(r.dim), int(r.qsum), int(r.n))
            )
        for cid, entries in acc.items():
            vec = new_book[cid]
            for dim, qsum, n in entries:
                vec[dim] = qsum / _Q / n
        codebook = new_book
    return codebook


def kmeans_summary(
    df: DataFrame,
    codebook: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster_id, n_members, mean_sim) for a fitted codebook —
    assignment map-only, one bounded aggregation. The winning cosine
    rides out of the assignment argmax itself (kmeans_assign_scored) —
    sims are bit-identical to a recompute-by-CASE, at half the plan."""
    from ..functions import dround

    assigned = kmeans_assign_scored(df, codebook, vec_col)
    # fixed-point-quantized mean (exact integer sum → associative →
    # partition-order-independent), same trick as embedding_centroids
    qsim = F.floor(F.col("__sim") * _Q).cast("long")
    return assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        dround(
            F.sum(qsim).cast("double") / (float(_Q) * F.count("*")), 4
        ).alias("mean_sim"),
    )
