"""Upsert / merge-by-key operators.

The reference upserts with Postgres ``INSERT ... ON CONFLICT DO UPDATE``
(reference: scripts/gold/model_gold.py:354-378,
scripts/gold/aggregate_gold.py:145-168) and delete-then-append
(model_gold.py:188-201). On a parquet lake the same semantics are:

- **in-plan** (this module's :func:`upsert`): full-outer join on the key
  with source-wins coalesce — a pure DataFrame transform usable anywhere
  in a plan;
- **on-write**: ``write.mode("overwrite")`` with dynamic partition
  overwrite (``partitionOverwriteMode=dynamic``) so only the partitions
  the source touches are replaced — the scalable path when the key is
  the partition column (see sources/writers.py);
- Delta ``MERGE INTO`` is the documented scale-out path when row-level
  upserts into non-partition keys are required (jar not in this image).

Scale: the full-outer join shuffles both sides on the key. When the
source is a small delta (the common case: one day's refresh against
years of history), prefer the partition-overwrite writer — it touches
only the affected partitions and shuffles nothing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge ``source`` into ``target`` by ``keys``; source wins on conflict.

    Both inputs must share a schema. Column order of ``target`` is kept.
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: {sorted(target.columns)} vs {sorted(source.columns)}"
        )
    t = target.alias("t")
    s = source.alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    cols = [
        F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    return joined.select(*cols)


def delete_then_append(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Reference's delete+append idiom (model_gold.py:188-201) as a plan:
    drop target rows whose key appears in source, then union source."""
    key_rows = source.select(*keys).dropDuplicates(list(keys))
    kept = target.join(key_rows, on=list(keys), how="left_anti")
    return kept.unionByName(source)


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a change-data-capture log to a snapshot.

    ``changes`` carries the target's columns plus ``op_col``
    ('I'/'U'/'D') and ``seq_col`` (monotone change order). Per key,
    only the LATEST change matters for the final state (deterministic
    tiebreak: highest seq wins); a final 'D' deletes the key, anything
    else upserts the change row.

    Scale: compacting the log first (one window over the changes on
    the key — log-sized, not snapshot-sized) means the expensive
    snapshot-side work is a single left-anti + union on the key, never
    a per-change replay. This is the plain-parquet expression of what
    Delta/Iceberg MERGE does under row-level concurrency.
    """
    from pyspark.sql.window import Window

    data_cols = [c for c in changes.columns if c not in (op_col, seq_col)]
    if set(data_cols) != set(target.columns):
        raise ValueError(
            f"schema mismatch: {sorted(data_cols)} vs {sorted(target.columns)}"
        )
    # full tiebreak: equal-seq changes (shared transaction sequence)
    # must still pick ONE winner deterministically across runs and
    # partitionings — op then every data column breaks remaining ties
    w = Window.partitionBy(*keys).orderBy(
        F.desc(seq_col), F.desc(op_col), *[F.desc(c) for c in data_cols]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    touched = latest.select(*keys).dropDuplicates(list(keys))
    untouched = target.join(touched, on=list(keys), how="left_anti")
    survivors = latest.filter(F.col(op_col) != "D").select(
        *[F.col(c) for c in target.columns]
    )
    return untouched.unionByName(survivors)
