"""Build a deterministic 10x scale point (\"sf1\") from the read-only
sf0.1 testdata, for the round-13 scale measurement (optimization guide
SS1: measure; SCALING.md's 10x local point).

Replication rules (seedless, fully deterministic):
- Fact tables (lineitem, orders, events, documents, embeddings) are
  replicated 10x with per-replica KEY OFFSETS chosen far above the
  source key ranges, so intra-order/per-entity row groups keep their
  sf0.1 cardinality (an order still has the same lineitems; volume
  scales, per-key fan-out does not — the same way a real workload
  grows).
- documents.text gets a short per-replica suffix (replica > 0), so
  replicas are NOT exact/near duplicates of each other — otherwise the
  dedup family would measure planted 10x duplicate inflation, not
  engine throughput. n_chars is recomputed to match. Planted
  duplicates WITHIN a replica survive (same suffix), so dedup outputs
  scale linearly by construction.
- embeddings get one dimension nudged by a replica-dependent epsilon
  (replica > 0) for the same reason (identical vectors 10x over would
  plant 10x artificial exact near-neighbors).
- Dimensions (customer, supplier, part, nation, region) are copied
  as-is: dims scale sub-linearly in production and the broadcast-side
  posture is exactly what the scale test must preserve.
- Output parquet is written with ~32 row groups per fact table (a
  well-packed layout), so session._split_if_unsplittable's adaptive
  rule passes it through untouched — the sf1 run exercises the
  production no-op path of the split, not the local single-row-group
  fix.

Usage: python plans/r13/make_sf1.py [out_dir]   (default /root/scale/sf1)
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/scale/sf1"
REPLICAS = 10

# key offsets: far above each source key's max (checked below)
OFF = {
    "l_orderkey": 10_000_000,
    "o_orderkey": 10_000_000,
    "event_id": 100_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

COPY = ["customer", "supplier", "part", "nation", "region"]


def replicate(name: str, key_cols: list[str], mutate=None):
    src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    for k in key_cols:
        mx = pc.max(src[k]).as_py()
        assert mx < OFF[k], f"{name}.{k} max {mx} >= offset {OFF[k]}"
    parts = []
    for r in range(REPLICAS):
        t = src
        for k in key_cols:
            idx = t.schema.get_field_index(k)
            shifted = pc.add(t[k], r * OFF[k])
            t = t.set_column(idx, t.schema.field(k), shifted.cast(t.schema.field(k).type))
        if mutate is not None:
            t = mutate(t, r)
        parts.append(t)
    out = pa.concat_tables(parts).combine_chunks()
    rows_per_group = max(1, out.num_rows // 32)
    pq.write_table(
        out,
        os.path.join(OUT, f"{name}.parquet"),
        row_group_size=rows_per_group,
        compression="snappy",
    )
    print(f"{name}: {src.num_rows} -> {out.num_rows} rows, "
          f"{pq.ParquetFile(os.path.join(OUT, name + '.parquet')).metadata.num_row_groups} row groups")


def mutate_documents(t: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return t
    suffix = f" r{r}"
    idx_t = t.schema.get_field_index("text")
    # NULL text stays NULL (binary_join_element_wise with null gives null)
    new_text = pc.binary_join_element_wise(t["text"], pa.scalar(suffix), "")
    t = t.set_column(idx_t, t.schema.field("text"), new_text.cast(t.schema.field("text").type))
    if "n_chars" in t.column_names:
        idx_n = t.schema.get_field_index("n_chars")
        n = pc.utf8_length(t["text"])
        t = t.set_column(
            idx_n, t.schema.field("n_chars"),
            n.cast(t.schema.field("n_chars").type),
        )
    return t


def mutate_embeddings(t: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return t
    import numpy as np

    idx = t.schema.get_field_index("embedding")
    col = t["embedding"].combine_chunks()
    arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
    values = arr.values.to_numpy(zero_copy_only=False).copy()
    width = 64
    dim = (r - 1) % width
    eps = np.float32(1e-3) * np.float32(r)
    values[dim::width] = values[dim::width] + eps
    flat = pa.array(values, type=arr.values.type)
    new = pa.ListArray.from_arrays(arr.offsets, flat)
    return t.set_column(idx, t.schema.field("embedding"), new.cast(t.schema.field("embedding").type))


def main():
    os.makedirs(OUT, exist_ok=True)
    replicate("lineitem", ["l_orderkey"])
    replicate("orders", ["o_orderkey"])
    replicate("events", ["event_id"])
    replicate("documents", ["doc_id"], mutate_documents)
    replicate("embeddings", ["vec_id"], mutate_embeddings)
    for name in COPY:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(t, os.path.join(OUT, f"{name}.parquet"), compression="snappy")
        print(f"{name}: copied ({t.num_rows} rows)")
    # schema parity check
    for f in sorted(os.listdir(OUT)):
        name = f.removesuffix(".parquet")
        a = pq.read_schema(os.path.join(SRC, f))
        b = pq.read_schema(os.path.join(OUT, f))
        assert a.equals(b, check_metadata=False), f"schema drift in {name}"
    print("schemas identical to source: OK")


if __name__ == "__main__":
    main()
