"""Pin the nullsweep variant builder: the sweep is the round-boundary
safety net, so its planting must not silently regress.

No Spark here — pure pyarrow assertions over the built variant.
"""

import pyarrow.parquet as pq

from chai_data_pipeline_spark.tools.nullsweep import build_null_variant

SRC = "/root/testdata/sf0.001"


def _nulls(tmp: str, table: str) -> dict[str, int]:
    t = pq.read_table(f"{tmp}/{table}.parquet")
    return {
        c: t.column(c).null_count
        for c in t.column_names
        if t.column(c).null_count
    }


def test_default_plants_event_nulls_only():
    tmp = build_null_variant(SRC)
    ev = _nulls(tmp, "events")
    # every historically-diverging NULL class is present
    for col in ("ts", "user_id", "event_type", "value"):
        assert ev.get(col, 0) > 0, col
    # cutoff-straddling coverage (ADVICE r5): NULL-keyed rows on BOTH
    # sides of the 2024-01-24 refresh boundary
    t = pq.read_table(f"{tmp}/events.parquet").to_pydict()
    import datetime

    cutoff = datetime.datetime(2024, 1, 24)
    # ts may be datetimes (µs physical type) or epoch-nanos ints
    # (the r1-r2 physical type the builder branches on)
    cutoff_ns = int(
        cutoff.replace(tzinfo=datetime.timezone.utc).timestamp()
    ) * 1_000_000_000
    pre = post = False
    for ts, et in zip(t["ts"], t["event_type"]):
        if et is None and ts is not None:
            cut = cutoff_ns if isinstance(ts, int) else cutoff
            pre |= ts < cut
            post |= ts >= cut
    assert pre and post
    # other tables untouched (symlinked)
    assert _nulls(tmp, "orders") == {}
    assert _nulls(tmp, "documents") == {}


def test_deep_and_unicode_compose():
    tmp = build_null_variant(SRC, deep=True, unicode_docs=True)
    assert _nulls(tmp, "orders")  # NULLs planted
    assert _nulls(tmp, "lineitem")
    assert _nulls(tmp, "embeddings")
    docs = pq.read_table(f"{tmp}/documents.parquet")
    # deep NULL docs AND unicode docs both present (composition — the
    # second planting must not overwrite the first)
    assert docs.column("text").null_count > 0
    texts = [x for x in docs.column("text").to_pylist() if x]
    assert any(any(ord(ch) > 127 for ch in s) for s in texts)


def test_extreme_values_flag():
    tmp = build_null_variant(SRC, extreme_values=True)
    vals = [
        v
        for v in pq.read_table(f"{tmp}/events.parquet")
        .column("value")
        .to_pylist()
        if v is not None
    ]
    assert min(vals) < 0
    assert max(vals) >= 1e12
    # r13 (r12 advice): --values WITHOUT --deep must still plant the
    # 1e12 money-column rows — previously they rode the deep-only
    # branch and `--values` alone silently skipped the probe
    op = pq.read_table(f"{tmp}/orders.parquet").column("o_totalprice")
    lp = pq.read_table(f"{tmp}/lineitem.parquet").column(
        "l_extendedprice"
    )
    assert max(v for v in op.to_pylist() if v is not None) >= 1e12
    assert max(v for v in lp.to_pylist() if v is not None) >= 1e12
    # and no NULLs planted (that's --deep's job)
    assert op.null_count == 0 and lp.null_count == 0
