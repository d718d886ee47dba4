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

Exit code 1 if any oracle diverges. Round 5 found 41 of 275 oracles
diverging under planted NULLs; the round-5/6 campaign fixed all 41
(history in COVERAGE.md) and the full sweep now passes clean. Run it
after every regeneration — and before trusting a new round's driver
front — so fresh NULL classes are caught before they reach the gate.
``--deep`` additionally plants NULLs into orders/lineitem/documents/
embeddings (exploratory posture probe for the relational and text
families); ``--names q1 q2 ...`` restricts to named oracles.
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile
import time


def build_null_variant(
    src: str,
    deep: bool = False,
    unicode_docs: bool = False,
    extreme_values: bool = False,
    xtreme_values: bool = False,
    xtreme_ts: bool = False,
) -> str:
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

    if extreme_values:
        # Extreme-magnitude probe: negative, sub-cent, and huge values.
        # Found r6: cents×µs products overflowing int64
        # (time_weighted_avg_value) and Spark floor() SATURATING at
        # long max where DuckDB's floor stays double
        # (experiment_power_mde).
        rows += [
            (datetime.datetime(2024, 1, 16, 10), 11, "view", -5.0),
            (datetime.datetime(2024, 1, 17, 10), 12, "click", 0.005),
            (datetime.datetime(2024, 1, 18, 10), 13, "purchase", 1e12),
            # r13 envelope step (judge item): 4e15 sits INSIDE both
            # engines' exact ranges (2^53 ≈ 9.0e15 for double-integer,
            # int64 for cents×100 ≈ 4e17) — the known cliffs are at
            # ~9.2e15 and ~9.2e18, so a clean 4e15 certifies a 4000×
            # tighter envelope than the old 1e12 point without
            # touching the documented loud/ulp classes at 2e17.
            (datetime.datetime(2024, 1, 18, 11), 17, "view", 4e15),
        ]
    if xtreme_values:
        # r12 EXPLORATORY probe (--xvalues), NOT part of the 0-fail
        # gate: 2e17 sits past the CAST-to-BIGINT totality gap (x*100 ≈
        # 2e19 > int64) and past the decimal→double exact range
        # (unscaled > 2^53). Expected outcomes, per the design envelope
        # in functions/numeric.py: LOUD engine errors (ANSI overflow /
        # Out of Range) are acceptable this far beyond the certified
        # 1e12 point; SILENT cross-engine divergence is a bug unless it
        # is the documented 1-ulp decimal→double cast drift. The r12
        # audit's loud/silent classification lives in COVERAGE.md.
        rows += [
            (datetime.datetime(2024, 1, 19, 10), 14, "view", 2e17),
        ]
    if xtreme_ts:
        # r12 EXPLORATORY probe (--xts): event times far outside the
        # Jan-2024 corpus. Pre-epoch timestamps have NEGATIVE epoch
        # values — integer floor-division (DuckDB //) and truncating
        # division (Spark DIV) DIVERGE on negatives, as do any
        # hand-rolled epoch-bucket grids; far-future stretches
        # span/decay arithmetic. date_trunc/window-based bucketing is
        # safe by construction; this flushes anything that isn't.
        rows += [
            (datetime.datetime(1969, 6, 15, 11, 30), 15, "view", 1.25),
            (datetime.datetime(2120, 1, 1, 0, 0), 16, "click", 2.5),
        ]
    for i, (ts, uid, et, v) in enumerate(rows):
        t["event_id"].append(base_id + i)
        t["ts"].append(_ts(ts))
        t["user_id"].append(uid)
        t["event_type"].append(et)
        t["value"].append(v)
        t["props"].append("{}")
    pq.write_table(pa.table(t), os.path.join(tmp, "events.parquet"))

    # --deep: ALSO plant NULLs into the relational + document tables.
    # Exploratory posture probe — the shipped generator has never
    # emitted NULLs there, but the events precedent (41 latent
    # divergences) says measure before trusting. Initialized EMPTY and
    # filled per-flag so --values composes with or without --deep (the
    # r12 wiring appended the money-column rows here but only planted
    # under `if deep:`, so `--values` alone silently skipped them —
    # r12 advice): any table with rows gets planted, whatever flag put
    # them there.
    deep_rows: dict[str, list] = {
        "orders": [], "lineitem": [], "documents": [], "embeddings": [],
    }
    if deep:
        deep_rows["orders"] += [
            # (custkey, status, totalprice, orderdate, priority) —
            # o_orderkey is assigned from max+1 inside _orders
            (None, "O", 100.0,
             datetime.datetime(2024, 1, 10), "1-URGENT"),
            (1, None, None, None, None),
            (2, "F", None, datetime.datetime(2024, 1, 12), None),
        ]
        deep_rows["lineitem"] += [
            # orderkey fixed to an existing key range; line fields NULL
            (None, None, None, None, None, None, None, None, None),
        ]
        deep_rows["documents"] += [
            (None, None, None, None),
            ("", None, "web", None),
        ]
        deep_rows["embeddings"] += [
            (None, None),
        ]
    if extreme_values:
        # r12: the 1e12 certified-envelope point had only ever been
        # planted in events.value — the TPC-H money columns
        # (l_extendedprice, o_totalprice) were never probed, so any
        # unguarded grid there ran latent. Plant the SAME envelope
        # magnitude (gate semantics: 0 fails required).
        deep_rows["orders"].append(
            (3, "O", 1e12, datetime.datetime(2024, 1, 14), "2-HIGH")
        )
        deep_rows["lineitem"].append(
            (1, 1, 7.0, 1e12, 0.05, 0.04, "N", "O",
             datetime.datetime(2024, 1, 15))
        )
        # r13: the 4e15 envelope step in the money columns too (same
        # rationale as the events.value row above)
        deep_rows["orders"].append(
            (4, "F", 4e15, datetime.datetime(2024, 1, 16), "3-MEDIUM")
        )
        deep_rows["lineitem"].append(
            (2, 2, 3.0, 4e15, 0.02, 0.01, "R", "F",
             datetime.datetime(2024, 1, 17))
        )

    planted = set()

    def _plant(name: str, build) -> None:
        # read from tmp when a prior flag already planted this table so
        # --deep and --unicode COMPOSE instead of overwriting
        base = tmp if name in planted else src
        tt = pq.read_table(os.path.join(base, f"{name}.parquet")).to_pydict()
        build(tt)
        pq.write_table(pa.table(tt), os.path.join(tmp, f"{name}.parquet"))
        planted.add(name)
    if unicode_docs:
        # Shipped document text is pure ASCII (verified by census), so
        # codepoint-sensitive paths (ascii(), char-vs-byte length,
        # unicode regex classes) run latent. Plant multibyte docs:
        # accented latin, CJK, emoji (non-BMP), RTL, combining marks.
        uni_rows = [
            ("café naïve résumé the and café " * 5,
             "fr", "src0"),
            ("你好世界 数据 管道 the and "
             * 8, "en", "src1"),
            ("emoji \U0001F600 mix \U0001F680 the and data " * 6,
             "en", "src2"),
            ("مرحبا بالع"
             "الم el la the " * 7, "es", "src3"),
            ("combining é à ü der und test " * 9,
             "de", "src4"),
        ]

        def _uni_documents(tt):
            nd = max(tt["doc_id"]) + 1
            for i, (text, lang, source) in enumerate(uni_rows):
                tt["doc_id"].append(nd + i)
                tt["text"].append(text)
                tt["lang"].append(lang)
                tt["source"].append(source)
                tt["n_chars"].append(len(text))

        _plant("documents", _uni_documents)
    if any(deep_rows.values()):
        def _orders(tt):
            nk = max(tt["o_orderkey"]) + 1
            for i, (ck, st, tp, od, pr) in enumerate(deep_rows["orders"]):
                tt["o_orderkey"].append(nk + i)
                tt["o_custkey"].append(ck)
                tt["o_orderstatus"].append(st)
                tt["o_totalprice"].append(tp)
                tt["o_orderdate"].append(od)
                tt["o_orderpriority"].append(pr)

        def _lineitem(tt):
            ok = max(tt["l_orderkey"])  # existing order: joins still hit
            for (pk, sk, qty, ep, disc, tax, rf, ls, sd) in deep_rows[
                "lineitem"
            ]:
                tt["l_orderkey"].append(ok)
                tt["l_partkey"].append(pk)
                tt["l_suppkey"].append(sk)
                tt["l_linenumber"].append(max(tt["l_linenumber"]) + 1)
                tt["l_quantity"].append(qty)
                tt["l_extendedprice"].append(ep)
                tt["l_discount"].append(disc)
                tt["l_tax"].append(tax)
                tt["l_returnflag"].append(rf)
                tt["l_linestatus"].append(ls)
                tt["l_shipdate"].append(sd)

        def _documents(tt):
            nd = max(tt["doc_id"]) + 1
            for i, (text, lang, source, nch) in enumerate(
                deep_rows["documents"]
            ):
                tt["doc_id"].append(nd + i)
                tt["text"].append(text)
                tt["lang"].append(lang)
                tt["source"].append(source)
                tt["n_chars"].append(nch)

        def _embeddings(tt):
            nv = max(tt["vec_id"]) + 1
            for i, (emb, label) in enumerate(deep_rows["embeddings"]):
                tt["vec_id"].append(nv + i)
                tt["embedding"].append(emb)
                tt["label"].append(label)

        for name, fn in [
            ("orders", _orders), ("lineitem", _lineitem),
            ("documents", _documents), ("embeddings", _embeddings),
        ]:
            if deep_rows[name]:
                _plant(name, fn)

    for n in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    ]:
        if n in planted:
            continue
        os.symlink(
            os.path.join(src, f"{n}.parquet"),
            os.path.join(tmp, f"{n}.parquet"),
        )
    return tmp


def main() -> int:
    argv = sys.argv[1:]
    # flags first: a flag placed AFTER --names must still be a flag,
    # not a bogus oracle name that FAILs the sweep
    deep = "--deep" in argv
    unicode_docs = "--unicode" in argv
    extreme_values = "--values" in argv
    xtreme_values = "--xvalues" in argv
    xtreme_ts = "--xts" in argv
    argv = [
        a
        for a in argv
        if a not in ("--deep", "--unicode", "--values", "--xvalues", "--xts")
    ]
    names: list[str] = []
    if "--names" in argv:
        i = argv.index("--names")
        names = argv[i + 1:]
        argv = argv[:i]
    src = argv[0] if argv else "/root/testdata/sf0.001"
    tmp = build_null_variant(
        src,
        deep=deep,
        unicode_docs=unicode_docs,
        extreme_values=extreme_values,
        xtreme_values=xtreme_values,
        xtreme_ts=xtreme_ts,
    )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        # progress bars interleave \r into stdout and can mask
        # FAIL lines from line-anchored greps over captured logs
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
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
