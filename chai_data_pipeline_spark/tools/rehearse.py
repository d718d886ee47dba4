"""Driver-gate rehearsal: run registered queries under EXACT driver
conditions and report per-query pass/fail.

The external driver builds a vanilla SparkSession (none of the
engine's configs), runs each ``queries()`` entry at sf0.01 against its
DuckDB oracle, and value-hashes the results under whatever host
timezone it has (historically America/New_York). This tool reproduces
that, which catches the classes of failure the sf0.001 parity suite
cannot: timezone-sensitive output, configs the engine forgot to set at
read time, and executor closures that only resolve from the repo cwd.

    TZ=America/New_York python -m chai_data_pipeline_spark.tools.rehearse
    ... rehearse 0 50          # only the first 50 (the driver cap)
    ... rehearse --names a b   # specific queries

Run it from OUTSIDE the repo (e.g. cd /tmp with PYTHONPATH=/root/repo)
so cwd-relative bugs cannot hide. Rows-only queries (no oracle) are
executed and counted. Exit code 1 if anything fails.
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("start", nargs="?", type=int, default=0)
    ap.add_argument("end", nargs="?", type=int, default=None)
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

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

    con = duckdb_connect(args.sf_dir)
    names = args.names or list(plans.QUERIES)[args.start : args.end]
    fails: list[str] = []
    t00 = time.time()
    for name in names:
        t0 = time.time()
        if name in plans.ORACLES:
            r = compare_query(
                spark, con, name, plans.QUERIES[name],
                plans.ORACLES[name], args.sf_dir,
            )
            ok, detail = r.ok, ("" if r.ok else r.detail[:150])
            if ok and r.spark_rows == 0:
                # an empty==empty match is VACUOUS evidence — a
                # degenerate predicate (e.g. a cutoff outside the data
                # span) passes every hash check while proving nothing
                # (mix_rate_decomposition precedent, round 8)
                detail = "WARN empty result — parity is vacuous"
        else:
            try:
                n = plans.QUERIES[name](spark, args.sf_dir).count()
                ok, detail = True, f"{n} rows (no oracle)"
            except Exception as exc:  # noqa: BLE001 — report and continue
                ok, detail = False, str(exc)[:150]
        print(
            f"{'OK ' if ok else 'FAIL'} {name}"
            f" ({time.time() - t0:.1f}s) {detail}",
            flush=True,
        )
        if not ok:
            fails.append(name)
    print(
        f"DONE {len(names)} queries in {time.time() - t00:.0f}s"
        f" fails={fails}",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
