"""Executor-shippability regression test.

Local-mode tests mask a real-cluster failure mode: python workers
spawn with the driver's CWD on sys.path, so a pandas-UDF closure that
captures a module-level repo function appears to work when tests run
from the repo root — and breaks on any real cluster (or any driver
started elsewhere) with ModuleNotFoundError. CLAUDE.md rule:
worker-shipped Python must be CLOSURES.

This test reruns every Python-UDF-bearing query in a SUBPROCESS whose
cwd is a temp dir, importing the repo only in the driver — the exact
condition under which a by-reference pickle of repo code fails.
"""

from __future__ import annotations

import subprocess
import sys

UDF_QUERIES = [
    "multimodal_decode_meta",
    "multimodal_features",
    "multimodal_frame_sample",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "similarity_ann_ivf",
    "trend_applyinpandas",
]

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from chai_data_pipeline_spark import plans
for name in {names!r}:
    n = plans.QUERIES[name](spark, "/root/testdata/sf0.001").count()
    print("RAN", name, n, flush=True)
print("ALL_OK")
"""


def test_udf_queries_run_outside_repo_cwd(tmp_path):
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo, names=UDF_QUERIES)],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=600,
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k not in ("PYTHONPATH",)
        },
    )
    assert "ALL_OK" in proc.stdout, (
        f"worker-shipping failure (module-level capture?):\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )


TZ_SENSITIVE_QUERIES = [
    "scd2_history",              # emits event-derived timestamp columns
    "streaming_tumbling_counts", # window labels from the stream path
    "range_window_trailing_7d",  # calendar range frame
    "sessionization",            # epoch arithmetic on ts
]

_TZ_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from chai_data_pipeline_spark import plans
from chai_data_pipeline_spark.testing import duckdb_connect, compare_query
sf = "/root/testdata/sf0.001"
con = duckdb_connect(sf)
for name in {names!r}:
    r = compare_query(spark, con, name, plans.QUERIES[name],
                      plans.ORACLES[name], sf)
    assert r.ok, name + ": " + r.detail[:300]
    print("TZOK", name, flush=True)
print("ALL_OK")
"""


def test_tz_sensitive_queries_under_nonutc_os_zone(tmp_path):
    """collect() converts instant timestamps via the HOST OS zone, and
    window bucketing follows the session zone — both only observable
    with a non-UTC TZ env in a fresh process. Pins the UTC-at-read-time
    + NTZ-output contract (session.load_tables / streaming windows)."""
    import os as _os
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env = {k: v for k, v in _os.environ.items() if k != "PYTHONPATH"}
    env["TZ"] = "America/New_York"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            _TZ_SCRIPT.format(repo=repo, names=TZ_SENSITIVE_QUERIES),
        ],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert "ALL_OK" in proc.stdout, (
        f"tz-dependence regression:\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
