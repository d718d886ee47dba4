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
