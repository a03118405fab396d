"""Deployment-path smoke test: the north rule deploys via
``spark-submit --py-files <zip>``. This test builds the zip, then runs the
real spark-submit binary from a NEUTRAL working directory (the repo is not
on the subprocess's import path), so every import on driver and executors
must resolve from the --py-files zip — exactly the multi-executor cluster
contract, exercised on local[2]."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    subprocess.run(["which", "spark-submit"], capture_output=True).returncode != 0,
    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    sys.path.insert(0, REPO)
    from scripts.build_pyfiles import build
    from dataqualityassistant_spark.fixtures import pages_spark_df

    zip_path = build(str(tmp_path / "dqa.zip"))
    inp = str(tmp_path / "pages")
    out = str(tmp_path / "scored")
    pages_spark_df(spark, 120, partitions=2).write.parquet(inp)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_job.py"),
         "filter", "--input", inp, "--output", out,
         "--metrics", str(tmp_path / "metrics"),
         "--checkpoint", str(tmp_path / "ckpt"),
         "--buckets", "4", "--run-id", "submit-smoke"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=420, env=env)
    assert res.returncode == 0, f"stdout:\n{res.stdout[-2000:]}\nstderr:\n{res.stderr[-3000:]}"

    written = spark.read.parquet(out)
    assert written.count() == 120
    assert {"url", "verdict", "scrubbed_text", "part_bucket"} <= set(written.columns)
    assert spark.read.parquet(str(tmp_path / "metrics")).count() > 0
