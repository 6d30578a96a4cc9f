"""spark-submit --py-files packaging path (north rule): the crawl
engine must run from a zipped package with no repo checkout on the
executors' path."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    zip_base = str(tmp_path / "wcs_pyfiles")
    shutil.make_archive(zip_base, "zip", REPO, "web_crawler_spark")
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    state = str(tmp_path / "state")
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_base + ".zip",
            os.path.join(REPO, "tools", "submit_crawl.py"),
            "--hosts", "2", "--pages", "8", "--state", state,
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo root: the zip must provide the pkg
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(
        ln for ln in proc.stdout.splitlines()
        if ln.startswith("{") and "total_visits" in ln
    )
    out = json.loads(line)
    assert out["rounds"] >= 2 and out["total_visits"] >= 5, out
