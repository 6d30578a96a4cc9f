"""U8 mangle parity + S6 blob sink (engine/artifacts.py)."""

import os

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import URL_CASES
from web_crawler_spark.engine.artifacts import (
    write_baseline_blobs,
    write_diff_artifacts,
)
from web_crawler_spark.functions.urls import safe_filename, safe_filename_col


def _reference_mangle(url: str) -> str:
    """Direct port of baseline_utils.py:7-12 (minus the inner
    normalize, which our url_key inputs already carry)."""
    return (
        url.replace("://", "__").replace("/", "_").replace("?", "_")
        .replace("&", "_")
    )


def test_safe_filename_parity(spark):
    urls = [u for u in URL_CASES if u]
    got = (
        spark.createDataFrame(pd.DataFrame({"u": urls}))
        .select(safe_filename_col(F.col("u")).alias("m"))
        .toPandas()["m"]
        .tolist()
    )
    for u, m in zip(urls, got):
        assert m == _reference_mangle(u) == safe_filename(u), u


def test_write_baseline_blobs(spark, tmp_path):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "siteid": [1, 1, 2],
                "custid": [100, 100, 101],
                "url_key": [
                    "https://a.test",
                    "https://a.test/p?x=1&y=2",
                    "https://b.test/q",
                ],
                "baseline_html": ["<html>a</html>", " <html>b</html> ", "<html>c</html>"],
            }
        )
    )
    root = str(tmp_path / "blobs")
    manifest = write_baseline_blobs(df, root).toPandas()
    assert len(manifest) == 3
    for r in manifest.itertuples(index=False):
        assert os.path.exists(r.path)
        assert r.n_bytes == os.path.getsize(r.path)
    # reference layout: root/custid/siteid/mangled.html, stripped content
    p = os.path.join(root, "100", "1", "https__a.test_p_x=1_y=2.html")
    assert open(p).read() == "<html>b</html>"
    # idempotent overwrite (task-retry safety)
    write_baseline_blobs(df, root).collect()
    assert open(p).read() == "<html>b</html>"


def test_write_diff_artifacts(spark, tmp_path):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "siteid": [1, 1],
                "url_key": ["https://a.test", "https://a.test/x"],
                "changed": [True, False],
                "diff_artifact": ['{"d": 1}', None],
            }
        )
    )
    root = str(tmp_path / "diffs")
    manifest = write_diff_artifacts(df, root).toPandas()
    assert len(manifest) == 1  # only changed rows persist
    assert open(manifest.iloc[0]["path"]).read() == '{"d": 1}'
