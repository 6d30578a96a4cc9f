"""Element-wise parity: vectorized UDFs and native Catalyst expressions
must equal the pure-Python kernels on the URL battery (SURVEY.md §5 (1))."""

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import URL_CASES
from web_crawler_spark.functions import urls as U
from web_crawler_spark.oracle import semantics as sem


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"url": [u for u in URL_CASES if u]})
    )


def test_normalize_udf_parity(spark):
    got = {
        r["url"]: r["n"]
        for r in _df(spark).select("url", U.normalize_url_udf("url").alias("n")).collect()
    }
    for u in URL_CASES:
        if u:
            assert got[u] == sem.normalize_fetch_url(u), u


def test_canonical_id_udf_parity(spark):
    base = "https://www.example.com"
    df = _df(spark).withColumn("base", F.lit(base))
    got = {
        r["url"]: r["c"]
        for r in df.select(
            "url", U.canonical_id_udf("url", "base").alias("c")
        ).collect()
    }
    for u in URL_CASES:
        if u:
            assert got[u] == sem.canonical_id(u, base), u


def test_classify_block_native_vs_python(spark):
    df = _df(spark).select(
        "url",
        U.classify_block_col(F.col("url")).alias("native"),
        U.classify_block_udf("url").alias("py"),
    )
    for r in df.collect():
        expected = sem.classify_block(r["url"])
        assert r["native"] == expected, f"native {r['url']}: {r['native']} != {expected}"
        assert r["py"] == expected, f"py {r['url']}"


def test_allowed_domain_native_parity(spark):
    seeds = ["https://example.com", "https://www.example.com", "http://example.com:8080"]
    rows = [(s, u) for s in seeds for u in URL_CASES if u]
    df = spark.createDataFrame(rows, "seed string, u string").select(
        "seed", "u",
        U.allowed_domain_col(F.col("seed"), F.col("u")).alias("native"),
    )
    for r in df.collect():
        assert r["native"] == sem.allowed_domain(r["seed"], r["u"]), (r["seed"], r["u"])


def test_is_same_site_native_parity(spark):
    base = "example.com"
    df = _df(spark).select(
        "url",
        U.is_same_site_col(F.col("url"), F.lit(base)).alias("native"),
    )
    for r in df.collect():
        assert r["native"] == sem.is_same_site(r["url"], base), r["url"]


def test_classify_url_native_parity(spark):
    """X2 native (classify_url_col, Catalyst rlike battery) must match
    the pure-Python kernel label-for-label on the URL battery."""
    got = {
        r["url"]: r["labels"]
        for r in _df(spark)
        .select("url", U.classify_url_col(F.col("url")).alias("labels"))
        .collect()
    }
    for u in URL_CASES:
        if u:
            assert got[u] == sem.classify_url(u), u


def test_classify_url_udf_parity(spark):
    got = {
        r["url"]: r["labels"]
        for r in _df(spark)
        .select("url", U.classify_url_udf("url").alias("labels"))
        .collect()
    }
    for u in URL_CASES:
        if u:
            assert got[u] == sem.classify_url(u), u
