"""Engine metrics / lineage / consistency views (F6, F8, A2) and the
SO5 token-multiset operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.oracle.scoring import token_multiset


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    cfg = WebGraphConfig(hosts=2, pages_per_host=10)
    eng = CrawlEngine(
        spark,
        spark.createDataFrame(generate_pages(cfg)),
        spark.createDataFrame(generate_sites(cfg)),
        config=CrawlConfig(
            state_dir=str(tmp_path_factory.mktemp("metrics_state"))
        ),
    )
    eng.run(fresh=True)
    return eng


def test_metrics_table(engine):
    m = engine.metrics().orderBy("round").toPandas()
    assert len(m) == len(
        set(m["round"])
    ), "one metrics row per committed round"
    # totals reconcile with the fetch log
    assert m["visited"].sum() == engine.read_all("fetch_log").count()
    assert m["documents"].sum() == engine.read_all("documents").count()
    assert (m["deferred"] == 0).all()  # no politeness cap in this run


def test_partition_lineage(engine):
    lin = engine.partition_lineage().toPandas()
    assert (lin["frontier_rows"] > 0).any()
    # every seen key traces to a (round, host_bucket) cell
    assert lin["seen_keys"].sum() == engine.read_all("seen").count()
    assert lin["host_bucket"].nunique() >= 2  # multi-bucket isolation


def test_consistency_check(engine):
    totals = engine.consistency_check()
    assert totals["total"] == totals["ok"] + totals["ignored"] + totals["failed"]
    assert totals["total"] > 0


def test_token_multiset_equality(spark):
    from web_crawler_spark.functions.html import (
        token_multiset_col,
        token_multiset_equal_col,
    )

    a = "<html><body><p>Hello world hello</p></body></html>"
    b = "<div>hello HELLO <b>world</b></div>"  # same multiset, diff markup
    c = "<p>hello world</p>"  # different multiset
    df = spark.createDataFrame([(a, b), (a, c)], "x string, y string")
    got = df.select(token_multiset_equal_col(F.col("x"), F.col("y")).alias("eq")).collect()
    assert [r["eq"] for r in got] == [True, False]

    # parity with the pure-Python oracle (detector.py:34-37 semantics)
    toks = df.select(token_multiset_col(F.col("x")).alias("t")).first()["t"]
    oracle = token_multiset(a)
    assert sorted(toks) == sorted(
        w for w, n in oracle.items() for _ in range(n)
    )
