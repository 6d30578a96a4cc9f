"""MERGE upsert layer (operators/merge.py): S5/S7/S8 semantics.

merge_apply must implement exactly WHEN MATCHED UPDATE SET * / WHEN
NOT MATCHED INSERT *; MergeTable's parquet backend must materialize
the same state across generations; the Iceberg backend (real MERGE
INTO) runs when a catalog with the runtime jar is configured —
skipped in environments without one, with the SQL text still pinned.
"""

import pandas as pd
import pytest

from web_crawler_spark.operators.merge import (
    MergeTable,
    iceberg_catalog_available,
    merge_apply,
    merge_into_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["siteid", "url_key", "status", "round"])
    )


def test_merge_apply_semantics(spark):
    target = _df(spark, [(1, "a", 200, 1), (1, "b", 200, 1), (2, "a", 404, 1)])
    source = _df(spark, [(1, "b", 500, 2), (1, "c", 200, 2)])
    got = sorted(
        tuple(r)
        for r in merge_apply(target, source, ["siteid", "url_key"]).collect()
    )
    assert got == sorted(
        [
            (1, "a", 200, 1),  # unmatched target survives
            (1, "b", 500, 2),  # matched → source wins
            (1, "c", 200, 2),  # unmatched source inserted
            (2, "a", 404, 1),  # different siteid = different key
        ]
    )
    # None target = plain insert
    assert merge_apply(None, source, ["siteid", "url_key"]).count() == 2


def test_merge_into_sql_text():
    assert merge_into_sql("cat.db.t", "src", ["siteid", "url_key"]) == (
        "MERGE INTO cat.db.t t USING src s "
        "ON t.siteid = s.siteid AND t.url_key = s.url_key "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_merge_table_parquet_generations(spark, tmp_path):
    t = MergeTable(
        spark, "pages", ["siteid", "url_key"], path=str(tmp_path / "t")
    )
    assert t.current() is None
    t.merge(_df(spark, [(1, "a", 200, 1), (1, "b", 200, 1)]))
    t.merge(_df(spark, [(1, "b", 301, 2), (1, "c", 200, 2)]))
    t.merge(_df(spark, [(1, "a", 500, 3)]))
    got = sorted(tuple(r) for r in t.current().collect())
    assert got == sorted(
        [(1, "a", 500, 3), (1, "b", 301, 2), (1, "c", 200, 2)]
    )
    # exactly one generation dir remains after the swap
    assert len([d for d in (tmp_path / "t").iterdir()]) == 1


def test_merge_table_iceberg_requires_catalog(spark, tmp_path):
    with pytest.raises(RuntimeError, match="iceberg backend requested"):
        MergeTable(
            spark, "db.t", ["k"], catalog="nosuch", backend="iceberg"
        )
    # auto falls back to parquet when the catalog probe fails
    t = MergeTable(
        spark, "db.t", ["k"], path=str(tmp_path / "x"), catalog="nosuch"
    )
    assert t.backend == "parquet"


@pytest.mark.slow
def test_engine_upsert_pages(spark, tmp_path):
    """2-round crawl + resume with the S5 upsert table on: exactly one
    current row per visited (siteid, url_key), carrying its LAST visit
    round, across a resume boundary."""
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    cfg = WebGraphConfig(hosts=2, pages_per_host=8, www_alias_host0=False)
    pages = spark.createDataFrame(generate_pages(cfg))
    sites = spark.createDataFrame(generate_sites(cfg))
    ccfg = CrawlConfig(
        state_dir=str(tmp_path / "s"), upsert_pages=True, max_rounds=2
    )
    eng = CrawlEngine(spark, pages, sites, config=ccfg)
    eng.run(fresh=True)
    eng2 = CrawlEngine(
        spark, pages, sites,
        config=CrawlConfig(state_dir=str(tmp_path / "s"), upsert_pages=True),
    )
    eng2.resume()
    cur = eng2.pages_current().toPandas()
    visits = eng2.visits().toPandas()
    assert len(cur) == len(visits)
    assert set(map(tuple, cur[["siteid", "url_key"]].values)) == set(
        map(tuple, visits[["siteid", "url_key"]].values)
    )
    # round column = the visit round (each url visited exactly once)
    vr = visits.set_index(["siteid", "url_key"])["round"]
    cr = cur.set_index(["siteid", "url_key"])["round"]
    assert cr.sort_index().equals(vr.sort_index())


def _have_iceberg_jar() -> bool:
    import glob
    import os

    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return bool(glob.glob(os.path.join(jars, "iceberg-spark-runtime*")))


@pytest.mark.skipif(
    not _have_iceberg_jar(),
    reason="no iceberg-spark-runtime jar on the classpath",
)
def test_merge_table_iceberg_end_to_end(spark, tmp_path):
    """Real MERGE INTO path (runs wherever the Iceberg runtime jar is
    present): hadoop catalog in a temp warehouse, create-on-first-merge,
    row-level upsert on the second."""
    spark.conf.set(
        "spark.sql.catalog.icetest", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.icetest.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.icetest.warehouse", str(tmp_path / "wh")
    )
    assert iceberg_catalog_available(spark, "icetest")
    t = MergeTable(
        spark, "db.pages", ["siteid", "url_key"], catalog="icetest"
    )
    assert t.backend == "iceberg"
    t.merge(_df(spark, [(1, "a", 200, 1), (1, "b", 200, 1)]))
    t.merge(_df(spark, [(1, "b", 301, 2), (1, "c", 200, 2)]))
    got = sorted(tuple(r) for r in t.current().collect())
    assert got == sorted(
        [(1, "a", 200, 1), (1, "b", 301, 2), (1, "c", 200, 2)]
    )
