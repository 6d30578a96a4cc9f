"""Politeness dequeue + robots matcher tests, and the engine-level
guarantee that per-host caps defer (never drop) frontier rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.operators.politeness import dequeue_batch, host_budgets
from web_crawler_spark.operators.robots import RobotsMatcher


@pytest.fixture(scope="module")
def frontier(spark):
    rows = []
    for h, n in (("a.test", 7), ("b.test", 2), ("hot.test", 40)):
        for j in range(n):
            rows.append((1, f"https://{h}/p{j}", h, 0, 1, j, j, None))
    return spark.createDataFrame(
        rows,
        "siteid int, url_key string, host string, host_bucket int, "
        "depth int, parent_ord long, link_idx int, parent_key string",
    ).cache()


def test_no_cap_passthrough(frontier):
    batch, deferred = dequeue_batch(frontier, None, None)
    assert batch.count() == 49 and deferred.count() == 0


def test_per_host_cap(frontier):
    batch, deferred = dequeue_batch(frontier, max_per_host=3)
    b = batch.toPandas()
    assert b.groupby("host").size().max() <= 3
    assert len(b) == 3 + 2 + 3  # b.test only has 2
    assert deferred.count() == 49 - 8
    # lowest priority (parent_ord, link_idx) rows chosen
    a_rows = sorted(b[b["host"] == "a.test"]["link_idx"])
    assert a_rows == [0, 1, 2]


def test_salted_equals_unsalted(frontier):
    b0, d0 = dequeue_batch(frontier, max_per_host=5)
    b1, d1 = dequeue_batch(frontier, max_per_host=5, num_salts=4)
    key = lambda df: sorted(r["url_key"] for r in df.collect())  # noqa: E731
    assert key(b0) == key(b1)
    assert key(d0) == key(d1)
    # deferred schema unchanged (union path drops helper cols)
    assert set(d1.columns) == set(frontier.columns)


def test_budgets_from_crawl_delay(spark, frontier):
    robots = spark.createDataFrame(
        [
            ("a.test", "*", "allow", "/", 200),
            ("hot.test", "*", "allow", "/", 50),
        ],
        "host string, user_agent string, rule_type string, "
        "path_prefix string, crawl_delay_ms int",
    )
    budgets = host_budgets(robots, round_budget_ms=1000, default_tokens=4)
    got = {r["host"]: r["_tokens"] for r in budgets.collect()}
    assert got == {"a.test": 5, "hot.test": 20}
    batch, _ = dequeue_batch(frontier, max_per_host=4, budgets=budgets)
    per_host = batch.toPandas().groupby("host").size().to_dict()
    assert per_host == {"a.test": 5, "b.test": 2, "hot.test": 20}


def test_robots_rfc9309():
    m = RobotsMatcher(
        [
            ("h.test", "disallow", "/private/"),
            ("h.test", "allow", "/private/public/"),
            ("h.test", "disallow", "/*.pdf$"),
            ("h.test", "disallow", "/tmp"),
            ("h.test", "allow", "/tmp"),  # tie → allow wins
        ]
    )
    assert m.allowed("h.test", "/anything")
    assert not m.allowed("h.test", "/private/x")
    assert m.allowed("h.test", "/private/public/x")  # longest match wins
    assert not m.allowed("h.test", "/docs/file.pdf")  # wildcard + $ anchor
    assert m.allowed("h.test", "/docs/file.pdfx")  # $ anchor is exact
    assert m.allowed("h.test", "/tmp/x")  # tie → allow
    assert m.allowed("other.test", "/private/x")  # no rules → allowed


def test_engine_cap_defers_never_drops(spark, tmp_path):
    """With a per-host cap the crawl takes more rounds but reaches the
    SAME final seen set and document set — the explicit divergence from
    the reference's silent queue-overflow drop."""
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    cfg = WebGraphConfig(hosts=2, pages_per_host=10)
    pages = spark.createDataFrame(generate_pages(cfg))
    sites = spark.createDataFrame(generate_sites(cfg))

    results = {}
    for name, cap in (("nocap", None), ("cap3", 3)):
        eng = CrawlEngine(
            spark, pages, sites,
            config=CrawlConfig(
                state_dir=str(tmp_path / name), max_per_host_round=cap
            ),
        )
        stats = eng.run(fresh=True)
        fl = eng.read_all("fetch_log").toPandas()
        results[name] = {
            "seen": sorted(r["url_key"] for r in eng.seen_keys().collect()),
            "visited": sorted(fl["url_key"]),
            "rounds": stats.rounds,
            "fetch_log": fl,
        }
    assert results["nocap"]["seen"] == results["cap3"]["seen"]
    assert results["nocap"]["visited"] == results["cap3"]["visited"]
    assert results["cap3"]["rounds"] > results["nocap"]["rounds"]
    # cap respected every round: ≤3 fetches per host per round
    fl = results["cap3"]["fetch_log"]
    fl["host"] = fl["url_key"].str.extract(r"https://([^/]+)")
    assert fl.groupby(["round", "host"]).size().max() <= 3


def test_resume_with_deferred_backlog(spark, tmp_path):
    """Kill a capped crawl while deferred rows sit in the frontier
    snapshot, resume with a fresh engine: the backlog must survive the
    restart — final seen/visited sets equal the uncapped run and the
    cap holds across both phases."""
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    cfg = WebGraphConfig(hosts=2, pages_per_host=10)
    pages = spark.createDataFrame(generate_pages(cfg))
    sites = spark.createDataFrame(generate_sites(cfg))

    ref = CrawlEngine(
        spark, pages, sites,
        config=CrawlConfig(state_dir=str(tmp_path / "nocap")),
    )
    ref.run(fresh=True)
    want_seen = sorted(r["url_key"] for r in ref.seen_keys().collect())
    want_visited = sorted(
        ref.read_all("fetch_log").toPandas()["url_key"]
    )

    state = str(tmp_path / "capped")
    eng1 = CrawlEngine(
        spark, pages, sites,
        config=CrawlConfig(
            state_dir=state, max_per_host_round=3, max_rounds=3
        ),
    )
    stats1 = eng1.run(fresh=True)
    # the interrupt landed MID-BACKLOG: the last committed round deferred
    # rows, which now live only in the durable frontier snapshot
    assert stats1.per_round[-1]["deferred"] > 0

    eng2 = CrawlEngine(
        spark, pages, sites,
        config=CrawlConfig(state_dir=state, max_per_host_round=3),
    )
    eng2.resume()
    assert (
        sorted(r["url_key"] for r in eng2.seen_keys().collect()) == want_seen
    )
    fl = eng2.read_all("fetch_log").toPandas()
    assert sorted(fl["url_key"]) == want_visited
    fl["host"] = fl["url_key"].str.extract(r"https://([^/]+)")
    assert fl.groupby(["round", "host"]).size().max() <= 3
