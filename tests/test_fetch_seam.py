"""Fetch-seam, diff-artifact, and baseline-upsert tests.

The mapInPandas callback fetcher must produce a crawl IDENTICAL to the
synthetic equi-join fetch; the diff artifact must mirror the reference's
side-by-side semantics; baseline upsert must count created/updated."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.fixtures.webgraph import (
    WebGraphConfig,
    generate_pages,
    generate_sites,
)


def test_callback_fetch_equals_join_fetch(spark, tmp_path):
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.operators.fetch import make_lookup_fetcher

    cfg = WebGraphConfig(hosts=2, pages_per_host=10)
    pages_pdf = generate_pages(cfg)
    pages = spark.createDataFrame(pages_pdf)
    sites = spark.createDataFrame(generate_sites(cfg))

    results = {}
    for name, fetcher in (
        ("join", None),
        ("callback", make_lookup_fetcher(pages_pdf)),
    ):
        eng = CrawlEngine(
            spark, pages, sites,
            config=CrawlConfig(state_dir=str(tmp_path / name)),
            fetcher=fetcher,
        )
        eng.run(fresh=True)
        results[name] = {
            "visits": sorted(
                (r["url_key"], r["visit_ord"], r["depth"])
                for r in eng.visits().collect()
            ),
            "fetch": sorted(
                (r["url_key"], r["status_code"], r["success"])
                for r in eng.read_all("fetch_log").collect()
            ),
            "seen": sorted(r["url_key"] for r in eng.seen_keys().collect()),
        }
    assert results["join"] == results["callback"]


def test_diff_artifact_semantics():
    from web_crawler_spark.oracle.diffs import (
        collect_change_ranges,
        diff_artifact,
        render_html_diff,
    )

    base = "<html><body><p>alpha</p><p>beta</p><p>gamma</p></body></html>"
    obs = "<html><body><p>alpha</p><p>CHANGED</p><p>gamma</p></body></html>"
    art = diff_artifact(base, obs, context=1)
    assert art["changed"]
    assert art["tallies"]["mod"] >= 1
    classes = [r["cls"] for blk in art["blocks"] for r in blk]
    assert "ctx" in classes and "mod" in classes
    # mod rows carry both sides with line numbers
    mods = [r for blk in art["blocks"] for r in blk if r["cls"] == "mod"]
    assert any(
        r["a"].strip() == "beta" and r["b"].strip() == "CHANGED" for r in mods
    )

    html = render_html_diff("https://x.test/p", art)
    assert "<th colspan='2'>Baseline</th>" in html
    assert "tr class='mod'" in html

    same = diff_artifact(base, base)
    assert not same["changed"]
    assert "No changes detected." in render_html_diff("u", same)


def test_diff_insert_delete_rows():
    from web_crawler_spark.oracle.diffs import diff_artifact

    base = "<body><p>one</p><p>two</p></body>"
    obs = "<body><p>one</p><p>two</p><p>three</p></body>"
    art = diff_artifact(base, obs)
    adds = [r for blk in art["blocks"] for r in blk if r["cls"] == "add"]
    assert adds and all(r["a"] == "" and r["a_ln"] == "" for r in adds)

    art2 = diff_artifact(obs, base)
    dels = [r for blk in art2["blocks"] for r in blk if r["cls"] == "del"]
    assert dels and all(r["b"] == "" and r["b_ln"] == "" for r in dels)


def test_compare_include_diff(spark):
    from web_crawler_spark.engine.compare import (
        build_baselines,
        compare_observations,
        observe_pages,
    )

    pages = generate_pages(WebGraphConfig(hosts=1, pages_per_host=6))
    pages = pages[pages["content_type"].str.contains("text/html")].copy()
    pages["siteid"] = 1
    obs = pages.copy().reset_index(drop=True)
    obs.loc[1, "html"] = "<html><body><h1>DEFACED</h1></body></html>"
    base = build_baselines(
        spark.createDataFrame(pages).withColumnRenamed("url", "url_key")
    )
    o = observe_pages(
        spark.createDataFrame(obs).withColumnRenamed("url", "url_key")
    )
    out = compare_observations(o, base, include_diff=True).toPandas()
    changed = out[out["changed"]]
    assert len(changed) == 1
    art = json.loads(changed.iloc[0]["diff_artifact"])
    assert art["changed"] and art["blocks"]
    assert out[~out["changed"]]["diff_artifact"].isna().all()


def test_baseline_upsert_actions(spark):
    from web_crawler_spark.engine.compare import baseline_upsert

    p1 = spark.createDataFrame(
        [(1, "https://h.test/a", "<p>A</p>"), (1, "https://h.test/b", "<p>B</p>")],
        "siteid int, url_key string, html string",
    )
    merged, actions = baseline_upsert(None, p1)
    assert {r["action"]: r["count"] for r in actions.collect()} == {"created": 2}
    assert merged.count() == 2

    p2 = spark.createDataFrame(
        [
            (1, "https://h.test/b", "<p>B2</p>"),  # update
            (1, "https://h.test/c", "<p>C</p>"),  # create
        ],
        "siteid int, url_key string, html string",
    )
    merged2, actions2 = baseline_upsert(merged, p2)
    assert {r["action"]: r["count"] for r in actions2.collect()} == {
        "created": 1,
        "updated": 1,
    }
    got = {
        r["url_key"]: r["baseline_html"] for r in merged2.collect()
    }
    assert got["https://h.test/b"] == "<p>B2</p>"  # overwrite-in-place
    assert set(got) == {
        "https://h.test/a", "https://h.test/b", "https://h.test/c"
    }


# ---------------------------------------------------------------------------
# production HTTP fetcher (offline: injected fake session)
# ---------------------------------------------------------------------------


class _FakeResponse:
    def __init__(self, status, body="", content_type="text/html"):
        self.status_code = status
        self.text = body
        self.headers = {"Content-Type": content_type}


class _FakeSession:
    """Scripted server: /retry returns 429 twice then 200; /down raises;
    /gone 404; everything else 200 HTML."""

    def __init__(self):
        self.retry_hits = 0
        self.seen_headers = []

    def get(self, url, headers=None, timeout=None, allow_redirects=None,
            verify=None):
        self.seen_headers.append(dict(headers or {}))
        if url.endswith("/down"):
            raise ConnectionError("refused")
        if url.endswith("/retry"):
            self.retry_hits += 1
            if self.retry_hits <= 2:
                return _FakeResponse(429)
            return _FakeResponse(200, "<html>ok after retry</html>")
        if url.endswith("/gone"):
            return _FakeResponse(404, "nope")
        return _FakeResponse(200, "<html><body>hi</body></html>")


def test_http_fetcher_semantics():
    """Reference fetch semantics offline: UA header sent, 429 retried
    (≤2, fetcher.py:17-18,35-39), connection errors drop the row,
    non-2xx statuses flow through for the admission filter."""
    import pandas as pd

    from web_crawler_spark.operators.fetch import make_http_fetcher

    fetch = make_http_fetcher(
        user_agent="ua-test", backoff_s=0, session_factory=_FakeSession
    )
    req = pd.DataFrame(
        {
            "url_key": [
                "https://h.test/",
                "https://h.test/retry",
                "https://h.test/gone",
                "https://h.test/down",
            ],
            "host": ["h.test"] * 4,
        }
    )
    out = fetch(req).set_index("url_key")
    assert "https://h.test/down" not in out.index  # dropped ⇒ conn error
    assert out.loc["https://h.test/", "status_code"] == 200
    assert out.loc["https://h.test/retry", "status_code"] == 200
    assert out.loc["https://h.test/retry", "first_attempts_429"] == 2
    assert out.loc["https://h.test/gone", "status_code"] == 404
    assert out.loc["https://h.test/", "content_length"] > 0


def test_http_fetcher_through_engine_seam(spark):
    """The HTTP fetcher plugs into fetch_with_callback (mapInPandas per
    host_bucket) and produces the engine's fetch-result columns. The
    fake session is defined locally so cloudpickle ships it by value
    (test modules aren't importable on executors)."""
    from web_crawler_spark.operators.fetch import (
        fetch_with_callback,
        make_http_fetcher,
    )

    class LocalResponse:
        def __init__(self):
            self.status_code = 200
            self.text = "<html><body>hi</body></html>"
            self.headers = {"Content-Type": "text/html"}

    class LocalSession:
        def get(self, url, headers=None, timeout=None,
                allow_redirects=None, verify=None):
            return LocalResponse()

    batch = spark.createDataFrame(
        [(1, "https://h.test/", "h.test", 0)],
        "siteid int, url_key string, host string, host_bucket int",
    )
    fetched = fetch_with_callback(
        batch, make_http_fetcher(backoff_s=0, session_factory=LocalSession), 4
    ).collect()
    assert len(fetched) == 1
    r = fetched[0]
    assert r["status_code"] == 200 and "hi" in r["html"]


def test_fullcrawl_robust_fetcher_splits_unknown_paths():
    """bench_fullcrawl.robust_fetcher: real page URLs go through the
    synthetic fetcher; URL shapes the generator can't invert (which on
    a live crawl would 404) come back as 404 rows with the same
    columns, so one malformed admitted link can't kill a scale run."""
    import pandas as pd

    from bench_fullcrawl import robust_fetcher

    fetch = robust_fetcher(hosts=4, pages_per_host=200)
    req = pd.DataFrame(
        {
            "url_key": [
                "https://host0.example.test/",
                "https://host0.example.test/p5",
                "https://host0.example.test/page/2/",  # pagination shape
                "https://host0.example.test/tag/news",
            ]
        }
    )
    out = fetch(req).set_index("url_key")
    assert int(out.loc["https://host0.example.test/", "status_code"]) == 200
    assert int(out.loc["https://host0.example.test/p5", "status_code"]) == 200
    assert out.loc["https://host0.example.test/p5", "html"]
    for bad in ("https://host0.example.test/page/2/",
                "https://host0.example.test/tag/news"):
        assert int(out.loc[bad, "status_code"]) == 404
        assert out.loc[bad, "html"] is None
    assert len(out) == len(req)
