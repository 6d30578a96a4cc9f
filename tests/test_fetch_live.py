"""Real-socket fetch integration (r5, verdict task 6): the production
seam (`make_http_fetcher` → `fetch_with_callback` /
`fetch_parse_with_callback` inside mapInPandas) has until now only
been parity-tested against fake in-memory sessions. Here a REAL
threaded `http.server` serves a small site with latency, 429-then-OK,
redirect, 404, and hang behaviors, and the fetch runs through real
`requests` over TCP from Spark python workers — outcome
classification per crawler/fetcher.py:12-87 (429 retry budget 2 with
backoff, timeouts/conn errors drop the row, non-2xx flows through to
the admission filter).

One impedance note: the engine normalizes every url_key to https
(reference normalizer semantics, crawler/normalizer.py), so the test
session rewrites the scheme back to http for the plaintext local
server — everything else (DNS, sockets, redirects, timeouts, headers)
is the real requests stack.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

PAGES = {
    "/": "<html><body><a href='/a'>a</a> <a href='/b'>b</a>"
         " <a href='/flaky'>f</a> <a href='/gone'>g</a>"
         " <a href='#frag'>skip</a>"
         " <a href='https://other.example/off'>off</a></body></html>",
    "/a": "<html><body><a href='/b'>b</a> <a href='/c'>c</a></body></html>",
    "/b": "<html><body><a href='/'>home</a></body></html>",
    "/c": "<html><body>leaf</body></html>",
    "/flaky": "<html><body>ok after 429s</body></html>",
}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):
        import time

        srv = self.server
        with srv.lock:
            srv.hits[self.path] = srv.hits.get(self.path, 0) + 1
            n = srv.hits[self.path]
        if self.path == "/flaky" and n <= 2:
            self.send_response(429)
            self.send_header("Retry-After", "0")
            self.end_headers()
            return
        if self.path == "/redir":
            self.send_response(302)
            self.send_header("Location", "/c")
            self.end_headers()
            return
        if self.path == "/hang":
            time.sleep(3.0)  # far past the client timeout
            self.send_response(200)
            self.end_headers()
            return
        if self.path == "/slow":
            time.sleep(0.3)
            body = b"<html><body>slow but fine</body></html>"
        elif self.path in PAGES:
            body = PAGES[self.path].encode()
        else:
            self.send_response(404)
            self.send_header("Content-Type", "text/html")
            body = b"<html><body>nope</body></html>"
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def live_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.daemon_threads = True
    srv.lock = threading.Lock()
    srv.hits = {}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


_FACTORY_SRC = '''
def _session_factory():
    """Real requests.Session mapping the engine's https-normalized
    url_keys back to the plaintext local server. Built from source in
    a scratch namespace so cloudpickle ships it BY VALUE — test
    modules are not importable inside Spark python workers."""
    import requests

    class SchemeMapSession(requests.Session):
        def get(self, url, **kw):
            return requests.Session.get(
                self, url.replace("https://", "http://", 1), **kw
            )

    return SchemeMapSession()
'''


def _make_session_factory():
    ns: dict = {"__name__": "__wcs_live_scratch__"}
    exec(_FACTORY_SRC, ns)
    return ns["_session_factory"]


def test_http_fetcher_against_live_server(spark, live_server):
    """Batch fetch over real sockets: 200s, 404 flow-through,
    429→backoff→200 with the retry count recorded, redirect followed,
    hung connection dropped as a missing row."""
    import pandas as pd

    from web_crawler_spark.operators.fetch import (
        fetch_with_callback,
        make_http_fetcher,
    )

    srv, host = live_server
    fetch = make_http_fetcher(
        timeout_s=0.75, backoff_s=0.05, session_factory=_make_session_factory()
    )
    urls = ["/", "/a", "/flaky", "/redir", "/gone", "/hang", "/slow"]
    batch = spark.createDataFrame(
        [(i, f"https://{host}{u}", host, i % 4)
         for i, u in enumerate(urls)],
        "siteid int, url_key string, host string, host_bucket int",
    )
    rows = fetch_with_callback(batch, fetch, 4).collect()
    by_path = {r["url_key"].rsplit(host, 1)[1]: r for r in rows
               if r["status_code"] is not None}

    assert by_path["/"]["status_code"] == 200
    assert "<a href='/a'>" in by_path["/"]["html"]
    assert by_path["/"]["content_type"].startswith("text/html")
    # 429 twice then 200 — within the reference's 2-retry budget
    assert by_path["/flaky"]["status_code"] == 200
    assert by_path["/flaky"]["first_attempts_429"] == 2
    assert srv.hits["/flaky"] == 3
    # redirect followed transparently: /redir row carries /c's body
    assert by_path["/redir"]["status_code"] == 200
    assert "leaf" in by_path["/redir"]["html"]
    # non-2xx flows through for the admission filter to classify
    assert by_path["/gone"]["status_code"] == 404
    # hung socket ⇒ timeout ⇒ dropped row (connection error downstream)
    assert "/hang" not in by_path
    assert by_path["/slow"]["response_time_ms"] >= 300


def test_engine_crawl_against_live_server(spark, live_server, tmp_path):
    """Short end-to-end crawl through the production seam (fused
    fetch+parse mapInPandas, ordered commits) against the live server
    with the politeness cap on: BFS discovers the whole site from the
    seed over multiple rounds, the 429 page retries to success, the
    404 is classified, and offsite/fragment links never hit the
    server."""
    from pyspark.sql import functions as F

    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
    )
    from web_crawler_spark.operators.fetch import make_http_fetcher

    srv, host = live_server
    with srv.lock:
        srv.hits.clear()
    sites = spark.createDataFrame(
        [(1, 100, f"http://{host}", True)],
        "siteid int, custid int, url string, enabled boolean",
    )
    # pages table is unused on the fetcher path — any conforming frame
    pages = spark.createDataFrame(
        generate_pages(WebGraphConfig(hosts=1, pages_per_host=1))
    )
    eng = CrawlEngine(
        spark, pages, sites,
        config=CrawlConfig(
            state_dir=str(tmp_path / "live"),
            max_per_host_round=2,  # politeness: ≤2 fetches/host/round
        ),
        fetcher=make_http_fetcher(
            timeout_s=2.0, backoff_s=0.05, session_factory=_make_session_factory()
        ),
    )
    stats = eng.run(fresh=True)

    visited = {r["url_key"].rsplit(host, 1)[1]
               for r in eng.visits().collect()}
    assert visited == {"/", "/a", "/b", "/c", "/flaky", "/gone"}
    # politeness cap forces the 6-page BFS across ≥3 rounds
    assert stats.rounds >= 3
    assert stats.total_visits == 6

    log = {r["url_key"].rsplit(host, 1)[1]: r
           for r in eng.read_all("fetch_log").collect()}
    # retries-to-success: the log row is a 200, the server saw 3 hits
    assert log["/flaky"]["success"] and log["/flaky"]["status_code"] == 200
    assert not log["/gone"]["success"] and log["/gone"]["status_code"] == 404
    assert log["/"]["success"] and log["/a"]["success"]
    # fragment + offsite links were admission-filtered, never fetched
    assert all(not p.startswith("/off") for p in srv.hits)
    # each served page hit exactly once (flaky: 2×429 + 1 OK)
    assert srv.hits["/flaky"] == 3
    assert srv.hits["/a"] == 1 and srv.hits["/gone"] == 1
