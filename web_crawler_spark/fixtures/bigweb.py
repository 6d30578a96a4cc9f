"""Distributed synthetic web generator for scale benchmarks.

`generate_pages_df` builds the same page HTML as fixtures.webgraph but
ON EXECUTORS via mapInPandas over a spark.range — the driver never
holds the corpus. Used by bench_scaling.py to synthesize 10^5..10^6
page frontiers (the sandbox proxy for the 10^10-URL target; the
generator itself is O(rows/partition) and scales with the cluster).
"""

from __future__ import annotations

import random
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from web_crawler_spark.fixtures.webgraph import (
    WebGraphConfig,
    _build_html,
    _host_name,
    _page_url,
)


def generate_pages_df(
    spark: SparkSession,
    hosts: int = 50,
    pages_per_host: int = 2000,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """pages(url, host, status_code, content_type, html, rendered_html,
    first_attempts_429, response_time_ms, fetch_latency_ms,
    content_length) — all 200/text-html (failure modes are unit-tested
    at small scale; the scale bench measures the hot path)."""
    cfg = WebGraphConfig(
        hosts=hosts, pages_per_host=pages_per_host, seed=seed,
        www_alias_host0=False,
    )
    n = hosts * pages_per_host
    parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    base = spark.range(0, n, 1, parts)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                h, j = int(i) % hosts, int(i) // hosts
                host = _host_name(cfg, h)
                rng = random.Random(zlib.crc32(f"{seed}|{host}|{j}".encode()))
                html = _build_html(cfg, host, j, pages_per_host, rng)
                rows.append(
                    {
                        "url": _page_url(host, j),
                        "host": host,
                        "status_code": 200,
                        "content_type": "text/html; charset=utf-8",
                        "html": html,
                        "rendered_html": None,
                        "first_attempts_429": 0,
                        "response_time_ms": 20 + (j * 13) % 180,
                        "fetch_latency_ms": 10 + (j * 7) % 90,
                        "content_length": len(html),
                    }
                )
            yield pd.DataFrame(rows)

    schema = (
        "url string, host string, status_code int, content_type string, "
        "html string, rendered_html string, first_attempts_429 int, "
        "response_time_ms int, fetch_latency_ms int, content_length long"
    )
    return base.mapInPandas(build, schema=schema)


def generate_frontier_df(
    spark: SparkSession,
    pages: DataFrame,
    num_host_buckets: int = 64,
) -> DataFrame:
    """A one-round frontier covering every page (depth 1, synthetic
    parent ordinals) — the dequeue output a mid-crawl round would see."""
    from pyspark.sql import functions as F

    return pages.select(
        F.lit(1).alias("siteid"),
        F.col("url").alias("url_key"),
        "host",
        F.pmod(F.xxhash64("host"), F.lit(num_host_buckets)).cast("int").alias(
            "host_bucket"
        ),
        F.lit(1).alias("depth"),
        F.xxhash64("url").bitwiseAND(F.lit(0x7FFFFFFF)).cast("long").alias(
            "parent_ord"
        ),
        (F.xxhash64("url", F.lit(1)).bitwiseAND(F.lit(0xFFFF))).cast("int").alias(
            "link_idx"
        ),
        F.lit(None).cast("string").alias("parent_key"),
    )


def make_synthetic_fetcher(
    hosts: int = 50, pages_per_host: int = 2000, seed: int = 42
):
    """Deterministic in-executor fetch callback (operators/fetch.py
    FetchFn contract): synthesizes, from the URL alone, the exact page
    a generate_pages_df row carries — the PRODUCTION fetch shape. The
    payload is born inside the fetch task and (with the engine's
    parse-in-stage plan) dies inside the same stage: no pages table,
    no join, no exchange ever carries html. URL inverse of
    webgraph._page_url: https://{host}/ (j=0) or https://{host}/p{j}."""
    from urllib.parse import urlparse

    cfg = WebGraphConfig(
        hosts=hosts, pages_per_host=pages_per_host, seed=seed,
        www_alias_host0=False,
    )

    def fetch(req: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for u in req["url_key"]:
            p = urlparse(u)
            host, path = p.netloc, p.path
            j = 0 if path in ("", "/") else int(path[2:].rstrip("/"))
            rng = random.Random(zlib.crc32(f"{seed}|{host}|{j}".encode()))
            html = _build_html(cfg, host, j, pages_per_host, rng)
            rows.append(
                {
                    "url_key": u,
                    "status_code": 200,
                    "content_type": "text/html; charset=utf-8",
                    "html": html,
                    "rendered_html": None,
                    "first_attempts_429": 0,
                    "response_time_ms": 20 + (j * 13) % 180,
                    "content_length": len(html),
                }
            )
        return pd.DataFrame(rows)

    return fetch
