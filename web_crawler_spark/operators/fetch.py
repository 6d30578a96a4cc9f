"""Batch fetch seam: executors fetch, the driver never does.

The engine's default fetch is an equi-join against a synthetic pages
table (deterministic tests, no network). This module is the PRODUCTION
seam the north star names: fetch batches execute inside mapInPandas,
partitioned by host_bucket so one partition owns one politeness domain
— per-host pacing (token bucket, 429 backoff with the reference's
2-retry budget, fetcher.py:17-18,35-39) lives entirely inside the
partition, and adding executors adds fetch capacity linearly.

`fetch_fn` contract: pd.DataFrame[url_key, host] →
pd.DataFrame[url_key, status_code, content_type, html, rendered_html,
first_attempts_429, response_time_ms, content_length] (missing rows =
connection errors; extra rows ignored). A production impl wraps
requests/aiohttp + robots + token bucket; `make_lookup_fetcher` is the
deterministic fixture impl.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RESULT_FIELDS = [
    StructField("status_code", IntegerType()),
    StructField("content_type", StringType()),
    StructField("html", StringType()),
    StructField("rendered_html", StringType()),
    StructField("first_attempts_429", IntegerType()),
    StructField("response_time_ms", IntegerType()),
    StructField("content_length", LongType()),
]

RESULT_COLS = [f.name for f in RESULT_FIELDS]

FetchFn = Callable[[pd.DataFrame], pd.DataFrame]


def fetch_with_callback(
    batch: DataFrame,
    fetch_fn: FetchFn,
    num_partitions: int | None = None,
) -> DataFrame:
    """batch (must carry url_key + host_bucket) → batch + fetch-result
    columns. Repartitions by host_bucket first so each politeness
    domain is fetched by exactly one task."""
    in_fields = [f for f in batch.schema.fields if f.name not in RESULT_COLS]
    in_cols = [f.name for f in in_fields]
    out_schema = StructType(list(in_fields) + RESULT_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            req = pdf[["url_key", "host"]] if "host" in pdf else pdf[["url_key"]]
            res = fetch_fn(req)
            out = pdf[in_cols].merge(
                res[["url_key"] + [c for c in RESULT_COLS if c in res.columns]],
                on="url_key",
                how="left",
            )
            for c in RESULT_COLS:
                if c not in out.columns:
                    out[c] = None
            yield out[in_cols + RESULT_COLS]

    parts = num_partitions or int(
        batch.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return batch.repartition(parts, F.col("host_bucket")).mapInPandas(
        run, schema=out_schema
    )


def fetch_parse_with_callback(
    batch: DataFrame,
    fetch_fn: FetchFn,
    num_partitions: int | None = None,
    max_retries_429: int = 2,
) -> DataFrame:
    """Fetch AND parse fused into one mapInPandas stage — the 100 TB
    plan. The page payload is born inside the fetch task, parsed right
    there (X1 spans, incl. the X3 SPA-rendered fallback), and only the
    structured ``spans`` column plus fetch metadata cross the
    Python→JVM boundary: raw html never crosses a process, cache, or
    network boundary at all. Compared to chaining
    ``fetch_with_callback`` + the spans pandas UDF, this removes two
    full Arrow serializations of every page body per round (~2× the
    corpus size in memory traffic).

    Parse gate ≡ engine/crawl.py's (P9/S3/S4): 2xx AND text/html AND
    the 429-retry budget (crawler/fetcher.py:17-18). The SPA fallback
    ≡ the engine's Column chain: rendered_html is parsed only when the
    primary parse yields no outlinks and the page looks JS-rendered
    (js_detect.py:6-36 semantics, oracle/semantics.needs_js_rendering).
    Output = input cols + fetch metadata (html/rendered_html replaced
    by ``spans``); downstream outlink extraction stays the native
    ``outlink_spans_col``.
    """
    from web_crawler_spark.oracle import htmlspans
    from web_crawler_spark.oracle import semantics as sem
    from web_crawler_spark.schemas import SPANS_TYPE

    in_fields = [f for f in batch.schema.fields if f.name not in RESULT_COLS]
    in_cols = [f.name for f in in_fields]
    meta_fields = [
        f for f in RESULT_FIELDS if f.name not in ("html", "rendered_html")
    ]
    meta_cols = [f.name for f in meta_fields]
    out_schema = StructType(
        list(in_fields) + meta_fields + [StructField("spans", SPANS_TYPE)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            req = pdf[["url_key", "host"]] if "host" in pdf else pdf[["url_key"]]
            res = fetch_fn(req)
            out = pdf[in_cols].merge(
                res[["url_key"] + [c for c in RESULT_COLS if c in res.columns]],
                on="url_key",
                how="left",
            )
            for c in RESULT_COLS:
                if c not in out.columns:
                    out[c] = None
            spans_col = []
            for key, status, ctype, f429, h, rend in zip(
                out["url_key"], out["status_code"], out["content_type"],
                out["first_attempts_429"], out["html"], out["rendered_html"],
            ):
                ok = (
                    status is not None
                    and not pd.isna(status)
                    and 200 <= int(status) <= 299
                    and isinstance(ctype, str)
                    and "text/html" in ctype.lower()
                    and (0 if (f429 is None or pd.isna(f429)) else int(f429))
                    <= max_retries_429
                    and isinstance(h, str)
                    and h
                )
                if not ok:
                    spans_col.append([])
                    continue
                sp = htmlspans.extract_spans(h, key)
                if (
                    not htmlspans.outlinks(sp, key)
                    and sem.needs_js_rendering(h)
                    and isinstance(rend, str)
                    and rend
                ):
                    sp = htmlspans.extract_spans(rend, key)
                spans_col.append(sp)
            out = out.drop(columns=["html", "rendered_html"])
            out["spans"] = spans_col
            yield out[in_cols + meta_cols + ["spans"]]

    parts = num_partitions or int(
        batch.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return batch.repartition(parts, F.col("host_bucket")).mapInPandas(
        run, schema=out_schema
    )


def make_lookup_fetcher(pages: pd.DataFrame) -> FetchFn:
    """Fixture fetcher: deterministic lookup into a pages table (same
    rows the equi-join fetch would produce). Captured by value — at
    real scale the closure would instead hold connection/rate-limit
    config, not data."""
    idx = pages.set_index("url")[RESULT_COLS[:0] + [
        "status_code", "content_type", "html", "rendered_html",
        "first_attempts_429", "response_time_ms", "content_length",
    ]]

    def fetch(req: pd.DataFrame) -> pd.DataFrame:
        found = req[req["url_key"].isin(idx.index)].copy()
        res = idx.loc[found["url_key"]].reset_index(drop=True)
        res.insert(0, "url_key", found["url_key"].to_numpy())
        return res

    return fetch


def make_http_fetcher(
    user_agent: str = "web-crawler-spark",
    timeout_s: float = 20.0,
    max_retries_429: int = 2,
    backoff_s: float = 2.0,
    verify_tls: bool = True,
    session_factory=None,
) -> FetchFn:
    """Production HTTP fetch with the reference's semantics
    (crawler/fetcher.py:12-87 + config.py:13-18): GET with UA header,
    20 s timeout, redirects followed, TLS verified; on 429, ≤2 retries
    with exponential backoff 2 s → 4 s (fetcher.py:17-18,35-39).
    Connection errors drop the row (the engine classifies missing rows
    as "connection error"); non-2xx and non-HTML statuses flow through
    for the admission filter (S4) to route.

    Runs inside mapInPandas per host_bucket partition — executors
    fetch, the driver never does; one partition owns one politeness
    domain. `session_factory` injects a fake session for offline tests
    (it is cloudpickled into the UDF closure, so it must either be
    importable on executors or defined locally so it ships by value).
    """

    def fetch(req: pd.DataFrame) -> pd.DataFrame:
        import time as _time

        if session_factory is not None:
            sess = session_factory()
        else:  # pragma: no cover - network is unavailable in CI
            import requests

            sess = requests.Session()
        rows = []
        for url in req["url_key"]:
            n_429 = 0
            t0 = _time.monotonic()
            resp = None
            while True:
                try:
                    resp = sess.get(
                        url,
                        headers={"User-Agent": user_agent},
                        timeout=timeout_s,
                        allow_redirects=True,
                        verify=verify_tls,
                    )
                except Exception:
                    resp = None
                    break
                if resp.status_code == 429 and n_429 < max_retries_429:
                    n_429 += 1
                    if backoff_s > 0:
                        _time.sleep(backoff_s * (2 ** (n_429 - 1)))
                    continue
                break
            if resp is None:
                continue  # missing row ⇒ "connection error" downstream
            body = resp.text if isinstance(resp.text, str) else ""
            rows.append(
                {
                    "url_key": url,
                    "status_code": int(resp.status_code),
                    "content_type": str(
                        resp.headers.get("Content-Type", "") or ""
                    ),
                    "html": body,
                    "rendered_html": None,
                    "first_attempts_429": n_429,
                    "response_time_ms": int(
                        (_time.monotonic() - t0) * 1000
                    ),
                    "content_length": len(body.encode("utf-8", "ignore")),
                }
            )
        return pd.DataFrame(rows, columns=["url_key"] + RESULT_COLS)

    return fetch
