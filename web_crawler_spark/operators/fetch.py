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
