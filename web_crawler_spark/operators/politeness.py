"""Per-host politeness: priority dequeue with token-bucket budgets.

The reference's only politeness is 429-backoff inside the fetcher
(crawler/fetcher.py:35-39); its frontier is one global FIFO. At cluster
scale, per-host isolation is mandatory (north rule): each round dequeues
at most k_h URLs per host, where k_h comes from a token bucket fed by
the host's robots crawl-delay (or a flat per-round cap).

Everything is a window over (siteid, host) — hash-partitioned by host,
so hot hosts don't serialize the whole dequeue, and AQE's skew handling
applies to the exchange. Deferral (rows beyond the budget) keeps rows in
the frontier for later rounds instead of dropping them — an explicit,
documented divergence from the reference's silent Queue(maxsize=10_000)
overflow drop (crawler/frontier.py:30,51-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRIORITY_COLS = ["depth", "parent_ord", "link_idx"]


def host_budgets(
    robots: DataFrame | None,
    round_budget_ms: int,
    default_tokens: int,
) -> DataFrame | None:
    """tokens-per-round per host from robots crawl-delay:
    floor(round_budget_ms / crawl_delay_ms), min 1. Hosts without a
    delay rule use ``default_tokens``. Tiny dim → broadcast."""
    if robots is None:
        return None
    delays = (
        robots.filter(F.col("crawl_delay_ms").isNotNull())
        .groupBy("host")
        .agg(F.min("crawl_delay_ms").alias("crawl_delay_ms"))
    )
    return delays.select(
        "host",
        F.greatest(
            F.lit(1), F.floor(F.lit(round_budget_ms) / F.col("crawl_delay_ms"))
        )
        .cast("int")
        .alias("_tokens"),
    )


def dequeue_batch(
    frontier: DataFrame,
    max_per_host: int | None = None,
    budgets: DataFrame | None = None,
    num_salts: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split the frontier into (batch, deferred) by BFS priority within
    each (siteid, host) partition. No cap → whole frontier is the batch
    (exact reference parity: global FIFO, depth-layer rounds).

    ``num_salts`` enables the hot-host two-phase top-k: a first window
    over (siteid, host, hash(url_key) % num_salts) keeps only ≤cap rows
    per salt shard — a 10^7-row host never lands in one window
    partition; the exact final window then sees at most num_salts·cap
    rows per host. Result is identical to the unsalted plan (the global
    top-cap rows are top-cap within their shard)."""
    if max_per_host is None and budgets is None:
        return frontier, frontier.limit(0)
    if budgets is not None:
        capped = frontier.join(F.broadcast(budgets), "host", "left").withColumn(
            "_cap", F.coalesce(F.col("_tokens"), F.lit(max_per_host or 2**31 - 1))
        )
    else:
        capped = frontier.withColumn("_cap", F.lit(max_per_host))

    pre_deferred = None
    src = capped
    if num_salts and num_salts > 1:
        w1 = Window.partitionBy(
            "siteid", "host", F.pmod(F.xxhash64("url_key"), F.lit(num_salts))
        ).orderBy(*PRIORITY_COLS)
        r1 = capped.withColumn("_sr", F.row_number().over(w1))
        src = r1.filter(F.col("_sr") <= F.col("_cap")).drop("_sr")
        pre_deferred = r1.filter(F.col("_sr") > F.col("_cap")).drop("_sr")

    w = Window.partitionBy("siteid", "host").orderBy(*PRIORITY_COLS)
    ranked = src.withColumn("_hr", F.row_number().over(w))
    batch = ranked.filter(F.col("_hr") <= F.col("_cap")).drop("_hr")
    deferred = ranked.filter(F.col("_hr") > F.col("_cap")).drop("_hr")
    if pre_deferred is not None:
        deferred = deferred.unionByName(pre_deferred)
    drop = [c for c in ("_cap", "_tokens") if c in deferred.columns]
    return batch.drop(*drop), deferred.drop(*drop)
