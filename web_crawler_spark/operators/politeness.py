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
) -> tuple[DataFrame, DataFrame]:
    """Split the frontier into (batch, deferred) by BFS priority within
    each (siteid, host) partition. No cap → whole frontier is the batch
    (exact reference parity: global FIFO, depth-layer rounds)."""
    if max_per_host is None and budgets is None:
        return frontier, frontier.limit(0)
    w = Window.partitionBy("siteid", "host").orderBy(*PRIORITY_COLS)
    ranked = frontier.withColumn("_hr", F.row_number().over(w))
    if budgets is not None:
        ranked = ranked.join(F.broadcast(budgets), "host", "left").withColumn(
            "_cap", F.coalesce(F.col("_tokens"), F.lit(max_per_host or 2**31 - 1))
        )
    else:
        ranked = ranked.withColumn("_cap", F.lit(max_per_host))
    batch = ranked.filter(F.col("_hr") <= F.col("_cap"))
    deferred = ranked.filter(F.col("_hr") > F.col("_cap"))
    drop = [c for c in ("_hr", "_cap", "_tokens") if c in ranked.columns]
    return batch.drop(*drop), deferred.drop(*drop)
