"""Event-time windowed aggregation with a watermark (§2.L).

The round-keyed streams in streaming/metrics.py use the engine's
logical clock; this module is the wall-clock path a production monitor
needs when fetch events carry real timestamps: tumbling event-time
windows with a watermark so (a) state for closed windows is dropped —
unbounded-state-safe — and (b) LATE events beyond the watermark are
discarded deterministically instead of resurrecting old windows.

All aggregates are JVM hash aggs; no Python in the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(fetch_log: DataFrame, seconds_per_round: int = 10) -> DataFrame:
    """Synthesize an event_ts from the engine's logical clock (the
    fixture web has no wall clock): round r → epoch r*seconds_per_round."""
    return fetch_log.withColumn(
        "event_ts",
        F.timestamp_seconds(F.col("round").cast("long") * seconds_per_round),
    )


def windowed_host_stats(
    events: DataFrame,
    ts_col: str = "event_ts",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Tumbling-window per-host fetch stats over event time.

    Streaming contract: events later than ``watermark`` behind the max
    observed event time are dropped (their window's state has been
    reclaimed); windows emit incrementally (update mode) or on close
    (append mode). The same plan runs in batch for replay/backfill —
    one definition, two execution modes.
    """
    host = F.regexp_extract(F.col("url_key"), r"^https?://([^/]+)", 1)
    # watermarks require TIMESTAMP (parquet written by pandas arrives
    # as TIMESTAMP_NTZ) — normalize once here
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            host.alias("host"),
        )
        .agg(
            F.count("*").alias("n_fetches"),
            F.count(F.when(~F.col("success"), 1)).alias("n_failures"),
            F.sum("content_length").alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_fetches",
            "n_failures",
            "bytes",
        )
    )


def sessionized_error_bursts(
    events: DataFrame,
    ts_col: str = "event_ts",
    gap: str = "30 seconds",
    watermark: str = "60 seconds",
    min_failures: int = 3,
) -> DataFrame:
    """Per-host SESSION-windowed error-burst detection (r4, the second
    stateful streaming shape users hit): consecutive fetch FAILURES of
    one host closer than ``gap`` apart merge into one session
    (`F.session_window` — dynamic-length windows, unlike the tumbling
    stats above); a session with ≥ ``min_failures`` failures is a
    burst — the signal a politeness controller or alerting monitor
    consumes (host down / blocking us / rate-limiting us).

    Streaming contract: the watermark clock is driven by FAILURE events
    only — Catalyst pushes the failure filter below the
    EventTimeWatermark operator (PushPredicateThroughNonJoin allows
    pushing non-watermark-column predicates through it), so success
    rows never reach the watermark collector no matter where
    ``withWatermark`` sits in the chain (measured: the per-batch
    event-time stats exclude them). A monitor that must close open
    burst sessions during an all-success recovery period therefore
    unions a failure-typed heartbeat into the stream; tests use exactly
    that to flush. Failure events later than ``watermark`` behind the
    max observed failure time are dropped, and closed sessions' state
    is reclaimed — unbounded-state-safe. Session merging is an
    incremental stateful op in streaming and the identical plan runs in
    batch for replay/backfill (the parity the test pins).

    All JVM hash/state ops; no Python in the stream.
    """
    host = F.regexp_extract(F.col("url_key"), r"^https?://([^/]+)", 1)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .filter(~F.col("success"))
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"),
            host.alias("host"),
        )
        .agg(F.count("*").alias("n_failures"))
        .select(
            F.col("s.start").alias("burst_start"),
            F.col("s.end").alias("burst_end"),
            "host",
            "n_failures",
            (F.col("n_failures") >= F.lit(min_failures)).alias("is_burst"),
        )
    )
