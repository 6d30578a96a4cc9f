"""Structured-Streaming metrics over the engine's fetch-log snapshots:
the streaming aggregation must equal the equivalent batch aggregation
over the same rounds (incremental ≡ full-rescan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.streaming.metrics import (
    host_metrics_stream,
    read_fetch_log_stream,
    run_to_completion,
)


@pytest.fixture(scope="module")
def crawl_state(spark, tmp_path_factory):
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    state = str(tmp_path_factory.mktemp("stream_state"))
    cfg = WebGraphConfig(hosts=2, pages_per_host=10)
    eng = CrawlEngine(
        spark,
        spark.createDataFrame(generate_pages(cfg)),
        spark.createDataFrame(generate_sites(cfg)),
        config=CrawlConfig(state_dir=state),
    )
    eng.run(fresh=True)
    return state, eng


def test_streaming_equals_batch(spark, crawl_state, tmp_path):
    state, eng = crawl_state
    stream = read_fetch_log_stream(spark, state, max_files_per_trigger=4)
    assert stream.isStreaming
    rows = run_to_completion(
        host_metrics_stream(stream), str(tmp_path / "ckpt")
    )
    got = {
        (r["round_window"], r["host"]): (r["attempts"], r["ok"], r["failed"])
        for r in rows
    }
    batch = host_metrics_stream(eng.read_all("fetch_log")).collect()
    want = {
        (r["round_window"], r["host"]): (r["attempts"], r["ok"], r["failed"])
        for r in batch
    }
    assert got == want
    assert len(got) > 2
    total_attempts = sum(v[0] for v in got.values())
    assert total_attempts == eng.read_all("fetch_log").count()


def test_stateful_host_monitor(spark, crawl_state, tmp_path):
    """applyInPandasWithState monitor: cumulative per-host counters
    maintained across micro-batches must equal the batch aggregates."""
    from web_crawler_spark.streaming.metrics import (
        host_monitor_stateful,
        run_monitor_to_completion,
    )

    state, eng = crawl_state
    stream = read_fetch_log_stream(spark, state, max_files_per_trigger=3)
    rows = run_monitor_to_completion(
        host_monitor_stateful(stream), str(tmp_path / "mon_ckpt")
    )
    got = {r["host"]: (r["attempts"], r["ok"]) for r in rows}
    batch = (
        eng.read_all("fetch_log")
        .withColumn("host", F.regexp_extract("url_key", r"^https?://([^/]+)", 1))
        .groupBy("host")
        .agg(F.count("*").alias("n"), F.count(F.when(F.col("success"), 1)).alias("ok"))
        .collect()
    )
    want = {r["host"]: (r["n"], r["ok"]) for r in batch}
    assert got == want
    for r in rows:
        assert 0.0 <= r["ok_rate"] <= 1.0
        assert r["ewma_ms"] is None or r["ewma_ms"] > 0


def test_watermarked_window_drops_late_events(spark, tmp_path):
    """§2.L watermark contract: an event arriving more than the
    watermark behind the max observed event time is DROPPED; on-time
    windows emit exactly once in append mode when they close.

    Files are fed while the query runs on a live trigger: availableNow
    pre-plans its micro-batches before the first watermark update, so
    it cannot demonstrate late-drop (the watermark would lag one run).
    """
    import os
    import time

    import pandas as pd

    from web_crawler_spark.streaming.windows import windowed_host_stats

    src = tmp_path / "events"
    os.makedirs(src)

    def batch(name, rows):
        pd.DataFrame(
            rows, columns=["url_key", "success", "content_length", "ts"]
        ).assign(
            event_ts=lambda d: pd.to_datetime(d.pop("ts"), unit="s").astype(
                "datetime64[us]"  # spark cannot read parquet NANOS
            )
        ).to_parquet(src / name, index=False)

    u = "https://hostA.test/p"
    batch("b1.parquet", [(u, True, 100, 100), (u, False, 50, 112)])
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = windowed_host_stats(stream, window="10 seconds", watermark="30 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def wait_rows(n, timeout=60):
        t0 = time.time()
        while time.time() - t0 < timeout:
            done = sum(p["numInputRows"] for p in q.recentProgress)
            if done >= n:
                return
            time.sleep(0.3)
        raise AssertionError(f"stream stalled before {n} rows")

    wait_rows(2)  # b1 processed → watermark advances to 112s - 30s = 82s
    # late event at t=20 (< 82s cutoff) must be dropped; t=121 is on time
    batch("b2.parquet", [(u, True, 10, 20), (u, True, 70, 121)])
    wait_rows(4)
    # flusher pushes the watermark to 270s so every on-time window closes
    batch("b3.parquet", [(u, True, 1, 300)])
    wait_rows(5)
    time.sleep(2)  # one extra trigger to emit the newly closed windows
    q.stop()
    rows = spark.table("win_stats").collect()
    starts = {r["window_start"].second + r["window_start"].minute * 60 for r in rows}
    assert 100 in starts and 110 in starts and 120 in starts
    assert 20 not in starts, "late event beyond the watermark must be dropped"
    # flusher window [300,310) never closes -> not emitted either
    assert 300 not in starts
    total = sum(r["n_fetches"] for r in rows)
    assert total == 3  # the three on-time events; late one dropped
