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


def test_sessionized_error_bursts_stream_equals_batch(spark, tmp_path):
    """r4 §2.L depth: per-host session-windowed error-burst detection.
    Sessions merge incrementally across micro-batches; a failure
    arriving beyond the watermark is dropped; the watermark clock is
    driven by failure events only (Catalyst pushes the failure filter
    below the watermark collector — see the operator docstring), so
    the flusher is a failure-typed heartbeat on a dedicated host whose
    own session never closes (and so never emits in append mode). The
    surviving streamed sessions must equal the identical plan run in
    BATCH over the on-time events (streaming ≡ batch parity)."""
    import os
    import time

    import pandas as pd

    from web_crawler_spark.streaming.windows import sessionized_error_bursts

    src = tmp_path / "events"
    os.makedirs(src)

    def batch_file(name, rows):
        pd.DataFrame(
            rows, columns=["url_key", "success", "content_length", "ts"]
        ).assign(
            event_ts=lambda d: pd.to_datetime(d.pop("ts"), unit="s").astype(
                "datetime64[us]"
            )
        ).to_parquet(src / name, index=False)

    a, b = "https://hostA.test/p", "https://hostB.test/p"
    # burst: 3 hostA failures within the 30s gap; hostA success at 107
    # must not join the session; hostB single failure = not a burst
    on_time = [
        (a, False, 10, 100),
        (a, True, 10, 107),
        (a, False, 10, 112),
        (a, False, 10, 125),
        (b, False, 10, 118),
    ]
    batch_file("b1.parquet", on_time)
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = sessionized_error_bursts(
        stream, gap="30 seconds", watermark="60 seconds", min_failures=3
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("bursts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def wait_rows(n, timeout=60):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if sum(p["numInputRows"] for p in q.recentProgress) >= n:
                return
            time.sleep(0.3)
        raise AssertionError(f"stream stalled before {n} input rows")

    wait_rows(5)  # b1 done → watermark = 125 - 60 = 65s
    # late failure at t=30 (< 65s cutoff) must be dropped; a second
    # on-time hostA failure at t=210 opens a separate (non-burst)
    # session — 85s after the burst's last event, outside the gap
    late_and_more = [(a, False, 10, 30), (a, False, 10, 210)]
    batch_file("b2.parquet", late_and_more)
    wait_rows(7)
    # failure-typed heartbeat at t=1000 pushes the watermark to 940s,
    # closing every real session; its own session [1000, 1030) stays
    # open forever, so it never emits in append mode
    batch_file("b3.parquet", [("https://flusher.test/hb", False, 10, 1000)])
    wait_rows(8)
    time.sleep(2)  # one extra trigger to emit the newly closed sessions
    q.stop()

    def key(r):
        return (
            r["host"],
            r["burst_start"].timestamp(),
            r["burst_end"].timestamp(),
            r["n_failures"],
            r["is_burst"],
        )

    streamed = sorted(key(r) for r in spark.table("bursts").collect())

    # batch replay of the same plan over the ON-TIME events only
    on_time_df = spark.createDataFrame(
        pd.DataFrame(
            on_time + [late_and_more[1]],
            columns=["url_key", "success", "content_length", "ts"],
        ).assign(
            event_ts=lambda d: pd.to_datetime(d.pop("ts"), unit="s").astype(
                "datetime64[us]"
            )
        )
    )
    batch_rows = sessionized_error_bursts(
        on_time_df, gap="30 seconds", watermark="60 seconds", min_failures=3
    ).collect()
    expected = sorted(key(r) for r in batch_rows)
    assert streamed == expected, (streamed, expected)

    by_host_start = {(h, s): (n, ib) for h, s, e, n, ib in streamed}
    # the hostA burst: 3 failures 100..125 merged into one session
    assert by_host_start[("hostA.test", 100.0)] == (3, True)
    # hostB's single failure and hostA's t=210 failure are not bursts
    assert by_host_start[("hostB.test", 118.0)] == (1, False)
    assert by_host_start[("hostA.test", 210.0)] == (1, False)
    # the late t=30 failure left no session
    assert ("hostA.test", 30.0) not in by_host_start
