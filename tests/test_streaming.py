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
