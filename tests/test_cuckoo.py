"""Cuckoo-filter seen-set tests: no false negatives, bounded false
positives, delete support, saturation fallback, Spark build/merge/probe
plumbing, and full engine parity when seen_filter='cuckoo'."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_crawler_spark.operators.cuckoo import (
    CuckooFilter,
    build_filters,
    merge_new_keys,
    probe_candidates,
)


def _hashes(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**63 - 1, size=n).astype(np.uint64)


def test_no_false_negatives():
    f = CuckooFilter.for_capacity(10_000)
    keys = _hashes(8_000)
    f.add_hashes(keys)
    assert not f.saturated
    assert f.contains_hashes(keys).all()


def test_false_positive_rate_bounded():
    f = CuckooFilter.for_capacity(10_000)
    f.add_hashes(_hashes(8_000, seed=1))
    other = _hashes(20_000, seed=2)
    fp_rate = f.contains_hashes(other).mean()
    # 16-bit fingerprints, 4-slot buckets → theoretical ~2*4/2^16 ≈ 0.012%
    assert fp_rate < 0.01


def test_delete():
    f = CuckooFilter.for_capacity(1_000)
    keys = _hashes(500, seed=3)
    f.add_hashes(keys)
    removed = f.delete_hashes(keys[:100])
    assert removed == 100
    # deleted keys gone (modulo FP), retained keys still present
    assert f.contains_hashes(keys[100:]).all()
    assert f.contains_hashes(keys[:100]).mean() < 0.05


def test_saturation_fallback():
    f = CuckooFilter(16)  # 64 slots
    f.add_hashes(_hashes(500, seed=4))
    assert f.saturated
    # saturated → answers all-True: degrade to exact join, never lose keys
    assert f.contains_hashes(_hashes(10, seed=5)).all()


def test_spark_build_merge_probe(spark):
    seen = spark.createDataFrame(
        [(1, f"https://h{i % 4}.test/p{i}", i % 4) for i in range(200)],
        "siteid int, url_key string, host_bucket int",
    )
    filters = build_filters(seen, capacity_per_bucket=1024)
    assert filters.count() == 4

    new = spark.createDataFrame(
        [(1, f"https://h{i % 4}.test/new{i}", i % 4) for i in range(40)],
        "siteid int, url_key string, host_bucket int",
    )
    merged = merge_new_keys(filters, new)
    pdf = merged.toPandas()
    assert len(pdf) == 4
    assert pdf["n_items"].sum() == 240

    cand = spark.createDataFrame(
        [(1, f"https://h{i % 4}.test/p{i}", i % 4) for i in range(100)]
        + [(1, f"https://h{i % 4}.test/unseen{i}", i % 4) for i in range(100)],
        "siteid int, url_key string, host_bucket int",
    )
    probed = probe_candidates(cand, merged).toPandas()
    seen_mask = probed["url_key"].str.contains("/p")
    assert probed.loc[seen_mask, "_maybe_seen"].all()  # no false negatives
    assert probed.loc[~seen_mask, "_maybe_seen"].mean() < 0.05

    # keys added via MERGE must probe true as well (guards against the
    # int64→float64 null-promotion corruption the union plan suffered)
    probed_new = probe_candidates(new, merged).toPandas()
    assert probed_new["_maybe_seen"].all()


@pytest.mark.slow
def test_engine_parity_with_cuckoo(spark, tmp_path):
    """The crawl result must be IDENTICAL under bloom / cuckoo / none
    prefilters — the filter is an optimization, never semantics."""
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    cfg = WebGraphConfig(hosts=2, pages_per_host=10)
    pages = spark.createDataFrame(generate_pages(cfg))
    sites = spark.createDataFrame(generate_sites(cfg))

    results = {}
    for mode in ("none", "cuckoo"):
        eng = CrawlEngine(
            spark, pages, sites,
            config=CrawlConfig(
                state_dir=str(tmp_path / f"state_{mode}"), seen_filter=mode
            ),
        )
        eng.run(fresh=True)
        results[mode] = {
            "visits": sorted(
                (r["url_key"], r["visit_ord"])
                for r in eng.visits().collect()
            ),
            "seen": sorted(
                r["url_key"] for r in eng.seen_keys().collect()
            ),
        }
    assert results["none"] == results["cuckoo"]


@pytest.mark.slow
def test_cuckoo_resume(spark, tmp_path):
    """Kill after round 2, resume with a fresh engine over the same
    state dir: the cuckoo filter table must reload from its snapshot
    and the final state must equal an uninterrupted cuckoo crawl."""
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    cfg = WebGraphConfig(hosts=2, pages_per_host=10)
    pages = spark.createDataFrame(generate_pages(cfg))
    sites = spark.createDataFrame(generate_sites(cfg))

    full = CrawlEngine(
        spark, pages, sites,
        config=CrawlConfig(state_dir=str(tmp_path / "full"),
                           seen_filter="cuckoo"),
    )
    full.run(fresh=True)

    part = CrawlEngine(
        spark, pages, sites,
        config=CrawlConfig(state_dir=str(tmp_path / "part"),
                           seen_filter="cuckoo", max_rounds=2),
    )
    part.run(fresh=True)
    resumed = CrawlEngine(
        spark, pages, sites,
        config=CrawlConfig(state_dir=str(tmp_path / "part"),
                           seen_filter="cuckoo"),
    )
    resumed.resume()

    def state(eng):
        return (
            sorted((r["url_key"], r["visit_ord"]) for r in eng.visits().collect()),
            sorted(r["url_key"] for r in eng.seen_keys().collect()),
        )

    assert state(full) == state(resumed)
