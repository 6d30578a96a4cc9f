"""ShardedBloom (operators/seen.py): the 10^10-key seen-set path.

Parity contract: shard(N) ≡ flat bloom ≡ no filter — sharding is a
broadcast-size optimization (12 GB → ~190 MB/shard at 64 shards),
never semantics. False negatives are impossible; false positives are
bounded by fpp and routed to the exact anti-join.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_crawler_spark.operators.seen import (
    BroadcastBloom,
    ShardedBloom,
    anti_join_seen,
)


def _keys_df(spark, n, prefix, buckets=8):
    pdf = pd.DataFrame(
        {
            "url_key": [f"https://h{i % 17}.test/{prefix}/{i}" for i in range(n)],
            "host_bucket": [i % buckets for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


def test_sharded_bloom_no_false_negatives(spark):
    seen = _keys_df(spark, 2000, "seen")
    sb = ShardedBloom.empty(2000, fpp=0.01, num_shards=4)
    sb.add_keys(seen, "url_key", "host_bucket")
    assert sb.approx_items == 2000

    probed = (
        seen.select("host_bucket", *BroadcastBloom.hash_cols("url_key"))
        .withColumn(
            "m",
            sb.maybe_seen_udf()(
                sb._shard_col("host_bucket"), F.col("_bh1"), F.col("_bh2")
            ),
        )
        .toPandas()
    )
    assert probed["m"].all()  # every added key must probe true


def test_sharded_bloom_fp_rate_bounded(spark):
    seen = _keys_df(spark, 2000, "seen")
    fresh = _keys_df(spark, 2000, "fresh")
    sb = ShardedBloom.empty(2000, fpp=0.01, num_shards=4)
    sb.add_keys(seen, "url_key", "host_bucket")
    probed = (
        fresh.select("host_bucket", *BroadcastBloom.hash_cols("url_key"))
        .withColumn(
            "m",
            sb.maybe_seen_udf()(
                sb._shard_col("host_bucket"), F.col("_bh1"), F.col("_bh2")
            ),
        )
        .toPandas()
    )
    assert probed["m"].mean() < 0.05


def test_anti_join_parity_sharded_vs_flat_vs_none(spark):
    """anti_join_seen must return the identical new-key set under a
    sharded bloom, a flat bloom, and no bloom."""
    seen = _keys_df(spark, 1500, "seen").withColumn("siteid", F.lit(1))
    overlap = _keys_df(spark, 500, "seen").withColumn("siteid", F.lit(1))
    fresh = _keys_df(spark, 700, "fresh").withColumn("siteid", F.lit(1))
    cands = overlap.unionByName(fresh)

    flat = BroadcastBloom.empty(1500, 0.01)
    flat.add_keys(seen, "url_key")
    sharded = ShardedBloom.empty(1500, 0.01, num_shards=4)
    sharded.add_keys(seen, "url_key", "host_bucket")

    def result(bloom):
        out = anti_join_seen(cands, seen, ["siteid", "url_key"], bloom)
        return sorted(r["url_key"] for r in out.collect())

    r_none, r_flat, r_shard = result(None), result(flat), result(sharded)
    assert len(r_none) == 700
    assert r_none == r_flat == r_shard


@pytest.mark.slow
def test_engine_parity_with_sharded_bloom(spark, tmp_path):
    """Full-crawl parity: bloom_shards=4 (forced on from round 1) ≡
    exact anti-join only."""
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
    for mode, ccfg in {
        "none": CrawlConfig(state_dir=str(tmp_path / "s_none"), seen_filter="none"),
        "sharded": CrawlConfig(
            state_dir=str(tmp_path / "s_shard"),
            seen_filter="bloom",
            use_bloom_min_seen=1,  # force the bloom from the first round
            bloom_shards=4,
        ),
    }.items():
        eng = CrawlEngine(spark, pages, sites, config=ccfg)
        eng.run(fresh=True)
        results[mode] = {
            "visits": sorted(
                (r["url_key"], r["visit_ord"]) for r in eng.visits().collect()
            ),
            "seen": sorted(r["url_key"] for r in eng.seen_keys().collect()),
        }
    if results["sharded"] != results["none"]:
        raise AssertionError("sharded-bloom crawl diverged from exact anti-join")
