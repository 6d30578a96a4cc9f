"""ShardedBloom (operators/seen.py): the 10^10-key seen-set path.

Parity contract: shard(N) ≡ flat bloom ≡ no filter — sharding is a
broadcast-size optimization (12 GB → ~190 MB/shard at 64 shards),
never semantics. False negatives are impossible; false positives are
bounded by fpp and routed to the exact anti-join.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_crawler_spark.operators.seen import (
    BroadcastBloom,
    ShardedBloom,
    ShardStore,
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


def test_shard_store_parity_and_single_shard_per_task(spark, tmp_path):
    """The cluster path (ShardStore): membership through the saved
    store must equal the in-memory sharded filter, anti_join_seen
    through the store must equal the exact join, and — the scale
    claim — a task processing one host_bucket group touches EXACTLY
    one shard's bytes (its own), never the whole filter."""
    seen = _keys_df(spark, 2000, "seen").withColumn("siteid", F.lit(1))
    overlap = _keys_df(spark, 500, "seen").withColumn("siteid", F.lit(1))
    fresh = _keys_df(spark, 700, "fresh").withColumn("siteid", F.lit(1))
    cands = overlap.unionByName(fresh)

    sb = ShardedBloom.empty(2000, fpp=0.01, num_shards=4)
    sb.add_keys(seen, "url_key", "host_bucket")
    store = sb.save(str(tmp_path / "bloom_store"))
    assert store.num_shards == 4 and store.approx_items == 2000

    # membership parity: store-backed UDF ≡ closure-broadcast UDF
    probes = cands.select(
        "url_key", "host_bucket", *BroadcastBloom.hash_cols("url_key")
    )
    mem = probes.withColumn(
        "m_mem",
        sb.maybe_seen_udf()(
            sb._shard_col("host_bucket"), F.col("_bh1"), F.col("_bh2")
        ),
    ).withColumn(
        "m_store",
        store.maybe_seen_udf()(
            store._shard_col("host_bucket"), F.col("_bh1"), F.col("_bh2")
        ),
    ).toPandas()
    assert (mem["m_mem"] == mem["m_store"]).all()

    # anti-join parity through the store
    out = anti_join_seen(cands, seen, ["siteid", "url_key"], store)
    assert sorted(r["url_key"] for r in out.collect()) == sorted(
        r["url_key"] for r in fresh.collect()
    )

    # per-task shard-touch invariant: one host_bucket group = one task
    # (applyInPandas) = exactly one shard file read
    store_dir, nb, nh = store.store_dir, store.num_bits, store.num_hashes

    def diag(key, pdf):
        _, touched = ShardStore.probe_shards(
            store_dir,
            nb,
            nh,
            (pdf["host_bucket"] % 4).to_numpy(),
            pdf["_bh1"].to_numpy(),
            pdf["_bh2"].to_numpy(),
        )
        return pd.DataFrame(
            {
                "host_bucket": [int(key[0])],
                "n_touched": [len(touched)],
                "shards": [",".join(map(str, sorted(touched)))],
            }
        )

    d = (
        probes.groupBy("host_bucket")
        .applyInPandas(diag, "host_bucket long, n_touched int, shards string")
        .toPandas()
    )
    assert len(d) == 8  # 8 host buckets in the fixture
    assert (d["n_touched"] == 1).all()
    assert (
        d["shards"].astype(int) == (d["host_bucket"] % 4)
    ).all()  # and it is exactly the partition's own shard


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


def test_shard_cache_evicts_destroyed_epochs(tmp_path):
    """Reused Python workers keep a process-level mmap cache; long
    crawls publish one store epoch per round, so entries whose epoch
    dir has been destroy()ed must be swept once the cache grows —
    otherwise every old epoch's unlinked bitmap stays pinned for the
    worker's lifetime."""
    import web_crawler_spark.operators.seen as seen_mod
    from web_crawler_spark.operators.seen import ShardedBloom

    sb = ShardedBloom.empty(100, fpp=0.01, num_shards=2)
    old_sweep = seen_mod._SHARD_CACHE_SWEEP_AT
    seen_mod._SHARD_CACHE.clear()
    seen_mod._SHARD_CACHE_SWEEP_AT = 4
    try:
        stores = [sb.save(str(tmp_path / f"epoch_{i}")) for i in range(3)]
        for st in stores:
            for s in range(2):
                seen_mod._load_shard_words(
                    str(tmp_path / st.store_dir.split("/")[-1] / f"shard_{s}.npy")
                )
        assert len(seen_mod._SHARD_CACHE) == 6
        stores[0].destroy()
        stores[1].destroy()
        # next miss past the bound sweeps the 4 dead entries
        extra = sb.save(str(tmp_path / "epoch_live"))
        seen_mod._load_shard_words(
            str(tmp_path / "epoch_live" / "shard_0.npy")
        )
        live = set(seen_mod._SHARD_CACHE)
        assert not any("epoch_0/" in p or "epoch_1/" in p for p in live)
        assert any("epoch_2/" in p for p in live)  # live epochs survive
        extra.destroy()
    finally:
        seen_mod._SHARD_CACHE_SWEEP_AT = old_sweep
        seen_mod._SHARD_CACHE.clear()


def test_shard_store_resume_rebuilds_fresh_epochs(spark, tmp_path_factory):
    """Kill-resume across store epochs (r4): a resumed engine rebuilds
    its ShardStore from the durable seen table under a RUN-UNIQUE
    namespace. Without that, epoch numbering restarts at 0 per engine
    instance, so the resumed run would re-publish to the dead run's
    epoch paths — and the executor-side shard cache is keyed by
    absolute path, so a reused Python worker could answer a
    post-resume probe from a stale pre-crash bitmap. Asserts: (1) the
    dead run's epoch dirs are pruned at resume, (2) every post-resume
    epoch path carries the new engine's nonce (disjoint from the dead
    run's paths), (3) the resumed crawl's final visits/seen equal an
    uninterrupted run's."""
    import glob

    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    cfg = WebGraphConfig(hosts=3, pages_per_host=24)
    pages_df = spark.createDataFrame(generate_pages(cfg))
    sites_df = spark.createDataFrame(generate_sites(cfg))

    def mk(state, max_rounds):
        return CrawlEngine(
            spark,
            pages_df,
            sites_df,
            config=CrawlConfig(
                state_dir=state,
                max_rounds=max_rounds,
                use_bloom_min_seen=1,  # sharded store from round 0
                bloom_shards=4,
                bloom_store=True,
            ),
        )

    # uninterrupted reference run
    ref_state = str(tmp_path_factory.mktemp("store_ref"))
    ref = mk(ref_state, 10_000)
    ref.run(fresh=True)

    # killed run: 2 rounds, store epochs left behind
    state = str(tmp_path_factory.mktemp("store_resume"))
    eng1 = mk(state, 2)
    eng1.run(fresh=True)
    store_glob = os.path.join(state, "bloom_store", "epoch_*")
    dead_epochs = set(glob.glob(store_glob))
    assert dead_epochs, "killed run published no store epochs"
    assert all(eng1._bloom_nonce in p for p in dead_epochs)

    # resume with a fresh engine object on the same state_dir
    eng2 = mk(state, 10_000)
    eng2.resume()
    live_epochs = set(glob.glob(store_glob))
    assert live_epochs, "resumed run published no store epochs"
    assert not (live_epochs & dead_epochs), "resume reused dead epoch paths"
    assert all(eng2._bloom_nonce in p for p in live_epochs)
    assert not any(eng1._bloom_nonce in p for p in live_epochs)

    # final state parity vs the uninterrupted run
    def visits(eng):
        return (
            eng.visits()
            .orderBy("visit_ord")
            .select("siteid", "url_key", "visit_ord", "depth")
            .toPandas()
            .reset_index(drop=True)
        )

    def seen(eng):
        return (
            eng.seen_keys()
            .orderBy("siteid", "url_key")
            .toPandas()
            .reset_index(drop=True)
        )

    assert visits(eng2).equals(visits(ref))
    assert seen(eng2).equals(seen(ref))
