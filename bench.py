"""Headline benchmark: runs the flagship query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (no driver
collect; measures the distributed plan, not toPandas serialization).
The crawl entry runs the fixture web end-to-end (multi-round engine)
and additionally reports its URL/s in `extra`.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "a1_source_summary",
    "a3_token_distribution",
    "j2_dim_join",
    "o6_topk_per_group",
    "so1_snapshot_compare",
    "so5_rule_chain",
    "h1_content_hashes",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "dedup_clusters",
    "dedup_incremental",
    "graph_pagerank",
    "text_quality",
    "quality_gopher",
    "pii_scrub",
    "contamination_ngrams",
    "dataset_split",
    "dataset_pack",
    "domain_cap",
    "curation_pipeline",
    "ann_brute_force_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "w1_error_sessions",
    "w2_event_windows",
]


def main() -> None:
    from web_crawler_spark.queries import QUERIES
    from web_crawler_spark.session import get_spark

    spark = get_spark(
        "bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warmup: spin up Python UDF workers / Arrow / JIT and fault the
    # input parquet into the page cache so the first query's number
    # measures the query, not session start
    import pandas as pd
    from pyspark.sql import functions as F

    # no annotations: postponed evaluation (future import) stringizes
    # them and pandas_udf rejects the unresolvable signature
    @F.pandas_udf("long")
    def _noop(x):
        return x

    spark.range(0, 10_000, 1, int(CPUS)).select(F.sum(_noop("id"))).collect()
    for t in ("documents", "embeddings", "lineitem", "orders", "part",
              "supplier", "events"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).agg(
            F.count("*")
        ).collect()

    # median-of-N with per-run samples: host load on this shared VM
    # drifts in epochs (±15% on identical code — BENCH.md §3), so a
    # single-shot reading is not a gate. Sample 1 is the cold run;
    # the JSON carries every sample so cold-vs-warm stays visible.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        return s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2

    # optional comma-list filter for paired A/B runs (e.g. the r4->r5
    # regression attribution): only the named queries are timed; the
    # crawl entry runs unless excluded by a non-empty filter
    only = {
        q for q in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if q
    }
    headline = [q for q in HEADLINE if not only or q in only]
    run_crawl = not only or "crawl_end_to_end" in only

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in headline:
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            materialize(QUERIES[name](spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()  # drop leaked persist() barriers
        samples[name] = runs
        timings[name] = round(med(runs), 3)

    # crawl engine end-to-end (fixture web; measures the round pipeline)
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    # big enough that rounds amortize the per-round commit cost: ~1000
    # URLs over ~10 BFS rounds (incl. the www-alias mirror of host 0
    # and every fetch-failure mode)
    # crawl-path warmup (mirrors the query warmup above): a 1-host
    # micro-crawl compiles the round's codegen/exchange paths and
    # initializes the parquet committer, so the timed samples measure
    # the round pipeline, not first-touch JVM costs (~+12s on sample 1
    # otherwise; all raw samples are still reported)
    stats = None
    if run_crawl:
        wcfg = WebGraphConfig(hosts=1, pages_per_host=6, seed=7)
        CrawlEngine(
            spark,
            spark.createDataFrame(generate_pages(wcfg)),
            spark.createDataFrame(generate_sites(wcfg)),
            config=CrawlConfig(state_dir=f"/tmp/wcs_bench_warm_{os.getpid()}"),
        ).run(fresh=True)

        cfg = WebGraphConfig(hosts=4, pages_per_host=200, seed=42)
        pages = spark.createDataFrame(generate_pages(cfg))
        sites = spark.createDataFrame(generate_sites(cfg))
        crawl_runs: list[float] = []
        for i in range(repeats):
            state = f"/tmp/wcs_bench_{os.getpid()}_{i}"
            eng = CrawlEngine(
                spark, pages, sites, config=CrawlConfig(state_dir=state)
            )
            t0 = time.time()
            stats = eng.run(fresh=True)
            crawl_runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        samples["crawl_end_to_end"] = crawl_runs
        crawl_s = med(crawl_runs)
        timings["crawl_end_to_end"] = round(crawl_s, 3)

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {
                    **(
                        {
                            "crawl_urls_visited": stats.total_visits,
                            "crawl_rounds": stats.rounds,
                            "crawl_urls_per_sec": round(
                                stats.total_visits / crawl_s, 3
                            ),
                        }
                        if stats is not None
                        else {}
                    ),
                    "cpus": int(CPUS),
                    "repeats": repeats,
                    "samples": samples,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
