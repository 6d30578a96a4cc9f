"""spark-submit entry point for the crawl engine (north rule: "runs
via spark-submit --py-files on a multi-executor cluster").

Package the library and submit — no repo checkout needed on executors:

    cd /root/repo
    python -c "import shutil; shutil.make_archive('/tmp/wcs_pyfiles', 'zip', '.', 'web_crawler_spark')"
    spark-submit --master local[16] \
        --conf spark.sql.adaptive.enabled=true \
        --py-files /tmp/wcs_pyfiles.zip \
        tools/submit_crawl.py --hosts 4 --pages 40 --state /tmp/wcs_submit

On a real cluster, replace --master with the cluster manager and the
fixture web with parquet/Iceberg input tables (--pages-parquet /
--sites-parquet). The driver loop, partitioning, and sinks are
identical — executors only ever see DataFrame tasks.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=4)
    ap.add_argument("--pages", type=int, default=40)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--state", default="/tmp/wcs_submit_state")
    ap.add_argument("--pages-parquet", default=None,
                    help="parquet fetch-source table (overrides fixture web)")
    ap.add_argument("--sites-parquet", default=None)
    ap.add_argument("--max-per-host", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    # spark-submit owns the session config (master, executors, AQE);
    # builder here only fills in defaults for bare `python` runs.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("web-crawler-spark")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine

    if args.pages_parquet and args.sites_parquet:
        pages = spark.read.parquet(args.pages_parquet)
        sites = spark.read.parquet(args.sites_parquet)
    else:
        from web_crawler_spark.fixtures.webgraph import (
            WebGraphConfig,
            generate_pages,
            generate_sites,
        )

        cfg = WebGraphConfig(
            hosts=args.hosts, pages_per_host=args.pages, seed=args.seed
        )
        pages = spark.createDataFrame(generate_pages(cfg))
        sites = spark.createDataFrame(generate_sites(cfg))

    eng = CrawlEngine(
        spark,
        pages,
        sites,
        config=CrawlConfig(
            state_dir=args.state, max_per_host_round=args.max_per_host
        ),
    )
    t0 = time.time()
    stats = eng.run(fresh=not args.resume)
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "rounds": stats.rounds,
                "total_visits": stats.total_visits,
                "wall_s": round(wall, 2),
                "urls_per_sec": round(stats.total_visits / max(wall, 1e-9), 2),
                "state_dir": args.state,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
