"""Full multi-round CrawlEngine at bigweb scale.

`bench_scaling.py` measures ONE crawl round (the scale-dominant unit)
under pinned cores for the N→4N efficiency criterion; this script
measures the WHOLE engine — seed resolution, BFS round loop, admission,
first-wins dedup, bloom-prefiltered seen anti-join, ordered
frontier/seen commits with background sinks, snapshots, metrics — on a
synthetic web of hosts × pages_per_host pages (binary-tree links, same
generator as the scale round), fetched through the PRODUCTION seam
(mapInPandas fetch callback per host_bucket; the pipelined-commit
shortcut is disabled by construction because a fetcher is present).

The point: the per-round fixed cost documented in BENCH.md §3c
amortizes once rounds carry real row counts — this run shows the
end-to-end URLs/s the engine sustains when the frontier is
10^5-10^6 rows deep, with every durability guarantee on.

Usage: python bench_fullcrawl.py [--hosts 48] [--pages-per-host 20000]
           [--cpus 32] [--bloom-shards 1] [--out bench_results/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

import pandas as pd


def robust_fetcher(hosts: int, pages_per_host: int):
    """`make_synthetic_fetcher` answers only real page URLs
    (https://host/ or https://host/p{j}); a full crawl's admission
    pipeline can let a malformed-but-crawlable link through, which on a
    real crawl would be an HTTP 404. Split the batch by URL shape and
    answer unknown paths with 404 rows (same columns, null html)."""
    from web_crawler_spark.fixtures.bigweb import make_synthetic_fetcher

    inner = make_synthetic_fetcher(hosts, pages_per_host)
    shape = r"^https://[a-z0-9.-]+(?:/|/p\d+/?)?$"

    def fetch(req: pd.DataFrame) -> pd.DataFrame:
        ok = req["url_key"].str.match(shape)
        parts = []
        if ok.any():
            parts.append(inner(req[ok]))
        if (~ok).any():
            parts.append(
                pd.DataFrame(
                    {
                        "url_key": req.loc[~ok, "url_key"],
                        "status_code": 404,
                        "content_type": "text/html",
                        "html": None,
                        "rendered_html": None,
                        "first_attempts_429": 0,
                        "response_time_ms": 10,
                        "content_length": 0,
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    return fetch


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=48)
    ap.add_argument("--pages-per-host", type=int, default=20_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--bloom-shards", type=int, default=1)
    ap.add_argument(
        "--max-per-host-round",
        type=int,
        default=0,
        help="politeness cap: dequeue at most this many URLs per host "
        "per round (0 = reference parity, no cap). Exercises the "
        "deferral path — excess frontier rows wait for a later round "
        "instead of being dropped — at scale",
    )
    ap.add_argument(
        "--interrupt-at",
        type=int,
        default=0,
        help="kill the crawl after this many rounds, then RESUME it "
        "with a fresh engine (new JVM state, new bloom) from the "
        "durable round snapshots — the north-rule checkpoint-resume "
        "path exercised at scale instead of fixture scale",
    )
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    from web_crawler_spark.engine import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        _host_name,
        generate_pages,
    )
    from web_crawler_spark.session import get_spark

    spark = get_spark(
        "bench-fullcrawl",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    cfg = WebGraphConfig(
        hosts=args.hosts,
        pages_per_host=args.pages_per_host,
        www_alias_host0=False,
    )
    sites = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "siteid": h + 1,
                    "custid": 100 + h,
                    "url": f"https://{_host_name(cfg, h)}",
                    "enabled": True,
                }
                for h in range(args.hosts)
            ]
        )
    )
    # pages table is unused on the fetch-callback path; the engine only
    # needs its schema — one synthetic row supplies it
    pages = spark.createDataFrame(
        generate_pages(WebGraphConfig(hosts=1, pages_per_host=1))
    )
    state = tempfile.mkdtemp(prefix="wcs_fullcrawl_")

    def make_engine(max_rounds: int = 10_000) -> CrawlEngine:
        return CrawlEngine(
            spark,
            pages,
            sites,
            config=CrawlConfig(
                state_dir=state,
                max_rounds=max_rounds,
                max_per_host_round=args.max_per_host_round or None,
                bloom_shards=args.bloom_shards,
                bloom_expected=args.hosts * args.pages_per_host * 2,
            ),
            fetcher=robust_fetcher(args.hosts, args.pages_per_host),
        )

    t0 = time.monotonic()
    interrupted = None
    if args.interrupt_at:
        stats_a = make_engine(max_rounds=args.interrupt_at).run(fresh=True)
        t1 = time.monotonic()
        # fresh engine object: nothing survives but the durable round
        # snapshots under state_dir (same recovery surface as a new
        # driver JVM); resume() replays meta and continues
        eng = make_engine()
        stats = eng.resume()
        wall = time.monotonic() - t0
        interrupted = {
            "interrupt_at_round": args.interrupt_at,
            "phase_a_rounds": stats_a.rounds,
            "phase_a_visits": stats_a.total_visits,
            "phase_a_wall_s": round(t1 - t0, 1),
            "phase_b_wall_s": round(wall - (t1 - t0), 1),
        }
        # run()'s CrawlStats counts its own rounds; total coverage is
        # the durable fetch_log across both phases
        visited = eng.visits().count()
        per_round = stats_a.per_round + stats.per_round
    else:
        eng = make_engine()
        stats = eng.run(fresh=True)
        wall = time.monotonic() - t0
        visited = stats.total_visits
        per_round = stats.per_round
    result = {
        "metric": "full-engine crawl URLs/s (production fetch seam, "
        "ordered commits + background sinks)",
        "hosts": args.hosts,
        "pages_per_host": args.pages_per_host,
        "cpus": args.cpus,
        "bloom_shards": args.bloom_shards,
        "max_per_host_round": args.max_per_host_round or None,
        "rounds": stats.rounds,
        "urls_visited": visited,
        "wall_s": round(wall, 1),
        "urls_per_sec": round(visited / wall, 1),
        "per_round_visited": [r["visited"] for r in per_round],
        "ms_plan_total": round(sum(r["ms_plan"] for r in per_round), 1),
        "ms_seen_commit_total": round(
            sum(r["ms_seen_commit"] for r in per_round), 1
        ),
        "ms_sinks_wait_total": round(
            sum(r["ms_sinks_wait"] for r in per_round), 1
        ),
        "ms_frontier_wait_total": round(
            sum(r["ms_frontier_wait"] for r in per_round), 1
        ),
    }
    if interrupted:
        result["resume"] = interrupted
    print(json.dumps(result))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    shutil.rmtree(state, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
