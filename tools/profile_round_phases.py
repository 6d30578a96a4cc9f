"""Phase decomposition of the bench_scaling round, pinned per level.

Finds WHERE the Amdahl-serial time of the scale round lives: times the
round's cumulative sub-plans separately (rank / fetch-join / parse+persist /
downstream dedup+anti-join) and samples utilization of the pinned cores
every second during the full round so serial stretches show up as ~1-core
plateaus in the timeline.

Usage:
    python tools/profile_round_phases.py            # orchestrates 2 and 8
    python tools/profile_round_phases.py --single 8 # child, pinned by parent
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_scaling  # noqa: E402
from bench_scaling import DATA_DIR  # noqa: E402


def _cpu_busy(cores: list[int]) -> float:
    """Total busy jiffies across the given cpu ids."""
    busy = 0.0
    with open("/proc/stat") as f:
        for ln in f:
            if ln.startswith("cpu") and ln[3].isdigit():
                parts = ln.split()
                if int(parts[0][3:]) in cores:
                    v = [float(x) for x in parts[1:]]
                    busy += sum(v) - v[3] - v[4]  # minus idle+iowait
    return busy


class UtilSampler(threading.Thread):
    def __init__(self, cores: list[int]):
        super().__init__(daemon=True)
        self.cores = cores
        self.samples: list[float] = []
        self._stop = threading.Event()

    def run(self) -> None:
        hz = os.sysconf("SC_CLK_TCK")
        prev = _cpu_busy(self.cores)
        while not self._stop.wait(1.0):
            cur = _cpu_busy(self.cores)
            self.samples.append((cur - prev) / hz)  # busy-cores over the 1s
            prev = cur

    def stop(self) -> list[float]:
        self._stop.set()
        return self.samples


def profile(cores: int) -> dict:
    from pyspark.sql import functions as F

    from web_crawler_spark.fixtures.bigweb import make_synthetic_fetcher
    from web_crawler_spark.functions.html import outlink_spans_col
    from web_crawler_spark.functions.urls import (
        allowed_domain_col,
        classify_block_col,
        normalize_url_udf,
        registrable_host_col,
    )
    from web_crawler_spark.operators.fetch import fetch_parse_with_callback
    from web_crawler_spark.operators.ranking import first_wins, with_global_rank
    from web_crawler_spark.operators.seen import BroadcastBloom, anti_join_seen
    from web_crawler_spark.session import get_spark

    spark = get_spark(
        f"prof_{cores}", master=f"local[{cores}]", shuffle_partitions=4 * cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench_scaling._warmup(spark)

    frontier = spark.read.parquet(f"{DATA_DIR}/frontier")
    seen = spark.read.parquet(f"{DATA_DIR}/seen")
    n_frontier = frontier.count()
    hosts = int(os.environ.get("WCS_SCALING_HOSTS", "48"))
    fetcher = make_synthetic_fetcher(hosts, n_frontier // hosts)
    bloom = BroadcastBloom.empty(max(n_frontier, 1_000_000), 0.01)
    bloom.add_keys(seen.select("url_key"), "url_key")

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 1)

    def ranked():
        return with_global_rank(
            frontier,
            ["depth", "parent_ord", "link_idx"],
            out="visit_ord",
            small_threshold=10_000,
            known_count=n_frontier,
        ).withColumn("seed_url", F.concat(F.lit("https://"), F.col("host")))

    ct = F.lower(F.coalesce(F.col("content_type"), F.lit("")))
    success = (
        F.col("status_code").isNotNull()
        & F.col("status_code").between(200, 299)
        & ct.contains("text/html")
    )
    base_key = registrable_host_col(F.col("url_key"))

    # 1. rank alone
    timed("rank", lambda: ranked().write.format("noop").mode("overwrite").save())
    # 2. + fused fetch+parse + persist materialization (the barrier)
    parsed = (
        fetch_parse_with_callback(ranked(), fetcher)
        .withColumn("outlinks", outlink_spans_col(F.col("spans"), base_key))
        .persist()
    )
    timed("fetch_parse_persist", lambda: parsed.count())

    # 3. downstream from the persisted barrier: explode -> filters ->
    #    normalize -> first-wins -> anti-join -> noop
    def downstream():
        cand = parsed.filter(success).select(
            "siteid",
            "seed_url",
            F.col("url_key").alias("parent_key"),
            F.col("visit_ord").alias("parent_ord"),
            (F.col("depth") + 1).alias("depth"),
            F.posexplode("outlinks").alias("link_idx", "span"),
        ).withColumn("u", F.col("span.media_ref")).drop("span")
        cand = cand.withColumn("block_type", classify_block_col(F.col("u"))).filter(
            F.col("block_type").isNull()
            & allowed_domain_col(F.col("seed_url"), F.col("u"))
        )
        new_links = cand.withColumn("url_key", normalize_url_udf(F.col("u"))).drop("u")
        new_links = first_wins(
            new_links, ["siteid", "url_key"], ["depth", "parent_ord", "link_idx"]
        )
        new_links = anti_join_seen(new_links, seen, ["siteid", "url_key"], bloom)
        new_links.write.format("noop").mode("overwrite").save()

    timed("downstream", downstream)
    parsed.unpersist()

    # 5. the actual measured round, with a per-second core-utilization
    #    timeline over the pinned cores
    sampler = UtilSampler(list(range(cores)))
    sampler.start()
    n, dt = bench_scaling.run_round(spark)
    tl = sampler.stop()
    timings["full_round"] = round(dt, 1)
    spark.stop()
    return {
        "cores": cores,
        "phases": timings,
        "util_timeline": [round(x, 1) for x in tl],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", type=int, default=0)
    ap.add_argument("--levels", type=str, default="2,8")
    ap.add_argument("--pages", type=int, default=960_000)
    ap.add_argument("--hosts", type=int, default=48)
    args = ap.parse_args()

    if args.single:
        print("RESULT " + json.dumps(profile(args.single)))
        return

    import shutil
    import subprocess

    bench_scaling.prepare_input(args.pages, args.hosts)
    pin = shutil.which("taskset") is not None
    for cores in (int(c) for c in args.levels.split(",")):
        cmd = [sys.executable, os.path.abspath(__file__), "--single", str(cores)]
        if pin:
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
        line = next(
            ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
        )
        print(line[len("RESULT "):])


if __name__ == "__main__":
    main()
