"""Skew experiment: hot-host dequeue, salted vs unsalted (BENCH.md §1c).

A crawl frontier is the canonical skewed workload: one viral/huge host
can own half the queue. The engine's dequeue is a row_number window
over (siteid, host) — hash-partitioned by host, so a hot host's entire
row set lands in ONE window partition and its sort becomes the round's
straggler task. AQE cannot split it (skew mitigation applies to joins
and rebalance exchanges, not window sorts), so the engine's lever is
`CrawlConfig.dequeue_salts`: a two-phase top-k where phase 1 windows
over (siteid, host, hash(url_key) % num_salts) — the hot host spreads
across num_salts shards, each keeping ≤cap rows — and the exact phase-2
window sees at most num_salts·cap rows per host (provably identical
output; tests/test_politeness.py pins parity).

This bench materializes a deliberately skewed frontier (one host owns
~50% of N rows, the rest uniform over 63 hosts), runs the dequeue both
ways on the same input, and reports wall time plus PER-TASK duration
quantiles of the straggler stage (from the Spark UI REST API) — the
direct evidence that salting cuts the tail task, not just the total.

Usage: python bench_skew.py [--rows N] [--cap C] [--salts S] [--cpus 8]
Prints one JSON line per run plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time
import urllib.request

from pyspark.sql import functions as F

DATA_DIR = "/tmp/wcs_skew_input"


def prepare(spark, rows: int, hosts: int = 64) -> None:
    marker = os.path.join(DATA_DIR, f"_OK_{rows}_{hosts}")
    if os.path.exists(marker):
        return
    shutil.rmtree(DATA_DIR, ignore_errors=True)
    # every even id → the hot host (50% of rows); odd ids spread
    # uniformly over the cold hosts. Row order interleaves hot/cold so
    # input file layout carries no accidental pre-grouping.
    host = F.when(
        F.col("id") % 2 == 0, F.lit("hot.test")
    ).otherwise(
        F.concat(
            F.lit("h"),
            F.pmod(F.xxhash64("id"), F.lit(hosts - 1)).cast("string"),
            F.lit(".test"),
        )
    )
    (
        spark.range(0, rows, 1, 64)
        .select(
            F.lit(1).alias("siteid"),
            host.alias("host"),
            F.concat(
                F.lit("https://"), host, F.lit("/p"), F.col("id")
            ).alias("url_key"),
            (F.col("id") % 7).cast("int").alias("depth"),
            (F.col("id") % 100_000).alias("parent_ord"),
            (F.col("id") % 30).cast("int").alias("link_idx"),
        )
        .write.mode("overwrite")
        .parquet(f"{DATA_DIR}/frontier")
    )
    open(marker, "w").close()


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _new_stage_summaries(spark, seen: set) -> list[dict]:
    """Task-duration quantiles for every completed stage not yet seen —
    read from the local Spark UI REST API (localhost, no network)."""
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    out = []
    for s in _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE"):
        sid = (s["stageId"], s["attemptId"])
        if sid in seen:
            continue
        seen.add(sid)
        try:
            ts = _rest(
                f"{ui}/api/v1/applications/{app_id}/stages/"
                f"{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.0,0.5,0.95,1.0"
            )
            out.append(
                {
                    "stage": s["stageId"],
                    "tasks": s["numTasks"],
                    "dur_ms_q": [round(x, 1) for x in ts["duration"]],
                }
            )
        except Exception:
            pass
    return out


def run_dequeue(spark, cap: int, num_salts: int | None, seen: set) -> dict:
    from web_crawler_spark.operators.politeness import dequeue_batch

    frontier = spark.read.parquet(f"{DATA_DIR}/frontier")
    t0 = time.time()
    batch, deferred = dequeue_batch(
        frontier, max_per_host=cap, num_salts=num_salts
    )
    batch.write.format("noop").mode("overwrite").save()
    deferred.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    stages = _new_stage_summaries(spark, seen)
    straggler = max(
        (st for st in stages if st["tasks"] > 1),
        key=lambda st: st["dur_ms_q"][-1],
        default=None,
    )
    return {
        "salts": num_salts or 0,
        "wall_sec": round(wall, 2),
        "straggler_stage": straggler,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=3_000_000)
    ap.add_argument("--cap", type=int, default=200)
    ap.add_argument("--salts", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    from web_crawler_spark.session import get_spark

    spark = get_spark(
        "bench_skew",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        # the UI is normally off (engine sessions don't pay its event
        # bus); this bench needs its REST API for per-task durations
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    prepare(spark, args.rows)
    # warm the page cache + Python-free JVM paths (first parquet touch
    # otherwise lands on the first timed condition)
    spark.read.parquet(f"{DATA_DIR}/frontier").count()

    seen: set = set()
    _new_stage_summaries(spark, seen)  # absorb prep/warmup stages
    runs = []
    # alternate conditions so shared-VM load epochs hit both equally
    for _ in range(args.repeat):
        for salts in (None, args.salts):
            r = run_dequeue(spark, args.cap, salts, seen)
            r["rows"] = args.rows
            r["cap"] = args.cap
            print(json.dumps(r))
            runs.append(r)

    best = {}
    for r in runs:
        k = r["salts"]
        if k not in best or r["wall_sec"] < best[k]["wall_sec"]:
            best[k] = r

    def tail(r):
        st = r["straggler_stage"]
        return st["dur_ms_q"][-1] if st else None

    summary = {
        "metric": "skew_dequeue",
        "rows": args.rows,
        "hot_share": 0.5,
        "cap": args.cap,
        "unsalted": {
            "wall_sec": best[0]["wall_sec"],
            "max_task_ms": tail(best[0]),
        },
        "salted": {
            "salts": args.salts,
            "wall_sec": best[args.salts]["wall_sec"],
            "max_task_ms": tail(best[args.salts]),
        },
    }
    if tail(best[0]) and tail(best[args.salts]):
        summary["tail_task_speedup"] = round(
            tail(best[0]) / tail(best[args.salts]), 2
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
