"""Paired cold A/B: current HEAD vs the round-3 commit (r5 verdict task 1).

The r4 driver bench read crawl 22.1 -> 28.2 s and dedup_minhash_lsh
2.96 -> 5.18 s vs r3, while same-box builder sessions bracketed the
crawl at 19.1-22.9 s — an unowned gap. This script reproduces the
driver's protocol (cold `python bench.py` subprocess, median-of-3
inside each invocation, full suite) as interleaved PAIRS so host-load
epochs cancel inside each ratio, exactly the repo's scaling-bench
methodology (BENCH.md §1): for each pair, one full bench run at HEAD
and one at the r3 commit back-to-back, alternating leg order across
pairs; the reported number per query is the median of per-pair
HEAD/r3 ratios.

Setup (once):
  git worktree add --detach /tmp/wcs_r3_ab dee2b67

Usage: python tools/bench_ab_r5.py [--pairs 3]
Writes bench_results/ab_r5_head_vs_r3.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HEAD_DIR = "/root/repo"
R3_DIR = "/tmp/wcs_r3_ab"
R3_COMMIT = "dee2b67"
FOCUS = ["crawl_end_to_end", "dedup_minhash_lsh", "dedup_simhash",
         "dedup_embedding_lsh", "ann_lsh_topk", "dedup_clusters"]


def ensure_worktree() -> None:
    if os.path.isfile(os.path.join(R3_DIR, "bench.py")):
        return
    subprocess.run(
        ["git", "worktree", "add", "--detach", R3_DIR, R3_COMMIT],
        cwd=HEAD_DIR, check=True,
    )


def run_leg(leg_dir: str, repeats: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_REPEATS"] = str(repeats)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=leg_dir, env=env,
        capture_output=True, text=True, check=True,
    )
    wall = time.time() - t0
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            d["_leg_wall_s"] = round(wall, 1)
            return d
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no JSON line from bench.py in {leg_dir}:\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def med(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3,
                    help="median-of-N inside each bench.py invocation "
                         "(the driver runs 3)")
    args = ap.parse_args()

    ensure_worktree()
    pairs = []
    for i in range(args.pairs):
        order = [("head", HEAD_DIR), ("r3", R3_DIR)]
        if i % 2:  # alternate leg order so within-pair drift cancels too
            order.reverse()
        legs = {}
        for name, d in order:
            print(f"pair {i + 1}/{args.pairs}: running {name} leg "
                  f"({d})...", flush=True)
            legs[name] = run_leg(d, args.repeats)
        pair = {
            "order": [name for name, _ in order],
            "head": legs["head"]["queries"],
            "r3": legs["r3"]["queries"],
            "head_samples": legs["head"].get("samples"),
            "r3_samples": legs["r3"].get("samples"),
            "head_wall_s": legs["head"]["_leg_wall_s"],
            "r3_wall_s": legs["r3"]["_leg_wall_s"],
        }
        pair["ratios"] = {
            q: round(pair["head"][q] / pair["r3"][q], 3)
            for q in FOCUS if q in pair["head"] and q in pair["r3"]
        }
        print(f"pair {i + 1} ratios (HEAD/r3): {pair['ratios']}",
              flush=True)
        pairs.append(pair)

    summary = {
        q: {
            "head_med": med([p["head"][q] for p in pairs]),
            "r3_med": med([p["r3"][q] for p in pairs]),
            "pair_ratios": [p["ratios"][q] for p in pairs],
            "median_pair_ratio": round(
                med([p["ratios"][q] for p in pairs]), 3),
        }
        for q in FOCUS if all(q in p["ratios"] for p in pairs)
    }
    result = {
        "protocol": "interleaved cold bench.py pairs, full suite, "
                    f"median-of-{args.repeats} per invocation, "
                    "alternating leg order",
        "r3_commit": R3_COMMIT,
        "pairs": pairs,
        "summary": summary,
    }
    out = os.path.join(HEAD_DIR, "bench_results",
                       "ab_r5_head_vs_r3.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"summary": summary}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
