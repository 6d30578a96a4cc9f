"""Measure planner-sized vs r4-fixed LSH configs (r5 verdict task 2).

For the two registered sign-LSH queries (embedding near-dup pairs,
ANN top-k) compare the `lsh_plan`-derived config against the r4
hand-picked 16×8-bit + full-multiprobe config at the same sf:
wall time (median of 3), candidate mass (pairs surviving the band
join, i.e. the work the verify stage must do), output size, and
recall vs the exact tier computed live.

Usage: python tools/bench_lsh_planner.py [sf_dir]
Writes bench_results/lsh_planner_r5.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)

FIXED_EMB = dict(dim=64, threshold=0.4, num_bits=128, bands=16,
                 multiprobe=True, probe_bits=None)
FIXED_ANN = dict(dim=64, k=5, num_bits=128, bands=16,
                 multiprobe=True, probe_bits=None)


def med(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main() -> None:
    from pyspark.sql import functions as F

    from web_crawler_spark.operators.similarity import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_lsh,
        brute_force_topk,
        lsh_topk,
    )
    from web_crawler_spark.queries import _ann_lsh_cfg, _emb_lsh_cfg
    from web_crawler_spark.session import get_spark

    spark = get_spark(
        "lsh_planner_bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    emb = emb.persist()
    n = emb.count()

    exact_pairs = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs(
            emb, threshold=0.4, sim_round=4
        ).collect()
    }
    brute = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, sim_round=4
    )
    exact_topk = {(r.query_id, r.neighbor_id) for r in brute.collect()}

    out: dict = {"sf_dir": SF_DIR, "n": n, "results": {}}

    def run_emb(tag: str, cfg: dict) -> None:
        walls = []
        for _ in range(3):
            t0 = time.time()
            got = {
                (r.id_a, r.id_b)
                for r in embedding_cosine_pairs_lsh(
                    emb, sim_round=4, **cfg
                ).collect()
            }
            walls.append(round(time.time() - t0, 3))
        # candidate mass: same banding with the verify filter disabled
        cand_cfg = dict(cfg, threshold=-1.0)
        n_cand = embedding_cosine_pairs_lsh(emb, **cand_cfg).count()
        recall = (
            len(got & exact_pairs) / len(exact_pairs) if exact_pairs else 1.0
        )
        out["results"][f"emb_lsh_{tag}"] = {
            "cfg": {k: v for k, v in cfg.items() if k != "dim"},
            "wall_sec_median": med(walls),
            "walls": walls,
            "candidate_pairs": n_cand,
            "out_pairs": len(got),
            "pair_recall": round(recall, 4),
        }

    def run_ann(tag: str, cfg: dict) -> None:
        walls = []
        for _ in range(3):
            t0 = time.time()
            got = {
                (r.query_id, r.neighbor_id)
                for r in lsh_topk(
                    emb, emb.filter(F.col("vec_id") < 10), sim_round=4, **cfg
                ).collect()
            }
            walls.append(round(time.time() - t0, 3))
        recall = (
            len(got & exact_topk) / len(exact_topk) if exact_topk else 1.0
        )
        out["results"][f"ann_lsh_{tag}"] = {
            "cfg": {k: v for k, v in cfg.items() if k not in ("dim", "k")},
            "wall_sec_median": med(walls),
            "walls": walls,
            "recall_at_5": round(recall, 4),
        }

    run_emb("planned", _emb_lsh_cfg(SF_DIR))
    run_emb("fixed_r4", FIXED_EMB)
    run_ann("planned", _ann_lsh_cfg(SF_DIR))
    run_ann("fixed_r4", FIXED_ANN)

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/lsh_planner_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
