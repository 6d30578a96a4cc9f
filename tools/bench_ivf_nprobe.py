"""IVF recall-vs-nprobe knee (r5 verdict task 7).

Sweeps nprobe over the registered 16-centroid IVF index at a given sf
and reports recall@5 vs the exact brute-force top-k, the median wall
of 3 runs, and the probed corpus fraction (nprobe/num_centroids) — the
cost driver at scale, where the probe join touches that fraction of
the corpus per query. Centroids are trained once (the registered
deterministic md5-sampled training) and shared across the sweep so
the knee isolates nprobe.

Usage: python tools/bench_ivf_nprobe.py [sf_dir]
Writes bench_results/ivf_nprobe_r5.json.
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
NPROBES = [1, 2, 4, 6, 8, 10, 12, 16]


def med(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main() -> None:
    from pyspark.sql import functions as F

    from web_crawler_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from web_crawler_spark.queries import ANN_IVF_PARAMS, _ivf_centroids
    from web_crawler_spark.session import get_spark

    spark = get_spark(
        "ivf_nprobe_bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    emb = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).persist()
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(
            emb, q, k=ANN_IVF_PARAMS["k"], sim_round=4
        ).collect()
    }
    cents = _ivf_centroids(spark, SF_DIR)

    out = {"sf_dir": SF_DIR, "n": n,
           "num_centroids": ANN_IVF_PARAMS["num_centroids"], "sweep": []}
    for nprobe in NPROBES:
        walls, got = [], set()
        for _ in range(3):
            t0 = time.time()
            got = {
                (r.query_id, r.neighbor_id)
                for r in ivf_topk(
                    emb, q,
                    dim=ANN_IVF_PARAMS["dim"], k=ANN_IVF_PARAMS["k"],
                    num_centroids=ANN_IVF_PARAMS["num_centroids"],
                    nprobe=nprobe, sim_round=4, centroids=cents,
                ).collect()
            }
            walls.append(round(time.time() - t0, 3))
        out["sweep"].append(
            {
                "nprobe": nprobe,
                "recall_at_5": round(len(got & exact) / len(exact), 4),
                "wall_sec_median": med(walls),
                "corpus_fraction": round(
                    nprobe / ANN_IVF_PARAMS["num_centroids"], 4
                ),
            }
        )
        print(out["sweep"][-1], flush=True)

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/ivf_nprobe_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
