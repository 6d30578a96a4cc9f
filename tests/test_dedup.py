"""Dedup operator tests: prefix-filtered exact join ≡ naive join,
planted near-duplicates are found by every tier, exact dedup keeps
one keeper per content group."""

from __future__ import annotations

import pytest

from web_crawler_spark.operators.dedup import (
    exact_dedup_groups,
    exact_dedup_keep,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_naive,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE.replace("warm", "cold")),  # near dup of 1
        (4, BASE.replace("quick brown", "slow red")),  # near dup
        (5, "completely different text about spark dataframes and shuffles"),
        (6, "another unrelated document mentioning parquet and iceberg tables"),
        (7, BASE + " with an extra trailing clause appended at the end"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    groups = exact_dedup_groups(docs).toPandas()
    dup = groups[groups["n_copies"] > 1]
    assert len(dup) == 1
    assert dup.iloc[0]["n_copies"] == 2
    assert dup.iloc[0]["keeper_id"] == 1
    kept = exact_dedup_keep(docs).toPandas()
    assert len(kept) == 6
    assert 2 not in set(kept["doc_id"])


def test_prefix_filter_equals_naive(docs):
    for n, t in [(2, 0.3), (3, 0.2), (1, 0.5)]:
        fast = ngram_jaccard_pairs(docs, n=n, threshold=t).toPandas()
        naive = ngram_jaccard_pairs_naive(docs, n=n, threshold=t).toPandas()
        key = ["id_a", "id_b"]
        fast = fast.sort_values(key).reset_index(drop=True)
        naive = naive.sort_values(key).reset_index(drop=True)
        assert fast.equals(naive), (n, t, fast, naive)


def test_blocked_equals_naive(docs):
    """Blocked-tile exact plan ≡ naive plan ≡ prefix-join plan."""
    from web_crawler_spark.operators.dedup import ngram_jaccard_pairs_blocked

    for n, t in [(2, 0.3), (3, 0.2), (1, 0.5)]:
        blocked = ngram_jaccard_pairs_blocked(
            docs, n=n, threshold=t, num_blocks=4
        ).toPandas()
        naive = ngram_jaccard_pairs_naive(docs, n=n, threshold=t).toPandas()
        key = ["id_a", "id_b"]
        blocked = blocked.sort_values(key).reset_index(drop=True)
        naive = naive.sort_values(key).reset_index(drop=True)
        assert blocked.equals(naive), (n, t, blocked, naive)


def test_blocked_string_ids(spark, docs):
    """String doc_ids (crawl documents schema) ride a hash surrogate
    through the blocked plan and come back as the original strings —
    same pairs as the prefix plan, which preserves id type natively."""
    from pyspark.sql import functions as F

    from web_crawler_spark.operators.dedup import ngram_jaccard_pairs_blocked

    sdocs = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "text",
    )
    blocked = ngram_jaccard_pairs_blocked(
        sdocs, n=2, threshold=0.3, num_blocks=4
    ).toPandas()
    prefix = ngram_jaccard_pairs(sdocs, n=2, threshold=0.3).toPandas()
    key = ["id_a", "id_b"]
    blocked = blocked.sort_values(key).reset_index(drop=True)
    prefix = prefix.sort_values(key).reset_index(drop=True)
    assert blocked["id_a"].map(lambda s: s.startswith("doc-")).all()
    assert blocked.equals(prefix), (blocked, prefix)


def test_ngram_finds_planted_pairs(docs):
    pairs = ngram_jaccard_pairs(docs, n=2, threshold=0.5).toPandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (1, 2) in got  # exact dup → jaccard 1.0
    assert (1, 3) in got and (2, 3) in got
    assert not any(5 in p or 6 in p for p in got)
    j12 = pairs.set_index(["id_a", "id_b"]).loc[(1, 2), "jaccard"]
    assert j12 == 1.0


def test_minhash_finds_planted_pairs(docs):
    pairs = minhash_lsh_pairs(docs, threshold=0.5).toPandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (1, 2) in got
    assert (1, 3) in got
    est12 = pairs.set_index(["id_a", "id_b"]).loc[(1, 2), "est_jaccard"]
    assert est12 == 1.0
    assert not any({5, 6} & set(p) for p in got)


def test_simhash_finds_exact_dup(docs):
    pairs = simhash_pairs(docs, max_hamming=3).toPandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (1, 2) in got
    h12 = pairs.set_index(["id_a", "id_b"]).loc[(1, 2), "hamming"]
    assert h12 == 0


# ---------------------------------------------------------------------------
# embedding-cosine near-dup tier (operators/similarity.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vecs(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.standard_normal((20, 16))
    rows = [(i, base[i].tolist(), 0) for i in range(20)]
    # planted near-dups: 20≈0, 21≈1 (tiny perturbations)
    rows.append((20, (base[0] + 0.01 * rng.standard_normal(16)).tolist(), 1))
    rows.append((21, (base[1] + 0.01 * rng.standard_normal(16)).tolist(), 1))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).cache()


def test_embedding_cosine_blocked_equals_naive(spark, vecs):
    """Blocked-matmul exact tier must equal the naive zip_with plan."""
    from pyspark.sql import functions as F

    from web_crawler_spark.operators.similarity import (
        cosine_col,
        embedding_cosine_pairs,
    )

    thr = 0.5
    blocked = (
        embedding_cosine_pairs(vecs, threshold=thr, num_blocks=4, sim_round=4)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    l = vecs.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va")
    )
    r = vecs.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb")
    )
    naive = (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine_col(F.col("_va"), F.col("_vb")), 4))
        .filter(F.col("cos_sim") >= thr)
        .select("id_a", "id_b", "cos_sim")
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert blocked.equals(naive), (blocked, naive)
    planted = {(0, 20), (1, 21)}
    assert planted <= set(zip(blocked["id_a"], blocked["id_b"]))


def test_embedding_cosine_lsh_subset_of_exact(spark, vecs):
    """LSH candidates that pass the threshold are a subset of the exact
    pairs (approximate-by-design: may miss, never invents)."""
    from web_crawler_spark.operators.similarity import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_lsh,
    )

    exact = embedding_cosine_pairs(
        vecs, threshold=0.5, num_blocks=4, sim_round=4
    ).toPandas()
    approx = embedding_cosine_pairs_lsh(
        vecs, dim=16, threshold=0.5, num_bits=16, sim_round=4
    ).toPandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    approx_pairs = set(zip(approx["id_a"], approx["id_b"]))
    assert approx_pairs <= exact_pairs
    # near-identical vectors land in the same bucket with overwhelming
    # probability — the planted dups must be recalled
    assert (0, 20) in approx_pairs and (1, 21) in approx_pairs


def test_ivf_full_probe_equals_brute_force(spark, vecs):
    """IVF with nprobe == num_centroids degenerates to exact search:
    every query scans every cell, so top-k must equal brute force."""
    from web_crawler_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    queries = vecs.filter("vec_id < 4")
    exact = (
        brute_force_topk(vecs, queries, k=3, sim_round=4)
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    ivf = (
        ivf_topk(
            vecs, queries, dim=16, k=3, num_centroids=4, nprobe=4,
            iters=2, sim_round=4,
        )
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    assert ivf.equals(exact), (ivf, exact)


def test_ivf_partial_probe_recalls_planted_dups(spark, vecs):
    """A near-identical vector lands in the same k-means cell as its
    original, so even nprobe=1 must recall the planted dups at rank 1."""
    from web_crawler_spark.operators.similarity import ivf_topk

    out = ivf_topk(
        vecs, vecs.filter("vec_id IN (20, 21)"), dim=16, k=1,
        num_centroids=4, nprobe=1, iters=2, sim_round=4,
    ).toPandas()
    got = dict(zip(out["query_id"], out["neighbor_id"]))
    assert got.get(20) == 0 and got.get(21) == 1, got


def test_dedup_clusters_transitive(spark):
    """Connected components must merge transitively: A-B and B-C pairs
    put A,B,C in one cluster keyed by min id, even with no A-C pair;
    isolated docs stay their own cluster."""
    from web_crawler_spark.operators.dedup import dedup_clusters

    ids = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "id_a long, id_b long"
    )
    out = dedup_clusters(ids, pairs).toPandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {0: 0, 1: 1, 3: 1, 5: 1, 2: 2, 6: 2, 4: 4}, got


# ---------------------------------------------------------------------------
# hot-bucket cap (cap_buckets): the 10^10-doc guard on the LSH joins
# ---------------------------------------------------------------------------


def test_max_bucket_parity_when_under_cap(docs):
    """A cap larger than every bucket must be a no-op for all three
    capped tiers."""
    base = minhash_lsh_pairs(docs, threshold=0.5).toPandas()
    capped = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=10**6).toPandas()
    key = ["id_a", "id_b"]
    assert sorted(map(tuple, base[key].values.tolist())) == sorted(
        map(tuple, capped[key].values.tolist())
    )
    base_s = simhash_pairs(docs).toPandas()
    capped_s = simhash_pairs(docs, max_bucket=10**6).toPandas()
    assert sorted(map(tuple, base_s[key].values.tolist())) == sorted(
        map(tuple, capped_s[key].values.tolist())
    )


def test_max_bucket_bounds_boilerplate_cluster(spark):
    """A mass-duplicated boilerplate cluster (every band collapses to
    one bucket → quadratic candidates) is dropped by the cap, while
    pairs living in small buckets still surface. Identical docs are
    exact-dedup's job (`exact_dedup_keep` runs FIRST in a real
    pipeline); the cap bounds what leaks through."""
    boiler = "copyright footer navigation menu login subscribe " * 6
    rows = [(i, boiler) for i in range(300)]
    rows += [(1000, BASE), (1001, BASE.replace("warm", "cold"))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=50).toPandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    # the planted near-dup (small buckets) survives the cap
    assert (1000, 1001) in got
    # no candidate pair from the 300-doc boilerplate cluster (its
    # buckets all exceed the cap) — without the cap it contributes
    # 300*299/2 = 44,850 pairs
    assert not any(a < 1000 and b < 1000 for a, b in got)

    spairs = simhash_pairs(docs, max_bucket=50).toPandas()
    sgot = {tuple(r) for r in spairs[["id_a", "id_b"]].itertuples(index=False)}
    assert not any(a < 1000 and b < 1000 for a, b in sgot)


def test_max_bucket_embedding_lsh(spark):
    """Same guard on the hyperplane-LSH tier: a duplicated embedding
    cluster is capped away; a small planted near-dup pair survives."""
    import numpy as np

    from web_crawler_spark.operators.similarity import (
        embedding_cosine_pairs_lsh,
    )

    rng = np.random.RandomState(11)
    hot = rng.standard_normal(16)
    rows = [(i, hot.tolist()) for i in range(200)]
    a = rng.standard_normal(16)
    rows += [(1000, a.tolist()), (1001, (a + 0.01 * rng.standard_normal(16)).tolist())]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    pairs = embedding_cosine_pairs_lsh(
        vecs, dim=16, threshold=0.9, max_bucket=50
    ).toPandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (1000, 1001) in got
    assert not any(a_ < 1000 and b_ < 1000 for a_, b_ in got)
    # uncapped control: the hot cluster floods the pair set
    flood = embedding_cosine_pairs_lsh(vecs, dim=16, threshold=0.9).toPandas()
    assert len(flood) > len(pairs)


def test_max_bucket_lsh_topk_corpus_side(spark):
    """lsh_topk corpus-side cap: a duplicated corpus cluster's bucket
    is dropped (bounded candidates), results for queries whose true
    neighbors live in small buckets are unchanged."""
    import numpy as np

    from web_crawler_spark.operators.similarity import lsh_topk

    rng = np.random.RandomState(5)
    hot = rng.standard_normal(16)
    rows = [(i, hot.tolist()) for i in range(200)]
    base = rng.standard_normal((8, 16))
    rows += [(500 + i, base[i].tolist()) for i in range(8)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(9000 + i, (base[i] + 0.01 * rng.standard_normal(16)).tolist())
         for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    capped = lsh_topk(
        corpus, queries, dim=16, k=3, max_bucket=50
    ).toPandas()
    # no hot-cluster member may appear (its buckets exceed the cap)...
    assert (capped["neighbor_id"] >= 500).all()
    # ...and each query still finds its true small-bucket neighbor
    top1 = (
        capped.sort_values(["query_id", "cos_sim"], ascending=[True, False])
        .groupby("query_id").head(1)
    )
    for _, r in top1.iterrows():
        assert r["neighbor_id"] == r["query_id"] - 9000 + 500
