"""Driver-side pandas/numpy mirrors of the approximate operators.

The five approximate queries (minhash-LSH / simhash / embedding-LSH
pairs, LSH / IVF top-k) are not SQL-expressible, so their driver rows
were rows-only through round 3. These mirrors close that hole: each
re-runs the SAME deterministic kernels the distributed operators use
(via the pandas_udf ``.func`` views — signatures, band packing, cell
assignment, cosine re-rank are literally the same numpy code on the
same float64 inputs), but orchestrates the banding / probing /
candidate generation / top-k in plain pandas on the driver.

The recall oracles in ``queries.py`` pre-materialize these outputs to
parquet and hand DuckDB the recall arithmetic. A green recall row then
proves two things at once:

1. the distributed orchestration (bucket shuffle joins, candidate
   dedup, window top-k) reproduces this in-memory reference
   EXACTLY — any divergence in the candidate set or tie-breaking
   flips the hash compare; and
2. recall against the exact tier (computed independently by DuckDB
   from the raw tables) clears the asserted floor.

Only the approximate side is mirrored; the exact side of every recall
ratio is DuckDB's own SQL over the raw parquet.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections import defaultdict

import numpy as np
import pandas as pd

_RECALL_DIR = os.path.join(tempfile.gettempdir(), "wcs_recall_oracle")


def _md5_bucket(key, salt: str, buckets: int = 1_000_000) -> int:
    """Bit-for-bit mirror of operators.sampling.hash_bucket_col."""
    h = hashlib.md5((str(key) + "|" + salt).encode()).hexdigest()
    return int(h[:15], 16) % buckets


def _tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")


def mirror_meta_path(mirror_path: str) -> str:
    """Companion meta parquet recording which corpus a mirror was
    materialized from."""
    return mirror_path[: -len(".parquet")] + ".meta.parquet"


def corpus_fingerprint(corpus: pd.DataFrame) -> dict:
    """Integer, order-independent corpus fingerprint the recall-oracle
    guard CTE recomputes in SQL over the registered view: row count,
    id sum, and a content term (total text chars for documents; count
    of positive first components for embeddings — the sf0.001/sf0.01
    fixtures share counts AND id sums, so content must participate)."""
    if "doc_id" in corpus.columns:
        return {
            "n_corpus": len(corpus),
            "id_sum": int(corpus["doc_id"].sum()),
            "content_fp": int(corpus["text"].fillna("").str.len().sum()),
        }
    return {
        "n_corpus": len(corpus),
        "id_sum": int(corpus["vec_id"].sum()),
        "content_fp": int(
            sum(1 for v in corpus["embedding"] if len(v) and v[0] > 0)
        ),
    }


def _write(
    df: pd.DataFrame, name: str, sf_dir: str, corpus: pd.DataFrame
) -> str:
    os.makedirs(_RECALL_DIR, exist_ok=True)
    tag = _tag(sf_dir)
    p = os.path.join(_RECALL_DIR, f"{name}_{tag}.parquet")
    df.to_parquet(p, index=False)
    # Companion meta: the recall-oracle SQL cross-checks the corpus
    # fingerprint against the registered views and raises via DuckDB
    # error() on mismatch. Without it, running a recall oracle against
    # a different sf than the mirror was built from reports a
    # plausible-looking recall of ~0 instead of failing loudly
    # (r4 verdict watch item 2).
    fp = corpus_fingerprint(corpus)
    pd.DataFrame({k: [v] for k, v in fp.items()} | {"sf_tag": [tag]}).to_parquet(
        mirror_meta_path(p), index=False
    )
    return p


def _embeddings(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _documents(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _topk_rows(cand: pd.DataFrame, k: int) -> pd.DataFrame:
    """row_number() OVER (PARTITION BY query_id ORDER BY cos DESC,
    neighbor_id ASC) <= k — same ordering contract as the operators."""
    cand = cand.sort_values(
        ["query_id", "cos", "neighbor_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    return cand.groupby("query_id").head(k)[["query_id", "neighbor_id"]]


def _cosine(qv: list, cv: list) -> np.ndarray:
    """The exact float math of operators.similarity.cosine_pairs_udf."""
    from web_crawler_spark.operators.similarity import cosine_pairs_udf

    return cosine_pairs_udf.func(pd.Series(qv), pd.Series(cv)).to_numpy()


def write_ann_lsh_topk(
    sf_dir: str,
    dim: int,
    k: int,
    num_bits: int,
    multiprobe: bool,
    bands: int = 4,
    probe_bits: int | None = None,
) -> str:
    """lsh_topk mirror → parquet(query_id, neighbor_id)."""
    from web_crawler_spark.operators.similarity import make_hyperplane_udf

    emb = _embeddings(sf_dir)
    ids = emb["vec_id"].to_numpy()
    vecs = {int(i): np.asarray(v, dtype=np.float64) for i, v in
            zip(ids, emb["embedding"])}
    band_vals = np.array(
        make_hyperplane_udf(dim, num_bits, bands=bands)
        .func(emb["embedding"])
        .tolist(),
        dtype=np.int64,
    )
    qmask = ids < 10
    probes = np.array(
        make_hyperplane_udf(
            dim, num_bits, bands=bands, flip=multiprobe,
            probe_bits=probe_bits,
        )
        .func(emb["embedding"][qmask])
        .tolist(),
        dtype=np.int64,
    )
    buckets: dict[int, list[int]] = defaultdict(list)
    for i, row in zip(ids, band_vals):
        for b in row:
            buckets[int(b)].append(int(i))
    qid_l, nid_l, qv_l, cv_l = [], [], [], []
    for qi, prow in zip(ids[qmask], probes):
        cand: set[int] = set()
        for b in set(prow.tolist()):
            cand.update(buckets.get(b, ()))
        cand.discard(int(qi))
        for ni in cand:
            qid_l.append(int(qi))
            nid_l.append(ni)
            qv_l.append(vecs[int(qi)])
            cv_l.append(vecs[ni])
    if not qid_l:
        out = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                            "neighbor_id": pd.Series([], dtype="int64")})
        return _write(out, "ann_lsh_topk", sf_dir, emb)
    cos = _cosine(qv_l, cv_l)
    cand_df = pd.DataFrame(
        {"query_id": qid_l, "neighbor_id": nid_l, "cos": cos}
    )
    return _write(_topk_rows(cand_df, k), "ann_lsh_topk", sf_dir, emb)


def write_ann_ivf_topk(
    sf_dir: str,
    dim: int,
    k: int,
    num_centroids: int,
    nprobe: int,
    iters: int,
    sample_rate: float,
    seed: int,
    salt: str,
) -> str:
    """ivf_topk mirror (sample-trained quantizer) →
    parquet(query_id, neighbor_id)."""
    from web_crawler_spark.operators.similarity import (
        _assign_cell_udf,
        _probe_cells_udf,
        kmeans_np,
    )

    emb = _embeddings(sf_dir)
    ids = emb["vec_id"].to_numpy()
    vecs = {int(i): np.asarray(v, dtype=np.float64) for i, v in
            zip(ids, emb["embedding"])}
    thresh = int(sample_rate * 1_000_000)
    sample_ids = sorted(
        int(i) for i in ids if _md5_bucket(int(i), salt) < thresh
    )
    mat = (
        np.array([vecs[i] for i in sample_ids], dtype=np.float64)
        if sample_ids
        else np.zeros((0, dim), dtype=np.float64)
    )
    cents = kmeans_np(mat, k=num_centroids, iters=iters, seed=seed)
    cells = (
        _assign_cell_udf(cents).func(emb["embedding"]).to_numpy()
    )
    qmask = ids < 10
    probes = (
        _probe_cells_udf(cents, nprobe).func(emb["embedding"][qmask]).tolist()
    )
    cell_members: dict[int, list[int]] = defaultdict(list)
    for i, c in zip(ids, cells):
        cell_members[int(c)].append(int(i))
    qid_l, nid_l, qv_l, cv_l = [], [], [], []
    for qi, prow in zip(ids[qmask], probes):
        cand: set[int] = set()
        for c in set(prow):
            cand.update(cell_members.get(int(c), ()))
        cand.discard(int(qi))
        for ni in cand:
            qid_l.append(int(qi))
            nid_l.append(ni)
            qv_l.append(vecs[int(qi)])
            cv_l.append(vecs[ni])
    if not qid_l:
        out = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                            "neighbor_id": pd.Series([], dtype="int64")})
        return _write(out, "ann_ivf_topk", sf_dir, emb)
    cos = _cosine(qv_l, cv_l)
    cand_df = pd.DataFrame(
        {"query_id": qid_l, "neighbor_id": nid_l, "cos": cos}
    )
    return _write(_topk_rows(cand_df, k), "ann_ivf_topk", sf_dir, emb)


def write_minhash_pairs(
    sf_dir: str, num_perm: int, bands: int, shingle_k: int, threshold: float
) -> str:
    """minhash_lsh_pairs mirror → parquet(id_a, id_b)."""
    from web_crawler_spark.functions.text import make_minhash_udf

    docs = _documents(sf_dir)
    doc_ids = docs["doc_id"].to_numpy()
    sig = np.array(
        make_minhash_udf(num_perm=num_perm, shingle_k=shingle_k)
        .func(docs["text"])
        .tolist(),
        dtype=np.int64,
    )
    rpb = num_perm // bands
    cand: set[tuple[int, int]] = set()
    for b in range(bands):
        groups: dict[tuple, list[int]] = defaultdict(list)
        sl = sig[:, b * rpb : (b + 1) * rpb]
        for row_i, srow in enumerate(sl):
            groups[tuple(srow.tolist())].append(row_i)
        for members in groups.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    a, bb = int(doc_ids[members[x]]), int(doc_ids[members[y]])
                    cand.add((min(a, bb), max(a, bb)))
    idx = {int(d): i for i, d in enumerate(doc_ids)}
    keep = [
        (a, b)
        for (a, b) in sorted(cand)
        if (sig[idx[a]] == sig[idx[b]]).sum() / num_perm >= threshold
    ]
    out = pd.DataFrame(keep, columns=["id_a", "id_b"]).astype("int64")
    return _write(out, "minhash_pairs", sf_dir, docs)


def write_simhash_values(sf_dir: str) -> str:
    """simhash per doc → parquet(doc_id, sh); the recall oracle derives
    BOTH the exact (all-pairs hamming) and approximate (chunk-blocked)
    pair sets from these values in SQL."""
    from web_crawler_spark.functions.text import simhash_udf

    docs = _documents(sf_dir)
    out = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].astype("int64"),
            "sh": simhash_udf.func(docs["text"]).astype("int64"),
        }
    )
    return _write(out, "simhash_values", sf_dir, docs)


def write_embedding_lsh_pairs(
    sf_dir: str,
    dim: int,
    threshold: float,
    num_bits: int,
    bands: int = 4,
    multiprobe: bool = False,
    probe_bits: int | None = None,
) -> str:
    """embedding_cosine_pairs_lsh mirror → parquet(id_a, id_b)."""
    from web_crawler_spark.operators.similarity import make_hyperplane_udf

    emb = _embeddings(sf_dir)
    ids = emb["vec_id"].to_numpy()
    vecs = {int(i): np.asarray(v, dtype=np.float64) for i, v in
            zip(ids, emb["embedding"])}
    band_vals = np.array(
        make_hyperplane_udf(dim, num_bits, bands=bands)
        .func(emb["embedding"])
        .tolist(),
        dtype=np.int64,
    )
    cand: set[tuple[int, int]] = set()
    if multiprobe:
        probe_vals = np.array(
            make_hyperplane_udf(
                dim, num_bits, bands=bands, flip=True, probe_bits=probe_bits
            )
            .func(emb["embedding"])
            .tolist(),
            dtype=np.int64,
        )
        base: dict[int, set[int]] = defaultdict(set)
        for i, row in zip(ids, band_vals):
            for b in row:
                base[int(b)].add(int(i))
        probe: dict[int, set[int]] = defaultdict(set)
        for i, row in zip(ids, probe_vals):
            for b in set(row.tolist()):
                probe[int(b)].add(int(i))
        for b, members in base.items():
            for i in members:
                for j in probe.get(b, ()):
                    if i != j:
                        cand.add((min(i, j), max(i, j)))
    else:
        buckets: dict[int, list[int]] = defaultdict(list)
        for i, row in zip(ids, band_vals):
            for b in row:
                buckets[int(b)].append(int(i))
        for members in buckets.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    a, b = members[x], members[y]
                    cand.add((min(a, b), max(a, b)))
    if not cand:
        out = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                            "id_b": pd.Series([], dtype="int64")})
        return _write(out, "embedding_lsh_pairs", sf_dir, emb)
    pairs = sorted(cand)
    cos = _cosine(
        [vecs[a] for a, _ in pairs], [vecs[b] for _, b in pairs]
    )
    keep = [(a, b) for (a, b), c in zip(pairs, cos) if c >= threshold]
    out = pd.DataFrame(keep, columns=["id_a", "id_b"]).astype("int64")
    return _write(out, "embedding_lsh_pairs", sf_dir, emb)
