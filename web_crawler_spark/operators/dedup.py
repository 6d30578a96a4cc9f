"""Deduplication operators for training-data pipelines.

Tiers, each a standalone DataFrame plan over `documents(doc_id, text)`
(task brief: first-class components alongside SURVEY.md §2):

- exact:    sha256(text) hash-groupBy. One shuffle on the 32-byte hash,
            never on the text. Scale: partial agg map-side; hash is
            uniform → no skew.
- minhash:  shingle → minhash signature (Arrow UDF) → LSH banding →
            bucket self-join → signature-similarity verify. The join
            key is (band_id, band_hash) so candidate generation never
            compares cross-bucket pairs — the classic sublinear path.
- simhash:  64-bit simhash; near-dup = equal 16-bit chunk (4-band
            blocking) + hamming ≤ threshold verify, all native bitwise.
- ngram:    exact n-gram Jaccard on token sets, two exact plans —
            prefix-filtered AllPairs join (asymptotic path) and
            blocked-tile numpy intersection counting (mid-scale path);
            plus the naive join kept as the equivalence oracle.
- clusters: near-dup pairs → connected components (iterative min-label
            propagation) → cluster_id per doc.

(The embedding-cosine tier lives in operators/similarity.py:
`embedding_cosine_pairs` exact blocked matmul + `_lsh` variant.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from web_crawler_spark.functions.text import make_minhash_udf, simhash_udf
from web_crawler_spark.operators.barrier import barrier, release_on_gc


def cap_buckets(
    stacked: DataFrame, key_cols: list[str], max_bucket: int | None
) -> DataFrame:
    """Hot-bucket guard for the LSH blocking self-joins.

    A blocking bucket of size m generates m·(m−1)/2 candidate pairs: one
    boilerplate cluster (a mass-duplicated page, an empty-doc family, a
    template) collapses every band to a single hash and turns the
    "sublinear" candidate join quadratic — at 10^10 docs a 10^6-row
    bucket alone is 5·10^11 pairs. AQE skew-split rebalances the
    partitions but cannot reduce the pair COUNT; the algorithmic guard
    is to drop buckets larger than ``max_bucket`` before the self-join
    (standard practice in large-scale near-dup pipelines). Recall cost
    is bounded: a true near-dup pair that loses one oversized band
    usually still collides in its other, smaller bands; and genuinely
    identical documents should be collapsed by exact dedup
    (`exact_dedup_keep`) BEFORE any LSH tier — this cap then guards the
    residual near-identical mass. The bucket-size window shuffles on
    the same keys as the join itself, so it adds no new exchange shape.
    None (the default) preserves exact pre-cap behavior."""
    if max_bucket is None:
        return stacked
    w = Window.partitionBy(*key_cols)
    return (
        stacked.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """One row per distinct content hash: copy count + keeper id (min id).
    Output: content_hash, n_copies, keeper_id."""
    return (
        docs.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def exact_dedup_keep(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """The deduplicated table: keeps exactly the keeper row per hash."""
    groups = exact_dedup_groups(docs, id_col, text_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return docs.join(groups, id_col, "left_semi")


# ---------------------------------------------------------------------------
# minhash + LSH near-dup
# ---------------------------------------------------------------------------


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    signature (Arrow UDF) → band rows (posexplode of band hashes) →
    self-join inside (band, band_hash) buckets → dedupe pairs →
    verify via signature agreement fraction. Output: id_a, id_b,
    est_jaccard (id_a < id_b). ``max_bucket`` drops oversized band
    buckets before the self-join (see `cap_buckets`) — the 10^10-doc
    guard against boilerplate clusters turning the join quadratic.

    Size (num_perm, bands) for the corpus with `operators.lsh_plan
    .plan_minhash(n, j_dup, …)`: rows-per-band must grow with log n
    for the banding join to stay sublinear (tests/test_lsh_plan.py,
    BENCH.md §3b).
    """
    rows_per_band = num_perm // bands
    sig_udf = make_minhash_udf(num_perm=num_perm, shingle_k=shingle_k)
    # run-once materialization for the 3-consumer plan below (banding +
    # two verify joins). gc_persist semantics: columnar persist() for
    # the fast re-read, unpersisted when the returned frame is GC'd —
    # see operators/barrier.py for the measured persist-vs-checkpoint
    # tradeoff (r5 A/B: checkpoint cost +27 % here).
    sigs = barrier(
        docs.select(
            F.col(id_col).alias("_id"), sig_udf(F.col(text_col)).alias("sig")
        )
    )
    barriers = [sigs]

    band_exprs = [
        F.xxhash64(F.slice("sig", i * rows_per_band + 1, rows_per_band)).alias(
            f"b{i}"
        )
        for i in range(bands)
    ]
    banded = sigs.select("_id", *band_exprs)
    stacked = banded.select(
        "_id",
        F.posexplode(F.array(*[F.col(f"b{i}") for i in range(bands)])).alias(
            "band_id", "band_hash"
        ),
    )
    stacked = cap_buckets(stacked, ["band_id", "band_hash"], max_bucket)
    if max_bucket is not None:
        # both join sides reference the capped plan — barrier the
        # bucket-count window so it runs once, not per side
        stacked = barrier(stacked)
        barriers.append(stacked)
    left = stacked.alias("l")
    right = stacked.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(sigs.select(F.col("_id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sigs.select(F.col("_id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.size("sig_a"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard"))
    )
    return release_on_gc(verified, *barriers)


# ---------------------------------------------------------------------------
# simhash near-dup
# ---------------------------------------------------------------------------


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by simhash: block on any equal 16-bit chunk
    (guarantees recall for hamming ≤ 3 over 4 chunks), verify hamming
    distance natively (bit_count of xor). ``max_bucket`` drops
    oversized chunk buckets before the self-join (see `cap_buckets`)."""
    hashed = barrier(  # run-once, released with the result (barrier.py)
        docs.select(
            F.col(id_col).alias("_id"), simhash_udf(F.col(text_col)).alias("sh")
        )
    )
    barriers = [hashed]
    chunks = hashed.select(
        "_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    chunks = cap_buckets(chunks, ["chunk_id", "chunk"], max_bucket)
    if max_bucket is not None:
        chunks = barrier(chunks)
        barriers.append(chunks)
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .distinct()
    )
    return release_on_gc(
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming"),
        *barriers,
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact; SQL-expressible verification tier)
# ---------------------------------------------------------------------------


def _gram_arrays(
    docs: DataFrame, id_col: str, text_col: str, n: int, char: bool = False
) -> DataFrame:
    """Distinct gram sets per doc. ``char=False``: word n-grams over
    whitespace tokens (the ngram-Jaccard tier). ``char=True``: byte/char
    k-shingles of the lowercased text — the SAME shingle universe the
    minhash signature kernel hashes (functions/text._shingle_hashes:
    lowercase, sliding k-window, whole-string window when shorter than
    k, the empty string for empty docs), so exact Jaccard over these
    sets is the matched ground truth for the minhash recall gate."""
    if char:
        t = F.lower(F.col(text_col))
        grams = (
            F.when(F.length(t) == 0, F.array(F.lit("")))
            .when(F.length(t) <= n, F.array(t))
            .otherwise(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.length(t) - (n - 1)),
                        lambda i: t.substr(i, F.lit(n)),
                    )
                )
            )
        )
        return docs.select(F.col(id_col).alias("_id"), grams.alias("grams"))
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("w"),
    )
    return toks.select(
        "_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("w") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("w", i + 1, n)),
            )
        ).alias("grams"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over word n-gram sets via prefix filtering
    (AllPairs-style set-similarity join, Bayardo et al. WWW'07).

    J(A,B) ≥ t ⟹ |A∩B| ≥ ⌈t·|A|⌉, so with grams globally ordered
    rarest-first, any qualifying pair must share a gram inside each
    doc's first |A| − ⌈t·|A|⌉ + 1 grams. Only those prefixes are
    exploded into the candidate equi-join — the hot (high-frequency)
    grams that blow up a naive explode-join land in the suffixes and
    never become join keys. Candidates are then verified exactly with
    native array_intersect. Identical output to the naive plan; at
    sf0.1 it is an order of magnitude faster, and at 100 TB it is the
    difference between a feasible join and a quadratic explosion.
    """
    from pyspark.sql.window import Window

    # gram sets are carried as xxhash64 longs from here on: the candidate
    # join keys and the verify-stage array_intersect work on 8-byte ints
    # instead of strings (≈3× cheaper at the 10^6-candidate scale; a
    # 64-bit collision would need two distinct grams hashing equal —
    # P ≈ n²/2^65, ~1e-9 at 10^6 distinct grams — and the pytest
    # naive-equivalence + DuckDB oracle gates would surface it).
    grams = barrier(  # run-once, released with the result (barrier.py)
        _gram_arrays(docs, id_col, text_col, n).select(
            "_id", F.transform("grams", lambda g: F.xxhash64(g)).alias("grams")
        )
    )
    sizes = grams.select("_id", F.size("grams").alias("n_grams"))
    e = grams.select("_id", F.explode("grams").alias("g"))
    gfreq = e.groupBy("g").agg(F.count("*").alias("gdf"))
    w = Window.partitionBy("_id").orderBy("gdf", "g")
    prefix = (
        e.join(gfreq, "g")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "_id")
        .filter(
            F.col("rn")
            <= F.col("n_grams") - F.ceil(F.lit(threshold) * F.col("n_grams")) + 1
        )
        .select("_id", "g")
    )
    l, r = prefix.alias("l"), prefix.alias("r")
    cand = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l._id") < F.col("r._id")))
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(
            grams.select(F.col("_id").alias("id_a"), F.col("grams").alias("ga")),
            "id_a",
        )
        .join(
            grams.select(F.col("_id").alias("id_b"), F.col("grams").alias("gb")),
            "id_b",
        )
        .withColumn("n_inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("ga") + F.size("gb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return release_on_gc(verified, grams)


def _expand_ranges(starts, lengths):
    """[s0..s0+l0) ++ [s1..s1+l1) ++ … as one flat index vector —
    the vectorized run-expansion primitive of the blocked tile plan
    (no Python loop; cumsum over per-run step deltas)."""
    import numpy as np

    lengths = np.asarray(lengths, dtype=np.int64)
    keep = lengths > 0
    starts, lengths = np.asarray(starts, dtype=np.int64)[keep], lengths[keep]
    if len(starts) == 0:
        return np.array([], dtype=np.int64)
    ends = np.cumsum(lengths)
    step = np.ones(ends[-1], dtype=np.int64)
    step[0] = starts[0]
    step[ends[:-1]] = starts[1:] - (starts[:-1] + lengths[:-1]) + 1
    return np.cumsum(step)


def ngram_jaccard_join(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """Two-sided exact n-gram Jaccard join — the INCREMENTAL dedup
    shape: a small new batch probed against a large indexed corpus.
    Candidates come from a shared-gram equi-join with the BATCH side
    broadcast (a crawl batch is small relative to the corpus at any
    scale), so the corpus side is touched map-side only where grams
    collide, and no corpus self-join ever forms; verification is one
    more broadcast of the candidate set back onto the corpus grams.
    Gram sets ride as xxhash64 longs like `ngram_jaccard_pairs`
    (collision odds ~n²/2^65; the DuckDB oracle would surface one).
    Output: (id_new, id_index, jaccard ≥ threshold)."""
    bg = barrier(
        _gram_arrays(batch, id_col, text_col, n).select(
            "_id", F.transform("grams", lambda g: F.xxhash64(g)).alias("grams")
        )
    )
    ig = barrier(
        _gram_arrays(index, id_col, text_col, n).select(
            "_id", F.transform("grams", lambda g: F.xxhash64(g)).alias("grams")
        )
    )
    be = bg.select(F.col("_id").alias("id_new"), F.explode("grams").alias("g"))
    ie = ig.select(F.col("_id").alias("id_index"), F.explode("grams").alias("g"))
    cand = (
        ie.join(F.broadcast(be), "g").select("id_new", "id_index").distinct()
    )
    with_b = cand.join(
        bg.select(F.col("_id").alias("id_new"), F.col("grams").alias("gb")),
        "id_new",
    )
    verified = (
        ig.select(F.col("_id").alias("id_index"), F.col("grams").alias("gi"))
        .join(F.broadcast(with_b), "id_index")
        .withColumn("_ni", F.size(F.array_intersect("gb", "gi")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("_ni")
                / (F.size("gb") + F.size("gi") - F.col("_ni")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_new", "id_index", "jaccard")
    )
    return release_on_gc(verified, bg, ig)


def ngram_jaccard_pairs_blocked(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_blocks: int = 8,
    char: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via blocked tile intersection counting
    — the mid-scale exact plan (≲10^5-10^6 docs per comparable corpus).

    The AllPairs prefix join (ngram_jaccard_pairs) is the asymptotic
    scale path, but on corpora with a small shared vocabulary the
    prefix filter passes nearly every pair and the per-candidate
    array_intersect dominates (9.6M candidates → 260 survivors at
    sf0.1). This operator instead tiles the doc×doc intersection-count
    matrix exactly like operators/similarity.embedding_cosine_pairs:
    each doc's hashed gram set is replicated into its num_blocks tiles,
    and one applyInPandas task per tile computes ALL pairwise
    intersection counts with a vectorized numpy group-cartesian +
    bincount (cost = Σ_g cnt_a(g)·cnt_b(g) per tile — the same row
    count the naive exploded join shuffles, but with zero shuffle and
    zero per-pair JVM hash sets). Identical output to the prefix-join
    and naive plans (exact counts, same rounding); ~6× faster at sf0.1.
    Beyond ~10^6 docs the m_a·m_b tile bins outgrow memory — switch
    back to ngram_jaccard_pairs.

    Non-integral id columns (e.g. the crawl documents schema's string
    doc_id) ride through an xxhash64 surrogate and are mapped back to
    the original ids at the end (pair order re-established with
    least/greatest), so the output matches the sibling plans' id type.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    nb = num_blocks
    integral_id = dict(docs.dtypes)[id_col] in (
        "tinyint", "smallint", "int", "bigint",
    )
    ga = _gram_arrays(docs, id_col, text_col, n, char=char)
    if integral_id:
        id_expr = F.col("_id").cast("long")
    else:
        # deterministic 64-bit surrogate; collision P ≈ n²/2^65 — the
        # same budget the hashed-gram trick above already accepts
        id_expr = F.xxhash64(F.col("_id").cast("string"))
    grams = ga.select(
        id_expr.alias("_id"),
        F.transform("grams", lambda g: F.xxhash64(g)).alias("grams"),
        F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(nb))
        .cast("int")
        .alias("_blk"),
    )
    tiles = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(nb - 1)),
            lambda j: F.struct(
                F.least(F.col("_blk"), j).cast("int").alias("ba"),
                F.greatest(F.col("_blk"), j).cast("int").alias("bb"),
                F.when(F.col("_blk") <= j, F.lit(0))
                .otherwise(F.lit(1))
                .cast("int")
                .alias("side"),
            ),
        ),
        lambda s: ~((s["ba"] == s["bb"]) & (s["side"] == 1)),
    )
    replicated = grams.select(
        "_id", "grams", F.explode(tiles).alias("_t")
    ).select(
        "_id", "grams",
        F.col("_t.ba").alias("ba"),
        F.col("_t.bb").alias("bb"),
        F.col("_t.side").alias("side"),
    )

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("jaccard", DoubleType()),
        ]
    )
    thr = float(threshold)

    def _side_arrays(pdf):
        ids = pdf["_id"].to_numpy()
        glists = pdf["grams"].to_list()
        sizes = np.array([len(g) for g in glists], dtype=np.int64)
        h = (
            np.concatenate([np.asarray(g, dtype=np.int64) for g in glists])
            if len(glists)
            else np.array([], dtype=np.int64)
        )
        rows = np.repeat(np.arange(len(ids), dtype=np.int64), sizes)
        order = np.argsort(h, kind="stable")
        h_s, rows_s = h[order], rows[order]
        uniq, start, cnt = np.unique(h_s, return_index=True, return_counts=True)
        return ids, sizes, rows_s, uniq, start, cnt

    def _intersection_counts(a, b, m_a, m_b):
        """C[m_a, m_b] of exact gram-set intersection sizes."""
        _, _, rows_a, ua, sa, ca = a
        _, _, rows_b, ub, sb, cb = b
        common, ia, ib = np.intersect1d(
            ua, ub, assume_unique=True, return_indices=True
        )
        if len(common) == 0:
            return np.zeros((m_a, m_b), dtype=np.int64)
        na_k, nb_k = ca[ia], cb[ib]
        a_concat = rows_a[_expand_ranges(sa[ia], na_k)]
        b_concat = rows_b[_expand_ranges(sb[ib], nb_k)]
        a_rep = np.repeat(a_concat, np.repeat(nb_k, na_k))
        b_group_starts = np.concatenate(([0], np.cumsum(nb_k)[:-1]))
        b_rep = b_concat[
            _expand_ranges(
                np.repeat(b_group_starts, na_k), np.repeat(nb_k, na_k)
            )
        ]
        lin = a_rep * m_b + b_rep
        return np.bincount(lin, minlength=m_a * m_b).reshape(m_a, m_b)

    def tile_pairs(key, pdf):
        ba, bb = int(key[0]), int(key[1])
        a_pdf = pdf[pdf["side"] == 0]
        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "jaccard": np.array([], dtype=np.float64),
            }
        )
        if len(a_pdf) == 0:
            return empty
        a = _side_arrays(a_pdf)
        if ba == bb:
            b, b_ids, b_sizes = a, a[0], a[1]
        else:
            b_pdf = pdf[pdf["side"] == 1]
            if len(b_pdf) == 0:
                return empty
            b = _side_arrays(b_pdf)
            b_ids, b_sizes = b[0], b[1]
        a_ids, a_sizes = a[0], a[1]
        C = _intersection_counts(a, b, len(a_ids), len(b_ids))
        union = a_sizes[:, None] + b_sizes[None, :] - C
        with np.errstate(divide="ignore", invalid="ignore"):
            J = np.where(union > 0, C / union, 0.0)
        if ba == bb:
            ii, jj = np.triu_indices(len(a_ids), k=1)
            keep = J[ii, jj] >= thr
            ii, jj = ii[keep], jj[keep]
        else:
            ii, jj = np.where(J >= thr)
        ia, ib, jv = a_ids[ii], b_ids[jj], J[ii, jj]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        # HALF_UP to 4 decimals over the SHORTEST-DECIMAL repr, exactly
        # like Spark F.round / DuckDB round (BigDecimal.valueOf
        # semantics). floor(jv*1e4+0.5) on the raw double rounds DOWN a
        # value whose double sits just below a 4th-decimal tie but
        # prints as x.xxxx5; np.round would use banker's rounding.
        # Survivors are few (post-threshold), so the scalar loop is off
        # the hot path.
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.0001")
        jr = np.array(
            [
                float(Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP))
                for v in jv
            ],
            dtype=np.float64,
        )
        return pd.DataFrame({"id_a": lo, "id_b": hi, "jaccard": jr})

    pairs = replicated.groupBy("ba", "bb").applyInPandas(tile_pairs, out_schema)
    if integral_id:
        return pairs
    # map surrogates back to the original ids; least/greatest restores
    # the id_a < id_b contract under the original type's ordering
    m = ga.select(F.col("_id").alias("_orig"), id_expr.alias("_sid")).distinct()
    return (
        pairs.join(
            m.select(F.col("_sid").alias("id_a"), F.col("_orig").alias("_oa")),
            "id_a",
        )
        .join(
            m.select(F.col("_sid").alias("id_b"), F.col("_orig").alias("_ob")),
            "id_b",
        )
        .select(
            F.least("_oa", "_ob").alias("id_a"),
            F.greatest("_oa", "_ob").alias("id_b"),
            "jaccard",
        )
    )


def ngram_jaccard_pairs_naive(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Reference implementation (explode → pair counts). Kept as the
    equivalence oracle for the prefix-filtered plan; do not use at
    scale — every shared gram becomes a join key, hot grams included."""
    grams = barrier(_gram_arrays(docs, id_col, text_col, n))
    sizes = grams.select("_id", F.size("grams").alias("n_grams"))
    exploded = grams.select("_id", F.explode("grams").alias("g"))
    l, r = exploded.alias("l"), exploded.alias("r")
    inter = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("n_grams").alias("na")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("n_grams").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# near-dup cluster assignment: distributed connected components
# ---------------------------------------------------------------------------


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "node",
    iters: int = 5,
    scale: int = 1_000_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-point integer PageRank over an explicit edge list — used
    as canonical-document selection on the near-dup similarity graph
    (rank centrality picks the cluster representative) and identical
    in shape to link-graph crawl prioritization.

    All arithmetic is bigint floor division on a rank scaled by
    ``scale`` (contribution = (rank · damping) div 100 div degree),
    so the result is bit-deterministic under any partitioning and an
    independent SQL engine reproduces it exactly — no float summation
    order to disagree on. Per iteration: one join + one groupBy-sum,
    both shuffling on node id (uniform keys); lineage truncated via
    localCheckpoint like `dedup_clusters`. Dangling mass is dropped
    (documented simplification, mirrored by the oracle)."""
    base = scale * (100 - damping_pct) // 100
    e = edges.select("src", "dst").persist()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    n = nodes.select(F.col(id_col).alias("node"))
    ranks = n.withColumn("rank", F.lit(scale).cast("long")).localCheckpoint()
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank * {damping_pct} div 100) div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            n.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("c", F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    return ranks


def dedup_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """Group near-duplicate pairs into clusters: every doc gets
    cluster_id = min doc id reachable through the pair graph (the
    canonical keeper of its duplicate class).

    Distributed connected components by iterative min-label
    propagation: each round every node takes the min of its own label
    and its neighbors' labels (one join + groupBy-min per round,
    converges in O(diameter) rounds — near-dup graphs are
    small-diameter cliques, so 2-4 rounds in practice). The loop stops
    when a round changes no label (single count() on a changed-filter).
    Labels are checkpointed via localCheckpoint each round to truncate
    the iterative lineage. Scale: both sides of the propagation join
    shuffle on node id — uniform keys; no quadratic stage; the edge
    list is the dedup-pair output which is output-sized, not n².
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    labels = ids.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()

    for _ in range(max_iters):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("node", "dst").withColumnRenamed(
                    "label", "dst_label"
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_label").alias("nmin"))
            .withColumnRenamed("src", "node")
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("_changed")).limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    else:
        # never hit the fixed point: a component with diameter >
        # max_iters would silently split clusters, violating the
        # "cluster_id = min reachable id" contract — fail loudly
        edges.unpersist()
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters); raise max_iters"
        )
    edges.unpersist()
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )
