"""Deterministic hash-based sampling and dataset splits.

A 100 TB training-data pipeline needs REPRODUCIBLE sampling: the same
document must land in the same split on every run, on any cluster, at
any parallelism — which rules out `rand()` (seed × partitioning
dependent) and favors content-keyed hashing. Everything here is a pure
projection + filter: no shuffle, no state, fully pushdown-friendly
(the filter sits directly on the scan), trivially parallel at any
scale.

The hash is md5 over `key|salt` (first 15 hex chars → 60-bit int →
pmod buckets). md5 rather than xxhash64 so an independent engine can
verify the assignment bit-for-bit (DuckDB mirrors it as
`('0x' || substring(md5(..), 1, 15))::BIGINT % buckets` — the driver
oracle for `dataset_split` does exactly that); the ~2× hash cost vs
xxhash64 is irrelevant next to the scan.

No reference counterpart (the reference crawler has no sampling tier);
built per the task brief's training-data-pipeline mandate alongside
the dedup/similarity/text tiers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket_col(key: Column, salt: str = "", buckets: int = _BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from md5(key|salt).

    15 hex chars = 60 bits, exact in int64; uniform for any real
    bucket count. Engine-portable (md5 is md5 everywhere)."""
    h = F.md5(F.concat(key.cast("string"), F.lit("|" + salt)))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"), F.lit(buckets)
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Keep ~rate of rows, keyed by content hash — same rows survive on
    every run and every cluster. Different salts give independent
    samples (for bootstrap/replicas)."""
    return df.filter(
        hash_bucket_col(F.col(key_col), salt) < int(rate * _BUCKETS)
    )


def split_col(
    key: Column,
    weights: dict[str, float],
    salt: str = "split",
) -> Column:
    """Split-label column from cumulative weight thresholds over the
    hash bucket. Weights need not sum to 1 (the remainder gets the
    last label); iteration order of ``weights`` defines the bands."""
    b = hash_bucket_col(key, salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = b < int(acc * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a reproducible split label (default
    90/5/5 train/val/test). Pure projection: at 10^10 rows this is
    scan-speed work with no exchange."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    return df.withColumn(out_col, split_col(F.col(key_col), weights, salt))
