"""URL-seen set at scale: broadcast bloom prefilter + exact anti-join.

North-rule design (BASELINE.json): the seen set lives in a partitioned
table (10^10 rows at target scale — never collectable), but most
candidate URLs each round are *new*, so shuffling every candidate into
an anti-join is wasted exchange. A broadcast bloom filter built over the
seen keys splits candidates JVM/Arrow-side:

  definitely-new  (bloom says no)   → skip the join entirely
  maybe-seen      (bloom says yes)  → exact left_anti join (FP-safe)

The filter is double-hashed (g_i = h1 + i*h2 mod m) from two JVM-native
hashes (xxhash64 + murmur3), so the only Python work is a vectorized
numpy bit-test over Arrow batches. Build is a treeAggregate of
per-partition bitmaps — the driver only ever holds the m-bit array
(e.g. ~12 MB for 10M keys @ 1% fpp). At 10^10 keys a single broadcast
bloom would be ~12 GB: the scale-out path is sharding the filter by
host_bucket (each executor partition only needs the shard matching its
candidates' bucket); the sharding seam is `num_shards`.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


class BroadcastBloom:
    """A numpy-backed bloom filter keyed by (xxhash64, murmur3) pairs."""

    def __init__(self, num_bits: int, num_hashes: int):
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self.words = np.zeros((self.num_bits + 63) // 64, dtype=np.uint64)
        self.approx_items = 0

    # -- sizing --------------------------------------------------------
    @staticmethod
    def size_for(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
        n = max(expected_items, 1)
        m = int(-n * math.log(fpp) / (math.log(2) ** 2))
        k = max(1, round(m / n * math.log(2)))
        return max(m, 64), min(k, 8)

    @classmethod
    def empty(cls, expected_items: int, fpp: float = 0.01) -> "BroadcastBloom":
        m, k = cls.size_for(expected_items, fpp)
        return cls(m, k)

    # -- bit math (vectorized) ------------------------------------------
    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing."""
        h1 = h1.astype(np.uint64)
        h2 = (h2.astype(np.int64).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
        i = np.arange(self.num_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.num_bits)

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        pos = self._positions(h1, h2).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        self.approx_items += len(h1)

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        pos = self._positions(h1, h2)
        word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=1)

    def merge(self, other: "BroadcastBloom") -> None:
        np.bitwise_or(self.words, other.words, out=self.words)
        self.approx_items += other.approx_items

    # -- Spark integration ----------------------------------------------
    @staticmethod
    def hash_cols(col: str) -> list:
        """The two JVM-side hash columns every bloom op consumes."""
        return [
            F.xxhash64(F.col(col)).alias("_bh1"),
            F.hash(F.col(col)).alias("_bh2"),
        ]

    def add_keys(self, df: DataFrame, col: str) -> None:
        """OR per-partition bitmaps built on executors into this filter.

        treeAggregate-style: only bitmap arrays cross the wire, never keys.
        """
        num_bits, num_hashes = self.num_bits, self.num_hashes
        hashed = df.select(*self.hash_cols(col))

        def build(it):
            local = BroadcastBloom(num_bits, num_hashes)
            for pdf in it:
                if len(pdf):
                    local.add_hashes(
                        pdf["_bh1"].to_numpy(), pdf["_bh2"].to_numpy()
                    )
            yield pd.DataFrame({"words": [local.words.tobytes()],
                                "n": [local.approx_items]})

        parts = hashed.mapInPandas(build, "words binary, n long").collect()
        for row in parts:
            self.words |= np.frombuffer(row["words"], dtype=np.uint64)
            self.approx_items += row["n"]

    def maybe_seen_udf(self):
        """Vectorized membership test over the two hash columns."""
        words, num_bits, num_hashes = self.words, self.num_bits, self.num_hashes

        @F.pandas_udf(BooleanType())
        def maybe_seen(h1: pd.Series, h2: pd.Series) -> pd.Series:
            if not len(h1):
                return pd.Series([], dtype=bool)
            f = BroadcastBloom(num_bits, num_hashes)
            f.words = words
            return pd.Series(
                f.contains_hashes(h1.to_numpy(), h2.to_numpy())
            )

        return maybe_seen


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    key_cols: list[str],
    bloom: BroadcastBloom | None = None,
    bloom_col: str = "url_key",
) -> DataFrame:
    """Rows of ``candidates`` whose key is NOT in ``seen``.

    With a bloom filter, only the maybe-seen slice pays the shuffle; the
    definitely-new slice bypasses the join (false positives are caught
    by the exact join; false negatives are impossible)."""
    if bloom is None or bloom.approx_items == 0:
        return candidates.join(seen, key_cols, "left_anti")
    # persist: both branches below reference this plan — without the
    # barrier the ENTIRE upstream candidate pipeline executes twice
    with_h = (
        candidates.select("*", *BroadcastBloom.hash_cols(bloom_col))
        .withColumn("_maybe", bloom.maybe_seen_udf()(F.col("_bh1"), F.col("_bh2")))
        .persist()
    )
    definite_new = with_h.filter(~F.col("_maybe"))
    suspects = with_h.filter(F.col("_maybe")).join(seen, key_cols, "left_anti")
    return definite_new.unionByName(suspects).drop("_bh1", "_bh2", "_maybe")
