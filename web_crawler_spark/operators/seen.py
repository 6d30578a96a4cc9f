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
bloom would be ~12 GB: the scale-out path is `ShardedBloom` — the
filter is split into `num_shards` independent blooms keyed by
host_bucket (12 GB → ~190 MB/shard at 64 shards). Because the frontier
and seen tables are already hash-partitioned by host_bucket, every
executor task only ever consults ONE shard. `ShardedBloom.save()` +
`ShardStore` implement that cluster path: shard bitmaps live as one
.npy per shard on the shared FS, the membership UDF's closure carries
only the directory path, and each task lazily mmap-loads exactly the
shards its rows reference (tests assert the per-task touch list).
`ShardedBloom.maybe_seen_udf` remains the closure-broadcast local-mode
variant.
"""

from __future__ import annotations

import json
import math
import os
import shutil

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


class ShardedBloom:
    """`num_shards` independent blooms, shard = shard_col % num_shards.

    The 10^10-key path: a single bloom at that scale is a ~12 GB
    broadcast; 64 shards cut it to ~190 MB each, and a frontier that is
    already partitioned by host_bucket means each task tests exactly
    one shard. Build mirrors ``BroadcastBloom.add_keys``: per-partition
    per-shard bitmaps built executor-side, only (shard, bitmap) rows
    cross the wire, OR-merged per shard on the driver.

    FP-safe identically to the flat bloom: positives go to the exact
    anti-join, negatives are guaranteed-new.
    """

    def __init__(self, num_shards: int, num_bits: int, num_hashes: int):
        self.num_shards = int(num_shards)
        self.shards = [
            BroadcastBloom(num_bits, num_hashes) for _ in range(self.num_shards)
        ]

    @classmethod
    def empty(
        cls, expected_items: int, fpp: float = 0.01, num_shards: int = 8
    ) -> "ShardedBloom":
        per_shard = max(1, (int(expected_items) + num_shards - 1) // num_shards)
        m, k = BroadcastBloom.size_for(per_shard, fpp)
        return cls(num_shards, m, k)

    @property
    def approx_items(self) -> int:
        return sum(s.approx_items for s in self.shards)

    def _shard_col(self, shard_col: str):
        return F.pmod(F.col(shard_col).cast("long"), F.lit(self.num_shards)).cast(
            "int"
        ).alias("_bshard")

    def add_keys(self, df: DataFrame, col: str, shard_col: str) -> None:
        """OR per-(partition, shard) bitmaps into the shard filters.

        When ``df`` is partitioned by ``shard_col`` each task builds
        exactly one local bitmap; otherwise up to num_shards small ones.
        """
        num_shards = self.num_shards
        num_bits = self.shards[0].num_bits
        num_hashes = self.shards[0].num_hashes
        hashed = df.select(self._shard_col(shard_col), *BroadcastBloom.hash_cols(col))

        def build(it):
            local: dict[int, BroadcastBloom] = {}
            for pdf in it:
                if not len(pdf):
                    continue
                for s, grp in pdf.groupby("_bshard"):
                    f = local.setdefault(
                        int(s), BroadcastBloom(num_bits, num_hashes)
                    )
                    f.add_hashes(grp["_bh1"].to_numpy(), grp["_bh2"].to_numpy())
            yield pd.DataFrame(
                {
                    "shard": list(local),
                    "words": [f.words.tobytes() for f in local.values()],
                    "n": [f.approx_items for f in local.values()],
                }
            )

        for row in hashed.mapInPandas(build, "shard int, words binary, n long").collect():
            tgt = self.shards[row["shard"]]
            tgt.words |= np.frombuffer(row["words"], dtype=np.uint64)
            tgt.approx_items += row["n"]

    def save(self, store_dir: str) -> "ShardStore":
        """Write every shard bitmap to ``store_dir`` (one .npy per
        shard + meta.json) and return the ShardStore view — the
        cluster membership path where a task reads ONLY its own
        shard's bytes instead of receiving the whole filter. On a real
        cluster ``store_dir`` is the shared FS (HDFS/S3/NFS); the
        write is one pass over num_shards files."""
        os.makedirs(store_dir, exist_ok=True)
        for s, f in enumerate(self.shards):
            np.save(os.path.join(store_dir, f"shard_{s}.npy"), f.words)
        meta = {
            "num_shards": self.num_shards,
            "num_bits": self.shards[0].num_bits,
            "num_hashes": self.shards[0].num_hashes,
            "approx_items": self.approx_items,
        }
        with open(os.path.join(store_dir, "meta.json"), "w") as fh:
            json.dump(meta, fh)
        return ShardStore(store_dir)

    def maybe_seen_udf(self):
        """Vectorized membership over (shard, h1, h2) columns.

        LOCAL-MODE path: captures every shard in the closure, so each
        Python worker holds the full filter — fine in one JVM, wrong
        at 10^10 keys (12 GB per executor). The cluster path is
        ``save()`` + ``ShardStore.maybe_seen_udf()``: the closure
        carries only a directory path and each task mmap-loads the one
        shard its partition references."""
        num_bits = self.shards[0].num_bits
        num_hashes = self.shards[0].num_hashes
        words = [s.words for s in self.shards]

        @F.pandas_udf(BooleanType())
        def maybe_seen(
            shard: pd.Series, h1: pd.Series, h2: pd.Series
        ) -> pd.Series:
            if not len(shard):
                return pd.Series([], dtype=bool)
            out = np.zeros(len(shard), dtype=bool)
            sv = shard.to_numpy()
            h1v, h2v = h1.to_numpy(), h2.to_numpy()
            # a host_bucket-partitioned frontier yields ONE group here
            for s in np.unique(sv):
                f = BroadcastBloom(num_bits, num_hashes)
                f.words = words[int(s)]
                idx = sv == s
                out[idx] = f.contains_hashes(h1v[idx], h2v[idx])
            return pd.Series(out)

        return maybe_seen


# process-level shard cache: Python workers are reused across tasks
# (spark.python.worker.reuse), so a shard file is mmapped once per
# worker process and the OS page cache shares the bytes machine-wide.
# Keyed by absolute file path — a new store epoch (new directory) is a
# new key, so stale bitmaps can never serve a newer probe.
_SHARD_CACHE: dict[str, np.ndarray] = {}
# long crawls publish one store epoch per round; without eviction a
# reused worker pins every old epoch's mmap (unlinked inodes keep
# their disk space + fds alive for the worker's lifetime). On a cache
# miss past this bound, entries whose backing file is gone (their
# epoch dir was destroy()ed) are dropped — in-flight numpy reads stay
# safe via refcount, and live epochs are never evicted.
_SHARD_CACHE_SWEEP_AT = 64


def _load_shard_words(path: str) -> np.ndarray:
    w = _SHARD_CACHE.get(path)
    if w is None:
        if len(_SHARD_CACHE) >= _SHARD_CACHE_SWEEP_AT:
            for stale in [p for p in _SHARD_CACHE if not os.path.exists(p)]:
                del _SHARD_CACHE[stale]
        # mmap: only the bitmap pages a probe touches are faulted in;
        # a 190 MB shard never fully loads for a few-thousand-row task
        w = np.load(path, mmap_mode="r")
        _SHARD_CACHE[path] = w
    return w


class ShardStore:
    """Shard-per-file bloom membership — the 10^10-key cluster path.

    ``ShardedBloom.maybe_seen_udf`` captures all shards in the UDF
    closure: every executor receives the FULL filter (12 GB at 10^10
    keys / 1% fpp). This store instead publishes one .npy per shard on
    the shared FS; the membership UDF's closure carries only the
    directory path, and each task lazily mmap-loads exactly the shards
    its rows reference — ONE shard (~190 MB at 64 shards) when the
    frame is partitioned by the shard key, which the engine's
    host_bucket-partitioned frontier already guarantees.

    FP-safe identically to the in-memory forms: positives go to the
    exact anti-join, negatives are guaranteed-new.
    """

    def __init__(self, store_dir: str):
        with open(os.path.join(store_dir, "meta.json")) as fh:
            meta = json.load(fh)
        self.store_dir = store_dir
        self.num_shards = int(meta["num_shards"])
        self.num_bits = int(meta["num_bits"])
        self.num_hashes = int(meta["num_hashes"])
        self.approx_items = int(meta["approx_items"])

    def _shard_col(self, shard_col: str):
        return (
            F.pmod(F.col(shard_col).cast("long"), F.lit(self.num_shards))
            .cast("int")
            .alias("_bshard")
        )

    @staticmethod
    def probe_shards(
        store_dir: str,
        num_bits: int,
        num_hashes: int,
        sv: np.ndarray,
        h1: np.ndarray,
        h2: np.ndarray,
    ) -> tuple[np.ndarray, list[int]]:
        """Membership for (shard, h1, h2) arrays reading only the
        referenced shard files. Returns (bool array, shards loaded) —
        the second element is the per-task touch list the scale claim
        rests on (and the thing tests assert)."""
        out = np.zeros(len(sv), dtype=bool)
        touched: list[int] = []
        for s in np.unique(sv):
            path = os.path.join(store_dir, f"shard_{int(s)}.npy")
            f = BroadcastBloom(num_bits, num_hashes)
            f.words = _load_shard_words(path)
            touched.append(int(s))
            idx = sv == s
            out[idx] = f.contains_hashes(h1[idx], h2[idx])
        return out, touched

    def maybe_seen_udf(self):
        """Vectorized membership over (shard, h1, h2) columns; closure
        ships only (path, sizes) — never bitmap bytes."""
        store_dir = self.store_dir
        num_bits, num_hashes = self.num_bits, self.num_hashes

        @F.pandas_udf(BooleanType())
        def maybe_seen(
            shard: pd.Series, h1: pd.Series, h2: pd.Series
        ) -> pd.Series:
            if not len(shard):
                return pd.Series([], dtype=bool)
            out, _ = ShardStore.probe_shards(
                store_dir,
                num_bits,
                num_hashes,
                shard.to_numpy(),
                h1.to_numpy(),
                h2.to_numpy(),
            )
            return pd.Series(out)

        return maybe_seen

    def destroy(self) -> None:
        shutil.rmtree(self.store_dir, ignore_errors=True)


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    key_cols: list[str],
    bloom: "BroadcastBloom | ShardedBloom | ShardStore | None" = None,
    bloom_col: str = "url_key",
    shard_col: str = "host_bucket",
) -> DataFrame:
    """Rows of ``candidates`` whose key is NOT in ``seen``.

    With a bloom filter, only the maybe-seen slice pays the shuffle; the
    definitely-new slice bypasses the join (false positives are caught
    by the exact join; false negatives are impossible)."""
    if bloom is None or bloom.approx_items == 0:
        return candidates.join(seen, key_cols, "left_anti")
    # persist: both branches below reference this plan — without the
    # barrier the ENTIRE upstream candidate pipeline executes twice
    with_h = candidates.select("*", *BroadcastBloom.hash_cols(bloom_col))
    if isinstance(bloom, (ShardedBloom, ShardStore)):
        with_h = with_h.withColumn(
            "_maybe",
            bloom.maybe_seen_udf()(
                bloom._shard_col(shard_col), F.col("_bh1"), F.col("_bh2")
            ),
        ).persist()
    else:
        with_h = with_h.withColumn(
            "_maybe", bloom.maybe_seen_udf()(F.col("_bh1"), F.col("_bh2"))
        ).persist()
    definite_new = with_h.filter(~F.col("_maybe"))
    suspects = with_h.filter(F.col("_maybe")).join(seen, key_cols, "left_anti")
    return definite_new.unionByName(suspects).drop("_bh1", "_bh2", "_maybe")
