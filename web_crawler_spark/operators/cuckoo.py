"""Partition-local cuckoo filters for the URL-seen set (north rule).

Complement to the broadcast bloom (operators/seen.py). The bloom is a
GLOBAL prefilter, cheap to broadcast but append-only and sized for the
whole seen set. The cuckoo filters are PER-HOST-BUCKET: each
host_bucket partition owns one filter, stored as a binary row in a
`filters` table co-partitioned with the frontier. Because fetch
batches are already partitioned by host_bucket, membership testing is
a broadcast of only the *relevant* shard set (or a co-partitioned
join), and filters support deletion (cuckoo property) if a key must be
retracted — blooms cannot.

False positives → routed to the exact anti-join (safe); false
negatives impossible while inserts succeed (failed inserts mark the
filter saturated and its bucket falls back to exact-join-only).

Pure numpy; (de)serialized via tobytes/frombuffer inside
applyInPandas — executors never ship Python objects, only bytes.

Cuckoo filter per Fan et al., "Cuckoo Filter: Practically Better Than
Bloom" (CoNEXT'14): 4-way buckets, 16-bit fingerprints, partial-key
cuckoo hashing (alt bucket = bucket XOR hash(fingerprint)).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SLOTS = 4
MAX_KICKS = 500

FILTERS_SCHEMA = "host_bucket int, table binary, saturated boolean, n_items long"


class CuckooFilter:
    """16-bit-fingerprint, 4-slot-bucket cuckoo filter over uint64 keys."""

    def __init__(self, num_buckets: int, table: np.ndarray | None = None,
                 saturated: bool = False, n_items: int = 0):
        # power-of-two bucket count so alt-bucket XOR stays in range
        assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be 2^k"
        self.num_buckets = num_buckets
        self.table = (
            table if table is not None
            else np.zeros((num_buckets, SLOTS), dtype=np.uint16)
        )
        self.saturated = saturated
        self.n_items = n_items

    @classmethod
    def for_capacity(cls, n: int) -> "CuckooFilter":
        """~95% load factor at 4 slots; round buckets up to 2^k."""
        need = max(16, int(n / (SLOTS * 0.95)) + 1)
        nb = 1 << (need - 1).bit_length()
        return cls(nb)

    # -- hashing ---------------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        # fingerprint 0 means "empty slot" — remap to 1
        return np.where(fp == 0, np.uint16(1), fp)

    def _b1(self, h: np.ndarray) -> np.ndarray:
        return ((h >> np.uint64(16)) % np.uint64(self.num_buckets)).astype(
            np.int64
        )

    def _alt(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo: alt = b XOR H(fp); H = splitmix-style odd mult
        hfp = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
            0xFFFFFFFF
        )
        return (b.astype(np.uint64) ^ hfp).astype(np.int64) % self.num_buckets

    # -- single-key insert (Python loop; used via batch wrapper) ---------
    def _insert_one(self, b: int, fp: int) -> bool:
        for bucket in (b, int(self._alt(np.array([b]), np.array([fp], dtype=np.uint16))[0])):
            row = self.table[bucket]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                self.table[bucket, empty[0]] = fp
                return True
        # evict loop
        rng = np.random.RandomState(fp)
        cur_b, cur_fp = b, fp
        for _ in range(MAX_KICKS):
            slot = rng.randint(SLOTS)
            cur_fp, self.table[cur_b, slot] = (
                int(self.table[cur_b, slot]),
                cur_fp,
            )
            cur_b = int(
                self._alt(np.array([cur_b]), np.array([cur_fp], dtype=np.uint16))[0]
            )
            row = self.table[cur_b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                self.table[cur_b, empty[0]] = cur_fp
                return True
        self.saturated = True
        return False

    def add_hashes(self, h: np.ndarray) -> None:
        """Insert uint64 key hashes; skips keys whose fingerprint is
        already present in either candidate bucket (idempotent adds)."""
        h = h.astype(np.uint64)
        fp, b1 = self._fp(h), self._b1(h)
        present = self._contains_vec(b1, fp)
        for i in np.nonzero(~present)[0]:
            if self._insert_one(int(b1[i]), int(fp[i])):
                self.n_items += 1

    def _contains_vec(self, b1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        alt = self._alt(b1, fp)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[alt] == fp[:, None]).any(axis=1)
        return in1 | in2

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership; saturated filters answer all-True
        (degrade to exact join, never lose keys)."""
        h = h.astype(np.uint64)
        if self.saturated:
            return np.ones(len(h), dtype=bool)
        return self._contains_vec(self._b1(h), self._fp(h))

    def delete_hashes(self, h: np.ndarray) -> int:
        """Best-effort delete (cuckoo supports it; bloom cannot)."""
        h = h.astype(np.uint64)
        fp, b1 = self._fp(h), self._b1(h)
        alt = self._alt(b1, fp)
        removed = 0
        for i in range(len(h)):
            for bucket in (b1[i], alt[i]):
                slots = np.nonzero(self.table[bucket] == fp[i])[0]
                if len(slots):
                    self.table[bucket, slots[0]] = 0
                    removed += 1
                    self.n_items -= 1
                    break
        return removed

    # -- serde -----------------------------------------------------------
    def to_row(self, host_bucket: int) -> dict:
        return {
            "host_bucket": host_bucket,
            "table": self.table.tobytes(),
            "saturated": self.saturated,
            "n_items": self.n_items,
        }

    @classmethod
    def from_row(cls, row) -> "CuckooFilter":
        tbl = np.frombuffer(row["table"], dtype=np.uint16).reshape(-1, SLOTS).copy()
        return cls(tbl.shape[0], tbl, bool(row["saturated"]), int(row["n_items"]))


# ---------------------------------------------------------------------------
# Spark integration: per-host-bucket filter table maintained in applyInPandas
# ---------------------------------------------------------------------------


def _key_hash_col(col: str):
    return F.xxhash64(F.col(col)).cast("long").alias("_kh")


def build_filters(
    seen: DataFrame,
    key_col: str = "url_key",
    bucket_col: str = "host_bucket",
    capacity_per_bucket: int = 1 << 16,
) -> DataFrame:
    """seen(host_bucket, url_key) → filters(host_bucket, table,
    saturated, n_items); one cuckoo filter per bucket, built where the
    bucket's keys live (applyInPandas grouped map — no collect)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        f = CuckooFilter.for_capacity(max(capacity_per_bucket, len(pdf)))
        f.add_hashes(pdf["_kh"].to_numpy().astype(np.uint64))
        return pd.DataFrame([f.to_row(int(pdf[bucket_col].iloc[0]))])

    hashed = seen.select(F.col(bucket_col), _key_hash_col(key_col))
    return hashed.groupBy(bucket_col).applyInPandas(build, FILTERS_SCHEMA)


def merge_new_keys(
    filters: DataFrame,
    new_seen: DataFrame,
    key_col: str = "url_key",
    bucket_col: str = "host_bucket",
    capacity_per_bucket: int = 1 << 16,
) -> DataFrame:
    """Round update: insert this round's keys into each bucket's filter
    (the applyInPandas batch merge of the north rule). Buckets with no
    existing filter get a fresh one.

    Implemented as a COGROUP (not a union): unioning key rows with
    null-padded filter rows would make Arrow hand pandas a float64
    `_kh` column (int64-with-nulls promotion), silently destroying the
    low bits of the 64-bit hashes — every fingerprint inserted after
    the corruption would be garbage (no false negatives guarantee
    gone). Cogroup keeps each side's dtype intact."""

    def merge(fi: pd.DataFrame, nw: pd.DataFrame) -> pd.DataFrame:
        if len(fi):
            f = CuckooFilter.from_row(fi.iloc[0])
            bucket = int(fi[bucket_col].iloc[0])
        else:
            f = CuckooFilter.for_capacity(capacity_per_bucket)
            bucket = int(nw[bucket_col].iloc[0])
        if len(nw):
            f.add_hashes(nw["_kh"].to_numpy().astype(np.uint64))
        return pd.DataFrame([f.to_row(bucket)])

    nw = new_seen.select(F.col(bucket_col), _key_hash_col(key_col))
    return (
        filters.groupBy(bucket_col)
        .cogroup(nw.groupBy(bucket_col))
        .applyInPandas(merge, FILTERS_SCHEMA)
    )


def probe_candidates(
    candidates: DataFrame,
    filters: DataFrame,
    key_col: str = "url_key",
    bucket_col: str = "host_bucket",
) -> DataFrame:
    """candidates + `_maybe_seen` column via the bucket's cuckoo filter.

    Plan shape: candidates are already partitioned by host_bucket, the
    filters table is tiny per bucket → broadcast join + vectorized
    probe in applyInPandas per bucket. maybe_seen=False is definitive
    (no false negatives); True still needs the exact anti-join.
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    cols = [f.name for f in candidates.schema.fields]
    out_schema = StructType(
        list(candidates.schema.fields) + [StructField("_maybe_seen", BooleanType())]
    )

    def probe(pdf: pd.DataFrame) -> pd.DataFrame:
        has_filter = pdf["table"].notna()
        res = pdf[cols].copy()
        if has_filter.any():
            f = CuckooFilter.from_row(pdf[has_filter].iloc[0])
            res["_maybe_seen"] = f.contains_hashes(
                pdf["_kh"].to_numpy().astype(np.uint64)
            )
        else:
            res["_maybe_seen"] = False
        return res

    joined = (
        candidates.withColumn("_kh", F.xxhash64(F.col(key_col)).cast("long"))
        .join(F.broadcast(filters), bucket_col, "left")
    )
    return joined.groupBy(bucket_col).applyInPandas(
        probe, out_schema
    )
