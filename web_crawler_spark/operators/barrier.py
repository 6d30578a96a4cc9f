"""Run-once materialization barriers for multi-consumer query subplans.

Several operators compute a frame once (signatures, band buckets,
gram arrays) and feed it to two or more downstream consumers; without
a barrier Spark would recompute the subplan per consumer. Two barrier
mechanisms compete, and the repo has measured both:

- ``persist()`` caches Tungsten columnar batches in the CacheManager —
  the fast re-read path (scans stay inside whole-stage codegen over
  ColumnarBatch) — but entries outlive the query: repeated operator
  calls in a long-lived session accumulate cached plans until someone
  calls unpersist/clearCache (r3 advisor finding).
- ``localCheckpoint(eager=False)`` stores plain row blocks that the
  ContextCleaner frees once the RDD is unreachable — leak-free, but
  the re-read is a non-columnar scan outside codegen. The r5 paired
  cold A/B at sf0.1 measured the swap from persist() at +27-42 % on
  dedup_minhash_lsh (2.87 → 3.71 s median) and ~2× on dedup_simhash
  (0.53 → 1.10 s): the barrier frames are re-read 2-3× per query, and
  row-at-a-time deserialization dominates.

``gc_persist`` gives both properties: barrier frames are persist()ed,
and their unpersist is tied (via ``weakref.finalize``) to garbage
collection of the RESULT DataFrame the operator returns. While the
caller holds the result, re-execution reuses the cache; the moment the
handle is dropped (end of a bench repeat, end of a driver request) the
CacheManager entries die with it — nothing accumulates across calls in
a long-lived session.

Failure mode honesty: if an executor loses a cached block, persist()
recomputes from lineage (localCheckpoint would fail the job) — the
safer behavior at cluster scale. If the SparkSession is already gone
when a finalizer fires (interpreter shutdown), the unpersist is a
no-op.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def barrier(df: DataFrame) -> DataFrame:
    """Mark a multi-consumer subplan for run-once materialization.
    Pair every ``barrier`` call with ``release_on_gc`` on the frame
    the operator returns, or the cache entry outlives the query."""
    return df.persist()


def _unpersist_all(jdfs: list) -> None:
    for jdf in jdfs:
        try:
            jdf.unpersist(False)
        except Exception:
            pass  # session/gateway already gone — nothing to free


def release_on_gc(result: DataFrame, *barriers: DataFrame) -> DataFrame:
    """Tie the lifetime of ``barriers``' cache entries to the Python
    ``result`` handle: when the caller's last reference to the result
    is collected, every barrier frame is unpersisted. Returns
    ``result`` for chaining."""
    # hold only the py4j refs — holding the DataFrames themselves would
    # be fine (finalize args keep them alive), but jdf is the minimal
    # handle unpersist needs
    weakref.finalize(result, _unpersist_all, [b._jdf for b in barriers])
    return result
