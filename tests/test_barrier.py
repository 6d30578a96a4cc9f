"""operators/barrier.py: run-once persist barriers whose cache entries
die with the returned frame — the r5 fix for the r4 regression where
swapping persist() → localCheckpoint cost +27 % on dedup_minhash_lsh
(row-scan re-reads outside codegen), while plain persist() leaks
CacheManager entries across calls in a long-lived session (the r3
advisor finding the swap was fixing)."""

from __future__ import annotations

import gc

from pyspark.sql import functions as F

from web_crawler_spark.operators.barrier import barrier, release_on_gc


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_on_gc_frees_cache(spark):
    base = _n_persistent(spark)
    src = spark.range(1000).select("id", (F.col("id") % 7).alias("k"))
    b = barrier(src)
    out = release_on_gc(b.groupBy("k").count(), b)
    assert out.count() == 7
    assert _n_persistent(spark) > base  # materialized while held
    del out, b
    gc.collect()
    assert _n_persistent(spark) == base  # released with the handle


def test_repeated_operator_calls_do_not_accumulate(spark):
    """The advisor-r3 leak scenario: many operator calls in one
    long-lived session. With gc_persist semantics the persistent-RDD
    census returns to baseline once results are dropped."""
    from web_crawler_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} with shared boilerplate text") for i in range(40)],
        "doc_id long, text string",
    )
    base = _n_persistent(spark)
    for _ in range(3):
        r1 = minhash_lsh_pairs(docs, num_perm=16, bands=4, threshold=0.5)
        r2 = simhash_pairs(docs, max_hamming=3)
        r1.count(), r2.count()
        del r1, r2
    gc.collect()
    assert _n_persistent(spark) == base


def test_result_correct_while_barrier_handle_dropped(spark):
    """Dropping the intermediate barrier handle must not unpersist (or
    break) the plan while the RESULT is still live and re-executable."""
    src = spark.range(100).select("id", (F.col("id") % 5).alias("k"))
    b = barrier(src)
    out = release_on_gc(b.groupBy("k").count(), b)
    del b
    gc.collect()
    assert out.count() == 5
    assert out.count() == 5  # second execution reuses the live cache
