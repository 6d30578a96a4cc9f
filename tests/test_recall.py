"""Recall gates for the approximate tiers (r4).

The driver's correctness gate runs the full five recall rows against
the DuckDB + pandas-mirror oracles (queries.py LAZY_ORACLES); these
tests keep the floors wired into CI too — a config change that tanks
recall fails here before it ever reaches a driver round. sf0.01 is the
same fixture scale the driver gates at.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not mounted"
)


def _row(spark, name):
    from web_crawler_spark.queries import QUERIES

    return QUERIES[name](spark, SF_DIR).collect()[0].asDict()


@needs_testdata
def test_ann_lsh_recall_floor(spark):
    r = _row(spark, "ann_lsh_recall")
    assert r["meets_floor"], r
    assert r["n_exact"] == 50, r  # 10 queries × k=5


@needs_testdata
def test_ann_ivf_recall_floor(spark):
    r = _row(spark, "ann_ivf_recall")
    assert r["meets_floor"], r


@needs_testdata
def test_dedup_minhash_recall_floor(spark):
    r = _row(spark, "dedup_minhash_recall")
    assert r["meets_floor"], r
    assert r["n_exact"] > 0, r


@needs_testdata
def test_dedup_simhash_recall_exact(spark):
    # pigeonhole: 4-chunk blocking is LOSSLESS for hamming <= 3 — the
    # distributed blocking join must deliver recall exactly 1.0
    r = _row(spark, "dedup_simhash_recall")
    assert r["recall_bp"] == 10000, r
    assert r["n_approx"] == r["n_exact"], r


@needs_testdata
def test_dedup_embedding_lsh_recall_floor(spark):
    r = _row(spark, "dedup_embedding_lsh_recall")
    assert r["meets_floor"], r
    # approximate output never exceeds the exact pair set (the re-rank
    # filters at the same exact-cosine threshold)
    assert r["n_approx"] <= r["n_exact"], r
    assert r["n_hit"] == r["n_approx"], r


SF01_DIR = "/root/testdata/sf0.1"

needs_sf01 = pytest.mark.skipif(
    not os.path.exists(SF01_DIR), reason="sf0.1 testdata not mounted"
)


@needs_sf01
@pytest.mark.slow
def test_ann_lsh_recall_floor_sf01(spark):
    """The bench-scale fixture (10k vectors): recall must clear the
    same floor — catches configs that look fine at sf0.01 but degrade
    with corpus size (exactly how the r3 defect hid)."""
    from web_crawler_spark.queries import QUERIES

    r = QUERIES["ann_lsh_recall"](spark, SF01_DIR).collect()[0].asDict()
    assert r["meets_floor"], r


@needs_sf01
@pytest.mark.slow
def test_dedup_embedding_lsh_recall_floor_sf01(spark):
    from web_crawler_spark.queries import QUERIES

    r = (
        QUERIES["dedup_embedding_lsh_recall"](spark, SF01_DIR)
        .collect()[0]
        .asDict()
    )
    assert r["meets_floor"], r
