"""Deterministic sampling / split tier (operators/sampling.py):
reproducibility across partitionings, rate accuracy, salt
independence, and the shuffle-free plan guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket_col,
    train_val_test_split,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    ).cache()


def test_split_partition_invariant(docs):
    """The split assignment must not depend on partitioning or row
    order — the whole point vs rand(seed)."""
    a = train_val_test_split(docs, "doc_id").select("doc_id", "split")
    b = train_val_test_split(docs.repartition(17, "text"), "doc_id").select(
        "doc_id", "split"
    )
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_split_proportions_and_totality(docs):
    out = train_val_test_split(docs, "doc_id").groupBy("split").count()
    got = {r["split"]: r["count"] for r in out.collect()}
    assert sum(got.values()) == 20_000
    assert abs(got["train"] / 20_000 - 0.9) < 0.01
    assert abs(got["val"] / 20_000 - 0.05) < 0.005
    assert abs(got["test"] / 20_000 - 0.05) < 0.005


def test_sample_rate_and_salt_independence(docs):
    s1 = deterministic_sample(docs, "doc_id", 0.2, salt="a")
    s1_again = deterministic_sample(docs, "doc_id", 0.2, salt="a")
    s2 = deterministic_sample(docs, "doc_id", 0.2, salt="b")
    n1, n2 = s1.count(), s2.count()
    assert abs(n1 / 20_000 - 0.2) < 0.01 and abs(n2 / 20_000 - 0.2) < 0.01
    # same salt = identical set; different salt ≈ independent (overlap
    # ≈ rate² = 4%)
    assert s1.exceptAll(s1_again).isEmpty()
    overlap = s1.join(s2, "doc_id", "left_semi").count()
    assert abs(overlap / 20_000 - 0.04) < 0.01


def test_no_exchange_in_plan(docs):
    """Pure projection + filter: the 10^10-row guarantee is that this
    never shuffles."""
    plan = (
        deterministic_sample(
            train_val_test_split(docs, "doc_id"), "doc_id", 0.5
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_bucket_range(docs):
    mm = docs.select(
        F.min(hash_bucket_col(F.col("doc_id"))).alias("lo"),
        F.max(hash_bucket_col(F.col("doc_id"))).alias("hi"),
    ).head()
    assert mm["lo"] >= 0 and mm["hi"] < 1_000_000
