"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``web_crawler_spark.queries`` — one entry per
operator shape from SURVEY.md §2 plus the training-data-pipeline
extras (dedup, similarity search, text analysis) and the rows-only
crawl-engine views (iterative multi-round jobs, not SQL-expressible;
their ordering/seen-set/span parity is gated by pytest against the
pure-Python reference oracle instead).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from web_crawler_spark.queries import QUERIES, build_oracles  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on sf0.001: documents → content hash + exact-dup
    groups + quality/token analysis → per-source rollup. Exercises the
    hash, dedup, text-analysis, join, and aggregation layers in one plan."""
    from pyspark.sql import functions as F

    from web_crawler_spark.functions.text import (
        quality_band_col,
        quality_score_col,
        token_count_col,
    )
    from web_crawler_spark.operators.dedup import exact_dedup_groups

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    scored = docs.select(
        "doc_id",
        "source",
        F.sha2(F.col("text"), 256).alias("content_hash"),
        token_count_col(F.col("text")).alias("n_tokens"),
        quality_score_col(F.col("text")).alias("quality_score"),
        quality_band_col(quality_score_col(F.col("text"))).alias("quality_band"),
    )
    groups = exact_dedup_groups(docs, "doc_id", "text").select(
        "content_hash", "n_copies"
    )
    return (
        scored.join(F.broadcast(groups), "content_hash")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.count(F.when(F.col("quality_band") == "excellent", 1)).alias(
                "n_excellent"
            ),
            F.count(F.when(F.col("n_copies") > 1, 1)).alias("n_dup_docs"),
        )
        .orderBy("source")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # build_oracles resolves the lazy recall oracles too (their
    # approximate-side mirrors pre-materialize parquet at build time)
    return build_oracles()
