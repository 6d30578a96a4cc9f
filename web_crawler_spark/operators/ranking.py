"""Distributed deterministic ordering primitives.

The crawl contract needs a *global* visit ordinal per round, sorted by
the BFS priority (depth, parent_ord, link_idx) — the reference's FIFO
dequeue order (crawler/frontier.py:30,51). A naive
``row_number().over(Window.orderBy(...))`` collapses the batch to ONE
partition — fine at 10^4 rows, fatal at 10^8. ``with_global_rank``
computes the same ordinal scalably:

  range-repartition on the sort keys → per-partition row_number →
  tiny per-partition-count collect → broadcast offset join.

Only the per-partition counts (≤ num_partitions rows) ever touch the
driver. Sort keys must be unique (BFS priorities are, by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    out: str = "rank",
    start: int = 1,
    num_partitions: int | None = None,
    small_threshold: int = 100_000,
    known_count: int | None = None,
) -> DataFrame:
    """Add ``out`` = global 1-based rank (+ start offset - 1) of each row
    under ``order_cols``. Deterministic given unique keys.

    Small batches (≤ small_threshold) use a single-partition window —
    cheaper than the two-pass dance. Large batches use the scalable
    range-partitioned plan. The input is persisted during the two-pass
    computation so the range partitioner's sampling is consistent.
    """
    n = known_count if known_count is not None else df.count()
    if n == 0:
        return df.withColumn(out, F.lit(start).cast("long"))
    if n <= small_threshold:
        w = Window.orderBy(*order_cols)
        return df.withColumn(
            out, (F.row_number().over(w) + F.lit(start - 1)).cast("long")
        )

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = d.groupBy("_pid").count().collect()  # ≤ num_partitions rows
    offsets, acc = [], start - 1
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["count"]
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out_df = (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn(out, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )
    return out_df


def first_wins(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Within-batch first-wins dedup (crawler/frontier.py:46-49 semantics
    under single-worker order): keep, per key, the row with the smallest
    BFS priority.

    Expressed as groupBy + ``min_by`` over the priority struct rather
    than a rank-1 window: Catalyst runs a map-side PARTIAL aggregate,
    so at most one candidate per (key, map partition) reaches the
    exchange. On a crawl frontier, hot targets repeat ~fanout× per
    round (every page links its host's home page), so this cuts
    shuffle rows by roughly the duplication factor — the window form
    must exchange every candidate row before it can rank. Result-
    identical when the priority tuples are unique per key (BFS
    priorities are, by construction: link_idx disambiguates even
    duplicate hrefs on one page)."""
    ordk = F.struct(*[F.col(c) for c in order_cols])
    other = [c for c in df.columns if c not in key_cols]
    row = df.groupBy(*key_cols).agg(
        F.min_by(F.struct(*[F.col(c) for c in other]), ordk).alias("_w")
    )
    return row.select(
        *[
            F.col(f"_w.{c}").alias(c) if c not in key_cols else F.col(c)
            for c in df.columns
        ]
    )
