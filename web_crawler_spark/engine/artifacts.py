"""Blob sinks: baseline HTML snapshots + diff artifacts as FILES.

Reference parity: S6 baseline blob store (baseline_store.py:65-100 —
one ``<root>/<custid>/<siteid>/<name>.html`` file per baseline,
overwritten in place) and the diff-artifact JSON the compare mode
renders (compare_utils.py:160-282). File names use the U8 mangle
(baseline_utils.py:7-12, functions/urls.safe_filename).

Spark shape: blob writes happen EXECUTOR-SIDE via mapInPandas — the
driver never sees payload bytes, each partition writes its own rows,
and the returned DataFrame is the write manifest (path, bytes). The
root must be a shared filesystem or fuse-mounted object store on a
real cluster (same requirement the reference's Path.write_text has,
minus the single-writer bottleneck). Writes are idempotent overwrites
keyed by the mangled name, so task retries are safe — matching the
reference's "overwrite the SAME file every time".
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawler_spark.functions.urls import safe_filename_col

MANIFEST_SCHEMA = "siteid long, url_key string, path string, n_bytes long"


def write_blobs(
    df: DataFrame,
    root: str,
    content_col: str,
    ext: str,
    site_col: str = "siteid",
    cust_col: str | None = "custid",
    key_col: str = "url_key",
) -> DataFrame:
    """Write one ``<root>[/<custid>]/<siteid>/<mangled key>.<ext>`` file
    per row, executor-side; returns the manifest DataFrame (an ACTION
    has to consume it — the write is lazy like any Spark sink)."""
    sel = df.select(
        F.col(site_col).cast("long").alias("siteid"),
        F.col(key_col).alias("url_key"),
        F.col(content_col).cast("string").alias("content"),
        (
            F.col(cust_col).cast("string")
            if cust_col and cust_col in df.columns
            else F.lit(None).cast("string")
        ).alias("cust"),
        safe_filename_col(F.col(key_col)).alias("name"),
    )

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                parts = [root] + ([r.cust] if pd.notna(r.cust) else [])
                d = os.path.join(*parts, str(r.siteid))
                os.makedirs(d, exist_ok=True)
                path = os.path.join(d, f"{r.name}.{ext}")
                data = (r.content or "").strip().encode("utf-8")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)  # atomic, idempotent overwrite
                out.append((r.siteid, r.url_key, path, len(data)))
            yield pd.DataFrame(
                out, columns=["siteid", "url_key", "path", "n_bytes"]
            )

    return sel.mapInPandas(_write, MANIFEST_SCHEMA)


def write_baseline_blobs(baselines: DataFrame, root: str,
                         cust_col: str | None = "custid") -> DataFrame:
    """S6: baseline_html rows → .html blob per (siteid, url_key)."""
    return write_blobs(
        baselines, root, "baseline_html", "html", cust_col=cust_col
    )


def write_diff_artifacts(observations: DataFrame, root: str) -> DataFrame:
    """Changed observations (with the diff_artifact JSON column from
    compare_observations(include_diff=True)) → .json blob per page."""
    return write_blobs(
        observations.filter(F.col("changed")),
        root,
        "diff_artifact",
        "json",
        cust_col=None,
    )
