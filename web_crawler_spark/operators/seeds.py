"""U4 seed URL resolution (reference main.py:44-74).

The reference probes each raw seed over HTTPS before crawling: try the
raw URL without / and with / (order depends on whether the raw ends in
'/'), prefix "https://" when scheme-less, follow redirects, and take
the FINAL url of the first response with status < 400; if every probe
fails, fall back to the https-prefixed raw. This does NOT change DB
identity — only the fetch entry point.

Spark shape: the seed list is a tiny dim, but the operator is a full
DataFrame plan so a 10^7-row seed table works identically: candidate
array → posexplode (preserving preference order) → broadcast equi-join
against a probe table → min-preference winner per seed → coalesce with
the fallback. The probe table (url, status, final_url) is the fixture
seam standing in for the HTTP GET — production fills it with a
mapInPandas fetch over the distinct candidate set (operators/fetch.py),
which is 2 rows per seed, not a crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_scheme(c):
    return F.when(
        c.startswith("http://") | c.startswith("https://"), c
    ).otherwise(F.concat(F.lit("https://"), c))


def resolve_seed_urls(
    sites: DataFrame,
    probes: DataFrame,
    url_col: str = "url",
    out_col: str = "resolved_url",
) -> DataFrame:
    """Add ``out_col`` = the reference-resolved fetch URL per seed.

    ``probes``: (url, status, final_url) — the result of GET-ing each
    candidate URL (after https-prefixing), redirects followed.
    Candidates missing from the table are treated as failed probes
    (connection error), matching the reference's try/except.
    """
    raw = F.trim(F.col(url_col))
    stripped = F.regexp_replace(raw, "/+$", "")  # rstrip("/")
    cands = F.when(raw.endswith("/"), F.array(stripped, raw)).otherwise(
        F.array(raw, F.concat(raw, F.lit("/")))
    )
    exploded = sites.select(
        "*", F.posexplode(cands).alias("_pref", "_cand")
    ).withColumn("_probe_url", _with_scheme(F.col("_cand")))
    p = probes.select(
        F.col("url").alias("_probe_url"),
        F.col("status").alias("_status"),
        F.col("final_url").alias("_final"),
    )
    hits = (
        exploded.join(F.broadcast(p), "_probe_url", "left")
        .filter(F.col("_status").isNotNull() & (F.col("_status") < 400))
        .groupBy(url_col)
        .agg(F.min(F.struct("_pref", "_final")).alias("_win"))
        .select(url_col, F.col("_win._final").alias("_resolved"))
    )
    return (
        sites.join(F.broadcast(hits), url_col, "left")
        .withColumn(out_col, F.coalesce(F.col("_resolved"), _with_scheme(raw)))
        .drop("_resolved")
    )
