"""Pure-Python reference-semantics kernels and the single-worker BFS oracle.

These functions pin the *behavior* of the reference crawler
(Ailover123/Web_Crawler at /root/reference) — URL canonicalization,
admission rules, classification, fetch admission — as element-wise pure
functions. They are the single source of truth: the Spark engine calls
them Arrow-vectorized (pandas UDF over pd.Series), and the test oracle
calls them row-at-a-time in a single-threaded BFS. Parity between engine
and oracle is therefore parity of *orchestration*, with the scalar
semantics shared by construction.
"""

from web_crawler_spark.oracle.semantics import (  # noqa: F401
    allowed_domain,
    canonical_id,
    classify_block,
    classify_fetch,
    classify_url,
    is_same_site,
    needs_js_rendering,
    normalize_fetch_url,
    severity_band,
    should_enqueue,
    storage_url,
    strip_fragment,
)
