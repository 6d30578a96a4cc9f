"""web_crawler_spark — a PySpark-native crawl/analytics engine.

Brand-new implementation (not a port) of the query and data-processing
capabilities of the reference crawler (Ailover123/Web_Crawler, read-only
at /root/reference). Architecture: DataFrame/SQL plans optimized by
Catalyst, Arrow-vectorized pandas UDFs for the scalar HTML/URL kernels,
snapshot-versioned parquet state tables (Iceberg MERGE INTO in
production), and a batch-round frontier scheduler.

Subpackages
-----------
oracle     pure-Python single-worker reference-semantics oracle (test-only)
functions  vectorized scalar kernels (URL canonicalization, HTML spans,
           hashing, scoring, text analysis)
operators  relational operators (admission filters, frontier dequeue,
           seen-set anti-join, dedup, similarity, analytics)
engine     the multi-round crawl driver + checkpoint/resume
fixtures   deterministic synthetic web-graph generator for tests/bench
"""

__version__ = "0.1.0"
