"""Canonical schemas for every engine table (FIXTURES.md, BASELINE.json).

The `documents.spans` element type is the graft's authoritative input
contract: array<struct<kind:string, text:string, media_ref:string,
offset:int>> (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

SPANS_TYPE = ArrayType(SPAN_TYPE)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("siteid", IntegerType()),
        StructField("spans", SPANS_TYPE),
        StructField("visit_ord", LongType()),
        StructField("round", IntegerType()),
    ]
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType()),
        StructField("status_code", IntegerType()),
        StructField("content_type", StringType()),
        StructField("html", StringType()),
        StructField("rendered_html", StringType()),
        StructField("first_attempts_429", IntegerType()),
        StructField("response_time_ms", IntegerType()),
        StructField("fetch_latency_ms", IntegerType()),
        StructField("content_length", LongType()),
    ]
)

SITES_SCHEMA = StructType(
    [
        StructField("siteid", IntegerType(), False),
        StructField("custid", IntegerType()),
        StructField("url", StringType()),
        StructField("enabled", BooleanType()),
    ]
)

FRONTIER_SCHEMA = StructType(
    [
        StructField("siteid", IntegerType(), False),
        StructField("url_key", StringType(), False),  # normalized fetch URL
        StructField("host", StringType()),
        StructField("host_bucket", IntegerType()),
        StructField("depth", IntegerType()),
        StructField("parent_ord", LongType()),  # visit ordinal of parent (0=seed)
        StructField("link_idx", IntegerType()),
        StructField("parent_key", StringType()),  # discovering page url_key
    ]
)

SEEN_SCHEMA = StructType(
    [
        StructField("siteid", IntegerType(), False),
        StructField("url_key", StringType(), False),
        StructField("host_bucket", IntegerType()),
        StructField("first_depth", IntegerType()),
        StructField("round_seen", IntegerType()),
    ]
)

VISITS_SCHEMA = StructType(
    [
        StructField("siteid", IntegerType(), False),
        StructField("url_key", StringType(), False),
        StructField("visit_ord", LongType()),
        StructField("depth", IntegerType()),
        StructField("parent_key", StringType()),
        StructField("round", IntegerType()),
    ]
)

FETCH_LOG_SCHEMA = StructType(
    [
        StructField("siteid", IntegerType()),
        StructField("url_key", StringType()),
        StructField("depth", IntegerType()),
        StructField("status_code", IntegerType()),
        StructField("content_type", StringType()),
        StructField("success", BooleanType()),
        StructField("error", StringType()),
        StructField("response_time_ms", IntegerType()),
        StructField("content_length", LongType()),
        StructField("visit_ord", LongType()),
        StructField("parent_key", StringType()),
        StructField("round", IntegerType()),
    ]
)

BLOCKED_SCHEMA = StructType(
    [
        StructField("siteid", IntegerType()),
        StructField("url", StringType()),
        StructField("block_type", StringType(), False),
        StructField("round", IntegerType()),
    ]
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("user_agent", StringType()),
        StructField("rule_type", StringType()),
        StructField("path_prefix", StringType()),
        StructField("crawl_delay_ms", IntegerType()),
    ]
)
