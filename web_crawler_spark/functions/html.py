"""HTML scalar kernels: span extraction, normalization, hashing, SPA gate.

The parse stage is the engine's one unavoidable Python hot spot — HTML
tokenization has no Catalyst builtin — so it runs as a single
Arrow-batched pandas UDF per page (SURVEY.md §2.D X1). Everything
derived from spans (outlink extraction, asset lists, link indexes) is
native array/higher-order-function expressions on the UDF's output, so
it stays JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, DoubleType, StringType

from web_crawler_spark.functions.urls import is_same_site_col
from web_crawler_spark.oracle import htmlspans, scoring
from web_crawler_spark.oracle import semantics as sem
from web_crawler_spark.schemas import SPANS_TYPE

# ---------------------------------------------------------------------------
# parse: HTML → interleaved span array (X1)
# ---------------------------------------------------------------------------


@F.pandas_udf(SPANS_TYPE)
def extract_spans_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """Document-order interleaved spans (parser.py:46-95 generalized to the
    graft span model). Null/empty html → empty array."""
    return pd.Series(
        [
            htmlspans.extract_spans(h, b) if isinstance(h, str) and h else []
            for h, b in zip(html, base_url)
        ]
    )


def outlink_spans_col(spans: Column, base_host_key: Column) -> Column:
    """Native filter of a spans array down to frontier-eligible link spans
    (the reference's ``urls`` list, parser.py:61-69 + 97-118): kind='link',
    http/https, same registrable host. Document order preserved."""
    return F.filter(
        spans,
        lambda s: (s["kind"] == F.lit("link"))
        & s["media_ref"].isNotNull()
        & is_same_site_col(s["media_ref"], base_host_key),
    )


def asset_refs_col(spans: Column) -> Column:
    """Native extraction of asset refs (media/style/script) in order —
    the reference's ``assets`` list (parser.py:71-93)."""
    return F.transform(
        F.filter(spans, lambda s: s["kind"].isin("media", "style", "script")),
        lambda s: s["media_ref"],
    )


# ---------------------------------------------------------------------------
# normalization + hashing (X4, H1/H2)
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def normalize_html_udf(html: pd.Series) -> pd.Series:
    """Deterministic hashing normal form (normalizer.py:138-160 contract)."""
    return html.map(lambda h: htmlspans.normalize_html(h) if isinstance(h, str) else "")


def semantic_hash_col(html: Column) -> Column:
    """H2: sha2(normalize_html(html), 256) — SURVEY.md §2.E (the reference's
    semantic_hash module is missing; this is the pinned inference, verified
    against COMPARE-mode behavior)."""
    return F.sha2(normalize_html_udf(html), 256)


@F.pandas_udf(ArrayType(StringType()))
def semantic_lines_udf(html: pd.Series) -> pd.Series:
    """X5 semantic diff lines (compare_utils.py:14-49)."""
    return html.map(
        lambda h: htmlspans.semantic_lines(h) if isinstance(h, str) else []
    )


# ---------------------------------------------------------------------------
# SPA detection (X3) — native, stays in codegen
# ---------------------------------------------------------------------------


def needs_js_col(html: Column) -> Column:
    """Native needs_js_rendering (js_detect.py:6-36): SPA root markers, or a
    <body> without any content tag."""
    h = F.lower(F.coalesce(html, F.lit("")))
    spa_roots = (
        h.contains('<div id="root"')
        | h.contains('<div id="app"')
        | h.contains("<app-root")
        | h.contains('<div id="__next"')
    )
    # text from the FIRST '<body' to the end (js_detect.py:23-24)
    body = h.substr(F.locate("<body", h), F.length(h))
    has_body = h.contains("<body")
    empty_body = ~(
        body.contains("<a ")
        | body.contains("<p")
        | body.contains("<main")
        | body.contains("<article")
        | body.contains("<section")
    )
    return (F.length(h) == 0) | spa_roots | (has_body & empty_body)


# ---------------------------------------------------------------------------
# compare / detect (A8, SO3, X7)
# ---------------------------------------------------------------------------


@F.pandas_udf(DoubleType())
def defacement_score_udf(baseline_html: pd.Series, observed_html: pd.Series) -> pd.Series:
    """A8 scoring (compare_utils.py:321-346)."""
    return pd.Series(
        [
            scoring.defacement_percentage(b or "", o or "")
            for b, o in zip(baseline_html, observed_html)
        ]
    )


def severity_col(score: Column) -> Column:
    """A9 bands (compare_utils.py:349-356) — native F.when chain."""
    return (
        F.when(score < 5, "LOW")
        .when(score < 20, "MEDIUM")
        .when(score < 50, "HIGH")
        .otherwise("CRITICAL")
    )


@F.pandas_udf(ArrayType(StringType()))
def script_sources_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """Sorted distinct external script srcs (detector.py:51-56)."""
    return pd.Series(
        [
            scoring.script_sources(h or "", b or "")
            for h, b in zip(html, base_url)
        ]
    )


@F.pandas_udf(BooleanType())
def needs_js_udf(html: pd.Series) -> pd.Series:
    """Pure-python SPA heuristic, for parity testing the native column."""
    return html.map(lambda h: sem.needs_js_rendering(h if isinstance(h, str) else ""))


def token_multiset_col(html: Column) -> Column:
    """X7/SO5 token multiset as a sorted array — two documents have
    equal word multisets (detector.py:34-37,120) iff their sorted token
    arrays are equal. Native split/filter/array_sort; no Python."""
    toks = F.split(
        F.lower(F.regexp_replace(F.coalesce(html, F.lit("")), "<[^>]+>", " ")),
        "[^0-9a-z_]+",
    )
    return F.array_sort(F.filter(toks, lambda x: x != ""))


def token_multiset_equal_col(a_html: Column, b_html: Column) -> Column:
    """SO5: token-multiset equality between two HTML documents."""
    return token_multiset_col(a_html) == token_multiset_col(b_html)


def dom_fingerprint_col(html: Column) -> Column:
    """X6 DOM-structure fingerprint: the document's opening-tag name
    sequence, hashed. Reconstruction of the reference's
    dom_structure_fingerprint (detection/detector.py:15 — imported but
    never defined anywhere in the reference; the tag sequence is the
    minimal structure-sensitive, text-insensitive signature the rule
    chain needs). Native regexp_extract_all → no Python."""
    tags = F.regexp_extract_all(
        F.lower(F.coalesce(html, F.lit(""))), F.lit("<([a-z][a-z0-9]*)"), 1
    )
    return F.sha2(F.concat_ws(",", tags), 256)


def script_sources_col(html: Column) -> Column:
    """Sorted distinct external script srcs as a NATIVE column (the
    regexp subset of script_sources_udf — the src-attribute form the
    fixtures and detector.py:51-56 exercise). Rows needing full
    attribute parsing use the UDF; this stays JVM-side."""
    return F.array_sort(
        F.array_distinct(
            F.regexp_extract_all(
                F.coalesce(html, F.lit("")),
                F.lit('<script src="([^"]+)"'),
                1,
            )
        )
    )


@F.pandas_udf(StringType())
def diff_artifact_udf(baseline_html: pd.Series, observed_html: pd.Series) -> pd.Series:
    """Structured side-by-side diff artifact as JSON
    (compare_utils.py:55-282 semantics via oracle/diffs.py)."""
    from web_crawler_spark.oracle.diffs import diff_artifact_json

    return pd.Series(
        [
            diff_artifact_json(b or "", o or "")
            for b, o in zip(baseline_html, observed_html)
        ]
    )
