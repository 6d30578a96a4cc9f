"""URL scalar kernels: Arrow-vectorized UDFs + native Catalyst expressions.

Two tiers, by design (SURVEY.md §2.C):

1. **pandas UDFs** for exact urllib parity where byte-exact reproduction
   of the reference's urlparse-based canonicalization matters
   (normalize / canonical-id — the north rule's "canonicalization Arrow
   UDFs"). These are Arrow-batched; no per-row Python UDFs anywhere.

2. **Native column expressions** for the admission predicates
   (classify_block, domain filters) so the crawl hot path stays inside
   WholeStageCodegen with predicate pushdown — verified equivalent to
   the pure-Python kernels by the parity test battery.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, StringType

from web_crawler_spark.oracle import semantics as sem

# ---------------------------------------------------------------------------
# tier 1: Arrow-vectorized parity UDFs
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def normalize_url_udf(url: pd.Series) -> pd.Series:
    """normalize_fetch_url(url) — the frontier/seen dedup key
    (reference crawler/frontier.py:44 uses no preference URL).

    Normalizes each DISTINCT value once per Arrow batch and maps back:
    crawl candidate batches repeat hot targets ~fanout× (every page
    links its host's home page), so this cuts the Python work by the
    in-batch duplication factor at zero plan cost."""
    uniq = url.dropna().drop_duplicates()
    table = pd.Series(
        [sem.normalize_fetch_url(u) if u else "" for u in uniq],
        index=uniq,
    )
    return url.map(table).fillna("")


@F.pandas_udf(StringType())
def normalize_url_pref_udf(url: pd.Series, preference_url: pd.Series) -> pd.Series:
    """normalize_fetch_url with per-row www-preference (seed-prep path,
    reference main.py:136-137)."""
    return pd.Series(
        [
            sem.normalize_fetch_url(u, preference_url=p) if u else ""
            for u, p in zip(url, preference_url)
        ]
    )


@F.pandas_udf(StringType())
def canonical_id_udf(url: pd.Series, base_url: pd.Series) -> pd.Series:
    """get_canonical_id(url, base) — scheme-less storage identity; the
    documents MERGE key (reference normalizer.py:91-131)."""
    return pd.Series(
        [sem.canonical_id(u, b) if u else "" for u, b in zip(url, base_url)]
    )


@F.pandas_udf(StringType())
def storage_url_udf(url: pd.Series, original_site_url: pd.Series) -> pd.Series:
    """Worker._db_url parity (crawler/worker.py:116-145)."""
    return pd.Series(
        [sem.storage_url(u, o) if u else "" for u, o in zip(url, original_site_url)]
    )


@F.pandas_udf(ArrayType(StringType()))
def classify_url_udf(url: pd.Series) -> pd.Series:
    """Multi-label URL classification (crawler/parser.py:10-44)."""
    return url.map(lambda u: sem.classify_url(u) if u else ["normal_html"])


@F.pandas_udf(StringType())
def classify_block_udf(url: pd.Series) -> pd.Series:
    """Pure-python block classifier; the hot path uses the native
    expression below — this UDF exists for parity testing and for
    callers outside the crawl loop."""
    return url.map(lambda u: sem.classify_block(u) if u else None)


@F.pandas_udf(BooleanType())
def allowed_domain_udf(seed_url: pd.Series, candidate: pd.Series) -> pd.Series:
    return pd.Series(
        [sem.allowed_domain(s, c) for s, c in zip(seed_url, candidate)]
    )


# ---------------------------------------------------------------------------
# tier 2: native Catalyst expressions (JVM-side, codegen-friendly)
# ---------------------------------------------------------------------------

_STATIC_EXT_RX = r"\.(css|js|png|jpg|jpeg|webp|gif|svg|ico|woff|woff2|ttf|eot|pdf|zip)$"
_EPAGE_RX = r"(^|&)e-page-[0-9a-fA-F]+="

# (label, regex on lowercased path) in reference rule order (worker.py:30-35)
_PATH_RULES = (
    ("TAG_PAGE", r"^/tag/"),
    ("AUTHOR_PAGE", r"^/author/"),
    ("PAGINATION", r"/page/[0-9]*/?$"),
    ("ASSET_DIRECTORY", r"^/(assets|static|media|uploads|images|img|css|js)/"),
)


def url_path(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))


def url_query(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))


def url_host(url: Column) -> Column:
    """Lowercased host, no port (parse_url HOST already excludes port)."""
    return F.lower(F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit("")))


def registrable_host_col(url: Column) -> Column:
    """lower + portless + www-less host — comparison key of
    parser._is_allowed_url (crawler/parser.py:108-113)."""
    return F.regexp_replace(url_host(url), r"^www\.", "")


def classify_block_col(url: Column) -> Column:
    """Native F.when chain in reference rule order (worker.py:52-66):
    STATIC (case-sensitive path suffix) → BLOG_EPAGE (raw query) →
    path regexes on lower(path). NULL = admissible."""
    path = url_path(url)
    expr = F.when(path.rlike(_STATIC_EXT_RX), F.lit("STATIC")).when(
        url_query(url).rlike(_EPAGE_RX), F.lit("BLOG_EPAGE")
    )
    low = F.lower(path)
    for label, rx in _PATH_RULES:
        expr = expr.when(low.rlike(rx), F.lit(label))
    return expr.otherwise(F.lit(None).cast(StringType()))


# X2 classification marks (crawler/parser.py:10-44), as unanchored
# regexes over the lowercased URL / path — mirrors oracle.semantics
# _PAGINATION_MARKS / _UPLOAD_MARKS / _MEDIA_EXTS exactly.
_PAGINATION_MARK_RX = r"(/page/|/p/|\?page=|\?p=|/pagination/)"
_UPLOAD_MARK_RX = r"(/uploads/|/assets/|/media/|/files/)"
_MEDIA_EXT_RX = r"\.(pdf|jpg|jpeg|png|gif|svg)$"
_API_MARK_RX = r"(wp-json|/api/)"


def classify_url_col(url: Column) -> Column:
    """X2 multi-label classification as a native Catalyst expression
    (array_compact over a F.when battery — SURVEY §2.D X2's native
    form; crawler/parser.py:10-44). Same labels/membership as
    classify_url_udf, but JVM-side with whole-stage codegen — the
    100 TB path; the Arrow UDF stays as the parity witness."""
    low = F.lower(url)
    path = F.lower(url_path(url))
    labels = F.array_compact(
        F.array(
            F.when(low.rlike(_PAGINATION_MARK_RX), F.lit("pagination")),
            F.when(
                low.rlike(_UPLOAD_MARK_RX) | path.rlike(_MEDIA_EXT_RX),
                F.lit("assets_uploads"),
            ),
            F.when(path.rlike(r"\.(css|js)$"), F.lit("scripts_styles")),
            F.when(low.rlike(_API_MARK_RX), F.lit("api_like")),
        )
    )
    return F.when(F.size(labels) == 0, F.array(F.lit("normal_html"))).otherwise(
        labels
    )


def allowed_domain_col(seed_url: Column, candidate: Column) -> Column:
    """Native _allowed_domain (worker.py:73-78): candidate host must be
    the seed's www-less host or its www. variant (no www-strip on the
    candidate)."""
    base = registrable_host_col(seed_url)
    cand = url_host(candidate)
    return (cand == base) | (cand == F.concat(F.lit("www."), base))


def safe_filename(url_key: str) -> str:
    """U8 (baseline_utils.py:7-12): normalized URL → filesystem-safe
    blob name. Input must already be normalized (the engine's url_key
    IS the normalize_url output, so the reference's inner normalize
    call is a no-op here)."""
    return (
        url_key.replace("://", "__")
        .replace("/", "_")
        .replace("?", "_")
        .replace("&", "_")
    )


def safe_filename_col(url_key: Column) -> Column:
    """Native U8 mangle — literal (non-regex) replaces, same order as
    the reference chain."""
    out = F.replace(url_key, F.lit("://"), F.lit("__"))
    for ch in ("/", "?", "&"):
        out = F.replace(out, F.lit(ch), F.lit("_"))
    return out


def is_same_site_col(candidate: Column, base_host_key: Column) -> Column:
    """Native parser-level filter (parser.py:97-118): http/https scheme +
    registrable host equality. ``base_host_key`` must already be a
    registrable host (lower/portless/www-less)."""
    proto = F.lower(F.coalesce(F.parse_url(candidate, F.lit("PROTOCOL")), F.lit("")))
    return proto.isin("http", "https") & (
        registrable_host_col(candidate) == base_host_key
    )
