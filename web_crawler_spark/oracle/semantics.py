"""Scalar URL / admission semantics of the reference crawler.

Clean-room reimplementation pinned to observed behavior of the reference
(citations are to files under /root/reference/baseline-crawler/):

- ``normalize_fetch_url``  ≡ normalize_url        (crawler/normalizer.py:18-84)
- ``canonical_id``         ≡ get_canonical_id     (crawler/normalizer.py:91-131)
- ``classify_url``         ≡ classify_url         (crawler/parser.py:10-44)
- ``classify_block``       ≡ classify_block       (crawler/worker.py:30-66)
- ``is_same_site``         ≡ _is_allowed_url      (crawler/parser.py:97-118)
- ``allowed_domain``       ≡ _allowed_domain      (crawler/worker.py:73-78)
- ``storage_url``          ≡ Worker._db_url       (crawler/worker.py:116-145)
- ``should_enqueue``       ≡ should_enqueue       (crawler/frontier.py:21-25)
- ``strip_fragment``       ≡ parser.strip_fragment(crawler/parser.py:56-59)
- ``classify_fetch``       ≡ fetch admission      (crawler/fetcher.py:35-63)
- ``needs_js_rendering``   ≡ needs_js_rendering   (crawler/js_detect.py:6-36)
- ``severity_band``        ≡ defacement_severity  (compare_utils.py:349-356)

Everything here is dependency-free (urllib + re only) so it can run
unchanged inside Arrow-batched pandas UDFs on executors.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse, urlunparse

# ---------------------------------------------------------------------------
# host helpers
# ---------------------------------------------------------------------------


def _host_no_port(netloc: str) -> str:
    """Lowercased hostname with any ``:port`` suffix removed."""
    if not netloc:
        return ""
    return netloc.lower().split(":", 1)[0]


def _drop_www(host: str) -> str:
    """Remove a single leading ``www.`` label."""
    return host[4:] if host.startswith("www.") else host


def registrable_host(url_or_host: str) -> str:
    """Canonical comparison key for a host: lowercase, portless, www-less.

    Accepts either a full URL or a bare netloc.
    """
    s = url_or_host or ""
    if "://" in s:
        s = urlparse(s).netloc
    return _drop_www(_host_no_port(s))


# ---------------------------------------------------------------------------
# URL canonicalization (reference normalizer.py)
# ---------------------------------------------------------------------------


def normalize_fetch_url(
    url: str,
    base: str | None = None,
    preference_url: str | None = None,
) -> str:
    """Fetch-form canonical URL: https scheme, lowercase host, no trailing
    slash (except root), query kept, params/fragment dropped, optional
    www/non-www coercion toward ``preference_url``.

    Behavior parity target: crawler/normalizer.py:18-84.
    """
    if not url:
        return ""
    u = url.strip()
    # schemeless absolute ("example.com/x") gets a scheme before parsing;
    # leading-slash relative paths are left for urljoin
    if "://" not in u and not u.startswith("/"):
        u = "http://" + u
    if base:
        u = urljoin(base, u)
    parts = urlparse(u)

    netloc = parts.netloc.lower()
    if preference_url:
        pref_raw = (
            preference_url if "://" in preference_url else "https://" + preference_url
        )
        pref_netloc = urlparse(pref_raw).netloc.lower()
        if _drop_www(_host_no_port(netloc)) == _drop_www(_host_no_port(pref_netloc)):
            netloc = pref_netloc

    path = parts.path or "/"
    if path != "/" and path.endswith("/"):
        # `or "/"` deliberately diverges from the reference
        # (normalizer.py:71-73) for the degenerate all-slash path
        # ("host//" → ""): the reference emits "https://host" there but
        # re-normalizing yields "https://host/" — a canonicalizer used
        # as the dedup key must be idempotent (hypothesis-found)
        path = path.rstrip("/") or "/"

    return urlunparse(("https", netloc, path, "", parts.query, ""))


def canonical_id(url: str, base_url: str | None = None) -> str:
    """Scheme-less stable identity ``host/path?query`` (path ``strip('/')``),
    host coerced to ``base_url``'s www choice when same registrable host.

    Behavior parity target: crawler/normalizer.py:91-131. This is the
    dedup / MERGE key (doc_id) of the engine.
    """
    if not url:
        return ""
    parts = urlparse(normalize_fetch_url(url, preference_url=base_url))
    netloc = parts.netloc.lower()
    if base_url:
        base_netloc = urlparse(normalize_fetch_url(base_url)).netloc.lower()
        if _drop_www(netloc) == _drop_www(base_netloc):
            netloc = base_netloc
    path = parts.path.strip("/")
    query = f"?{parts.query}" if parts.query else ""
    return f"{netloc}/{path}{query}" if path else f"{netloc}{query}"


def storage_url(fetched_url: str, original_site_url: str | None = None) -> str:
    """Scheme-less storage URL; ``www.`` kept only when the original site
    URL normalizes to a www host. Behavior parity: crawler/worker.py:116-145.
    """
    try:
        parts = urlparse(fetched_url)
        host = parts.netloc.lower()
        keep_www = False
        if original_site_url:
            keep_www = (
                urlparse(normalize_fetch_url(original_site_url))
                .netloc.lower()
                .startswith("www.")
            )
        if not keep_www:
            host = _drop_www(host)
        query = f"?{parts.query}" if parts.query else ""
        return f"{host}{parts.path or ''}{query}"
    except Exception:  # pragma: no cover - mirror reference's blanket fallback
        return fetched_url


def strip_fragment(url: str) -> str:
    """Drop the ``#fragment`` part, keep everything else intact.

    Behavior parity: crawler/parser.py:56-59.
    """
    p = urlparse(url)
    return urlunparse((p.scheme, p.netloc, p.path, p.params, p.query, ""))


# ---------------------------------------------------------------------------
# admission predicates
# ---------------------------------------------------------------------------

_NON_FETCHABLE_SCHEMES = ("mailto", "tel", "javascript")


def should_enqueue(url: str) -> bool:
    """Scheme gate applied at enqueue time (crawler/frontier.py:21-25)."""
    return urlparse(url).scheme not in _NON_FETCHABLE_SCHEMES


def is_same_site(url: str, base_domain: str) -> bool:
    """Parser-level host filter: http/https only, registrable host equal
    (www-insensitive, port-insensitive). Parity: crawler/parser.py:97-118.
    """
    parts = urlparse(url)
    if parts.scheme not in ("http", "https"):
        return False
    return registrable_host(parts.netloc) == registrable_host(base_domain)


def allowed_domain(seed_url: str, candidate_url: str) -> bool:
    """Worker-level stricter host filter: candidate host (ports stripped,
    www NOT stripped) must equal the seed's www-less host or its ``www.``
    variant. Parity: crawler/worker.py:73-78.
    """
    base = _drop_www(_host_no_port(urlparse(seed_url).netloc))
    cand = _host_no_port(urlparse(candidate_url).netloc)
    return cand == base or cand == f"www.{base}"


# ---------------------------------------------------------------------------
# classification (labels, not filters)
# ---------------------------------------------------------------------------

_PAGINATION_MARKS = ("/page/", "/p/", "?page=", "?p=", "/pagination/")
_UPLOAD_MARKS = ("/uploads/", "/assets/", "/wp-content/uploads/", "/media/", "/files/")
_MEDIA_EXTS = (".pdf", ".jpg", ".jpeg", ".png", ".gif", ".svg")


def classify_url(url: str) -> list[str]:
    """Multi-label URL classification. Returns labels in a fixed order
    (deterministic for array columns); the reference returns a set
    (crawler/parser.py:10-44) — membership is the parity contract.
    """
    low = url.lower()
    path = urlparse(url).path.lower()
    labels: list[str] = []
    if any(m in low for m in _PAGINATION_MARKS):
        labels.append("pagination")
    if any(m in low for m in _UPLOAD_MARKS) or any(
        path.endswith(e) for e in _MEDIA_EXTS
    ):
        labels.append("assets_uploads")
    if path.endswith(".css") or path.endswith(".js"):
        labels.append("scripts_styles")
    if "wp-json" in low or "/api/" in low:
        labels.append("api_like")
    if not labels:
        labels.append("normal_html")
    return labels


# block rules — first match wins, in this order (crawler/worker.py:30-66)
STATIC_EXTENSIONS = (
    ".css", ".js", ".png", ".jpg", ".jpeg", ".webp", ".gif", ".svg",
    ".ico", ".woff", ".woff2", ".ttf", ".eot", ".pdf", ".zip",
)  # fmt: skip

_EPAGE_RE = re.compile(r"(^|&)(e-page-[0-9a-fA-F]+)=")

PATH_BLOCK_RULES: tuple[tuple[str, re.Pattern[str]], ...] = (
    ("TAG_PAGE", re.compile(r"^/tag/")),
    ("AUTHOR_PAGE", re.compile(r"^/author/")),
    ("PAGINATION", re.compile(r"/page/\d*/?$")),
    ("ASSET_DIRECTORY", re.compile(r"^/(assets|static|media|uploads|images|img|css|js)/")),
)


def classify_block(url: str) -> str | None:
    """Return the block-rule label for a URL, or None if admissible.

    Rule order is semantic (first match defines the label): static
    extension (case-sensitive path suffix), Elementor e-page query,
    then path regexes on the lowercased path.
    """
    parts = urlparse(url)
    if parts.path.endswith(STATIC_EXTENSIONS):
        return "STATIC"
    if parts.query and _EPAGE_RE.search(parts.query):
        return "BLOG_EPAGE"
    low_path = parts.path.lower()
    for label, rx in PATH_BLOCK_RULES:
        if rx.search(low_path):
            return label
    return None


# ---------------------------------------------------------------------------
# fetch admission (crawler/fetcher.py:35-63)
# ---------------------------------------------------------------------------

_ADMITTED_CONTENT = ("text/html", "application/json")


def classify_fetch(status_code: int, content_type: str) -> tuple[bool, str | None]:
    """(success, error) admission decision for a completed HTTP response.

    2xx + html/json → accepted; 2xx other → 'ignored content type: …';
    non-2xx → 'http error: …'.
    """
    ct = (content_type or "").lower()
    if 200 <= status_code < 300:
        if any(tok in ct for tok in _ADMITTED_CONTENT):
            return True, None
        return False, f"ignored content type: {ct}"
    return False, f"http error: {status_code}"


# ---------------------------------------------------------------------------
# SPA detection (crawler/js_detect.py:6-36)
# ---------------------------------------------------------------------------

_SPA_ROOT_MARKS = ('<div id="root"', '<div id="app"', "<app-root", '<div id="__next"')
_CONTENT_MARKS = ("<a ", "<p", "<main", "<article", "<section")


def needs_js_rendering(html: str) -> bool:
    """Heuristic: explicit SPA root containers, or a <body> with none of
    the common content tags."""
    if not html:
        return True
    h = html.lower()
    if any(m in h for m in _SPA_ROOT_MARKS):
        return True
    body_at = h.find("<body")
    if body_at != -1:
        body = h[body_at:]
        if not any(m in body for m in _CONTENT_MARKS):
            return True
    return False


# ---------------------------------------------------------------------------
# defacement severity bands (compare_utils.py:349-356)
# ---------------------------------------------------------------------------


def severity_band(score: float) -> str:
    if score < 5:
        return "LOW"
    if score < 20:
        return "MEDIUM"
    if score < 50:
        return "HIGH"
    return "CRITICAL"
