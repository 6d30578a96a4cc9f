"""Single-worker BFS crawl oracle — the engine's parity contract.

Pure-Python, row-at-a-time reimplementation of the reference crawl loop
with ONE worker thread, which is the reproducible ordering contract
(SURVEY.md §7 "What's hard"): FIFO frontier (crawler/frontier.py:30,51)
+ in-document-order link extraction (crawler/parser.py:61-69) ⇒ visit
order is BFS by (depth, parent visit ordinal, link index), with
first-wins dedup at enqueue time (frontier.py:46-49).

Pipeline per dequeued URL mirrors crawler/worker.py:148-262:
fetch (429 retry ≤2, fetcher.py:17-39) → admission (fetcher.py:41-63) →
fetch_log row → HTML gate (worker.py:195-196) → extract (parser.py) →
SPA render fallback (worker.py:202-211) → per-link block classify
(worker.py:237-242) → strict domain filter (worker.py:244-248) →
enqueue w/ scheme gate + normalize + seen check (frontier.py:39-70).

The Spark engine must reproduce `visit_order`, `seen`, and per-document
span sequences exactly.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from web_crawler_spark.oracle.htmlspans import extract_spans, outlinks
from web_crawler_spark.oracle.semantics import (
    allowed_domain,
    canonical_id,
    classify_block,
    classify_fetch,
    needs_js_rendering,
    normalize_fetch_url,
    should_enqueue,
)

MAX_RETRIES_429 = 2  # crawler/fetcher.py:17


@dataclass
class SyntheticPage:
    """A row of the synthetic web (FIXTURES.md §3)."""

    url: str  # normalized fetch URL (join key)
    status_code: int = 200
    content_type: str = "text/html"
    html: str = ""
    rendered_html: str | None = None
    first_attempts_429: int = 0  # first N attempts return 429


@dataclass
class OracleResult:
    visit_order: list[tuple[str, int, str | None]] = field(default_factory=list)
    # (normalized url, depth, parent normalized url) in dequeue order
    seen: set[str] = field(default_factory=set)  # all ever-enqueued keys
    documents: dict[str, list[dict]] = field(default_factory=dict)
    # canonical_id -> span list, for successfully parsed HTML pages
    fetch_log: list[dict] = field(default_factory=list)
    blocked: dict[str, list[str]] = field(default_factory=dict)  # label -> urls


def _fetch(page: SyntheticPage | None) -> tuple[bool, str | None, int, str]:
    """(success, error, status, content_type) under the reference's retry
    + admission rules, against the synthetic page table."""
    if page is None:
        return False, "connection error", 0, ""
    status = page.status_code
    if page.first_attempts_429 > 0:
        if page.first_attempts_429 > MAX_RETRIES_429:
            return False, "http error: 429", 429, page.content_type.lower()
        # retries exhaust the 429 budget, final attempt yields the real status
    ok, err = classify_fetch(status, page.content_type)
    return ok, err, status, page.content_type.lower()


def crawl_oracle(
    pages: dict[str, SyntheticPage],
    seed_url: str,
    max_depth: int | None = None,
    max_frontier: int | None = None,
) -> OracleResult:
    """Crawl the synthetic web exactly as the single-worker reference would.

    ``pages`` is keyed by normalized fetch URL. ``max_frontier`` models the
    reference's Queue(maxsize=10_000) silent-drop overflow
    (frontier.py:30,51-54); None = unbounded (the engine's default).
    """
    res = OracleResult()
    queue: deque[tuple[str, str | None, int]] = deque()

    def enqueue(url: str, parent: str | None, depth: int) -> bool:
        if not should_enqueue(url):
            return False
        key = normalize_fetch_url(url)
        if key in res.seen:
            return False
        if max_frontier is not None and len(queue) >= max_frontier:
            return False  # reference drops silently on overflow
        res.seen.add(key)
        queue.append((key, parent, depth))
        return True

    enqueue(normalize_fetch_url(seed_url), None, 0)

    while queue:
        url, parent, depth = queue.popleft()
        res.visit_order.append((url, depth, parent))

        page = pages.get(url)
        ok, err, status, ct = _fetch(page)
        res.fetch_log.append(
            {
                "url": url,
                "parent": parent,
                "depth": depth,
                "status_code": status,
                "content_type": ct,
                "success": ok,
                "error": err,
            }
        )
        if not ok:
            if err and err.startswith("ignored content type"):
                res.blocked.setdefault("FETCH_IGNORED_CONTENT_TYPE", []).append(url)
            continue
        if "text/html" not in ct:
            continue

        html = page.html
        links = outlinks(extract_spans(html, url), url)
        if not links and needs_js_rendering(html) and page.rendered_html:
            html = page.rendered_html
        spans = extract_spans(html, url)
        links = outlinks(spans, url)

        res.documents[canonical_id(url, seed_url)] = spans

        if max_depth is not None and depth >= max_depth:
            continue
        for u in links:
            label = classify_block(u)
            if label:
                res.blocked.setdefault(label, []).append(u)
                continue
            if not allowed_domain(seed_url, u):
                res.blocked.setdefault("DOMAIN_FILTER", []).append(u)
                continue
            enqueue(u, url, depth + 1)

    return res
