"""Deterministic synthetic web graph (FIXTURES.md §3).

Generates, from a fixed seed, a multi-host web of interleaved text+media
HTML pages that exercises every admission rule of the reference
(P1-P9, SURVEY.md §2.B), plus fetch-failure modes (404/500/429-retry,
non-HTML content types), an SPA page with a paired rendered_html, a
www-alias subtree (host 0), trailing-slash and relative-href variants,
and duplicate links (first-wins dedup).

All URLs are emitted in normalized fetch form (semantics.normalize_fetch_url)
so the engine's synthetic fetch is an exact equi-join. No network, no
external data. Pure functions → usable from driver or executors.
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass

import pandas as pd

from web_crawler_spark.oracle.bfs import SyntheticPage
from web_crawler_spark.oracle.semantics import normalize_fetch_url

_VOCAB = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt labore dolore magna aliqua enim minim veniam quis "
    "nostrud exercitation ullamco laboris nisi aliquip commodo consequat"
).split()


@dataclass
class WebGraphConfig:
    hosts: int = 3
    pages_per_host: int = 30
    seed: int = 42
    # hot-host skew: host 0 gets `skew` × pages_per_host pages
    skew: int = 1
    # emit a www-alias mirror of host 0 (reached via one cross-link)
    www_alias_host0: bool = True
    domain_suffix: str = "example.test"


def _host_name(cfg: WebGraphConfig, h: int) -> str:
    return f"host{h}.{cfg.domain_suffix}"


def _path(j: int) -> str:
    return "/" if j == 0 else f"/p{j}"


def _page_url(host: str, j: int) -> str:
    return normalize_fetch_url(f"https://{host}{_path(j)}")


def _child_href(host: str, c: int) -> str:
    """Vary the href form to exercise urljoin + normalization."""
    if c % 5 == 0 and c != 0:
        return f"/p{c}/"  # trailing slash variant → normalizes away
    m = c % 3
    if m == 0:
        return _path(c)  # absolute path
    if m == 1:
        return f"https://{host}{_path(c)}"  # absolute URL
    return f"p{c}"  # relative (resolves against /p{j} or /)


def _text(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


def _build_html(cfg: WebGraphConfig, host: str, j: int, n_pages: int,
                rng: random.Random) -> str:
    """Interleaved text + link + media document; every block rule is hit."""
    children = [c for c in (2 * j + 1, 2 * j + 2) if c < n_pages]
    cross = (7 * j + 3) % n_pages
    parts = [
        "<!DOCTYPE html>",
        f"<html><head><title>{host} p{j}</title>",
        '<link rel="stylesheet" href="/css/site.css">',
        '<link rel="icon" href="/favicon.ico">',
        '<script src="/js/app.js"></script>',
        "</head><body>",
        f"<h1>Page {j} of {host}</h1>",
        f"<p>{_text(rng, 12)}</p>",
    ]
    for c in children:
        parts.append(
            f"<p>{_text(rng, 4)} <a href=\"{_child_href(host, c)}\">child {c}</a>"
            f" {_text(rng, 3)} <img src=\"/img/{c}.png\"> {_text(rng, 3)}</p>"
        )
    parts.append(f'<p><a href="{_path(cross)}">cross {cross}</a> {_text(rng, 5)}</p>')
    parts.append('<p><a href="/">home</a> duplicate-home-link</p>')
    # one of each blocked / filtered link kind (P1-P7 + domain filters)
    parts.extend(
        [
            '<a href="#top">anchor only</a>',
            '<a href="/tag/news">tag page</a>',
            '<a href="/author/admin">author page</a>',
            '<a href="/page/2/">pagination</a>',
            f'<a href="{_path(j)}?e-page-1a2b=3">elementor page</a>',
            '<a href="/assets/logo.png">asset png</a>',
            '<a href="/static/docs/readme">asset dir</a>',
            '<a href="/theme/style.css">stylesheet link</a>',
            '<a href="mailto:info@example.test">mail</a>',
            '<a href="tel:+15550100">call</a>',
            '<a href="javascript:void(0)">js link</a>',
            f'<a href="https://offsite.{cfg.domain_suffix}/x">offsite</a>',
            f'<a href="https://sub.{host}/x">subdomain</a>',
        ]
    )
    if cfg.www_alias_host0 and host.startswith("host0.") and j == 1:
        parts.append(f'<a href="https://www.{host}/p2">www variant</a>')
    parts.append(f"<p>{_text(rng, 8)}</p>")
    parts.append("</body></html>")
    return "\n".join(parts)


_SPA_HTML = (
    "<!DOCTYPE html>\n<html><head><title>spa</title>"
    '<script src="/js/bundle.js"></script></head>'
    '<body><div id="root"></div></body></html>'
)


def _page_row(cfg: WebGraphConfig, host: str, j: int, n_pages: int) -> dict:
    rng = random.Random(zlib.crc32(f"{cfg.seed}|{host}|{j}".encode()))
    url = _page_url(host, j)
    status, ctype, f429 = 200, "text/html; charset=utf-8", 0
    html = _build_html(cfg, host, j, n_pages, rng)
    rendered = None
    if n_pages > 20:  # failure modes only on graphs big enough to stay connected
        if j % 23 == 11:
            status = 404
        elif j % 29 == 13:
            status = 500
        elif j % 17 == 5:
            ctype = "application/json"
            html = f'{{"page": {j}}}'
        elif j % 19 == 7:
            ctype = "image/png"
            html = ""
        elif j == n_pages - 2:
            f429 = 1  # succeeds on retry (fetcher.py:35-39 budget = 2)
        elif j == n_pages - 3:
            f429 = 3  # exhausts the retry budget → http error 429
    if j == 3 and n_pages > 4:
        rendered, html = html, _SPA_HTML
    return {
        "url": url,
        "host": host,
        "status_code": status,
        "content_type": ctype,
        "html": html,
        "rendered_html": rendered,
        "first_attempts_429": f429,
        "response_time_ms": 20 + (j * 13) % 180,
        "fetch_latency_ms": 10 + (j * 7) % 90,
        "content_length": len(html),
    }


def generate_pages(cfg: WebGraphConfig) -> pd.DataFrame:
    """The synthetic web as a pandas DataFrame (FIXTURES.md §3 `pages`)."""
    rows: list[dict] = []
    for h in range(cfg.hosts):
        host = _host_name(cfg, h)
        n = cfg.pages_per_host * (cfg.skew if h == 0 else 1)
        for j in range(n):
            rows.append(_page_row(cfg, host, j, n))
        if h == 0 and cfg.www_alias_host0:
            # serve the same content under www.host0 (reached via one link)
            for j in range(n):
                r = dict(_page_row(cfg, host, j, n))
                r["url"] = _page_url(f"www.{host}", j)
                r["host"] = f"www.{host}"
                rows.append(r)
    return pd.DataFrame(rows)


def generate_sites(cfg: WebGraphConfig) -> pd.DataFrame:
    """Seed list with raw-URL variance (FIXTURES.md §2)."""
    sites = []
    for h in range(min(cfg.hosts, 3)):
        host = _host_name(cfg, h)
        raw = [f"https://{host}", f"{host}/", f"http://{host}"][h % 3]
        sites.append(
            {"siteid": h + 1, "custid": 100 + h, "url": raw, "enabled": True}
        )
    sites.append(
        {
            "siteid": 99,
            "custid": 199,
            "url": f"https://disabled.{cfg.domain_suffix}",
            "enabled": False,
        }
    )
    return pd.DataFrame(sites)


def generate_robots(cfg: WebGraphConfig) -> pd.DataFrame:
    """RFC 9309-style rules (FIXTURES.md §7); engine-only (no reference
    counterpart — SURVEY.md §7 phase 8)."""
    rows = []
    for h in range(cfg.hosts):
        host = _host_name(cfg, h)
        rows.append(
            {"host": host, "user_agent": "*", "rule_type": "disallow",
             "path_prefix": "/private/", "crawl_delay_ms": None}
        )
        rows.append(
            {"host": host, "user_agent": "*", "rule_type": "allow",
             "path_prefix": "/private/public/", "crawl_delay_ms": None}
        )
        if h % 2 == 0:
            rows.append(
                {"host": host, "user_agent": "*", "rule_type": "allow",
                 "path_prefix": "/", "crawl_delay_ms": 100 * (h + 1)}
            )
    return pd.DataFrame(rows)


def generate_admitted_edges(cfg: WebGraphConfig) -> pd.DataFrame:
    """Admitted (post-classification) outlink edges of the synthetic
    web, in document order: (src, dst, ord) with ord = 1-based position
    among the page's ADMITTED links.

    Derived from the generator's structural knowledge — children
    (2j+1, 2j+2), cross ((7j+3) % n), home, and the www variant — NOT
    from parsing HTML, so a BFS oracle built on it is independent of
    the engine's extraction pipeline (blocked links never enter the
    frontier; their in-document positions only shift link_idx values,
    which leaves relative order per parent — the only thing BFS
    priority uses — unchanged).

    Only valid for graphs without fetch-failure pages (every page must
    parse): requires pages_per_host * skew <= 20 (see _page_row). The
    SPA page (j == 3) contributes the same edges via rendered_html.
    Mirror pages (www alias of host 0) share the original page's HTML,
    so their ABSOLUTE child hrefs (c %% 3 == 1 form) point back at the
    bare host while relative ones stay on www.
    """
    rows: list[dict] = []

    def page_edges(fetch_host: str, build_host: str, j: int, n: int) -> None:
        src = _page_url(fetch_host, j)
        ord_ = 0

        def emit(dst: str) -> None:
            nonlocal ord_
            ord_ += 1
            rows.append({"src": src, "dst": dst, "ord": ord_})

        for c in (2 * j + 1, 2 * j + 2):
            if c >= n:
                continue
            if c % 5 == 0 and c != 0:
                tgt = fetch_host  # "/pc/" → relative, trailing slash
            elif c % 3 == 1:
                tgt = build_host  # absolute URL baked with the build host
            else:
                tgt = fetch_host  # "/pc" absolute-path or "pc" relative
            emit(_page_url(tgt, c))
        emit(_page_url(fetch_host, (7 * j + 3) % n))  # cross link
        emit(_page_url(fetch_host, 0))  # home link
        if cfg.www_alias_host0 and build_host.startswith("host0.") and j == 1:
            emit(_page_url(f"www.{build_host}", 2))

    for h in range(cfg.hosts):
        host = _host_name(cfg, h)
        n = cfg.pages_per_host * (cfg.skew if h == 0 else 1)
        if n > 20:
            raise ValueError(
                "admitted-edge generation requires a failure-free graph "
                "(pages_per_host * skew <= 20)"
            )
        for j in range(n):
            page_edges(host, host, j, n)
        if h == 0 and cfg.www_alias_host0:
            for j in range(n):
                page_edges(f"www.{host}", host, j, n)
    return pd.DataFrame(rows)


def generate_expected_doc_stats(cfg: WebGraphConfig) -> pd.DataFrame:
    """Structural per-page span-count expectations, derived from the
    ``_build_html`` TEMPLATE (not by running the engine's parser):

    With nc = |{2j+1, 2j+2} ∩ [0, n)| children and www = 1 iff the page
    is the j==1 page of the host-0 family (it carries the extra
    www-variant link):

    - text  spans: title + h1 + intro + 3 per child + cross-trailer +
      dup-home-trailer + anchor-only text (fragment hrefs carry no
      link target, their label is plain text) + closing paragraph
      = 7 + 3*nc
    - link  spans: nc children + cross + home + the 12 blocked/filtered
      anchors that still have a non-fragment target + www
      = 14 + nc + www
    - media spans: favicon + one img per child = 1 + nc
    - style/script: 1 each (head stylesheet, head script)

    The SPA page (j == 3) is parsed from rendered_html — the same built
    template — so the formulas hold for it too. Only valid for
    failure-free graphs (pages_per_host * skew <= 20), like
    ``generate_admitted_edges``.

    ``doc_id`` uses the pure-Python canonical-id parity oracle keyed
    against the site seed (www-alias pages share the bare host's
    doc_id, matching the engine's canonical_id(url_key, seed_url)), so
    a DuckDB documents oracle can join these rows to the BFS visited
    set and aggregate per doc_id without touching the engine.
    """
    from web_crawler_spark.oracle.semantics import canonical_id

    rows: list[dict] = []

    def page_stats(fetch_host: str, build_host: str, siteid: int, j: int,
                   n: int) -> None:
        nc = sum(1 for c in (2 * j + 1, 2 * j + 2) if c < n)
        www = int(
            cfg.www_alias_host0 and build_host.startswith("host0.") and j == 1
        )
        n_text = 7 + 3 * nc
        n_link = 14 + nc + www
        n_media = 1 + nc
        seed = f"https://{_host_name(cfg, siteid - 1)}"
        rows.append(
            {
                "url_key": _page_url(fetch_host, j),
                "doc_id": canonical_id(_page_url(fetch_host, j), seed),
                "siteid": siteid,
                "n_spans": n_text + n_link + n_media + 2,
                "n_text_spans": n_text,
                "n_link_spans": n_link,
                "n_media_spans": n_media,
            }
        )

    for h in range(cfg.hosts):
        host = _host_name(cfg, h)
        n = cfg.pages_per_host * (cfg.skew if h == 0 else 1)
        if n > 20:
            raise ValueError(
                "doc-stat generation requires a failure-free graph "
                "(pages_per_host * skew <= 20)"
            )
        for j in range(n):
            page_stats(host, host, h + 1, j, n)
        if h == 0 and cfg.www_alias_host0:
            for j in range(n):
                page_stats(f"www.{host}", host, 1, j, n)
    return pd.DataFrame(rows)


def generate_blocked_expectations(cfg: WebGraphConfig) -> pd.DataFrame:
    """Structural (src_url, url, block_type) expectations for the
    block-report oracle, derived from the ``_build_html`` TEMPLATE —
    not by running the engine's parser or classifier.

    Every parsed page carries exactly one link per block rule (plus a
    second STATIC for the stylesheet link): the template's blocked
    anchors resolve against the page's FETCH host, and the rule labels
    here restate the reference's worker.py:30-35,52-66 rule order
    (static extension beats ASSET_DIRECTORY for logo.png/style.css;
    the Elementor query mark fires on the page's own path). Anchors
    the engine never turns into candidates (fragment-only, mailto/tel/
    javascript schemes, off-registrable-host) are deliberately absent.
    A DuckDB oracle joins these rows to the BFS visited set, making it
    independent of the Spark parse → outlink → classify pipeline.

    Only valid for failure-free graphs (pages_per_host * skew <= 20),
    like ``generate_admitted_edges``; the SPA page (j == 3) contributes
    the same rows via rendered_html.
    """
    rows: list[dict] = []

    def page_blocked(fetch_host: str, j: int) -> None:
        src = _page_url(fetch_host, j)
        base = f"https://{fetch_host}"
        for url, block_type in (
            (f"{base}/assets/logo.png", "STATIC"),
            (f"{base}/theme/style.css", "STATIC"),
            (f"{base}{_path(j)}?e-page-1a2b=3", "BLOG_EPAGE"),
            (f"{base}/tag/news", "TAG_PAGE"),
            (f"{base}/author/admin", "AUTHOR_PAGE"),
            (f"{base}/page/2/", "PAGINATION"),
            (f"{base}/static/docs/readme", "ASSET_DIRECTORY"),
        ):
            rows.append({"src_url": src, "url": url, "block_type": block_type})

    for h in range(cfg.hosts):
        host = _host_name(cfg, h)
        n = cfg.pages_per_host * (cfg.skew if h == 0 else 1)
        if n > 20:
            raise ValueError(
                "blocked-expectation generation requires a failure-free "
                "graph (pages_per_host * skew <= 20)"
            )
        for j in range(n):
            page_blocked(host, j)
        if h == 0 and cfg.www_alias_host0:
            for j in range(n):
                page_blocked(f"www.{host}", j)
    return pd.DataFrame(rows)


def generate_seed_keys(cfg: WebGraphConfig) -> pd.DataFrame:
    """(siteid, url_key) for the enabled seeds, normalized exactly as
    the engine's seed preparation normalizes them."""
    sites = generate_sites(cfg)
    sites = sites[sites["enabled"]]
    return pd.DataFrame(
        {
            "siteid": sites["siteid"].astype("int64"),
            "url_key": sites["url"].map(normalize_fetch_url),
        }
    )


def pages_as_oracle_dict(pages: pd.DataFrame) -> dict[str, SyntheticPage]:
    """Index the pages table for the pure-Python BFS oracle."""
    out: dict[str, SyntheticPage] = {}
    for r in pages.itertuples(index=False):
        out[r.url] = SyntheticPage(
            url=r.url,
            status_code=int(r.status_code),
            content_type=r.content_type,
            html=r.html,
            rendered_html=r.rendered_html,
            first_attempts_429=int(r.first_attempts_429),
        )
    return out
