"""HTML → interleaved span extraction and deterministic DOM normalization.

This is the engine's parse kernel (SURVEY.md §2.D X1/X4/X5). Built on the
stdlib ``html.parser`` (bs4/lxml are not available in the sandbox); the
behavioral contract mirrors the reference:

- ``extract_spans``    ≡ extract_urls document-order walk
                         (crawler/parser.py:46-95) generalized to the
                         graft's interleaved span model: one pass over the
                         document emits text/link/media/script/style spans
                         with strictly increasing offsets.
- ``outlinks``         ≡ the reference's ``urls`` return value: <a href>
                         targets, pure-fragment anchors skipped
                         (parser.py:64-66), fragment-stripped, resolved
                         against the base (parser.py:67), http/https +
                         same registrable host only (parser.py:97-118),
                         document order, duplicates preserved.
- ``semantic_lines``   ≡ _html_to_semantic_lines (compare_utils.py:14-49):
                         DOM walk, 2-space indent per depth, sorted attrs,
                         whitespace-collapsed text, open+close tag lines.
- ``normalize_html``   ≡ normalize_html (crawler/normalizer.py:138-160):
                         drop script/style/noscript then emit the
                         deterministic normal form. (The reference's exact
                         prettify() byte format is bs4-specific; its
                         semantic_hash module is missing from the repo —
                         SURVEY.md §2.E H2 — so the pinned contract is
                         "deterministic normal form, noise tags dropped",
                         consistent between baseline and observe passes.)

Pure stdlib so the same code runs inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

from web_crawler_spark.oracle.semantics import is_same_site, strip_fragment

# HTML5 void elements (never pushed on the open-element stack)
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_NOISE_TAGS = frozenset({"script", "style", "noscript"})


def _collapse(text: str) -> str:
    return " ".join(text.split())


# ---------------------------------------------------------------------------
# span extraction (single streaming pass, document order)
# ---------------------------------------------------------------------------


class _SpanParser(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base_url = base_url
        self.spans: list[dict] = []
        self._noise_depth = 0  # inside script/style/noscript
        self._anchor: dict | None = None  # currently-open link span
        self._anchor_text: list[str] = []

    # -- helpers ------------------------------------------------------
    def _emit(self, kind: str, text: str | None, media_ref: str | None) -> dict:
        span = {
            "kind": kind,
            "text": text,
            "media_ref": media_ref,
            "offset": len(self.spans),
        }
        self.spans.append(span)
        return span

    def _resolve(self, href: str) -> str:
        return strip_fragment(urljoin(self.base_url, href))

    # -- parser callbacks ----------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag in _NOISE_TAGS:
            self._noise_depth += 1
            if tag == "script" and a.get("src"):
                self._emit("script", None, self._resolve(a["src"]))
            return
        if tag == "a":
            # valueless ``<a href>`` parses as value None in html.parser
            # but as "" under bs4 — the reference's find_all('a',
            # href=True) matches it and resolves "" to the base URL
            # (parser.py:63-69), so mirror that (r5 malformed-HTML fuzz)
            href = "" if ("href" in a and a["href"] is None) else a.get("href")
            if href is not None and not href.strip().startswith("#"):
                self._anchor = self._emit("link", None, self._resolve(href))
                self._anchor_text = []
            return
        if tag == "img" and a.get("src"):
            self._emit("media", None, self._resolve(a["src"]))
            return
        if tag == "link":
            rel_tokens = (a.get("rel") or "").lower().split()
            href = a.get("href")
            if href:
                if "icon" in rel_tokens:
                    self._emit("media", None, self._resolve(href))
                elif "stylesheet" in rel_tokens:
                    self._emit("style", None, self._resolve(href))
            return

    def handle_startendtag(self, tag, attrs):
        if tag in _NOISE_TAGS:
            a = dict(attrs)
            if tag == "script" and a.get("src"):
                self._emit("script", None, self._resolve(a["src"]))
            return
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _NOISE_TAGS:
            self._noise_depth = max(0, self._noise_depth - 1)
            return
        if tag == "a" and self._anchor is not None:
            text = _collapse(" ".join(self._anchor_text))
            self._anchor["text"] = text or None
            self._anchor = None
            self._anchor_text = []

    def handle_data(self, data):
        if self._noise_depth:
            return
        if self._anchor is not None:
            self._anchor_text.append(data)
            return
        text = _collapse(data)
        if text:
            self._emit("text", text, None)


def extract_spans(html: str, base_url: str) -> list[dict]:
    """One document-order pass: text nodes → text spans; <a href> → link
    spans (anchor text attached); <img>/<link rel=icon> → media;
    <link rel=stylesheet> → style; <script src> → script. Offsets are
    0-based and strictly increasing. Pure-fragment anchors are dropped
    (parser.py:64-66); all refs are absolute and fragment-stripped.
    """
    if not html:
        return []
    p = _SpanParser(base_url)
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever parsed; malformed tails must not kill a batch
    return p.spans


def outlinks(spans: list[dict], base_url: str) -> list[str]:
    """Navigational URLs eligible for the frontier, in document order with
    duplicates preserved — exactly the reference's ``extract_urls`` first
    return value (parser.py:61-69 + 97-118)."""
    base_domain = urlparse(base_url).netloc
    return [
        s["media_ref"]
        for s in spans
        if s["kind"] == "link"
        and s["media_ref"]
        and is_same_site(s["media_ref"], base_domain)
    ]


# ---------------------------------------------------------------------------
# DOM tree for deterministic normalization / diff lines
# ---------------------------------------------------------------------------


class _Node:
    __slots__ = ("name", "attrs", "children")

    def __init__(self, name: str, attrs: dict[str, str]):
        self.name = name
        self.attrs = attrs
        self.children: list[object] = []  # _Node | str


class _TreeParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; ignore strays
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].name == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        self._stack[-1].children.append(data)

    def handle_comment(self, data):
        # bs4's walk treats comments as NavigableString → text lines
        self._stack[-1].children.append(data)


def _parse_tree(html: str) -> _Node:
    p = _TreeParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p.root


def _format_attrs(attrs: dict[str, str]) -> str:
    return " ".join(f'{k}="{_collapse(v)}"' for k, v in sorted(attrs.items()))


def semantic_lines(html: str, drop_noise: bool = False) -> list[str]:
    """Whitespace-stable semantic lines of the DOM (compare_utils.py:14-49):
    the diff/scoring normal form. ``drop_noise=True`` removes
    script/style/noscript subtrees first (normalizer.py:148-150)."""
    if not html:
        return []
    lines: list[str] = []

    def walk(node: object, depth: int) -> None:
        indent = "  " * depth
        if isinstance(node, str):
            text = _collapse(node)
            if text:
                lines.append(indent + text)
            return
        assert isinstance(node, _Node)
        if drop_noise and node.name in _NOISE_TAGS:
            return
        attrs = _format_attrs(node.attrs)
        lines.append(indent + f"<{node.name}{(' ' + attrs) if attrs else ''}>")
        for child in node.children:
            walk(child, depth + 1)
        lines.append(indent + f"</{node.name}>")

    for child in _parse_tree(html).children:
        walk(child, 0)
    return lines


def normalize_html(html: str) -> str:
    """Deterministic hashing normal form: noise tags dropped, semantic
    lines joined. Feeds the semantic content hash H2 =
    sha2(normalize_html(html), 256) (SURVEY.md §2.E)."""
    if not html:
        return ""
    return "\n".join(semantic_lines(html, drop_noise=True))
