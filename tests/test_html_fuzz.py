"""Malformed-HTML fuzzing of the parse kernel (r5, SURVEY §7's named
hard edge): the real web is broken markup — unclosed tags, misnested
inline elements, stray ``</``, bad entities, markup inside scripts and
comments — and the reference tolerates all of it via its parser
(crawler/parser.py:46-95, bs4 over html.parser). The engine's fixtures
are well-formed by construction, so until r5 the span kernel
(oracle/htmlspans.py) had never been disagreement-tested on broken
markup. Three layers here:

1. hypothesis invariants over `extract_spans` / `semantic_lines` /
   `normalize_html` on generated malformed fragments (pure Python —
   thousands of cases, no Spark);
2. one Spark job pushing a deterministic 300-doc malformed corpus
   through the Arrow-batched `extract_spans_udf`, asserting
   element-wise equality with the pure-Python kernel (the full
   serialization path, not just the kernel);
3. pinned behaviors on hand-crafted malformed cases, including the
   honest divergences (what html.parser does with PHP tags, CDATA,
   unclosed comments) so any future kernel change that moves them
   fails loudly.
"""

from __future__ import annotations

import random
from urllib.parse import urlparse

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from web_crawler_spark.oracle.htmlspans import (
    extract_spans,
    normalize_html,
    outlinks,
    semantic_lines,
)

BASE = "https://h.com/dir/page"

# ---------------------------------------------------------------------------
# malformed-fragment pool: shared by the hypothesis strategy (random
# composition) and the deterministic Spark corpus (seeded composition)
# ---------------------------------------------------------------------------

_TAGS = ["a", "p", "div", "b", "i", "img", "span", "script", "style", "li"]
_HREFS = ["/x", "x.html", "#frag", "", "https://h.com/y", "https://other.com/z",
          "mailto:a@b.c", "//h.com/proto", "?q=1", "/x#mid", "  /pad  "]
_ENTITIES = ["&amp;", "&nosuch;", "&#65;", "&#xZZ;", "&", "&&amp", "&#x3C;a&#x3E;"]
_TEXTS = ["plain", "  spaced   out  ", "<", ">", "a<b", "\x00nul", "ünïcødé", ""]


def _fragments(rng: random.Random) -> str:
    """One random malformed fragment."""
    kind = rng.randrange(12)
    tag = rng.choice(_TAGS)
    href = rng.choice(_HREFS)
    txt = rng.choice(_TEXTS)
    if kind == 0:  # well-formed pair
        return f"<{tag}>{txt}</{tag}>"
    if kind == 1:  # unclosed open
        return f"<{tag}>{txt}"
    if kind == 2:  # stray close
        return f"</{tag}>{txt}"
    if kind == 3:  # anchor (maybe fragment/offsite/misquoted)
        q = rng.choice(['"', "'", ""])
        return f"<a href={q}{href}{q}>{txt}</a>"
    if kind == 4:  # valueless / duplicate attrs
        return rng.choice(["<a href>", f"<a href href='{href}'>", f"<{tag} {tag}>"])
    if kind == 5:  # img / link assets, sometimes self-closed
        return rng.choice(
            [f"<img src='{href}'>", f"<img src={href}/>",
             f"<link rel=stylesheet href='{href}'>",
             f"<link rel=icon href='{href}'/>", f"<script src='{href}'>"]
        )
    if kind == 6:  # markup inside script/style (must NOT emit spans)
        inner = rng.choice(["<a href='/fake'>x</a>", "var a='</div>'", "if(a<b){}"])
        t = rng.choice(["script", "style", "noscript"])
        close = rng.choice([f"</{t}>", ""])  # sometimes unclosed
        return f"<{t}>{inner}{close}"
    if kind == 7:  # comments, sometimes unclosed, with markup inside
        return rng.choice(
            ["<!-- c -->", "<!-- <a href='/in-comment'>x</a> -->", "<!-- unclosed",
             "<!doctype html>", "<![CDATA[ <a href='/c'>x ]]>"]
        )
    if kind == 8:  # entities
        return rng.choice(_ENTITIES)
    if kind == 9:  # truncated / bare brackets
        return rng.choice(["<", "</", "<a", f"<a href='{href}'", "< a>", "<>"])
    if kind == 10:  # misnested inline pair
        t2 = rng.choice(_TAGS)
        return f"<{tag}><{t2}>{txt}</{tag}></{t2}>"
    return txt  # bare text


def make_malformed_doc(seed: int, n_frags: int = 12) -> str:
    rng = random.Random(seed)
    return "".join(_fragments(rng) for _ in range(rng.randint(1, n_frags)))


malformed_html = st.integers(min_value=0, max_value=2**31).map(make_malformed_doc)

VALID_KINDS = {"text", "link", "media", "style", "script"}


# ---------------------------------------------------------------------------
# 1. hypothesis invariants (pure Python)
# ---------------------------------------------------------------------------


@given(malformed_html)
@settings(max_examples=400, deadline=None)
def test_extract_spans_invariants(html):
    spans = extract_spans(html, BASE)
    # deterministic
    assert spans == extract_spans(html, BASE)
    # offsets are exactly 0..n-1 in document order
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    for s in spans:
        assert s["kind"] in VALID_KINDS
        if s["kind"] == "text":
            # non-empty, whitespace-collapsed, never carries a ref
            assert s["text"] and s["text"] == " ".join(s["text"].split())
            assert s["media_ref"] is None
        else:
            # every ref-bearing span resolved absolute + fragment-free
            assert isinstance(s["media_ref"], str)
            assert urlparse(s["media_ref"]).fragment == ""
        if s["kind"] in ("media", "style", "script"):
            assert s["text"] is None


@given(malformed_html)
@settings(max_examples=400, deadline=None)
def test_outlinks_admission_invariants(html):
    spans = extract_spans(html, BASE)
    urls = outlinks(spans, BASE)
    link_refs = [s["media_ref"] for s in spans if s["kind"] == "link"]
    # outlinks ⊆ link spans, document order, duplicates preserved
    it = iter(link_refs)
    assert all(any(u == x for x in it) for u in urls)
    for u in urls:
        p = urlparse(u)
        assert p.scheme in ("http", "https")
        host = p.netloc.split(":")[0].lower()
        assert host.removeprefix("www.") == "h.com"


@given(malformed_html)
@settings(max_examples=300, deadline=None)
def test_semantic_lines_and_normalize_invariants(html):
    lines = semantic_lines(html)
    assert lines == semantic_lines(html)  # deterministic
    for ln in lines:
        indent = len(ln) - len(ln.lstrip(" "))
        assert indent % 2 == 0  # depth-indented by 2-space steps
        assert ln.strip()  # no blank lines
    # the hashing normal form is exactly the noise-dropped line join
    assert normalize_html(html) == "\n".join(semantic_lines(html, drop_noise=True))
    # dropping noise never ADDS lines
    assert len(semantic_lines(html, drop_noise=True)) <= len(lines)


@given(malformed_html)
@settings(max_examples=300, deadline=None)
def test_noise_tags_never_leak_spans(html):
    """Wrapping any document in <script> must produce zero spans — the
    kernel's noise-depth tracking can't be derailed by the malformed
    interior (script content is CDATA-ish to html.parser; only a real
    </script> closes it)."""
    inner = html.replace("</script", "").replace("</SCRIPT", "")
    assert extract_spans(f"<script>{inner}</script>", BASE) == []


# ---------------------------------------------------------------------------
# 2. Arrow path ≡ pure Python on a deterministic malformed corpus
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("spark")
def test_udf_matches_kernel_on_malformed_corpus(spark):
    from pyspark.sql import functions as F

    from web_crawler_spark.functions.html import extract_spans_udf

    docs = [(i, make_malformed_doc(i, n_frags=20), BASE) for i in range(300)]
    df = spark.createDataFrame(docs, "id long, html string, base string")
    got = {
        r["id"]: [row.asDict() for row in r["spans"]]
        for r in df.select(
            "id", extract_spans_udf("html", "base").alias("spans")
        ).collect()
    }
    for i, html, base in docs:
        assert got[i] == extract_spans(html, base), f"doc {i} diverged"


# ---------------------------------------------------------------------------
# 3. pinned malformed behaviors (incl. honest html.parser divergences)
# ---------------------------------------------------------------------------


def _seq(html):
    return [(s["kind"], s["text"], s["media_ref"]) for s in extract_spans(html, BASE)]


def test_pinned_nested_anchors():
    # a second <a> while one is open steals the anchor slot: the outer
    # link keeps text None (html.parser sees two starttags; bs4 nests
    # the same way for find_all purposes — both emit both hrefs)
    assert _seq("<a href='/x'>one <a href='/y'>two</a> tail</a>") == [
        ("link", None, "https://h.com/x"),
        ("link", "two", "https://h.com/y"),
        ("text", "tail", None),
    ]


def test_pinned_unclosed_and_stray_tags():
    assert _seq("</p>stray close") == [("text", "stray close", None)]
    assert _seq("<p>unclosed <b>bold") == [
        ("text", "unclosed", None),
        ("text", "bold", None),
    ]
    # truncated tag: html.parser degrades it to literal text
    assert _seq("<a href='/x'") == [
        ("text", "<", None),
        ("text", "a href='/x'", None),
    ]


def test_pinned_entities():
    # invalid refs pass through literally; valid ones decode
    assert _seq("&nosuch; &#xZZ; &amp; &#65;") == [
        ("text", "&nosuch; &#xZZ; & A", None)
    ]
    # encoded markup decodes to text, NOT to a parsed link
    assert _seq("&#x3C;a href='/e'&#x3E;x&#x3C;/a&#x3E;") == [
        ("text", "<a href='/e'>x</a>", None)
    ]


def test_pinned_markup_inside_script_and_comments():
    assert _seq("<script>var a = '<a href=/x>'</script>") == []
    assert _seq("<style>body{}<a href='/in'>") == []  # unclosed style eats tail
    # DIVERGENCE (documented): an unclosed comment is literal text to
    # html.parser's tolerant scan — bs4 swallows it silently. Pinned so
    # a kernel change that moves this fails loudly.
    assert _seq("<!-- unclosed comment <a href='/z'>") == [
        ("text", "<!-- unclosed comment <a href='/z'>", None)
    ]
    assert _seq("<!-- <a href='/c'>x</a> -->") == []


def test_pinned_href_edge_values():
    # fragment-only anchors never link (parser.py:64-66)
    assert _seq("<a href=#>frag</a>") == [("text", "frag", None)]
    # valueless <a href> ≡ href="" under bs4 (find_all href=True matches
    # it): resolves to the base URL — r5 fuzz found and fixed the
    # html.parser None-value divergence
    assert _seq("<a href>no value</a>") == [
        ("link", "no value", "https://h.com/dir/page")
    ]
    assert _seq("<a href=''>empty</a>") == [
        ("link", "empty", "https://h.com/dir/page")
    ]
    # uppercase tags/attrs normalize; unquoted hrefs parse
    assert _seq("<A HREF='/UP'>caps</A>") == [("link", "caps", "https://h.com/UP")]
    assert _seq("<img src=x.png alt='<a href=/y>'>") == [
        ("media", None, "https://h.com/dir/x.png")
    ]
