"""Span extraction: document-order interleaving, anchor text, admission
of outlinks, SPA detection, and Spark UDF ≡ oracle kernel equality."""

from pyspark.sql import functions as F

from web_crawler_spark.functions.html import extract_spans_udf, outlink_spans_col
from web_crawler_spark.functions.urls import registrable_host_col
from web_crawler_spark.oracle.htmlspans import (
    extract_spans,
    normalize_html,
    outlinks,
    semantic_lines,
)

BASE = "https://h.com/a"

HTML = """<!DOCTYPE html>
<html><head><title>T</title>
<link rel="stylesheet" href="/s.css"><link rel="icon" href="/f.ico">
<script src="/app.js"></script>
<script>var inline = "<a href='/fake'>nope</a>";</script>
</head><body>
<h1>Head line</h1>
<p>before <a href="/x#frag">anchor text</a> middle <img src="i.png"> after</p>
<a href="#top">skipme</a>
<a href="mailto:a@b.c">mail</a>
<a href="https://other.com/z">offsite</a>
<a href="https://www.h.com/y">www ok</a>
<style>.x { color: red }</style>
<noscript>no script text</noscript>
tail text
</body></html>"""


def test_span_sequence():
    spans = extract_spans(HTML, BASE)
    seq = [(s["kind"], s["text"], s["media_ref"]) for s in spans]
    assert seq == [
        ("text", "T", None),
        ("style", None, "https://h.com/s.css"),
        ("media", None, "https://h.com/f.ico"),
        ("script", None, "https://h.com/app.js"),
        ("text", "Head line", None),
        ("text", "before", None),
        ("link", "anchor text", "https://h.com/x"),
        ("text", "middle", None),
        ("media", None, "https://h.com/i.png"),
        ("text", "after", None),
        # fragment-only anchors emit no link span (P1, parser.py:64-66);
        # their inner text remains ordinary document text
        ("text", "skipme", None),
        ("link", "mail", "mailto:a@b.c"),
        ("link", "offsite", "https://other.com/z"),
        ("link", "www ok", "https://www.h.com/y"),
        ("text", "tail text", None),
    ]
    assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_outlinks_admission_and_order():
    spans = extract_spans(HTML, BASE)
    # same-site + http(s) only; fragment-only and mailto dropped; doc order
    assert outlinks(spans, BASE) == ["https://h.com/x", "https://www.h.com/y"]


def test_duplicate_links_preserved():
    html = '<a href="/x">1</a><a href="/x">2</a><a href="/y">3</a>'
    assert outlinks(extract_spans(html, BASE), BASE) == [
        "https://h.com/x",
        "https://h.com/x",
        "https://h.com/y",
    ]


def test_semantic_lines_shape():
    html = '<div class="a  b"><p>x  y</p></div>'
    assert semantic_lines(html) == [
        '<div class="a b">',
        "  <p>",
        "    x y",
        "  </p>",
        "</div>",
    ]


def test_normalize_html_drops_noise():
    html = "<div><script>x</script><style>y</style><noscript>z</noscript><p>keep</p></div>"
    n = normalize_html(html)
    assert "keep" in n
    for word in ("script", "style", "x", "y", "z"):
        assert word not in n


def test_normalize_html_whitespace_stable():
    a = "<div>\n  <p>hello   world</p>\n</div>"
    b = "<div><p>hello world</p></div>"
    assert normalize_html(a) == normalize_html(b)


def test_spark_udf_equals_kernel(spark):
    rows = [(HTML, BASE), ("", BASE), (None, BASE),
            ('<a href="/x">d</a><a href="/x">d2</a>', BASE)]
    df = spark.createDataFrame(rows, "html string, base string")
    out = df.select(
        extract_spans_udf("html", "base").alias("spans"),
        outlink_spans_col(
            extract_spans_udf("html", "base"), registrable_host_col(F.col("base"))
        ).alias("links"),
        "html", "base",
    ).collect()
    for r in out:
        expected = extract_spans(r["html"] or "", r["base"])
        got = [s.asDict() for s in r["spans"]]
        assert got == expected
        exp_links = outlinks(expected, r["base"])
        assert [s["media_ref"] for s in r["links"]] == exp_links


def test_expected_doc_stats_match_parser():
    """The crawl_documents oracle's template-derived span-count
    formulas (fixtures.webgraph.generate_expected_doc_stats) must agree
    with the real parser on every fixture page, including the SPA
    page's rendered_html path and the www-alias mirror."""
    from collections import Counter

    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_expected_doc_stats,
        generate_pages,
    )

    for cfg in (
        WebGraphConfig(hosts=2, pages_per_host=12, seed=42),
        WebGraphConfig(hosts=3, pages_per_host=18, seed=7),
    ):
        pages = generate_pages(cfg)
        exp = generate_expected_doc_stats(cfg).set_index("url_key")
        assert len(exp) == len(pages)
        for r in pages.itertuples(index=False):
            html = r.rendered_html if r.rendered_html else r.html
            spans = extract_spans(html, r.url)
            kinds = Counter(s["kind"] for s in spans)
            e = exp.loc[r.url]
            assert (len(spans), kinds["text"], kinds["link"], kinds["media"]) == (
                e.n_spans, e.n_text_spans, e.n_link_spans, e.n_media_spans,
            ), r.url
