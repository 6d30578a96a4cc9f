"""Unit parity of the pure-Python scalar kernels vs the reference's
documented behavior (SURVEY.md §2.B/C, FIXTURES.md §9 golden cases)."""

from web_crawler_spark.oracle import semantics as sem


def test_normalize_basics():
    f = sem.normalize_fetch_url
    assert f("example.com") == "https://example.com/"
    assert f("http://example.com") == "https://example.com/"
    assert f("https://Example.COM/Path/") == "https://example.com/Path"
    assert f("https://example.com/") == "https://example.com/"
    assert f("https://example.com/a/b/") == "https://example.com/a/b"
    assert f("https://example.com/a?x=1&y=2") == "https://example.com/a?x=1&y=2"
    assert f("https://example.com/a#frag") == "https://example.com/a"
    assert f("") == ""


def test_normalize_relative_and_preference():
    f = sem.normalize_fetch_url
    assert f("/x", base="https://h.com/a/b") == "https://h.com/x"
    # quirk preserved from the reference (normalizer.py:39-45): the scheme
    # prepend happens BEFORE urljoin, so a bare relative becomes a host.
    # (Link resolution in the engine uses urljoin in the span parser, not
    # this path — parity with parser.py:67.)
    assert f("x", base="https://h.com/a/b") == "https://x/"
    # www preference coercion (normalizer.py:54-68)
    assert (
        f("https://example.com/p", preference_url="https://www.example.com")
        == "https://www.example.com/p"
    )
    assert (
        f("https://www.example.com/p", preference_url="example.com")
        == "https://example.com/p"
    )
    # different registrable host → no coercion
    assert (
        f("https://other.com/p", preference_url="https://www.example.com")
        == "https://other.com/p"
    )


def test_canonical_id():
    g = sem.canonical_id
    assert g("https://example.com") == "example.com"
    assert g("https://example.com/") == "example.com"
    assert g("https://example.com/a/b/") == "example.com/a/b"
    assert g("https://example.com/a?q=1") == "example.com/a?q=1"
    assert g("https://www.example.com/x", "https://example.com") == "example.com/x"
    assert (
        g("https://example.com/x", "https://www.example.com")
        == "www.example.com/x"
    )


def test_storage_url():
    assert sem.storage_url("https://www.h.com/a?q=1") == "h.com/a?q=1"
    assert (
        sem.storage_url("https://www.h.com/a", "https://www.h.com")
        == "www.h.com/a"
    )
    assert sem.storage_url("https://h.com/") == "h.com/"


def test_classify_block_rule_order():
    cb = sem.classify_block
    assert cb("https://e.com/x.css") == "STATIC"
    assert cb("https://e.com/x.PNG") is None  # case-sensitive suffix
    assert cb("https://e.com/assets/a.png") == "STATIC"  # STATIC wins over dir
    assert cb("https://e.com/assets/sub/doc") == "ASSET_DIRECTORY"
    assert cb("https://e.com/tag/x") == "TAG_PAGE"
    assert cb("https://e.com/author/x") == "AUTHOR_PAGE"
    assert cb("https://e.com/page/3/") == "PAGINATION"
    assert cb("https://e.com/blog/page/12") == "PAGINATION"
    assert cb("https://e.com/p?e-page-1a2b=3") == "BLOG_EPAGE"
    assert cb("https://e.com/p?a=1&e-page-ff=2") == "BLOG_EPAGE"
    assert cb("https://e.com/p?e-page-zz=3") is None  # non-hex id
    assert cb("https://e.com/normal") is None


def test_domain_filters():
    assert sem.is_same_site("https://www.e.com/x", "e.com")
    assert sem.is_same_site("https://e.com:443/x", "www.e.com")
    assert not sem.is_same_site("https://sub.e.com/x", "e.com")
    assert not sem.is_same_site("mailto:a@e.com", "e.com")
    assert sem.allowed_domain("https://www.e.com", "https://e.com/x")
    assert sem.allowed_domain("https://e.com", "https://www.e.com/x")
    assert not sem.allowed_domain("https://e.com", "https://sub.e.com/x")


def test_should_enqueue():
    assert sem.should_enqueue("https://e.com")
    assert not sem.should_enqueue("mailto:a@b.c")
    assert not sem.should_enqueue("tel:+1")
    assert not sem.should_enqueue("javascript:void(0)")


def test_classify_url_labels():
    assert sem.classify_url("https://e.com/") == ["normal_html"]
    assert "pagination" in sem.classify_url("https://e.com/page/2")
    assert "assets_uploads" in sem.classify_url("https://e.com/uploads/f")
    assert "assets_uploads" in sem.classify_url("https://e.com/x.pdf")
    assert "scripts_styles" in sem.classify_url("https://e.com/x.js")
    assert "api_like" in sem.classify_url("https://e.com/api/x")
    got = sem.classify_url("https://e.com/assets/x.js")
    assert got == ["assets_uploads", "scripts_styles"]


def test_fetch_admission():
    assert sem.classify_fetch(200, "text/html; charset=utf-8") == (True, None)
    assert sem.classify_fetch(201, "application/json") == (True, None)
    ok, err = sem.classify_fetch(200, "image/png")
    assert not ok and err.startswith("ignored content type")
    ok, err = sem.classify_fetch(404, "text/html")
    assert not ok and err == "http error: 404"


def test_needs_js():
    assert sem.needs_js_rendering('<html><body><div id="root"></div></body></html>')
    assert sem.needs_js_rendering("<html><body><div>x</div></body></html>")
    assert not sem.needs_js_rendering("<html><body><p>hi</p></body></html>")
    assert not sem.needs_js_rendering('<html><body><a href="/">x</a></body></html>')
    assert sem.needs_js_rendering("")


def test_severity_bands():
    assert sem.severity_band(0.0) == "LOW"
    assert sem.severity_band(4.99) == "LOW"
    assert sem.severity_band(5.0) == "MEDIUM"
    assert sem.severity_band(19.99) == "MEDIUM"
    assert sem.severity_band(20.0) == "HIGH"
    assert sem.severity_band(50.0) == "CRITICAL"
