"""Property-based tests (hypothesis) over the pure-Python kernels that
back the Arrow UDFs — no SparkSession needed, so these fuzz thousands
of cases cheaply."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from web_crawler_spark.operators.cuckoo import CuckooFilter
from web_crawler_spark.oracle.diffs import diff_artifact
from web_crawler_spark.oracle.scoring import defacement_percentage
from web_crawler_spark.oracle.semantics import (
    canonical_id,
    normalize_fetch_url,
)

url_chars = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters=":/.?#&=-_~%"
    ),
    min_size=1,
    max_size=60,
)


@given(url_chars)
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent(raw):
    try:
        once = normalize_fetch_url(raw)
    except Exception:
        return  # unparseable garbage may raise; vectorized path nulls it
    assert normalize_fetch_url(once) == once


def test_normalize_allslash_divergence_pinned():
    """DOCUMENTED DIVERGENCE (oracle/semantics.py:92-99, README): for the
    degenerate all-slash path the reference normalizer
    (crawler/normalizer.py:71-73) emits 'https://host' — a fixed point
    it never reaches from its own output ('https://host' re-normalizes
    to 'https://host/'). We emit the idempotent form. Any bit-for-bit
    reference-parity check on these inputs flags this intentionally."""
    assert normalize_fetch_url("https://host//") == "https://host/"
    assert normalize_fetch_url("https://host///") == "https://host/"
    # and the chosen form is the fixed point of the function itself
    assert normalize_fetch_url("https://host/") == "https://host/"


@given(url_chars)
@settings(max_examples=300, deadline=None)
def test_canonical_id_stable_under_normalize(raw):
    try:
        once = normalize_fetch_url(raw)
        assert canonical_id(once, once) == canonical_id(
            normalize_fetch_url(once), once
        )
    except Exception:
        return


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1),
        min_size=1,
        max_size=400,
        unique=True,
    )
)
@settings(max_examples=60, deadline=None)
def test_cuckoo_no_false_negatives_property(keys):
    f = CuckooFilter.for_capacity(2 * len(keys) + 64)
    h = np.array(keys, dtype=np.uint64)
    f.add_hashes(h)
    if not f.saturated:
        assert f.contains_hashes(h).all()


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1),
        min_size=2,
        max_size=200,
        unique=True,
    )
)
@settings(max_examples=40, deadline=None)
def test_cuckoo_delete_property(keys):
    f = CuckooFilter.for_capacity(2 * len(keys) + 64)
    h = np.array(keys, dtype=np.uint64)
    f.add_hashes(h)
    if f.saturated:
        return
    half = len(h) // 2
    f.delete_hashes(h[:half])
    # retained keys never lost
    assert f.contains_hashes(h[half:]).all()


html_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@given(html_text, html_text)
@settings(max_examples=120, deadline=None)
def test_score_bounds(a, b):
    s = defacement_percentage(a, b)
    assert 0.0 <= s <= 100.0
    assert defacement_percentage(a, a) == 0.0


@given(html_text)
@settings(max_examples=80, deadline=None)
def test_diff_self_is_unchanged(a):
    art = diff_artifact(a, a)
    assert not art["changed"]
    assert art["tallies"]["add"] == art["tallies"]["del"] == art["tallies"]["mod"] == 0


@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 20)), max_size=30
    )
)
@settings(max_examples=200, deadline=None)
def test_expand_ranges_property(runs):
    """_expand_ranges (the blocked-Jaccard run-expansion primitive) must
    equal the obvious per-run concatenation for arbitrary runs,
    including empty runs and empty input."""
    from web_crawler_spark.operators.dedup import _expand_ranges

    starts = [s for s, _ in runs]
    lengths = [n for _, n in runs]
    got = _expand_ranges(starts, lengths)
    expected = [s + i for s, n in runs for i in range(n)]
    assert got.tolist() == expected
