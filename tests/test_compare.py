"""COMPARE-mode parity: the DataFrame plan must reproduce the pure
oracle (defacement_percentage, severity bands, script-source set diff)
row-wise, and keep unchanged pages on the no-Python fast path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.engine.compare import (
    build_baselines,
    compare_observations,
    observations_summary,
    observe_pages,
)
from web_crawler_spark.fixtures.webgraph import WebGraphConfig, generate_pages
from web_crawler_spark.oracle.scoring import defacement_percentage, script_sources


def _severity_oracle(score: float) -> str:
    # compare_utils.py:349-356
    if score < 5:
        return "LOW"
    if score < 20:
        return "MEDIUM"
    if score < 50:
        return "HIGH"
    return "CRITICAL"


@pytest.fixture(scope="module")
def compare_case(spark):
    pages = generate_pages(WebGraphConfig(hosts=2, pages_per_host=10))
    pages = pages[pages["content_type"].str.contains("text/html")].copy()
    pages["siteid"] = pages["host"].map(lambda h: 1 if "host0" in h else 2)
    baseline_pdf = pages.copy()

    observed_pdf = pages.copy().reset_index(drop=True)
    mutations = {}
    # page 1: inject an external script (the detector's HIGH-signal case)
    u1 = observed_pdf.loc[1, "url"]
    observed_pdf.loc[1, "html"] = observed_pdf.loc[1, "html"].replace(
        "</body>", '<script src="https://evil.example/x.js"></script></body>'
    )
    mutations[u1] = "script"
    # page 2: replace all paragraph text (big diff)
    u2 = observed_pdf.loc[2, "url"]
    observed_pdf.loc[2, "html"] = "<html><body><h1>DEFACED</h1></body></html>"
    mutations[u2] = "replaced"
    # page 3: whitespace-only change → same semantic hash → unchanged
    u3 = observed_pdf.loc[3, "url"]
    observed_pdf.loc[3, "html"] = observed_pdf.loc[3, "html"].replace(
        "\n", "\n\n"
    )
    mutations[u3] = "whitespace"

    base_df = build_baselines(
        spark.createDataFrame(baseline_pdf).withColumnRenamed("url", "url_key")
    )
    obs_df = observe_pages(
        spark.createDataFrame(observed_pdf).withColumnRenamed("url", "url_key")
    )
    result = compare_observations(obs_df, base_df).toPandas().set_index("url_key")
    return baseline_pdf, observed_pdf, mutations, result


def test_changed_flags(compare_case):
    baseline_pdf, observed_pdf, mutations, result = compare_case
    # Reference parity: the semantic hash is over normalize_html, which
    # strips <script> tags (normalizer.py:138-160) — so a script-only
    # injection does NOT flip `changed`; only the text replacement does.
    changed_urls = {u for u, kind in mutations.items() if kind == "replaced"}
    got_changed = set(result[result["changed"]].index)
    assert got_changed == changed_urls


def test_unchanged_fast_path(compare_case):
    _, _, mutations, result = compare_case
    unchanged = result[~result["changed"]]
    assert (unchanged["defacement_score"] == 0.0).all()
    assert (unchanged["severity"] == "NONE").all()
    assert unchanged["scripts_added"].map(len).eq(0).all()


def test_score_and_severity_parity(compare_case):
    baseline_pdf, observed_pdf, mutations, result = compare_case
    base_by_url = dict(zip(baseline_pdf["url"], baseline_pdf["html"]))
    obs_by_url = dict(zip(observed_pdf["url"], observed_pdf["html"]))
    for u, kind in mutations.items():
        if kind != "replaced":
            continue
        expect = defacement_percentage(base_by_url[u], obs_by_url[u])
        got = result.loc[u, "defacement_score"]
        assert got == pytest.approx(expect), (u, kind)
        assert result.loc[u, "severity"] == _severity_oracle(expect)


def test_script_injection_scan(spark, compare_case):
    """The hash compare is blind to script injection (X4 strips
    scripts); the independent scan (detector.py:50-68 semantics)
    must catch it."""
    from web_crawler_spark.engine.compare import script_injection_scan

    baseline_pdf, observed_pdf, mutations, _ = compare_case
    base_df = build_baselines(
        spark.createDataFrame(baseline_pdf).withColumnRenamed("url", "url_key")
    )
    obs_df = observe_pages(
        spark.createDataFrame(observed_pdf).withColumnRenamed("url", "url_key")
    )
    scan = script_injection_scan(obs_df, base_df).toPandas().set_index("url_key")
    u = next(u for u, k in mutations.items() if k == "script")
    base_html = dict(zip(baseline_pdf["url"], baseline_pdf["html"]))[u]
    obs_html = dict(zip(observed_pdf["url"], observed_pdf["html"]))[u]
    expect_added = sorted(
        set(script_sources(obs_html, u)) - set(script_sources(base_html, u))
    )
    assert sorted(scan.loc[u, "scripts_added"]) == expect_added
    assert "https://evil.example/x.js" in list(scan.loc[u, "scripts_added"])
    assert bool(scan.loc[u, "flagged"])
    # nothing else is flagged
    assert set(scan[scan["flagged"]].index) == {u}


def test_selected_dim_filters(spark, compare_case):
    baseline_pdf, observed_pdf, mutations, _ = compare_case
    base_df = build_baselines(
        spark.createDataFrame(baseline_pdf).withColumnRenamed("url", "url_key")
    )
    obs_df = observe_pages(
        spark.createDataFrame(observed_pdf).withColumnRenamed("url", "url_key")
    )
    one_url = next(u for u, k in mutations.items() if k == "replaced")
    sel = spark.createDataFrame(
        [(1, one_url)], "siteid int, url_key string"
    )
    out = compare_observations(obs_df, base_df, selected=sel).toPandas()
    assert list(out["url_key"]) == [one_url]


def test_summary_rollup(spark, compare_case):
    baseline_pdf, observed_pdf, _, _ = compare_case
    base_df = build_baselines(
        spark.createDataFrame(baseline_pdf).withColumnRenamed("url", "url_key")
    )
    obs_df = observe_pages(
        spark.createDataFrame(observed_pdf).withColumnRenamed("url", "url_key")
    )
    summ = (
        observations_summary(compare_observations(obs_df, base_df))
        .toPandas()
        .set_index("severity")
    )
    assert summ["n_pages"].sum() == len(baseline_pdf)
    assert summ.loc["NONE", "n_changed"] == 0
