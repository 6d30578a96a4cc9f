"""End-to-end parity: the Spark batch-round engine must reproduce the
single-worker reference BFS exactly (SURVEY.md §5 (2)-(3)):

- visit ordering (exact sequence of url_keys, per site)
- final URL-seen set
- per-document span sequences (kind, text, media_ref, order)
- block report counts per rule
"""

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
from web_crawler_spark.fixtures.webgraph import (
    WebGraphConfig,
    generate_pages,
    generate_sites,
    pages_as_oracle_dict,
)
from web_crawler_spark.oracle.bfs import crawl_oracle
from web_crawler_spark.oracle.semantics import normalize_fetch_url


@pytest.fixture(scope="module")
def graph():
    cfg = WebGraphConfig(hosts=3, pages_per_host=30)
    pages = generate_pages(cfg)
    sites = generate_sites(cfg)
    return cfg, pages, sites


@pytest.fixture(scope="module")
def engine_result(spark, graph, tmp_path_factory):
    _, pages, sites = graph
    state = str(tmp_path_factory.mktemp("crawl_state"))
    eng = CrawlEngine(
        spark,
        spark.createDataFrame(pages),
        spark.createDataFrame(sites),
        config=CrawlConfig(state_dir=state, use_bloom_min_seen=10),  # force bloom
    )
    stats = eng.run()
    return eng, stats


@pytest.fixture(scope="module")
def oracle_results(graph):
    _, pages, sites = graph
    lookup = pages_as_oracle_dict(pages)
    out = {}
    for s in sites.itertuples(index=False):
        if s.enabled:
            out[int(s.siteid)] = crawl_oracle(lookup, normalize_fetch_url(s.url))
    return out


def test_visit_ordering_exact(engine_result, oracle_results):
    eng, _ = engine_result
    visits = (
        eng.visits()
        .orderBy("visit_ord")
        .select("siteid", "url_key", "depth")
        .collect()
    )
    per_site = {}
    for r in visits:
        per_site.setdefault(r["siteid"], []).append((r["url_key"], r["depth"]))
    for siteid, oracle in oracle_results.items():
        expected = [(u, d) for (u, d, _p) in oracle.visit_order]
        assert per_site[siteid] == expected, f"site {siteid} ordering mismatch"


def test_seen_set_exact(engine_result, oracle_results):
    eng, _ = engine_result
    seen = eng.seen_keys().collect()
    per_site = {}
    for r in seen:
        per_site.setdefault(r["siteid"], set()).add(r["url_key"])
    for siteid, oracle in oracle_results.items():
        assert per_site[siteid] == oracle.seen, f"site {siteid} seen-set mismatch"


def test_span_sequence_equality(engine_result, oracle_results):
    eng, _ = engine_result
    docs = eng.documents().collect()
    got = {(r["siteid"], r["doc_id"]): r["spans"] for r in docs}
    total_checked = 0
    for siteid, oracle in oracle_results.items():
        for doc_id, expected in oracle.documents.items():
            spans = got.get((siteid, doc_id))
            assert spans is not None, f"missing doc {doc_id} (site {siteid})"
            seq = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
            exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in expected]
            assert seq == exp, f"span mismatch for {doc_id}"
            total_checked += 1
    assert total_checked > 20
    # no extra docs either
    assert len(got) == sum(len(o.documents) for o in oracle_results.values())


def test_block_report_counts(engine_result, oracle_results):
    eng, _ = engine_result
    report = {
        r["block_type"]: r["count"] for r in eng.blocked_report().collect()
    }
    expected = {}
    for oracle in oracle_results.values():
        for label, urls in oracle.blocked.items():
            expected[label] = expected.get(label, 0) + len(urls)
    assert report == expected


def test_fetch_log_matches(engine_result, oracle_results):
    eng, _ = engine_result
    logs = eng.read_all("fetch_log").collect()
    got = {(r["siteid"], r["url_key"]): (r["status_code"], r["success"], r["error"])
           for r in logs}
    for siteid, oracle in oracle_results.items():
        for entry in oracle.fetch_log:
            g = got[(siteid, entry["url"])]
            assert g[0] == entry["status_code"], (entry["url"], g)
            assert g[1] == entry["success"], entry["url"]
            assert g[2] == entry["error"], (entry["url"], g)


def test_resume_from_checkpoint(spark, graph, tmp_path_factory, oracle_results):
    """Kill after round k, resume, final state identical (SURVEY.md §5 (4))."""
    _, pages, sites = graph
    state = str(tmp_path_factory.mktemp("resume_state"))
    pages_df = spark.createDataFrame(pages)
    sites_df = spark.createDataFrame(sites)
    cfg = CrawlConfig(state_dir=state, max_rounds=2)
    eng = CrawlEngine(spark, pages_df, sites_df, config=cfg)
    stats1 = eng.run()
    assert stats1.rounds == 2
    # resume to completion with a fresh engine object (new bloom, new state)
    cfg2 = CrawlConfig(state_dir=state, max_rounds=10_000)
    eng2 = CrawlEngine(spark, pages_df, sites_df, config=cfg2)
    eng2.resume()
    visits = (
        eng2.visits().orderBy("visit_ord").select("siteid", "url_key").collect()
    )
    per_site = {}
    for r in visits:
        per_site.setdefault(r["siteid"], []).append(r["url_key"])
    for siteid, oracle in oracle_results.items():
        assert per_site[siteid] == [u for (u, _d, _p) in oracle.visit_order]


def test_routing_graph_matches(engine_result, oracle_results):
    """F7: engine discovery edges == oracle first-wins (parent → child)
    pairs from the reference BFS."""
    eng, _ = engine_result
    got = {
        (r["siteid"], r["parent"], r["child"])
        for r in eng.edges().collect()
    }
    want = set()
    for siteid, oracle in oracle_results.items():
        for url, depth, parent in oracle.visit_order:
            if parent is not None:
                want.add((siteid, parent, url))
    assert got == want


def test_resume_prunes_orphan_rounds(spark, graph, tmp_path_factory,
                                     oracle_results):
    """Crash between the round-r+1 state writes and the meta commit
    leaves orphan round dirs; resume must prune them or the orphaned
    seen rows anti-join away the re-run's discoveries and silently
    truncate the crawl."""
    import os
    import shutil as sh

    _, pages, sites = graph
    state = str(tmp_path_factory.mktemp("orphan_state"))
    pages_df = spark.createDataFrame(pages)
    sites_df = spark.createDataFrame(sites)
    eng = CrawlEngine(
        spark, pages_df, sites_df, config=CrawlConfig(state_dir=state,
                                                      max_rounds=2)
    )
    eng.run()
    meta2 = open(os.path.join(state, "_meta.json")).read()
    # advance one more round so the REAL round-3 state dirs exist (the
    # keys round 3 discovers — exactly what a torn run leaves behind)...
    eng_mid = CrawlEngine(
        spark, pages_df, sites_df, config=CrawlConfig(state_dir=state,
                                                      max_rounds=3)
    )
    eng_mid.resume()
    # ...then roll the meta commit back to round 2: round-3 dirs are now
    # orphans of a crash that died before _write_meta
    with open(os.path.join(state, "_meta.json"), "w") as f:
        f.write(meta2)
    # a crash mid-append also leaves a torn trailing metrics line —
    # resume must drop it (it belongs to an uncommitted round), not die
    with open(os.path.join(state, "metrics.jsonl"), "a") as f:
        f.write('{"round": 99, "tru')
    eng2 = CrawlEngine(
        spark, pages_df, sites_df, config=CrawlConfig(state_dir=state)
    )
    eng2.resume()
    import json as _json

    for ln in open(os.path.join(state, "metrics.jsonl")):
        _json.loads(ln)  # every surviving line must parse
    visits = (
        eng2.visits().orderBy("visit_ord").select("siteid", "url_key").collect()
    )
    per_site = {}
    for r in visits:
        per_site.setdefault(r["siteid"], []).append(r["url_key"])
    for siteid, oracle in oracle_results.items():
        assert per_site[siteid] == [u for (u, _d, _p) in oracle.visit_order]


def test_pipelined_equals_ordered_commits(spark, graph, tmp_path_factory):
    """The pipelined commit path (background checkpoint writes +
    ordered committer) must produce byte-identical state tables to the
    fully ordered path on the same deterministic web."""
    _, pages, sites = graph
    pages_df = spark.createDataFrame(pages)
    sites_df = spark.createDataFrame(sites)
    states = {}
    for mode in (True, False):
        state = str(tmp_path_factory.mktemp(f"pipe_{mode}"))
        eng = CrawlEngine(
            spark,
            pages_df,
            sites_df,
            config=CrawlConfig(state_dir=state, pipeline_commits=mode),
        )
        eng.run(fresh=True)
        states[mode] = eng
    for table, cols in [
        ("fetch_log", ["siteid", "url_key", "visit_ord", "depth",
                       "status_code", "success", "error", "round"]),
        ("seen", ["siteid", "url_key", "host_bucket", "first_depth",
                  "round_seen"]),
        ("documents", ["doc_id", "siteid", "visit_ord", "round"]),
        ("blocked", ["siteid", "url", "block_type", "round"]),
        ("frontier", ["siteid", "url_key", "depth", "round"]),
    ]:
        a = (
            states[True].read_all(table).select(*cols).orderBy(*cols)
            .toPandas().reset_index(drop=True)
        )
        b = (
            states[False].read_all(table).select(*cols).orderBy(*cols)
            .toPandas().reset_index(drop=True)
        )
        assert a.equals(b), f"{table} diverged between commit paths"
    # both paths committed the same per-round lineage
    ma = states[True].metrics().select(
        "round", "visited", "new_seen", "documents"
    ).orderBy("round").toPandas().reset_index(drop=True)
    mb = states[False].metrics().select(
        "round", "visited", "new_seen", "documents"
    ).orderBy("round").toPandas().reset_index(drop=True)
    assert ma.equals(mb)
