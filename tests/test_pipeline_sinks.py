"""r4 engine hardening tests:

1. Ordered-path background sinks (`pipeline_sinks`): with a real
   (callback) fetcher — which forces the ordered frontier/seen commit
   path — the fetch_log/documents/blocked sinks, upsert, metrics and
   meta land on the background committer. State must be byte-identical
   to the fully synchronous path and the round critical path must show
   ms_sinks_wait == 0.
2. Pipelined-mode seen-union compaction (`seen_compact_rounds`): on a
   50-round chain crawl the anti-join's in-memory seen frame is
   re-rooted on the durable table every K rounds, so plan depth stays
   bounded (≤ K union legs) with output parity vs the unbounded form.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
from web_crawler_spark.fixtures.webgraph import (
    WebGraphConfig,
    generate_pages,
    generate_sites,
)

TABLES = [
    ("fetch_log", ["siteid", "url_key", "visit_ord", "depth",
                   "status_code", "success", "error", "round"]),
    ("seen", ["siteid", "url_key", "host_bucket", "first_depth",
              "round_seen"]),
    ("documents", ["doc_id", "siteid", "visit_ord", "round"]),
    ("blocked", ["siteid", "url", "block_type", "round"]),
    ("frontier", ["siteid", "url_key", "depth", "round"]),
]


def _table_pdf(eng, table, cols):
    return (
        eng.read_all(table).select(*cols).orderBy(*cols)
        .toPandas().reset_index(drop=True)
    )


def test_ordered_background_sinks_parity(spark, tmp_path_factory):
    """pipeline_sinks=True ≡ False under the http-seam fixture fetcher
    (the production-shaped ordered path), and the backgrounded run's
    committed metrics show zero sink wait on the critical path."""
    from web_crawler_spark.operators.fetch import make_lookup_fetcher

    cfg = WebGraphConfig(hosts=2, pages_per_host=24)
    pages = generate_pages(cfg)
    sites_df = spark.createDataFrame(generate_sites(cfg))
    pages_df = spark.createDataFrame(pages)
    engines = {}
    for mode in (True, False):
        state = str(tmp_path_factory.mktemp(f"sinks_{mode}"))
        eng = CrawlEngine(
            spark,
            pages_df,
            sites_df,
            fetcher=make_lookup_fetcher(pages),
            config=CrawlConfig(state_dir=state, pipeline_sinks=mode),
        )
        stats = eng.run(fresh=True)
        assert stats.total_visits > 0
        engines[mode] = eng
    for table, cols in TABLES:
        a = _table_pdf(engines[True], table, cols)
        b = _table_pdf(engines[False], table, cols)
        assert a.equals(b), f"{table} diverged with background sinks"
    # the backgrounded run never waited on sinks in the round loop
    mpath = os.path.join(engines[True].cfg.state_dir, "metrics.jsonl")
    waits = [json.loads(ln)["ms_sinks_wait"] for ln in open(mpath)]
    assert waits and all(w == 0.0 for w in waits), waits


def test_ordered_background_sinks_with_upserts(spark, tmp_path_factory):
    """Upserts ride the background committer too: pages_current() is
    identical to the synchronous path's."""
    cfg = WebGraphConfig(hosts=2, pages_per_host=12)
    pages_df = spark.createDataFrame(generate_pages(cfg))
    sites_df = spark.createDataFrame(generate_sites(cfg))
    current = {}
    for mode in (True, False):
        state = str(tmp_path_factory.mktemp(f"ups_{mode}"))
        eng = CrawlEngine(
            spark,
            pages_df,
            sites_df,
            config=CrawlConfig(
                state_dir=state, upsert_pages=True, pipeline_sinks=mode
            ),
        )
        eng.run(fresh=True)
        current[mode] = (
            eng.pages_current()
            .select("siteid", "url_key", "visit_ord", "success")
            .orderBy("siteid", "url_key")
            .toPandas()
            .reset_index(drop=True)
        )
    assert current[True].equals(current[False])


def _chain_fixture(n: int):
    """A single-host page chain: root → /p1 → … → /p{n-1} (one URL per
    BFS round ⇒ n crawl rounds)."""
    host = "chain.example.com"
    rows = []
    for j in range(n):
        url = f"https://{host}/" if j == 0 else f"https://{host}/p{j}"
        nxt = f'<a href="/p{j + 1}">next</a>' if j < n - 1 else ""
        rows.append(
            {
                "url": url,
                "host": host,
                "status_code": 200,
                "content_type": "text/html",
                "html": f"<html><body><p>page {j}</p>{nxt}</body></html>",
                "rendered_html": None,
                "first_attempts_429": 0,
                "response_time_ms": 10,
                "fetch_latency_ms": 5,
                "content_length": 40,
            }
        )
    pages = pd.DataFrame(rows)
    sites = pd.DataFrame(
        [{"siteid": 1, "custid": 1, "url": f"https://{host}", "enabled": True}]
    )
    return pages, sites


def test_seen_compaction_bounds_plan_with_parity(spark, tmp_path_factory):
    """50-round chain crawl: with seen_compact_rounds=K the in-memory
    seen frame never exceeds K union legs (constant anti-join plan
    depth for arbitrarily long crawls), and visits/seen are identical
    to the unbounded form."""
    pages, sites = _chain_fixture(50)
    pages_df = spark.createDataFrame(pages)
    sites_df = spark.createDataFrame(sites)
    results = {}
    for k in (8, 0):  # 0 disables compaction (the unbounded r3 form)
        state = str(tmp_path_factory.mktemp(f"compact_{k}"))
        eng = CrawlEngine(
            spark,
            pages_df,
            sites_df,
            config=CrawlConfig(state_dir=state, seen_compact_rounds=k),
        )
        stats = eng.run(fresh=True)
        assert stats.rounds == 50 and stats.total_visits == 50, (
            stats.rounds,
            stats.total_visits,
        )
        legs = eng._seen_union_legs
        if k:
            assert legs <= k, legs
        else:
            # the unbounded chain this test kills: 1 durable root leg
            # + one union leg per round
            assert legs == 51, legs
        results[k] = {
            "visits": eng.visits()
            .orderBy("visit_ord")
            .select("url_key", "visit_ord", "depth")
            .toPandas()
            .reset_index(drop=True),
            "seen": eng.seen_keys()
            .orderBy("siteid", "url_key")
            .toPandas()
            .reset_index(drop=True),
        }
    assert results[8]["visits"].equals(results[0]["visits"])
    assert results[8]["seen"].equals(results[0]["seen"])


@pytest.mark.parametrize("ordered", [False, True])
def test_failed_sink_poisons_later_commits_and_resumes(
    spark, tmp_path_factory, ordered
):
    """Prefix durability under a real fault: a background sink write
    that fails at round 3 must (a) surface as an error from run(),
    (b) leave meta claiming at most round 2 — the poisoned committer
    chain must never write meta for a round whose prefix is not fully
    durable — and (c) leave a state a fresh engine can resume() from
    to the exact uninterrupted-run result (orphan round files pruned,
    rounds >= 3 re-run). Parametrized over the pipelined path (default)
    and the ordered path (forced by the callback fetcher)."""
    from web_crawler_spark.operators.fetch import make_lookup_fetcher

    cfg = WebGraphConfig(hosts=3, pages_per_host=24)
    pages = generate_pages(cfg)
    pages_df = spark.createDataFrame(pages)
    sites_df = spark.createDataFrame(generate_sites(cfg))
    fetcher = make_lookup_fetcher(pages) if ordered else None

    def mk(state):
        return CrawlEngine(
            spark,
            pages_df,
            sites_df,
            fetcher=fetcher,
            config=CrawlConfig(state_dir=state),
        )

    ref_state = str(tmp_path_factory.mktemp(f"poison_ref_{ordered}"))
    ref = mk(ref_state)
    ref_stats = ref.run(fresh=True)
    assert ref_stats.rounds >= 5  # the fault round must be mid-crawl

    state = str(tmp_path_factory.mktemp(f"poison_{ordered}"))
    eng = mk(state)
    orig_write = eng._write
    fired = []

    def flaky_write(df, table, rnd):
        if table == "documents" and rnd == 3 and not fired:
            fired.append(True)
            raise RuntimeError("injected sink failure")
        return orig_write(df, table, rnd)

    eng._write = flaky_write
    with pytest.raises(RuntimeError, match="injected sink failure"):
        eng.run(fresh=True)
    assert fired

    meta = eng._read_meta()
    assert meta is not None and meta["round"] <= 2, meta

    eng2 = mk(state)
    eng2.resume()

    def snap(e):
        return (
            e.visits()
            .orderBy("visit_ord")
            .select("siteid", "url_key", "visit_ord", "depth")
            .toPandas()
            .reset_index(drop=True),
            e.seen_keys()
            .orderBy("siteid", "url_key")
            .toPandas()
            .reset_index(drop=True),
            e.read_all("documents")
            .select("doc_id", "siteid", "visit_ord", "round")
            .orderBy("doc_id", "visit_ord")
            .toPandas()
            .reset_index(drop=True),
        )

    got, want = snap(eng2), snap(ref)
    for g, w, name in zip(got, want, ("visits", "seen", "documents")):
        assert g.equals(w), f"{name} diverged after poisoned-commit resume"


# ---------------------------------------------------------------------------
# r5: kill-resume at the seen-compaction round boundary (the one corner the
# prefix-durability and deferred-backlog tests don't pin). The compaction
# (engine/crawl.py seen_compact_rounds) drains the committer and re-roots the
# in-memory seen frame on the durable table every K rounds — a crash landing
# exactly at that boundary exercises two distinct recovery states:
#   BEFORE the drain: the poisoned round-K commit surfaces *inside* the
#     compaction drain itself; meta must still claim exactly K-1 (the last
#     round whose prefix-chained commit completed).
#   AFTER the drain: round K's commit drained clean, so meta claims exactly
#     K, and the crash in round K+1 resumes from the re-rooted durable table.
# ---------------------------------------------------------------------------


def _chain_engines(spark, tmp_path_factory, tag, compact_k=4):
    pages, sites = _chain_fixture(12)
    pages_df = spark.createDataFrame(pages)
    sites_df = spark.createDataFrame(sites)

    def mk(state):
        return CrawlEngine(
            spark,
            pages_df,
            sites_df,
            config=CrawlConfig(state_dir=state, seen_compact_rounds=compact_k),
        )

    ref = mk(str(tmp_path_factory.mktemp(f"compkill_ref_{tag}")))
    ref_stats = ref.run(fresh=True)
    assert ref_stats.rounds == 12 and ref_stats.total_visits == 12
    return mk, ref


def _chain_snap(eng):
    return (
        eng.visits()
        .orderBy("visit_ord")
        .select("url_key", "visit_ord", "depth", "round")
        .toPandas()
        .reset_index(drop=True),
        eng.seen_keys()
        .orderBy("siteid", "url_key")
        .toPandas()
        .reset_index(drop=True),
    )


@pytest.mark.parametrize("fail_round, committed", [(4, 3), (5, 4)])
def test_crash_at_compaction_boundary_resumes(
    spark, tmp_path_factory, fail_round, committed
):
    """Chain crawl with seen_compact_rounds=4; a sink write fails at the
    compaction round itself (fail_round=4 → the poisoned commit is joined
    BY the compaction drain; meta must claim exactly 3) or the round right
    after it (fail_round=5 → the drain completed, meta must claim exactly
    the compaction round 4). Both resume to the uninterrupted result."""
    mk, ref = _chain_engines(spark, tmp_path_factory, f"f{fail_round}")

    state = str(tmp_path_factory.mktemp(f"compkill_{fail_round}"))
    eng = mk(state)
    orig_write = eng._write
    fired = []

    def flaky_write(df, table, rnd):
        if table == "documents" and rnd == fail_round and not fired:
            fired.append(True)
            raise RuntimeError("injected compaction-boundary failure")
        return orig_write(df, table, rnd)

    eng._write = flaky_write
    with pytest.raises(RuntimeError, match="compaction-boundary"):
        eng.run(fresh=True)
    assert fired

    meta = eng._read_meta()
    # the EXACT committed round pins which side of the drain the crash
    # landed on — not just an upper bound
    assert meta is not None and meta["round"] == committed, meta

    eng2 = mk(state)
    stats = eng2.resume()
    assert stats.rounds == 12 and stats.total_visits == 12
    got, want = _chain_snap(eng2), _chain_snap(ref)
    for g, w, name in zip(got, want, ("visits", "seen")):
        assert g.equals(w), (
            f"{name} diverged after compaction-boundary crash-resume"
        )


def test_midround_crash_with_deferred_backlog_resumes(spark, tmp_path_factory):
    """ADVICE r4: a REAL mid-round crash (not a graceful round-boundary
    stop) while a politeness-deferred backlog is in flight. The frontier
    write fails mid-round on the ordered path, after that round's seen
    snapshot already landed — leaving an orphan seen/round=N dir with no
    matching meta. Resume must prune the orphan (else the anti-join would
    silently drop every URL the re-run rediscovers) and drain the deferred
    backlog to the exact uncapped result."""
    cfg = WebGraphConfig(hosts=2, pages_per_host=10)
    pages_df = spark.createDataFrame(generate_pages(cfg))
    sites_df = spark.createDataFrame(generate_sites(cfg))

    ref = CrawlEngine(
        spark,
        pages_df,
        sites_df,
        config=CrawlConfig(state_dir=str(tmp_path_factory.mktemp("defer_ref"))),
    )
    ref.run(fresh=True)
    want_seen = sorted(r["url_key"] for r in ref.seen_keys().collect())
    want_visited = sorted(
        ref.read_all("fetch_log").toPandas()["url_key"]
    )

    state = str(tmp_path_factory.mktemp("defer_crash"))

    def mk():
        return CrawlEngine(
            spark,
            pages_df,
            sites_df,
            config=CrawlConfig(state_dir=state, max_per_host_round=3),
        )

    eng = mk()
    orig_write = eng._write
    fired = []

    def flaky_write(df, table, rnd):
        # round 4 is the first round whose PREDECESSOR committed with a
        # deferred backlog (binary-tree fanout: round-3 frontier is 5
        # URLs/host against cap 3)
        if table == "frontier" and rnd == 4 and not fired:
            fired.append(True)
            raise RuntimeError("injected mid-round frontier failure")
        return orig_write(df, table, rnd)

    eng._write = flaky_write
    with pytest.raises(RuntimeError, match="mid-round frontier"):
        eng.run(fresh=True)
    assert fired

    meta = eng._read_meta()
    # run()'s finally drains the committer, so meta is settled: rounds
    # 0-3 carried no poison and MUST have committed — exactly 3
    assert meta is not None and meta["round"] == 3, meta
    # premise of the scenario: the last COMMITTED round already deferred
    # rows (the backlog lives only in the durable frontier snapshot), and
    # the crash left an orphan state dir newer than the committed round
    mpath = os.path.join(state, "metrics.jsonl")
    by_round = {json.loads(ln)["round"]: json.loads(ln) for ln in open(mpath)}
    assert by_round[meta["round"]]["deferred"] > 0, by_round
    orphans = [
        d
        for t in os.listdir(state)
        if os.path.isdir(os.path.join(state, t))
        for d in os.listdir(os.path.join(state, t))
        if d.startswith("round=")
        and int(d.split("=", 1)[1]) > meta["round"]
    ]
    assert orphans, "crash did not leave orphan round state to prune"

    eng2 = mk()
    eng2.resume()
    assert (
        sorted(r["url_key"] for r in eng2.seen_keys().collect()) == want_seen
    )
    fl = eng2.read_all("fetch_log").toPandas()
    assert sorted(fl["url_key"]) == want_visited
    fl["host"] = fl["url_key"].str.extract(r"https://([^/]+)")
    assert fl.groupby(["round", "host"]).size().max() <= 3
