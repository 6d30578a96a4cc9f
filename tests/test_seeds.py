"""U4 seed resolution parity (reference main.py:44-74): the Spark
operator must match a direct Python port of resolve_seed_url for every
raw-URL shape against a fixture probe table."""

import pandas as pd

from web_crawler_spark.operators.seeds import resolve_seed_urls


def _oracle_resolve(raw_url: str, probes: dict[str, tuple[int, str]]) -> str:
    """Line-by-line port of main.py:44-74 against a probe dict
    {probe_url: (status, final_url)}; missing key = connection error."""
    raw = raw_url.strip()
    candidates = (
        [raw.rstrip("/"), raw] if raw.endswith("/") else [raw, raw + "/"]
    )
    for u in candidates:
        probe = u if u.startswith(("http://", "https://")) else "https://" + u
        if probe in probes:
            status, final = probes[probe]
            if status < 400:
                return final
    if not raw.startswith(("http://", "https://")):
        raw = "https://" + raw
    return raw


RAWS = [
    "https://a.test",            # bare, probe ok
    "https://a.test/",           # trailing slash → stripped first
    "b.test",                    # scheme-less
    "b.test/",                   # scheme-less + slash
    "https://redirect.test",     # 301 → final url differs
    "https://dead.test",         # 500 on first, ok on slash variant
    "https://gone.test",         # all probes fail → fallback raw
    "offline.test",              # no probe rows at all → https fallback
    "https://c.test//",          # multiple trailing slashes
]

PROBES = {
    "https://a.test": (200, "https://a.test/"),
    "https://b.test": (200, "https://b.test/home"),
    "https://redirect.test": (200, "https://www.redirect.test/"),
    "https://dead.test": (500, "https://dead.test/"),
    "https://dead.test/": (200, "https://dead.test/ok"),
    "https://gone.test": (404, "https://gone.test/"),
    "https://gone.test/": (503, "https://gone.test/"),
    "https://c.test": (200, "https://c.test/root"),
}


def test_resolve_matches_reference_port(spark):
    sites = spark.createDataFrame(
        pd.DataFrame({"siteid": range(1, len(RAWS) + 1), "url": RAWS})
    )
    probes = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": list(PROBES),
                "status": [s for s, _ in PROBES.values()],
                "final_url": [f for _, f in PROBES.values()],
            }
        )
    )
    got = {
        r["url"]: r["resolved_url"]
        for r in resolve_seed_urls(sites, probes).collect()
    }
    for raw in RAWS:
        assert got[raw] == _oracle_resolve(raw, PROBES), raw


def test_engine_uses_probe_resolution(spark, tmp_path):
    """A redirecting seed crawls the redirect TARGET's subtree."""
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    cfg = WebGraphConfig(hosts=2, pages_per_host=6, www_alias_host0=False)
    pages = spark.createDataFrame(generate_pages(cfg))
    sites = generate_sites(cfg)
    # site 1's raw seed now redirects to host1 — its crawl must land on
    # host1's pages (site 2 unchanged)
    probes = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"https://host0.{cfg.domain_suffix}"],
                "status": [200],
                "final_url": [f"https://host1.{cfg.domain_suffix}"],
            }
        )
    )
    eng = CrawlEngine(
        spark,
        pages,
        spark.createDataFrame(sites),
        config=CrawlConfig(state_dir=str(tmp_path / "s")),
        seed_probes=probes,
    )
    eng.run(fresh=True)
    hosts = {
        r["url_key"].split("/")[2]
        for r in eng.visits().filter("siteid = 1").collect()
    }
    assert hosts == {f"host1.{cfg.domain_suffix}"}
