"""r5: loud recall-mirror mismatch (r4 verdict watch item 2).

The recall oracles pre-materialize the approximate side from
$SPARK_GRAFT_SF_DIR (oracle/approx_mirror.py). Before r5, running the
oracle SQL against views registered from a DIFFERENT sf silently
reported recall ~0; the guard CTE now cross-checks an integer corpus
fingerprint (count, id sum, content term) recorded in the mirror's
companion .meta.parquet against the live views and raises via DuckDB
error() on mismatch. No Spark needed — these are pure DuckDB tests.
"""

from __future__ import annotations

import duckdb
import pytest

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def _con(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    return con


def _builders():
    from web_crawler_spark import queries as Q

    return {
        "dedup_minhash_recall": Q._minhash_recall_oracle,
        "dedup_simhash_recall": Q._simhash_recall_oracle,
        "dedup_embedding_lsh_recall": Q._embedding_lsh_recall_oracle,
        "ann_lsh_recall": Q._ann_lsh_recall_oracle,
        "ann_ivf_recall": Q._ann_ivf_recall_oracle,
    }


@pytest.mark.parametrize("tier", sorted(_builders()))
def test_mismatched_mirror_raises(tier, monkeypatch):
    """Oracle SQL built with mirrors from sf0.001 must ERROR against
    views registered from sf0.01 — never report recall 0. The two
    fixture corpora share row counts AND id sums (only content
    differs), so this also pins that the fingerprint includes a
    content term."""
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", SF_A)
    sql = _builders()[tier]()
    con = _con(SF_B)
    with pytest.raises(duckdb.Error, match="recall mirror"):
        con.execute(sql).fetchall()


@pytest.mark.parametrize("tier", sorted(_builders()))
def test_matched_mirror_passes_guard(tier, monkeypatch):
    """Same-sf mirror + views: the guard is a no-op (ok = 1) and the
    recall row comes back with n_exact > 0."""
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", SF_A)
    sql = _builders()[tier]()
    row = _con(SF_A).execute(sql).fetchone()
    assert row[0] == tier and row[1] > 0  # tier, n_exact
