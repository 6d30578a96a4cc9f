"""A4/P10 blocked-report DuckDB oracle parity.

The driver's correctness gate runs `q_crawl_blocked_report` against
`_blocked_oracle_sql()` (template-derived blocked-link expectations ×
recursive-CTE BFS visited set — independent of the engine's
parse → outlink → classify pipeline). This test is the same comparison
run locally, value-exact.
"""

import duckdb
import pandas as pd


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_blocked_report_matches_duckdb_oracle(spark):
    from web_crawler_spark.queries import _blocked_oracle_sql, q_crawl_blocked_report

    got = _norm(q_crawl_blocked_report(spark, "").toPandas())
    want = _norm(duckdb.connect().execute(_blocked_oracle_sql()).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)
