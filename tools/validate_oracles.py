"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark and,
where an oracle exists, the matching SQL in DuckDB; compares row count,
column names, and order-insensitive values (columns sorted by name,
rows sorted). Rows-only queries are checked for non-empty stable runs.

Usage: python tools/validate_oracles.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(sorted(v)) if isinstance(v, (list, tuple)) else str(v)
            )
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("decimal") :
            df[c] = df[c].astype(float).round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entrymod
    from web_crawler_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("validate_oracles")
    con = duckdb.connect()
    # pin the session timezone: oracle SQL must not depend on host TZ
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only, {len(sdf)} rows [{dt:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            continue
        try:
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
            )
            print(f"ok    {name}: {len(a)} rows match oracle [{dt:.1f}s]")
        except AssertionError as exc:
            failures.append(name)
            print(f"FAIL  {name}: value mismatch\n{str(exc)[:2000]}")
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
