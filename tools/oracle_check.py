"""Local replica of the driver's correctness gate.

Runs every `ORACLES` entry on Spark AND DuckDB at the given sf dir,
canonicalizes both sides the way the driver does (columns sorted by
name, rows sorted, values stringified — so an int64-vs-float64 dtype
skew shows up as the hash mismatch it would be), and reports per-query
rows/schema/hash. Run before every round commit that touches queries
or oracles:

    python tools/oracle_check.py [sf_dir]   # default /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from web_crawler_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("oracle_check", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    fails = []
    for name, sql in oracles.items():
        try:
            g = canon(qs[name](spark, sf).toPandas())
            w = canon(con.execute(sql).df())
            rows, schema = len(g) == len(w), list(g.columns) == list(w.columns)
            ok = rows and schema and g.equals(w)
            if not ok:
                fails.append(name)
            print(
                f"{name}: " + ("OK" if ok else
                f"MISMATCH rows={rows} schema={schema} ({len(g)} vs {len(w)})")
            )
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name}: ERR {str(ex).splitlines()[0][:120]}")
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
