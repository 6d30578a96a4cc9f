"""Plan audit: .explain() the headline queries and assert the physical
properties the design claims — filter/column pushdown to the parquet
scans, broadcast joins for small dims, whole-stage codegen for native
queries, Arrow (not row) Python evaluation where UDFs are required.

Usage: python tools/explain_audit.py          # prints a PASS/FAIL table
       python tools/explain_audit.py -v NAME  # dump one query's plan
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query → (must_contain, must_not_contain) over the formatted plan text
CHECKS: dict[str, tuple[list[str], list[str]]] = {
    # native analytics: codegen, pushdown, no Python anywhere
    "a1_source_summary": (
        # partial (map-side) + final aggregate, no Python
        ["HashAggregate (2)", "HashAggregate (4)"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    "a6_distinct_scan": (
        ["EqualTo(o_orderstatus,O)"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    "o6_topk_per_group": (
        # rank-limit pushed below the exchange (WindowGroupLimit, Spark 3.5+)
        ["Window", "WindowGroupLimit"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    # dim joins must broadcast, filters must reach the scan
    "j2_dim_join": (
        ["BroadcastHashJoin", "LessThan(p_size,10)"],
        ["SortMergeJoin", "BatchEvalPython", "ArrowEvalPython"],
    ),
    "ann_brute_force_topk": (
        ["BroadcastNestedLoopJoin"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    # UDF queries must be Arrow-vectorized, never row-oriented Python.
    # dedup_minhash_lsh's signature stage sits behind a lazy
    # localCheckpoint barrier (GC-released run-once materialization),
    # which truncates the visible plan to a LogicalRDD — so the Arrow
    # property is asserted on the PRE-BARRIER signature plan via the
    # probe below, and the registered query's plan is checked for the
    # forbidden row-eval node only.
    "dedup_minhash_lsh": ([], ["BatchEvalPython"]),
    "minhash_signature_probe": (["ArrowEvalPython"], ["BatchEvalPython"]),
    "lang_id": (["ArrowEvalPython"], ["BatchEvalPython"]),
    # column pruning: hash query reads only the two needed columns
    "h1_content_hashes": (
        ["ReadSchema: struct<doc_id:bigint,text:string>"],
        ["BatchEvalPython", "ArrowEvalPython", "n_chars"],
    ),
    # native admission pipeline / X2 classifier: pure Catalyst, no Python
    "p_admission_pipeline": (
        # partial + final aggregate (SortAggregate: min(url) on strings)
        ["SortAggregate (5)", "SortAggregate (8)"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    "x2_classification_native": (
        ["HashAggregate", "Generate"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    # blocked tile plans: grouped-map Arrow exec, single shuffle on the
    # tiny (ba, bb) tile key, never a row-at-a-time Python eval
    "dedup_embedding": (["FlatMapGroupsInPandas"], ["BatchEvalPython"]),
    "dedup_ngram_jaccard": (["FlatMapGroupsInPandas"], ["BatchEvalPython"]),
    # event-time windows: pure JVM (map-side partial agg -> one
    # exchange on the session key -> sort -> MergingSessions; tumbling
    # = hash agg), zero Python
    "w1_error_sessions": (
        ["MergingSessions"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    "w2_event_windows": (
        ["HashAggregate"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    # curation tier (r5): Arrow-vectorized kernels, no row-eval, no
    # exchange on the per-row shapes; contamination broadcasts the
    # benchmark key set
    "quality_gopher": (["ArrowEvalPython"], ["BatchEvalPython", "Exchange"]),
    "pii_scrub": ([], ["BatchEvalPython", "ArrowEvalPython", "Exchange"]),
    "contamination_ngrams": (
        ["ArrowEvalPython", "BroadcastHashJoin"],
        ["BatchEvalPython"],
    ),
    # packing: one exchange on the shard key, native window, no Python
    "dataset_pack": (
        ["Window"],
        ["BatchEvalPython", "ArrowEvalPython", "rangepartitioning"],
    ),
    # domain cap: rank limit below the exchange, like the dequeue
    "domain_cap": (
        ["WindowGroupLimit"],
        ["BatchEvalPython", "ArrowEvalPython"],
    ),
    # incremental dedup (fixture regime → blocked tiles): grouped-map
    # Arrow exec, never a row-eval or a corpus sort-merge self-join;
    # the scale-path broadcast shape is asserted in test_curation.py
    "dedup_incremental": (
        ["FlatMapGroupsInPandas"],
        ["SortMergeJoin", "BatchEvalPython"],
    ),
    # pagerank: iterative plan truncated per round by localCheckpoint
    # (visible plan = final LogicalRDD scan); assert no row-eval leaked
    "graph_pagerank": ([], ["BatchEvalPython"]),
    # full pipeline composition: Arrow kernel + three window shuffles,
    # no row-eval, no range partitioning
    "curation_pipeline": (
        ["ArrowEvalPython", "Window"],
        ["BatchEvalPython", "rangepartitioning"],
    ),
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    from web_crawler_spark.queries import QUERIES
    from web_crawler_spark.session import get_spark

    spark = get_spark("explain_audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    if len(sys.argv) > 2 and sys.argv[1] == "-v":
        print(plan_text(QUERIES[sys.argv[2]](spark, SF_DIR)))
        return 0

    def minhash_signature_probe(spark, sf_dir):
        # the pre-barrier signature plan of dedup_minhash_lsh (see
        # CHECKS note): same UDF, same input, no checkpoint
        from pyspark.sql import functions as F

        from web_crawler_spark.operators.dedup import make_minhash_udf

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        sig_udf = make_minhash_udf(num_perm=64, shingle_k=5)
        return docs.select(sig_udf(F.col("text")).alias("sig"))

    probes = {"minhash_signature_probe": minhash_signature_probe}

    failures = 0
    for name, (must, must_not) in CHECKS.items():
        fn = probes.get(name) or QUERIES[name]
        text = plan_text(fn(spark, SF_DIR))
        missing = [m for m in must if m not in text]
        present = [m for m in must_not if m in text]
        if missing or present:
            failures += 1
            print(f"FAIL {name}: missing={missing} forbidden-present={present}")
        else:
            print(f"pass {name}")
    spark.stop()
    print("AUDIT", "FAILED" if failures else "OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
