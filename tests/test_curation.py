"""Training-data curation tier (r5): Gopher-style quality filter, PII
scrub, benchmark-contamination check. Value parity vs DuckDB is the
driver oracle's job (quality_gopher / pii_scrub / contamination_ngrams
rows in CORRECTNESS); here we pin the plan shapes the 100 TB design
depends on (no exchange on the per-row filters, broadcast on the
benchmark key set) and the kernel semantics on crafted edge cases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.functions.text import (
    GOPHER_STOPWORDS,
    gopher_stats_udf,
    make_gram_key_udf,
    pii_scrub_col,
    word_ngrams_col,
    words_col,
)
from web_crawler_spark.queries import (
    DOMAIN_CAP_K,
    q_contamination_ngrams,
    q_dataset_pack,
    q_domain_cap,
    q_pii_scrub,
    q_quality_gopher,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------


def test_quality_gopher_plan_has_no_exchange(spark):
    """The filter is a pure projection: scan → project, no shuffle at
    any corpus size."""
    plan = q_quality_gopher(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pii_scrub_plan_has_no_exchange(spark):
    plan = q_pii_scrub(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_contamination_broadcasts_benchmark_side(spark):
    """The benchmark gram-key set must broadcast: the corpus (100 TB)
    side then joins map-side without shuffling."""
    plan = (
        q_contamination_ngrams(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# n-gram window semantics
# ---------------------------------------------------------------------------


def test_word_ngrams_windows_and_short_doc(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("solo",)], ["text"]
    ).select(word_ngrams_col(words_col(F.col("text")), 3).alias("g"))
    got = [r["g"] for r in df.collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == [] and got[2] == []


# ---------------------------------------------------------------------------
# vectorized kernels ≡ native column formulation (the UDFs exist purely
# for speed — Catalyst interprets higher-order lambdas; semantics must
# be indistinguishable from the declarative version)
# ---------------------------------------------------------------------------


def test_gopher_stats_udf_matches_native(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    w = words_col(F.col("text"))
    g2, g5 = word_ngrams_col(w, 2), word_ngrams_col(w, 5)
    native = docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.aggregate(
            F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        ).cast("long").alias("chars"),
        F.size(F.filter(w, lambda x: x.isin(*GOPHER_STOPWORDS))).cast("long").alias("n_stop"),
        F.size(g2).cast("long").alias("g2"),
        F.size(F.array_distinct(g2)).cast("long").alias("g2u"),
        F.size(g5).cast("long").alias("g5"),
        F.size(F.array_distinct(g5)).cast("long").alias("g5u"),
    )
    stats = gopher_stats_udf()
    vec = docs.select("doc_id", stats(F.col("text")).alias("s")).select(
        "doc_id",
        F.col("s.n_words").cast("long").alias("n_words"),
        "s.chars", "s.n_stop", "s.g2", "s.g2u", "s.g5", "s.g5u",
    )
    got_n = {r["doc_id"]: r.asDict() for r in native.collect()}
    got_v = {r["doc_id"]: r.asDict() for r in vec.collect()}
    assert got_n == got_v


def test_gram_key_udf_matches_native(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    native = docs.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(
                F.transform(
                    word_ngrams_col(words_col(F.col("text")), 8),
                    lambda g: F.substring(F.md5(g), 1, 16),
                )
            )
        ).alias("k"),
    )
    keys = make_gram_key_udf(n=8, prefix=16)
    vec = docs.select("doc_id", F.array_sort(keys(F.col("text"))).alias("k"))
    got_n = {r["doc_id"]: r["k"] for r in native.collect()}
    got_v = {r["doc_id"]: r["k"] for r in vec.collect()}
    assert got_n == got_v


# ---------------------------------------------------------------------------
# PII scrub kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,expected",
    [
        (
            "reach john.doe+x@mail.example.co or 192.168.0.1 or +44-123-4567",
            "reach <EMAIL> or <IP> or <PHONE>",
        ),
        ("a@b.co", "<EMAIL>"),
        # two of a kind both replaced (replace-all, not replace-first)
        ("x@y.io then z@w.ai", "<EMAIL> then <EMAIL>"),
        # \b is only a word boundary: inside a 5-octet run the matcher
        # still finds a 4-octet window starting past the first dot —
        # pinned here so the DuckDB RE2 mirror provably agrees
        ("v1.2.3.4.5 run", "v1.<IP> run"),
        # order: the email eats its dotted domain before the IP pass
        ("u@10.0.0.1ab.com x", "<EMAIL> x"),
        ("no pii here", "no pii here"),
    ],
)
def test_pii_scrub_cases(spark, raw, expected):
    out = (
        spark.createDataFrame([(raw,)], ["t"])
        .select(pii_scrub_col(F.col("t")).alias("s"))
        .head()["s"]
    )
    assert out == expected


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_dataset_pack_single_exchange(spark):
    """Packing is one shuffle on the shard key + a shard-local window;
    any second exchange would mean a global sort leaked in."""
    plan = q_dataset_pack(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan


def test_dataset_pack_block_geometry(spark, tmp_path):
    """Crafted shard: 300+300+20 tokens at block=512 → doc 8 spans
    blocks 0-1, doc 16 sits inside block 1; offsets are cumulative in
    doc_id order."""
    rows = [
        (0, " ".join(["w"] * 300), "en", "s", 0),
        (8, " ".join(["w"] * 300), "en", "s", 0),   # same shard (mod 8)
        (16, " ".join(["w"] * 20), "en", "s", 0),
        (3, " ".join(["w"] * 700), "en", "s", 0),   # another shard
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (
            r["start_offset"], r["block_first"], r["block_last"], r["n_blocks"]
        )
        for r in q_dataset_pack(spark, str(tmp_path)).collect()
    }
    assert got[0] == (0, 0, 0, 1)
    assert got[8] == (300, 0, 1, 2)       # crosses the 512 boundary
    assert got[16] == (600, 1, 1, 1)
    assert got[3] == (0, 0, 1, 2)         # 700 tokens spans two blocks


# ---------------------------------------------------------------------------
# incremental dedup (batch vs index)
# ---------------------------------------------------------------------------


def test_dedup_incremental_scale_path_broadcasts_batch(spark):
    """The scale-path operator must broadcast the batch/candidate side
    in both joins; the corpus side must never reach a sort-merge
    self-join."""
    from pyspark.sql import functions as F

    from web_crawler_spark.operators.dedup import ngram_jaccard_join

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        ngram_jaccard_join(
            d.filter(F.col("doc_id") % 5 == 0),
            d.filter(F.col("doc_id") % 5 != 0),
            "doc_id", "text", n=2, threshold=0.2,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_dedup_incremental_plans_agree(spark):
    """Scale path (broadcast gram join) ≡ fixture path (blocked tiles
    + straddle filter) on the real corpus — same pairs, same jaccard."""
    from pyspark.sql import functions as F

    from web_crawler_spark.operators.dedup import ngram_jaccard_join
    from web_crawler_spark.queries import q_dedup_incremental

    d = spark.read.parquet(f"{SF}/documents.parquet")
    scale = {
        (r["id_new"], r["id_index"]): r["jaccard"]
        for r in ngram_jaccard_join(
            d.filter(F.col("doc_id") % 5 == 0),
            d.filter(F.col("doc_id") % 5 != 0),
            "doc_id", "text", n=2, threshold=0.2,
        ).collect()
    }
    fixture = {
        (r["id_new"], r["id_index"]): r["jaccard"]
        for r in q_dedup_incremental(spark, SF).collect()
    }
    assert scale == fixture


def test_dedup_incremental_matches_two_sided_ground_truth(spark, tmp_path):
    """Crafted corpus: batch doc 0 duplicates index doc 1 (J=1.0),
    overlaps doc 2 partially, and is disjoint from doc 3; batch pairs
    never pair with other batch docs."""
    from web_crawler_spark.queries import q_dedup_incremental

    t = "a b c d e f"
    rows = [
        (0, t, "en", "s", 0),                 # batch (mod 5)
        (5, "x y z q r s", "en", "s", 0),     # batch, disjoint
        (1, t, "en", "s", 0),                 # index, exact dup of 0
        (2, "a b c d zz qq", "en", "s", 0),   # index, partial overlap
        (3, "p q r s t u", "en", "s", 0),     # index, disjoint
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["id_new"], r["id_index"]): r["jaccard"]
        for r in q_dedup_incremental(spark, str(tmp_path)).collect()
    }
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == pytest.approx(3 / 7, abs=1e-4)  # {ab,bc,cd} / 7
    assert (0, 3) not in got and (5, 0) not in got and (0, 5) not in got


def test_domain_cap_pushes_rank_limit_below_exchange(spark):
    """The per-domain cap must compile to WindowGroupLimit (map-side
    rank limit): only ≤K rows per domain reach the shuffle."""
    plan = q_domain_cap(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_domain_cap_binds_and_is_deterministic(spark):
    out = q_domain_cap(spark, SF)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n <= DOMAIN_CAP_K for n in per.values())
    assert max(per.values()) == DOMAIN_CAP_K  # the cap actually binds
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in q_domain_cap(spark, SF).collect())
    assert a == b


# ---------------------------------------------------------------------------
# contamination semantics on a crafted corpus
# ---------------------------------------------------------------------------


def test_contamination_counts_crafted(spark, tmp_path):
    """doc 0 (bench, doc_id%7==0) shares its 8-gram window with doc 8
    (shifted copy) and not with doc 9; counts are distinct-gram hits."""
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8"  # 9 words → two 8-grams
    rows = [
        (0, base, "en", "s", len(base)),
        (8, "zz " + base, "en", "s", len(base) + 3),  # shares both 8-grams
        (9, "q0 q1 q2 q3 q4 q5 q6 q7", "en", "s", 20),  # disjoint
        (10, "short doc", "en", "s", 9),  # < 8 words → zero grams
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = str(tmp_path / "documents.parquet")
    df.write.parquet(d)
    out = {
        r["doc_id"]: (r["n_contaminated_grams"], r["contaminated"])
        for r in q_contamination_ngrams(spark, str(tmp_path)).collect()
    }
    assert out[8] == (2, True)
    assert out[9] == (0, False)
    assert out[10] == (0, False)
    assert 0 not in out  # benchmark docs are not scored


# ---------------------------------------------------------------------------
# pagerank (canonical selection over the similarity graph)
# ---------------------------------------------------------------------------


def test_pagerank_crafted_path_graph(spark, tmp_path):
    """Path graph a-b-c (a,b share bigrams; b,c share; a,c don't):
    expected ranks computed by the same integer recurrence in pure
    Python — the operator must match exactly at every node."""
    from web_crawler_spark.queries import q_graph_pagerank

    rows = [
        (1, "x y z a1 a2 a3", "en", "s", 0),
        (2, "x y z b1 b2 b3", "en", "s", 0),
        (3, "b1 b2 b3 c1 c2", "en", "s", 0),
        (4, "q1 q2 q3 q4 q5", "en", "s", 0),  # isolated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))

    edges = {1: [2], 2: [1, 3], 3: [2], 4: []}
    deg = {k: len(v) for k, v in edges.items()}
    rank = {k: 1_000_000_000 for k in edges}
    for _ in range(5):
        nxt = {}
        for n in edges:
            s = sum(
                (rank[u] * 85 // 100) // deg[u]
                for u in edges
                if n in edges[u]
            )
            nxt[n] = 150_000_000 + s
        rank = nxt

    got = {
        r["doc_id"]: r["pagerank"]
        for r in q_graph_pagerank(spark, str(tmp_path)).collect()
    }
    assert got == rank
    assert got[4] == 150_000_000  # isolated node keeps only base mass


# ---------------------------------------------------------------------------
# full-pipeline composition
# ---------------------------------------------------------------------------


def test_curation_pipeline_three_shuffles_only(spark):
    """The composed plan shuffles exactly three times — once per window
    key (content_md5 dedup, source cap, (split, shard) pack); the
    per-row quality/scrub/split stages fuse into the scan projection."""
    from web_crawler_spark.queries import q_curation_pipeline

    plan = (
        q_curation_pipeline(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 3
    assert "rangepartitioning" not in plan


def test_curation_pipeline_subset_of_stages(spark):
    """Every pipeline survivor must be a quality keeper, within the
    domain cap, and consistently packed (offsets cumulative per
    (split, shard))."""
    from web_crawler_spark.queries import q_curation_pipeline, q_quality_gopher

    out = q_curation_pipeline(spark, SF).collect()
    keep = {r["doc_id"] for r in q_quality_gopher(spark, SF).collect() if r["keep"]}
    assert {r["doc_id"] for r in out} <= keep
    per_source = {}
    for r in out:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    assert all(n <= 15 for n in per_source.values())
    groups = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        k = (r["split"], r["doc_id"] % 8)
        assert r["start_offset"] == groups.get(k, 0)
        groups[k] = r["start_offset"] + r["n_words"]
