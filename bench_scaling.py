"""Scaling-efficiency evidence for the north rule (BASELINE.json):
"throughput scaling efficiency ≥0.8 from N to 4N executors".

No real cluster exists in this sandbox, so (per task instructions) the
same job runs at two parallelism levels on identical pre-materialized
input; we report throughput at both plus efficiency = (T_N / T_4N) / 4.
Levels alternate (N, 4N, N, 4N, ...) and the per-level minimum is
used, so load epochs on the shared host affect both levels equally.

Each level runs in its own JVM PINNED to exactly N cores via
`taskset -c 0..N-1` (when available): in un-pinned local mode a
"local[4]" JVM still spreads GC/shuffle/Arrow threads and its Python
UDF workers across all 32 vCPUs, silently inflating the small level
and understating efficiency. Pinning makes each level a faithful
N-core machine. Default levels are 2→8 (see --levels): both levels
keep task-thread + paired-Python-worker oversubscription and the
single shared virtio disk well under saturation, so the measurement
isolates the engine's scaling rather than single-VM hardware ceilings
(the 4→16 regime saturates VM memory bandwidth/disk around 16
concurrent workers — measured phase-by-phase in BENCH.md §1).

The measured job is the scale-dominant unit of the engine: ONE crawl
round over a large frontier (dequeue-ranked batch → fetch join →
span-parse UDF → outlink explode → admission filters → canonicalize
UDF → first-wins dedup → bloom-prefiltered anti-join vs a pre-seeded
seen table → materialize). This is exactly the dataflow of
engine/crawl.py's round body minus the parquet sinks; the multi-round
driver loop adds only O(rounds) constant-time commits, which on a real
cluster overlap with executor work and do not scale with data.
End-to-end multi-round numbers are reported separately by bench.py.

Usage: python bench_scaling.py [--pages N] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATA_DIR = "/tmp/wcs_scaling_input"
MINHASH_DIR = "/tmp/wcs_scaling_minhash"
ANN_DIR = "/tmp/wcs_scaling_ann"


def prepare_input(pages_n: int, hosts: int) -> None:
    """Materialize pages/frontier/seen parquet once (not timed)."""
    from web_crawler_spark.fixtures.bigweb import (
        generate_frontier_df,
        generate_pages_df,
    )
    from web_crawler_spark.session import get_spark

    # marker encodes the requested size — a different --pages/--hosts
    # regenerates instead of silently reusing the old input
    marker = os.path.join(DATA_DIR, f"_OK_{pages_n}_{hosts}")
    if os.path.exists(marker):
        return
    shutil.rmtree(DATA_DIR, ignore_errors=True)
    spark = get_spark("scaling_prep", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    pages = generate_pages_df(spark, hosts=hosts, pages_per_host=pages_n // hosts)
    pages.write.mode("overwrite").parquet(f"{DATA_DIR}/pages")
    pages = spark.read.parquet(f"{DATA_DIR}/pages")
    generate_frontier_df(spark, pages).write.mode("overwrite").parquet(
        f"{DATA_DIR}/frontier"
    )
    # 20% of URLs already seen (mid-crawl regime for the anti-join)
    (
        pages.select(
            F.lit(1).alias("siteid"), F.col("url").alias("url_key")
        ).filter(F.pmod(F.xxhash64("url"), F.lit(5)) == 0)
    ).write.mode("overwrite").parquet(f"{DATA_DIR}/seen")
    open(marker, "w").close()
    spark.stop()


def prepare_minhash_input(n_docs: int) -> None:
    """Deterministic synthetic document corpus for the minhash-LSH
    scaling job: 20k-word Zipf-sampled vocabulary, 80-300 words/doc,
    ~2% near-dup pairs so the band join has real positives. Vocabulary
    size matters: the signatures hash CHARACTER 5-shingles, and a
    tiny-vocab corpus (the first attempt reused testdata's ~40 words)
    saturates the shingle universe — every long doc contains nearly
    every distinct shingle, all signatures converge, every band bucket
    holds the whole corpus and the candidate join goes quadratic
    (observed: one local[2] leg burned 65 CPU-minutes in the verify
    condition). Web-scale text has heavy-tailed vocabulary; so does
    this generator. Text is a pure function of doc_id (seed-stable),
    generated distributed via mapInPandas."""
    import numpy as np

    from web_crawler_spark.session import get_spark

    marker = os.path.join(MINHASH_DIR, f"_OK_{n_docs}")
    if os.path.exists(marker):
        return
    shutil.rmtree(MINHASH_DIR, ignore_errors=True)
    spark = get_spark("minhash_prep", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def gen(batches):
        # 30% Zipf head + 70% uniform tail over a 20k-word vocab; word
        # k is spelled from its rank so shingle bytes vary across the
        # whole vocabulary. Calibrated offline: random-pair shingle
        # J ≈ 0.045, band-collision ≈ 8e-5 → ~6e5 random candidates at
        # 120k docs (≈5/doc) on top of the ~2.4k planted dups — a
        # realistic LSH verify load, quadratic in nothing
        vsize = 20_000
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                is_dup = i % 50 == 1
                base = i - 1 if is_dup else i
                rng = np.random.RandomState(int(base) & 0x7FFFFFFF)
                n = rng.randint(80, 300)
                nz = int(n * 0.3)
                ranks = np.concatenate(
                    [
                        np.minimum(rng.zipf(1.3, size=nz) - 1, vsize - 1),
                        rng.randint(0, vsize, size=n - nz),
                    ]
                )
                rng.shuffle(ranks)
                t = " ".join("w%x" % r for r in ranks)
                if is_dup:
                    t += " zz" + str(int(i))  # near-dup, not exact
                texts.append(t)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    spark.range(0, n_docs, 1, 64).mapInPandas(
        gen, "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{MINHASH_DIR}/documents")
    open(marker, "w").close()
    spark.stop()


def run_minhash(spark: SparkSession) -> tuple[int, float]:
    """The flagship LLM-pipeline dedup tier end-to-end, exactly the
    registered q_dedup_minhash shape: signature UDF → banded bucket
    self-join → pair dedupe → signature-agreement verify → noop.

    The banding is sized by the SAME sizing protocol the registered
    query uses (`queries.MINHASH_CALIB` + measured-background
    `plan_minhash` — the corpus's own pair-Jaccard quantiles, not a
    guessed point), so the scaling evidence measures the shipped
    protocol at this corpus, not the r3-era fixed 64×16 whose
    at-threshold recall the planner work showed to be 0.64. The
    recorded r4/r5 sessions ran 220 perms × 55 bands at 360k docs —
    the same sizing the measured-background fixture plan now picks."""
    from web_crawler_spark.operators.dedup import minhash_lsh_pairs
    from web_crawler_spark.operators.lsh_plan import (
        measure_jaccard_background,
        plan_minhash,
    )
    from web_crawler_spark.queries import MINHASH_BASE, MINHASH_CALIB

    docs = spark.read.parquet(f"{MINHASH_DIR}/documents")
    n = docs.count()
    bg = measure_jaccard_background(
        f"{MINHASH_DIR}/documents", shingle_k=MINHASH_BASE["shingle_k"]
    )
    plan = plan_minhash(n, j_bg=bg, **MINHASH_CALIB)
    t0 = time.time()
    minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_perm=plan.num_bits, bands=plan.bands,
        shingle_k=MINHASH_BASE["shingle_k"],
        threshold=MINHASH_BASE["threshold"],
    ).write.format("noop").mode("overwrite").save()
    return n, time.time() - t0


def run_curation(spark: SparkSession) -> tuple[int, float]:
    """The r5 curation tier end-to-end at corpus scale, same shapes as
    the registered queries (quality_gopher / pii_scrub /
    contamination_ngrams) over the Zipf-vocabulary minhash corpus:
    (a) Gopher-stats projection, (b) PII scrub + md5 projection, (c)
    contamination gram join against a fixed-ratio benchmark slice
    (doc_id % 199 == 0, ~0.5% — a realistic benchmark:corpus ratio
    whose 16-hex key set stays broadcastable as the corpus grows; the
    registered query's mod-7 slice is a fixture-scale choice)."""
    from web_crawler_spark.functions.text import (
        gopher_stats_udf,
        make_gram_key_udf,
        pii_scrub_col,
    )

    docs = spark.read.parquet(f"{MINHASH_DIR}/documents")
    n = docs.count()
    t0 = time.time()
    # quality stats + PII scrub fused into ONE projection pass (a
    # production curation pipeline emits both columns from one scan;
    # the registered queries keep them separate only because each is
    # oracled independently)
    stats = gopher_stats_udf()
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@src"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
    )
    base = docs.select(
        "doc_id",
        stats(F.col("text")).alias("s"),
        F.md5(pii_scrub_col(full)).alias("scrub_md5"),
    )
    base.select(
        "doc_id",
        F.col("s.n_words").alias("n_words"),
        F.expr("(s.chars * 100) div s.n_words").alias("mean_wlen_c"),
        F.expr("(s.n_stop * 10000) div s.n_words").alias("stop_bp"),
        F.expr(
            "CASE WHEN s.g2 > 0 THEN ((s.g2 - s.g2u) * 10000) div s.g2"
            " ELSE 0 END"
        ).alias("dup_2gram_bp"),
        "scrub_md5",
    ).write.format("noop").mode("overwrite").save()
    keys = make_gram_key_udf(n=8, prefix=16)
    # disjoint-slice shape (same as the registered query): gram UDF on
    # the small benchmark slice, gram UDF on the corpus slice feeding
    # the broadcast join directly, plain doc_id scan as the left base —
    # no multi-consumer frame, no persist barrier
    bench = (
        docs.filter(F.col("doc_id") % 199 == 0)
        .select(F.explode(keys(F.col("text"))).alias("gkey"))
        .distinct()
    )
    corpus_grams = docs.filter(F.col("doc_id") % 199 != 0).select(
        "doc_id", F.explode(keys(F.col("text"))).alias("gkey")
    )
    hits = (
        corpus_grams.join(F.broadcast(bench), "gkey")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    docs.filter(F.col("doc_id") % 199 != 0).select("doc_id").join(
        hits, "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("n_hits", F.lit(0)).alias("n_contaminated_grams")
    ).write.format("noop").mode("overwrite").save()
    return n, time.time() - t0


def prepare_ann_input(n_vecs: int, dim: int = 64, n_queries: int = 512) -> None:
    """Deterministic synthetic embedding corpus for the ANN-LSH scaling
    job: 4096 latent clusters, vec = 0.8·centroid + 0.6·noise, so
    same-cluster vectors collide in hyperplane bands the way real
    embedding neighborhoods do (pure-random vectors would make the
    band join degenerate: ~zero candidates, the job would measure only
    the signature UDF). Cross-cluster band collisions at 8-bit bands
    run ~1.6% — a realistic re-rank load. Vectors are a pure function
    of vec_id (seed-stable), generated distributed via mapInPandas;
    queries use the same scheme from a disjoint id range."""
    import numpy as np

    from web_crawler_spark.session import get_spark

    marker = os.path.join(ANN_DIR, f"_OK_{n_vecs}_{dim}_{n_queries}")
    if os.path.exists(marker):
        return
    shutil.rmtree(ANN_DIR, ignore_errors=True)
    spark = get_spark("ann_prep", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                c = np.random.RandomState(
                    (int(i) % 4096) + 12345
                ).standard_normal(dim)
                z = np.random.RandomState(int(i) & 0x7FFFFFFF).standard_normal(
                    dim
                )
                vecs.append((0.8 * c + 0.6 * z).astype(np.float32).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    schema = "vec_id long, embedding array<float>"
    spark.range(0, n_vecs, 1, 64).mapInPandas(gen, schema).write.mode(
        "overwrite"
    ).parquet(f"{ANN_DIR}/corpus")
    spark.range(n_vecs, n_vecs + n_queries, 1, 8).mapInPandas(
        gen, schema
    ).write.mode("overwrite").parquet(f"{ANN_DIR}/queries")
    open(marker, "w").close()
    spark.stop()


def run_ann(spark: SparkSession) -> tuple[int, float]:
    """The ANN similarity-search tier end-to-end, exactly the
    registered ann_lsh_topk shape: hyperplane band UDF → (band,
    bucket) equi-join → candidate dedupe → numpy cosine re-rank →
    per-query top-k window → noop.

    Config is deliberately FIXED (32 bits = 4 bands × 8), unlike the
    minhash job which takes the planner's sizing: `ANN_LSH_CALIB`'s
    near-random cos_dup=0.33 threshold makes the planner concede a
    0.39 candidate fraction (LSH can't separate 0.33 from 0.0 —
    ρ≈1), which on this synthetic 2.4M corpus would measure a
    near-brute-force re-rank, not the band-join plan whose N→4N
    parallelism this bench exists to evidence. The plan SHAPE
    (UDF → slim equi-join → re-rank → window) is identical at any
    banding; only constant factors move."""
    from web_crawler_spark.operators.similarity import lsh_topk

    corpus = spark.read.parquet(f"{ANN_DIR}/corpus")
    queries = spark.read.parquet(f"{ANN_DIR}/queries")
    dim = len(corpus.select("embedding").head()[0])
    n = corpus.count()
    t0 = time.time()
    lsh_topk(
        corpus, queries, dim, k=10, num_bits=32,
        id_col="vec_id", vec_col="embedding",
    ).write.format("noop").mode("overwrite").save()
    return n, time.time() - t0


def run_round(spark: SparkSession) -> tuple[int, float]:
    """One crawl round (engine/crawl.py round body, sinks → noop).

    Fetch is the PRODUCTION shape: `fetch_with_callback` (mapInPandas
    partitioned by host_bucket) with a deterministic in-executor page
    synthesizer (fixtures/bigweb.py `make_synthetic_fetcher`) standing
    in for HTTP. The payload is born inside the fetch task, parsed in
    the same stage (engine parse-in-stage plan), and dropped before
    the persist — html never crosses an exchange and is never cached,
    exactly as the engine behaves with a real fetcher at scale. (The
    earlier equi-join stand-in shuffled every page body through the
    join exchange — a plan the engine only uses for small fixtures.)
    """
    from web_crawler_spark.fixtures.bigweb import make_synthetic_fetcher
    from web_crawler_spark.functions.html import outlink_spans_col
    from web_crawler_spark.functions.urls import (
        allowed_domain_col,
        classify_block_col,
        normalize_url_udf,
        registrable_host_col,
    )
    from web_crawler_spark.operators.fetch import fetch_parse_with_callback
    from web_crawler_spark.operators.ranking import first_wins, with_global_rank
    from web_crawler_spark.operators.seen import BroadcastBloom, anti_join_seen

    frontier = spark.read.parquet(f"{DATA_DIR}/frontier")
    seen = spark.read.parquet(f"{DATA_DIR}/seen")
    n_frontier = frontier.count()
    hosts = int(os.environ.get("WCS_SCALING_HOSTS", "48"))
    fetcher = make_synthetic_fetcher(hosts, n_frontier // hosts)

    bloom = BroadcastBloom.empty(max(n_frontier, 1_000_000), 0.01)
    bloom.add_keys(seen.select("url_key"), "url_key")

    t0 = time.time()
    batch = with_global_rank(
        frontier,
        ["depth", "parent_ord", "link_idx"],
        out="visit_ord",
        small_threshold=10_000,
        known_count=n_frontier,
    ).withColumn("seed_url", F.concat(F.lit("https://"), F.col("host")))
    # fetch + parse fused in one mapInPandas task (engine/crawl.py's
    # production path): html is born and parsed inside the task and
    # never crosses the Python→JVM boundary; the persist barrier holds
    # only structured spans + metadata
    fetched = fetch_parse_with_callback(batch, fetcher)
    ct = F.lower(F.coalesce(F.col("content_type"), F.lit("")))
    success = (
        F.col("status_code").isNotNull()
        & F.col("status_code").between(200, 299)
        & ct.contains("text/html")
    )
    base_key = registrable_host_col(F.col("url_key"))
    parsed = (
        fetched.withColumn("outlinks", outlink_spans_col(F.col("spans"), base_key))
        .persist()
    )
    cand = parsed.filter(success).select(
        "siteid",
        "seed_url",
        F.col("url_key").alias("parent_key"),
        F.col("visit_ord").alias("parent_ord"),
        (F.col("depth") + 1).alias("depth"),
        F.posexplode("outlinks").alias("link_idx", "span"),
    ).withColumn("u", F.col("span.media_ref")).drop("span")
    cand = cand.withColumn("block_type", classify_block_col(F.col("u"))).filter(
        F.col("block_type").isNull() & allowed_domain_col(F.col("seed_url"), F.col("u"))
    )
    new_links = cand.withColumn("url_key", normalize_url_udf(F.col("u"))).drop("u")
    new_links = first_wins(
        new_links, ["siteid", "url_key"], ["depth", "parent_ord", "link_idx"]
    )
    new_links = anti_join_seen(new_links, seen, ["siteid", "url_key"], bloom)
    new_links.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    parsed.unpersist()
    return n_frontier, dt


def hw_control(spark: SparkSession, job: str = "crawl") -> float:
    """Hardware memory-bandwidth control: a trivially-parallel,
    shuffle-free, pure-JVM streaming scan (regex over every page body).
    Its scaling across pinned core counts measures what the shared
    single-VM memory system permits ANY job to show — perfectly
    parallel work included. Engine efficiency should be read against
    this ceiling: a pure-CPU L1-resident benchmark scales ~0.97 on
    this box (2→8 pinned cores) while this bandwidth-bound control
    scales ~0.77, because all cores share one memory system; on a real
    cluster, memory bandwidth scales WITH executor count."""
    t0 = time.time()
    if job == "ann":
        # bandwidth control over the float corpus: stream every vector
        # element through a JVM higher-order aggregate (no shuffle)
        spark.read.parquet(f"{ANN_DIR}/corpus").select(
            F.sum(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda acc, x: acc + x
                )
            )
        ).collect()
        return time.time() - t0
    path, col = (
        (f"{DATA_DIR}/pages", "html")
        if job == "crawl"
        else (f"{MINHASH_DIR}/documents", "text")
    )
    spark.read.parquet(path).select(
        F.sum(F.length(F.regexp_replace(col, "<[^>]+>", "")))
    ).collect()
    return time.time() - t0


def _warmup(spark: SparkSession, job: str = "crawl") -> None:
    """Spin up Python workers + Arrow + JIT, and fault the ENTIRE input
    into the OS page cache — first-touch parquet reads come off virtio
    disk and would otherwise dominate the first timed run (measured
    130s → 53s across three back-to-back local[16] runs before this)."""
    @F.pandas_udf("long")
    def _noop(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, 100_000, 1, 64).select(
        F.sum(_noop(F.col("id")))
    ).collect()
    if job in ("minhash", "curation"):
        spark.read.parquet(f"{MINHASH_DIR}/documents").select(
            F.sum(F.length("text"))
        ).collect()
        return
    if job == "ann":
        for t in ("corpus", "queries"):
            spark.read.parquet(f"{ANN_DIR}/{t}").select(
                F.sum(F.size("embedding"))
            ).collect()
        return
    for t, col in (("pages", F.length("html")), ("frontier", F.lit(1)),
                   ("seen", F.lit(1))):
        spark.read.parquet(f"{DATA_DIR}/{t}").select(F.sum(col)).collect()


def _steal_jiffies(cores: int) -> int:
    """Sum of hypervisor-steal jiffies over the leg's pinned cores
    (taskset pins this process to cpus 0..cores-1)."""
    total = 0
    with open("/proc/stat") as fh:
        for line in fh:
            parts = line.split()
            if parts and parts[0].startswith("cpu") and parts[0] != "cpu":
                if int(parts[0][3:]) < cores:
                    total += int(parts[8])
    return total


def run_single(cores: int, trials: int = 1, job: str = "crawl") -> dict:
    """Best-of-N wall time: with inputs page-cached, residual variance
    is scheduler jitter; min is the standard throughput estimator."""
    from web_crawler_spark.session import get_spark

    # 4 shuffle partitions per core: task sizes even out and no single
    # straggler partition serializes a stage tail (cluster practice:
    # 2-4x total cores; measured 379s → 175s at local[4] on 480k pages)
    spark = get_spark(
        f"scaling_{cores}", master=f"local[{cores}]",
        shuffle_partitions=4 * cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark, job)
    ctrl = min(hw_control(spark, job) for _ in range(3))
    run_job = {"crawl": run_round, "minhash": run_minhash,
               "ann": run_ann, "curation": run_curation}[job]
    best = None
    steal = 0.0
    for _ in range(trials):
        s0, w0 = _steal_jiffies(cores), time.time()
        n, dt = run_job(spark)
        w1 = time.time()
        # hypervisor steal on THIS leg's pinned cores, as a fraction of
        # the leg's core-seconds (USER_HZ=100): the direct evidence for
        # whether a bad pair ratio is the plan or the shared host
        steal = max(
            steal, (_steal_jiffies(cores) - s0) / max(w1 - w0, 1e-9)
            / 100.0 / cores,
        )
        best = dt if best is None else min(best, dt)
    spark.stop()
    return {"urls": n, "sec": round(best, 2),
            "urls_per_sec": round(n / best, 1), "trials": trials,
            "hw_control_sec": round(ctrl, 2),
            "steal_frac": round(steal, 4)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=960_000)
    ap.add_argument("--hosts", type=int, default=48)
    # default 2→8 (N→4N): with taskset pinning, both levels stay clear
    # of the single-VM memory-bandwidth/disk ceiling that bites around
    # 16 concurrent task+worker pairs (BENCH.md §1 decomposition)
    ap.add_argument("--levels", type=str, default="2,8")
    ap.add_argument("--single", type=int, default=0)
    ap.add_argument("--trials", type=int, default=1)
    # job: "crawl" = one engine round over the big frontier (default);
    # "minhash" = the flagship LLM-pipeline dedup tier end-to-end
    # (signature UDF → banded bucket join → verify) over a synthetic
    # document corpus — same pair-ratio protocol
    # "ann" = the similarity-search tier (hyperplane LSH top-k) over a
    # clustered synthetic embedding corpus — same pair-ratio protocol
    # "curation" = the r5 quality/PII/contamination tier end-to-end
    # over the same Zipf-vocabulary corpus — same pair-ratio protocol
    ap.add_argument("--job", type=str, default="crawl",
                    choices=("crawl", "minhash", "ann", "curation"))
    ap.add_argument("--docs", type=int, default=120_000)
    # interleave level trials (4,16,4,16,...) so host-load epochs on the
    # shared VM hit both levels equally; per-level min is reported
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    if args.single:
        # child mode: one parallelism level in a fresh JVM
        print(
            "RESULT "
            + json.dumps(run_single(args.single, args.trials, args.job))
        )
        return

    if args.job in ("minhash", "curation"):
        prepare_minhash_input(args.docs)
    elif args.job == "ann":
        prepare_ann_input(args.docs)
    else:
        prepare_input(args.pages, args.hosts)
    os.environ["WCS_SCALING_HOSTS"] = str(args.hosts)  # children inherit
    levels_list = [int(c) for c in args.levels.split(",")]
    pin = shutil.which("taskset") is not None
    # Levels run back-to-back inside each repeat (a PAIR) and efficiency
    # is computed per pair, then the MEDIAN across pairs is reported:
    # host load on the shared VM drifts in epochs of minutes, so pairing
    # adjacent runs holds the epoch fixed inside each ratio, while
    # min-per-level across epochs can pair a lucky small-level reading
    # with an unrelated large-level one and swing the ratio ±0.1 in
    # either direction (both observed).
    samples: dict[int, list[dict]] = {c: [] for c in levels_list}
    for _ in range(args.repeat):
        for cores in levels_list:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--single", str(cores), "--trials", "1",
                   "--job", args.job]
            if pin:
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            proc = subprocess.run(
                cmd, capture_output=True, text=True, check=True,
            )
            line = next(
                ln for ln in proc.stdout.splitlines()
                if ln.startswith("RESULT ")
            )
            samples[cores].append(json.loads(line[len("RESULT "):]))

    import statistics

    levels = sorted(samples)
    lo, hi = levels[0], levels[-1]
    results = {c: min(samples[c], key=lambda r: r["sec"]) for c in levels}
    pair_effs = [
        round((a["sec"] / b["sec"]) / (hi / lo), 3)
        for a, b in zip(samples[lo], samples[hi])
    ]
    eff = statistics.median(pair_effs)
    out = {
        "metric": {
            "crawl": "crawl_round_urls_per_sec",
            "minhash": "minhash_lsh_docs_per_sec",
            "ann": "ann_lsh_vecs_per_sec",
            "curation": "curation_docs_per_sec",
        }[args.job],
        "levels": results,
        "samples_sec": {c: [r["sec"] for r in samples[c]] for c in levels},
        # hypervisor steal on the leg's pinned cores per sample (fraction
        # of the leg's core-seconds): the per-pair proof of whether a low
        # ratio is host steal or the plan
        "samples_steal_frac": {
            c: [r.get("steal_frac") for r in samples[c]] for c in levels
        },
        "pair_efficiencies": pair_effs,
        "scaling_efficiency": round(eff, 3),
        "criterion": ">=0.8 from N to 4N (north rule); "
                     "median of same-epoch pair ratios",
        "pages": args.pages if args.job == "crawl" else None,
        "docs": args.docs if args.job != "crawl" else None,
        "pinned": pin,
    }
    ctrl_pairs = [
        round((a["hw_control_sec"] / b["hw_control_sec"]) / (hi / lo), 3)
        for a, b in zip(samples[lo], samples[hi])
        if "hw_control_sec" in a and "hw_control_sec" in b
    ]
    if ctrl_pairs:
        ceff = statistics.median(ctrl_pairs)
        out["hw_control_efficiency"] = round(ceff, 3)
        # engine scaling relative to what the shared memory system
        # permits a perfectly-parallel job to show on this single VM
        out["efficiency_vs_hw_ceiling"] = round(min(eff / ceff, 1.0), 3)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n```json\n" + json.dumps(out, indent=2) + "\n```\n")


if __name__ == "__main__":
    main()
