"""The batch-round crawl engine: one DataFrame job pipeline per round.

Spark-first re-expression of the reference's threaded frontier loop
(SURVEY.md §3.1): each round is

  frontier ──dequeue (priority top-k per host)──▶ batch
  batch ──rank──▶ visit ordinals (distributed global rank)
  batch ──fetch──▶ responses      (equi-join vs synthetic pages table;
                                   production: mapInPandas HTTP per
                                   host_bucket partition)
  responses ──admission──▶ fetch_log + HTML pages
  pages ──parse UDF──▶ spans ──native HOF──▶ outlinks
  outlinks ──block rules / domain filter──▶ candidates + blocked sink
  candidates ──normalize UDF──▶ url_key
  candidates ──first-wins window──▶ in-batch dedup
  candidates ──bloom prefilter + anti-join seen──▶ new frontier rows
  sinks: fetch_log (carries visit ordinals) / documents / blocked /
         frontier / seen [/ cuckoo filters] + metrics.jsonl
         (parquet snapshot per round ⇒ resumable; Iceberg MERGE INTO
          at production scale — same keys, same partitioning)

Round = BFS depth layer when no politeness cap is set, which makes the
visit order reproduce the single-worker reference order exactly
(crawler/frontier.py:30,51 FIFO ⇒ sort by (depth, parent_ord,
link_idx); see oracle/bfs.py). Politeness caps defer rows instead of
dropping them — the documented divergence from the reference's silent
Queue(maxsize=10_000) overflow drop.

Scale design (100 TB / 10^10-URL frontier):
- frontier & seen are hash-bucketed by host (host_bucket = xxhash64 %
  NB): fetch partitions align with politeness isolation; hot hosts are
  split by AQE skew-join + the per-host dequeue window.
- the seen anti-join is bloom-prefiltered (operators/seen.py) so the
  per-round exchange is proportional to maybe-seen candidates only.
- visit ordinals come from a range-partitioned two-pass rank (no
  single-partition window; operators/ranking.py).
- per-round parquet snapshots truncate the iterative lineage and are
  the checkpoint/resume unit (round-numbered ⇒ idempotent rewrites).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from web_crawler_spark.functions.html import (
    extract_spans_udf,
    needs_js_col,
    outlink_spans_col,
)
from web_crawler_spark.functions.urls import (
    allowed_domain_col,
    canonical_id_udf,
    classify_block_col,
    normalize_url_udf,
    registrable_host_col,
    url_host,
    url_path,
)
from web_crawler_spark.operators.politeness import dequeue_batch, host_budgets
from web_crawler_spark.operators.ranking import first_wins, with_global_rank
from web_crawler_spark.operators.robots import RobotsMatcher
from web_crawler_spark.operators.seen import (
    BroadcastBloom,
    ShardedBloom,
    anti_join_seen,
)
from web_crawler_spark.oracle.semantics import normalize_fetch_url

MAX_RETRIES_429 = 2  # crawler/fetcher.py:17


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers — driver-side metadata read, no
    Spark job. Keeps the per-round loop free of count() stages."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


@dataclass
class CrawlConfig:
    state_dir: str
    num_host_buckets: int = 64
    max_per_host_round: int | None = None  # None = reference parity (no cap)
    max_depth: int | None = None
    max_rounds: int = 10_000
    bloom_expected: int = 1_000_000
    bloom_fpp: float = 0.01
    # >1 ⇒ ShardedBloom keyed by host_bucket: the 10^10-key path where
    # a single filter is a multi-GB broadcast (12 GB → ~190 MB/shard at
    # 64 shards; see operators/seen.py)
    bloom_shards: int = 1
    # sharded probes go through a ShardStore saved under state_dir:
    # each task mmap-loads ONLY its partition's shard instead of
    # receiving the whole filter in the UDF closure (the cluster
    # path; False = closure-broadcast, local-mode shortcut)
    bloom_store: bool = True
    use_bloom_min_seen: int = 50_000  # below this, plain anti-join is cheaper
    rank_small_threshold: int = 100_000
    respect_robots: bool = False
    round_budget_ms: int = 60_000
    user_agent: str = "web-crawler-spark"
    # seen-set prefilter ahead of the exact anti-join:
    #   "bloom"  — global broadcast bloom (lazy past use_bloom_min_seen)
    #   "cuckoo" — per-host-bucket cuckoo filters maintained via
    #              applyInPandas batch merges (north rule; supports
    #              delete; shards broadcast per bucket)
    #   "none"   — exact anti-join only
    seen_filter: str = "bloom"
    cuckoo_capacity_per_bucket: int = 1 << 16
    # S5 crawl-page upsert table (operators/merge.py): real Iceberg
    # MERGE INTO when iceberg_catalog is configured and its runtime is
    # on the classpath, else the merge-equivalent parquet backend
    upsert_pages: bool = False
    iceberg_catalog: str | None = None
    # two-phase salted top-k dequeue for hot hosts (None = single window
    # per host; set ~16-64 when a host can hold >10^6 frontier rows)
    dequeue_salts: int | None = None
    # pipelined round commits: when lineage is deterministic (no HTTP
    # fetcher), nothing defers, and no stateful filter reads the durable
    # table mid-round, parquet writes are pure checkpoints and land in
    # the background while the next round proceeds from in-memory
    # frames (an ordered committer preserves the crash-recovery
    # protocol). False forces the fully ordered commit path.
    pipeline_commits: bool = True
    # pipelined SINKS on the ordered path (r4): even when frontier/seen
    # must commit ordered-and-durable-first (real fetcher, politeness
    # deferrals, cuckoo filters, page upserts), the fetch_log/documents/
    # blocked sinks + metrics + meta only need the persisted `fetched`
    # frame — they land on the background committer thread (prefix-
    # chained, so meta still never claims a round whose files aren't
    # durable) while the next round proceeds from the already-written
    # frontier/seen. Caveat on a real cluster with a real fetcher:
    # losing cached `fetched` blocks mid-sink recomputes
    # nondeterministic lineage, so a sink row may reflect a re-fetch of
    # the same URL; frontier/seen (the crawl's own state) are derived
    # durable-first and cannot diverge. Set False for byte-stable sinks
    # at the cost of blocking each round on its sink writes.
    pipeline_sinks: bool = True
    # pipelined-mode in-memory seen chain compaction: every K rounds,
    # re-root the anti-join's seen frame on the durable seen table
    # instead of the growing union of per-round localCheckpoint legs —
    # bounds plan depth (and lets GC release superseded checkpoint
    # blocks) for 1000-round crawls. 0 disables compaction.
    seen_compact_rounds: int = 16
    # size spark.sql.shuffle.partitions to the ROUND, not the session
    # (r4): a 40-row fixture round planning 32-reducer exchanges pays
    # pure task-scheduling latency (measured ~7% of crawl wall at
    # sf-bench scale, BENCH.md §3c); a 10^6-row round keeps the
    # session's full width. Per round the engine sets the conf to
    # clamp(frontier_rows / shuffle_rows_per_task, min_shuffle_partitions,
    # session value) and restores the session value when run() exits.
    # Partition count never changes results (every round op is
    # partitioning-agnostic by design: min_by aggs, range-partitioned
    # two-pass rank, hash anti-joins); parity tests run with it on.
    auto_shuffle_partitions: bool = True
    shuffle_rows_per_task: int = 2000
    min_shuffle_partitions: int = 4


@dataclass
class CrawlStats:
    rounds: int = 0
    total_visits: int = 0
    per_round: list[dict] = field(default_factory=list)


class CrawlEngine:
    """Multi-site batch-round crawler over a synthetic (or fetched) web.

    ``pages_df`` is the fetch source: FIXTURES.md §3 schema, keyed by
    normalized fetch URL. Production swaps the equi-join for an HTTP
    mapInPandas fetcher partitioned by host_bucket; everything else is
    identical.
    """

    def __init__(
        self,
        spark: SparkSession,
        pages_df: DataFrame,
        sites_df: DataFrame,
        robots_df: DataFrame | None = None,
        config: CrawlConfig | None = None,
        fetcher=None,
        seed_probes: DataFrame | None = None,
    ):
        """``fetcher``: optional batch-fetch callback (operators/fetch.py
        contract). When set, fetching runs via mapInPandas per
        host_bucket partition (the production HTTP seam) instead of the
        synthetic pages equi-join; result columns are identical.

        ``seed_probes``: optional (url, status, final_url) probe table
        for U4 seed resolution (main.py:44-74) — when set, each enabled
        seed is resolved via operators/seeds.resolve_seed_urls before
        normalization."""
        self.spark = spark
        self.cfg = config or CrawlConfig(state_dir="/tmp/wcs_state")
        # frontier rows carry their own `host`; keep the pages side bare
        self.pages = pages_df.drop("host")
        self.sites = sites_df
        self.robots = robots_df
        self._robots_matcher = (
            RobotsMatcher.from_df(robots_df, self.cfg.user_agent)
            if (robots_df is not None and self.cfg.respect_robots)
            else None
        )
        self._budgets = (
            host_budgets(robots_df, self.cfg.round_budget_ms,
                         self.cfg.max_per_host_round or 2**31 - 1)
            if robots_df is not None and self.cfg.max_per_host_round is not None
            else None
        )
        self.bloom: BroadcastBloom | ShardedBloom | None = None
        self._bloom_epoch = 0
        # run-unique store namespace (r4): epoch numbering restarts at 0
        # per engine instance, so a RESUMED run on the same state_dir
        # would otherwise re-publish to the dead run's epoch paths —
        # and the executor-side shard cache (operators/seen._SHARD_CACHE)
        # is keyed by absolute path, so a reused Python worker could
        # serve a stale pre-crash bitmap for a post-resume probe. The
        # nonce makes every engine instance's store paths disjoint; the
        # dead run's orphan epoch dirs are pruned at run() start (the
        # store is derived state, always rebuilt from the durable seen
        # table).
        self._bloom_nonce = uuid.uuid4().hex[:8]
        self._bloom_dirty = False
        self._bloom_probe_view = None
        self._fetcher = fetcher
        self._seed_probes = seed_probes

    def _pages_table(self):
        """Lazy S5 upsert table (operators/merge.py MergeTable)."""
        if getattr(self, "_pages_tbl", None) is None:
            from web_crawler_spark.operators.merge import MergeTable

            self._pages_tbl = MergeTable(
                self.spark,
                "crawl_pages",
                ["siteid", "url_key"],
                path=os.path.join(self.cfg.state_dir, "crawl_pages"),
                catalog=self.cfg.iceberg_catalog,
            )
        return self._pages_tbl

    def pages_current(self) -> DataFrame | None:
        """S5 upsert view: current row per (siteid, url_key) — None
        unless the crawl ran with upsert_pages=True."""
        if not self.cfg.upsert_pages:
            return None
        return self._pages_table().current()

    # ------------------------------------------------------------------
    # seen-bloom helpers (flat vs host_bucket-sharded)
    # ------------------------------------------------------------------
    def _new_bloom(self, seen_count: int) -> "BroadcastBloom | ShardedBloom":
        expected = max(self.cfg.bloom_expected, 2 * seen_count)
        if self.cfg.bloom_shards > 1:
            return ShardedBloom.empty(
                expected, self.cfg.bloom_fpp, self.cfg.bloom_shards
            )
        return BroadcastBloom.empty(expected, self.cfg.bloom_fpp)

    def _bloom_add(self, df: DataFrame) -> None:
        if isinstance(self.bloom, ShardedBloom):
            self.bloom.add_keys(
                df.select("url_key", "host_bucket"), "url_key", "host_bucket"
            )
        else:
            self.bloom.add_keys(df.select("url_key"), "url_key")
        self._bloom_dirty = True

    def _bloom_probe(self):
        """The membership object the round's anti-join probes.

        Sharded + bloom_store: publish the mutated shards to a fresh
        store epoch (one .npy per shard under state_dir) and return the
        ShardStore — each task then mmap-loads only its partition's
        shard, never the whole filter (the 10^10-key cluster path).
        The previous epoch dir is removed; already-mmapped readers on
        POSIX keep their unlinked inode, and the new plan binds the new
        path so no probe can read a stale bitmap."""
        if not (
            isinstance(self.bloom, ShardedBloom) and self.cfg.bloom_store
        ):
            return self.bloom
        if self._bloom_dirty or self._bloom_probe_view is None:
            self._bloom_epoch += 1
            store = self.bloom.save(
                os.path.join(
                    self.cfg.state_dir,
                    "bloom_store",
                    f"epoch_{self._bloom_nonce}_{self._bloom_epoch}",
                )
            )
            # keep exactly one previous epoch alive: the prior round's
            # persisted frames may still recompute against its path
            old = getattr(self, "_bloom_prev_view", None)
            if old is not None:
                old.destroy()
            self._bloom_prev_view = self._bloom_probe_view
            self._bloom_probe_view = store
            self._bloom_dirty = False
        return self._bloom_probe_view

    # ------------------------------------------------------------------
    # state-table helpers (parquet snapshots; Iceberg MERGE in production)
    # ------------------------------------------------------------------
    def _p(self, table: str, rnd: int | None = None) -> str:
        base = os.path.join(self.cfg.state_dir, table)
        return base if rnd is None else os.path.join(base, f"round={rnd}")

    def _write(self, df: DataFrame, table: str, rnd: int) -> None:
        # remember the table schema so every later per-round re-read
        # skips footer schema inference at plan-build time (a blocking
        # driver listing+read per round that profiling showed adds up)
        schemas = getattr(self, "_table_schemas", None)
        if schemas is None:
            schemas = self._table_schemas = {}
        schemas.setdefault(table, df.schema)
        df.write.mode("overwrite").parquet(self._p(table, rnd))

    def _reader(self, table: str):
        r = self.spark.read
        schema = getattr(self, "_table_schemas", {}).get(table)
        return r.schema(schema) if schema is not None else r

    def _read_round(self, table: str, rnd: int) -> DataFrame:
        return self._reader(table).parquet(self._p(table, rnd))

    def read_all(self, table: str) -> DataFrame:
        """All rounds of an append table (visits/documents/fetch_log/...)."""
        base = self._p(table)
        dirs = sorted(
            os.path.join(base, d)
            for d in os.listdir(base)
            if d.startswith("round=")
        )
        return self._reader(table).option("basePath", base).parquet(*dirs)

    def _write_meta(self, rnd: int, total_visits: int) -> None:
        os.makedirs(self.cfg.state_dir, exist_ok=True)
        tmp = os.path.join(self.cfg.state_dir, "_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"round": rnd, "total_visits": total_visits}, f)
        os.replace(tmp, os.path.join(self.cfg.state_dir, "_meta.json"))

    def _append_metrics(self, m: dict) -> None:
        """F6/F8 + north-rule lineage: one metrics record per committed
        round (driver-side, parquet-footer counts — zero extra jobs)."""
        with open(os.path.join(self.cfg.state_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(m) + "\n")

    def _read_meta(self) -> dict | None:
        p = os.path.join(self.cfg.state_dir, "_meta.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _prune_orphan_rounds(self, committed: int) -> None:
        """Crash recovery: a failure between the round-r+1 state writes
        and the meta commit leaves round dirs newer than the committed
        round. They MUST be deleted before resuming — an orphaned
        seen/round=r+1 would anti-join away every URL the re-run of
        round r+1 rediscovers and silently truncate the crawl."""
        for table in os.listdir(self.cfg.state_dir):
            base = os.path.join(self.cfg.state_dir, table)
            if not os.path.isdir(base):
                continue
            for d in os.listdir(base):
                if d.startswith("round="):
                    try:
                        rnd = int(d.split("=", 1)[1])
                    except ValueError:
                        continue
                    if rnd > committed:
                        shutil.rmtree(os.path.join(base, d))
        # metrics.jsonl is appended before the meta commit — drop lines
        # for rounds the re-run will emit again. A crash mid-append (the
        # exact scenario this recovery exists for) can leave a torn
        # trailing line: unparseable lines belong to uncommitted rounds
        # by construction, so drop them instead of crashing resume().
        mp = os.path.join(self.cfg.state_dir, "metrics.jsonl")
        if os.path.exists(mp):
            kept = []
            with open(mp) as f:
                for ln in f:
                    if not ln.strip():
                        continue
                    try:
                        if json.loads(ln)["round"] <= committed:
                            kept.append(ln)
                    except (json.JSONDecodeError, KeyError, TypeError):
                        continue
            # temp file + atomic replace: a crash during the prune
            # itself must not truncate the file
            tmp = mp + ".tmp"
            with open(tmp, "w") as f:
                f.writelines(kept)
            os.replace(tmp, mp)

    # ------------------------------------------------------------------
    # seed preparation (reference main.py:90-137: enabled sites →
    # resolve/normalize seed; driver-side, tiny dim)
    # ------------------------------------------------------------------
    def _seeds(self) -> list[tuple[int, str]]:
        enabled = self.sites.filter(F.col("enabled")).select("siteid", "url")
        if self._seed_probes is not None:
            from web_crawler_spark.operators.seeds import resolve_seed_urls

            enabled = resolve_seed_urls(enabled, self._seed_probes).select(
                "siteid", F.col("resolved_url").alias("url")
            )
        rows = enabled.collect()
        return [(int(r["siteid"]), normalize_fetch_url(r["url"])) for r in rows]

    def _seeds_dim(self, seeds: list[tuple[int, str]]) -> DataFrame:
        return self.spark.createDataFrame(
            seeds, "siteid int, seed_url string"
        ).withColumn("seed_host_key", registrable_host_col(F.col("seed_url")))

    def _frontier_row_cols(self, df: DataFrame) -> DataFrame:
        host = url_host(F.col("url_key"))
        return df.withColumn("host", host).withColumn(
            "host_bucket",
            F.pmod(F.xxhash64("host"), F.lit(self.cfg.num_host_buckets)).cast("int"),
        )

    # ------------------------------------------------------------------
    # run / resume
    # ------------------------------------------------------------------
    def run(self, fresh: bool = True) -> CrawlStats:
        if fresh and os.path.exists(self.cfg.state_dir):
            shutil.rmtree(self.cfg.state_dir)

        meta = self._read_meta() if not fresh else None
        # prune the bloom store wholesale: it is derived state (always
        # rebuilt from the durable seen table below) and a resumed run
        # must never mmap a dead run's epoch files — see _bloom_nonce
        shutil.rmtree(
            os.path.join(self.cfg.state_dir, "bloom_store"),
            ignore_errors=True,
        )
        seeds = self._seeds()
        seeds_dim = F.broadcast(self._seeds_dim(seeds))

        if meta is None:
            rnd, total_visits = 0, 0
            frontier = self._frontier_row_cols(
                self.spark.createDataFrame(
                    [(sid, u, 0, 0, i) for i, (sid, u) in enumerate(seeds)],
                    "siteid int, url_key string, depth int, parent_ord long,"
                    " link_idx int",
                ).withColumn("parent_key", F.lit(None).cast("string"))
            )
            seen_new = frontier.select(
                "siteid", "url_key", "host_bucket",
                F.col("depth").alias("first_depth"),
                F.lit(0).alias("round_seen"),
            )
            self._write(frontier, "frontier", 0)
            self._write(seen_new, "seen", 0)
            self._write_meta(0, 0)
        else:
            rnd, total_visits = meta["round"], meta["total_visits"]
            self._prune_orphan_rounds(rnd)

        frontier = self._read_round("frontier", rnd)
        seen = self.read_all("seen").select("siteid", "url_key", "host_bucket")
        # pipelined-mode union-chain depth (1 = rooted on the durable
        # table); observable for the compaction-bound test
        self._seen_union_legs = 1
        # lazy bloom: only built (once, from the seen table) after the
        # seen set outgrows the plain anti-join; below that the bloom
        # build/collect per round is pure overhead
        self.bloom = None
        seen_count = sum(
            _parquet_rows(self._p("seen", i)) for i in range(rnd + 1)
        )
        if (
            self.cfg.seen_filter == "bloom"
            and seen_count >= self.cfg.use_bloom_min_seen
        ):
            self.bloom = self._new_bloom(seen_count)
            self._bloom_add(seen)

        # per-host-bucket cuckoo filters (north rule seen-set mechanism)
        self._filters = None
        if self.cfg.seen_filter == "cuckoo":
            from web_crawler_spark.operators.cuckoo import build_filters

            if meta is not None and os.path.exists(self._p("cuckoo", rnd)):
                self._filters = self._read_round("cuckoo", rnd)
            else:
                self._filters = build_filters(
                    self.read_all("seen"),
                    capacity_per_bucket=self.cfg.cuckoo_capacity_per_bucket,
                )
                self._write(self._filters, "cuckoo", rnd)
                self._filters = self._read_round("cuckoo", rnd)

        stats = CrawlStats(rounds=rnd, total_visits=total_visits)
        pages = self.pages
        # driver-side thread pool for the three independent per-round
        # sinks (fetch_log / documents / blocked): Spark schedules the
        # jobs concurrently, overlapping their fixed scheduling latency
        # — all three read only persisted upstream frames and write
        # disjoint directories; the frontier/seen commit stays ordered
        sink_pool = ThreadPoolExecutor(max_workers=4)

        # Pipelined commits (deterministic mode): when lineage is
        # deterministic (no HTTP fetcher), no rows are deferred, and no
        # stateful filter needs the durable table mid-run, every parquet
        # write is a pure CHECKPOINT — round r+1 can proceed from the
        # persisted in-memory frames while round r's frontier/seen/sink
        # files land in the background. The round-commit protocol is
        # unchanged (meta r is written only after every round-r file is
        # durable, by a single ordered committer thread, so crash
        # recovery via _prune_orphan_rounds works exactly as before);
        # only the WAITING moves off the critical path. Profiling at
        # fixture scale put ~45% of round wall time inside blocking
        # parquet commits of already-computed data.
        no_defer = (
            self.cfg.max_per_host_round is None and self._budgets is None
        )
        pipelined = (
            self.cfg.pipeline_commits
            and self._fetcher is None
            and no_defer
            and self._filters is None
            and not self.cfg.upsert_pages
        )
        commit_pool = ThreadPoolExecutor(max_workers=1)
        commit_futs: list = []
        prev_round: dict | None = None
        frontier_rows = _parquet_rows(self._p("frontier", rnd))

        # loop-invariant Column expressions, built ONCE: every F.* call
        # is a py4j round trip, and profiling shows plan construction is
        # ~half of each round's wall time at fixture scale — unresolved
        # Columns are reusable across rounds (they bind by name at
        # analysis), so hoist everything that doesn't reference the
        # round number
        found = F.col("status_code").isNotNull()
        retry_ok = (
            F.coalesce(F.col("first_attempts_429"), F.lit(0)) <= MAX_RETRIES_429
        )
        ct = F.lower(F.coalesce(F.col("content_type"), F.lit("")))
        is_2xx = F.col("status_code").between(200, 299)
        ct_ok = ct.contains("text/html") | ct.contains("application/json")
        success = found & retry_ok & is_2xx & ct_ok
        error = (
            F.when(~found, F.lit("connection error"))
            .when(~retry_ok, F.lit("http error: 429"))
            .when(~is_2xx, F.concat(F.lit("http error: "), F.col("status_code")))
            .when(~ct_ok, F.concat(F.lit("ignored content type: "), ct))
        )
        fetch_log_cols = [
            F.col("siteid"), F.col("url_key"), F.col("depth"),
            F.coalesce(
                F.when(~retry_ok, F.lit(429)), F.col("status_code"), F.lit(0)
            ).alias("status_code"),
            ct.alias("content_type"),
            F.col("_success").alias("success"),
            F.col("_error").alias("error"),
            F.col("response_time_ms"),
            F.col("content_length"),
            F.col("visit_ord"),
            F.col("parent_key"),
        ]
        base_key = registrable_host_col(F.col("url_key"))
        # parse gate (P9): only successful text/html fetches feed the
        # parser — the UDF sees NULL elsewhere and returns [] without
        # touching the payload
        parse_gate = success & ct.contains("text/html")
        spans1_col = extract_spans_udf(
            F.when(parse_gate, F.col("html")), F.col("url_key")
        )
        use_rendered_col = (
            parse_gate
            & (F.size(outlink_spans_col(F.col("spans1"), base_key)) == 0)
            & needs_js_col(F.col("html"))
            & F.col("rendered_html").isNotNull()
        )
        spans_col = F.when(
            F.col("_use_rendered"),
            extract_spans_udf(
                F.when(F.col("_use_rendered"), F.col("rendered_html")),
                F.col("url_key"),
            ),
        ).otherwise(F.col("spans1"))
        outlinks_col = outlink_spans_col(F.col("spans"), base_key)
        doc_cols = [
            canonical_id_udf(F.col("url_key"), F.col("seed_url")).alias("doc_id"),
            F.col("siteid"), F.col("spans"), F.col("visit_ord"),
        ]
        cand_cols = [
            F.col("siteid"), F.col("seed_url"), F.col("seed_host_key"),
            F.col("url_key").alias("parent_key"),
            F.col("visit_ord").alias("parent_ord"),
            (F.col("depth") + 1).alias("depth"),
            F.posexplode("outlinks").alias("link_idx", "span"),
        ]
        block_type_col = classify_block_col(F.col("u"))
        domain_ok = allowed_domain_col(F.col("seed_url"), F.col("u"))
        domain_block_col = F.when(
            F.col("block_type").isNull() & ~domain_ok, F.lit("DOMAIN_FILTER")
        ).otherwise(F.col("block_type"))
        norm_url_col = normalize_url_udf(F.col("u"))
        seen_cols = [
            F.col("siteid"), F.col("url_key"), F.col("host_bucket"),
            F.col("depth").alias("first_depth"),
        ]

        session_sp = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        try:
            while stats.rounds < self.cfg.max_rounds:
                t_round = time.perf_counter()
                frontier_count = (
                    frontier_rows
                    if pipelined
                    else _parquet_rows(self._p("frontier", stats.rounds))
                )
                if frontier_count == 0:
                    break
                r = stats.rounds + 1

                if self.cfg.auto_shuffle_partitions:
                    # size exchanges to THIS round's data (see CrawlConfig):
                    # a small round plans narrow exchanges instead of
                    # session-width ones; a big round keeps full width
                    self.spark.conf.set(
                        "spark.sql.shuffle.partitions",
                        max(
                            self.cfg.min_shuffle_partitions,
                            min(
                                session_sp,
                                frontier_count
                                // self.cfg.shuffle_rows_per_task
                                + 1,
                            ),
                        ),
                    )

                # -- dequeue ------------------------------------------------
                batch, deferred = dequeue_batch(
                    frontier, self.cfg.max_per_host_round, self._budgets,
                    self.cfg.dequeue_salts,
                )
                batch_count = (
                    frontier_count
                    if self.cfg.max_per_host_round is None and self._budgets is None
                    else batch.count()
                )
                if batch_count == 0:
                    break

                # -- visit ordinals (global BFS rank) ------------------------
                batch = with_global_rank(
                    batch,
                    # url_key breaks the all-null tie of the seed round
                    # (parent_ord/link_idx are null for seeds) so seed
                    # order is deterministic; later rounds are already
                    # unique on (depth, parent_ord, link_idx)
                    ["depth", "parent_ord", "link_idx", "url_key"],
                    out="visit_ord",
                    start=stats.total_visits + 1,
                    small_threshold=self.cfg.rank_small_threshold,
                    known_count=batch_count,
                ).join(seeds_dim, "siteid")

                # -- fetch: mapInPandas callback per host_bucket partition
                # (production HTTP seam) or equi-join vs the synthetic pages
                # table (AQE broadcasts the small side)
                # -- fetch + parse, payload never persisted -------------------
                # The raw html/rendered_html bytes live and die inside the
                # stage that produced them: spans are computed before any
                # persist/exchange and html is dropped, so page payloads
                # are never cached, never shuffled, never re-scanned — at
                # 100 TB the payload column is ~50× the structured output,
                # and this is the difference between caching 2 TB and
                # caching 100 TB per round.
                if self._fetcher is not None:
                    # production seam: fetch AND parse fused in one
                    # mapInPandas task — html never even crosses the
                    # Python→JVM Arrow boundary
                    from web_crawler_spark.operators.fetch import (
                        fetch_parse_with_callback,
                    )

                    fetched = fetch_parse_with_callback(
                        batch, self._fetcher, self.cfg.num_host_buckets,
                        max_retries_429=MAX_RETRIES_429,
                    ).withColumns(
                        {"_success": success, "_error": error,
                         "outlinks": outlinks_col}
                    )
                else:
                    # fixture mode (synthetic pages table): parse in the
                    # join stage via the Column chain; failed / non-html
                    # rows pass the UDF a NULL and cost nothing.
                    # withColumns batches independent columns into ONE
                    # Project (one py4j trip, one analyzer node) — only
                    # genuinely dependent columns add a projection level
                    fetched = (
                        batch.join(pages, batch.url_key == pages.url, "left")
                        .drop("url")
                        .withColumns(
                            {"_success": success, "_error": error,
                             "spans1": spans1_col}
                        )
                        .withColumn("_use_rendered", use_rendered_col)
                        .withColumns({"spans": spans_col})
                        .withColumns({"outlinks": outlinks_col})
                        .drop("spans1", "_use_rendered", "html", "rendered_html")
                    )
                # cache registration runs the optimizer over the whole
                # fetch+parse plan on the driver (~190 ms/round) — do it
                # on a pool thread; every consumer joins the future
                # before triggering execution, so the parse UDF still
                # runs exactly once
                fetched_fut = sink_pool.submit(lambda df=fetched: df.persist())

                # -- sink: fetch_log (carries the visit columns too — one
                # write instead of two; visits() is a projection view) ------
                # The sink frames are CONSTRUCTED inside the pool tasks:
                # each select/filter is a py4j round trip plus JVM-side
                # analysis, and running them on the sink threads overlaps
                # that driver latency with the round's compute job (py4j
                # is multi-threaded; the closures only derive from the
                # persisted fetched/parsed frames)
                sink_futs = []

                def _write_fetch_log(r=r, df=fetched, fut=fetched_fut):
                    fut.result()
                    self._write(
                        df.select(*fetch_log_cols, F.lit(r).alias("round")),
                        "fetch_log",
                        r,
                    )

                sink_futs.append(sink_pool.submit(_write_fetch_log))

                # -- parsed view (HTML gate, P9): rows that produced spans ----
                parsed = fetched.filter(
                    F.col("_success") & ct.contains("text/html")
                ).select(
                    "siteid", "url_key", "visit_ord", "depth", "seed_url",
                    "seed_host_key", "spans", "outlinks",
                )

                # -- documents sink (doc_id = canonical id vs the seed) -------
                def _write_documents(r=r, df=parsed, fut=fetched_fut):
                    fut.result()
                    self._write(
                        df.select(*doc_cols, F.lit(r).alias("round")),
                        "documents",
                        r,
                    )

                sink_futs.append(sink_pool.submit(_write_documents))

                # -- outlink candidates → admission pipeline ------------------
                cand = (
                    parsed.select(*cand_cols)
                    .withColumn("u", F.col("span.media_ref"))
                    .drop("span")
                )
                cand = cand.withColumn("block_type", block_type_col)
                cand = cand.withColumn("block_type", domain_block_col)
                if self._robots_matcher is not None:
                    robots_ok = self._robots_matcher.allowed_udf()(
                        url_host(F.col("u")),
                        url_path(F.col("u")),
                    )
                    cand = cand.withColumn(
                        "block_type",
                        F.when(
                            F.col("block_type").isNull() & ~robots_ok, F.lit("ROBOTS")
                        ).otherwise(F.col("block_type")),
                    )
                    # the robots matcher is a Python UDF — barrier it so
                    # the blocked sink and the frontier chain don't run
                    # it twice
                    cand.persist()
                # without robots, cand is a narrow NATIVE chain off the
                # persisted fetched frame (posexplode + regexp classify):
                # recomputing it for the two consumers is cheaper than a
                # cache registration, which runs the optimizer over the
                # whole UDF plan on the driver (~190 ms/round measured —
                # comparable to the executor-side work it saves)

                # fetch-stage rejects also land in the block report
                # (worker.py:168-173)
                def _write_blocked(r=r, cand=cand, fetched=fetched,
                                   fut=fetched_fut):
                    fut.result()
                    blocked = cand.filter(
                        F.col("block_type").isNotNull()
                    ).select(
                        "siteid",
                        F.col("u").alias("url"),
                        "block_type",
                        F.lit(r).alias("round"),
                    ).unionByName(
                        fetched.filter(
                            F.col("_error").startswith("ignored content type")
                        ).select(
                            "siteid",
                            F.col("url_key").alias("url"),
                            F.lit("FETCH_IGNORED_CONTENT_TYPE").alias(
                                "block_type"
                            ),
                            F.lit(r).alias("round"),
                        )
                    )
                    self._write(blocked, "blocked", r)

                sink_futs.append(sink_pool.submit(_write_blocked))

                # -- normalize (the canonicalization Arrow UDF) + dedup -------
                new_links = (
                    cand.filter(F.col("block_type").isNull())
                    .withColumn("url_key", norm_url_col)
                    .drop("u", "block_type", "seed_url", "seed_host_key")
                )
                if self.cfg.max_depth is not None:
                    new_links = new_links.filter(
                        F.col("depth") <= F.lit(self.cfg.max_depth)
                    )
                # first-wins inside the batch (frontier.py:46-49 under BFS order)
                new_links = first_wins(
                    new_links,
                    ["siteid", "url_key"],
                    ["depth", "parent_ord", "link_idx"],
                )
                new_links = self._frontier_row_cols(
                    new_links.select(
                        "siteid", "url_key", "depth", "parent_ord", "link_idx",
                        "parent_key",
                    )
                )
                # cross-round dedup: prefilter + exact anti-join (FP-safe)
                probed = None
                if self._filters is not None:
                    from web_crawler_spark.operators.cuckoo import probe_candidates

                    probed = probe_candidates(new_links, self._filters).persist()
                    definite = probed.filter(~F.col("_maybe_seen")).drop(
                        "_maybe_seen"
                    )
                    suspects = (
                        probed.filter(F.col("_maybe_seen"))
                        .drop("_maybe_seen")
                        .join(seen, ["siteid", "url_key"], "left_anti")
                    )
                    new_links = definite.unionByName(suspects)
                else:
                    new_links = anti_join_seen(
                        new_links, seen, ["siteid", "url_key"], self._bloom_probe()
                    )
                # politeness off ⇒ dequeue_batch defers nothing; skip the
                # union and the seen-side anti-join below entirely
                new_frontier = (
                    new_links
                    if no_defer
                    else new_links.unionByName(deferred, allowMissingColumns=False)
                )

                # -- snapshot round state (checkpoint + lineage truncation) ---
                # persist once: the same rows feed the parquet snapshot AND
                # the seen-delta below (saves a write→read round trip per
                # round; lineage still truncates because the next round
                # re-reads the frontier from the snapshot)
                t_plan = time.perf_counter()
                if pipelined:
                    # ---- pipelined commit path (deterministic lineage) --
                    # One blocking job: localCheckpoint materializes the
                    # round (fetch+parse → admission → dedup → anti-join)
                    # AND truncates the logical plan to a LogicalRDD —
                    # without truncation, carrying `frontier = new_frontier`
                    # across rounds makes every multi-reference operator
                    # (dequeue, two-pass rank) duplicate the whole prior
                    # tree and the plan string grows exponentially with
                    # round count (measured: driver OOM inside
                    # explainString by round ~8). Every parquet write then
                    # reads the materialized partitions in the background
                    # while the next round proceeds from the in-memory
                    # frames. (Executor loss would drop checkpoint blocks
                    # — the deterministic gate plus the ordered fallback
                    # path cover the cases where that is not acceptable.)
                    fetched_fut.result()
                    new_frontier = new_frontier.localCheckpoint(eager=True)
                    cnt = new_frontier.count()
                    seen_new = new_frontier.select(
                        *seen_cols, F.lit(r).alias("round_seen")
                    )
                    t_seen = time.perf_counter()
                    frontier_fut = sink_pool.submit(
                        self._write, new_frontier, "frontier", r
                    )
                    seen_fut = sink_pool.submit(
                        self._write, seen_new, "seen", r
                    )
                    seen_count += cnt
                    if self.bloom is not None:
                        self._bloom_add(seen_new)
                    elif (
                        self.cfg.seen_filter == "bloom"
                        and seen_count >= self.cfg.use_bloom_min_seen
                    ):
                        # one-time bloom build reads the durable seen
                        # table: flush outstanding commits first
                        seen_fut.result()
                        for f in commit_futs:
                            f.result()
                        self.bloom = self._new_bloom(seen_count)
                        self._bloom_add(self.read_all("seen"))
                    t_done = time.perf_counter()

                    stats.total_visits += batch_count
                    stats.rounds = r

                    # ordered commit: meta r lands only after every
                    # round-r file is durable. The single committer
                    # thread preserves round order; a crash before the
                    # meta write leaves the round's files as orphans,
                    # pruned by _prune_orphan_rounds on resume — the
                    # recovery protocol is identical to the ordered path.
                    # PREFIX DURABILITY: each commit first joins the
                    # PREVIOUS round's commit future — if any round-r
                    # write failed, commit r raised, and re-raising it
                    # here poisons every later commit BEFORE it writes
                    # meta, so meta can never claim a round whose prefix
                    # is not fully durable (advisor r3, medium).
                    def _commit_round(
                        r=r,
                        prev=(commit_futs[-1] if commit_futs else None),
                        futs=(frontier_fut, seen_fut, *sink_futs),
                        visits=stats.total_visits,
                        base={
                            "round": r,
                            "visited": batch_count,
                            "frontier": frontier_count,
                            "deferred": 0,
                            "new_frontier": cnt,
                            "new_seen": cnt,
                        },
                        t0=t_round,
                        tp=t_plan,
                        ts=t_seen,
                        td=t_done,
                    ):
                        if prev is not None:
                            prev.result()  # poisoned prefix ⇒ no meta here
                        for f in futs:
                            f.result()
                        m = {
                            **base,
                            "blocked": _parquet_rows(self._p("blocked", r)),
                            "documents": _parquet_rows(
                                self._p("documents", r)
                            ),
                            "ms_plan": round((tp - t0) * 1000, 1),
                            "ms_seen_commit": round((ts - tp) * 1000, 1),
                            "ms_frontier_wait": 0.0,
                            "ms_filters": round((td - ts) * 1000, 1),
                            "ms_sinks_wait": 0.0,
                            "ms_round": round((td - t0) * 1000, 1),
                        }
                        stats.per_round.append(m)
                        self._append_metrics(m)
                        self._write_meta(r, visits)

                    commit_futs.append(commit_pool.submit(_commit_round))

                    # join the PREVIOUS round's writes (they had a full
                    # round of wall time to land) and release its caches.
                    # Checkpointed new_frontier blocks are NOT released —
                    # they back the in-memory seen union the anti-join
                    # probes (slim columns only; freed by GC after run).
                    if prev_round is not None:
                        for f in prev_round["futs"]:
                            f.result()
                        for df_ in prev_round["unpersist"]:
                            df_.unpersist()
                    prev_round = {
                        "futs": [frontier_fut, seen_fut, *sink_futs],
                        "unpersist": [fetched, cand],
                    }

                    frontier = new_frontier
                    frontier_rows = cnt
                    seen = seen.unionByName(
                        new_frontier.select("siteid", "url_key", "host_bucket")
                    )
                    self._seen_union_legs += 1
                    if (
                        self.cfg.seen_compact_rounds
                        and r % self.cfg.seen_compact_rounds == 0
                    ):
                        # bound the union chain (r3 verdict watch item):
                        # after K rounds the anti-join's seen frame is a
                        # union of K checkpointed legs — planning cost
                        # grows linearly with round count and every
                        # leg's checkpoint blocks stay pinned. Re-root
                        # on the durable seen table (constant plan
                        # depth, one parquet scan) once its writes are
                        # down; superseded checkpoint blocks are then
                        # GC-released. Draining the committer here is
                        # the amortized price — once per K rounds.
                        seen_fut.result()
                        for f in commit_futs:
                            f.result()
                        commit_futs.clear()
                        seen = self.read_all("seen").select(
                            "siteid", "url_key", "host_bucket"
                        )
                        self._seen_union_legs = 1
                    continue

                # ---- ordered commit path (nondeterministic fetcher,
                # politeness deferrals, cuckoo filters, or page upserts) --
                # frontier snapshot write overlaps with the seen-delta job
                # below — both only need the persisted new_frontier (the
                # first to run materializes the cache, the other reuses it);
                # the future is joined before bloom/cuckoo/meta commit
                fetched_fut.result()
                new_frontier.persist()
                frontier_fut = sink_pool.submit(
                    self._write, new_frontier, "frontier", r
                )
                # With a real (nondeterministic) fetcher, losing cached
                # new_frontier blocks on a cluster would recompute
                # nondeterministic lineage (HTTP fetch, dequeue) and let
                # seen diverge from the written frontier snapshot —
                # derive seen from the WRITTEN parquet in that case.
                # Fixture mode keeps the overlap (deterministic lineage).
                seen_base = new_frontier
                if self._fetcher is not None:
                    frontier_fut.result()
                    seen_base = self._read_round("frontier", r)
                seen_src = (
                    seen_base
                    if no_defer
                    else seen_base.join(
                        deferred.select("siteid", "url_key"),
                        ["siteid", "url_key"],
                        "left_anti",
                    )
                )
                seen_new = seen_src.select(
                    *seen_cols,
                    F.lit(r).alias("round_seen"),
                )
                self._write(seen_new, "seen", r)
                t_seen = time.perf_counter()
                frontier_fut.result()
                t_frontier = time.perf_counter()
                seen_count += _parquet_rows(self._p("seen", r))
                if self._filters is not None:
                    from web_crawler_spark.operators.cuckoo import merge_new_keys

                    self._write(
                        merge_new_keys(self._filters, self._read_round("seen", r)),
                        "cuckoo",
                        r,
                    )
                    self._filters = self._read_round("cuckoo", r)
                if probed is not None:
                    probed.unpersist()
                if self.bloom is not None:
                    self._bloom_add(self._read_round("seen", r))
                elif (
                    self.cfg.seen_filter == "bloom"
                    and seen_count >= self.cfg.use_bloom_min_seen
                ):
                    self.bloom = self._new_bloom(seen_count)
                    self._bloom_add(self.read_all("seen"))

                t_filters = time.perf_counter()
                stats.total_visits += batch_count
                stats.rounds = r
                base_metrics = {
                    "round": r,
                    "visited": batch_count,
                    "frontier": frontier_count,
                    "deferred": frontier_count - batch_count,
                    "new_frontier": _parquet_rows(self._p("frontier", r)),
                    "new_seen": _parquet_rows(self._p("seen", r)),
                    # per-phase wall ms (F6 observability): where a
                    # round's latency went — plan build, seen commit
                    # (materializes the persisted new_frontier), wait
                    # for the overlapped frontier write, seen-filter
                    # maintenance, wait for the fetch_log/documents/
                    # blocked sinks, total
                    "ms_plan": round((t_plan - t_round) * 1000, 1),
                    "ms_seen_commit": round((t_seen - t_plan) * 1000, 1),
                    "ms_frontier_wait": round((t_frontier - t_seen) * 1000, 1),
                    "ms_filters": round((t_filters - t_frontier) * 1000, 1),
                }

                if self.cfg.pipeline_sinks:
                    # r4: the sinks + upsert + metrics + meta land on
                    # the background committer (prefix-chained — see the
                    # pipelined path) while the next round proceeds from
                    # the ALREADY-DURABLE frontier/seen written above.
                    # The round's critical path no longer waits on its
                    # sink jobs: ms_sinks_wait = 0 by construction.
                    def _commit_round_ordered(
                        r=r,
                        prev=(commit_futs[-1] if commit_futs else None),
                        futs=tuple(sink_futs),
                        visits=stats.total_visits,
                        base=base_metrics,
                        t0=t_round,
                        fetched=fetched,
                        cand=cand,
                    ):
                        if prev is not None:
                            prev.result()  # poisoned prefix ⇒ no meta here
                        for f in futs:
                            f.result()
                        # S5 crawl-page upsert (mysql.py:135-142): one
                        # row per page keyed (siteid, url_key), last
                        # write wins — needs the durable fetch_log, so
                        # it belongs to the commit, not the round loop.
                        # Re-running it on crash-resume is idempotent
                        # (same keys, same data ⇒ same current rows).
                        if self.cfg.upsert_pages:
                            self._pages_table().merge(
                                self._read_round("fetch_log", r)
                            )
                        m = {
                            **base,
                            "blocked": _parquet_rows(self._p("blocked", r)),
                            "documents": _parquet_rows(
                                self._p("documents", r)
                            ),
                            "ms_sinks_wait": 0.0,
                            "ms_round": round(
                                (time.perf_counter() - t0) * 1000, 1
                            ),
                        }
                        stats.per_round.append(m)
                        self._append_metrics(m)
                        self._write_meta(r, visits)
                        fetched.unpersist()
                        cand.unpersist()

                    commit_futs.append(
                        commit_pool.submit(_commit_round_ordered)
                    )
                    new_frontier.unpersist()
                else:
                    for f in sink_futs:
                        f.result()  # surface sink errors before meta
                    t_sinks = time.perf_counter()
                    if self.cfg.upsert_pages:
                        self._pages_table().merge(
                            self._read_round("fetch_log", r)
                        )
                    now = time.perf_counter()
                    round_metrics = {
                        **base_metrics,
                        "blocked": _parquet_rows(self._p("blocked", r)),
                        "documents": _parquet_rows(self._p("documents", r)),
                        "ms_sinks_wait": round((t_sinks - t_filters) * 1000, 1),
                        "ms_round": round((now - t_round) * 1000, 1),
                    }
                    stats.per_round.append(round_metrics)
                    self._append_metrics(round_metrics)
                    self._write_meta(r, stats.total_visits)
                    fetched.unpersist()
                    cand.unpersist()
                    new_frontier.unpersist()

                frontier = self._read_round("frontier", r)
                seen = self.read_all("seen").select("siteid", "url_key")

            # drain pipelined commits before returning: every write and
            # meta commit surfaced, caches released
            if prev_round is not None:
                for f in prev_round["futs"]:
                    f.result()
                for df_ in prev_round["unpersist"]:
                    df_.unpersist()
                prev_round = None
            for f in commit_futs:
                f.result()
        finally:
            sink_pool.shutdown(wait=True)
            commit_pool.shutdown(wait=True)
            if self.cfg.auto_shuffle_partitions:
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions", session_sp
                )
        return stats

    def resume(self) -> CrawlStats:
        """Continue from the last committed round snapshot."""
        return self.run(fresh=False)

    # ------------------------------------------------------------------
    # result views
    # ------------------------------------------------------------------
    def visits(self) -> DataFrame:
        return self.read_all("fetch_log").select(
            "siteid", "url_key", "visit_ord", "depth", "parent_key", "round"
        )

    def documents(self) -> DataFrame:
        """Latest spans per (siteid, doc_id) — the oracle's last-write-wins
        dict semantics (www-alias pages share a canonical doc_id)."""
        docs = self.read_all("documents")
        return first_wins(
            docs.withColumn("_neg", -F.col("visit_ord")),
            ["siteid", "doc_id"],
            ["_neg"],
        ).drop("_neg")

    def seen_keys(self) -> DataFrame:
        return self.read_all("seen").select("siteid", "url_key")

    def edges(self) -> DataFrame:
        """F7 discovery-graph edges (frontier.py:63-68): one row per
        (parent_key → url_key) discovery, with depth and round."""
        return (
            self.read_all("frontier")
            .filter(F.col("parent_key").isNotNull())
            .select(
                "siteid",
                F.col("parent_key").alias("parent"),
                F.col("url_key").alias("child"),
                "depth",
                "round",
            )
        )

    def routing_graph(self) -> DataFrame:
        """F7 adjacency view (observability_ui.py:58-64 shape):
        parent → ordered child list."""
        return (
            self.edges()
            .groupBy("siteid", "parent")
            .agg(F.sort_array(F.collect_list("child")).alias("children"))
        )

    def export_json(self, table: str, path: str) -> None:
        """S9 (export_data.py:13-46): full-table JSON export — one JSON
        object per line, written distributed (no driver materialize)."""
        self.read_all(table).write.mode("overwrite").json(path)

    def metrics(self) -> DataFrame:
        """Per-round metrics table (F6/F8): one row per committed round."""
        p = os.path.join(self.cfg.state_dir, "metrics.jsonl")
        return self.spark.read.json(p)

    def partition_lineage(self) -> DataFrame:
        """North-rule per-partition lineage: per (round, host_bucket)
        counts of frontier rows and seen keys — which bucket produced
        what, when; joins back to any round snapshot by (round,
        host_bucket)."""
        f = self.read_all("frontier").groupBy("round", "host_bucket").agg(
            F.count("*").alias("frontier_rows"),
            F.countDistinct("host").alias("hosts"),
        )
        s = (
            self.read_all("seen")
            .groupBy("round", "host_bucket")
            .agg(F.count("*").alias("seen_keys"))
            .withColumnRenamed("round", "r2")
            .withColumnRenamed("host_bucket", "b2")
        )
        return f.join(
            s,
            (F.col("round") == F.col("r2")) & (F.col("host_bucket") == F.col("b2")),
            "full_outer",
        ).select(
            F.coalesce("round", "r2").alias("round"),
            F.coalesce("host_bucket", "b2").alias("host_bucket"),
            F.coalesce("frontier_rows", F.lit(0)).alias("frontier_rows"),
            F.coalesce("hosts", F.lit(0)).alias("hosts"),
            F.coalesce("seen_keys", F.lit(0)).alias("seen_keys"),
        )

    def consistency_check(self) -> dict:
        """A2 (audit_run.py:114-115): per-round totals must add up —
        every dequeued URL is accounted for in the fetch log, and
        fetch_log splits exactly into success + failure classes.
        Raises AssertionError on violation; returns the totals."""
        fl = self.read_all("fetch_log")
        agg = fl.agg(
            F.count("*").alias("total"),
            F.count(F.when(F.col("success"), 1)).alias("ok"),
            F.count(F.when(~F.col("success") & F.col("error").startswith("ignored"), 1)).alias("ignored"),
            F.count(
                F.when(~F.col("success") & ~F.col("error").startswith("ignored"), 1)
            ).alias("failed"),
        ).collect()[0]
        total, ok, ignored, failed = (
            agg["total"], agg["ok"], agg["ignored"], agg["failed"]
        )
        assert total == ok + ignored + failed, (total, ok, ignored, failed)
        meta = self._read_meta()
        if meta is not None:
            assert total == meta["total_visits"], (total, meta["total_visits"])
        return {"total": total, "ok": ok, "ignored": ignored, "failed": failed}

    def blocked_report(self, max_urls: int = 10_000) -> DataFrame:
        """A4/P10: per-rule counts + URL lists (worker.py:168-247).

        Counts are exact; the URL list is a deterministic first-N
        sample (url-sorted). The reference accumulates EVERY url per
        rule — at 100× one block_type group would hold ~10^9 URLs in a
        single task's agg buffer, so the sample is rank-limited BEFORE
        the collect (WindowGroupLimit evaluates the top-N below the
        exchange, map-side), and only ≤ max_urls rows per rule ever
        reach a buffer. Default is far above fixture sizes, so
        fixture-parity output is unchanged."""
        b = self.read_all("blocked")
        counts = b.groupBy("block_type").agg(F.count("*").alias("count"))
        w = Window.partitionBy("block_type").orderBy("url")
        sample = (
            b.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_urls)
            .groupBy("block_type")
            .agg(F.sort_array(F.collect_list("url")).alias("urls"))
        )
        return counts.join(sample, "block_type", "left")
