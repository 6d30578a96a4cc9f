"""Query catalog: every SURVEY.md §2 operator shape as a (Spark
DataFrame plan, DuckDB oracle SQL) pair over the driver's testdata
tables, plus the training-data-pipeline extras (dedup / similarity /
text analysis) and rows-only crawl-engine queries.

Contract (task brief): each entry in QUERIES is a callable
``(spark, sf_dir) -> DataFrame``; ORACLES holds the matching ANSI SQL
DuckDB runs on the same parquet (views: region nation customer
supplier part orders lineitem events documents embeddings). Column
names are aliased identically on both sides — the driver sorts
columns by name before hashing values. Float aggregates are rounded
(or routed through decimal) so both engines hash identically.

Operator IDs in the names refer to SURVEY.md §2 (e.g. a1 = per-group
conditional aggregation, o6 = top-k per partition — the frontier
dequeue shape).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from web_crawler_spark.functions.text import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    alpha_ratio_col,
    gopher_stats_udf,
    language_id_udf,
    make_gram_key_udf,
    pii_scrub_col,
    quality_band_col,
    quality_score_col,
    rolling_fingerprint_udf,
    stopword_hits_col,
    subword_count_col,
    token_count_col,
)
from web_crawler_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_blocked,
    simhash_pairs,
)
from web_crawler_spark.operators.similarity import brute_force_topk, lsh_topk


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _twide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table scan feeding a per-row-heavy plan (signature/band UDFs).

    Deliberately a plain scan. A ``repartition(defaultParallelism)``
    here — to spread the UDF stage beyond the single parquet split the
    bench-scale tables occupy — A/B-measured ~2× SLOWER in suite
    context (shuffling the wide text column + 32-way Python-worker
    fan-out costs more than the whole-batch-vectorized single-split
    UDF saves); warm repeat-runs had masked that. At real scale the
    scan has ≥ cores splits and needs no help."""
    return _t(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# relational / analytic shapes (SURVEY.md §2.H/I/J/K) over testdata
# ---------------------------------------------------------------------------


def q_a1_source_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 per-domain crawl summary shape: conditional counts + sum + avg
    per group (audit_run.py:64-111 → groupBy(domain))."""
    d = _t(spark, sf_dir, "documents")
    # avg to 4 decimals WITHOUT round(double): Spark's F.round goes
    # through BigDecimal.valueOf (shortest-repr) while DuckDB rounds
    # the raw double — they disagree near 4th-decimal ties. Integer
    # half-up ((sum*20000 + n) div (2n)) then one exact bigint→double
    # division is bit-identical in both engines.
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("n_chars") > 300, 1)).alias("n_long"),
            F.count(F.when(F.col("lang") == "en", 1)).alias("n_en"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .withColumn(
            "avg_chars",
            F.expr("(sum_chars * 20000 + n_docs) div (2 * n_docs)") / F.lit(10000.0),
        )
    )


ORACLE_A1 = """
SELECT source,
       count(*) AS n_docs,
       count(CASE WHEN n_chars > 300 THEN 1 END) AS n_long,
       count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST((sum(n_chars) * 20000 + count(*)) // (2 * count(*)) AS DOUBLE) / 10000.0
         AS avg_chars
FROM documents GROUP BY source
"""


def q_a3_token_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/X7 token multiset: explode tokens → count → deterministic
    top-20 (analysis_generator.py:30-48; detector.py:34-37)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("tok", "n")
    )


ORACLE_A3 = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents
), counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok)
SELECT tok, n FROM (
  SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rk FROM counts
) WHERE rk <= 20
"""


def q_a5_scalar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 dashboard scalar stats: one row of conditional counts
    (ui/app.py:126-138)."""
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
        F.count(F.when(F.col("value") > 50, 1)).alias("n_high_value"),
    )


ORACLE_A5 = """
SELECT count(*) AS n_total,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       count(CASE WHEN value > 50 THEN 1 END) AS n_high_value
FROM events
"""


def q_a6_distinct_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 distinct scan under a predicate (crawl_reader.py:6-28)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


ORACLE_A6 = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_o1_recent_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 recent-alerts shape: ORDER BY ts DESC LIMIT 5 with
    deterministic tie-break (ui/app.py:140-143). `ts_ist` is the
    reference UI's UTC→IST display conversion (ui.py:71-80) — §2.K
    date family via from_utc_timestamp."""
    e = _t(spark, sf_dir, "events")
    return (
        e.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .select(
            "event_id",
            "ts",
            "event_type",
            F.round("value", 4).alias("value"),
            F.from_utc_timestamp("ts", "Asia/Kolkata").alias("ts_ist"),
        )
        .limit(5)
    )


ORACLE_O1 = """
SELECT event_id, ts, event_type, round(value, 4) AS value,
       timezone('Asia/Kolkata', timezone('UTC', ts)) AS ts_ist
FROM events ORDER BY ts DESC, event_id DESC LIMIT 5
"""
# ts_ist: timezone('UTC', ts) pins the naive→instant interpretation to
# UTC regardless of the DuckDB session timezone (CAST(ts AS TIMESTAMPTZ)
# would use the session zone and only matched because the harness host
# ran UTC — advisor r3); the outer timezone() converts the instant to
# IST wall time, exactly Spark's from_utc_timestamp.


def q_o6_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6/F2 priority-dequeue shape: row_number per partition ≤ k —
    exactly the frontier top-k-per-host window (frontier.py:30,51)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "l_returnflag",
            "rk",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


ORACLE_O6 = """
SELECT l_returnflag, rk, l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
  FROM lineitem
) WHERE rk <= 3
"""


def q_j2_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 broadcast dim join + grouped revenue (compare_engine.py:53-66
    join shape). Small dims are broadcast; revenue goes through
    per-row round → decimal sum so both engines are bit-identical."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("p_size") < 10)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        )
    )


ORACLE_J2 = """
SELECT p_brand,
       count(*) AS n_items,
       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size < 10
GROUP BY p_brand
"""


def q_so1_snapshot_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1/J6 run-vs-run set compare: full-outer on key → added /
    deleted / common (compare_runs.py:34-57)."""
    o = _t(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .withColumn("in_a", F.lit(1))
    )
    b = (
        o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .withColumn("in_b", F.lit(1))
    )
    return (
        a.join(b, "k", "full_outer")
        .select(
            F.col("k").alias("custkey"),
            F.when(F.col("in_a").isNull(), "added")
            .when(F.col("in_b").isNull(), "deleted")
            .otherwise("common")
            .alias("status"),
        )
    )


ORACLE_SO1 = """
WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
     b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
SELECT coalesce(a.k, b.k) AS custkey,
       CASE WHEN a.k IS NULL THEN 'added'
            WHEN b.k IS NULL THEN 'deleted'
            ELSE 'common' END AS status
FROM a FULL OUTER JOIN b ON a.k = b.k
"""


def q_h1_content_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 sha256 content hashing (crawler/hasher.py:4-5) — JVM-side
    F.sha2, no UDF."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2(F.col("text"), 256).alias("content_hash"))


ORACLE_H1 = """
SELECT doc_id, sha256(text) AS content_hash FROM documents
"""


def q_a9_severity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 severity bucketing shape (compare_utils.py:349-356) applied
    to events.value as the 'defacement pct'."""
    e = _t(spark, sf_dir, "events")
    sev = (
        F.when(F.col("value") < 5, "LOW")
        .when(F.col("value") < 20, "MEDIUM")
        .when(F.col("value") < 50, "HIGH")
        .otherwise("CRITICAL")
    )
    return e.groupBy(sev.alias("severity")).agg(F.count("*").alias("n"))


ORACLE_A9 = """
SELECT CASE WHEN value < 5 THEN 'LOW'
            WHEN value < 20 THEN 'MEDIUM'
            WHEN value < 50 THEN 'HIGH'
            ELSE 'CRITICAL' END AS severity,
       count(*) AS n
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# URL admission pipeline (P1-P7, U-host) + X2 classification — native
# Catalyst expressions over a deterministic URL corpus derived from the
# part table, DuckDB-verified (the crawl fixtures aren't visible to
# DuckDB; this corpus is, because both engines construct it from the
# same rows with the same arithmetic).
# ---------------------------------------------------------------------------


def _url_corpus_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic URL corpus: one URL per part row, 12 path shapes
    covering every block rule and classification label."""
    k = F.col("p_partkey")
    ks = k.cast("string")
    host = F.concat(
        F.when(k % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("shop"),
        (k % 7).cast("string"),
        F.lit(".example.com"),
    )
    m = k % 12
    path = (
        F.when(m == 0, F.concat(F.lit("/tag/t"), ks))
        .when(m == 1, F.concat(F.lit("/author/a"), ks))
        .when(m == 2, F.concat(F.lit("/blog/page/"), (k % 9).cast("string"), F.lit("/")))
        .when(m == 3, F.concat(F.lit("/assets/img"), ks, F.lit(".png")))
        .when(m == 4, F.concat(F.lit("/static/app"), ks, F.lit(".js")))
        .when(m == 5, F.concat(F.lit("/theme"), ks, F.lit(".css")))
        .when(m == 6, F.concat(F.lit("/doc"), ks, F.lit(".pdf")))
        .when(m == 7, F.concat(F.lit("/post"), ks, F.lit("?e-page-1f="), ks))
        .when(m == 8, F.concat(F.lit("/products/item"), ks))
        .when(m == 9, F.lit("/api/v1/items"))
        .when(m == 10, F.concat(F.lit("/media/clip"), ks))
        .otherwise(F.lit("/news/page/"))
    )
    return _t(spark, sf_dir, "part").select(
        F.concat(F.lit("https://"), host, path).alias("url")
    )


_URL_CORPUS_SQL = """
corpus AS (
  SELECT 'https://' || (CASE WHEN p_partkey % 3 = 0 THEN 'www.' ELSE '' END)
         || 'shop' || CAST(p_partkey % 7 AS VARCHAR) || '.example.com'
         || CASE p_partkey % 12
            WHEN 0 THEN '/tag/t' || CAST(p_partkey AS VARCHAR)
            WHEN 1 THEN '/author/a' || CAST(p_partkey AS VARCHAR)
            WHEN 2 THEN '/blog/page/' || CAST(p_partkey % 9 AS VARCHAR) || '/'
            WHEN 3 THEN '/assets/img' || CAST(p_partkey AS VARCHAR) || '.png'
            WHEN 4 THEN '/static/app' || CAST(p_partkey AS VARCHAR) || '.js'
            WHEN 5 THEN '/theme' || CAST(p_partkey AS VARCHAR) || '.css'
            WHEN 6 THEN '/doc' || CAST(p_partkey AS VARCHAR) || '.pdf'
            WHEN 7 THEN '/post' || CAST(p_partkey AS VARCHAR)
                        || '?e-page-1f=' || CAST(p_partkey AS VARCHAR)
            WHEN 8 THEN '/products/item' || CAST(p_partkey AS VARCHAR)
            WHEN 9 THEN '/api/v1/items'
            WHEN 10 THEN '/media/clip' || CAST(p_partkey AS VARCHAR)
            ELSE '/news/page/' END AS url
  FROM part
),
parsed AS (
  SELECT url,
         lower(url) AS low,
         regexp_extract(url, '^https://[^/]+(/[^?#]*)', 1) AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS query,
         lower(regexp_extract(url, '^https://([^/]+)/', 1)) AS host
  FROM corpus
)
"""


def q_p_admission_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5-P7 block-rule battery + P4 domain filter, all native
    (functions/urls.py classify_block_col / allowed_domain_col —
    worker.py:30-78 semantics), rolled up per (block_type, in_domain)."""
    from web_crawler_spark.functions.urls import (
        allowed_domain_col,
        classify_block_col,
    )

    urls = _url_corpus_df(spark, sf_dir)
    seed = F.lit("https://shop0.example.com/")
    return (
        urls.select(
            F.coalesce(classify_block_col(F.col("url")), F.lit("ALLOWED")).alias(
                "block_type"
            ),
            allowed_domain_col(seed, F.col("url")).alias("in_domain"),
            "url",
        )
        .groupBy("block_type", "in_domain")
        .agg(F.count("*").alias("n"), F.min("url").alias("first_url"))
    )


ORACLE_P_ADMISSION = (
    "WITH "
    + _URL_CORPUS_SQL
    + r"""
SELECT CASE
         WHEN regexp_matches(path, '\.(css|js|png|jpg|jpeg|webp|gif|svg|ico|woff|woff2|ttf|eot|pdf|zip)$') THEN 'STATIC'
         WHEN regexp_matches(query, '(^|&)e-page-[0-9a-fA-F]+=') THEN 'BLOG_EPAGE'
         WHEN regexp_matches(lower(path), '^/tag/') THEN 'TAG_PAGE'
         WHEN regexp_matches(lower(path), '^/author/') THEN 'AUTHOR_PAGE'
         WHEN regexp_matches(lower(path), '/page/[0-9]*/?$') THEN 'PAGINATION'
         WHEN regexp_matches(lower(path), '^/(assets|static|media|uploads|images|img|css|js)/') THEN 'ASSET_DIRECTORY'
         ELSE 'ALLOWED' END AS block_type,
       (host = 'shop0.example.com' OR host = 'www.shop0.example.com') AS in_domain,
       count(*) AS n,
       min(url) AS first_url
FROM parsed
GROUP BY 1, 2
"""
)


def q_robots_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots evaluation (north-rule operator, no reference
    counterpart) over the URL corpus: longest-match wins, allow wins
    ties, `*` wildcards and `$` anchors. The vectorized matcher UDF
    (operators/robots.py) is mirrored in SQL as a specificity-ordered
    CASE battery — DuckDB-verified."""
    from web_crawler_spark.functions.urls import url_host, url_path
    from web_crawler_spark.operators.robots import RobotsMatcher

    hosts = [
        f"{w}shop{i}.example.com" for i in range(7) for w in ("", "www.")
    ]
    rules = [
        (h, t, p)
        for h in hosts
        for (t, p) in [
            ("disallow", "/tag/"),
            ("allow", "/tag/t1"),
            ("disallow", "*.pdf$"),
            ("disallow", "/media/"),
            ("allow", "/media/clip1"),
        ]
    ]
    matcher = RobotsMatcher(rules)
    urls = _url_corpus_df(spark, sf_dir)
    return (
        urls.select(
            url_host(F.col("url")).alias("host"),
            matcher.allowed_udf()(
                url_host(F.col("url")), url_path(F.col("url"))
            ).alias("allowed"),
            "url",
        )
        .groupBy("host", "allowed")
        .agg(F.count("*").alias("n"), F.min("url").alias("first_url"))
    )


ORACLE_ROBOTS = (
    "WITH "
    + _URL_CORPUS_SQL
    + r"""
SELECT host,
       -- longest-match-wins, allow wins ties; rules ordered by pattern
       -- specificity: /media/clip1 (12) > /tag/t1 (7) = /media/ (7,
       -- disjoint) > *.pdf$ (6) > /tag/ (5); no rule match => allowed
       CASE WHEN path LIKE '/media/clip1%' THEN true
            WHEN path LIKE '/tag/t1%' THEN true
            WHEN path LIKE '/media/%' THEN false
            WHEN regexp_matches(path, '\.pdf$') THEN false
            WHEN path LIKE '/tag/%' THEN false
            ELSE true END AS allowed,
       count(*) AS n,
       min(url) AS first_url
FROM parsed
GROUP BY 1, 2
"""
)


def q_x2_classification_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 multi-label classification distribution (A3 shape,
    analysis_generator.py:30-48) via the native classify_url_col —
    explode labels, count per type, DuckDB-verified."""
    from web_crawler_spark.functions.urls import classify_url_col

    urls = _url_corpus_df(spark, sf_dir)
    return (
        urls.select(F.explode(classify_url_col(F.col("url"))).alias("type"))
        .groupBy("type")
        .agg(F.count("*").alias("count"))
    )


ORACLE_X2_CLASSIFICATION = (
    "WITH "
    + _URL_CORPUS_SQL
    + r""",
labels AS (
  SELECT 'pagination' AS type, count(*) AS count FROM parsed
   WHERE regexp_matches(low, '(/page/|/p/|\?page=|\?p=|/pagination/)')
  UNION ALL
  SELECT 'assets_uploads', count(*) FROM parsed
   WHERE regexp_matches(low, '(/uploads/|/assets/|/media/|/files/)')
      OR regexp_matches(lower(path), '\.(pdf|jpg|jpeg|png|gif|svg)$')
  UNION ALL
  SELECT 'scripts_styles', count(*) FROM parsed
   WHERE regexp_matches(lower(path), '\.(css|js)$')
  UNION ALL
  SELECT 'api_like', count(*) FROM parsed
   WHERE regexp_matches(low, '(wp-json|/api/)')
  UNION ALL
  SELECT 'normal_html', count(*) FROM parsed
   WHERE NOT (regexp_matches(low, '(/page/|/p/|\?page=|\?p=|/pagination/)')
           OR regexp_matches(low, '(/uploads/|/assets/|/media/|/files/)')
           OR regexp_matches(lower(path), '\.(pdf|jpg|jpeg|png|gif|svg)$')
           OR regexp_matches(lower(path), '\.(css|js)$')
           OR regexp_matches(low, '(wp-json|/api/)'))
)
SELECT type, count FROM labels WHERE count > 0
"""
)


# ---------------------------------------------------------------------------
# training-data pipeline: deduplication (task brief §extras)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return exact_dedup_groups(d, "doc_id", "text")


ORACLE_DEDUP_EXACT = """
SELECT sha256(text) AS content_hash,
       count(*) AS n_copies,
       min(doc_id) AS keeper_id
FROM documents GROUP BY 1
"""


# above this corpus size the blocked-tile plan's m_a·m_b per-tile bins
# outgrow task memory — switch to the AllPairs prefix join
_NGRAM_BLOCKED_MAX_DOCS = 1_000_000


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard pairs ≥ 0.2 (the SQL-verifiable
    near-dup tier; assumes ≥2 tokens per doc — true for testdata).

    Picks the physical plan by corpus size: the blocked-tile plan
    (exact numpy intersection counting) beats the AllPairs prefix join
    ~20× at ≤10^6 docs because a shared-vocabulary corpus defeats
    prefix filtering, but its per-tile cost is quadratic — past
    _NGRAM_BLOCKED_MAX_DOCS the asymptotic AllPairs prefix join
    (ngram_jaccard_pairs) takes over. Both plans are oracled (this
    entry + dedup_ngram_jaccard_allpairs) and equivalence-tested in
    tests/test_dedup.py."""
    d = _t(spark, sf_dir, "documents")
    if d.count() > _NGRAM_BLOCKED_MAX_DOCS:
        return ngram_jaccard_pairs(d, "doc_id", "text", n=2, threshold=0.2)
    return ngram_jaccard_pairs_blocked(d, "doc_id", "text", n=2, threshold=0.2)


def q_dedup_ngram_jaccard_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100×-scale exact-Jaccard plan on its own oracle row: prefix-
    filtered AllPairs set-similarity join (Bayardo et al. WWW'07) —
    never quadratic, shuffles only candidate prefixes."""
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=2, threshold=0.2)


_NGRAM_PAIRS_CTES = r"""
g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w)),
                                      i -> w[i] || ' ' || w[i+1])) AS grams
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        FROM documents)
), e AS (SELECT doc_id, unnest(grams) AS gr FROM g),
sizes AS (SELECT doc_id, len(grams) AS n FROM g),
inter AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS ni
  FROM e l JOIN e r ON l.gr = r.gr AND l.doc_id < r.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b, ni, sa.n AS na, sb.n AS nb
  FROM inter
  JOIN sizes sa ON inter.id_a = sa.doc_id
  JOIN sizes sb ON inter.id_b = sb.doc_id
  WHERE ni / (sa.n + sb.n - ni) >= 0.2
)
"""

ORACLE_DEDUP_NGRAM = (
    "WITH "
    + _NGRAM_PAIRS_CTES
    + """
SELECT id_a, id_b, round(ni / (na + nb - ni), 4) AS jaccard FROM pairs
"""
)


def q_so5_rule_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO5/X6: the detector.py:40-143 severity rule chain (script
    change → HIGH, dom change → MEDIUM, token-multiset reorder → LOW,
    content change → MEDIUM, no change → NONE) over five deterministic
    document variants — fully Catalyst-native via detect_rules_paired
    (baseline and observed are derived from the same row: no join, no
    shuffle of HTML bodies)."""
    from web_crawler_spark.engine.compare import detect_rules_paired

    # plain scan: a repartition to spread the regexp chain across
    # cores A/B-measured slower in suite context (see _twide)
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    v = F.pmod(F.col("doc_id"), F.lit(5))
    pre, post = "<html><body><p>", "</p></body></html>"
    base_html = F.concat(F.lit(pre), F.col("text"), F.lit(post))
    rev = F.array_join(F.reverse(F.split(F.col("text"), " ")), " ")
    obs_html = (
        F.when(v == 1, F.concat(F.lit(pre), rev, F.lit(post)))
        .when(
            v == 2,
            F.concat(
                F.lit(pre),
                F.col("text"),
                F.lit(
                    '</p><script src="https://x.test/inject.js">'
                    "</script></body></html>"
                ),
            ),
        )
        .when(v == 3, F.concat(F.lit(pre), F.col("text"), F.lit(" zzznew" + post)))
        .when(
            v == 4,
            F.concat(
                F.lit("<html><body><div><p>"),
                F.col("text"),
                F.lit("</p></div></body></html>"),
            ),
        )
        .otherwise(base_html)
    )
    pairs = d.select(
        F.lit(1).alias("siteid"),
        F.col("doc_id").alias("url_key"),
        base_html.alias("baseline_html"),
        obs_html.alias("html"),
        F.sha2(base_html, 256).alias("baseline_hash"),
        F.sha2(obs_html, 256).alias("observed_hash"),
    )
    out = detect_rules_paired(pairs)
    return out.select(
        F.col("url_key").alias("doc_id"),
        "html_changed",
        "severity_rule",
        "severity",
    )


ORACLE_SO5_RULES = r"""
WITH p AS (
  SELECT doc_id,
    '<html><body><p>' || text || '</p></body></html>' AS bh,
    CASE CAST(doc_id % 5 AS INT)
      WHEN 1 THEN '<html><body><p>'
                  || array_to_string(list_reverse(string_split(text, ' ')), ' ')
                  || '</p></body></html>'
      WHEN 2 THEN '<html><body><p>' || text
                  || '</p><script src="https://x.test/inject.js"></script></body></html>'
      WHEN 3 THEN '<html><body><p>' || text || ' zzznew</p></body></html>'
      WHEN 4 THEN '<html><body><div><p>' || text || '</p></div></body></html>'
      ELSE '<html><body><p>' || text || '</p></body></html>'
    END AS oh
  FROM documents
),
r AS (
  SELECT doc_id,
    sha256(bh) != sha256(oh) AS changed,
    list_sort(list_distinct(regexp_extract_all(oh, '<script src="([^"]+)"', 1))) AS so,
    list_sort(list_distinct(regexp_extract_all(bh, '<script src="([^"]+)"', 1))) AS sb,
    regexp_extract_all(lower(bh), '<([a-z][a-z0-9]*)', 1) AS dbm,
    regexp_extract_all(lower(oh), '<([a-z][a-z0-9]*)', 1) AS dom,
    list_sort(list_filter(
      regexp_split_to_array(lower(regexp_replace(bh, '<[^>]+>', ' ', 'g')),
                            '[^0-9a-z_]+'), x -> x != '')) AS tb,
    list_sort(list_filter(
      regexp_split_to_array(lower(regexp_replace(oh, '<[^>]+>', ' ', 'g')),
                            '[^0-9a-z_]+'), x -> x != '')) AS tob
  FROM p
),
lab AS (
  SELECT doc_id, changed,
    CASE
      WHEN len(list_filter(so, x -> NOT list_contains(sb, x)))
         + len(list_filter(sb, x -> NOT list_contains(so, x))) > 0
        THEN 'script_src_change'
      WHEN NOT changed THEN 'none'
      WHEN dbm != dom THEN 'dom_change'
      WHEN tb = tob THEN 'semantic_reorder'
      ELSE 'content_change'
    END AS severity_rule
  FROM r
)
SELECT doc_id, changed AS html_changed, severity_rule,
  CASE severity_rule
    WHEN 'script_src_change' THEN 'HIGH'
    WHEN 'none' THEN 'NONE'
    WHEN 'semantic_reorder' THEN 'LOW'
    ELSE 'MEDIUM'
  END AS severity
FROM lab
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (rows-only; recall gated by
    `dedup_minhash_recall` against exact char-shingle Jaccard)."""
    d = _twide(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", **_minhash_cfg(sf_dir))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (rows-only; recall gated by
    `dedup_simhash_recall` — the 4-chunk blocking is provably lossless
    for hamming ≤ 3 and the gate measures exactly that)."""
    d = _twide(spark, sf_dir, "documents")
    return simhash_pairs(d, "doc_id", "text", max_hamming=SIMHASH_MAX_HAMMING)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: exact bigram-Jaccard pairs (≥0.2)
    → distributed connected components (iterative min-label
    propagation). Oracle: the same pair CTEs + a recursive reachability
    CTE in DuckDB — every doc maps to the min doc_id in its component."""
    from web_crawler_spark.operators.dedup import dedup_clusters

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs_blocked(d, "doc_id", "text", n=2, threshold=0.2)
    return dedup_clusters(d.select("doc_id"), pairs)


ORACLE_DEDUP_CLUSTERS = (
    "WITH RECURSIVE "
    + _NGRAM_PAIRS_CTES
    + """,
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s
)
SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
"""
)


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (5th dedup tier): exact all-pairs
    via blocked numpy matmul in applyInPandas; DuckDB-verified."""
    from web_crawler_spark.operators.similarity import embedding_cosine_pairs

    e = _t(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(e, threshold=0.4, num_blocks=8, sim_round=4)


ORACLE_DEDUP_EMBEDDING = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs (rows-only: approximate by
    design — the 10^9-vector path with no quadratic stage)."""
    from web_crawler_spark.operators.similarity import (
        embedding_cosine_pairs_lsh,
    )

    e = _twide(spark, sf_dir, "embeddings")
    # banding sized by the lsh_plan S-curve planner from the parquet
    # footer count (r5): band width grows with log n so the candidate
    # mass stays sublinear at production corpus sizes instead of
    # inheriting a fixture-scale config. Recall gated by
    # `dedup_embedding_lsh_recall`.
    return embedding_cosine_pairs_lsh(e, sim_round=4, **_emb_lsh_cfg(sf_dir))


# ---------------------------------------------------------------------------
# training-data pipeline: text analysis
# ---------------------------------------------------------------------------


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts + quality score + band — all native
    Catalyst expressions (functions/text.py), SQL-mirrored exactly."""
    d = _t(spark, sf_dir, "documents")
    score = quality_score_col(F.col("text"))
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        subword_count_col(F.col("text")).alias("n_subwords"),
        F.round(alpha_ratio_col(F.col("text")), 6).alias("alpha_ratio"),
        stopword_hits_col(F.col("text")).alias("n_stopwords"),
        score.alias("quality_score"),
        quality_band_col(score).alias("quality_band"),
    )


ORACLE_TEXT_QUALITY = r"""
WITH base AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]')) AS n_subwords,
         CASE WHEN len(text) > 0
              THEN len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / len(text)
              ELSE 0.0 END AS alpha,
         len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is|it)\b')) AS n_stop,
         least(len(text) / 500.0, 1.0) AS len_score
  FROM documents
), scored AS (
  SELECT doc_id, n_tokens, n_subwords, alpha, n_stop,
         round(0.4 * len_score + 0.4 * alpha
               + 0.2 * least((CASE WHEN n_tokens > 0
                              THEN n_stop / CAST(n_tokens AS DOUBLE)
                              ELSE 0.0 END) * 5.0, 1.0), 6) AS quality_score
  FROM base
)
SELECT doc_id, n_tokens, n_subwords, round(alpha, 6) AS alpha_ratio,
       n_stop AS n_stopwords, quality_score,
       CASE WHEN quality_score < 0.25 THEN 'low'
            WHEN quality_score < 0.5 THEN 'medium'
            WHEN quality_score < 0.75 THEN 'high'
            ELSE 'excellent' END AS quality_band
FROM scored
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-marker argmax + CJK ratio) as an
    Arrow UDF; DuckDB oracle reimplements the heuristic in SQL
    (list_intersect hit counts, first-max-wins in marker order)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        language_id_udf(F.col("text")).alias("lang_pred"),
    )


ORACLE_LANG_ID = r"""
WITH w AS (
  SELECT doc_id, lang, coalesce(text, '') AS t,
         list_distinct(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+')) AS bag
  FROM documents
), h AS (
  SELECT doc_id, lang,
         len(list_intersect(bag, ['the','and','of','is','that','with'])) AS h_en,
         len(list_intersect(bag, ['der','die','und','ist','nicht','das'])) AS h_de,
         len(list_intersect(bag, ['le','la','et','les','des','est'])) AS h_fr,
         len(list_intersect(bag, ['el','la','los','que','es','una'])) AS h_es,
         len(t) AS n,
         len(regexp_extract_all(t, '[\x{4e00}-\x{9fff}]')) AS cjk
  FROM w
)
SELECT doc_id, lang,
       CASE WHEN n = 0 THEN 'und'
            WHEN cjk * 1.0 / n > 0.05 THEN 'zh'
            WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
            WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
            WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
            WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM h
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial document fingerprints (base 131 mod 2^61−1
    over utf-8 bytes, Arrow UDF); DuckDB oracle folds the same
    recurrence with list_reduce over HUGEINT (testdata text is ASCII,
    so codepoints == bytes)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", rolling_fingerprint_udf(F.col("text")).alias("fingerprint")
    )


ORACLE_FINGERPRINTS = """
SELECT doc_id,
       CASE WHEN text IS NULL OR len(text) = 0 THEN 0
            ELSE CAST(list_reduce(
              list_prepend(CAST(0 AS HUGEINT),
                list_transform(split(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
              (h, b) -> (h * 131 + b) % 2305843009213693951
            ) AS BIGINT) END AS fingerprint
FROM documents
"""


# ---------------------------------------------------------------------------
# training-data pipeline: reproducible sampling / dataset splits
# ---------------------------------------------------------------------------


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed train/val/test split (90/5/5) + an independent
    20 % sample flag (`operators/sampling.py`). Reproducible by
    construction — md5 over `doc_id|salt`, no rand(), no shuffle: the
    assignment is a pure projection the oracle recomputes
    bit-for-bit. At 10^10 rows this is scan-speed work."""
    from web_crawler_spark.operators.sampling import (
        hash_bucket_col,
        train_val_test_split,
    )

    d = _t(spark, sf_dir, "documents")
    return train_val_test_split(d, "doc_id").select(
        "doc_id",
        "split",
        (hash_bucket_col(F.col("doc_id"), "s20") < 200_000).alias(
            "in_sample20"
        ),
    )


ORACLE_DATASET_SPLIT = """
WITH b AS (
  SELECT doc_id,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 15))
             ::BIGINT % 1000000 AS sb,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|s20'), 1, 15))
             ::BIGINT % 1000000 AS qb
  FROM documents
)
SELECT doc_id,
       CASE WHEN sb < 900000 THEN 'train'
            WHEN sb < 950000 THEN 'val'
            ELSE 'test' END AS split,
       qb < 200000 AS in_sample20
FROM b
"""


# ---------------------------------------------------------------------------
# training-data pipeline: similarity search over embeddings
# ---------------------------------------------------------------------------


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (query set = vec_id <
    10) — native zip_with/aggregate math, DuckDB-verified."""
    e = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(
        e, e.filter(F.col("vec_id") < 10), k=5, sim_round=4
    )


ORACLE_ANN = """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
scored AS (
  SELECT qid AS query_id, nid AS neighbor_id, list_cosine_similarity(qv, cv) AS cs
  FROM q, c WHERE qid <> nid
)
SELECT query_id, neighbor_id, round(cs, 4) AS cos_sim FROM (
  SELECT query_id, neighbor_id, cs,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cs DESC, neighbor_id ASC) AS rk
  FROM scored
) WHERE rk <= 5
"""


# shared parameter sets: the registered approximate queries and their
# recall gates (and the DuckDB-side mirrors in oracle/approx_mirror)
# must run the EXACT same configuration — one source of truth here.
#
# r5: the sign-LSH banding is no longer a hand-picked constant — it is
# SIZED by operators/lsh_plan.plan_sign_lsh from (a) the corpus count
# (deterministic: parquet footer, no Spark job) and (b) the corpus
# GEOMETRY calibration below, which is a property of the data
# distribution, not its size: testdata true neighbors sit at
# cos ≈ 0.33-0.37 and near-dup pairs at 0.4-0.6 (bit agreement
# p ≈ 0.62-0.67, barely above random). The r4 verdict's top wiring gap
# was exactly this: the fixed 16×8+probe config was grid-measured at
# fixture scale, so a 10^9-doc corpus would inherit fixture sizing;
# the planner instead grows band width with log n so the candidate
# mass stays ~n^(1+rho). Planner targets sit above the
# RECALL_FLOORS_BP floors because the target is evaluated at the
# WORST-CASE pair cosine (the threshold itself) while real pairs
# spread above it — measured recall lands above the target.
ANN_LSH_CALIB = dict(cos_dup=0.33, target_recall=0.95)
ANN_LSH_BASE = dict(dim=64, k=5)
ANN_IVF_PARAMS = dict(dim=64, k=5, num_centroids=16, nprobe=12, iters=2)
IVF_SAMPLE_PARAMS = dict(sample_rate=0.5, seed=13, salt="ivf")
MINHASH_CALIB = dict(j_dup=0.5, target_recall=0.97)
MINHASH_BASE = dict(shingle_k=5, threshold=0.5)
SIMHASH_MAX_HAMMING = 3
EMB_LSH_CALIB = dict(cos_dup=0.4, target_recall=0.93)
EMB_LSH_BASE = dict(dim=64, threshold=0.4)
# the background side of each calibration is MEASURED from the corpus
# (quantile vector via lsh_plan.measure_*_background, deterministic
# bounded sample) rather than guessed: the fixture documents corpus
# runs pair-Jaccard mean 0.18 — 3.6x the textbook 0.05 guess that
# made the r5.0 planner size 3-row bands emitting 13% of ALL pairs
# as candidates (BENCH.md §3b-app, "measured background")


def _corpus_n(sf_dir: str, table: str) -> int:
    """Row count from the parquet footer — deterministic, no Spark
    job, readable on the driver at plan time (the planner input)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, f"{table}.parquet")
    ).metadata.num_rows


def _lsh_cfg_cache(fn):
    cache: dict[str, dict] = {}

    def wrapped(sf_dir: str) -> dict:
        if sf_dir not in cache:
            cache[sf_dir] = fn(sf_dir)
        return dict(cache[sf_dir])

    return wrapped


_BG_CACHE: dict = {}


def measured_jaccard_bg(sf_dir: str):
    """Measured background pair-Jaccard quantiles of the documents
    corpus (deterministic bounded sample; cached per sf_dir). Uses the
    registered shingle width so the planner sees the same similarity
    the operator's banding join will."""
    key = ("jaccard", sf_dir)
    if key not in _BG_CACHE:
        from web_crawler_spark.operators.lsh_plan import (
            measure_jaccard_background,
        )

        _BG_CACHE[key] = measure_jaccard_background(
            os.path.join(sf_dir, "documents.parquet"),
            shingle_k=MINHASH_BASE["shingle_k"],
        )
    return _BG_CACHE[key]


def measured_cosine_bg(sf_dir: str):
    """Measured background pair-cosine quantiles of the embeddings
    corpus (deterministic bounded sample; cached per sf_dir)."""
    key = ("cosine", sf_dir)
    if key not in _BG_CACHE:
        from web_crawler_spark.operators.lsh_plan import (
            measure_cosine_background,
        )

        _BG_CACHE[key] = measure_cosine_background(
            os.path.join(sf_dir, "embeddings.parquet")
        )
    return _BG_CACHE[key]


@_lsh_cfg_cache
def _emb_lsh_cfg(sf_dir: str) -> dict:
    """Planner-sized banding for `embedding_cosine_pairs_lsh` at this
    corpus: kwargs shared verbatim by the registered query, its recall
    gate, and the DuckDB mirror."""
    from web_crawler_spark.operators.lsh_plan import plan_sign_lsh

    plan = plan_sign_lsh(
        _corpus_n(sf_dir, "embeddings"),
        cos_bg=measured_cosine_bg(sf_dir),
        **EMB_LSH_CALIB,
    )
    return dict(
        **EMB_LSH_BASE,
        num_bits=plan.num_bits,
        bands=plan.bands,
        multiprobe=plan.multiprobe,
        probe_bits=plan.probe_bits,
    )


@_lsh_cfg_cache
def _minhash_cfg(sf_dir: str) -> dict:
    """Planner-sized minhash banding (r5, symmetric with the sign-LSH
    wiring): (num_perm, bands) from `plan_minhash` at the parquet-
    footer doc count, calibrated at the worst-case pair Jaccard = the
    verify threshold itself. The planner's recall target is evaluated
    at that worst case; fixture near-dups spread above it, so the
    measured gate (floor 0.95) sits above the 0.97 target. The
    background side is MEASURED (`measured_jaccard_bg`): this
    corpus's boilerplate-heavy pair-Jaccard distribution (mean 0.18)
    makes the planner reject the 3-row bands a 0.05 guess bought —
    those bands emitted 13% of ALL pairs as candidates (BENCH.md
    §3b-app) — in favor of 4-row bands at ~1.9x lower expected
    candidate mass. Note the 100 TB caveat the cost model exposes:
    with the default max_bands=64 budget the band width tops out
    where recall is still reachable — at 10^9 docs a user should
    raise max_bands (more permutations) to buy narrower buckets; see
    plan_minhash docs."""
    from web_crawler_spark.operators.lsh_plan import plan_minhash

    plan = plan_minhash(
        _corpus_n(sf_dir, "documents"),
        j_bg=measured_jaccard_bg(sf_dir),
        **MINHASH_CALIB,
    )
    return dict(
        **MINHASH_BASE, num_perm=plan.num_bits, bands=plan.bands
    )


@_lsh_cfg_cache
def _ann_lsh_cfg(sf_dir: str) -> dict:
    """Planner-sized banding for `lsh_topk` at this corpus (same
    three-way sharing contract as `_emb_lsh_cfg`)."""
    from web_crawler_spark.operators.lsh_plan import plan_sign_lsh

    plan = plan_sign_lsh(
        _corpus_n(sf_dir, "embeddings"),
        cos_bg=measured_cosine_bg(sf_dir),
        **ANN_LSH_CALIB,
    )
    return dict(
        **ANN_LSH_BASE,
        num_bits=plan.num_bits,
        bands=plan.bands,
        multiprobe=plan.multiprobe,
        probe_bits=plan.probe_bits,
    )


def _ivf_centroids(spark: SparkSession, sf_dir: str):
    """Deterministic sample-trained IVF coarse quantizer, cached per
    (app, sf_dir): md5-hash sample → driver numpy Lloyd (FAISS
    practice — IVF centroids train on a bounded sample, never the
    corpus). Reproducible at any parallelism, which is what lets the
    recall oracle rebuild the identical quantizer."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cache = _ivf_centroids.__dict__.setdefault("_cache", {})
    if key not in cache:
        from web_crawler_spark.operators.similarity import (
            sample_train_centroids,
        )

        cache[key] = sample_train_centroids(
            _t(spark, sf_dir, "embeddings"),
            dim=ANN_IVF_PARAMS["dim"],
            k=ANN_IVF_PARAMS["num_centroids"],
            iters=ANN_IVF_PARAMS["iters"],
            **IVF_SAMPLE_PARAMS,
        )
    return cache[key]


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (rows-only; recall gated by
    `ann_ivf_recall`): spherical k-means coarse quantizer trained on a
    deterministic md5-hash sample, nprobe-cell probe, exact in-cell
    re-rank — the second scale path beside LSH. The sample-trained
    quantizer (r4) replaces the distributed `kmeans_fit` here: its
    centroids are bit-reproducible at any parallelism (kmeans_fit's
    partition-order float sums are not), so the query output is
    deterministic and driver-oracle-able; `kmeans_fit` remains the
    in-cluster trainer for corpora whose sample can't sit on the
    driver."""
    from web_crawler_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        e,
        e.filter(F.col("vec_id") < 10),
        dim=ANN_IVF_PARAMS["dim"],
        k=ANN_IVF_PARAMS["k"],
        num_centroids=ANN_IVF_PARAMS["num_centroids"],
        nprobe=ANN_IVF_PARAMS["nprobe"],
        iters=ANN_IVF_PARAMS["iters"],
        sim_round=4,
        centroids=_ivf_centroids(spark, sf_dir),
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (rows-only; recall gated by
    `ann_lsh_recall`; the 100 TB path where the cross product is
    impossible).

    r5: the banding (band width, band count, probe bits) comes from
    `lsh_plan.plan_sign_lsh` sized to THIS corpus count at the
    calibrated neighbor cosine (ANN_LSH_CALIB) — band width grows
    with log n, so production corpus sizes get sparser buckets
    instead of inheriting a fixture-scale config. Floor asserted by
    the driver-oracled companion row `ann_lsh_recall`."""
    e = _t(spark, sf_dir, "embeddings")
    return lsh_topk(
        e,
        e.filter(F.col("vec_id") < 10),
        sim_round=4,
        **_ann_lsh_cfg(sf_dir),
    )


# ---------------------------------------------------------------------------
# recall gates for the approximate tiers (r4): each approximate query
# gets a driver-oracled companion row measuring recall vs the exact
# tier on the same fixtures, with an asserted floor. The Spark side
# computes BOTH tiers live (distributed); the DuckDB side computes the
# exact tier itself in SQL and reads the approximate tier from a
# parquet pre-materialized by the pure-pandas mirror
# (oracle/approx_mirror.py — same deterministic kernels via the
# pandas_udf .func views, independent orchestration). A green row ⇒
# the distributed candidate generation / re-rank / top-k reproduces
# the in-memory reference exactly AND recall clears the floor.
# All recall arithmetic is INTEGER (basis points via floor division)
# so the two engines hash identically with zero float risk.
# ---------------------------------------------------------------------------

# floors in basis points (recall ≥ floor_bp/10000), set from measured
# values at sf0.01 AND sf0.1 with safety margin (see BENCH.md §recall)
RECALL_FLOORS_BP = {
    "ann_lsh_recall": 8500,  # measured 9400 (sf0.1) / 9800 (sf0.01)
    # r5 nprobe sweep (tools/bench_ivf_nprobe.py): recall tracks the
    # scanned fraction near-linearly on this near-uniform corpus (no
    # knee), so the floor is bought with probes: nprobe 10->12 lifts
    # recall 8600->9200 (sf0.1) / 9200->9400 (sf0.01) at 1.21x scan
    # cost (0.75n vs 0.62n), flat wall at this n. Deterministic, so
    # the 2-point margin over the floor cannot drift run-to-run.
    "ann_ivf_recall": 9000,  # measured 9200 (sf0.1) / 9400 (sf0.01)
    "dedup_minhash_recall": 9500,  # measured 10000 / 10000
    "dedup_simhash_recall": 10000,  # provably lossless (pigeonhole)
    "dedup_embedding_lsh_recall": 8500,  # measured 9110 / 9660
}


def _mirror_sf_dir() -> str:
    """The sf dir the approximate-side mirror parquet is built from.
    Must equal the sf_dir the driver passes to the Spark queries: the
    driver runs correctness at sf0.01 (the default here); local runs
    via tools/validate_oracles.py export the same env var it reads."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _recall_summary(
    tier: str, exact: DataFrame, approx: DataFrame, keys: list[str]
) -> DataFrame:
    """One-row integer recall summary: |approx ∩ exact| / |exact|."""
    floor_bp = RECALL_FLOORS_BP[tier]
    hit = approx.select(*keys).join(exact.select(*keys), keys, "left_semi")
    e = exact.agg(F.count("*").alias("n_exact"))
    a = approx.agg(F.count("*").alias("n_approx"))
    h = hit.agg(F.count("*").alias("n_hit"))
    return (
        e.crossJoin(a)
        .crossJoin(h)
        .select(
            F.lit(tier).alias("tier"),
            "n_exact",
            "n_approx",
            "n_hit",
            F.when(
                F.col("n_exact") > 0,
                F.expr("n_hit * 10000 div n_exact"),
            )
            .otherwise(F.lit(10000))
            .cast("long")
            .alias("recall_bp"),
            F.lit(floor_bp).cast("long").alias("floor_bp"),
            (
                F.col("n_hit") * 10000 >= F.lit(floor_bp) * F.col("n_exact")
            ).alias("meets_floor"),
        )
    )


def _recall_tail_sql(tier: str) -> str:
    floor_bp = RECALL_FLOORS_BP[tier]
    return f"""
SELECT '{tier}' AS tier, n_exact, n_approx, n_hit,
       CAST(CASE WHEN n_exact > 0 THEN n_hit * 10000 // n_exact
                 ELSE 10000 END AS BIGINT) AS recall_bp,
       CAST({floor_bp} AS BIGINT) AS floor_bp,
       n_hit * 10000 >= {floor_bp} * n_exact AS meets_floor
FROM m
"""


def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of `ann_lsh_topk` vs `ann_brute_force_topk` (same 10
    queries, same corpus), floor-asserted."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    cfg = _ann_lsh_cfg(sf_dir)
    exact = brute_force_topk(e, q, k=cfg["k"], sim_round=None)
    approx = lsh_topk(e, q, sim_round=None, **cfg)
    return _recall_summary(
        "ann_lsh_recall", exact, approx, ["query_id", "neighbor_id"]
    )


def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of `ann_ivf_topk` (sample-trained quantizer,
    nprobe=ANN_IVF_PARAMS['nprobe']) vs brute force, floor-asserted."""
    from web_crawler_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(e, q, k=ANN_IVF_PARAMS["k"], sim_round=None)
    approx = ivf_topk(
        e,
        q,
        dim=ANN_IVF_PARAMS["dim"],
        k=ANN_IVF_PARAMS["k"],
        num_centroids=ANN_IVF_PARAMS["num_centroids"],
        nprobe=ANN_IVF_PARAMS["nprobe"],
        iters=ANN_IVF_PARAMS["iters"],
        sim_round=None,
        centroids=_ivf_centroids(spark, sf_dir),
    )
    return _recall_summary(
        "ann_ivf_recall", exact, approx, ["query_id", "neighbor_id"]
    )


def q_dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair recall of `dedup_minhash_lsh` vs EXACT Jaccard over the
    same 5-char shingle universe at the matched threshold (0.5) — the
    ground truth the minhash signature estimates."""
    d = _t(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs_blocked(
        d,
        "doc_id",
        "text",
        n=MINHASH_BASE["shingle_k"],
        threshold=MINHASH_BASE["threshold"],
        char=True,
    )
    approx = minhash_lsh_pairs(d, "doc_id", "text", **_minhash_cfg(sf_dir))
    return _recall_summary(
        "dedup_minhash_recall", exact, approx, ["id_a", "id_b"]
    )


def q_dedup_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair recall of `dedup_simhash` (4-chunk blocking) vs the exact
    all-pairs hamming ≤ 3 set over the same simhash values. Pigeonhole
    guarantees 1.0 — this row MEASURES that the distributed blocking
    join actually delivers it (floor = 10000, exact). The exact side's
    all-pairs self-join is a verification tier only (quadratic by
    definition); the registered scale path stays chunk-blocked."""
    from web_crawler_spark.functions.text import simhash_udf
    from web_crawler_spark.operators.barrier import barrier, release_on_gc

    d = _t(spark, sf_dir, "documents")
    hashed = barrier(  # run-once; released with the summary below
        d.select(
            F.col("doc_id").alias("_id"), simhash_udf(F.col("text")).alias("sh")
        )
    )
    l, r = hashed.alias("l"), hashed.alias("r")
    exact = (
        l.join(r, F.col("l._id") < F.col("r._id"))
        .withColumn(
            "hamming", F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
    )
    approx = simhash_pairs(
        d, "doc_id", "text", max_hamming=SIMHASH_MAX_HAMMING
    )
    return release_on_gc(
        _recall_summary("dedup_simhash_recall", exact, approx, ["id_a", "id_b"]),
        hashed,
    )


def q_dedup_embedding_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair recall of `dedup_embedding_lsh` vs the exact cosine ≥ 0.4
    pair set (`dedup_embedding`), floor-asserted."""
    from web_crawler_spark.operators.similarity import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_lsh,
    )

    e = _t(spark, sf_dir, "embeddings")
    cfg = _emb_lsh_cfg(sf_dir)
    exact = embedding_cosine_pairs(
        e, threshold=cfg["threshold"], num_blocks=8, sim_round=None
    )
    approx = embedding_cosine_pairs_lsh(e, sim_round=None, **cfg)
    return _recall_summary(
        "dedup_embedding_lsh_recall", exact, approx, ["id_a", "id_b"]
    )


_ANN_EXACT_CTES = """
q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
scored AS (SELECT qid, nid, list_cosine_similarity(qv, cv) AS cs
           FROM q, c WHERE qid <> nid),
exact AS (SELECT qid AS query_id, nid AS neighbor_id FROM (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cs DESC, nid ASC) AS rk
  FROM scored) WHERE rk <= 5)
"""

_RECALL_M_SQL = """
m AS (SELECT (SELECT count(*) FROM exact) * (SELECT ok FROM guard) AS n_exact,
             (SELECT count(*) FROM approx) AS n_approx,
             (SELECT count(*) FROM approx a
              JOIN exact e USING ({keys})) AS n_hit)
"""


def _mirror_guard_cte(mirror_path: str, corpus_table: str) -> str:
    """Guard CTE every recall oracle multiplies into n_exact: raises
    via DuckDB error() when the pre-materialized mirror parquet was
    built from a different corpus than the registered views (companion
    .meta.parquet row count vs live count(*)). Without it, a recall
    oracle run against a different sf than SPARK_GRAFT_SF_DIR pointed
    at during materialization reports a plausible-looking recall of ~0
    instead of failing loudly (r4 verdict watch item 2)."""
    from web_crawler_spark.oracle.approx_mirror import mirror_meta_path

    meta = mirror_meta_path(mirror_path)
    # live fingerprint must match oracle.approx_mirror.corpus_fingerprint
    # term for term (integer, order-independent)
    if corpus_table == "documents":
        live = (
            "SELECT count(*) AS n, sum(doc_id) AS ids, "
            "sum(len(coalesce(text, ''))) AS fp FROM documents"
        )
    else:
        live = (
            "SELECT count(*) AS n, sum(vec_id) AS ids, "
            "sum(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) AS fp "
            "FROM embeddings"
        )
    msg = (
        f"recall mirror {mirror_path} was materialized from a different "
        f"corpus than the registered {corpus_table} view (fingerprint "
        "mismatch) -- export SPARK_GRAFT_SF_DIR to the sf under test so "
        "the mirror is rebuilt from the same tables"
    )
    return f"""guard AS (
  SELECT CASE WHEN (m.n_corpus, m.id_sum, m.content_fp) = (l.n, l.ids, l.fp)
         THEN 1 ELSE error('{msg}') END AS ok
  FROM read_parquet('{meta}') m, ({live}) l),
"""


def _ann_recall_oracle(tier: str, write_fn) -> str:
    p = write_fn()
    return (
        "WITH "
        + _ANN_EXACT_CTES
        + f", approx AS (SELECT query_id, neighbor_id FROM read_parquet('{p}')),"
        + _mirror_guard_cte(p, "embeddings")
        + _RECALL_M_SQL.format(keys="query_id, neighbor_id")
        + _recall_tail_sql(tier)
    )


def _ann_lsh_recall_oracle() -> str:
    from web_crawler_spark.oracle.approx_mirror import write_ann_lsh_topk

    return _ann_recall_oracle(
        "ann_lsh_recall",
        lambda: write_ann_lsh_topk(_mirror_sf_dir(), **_ann_lsh_cfg(_mirror_sf_dir())),
    )


def _ann_ivf_recall_oracle() -> str:
    from web_crawler_spark.oracle.approx_mirror import write_ann_ivf_topk

    return _ann_recall_oracle(
        "ann_ivf_recall",
        lambda: write_ann_ivf_topk(
            _mirror_sf_dir(),
            dim=ANN_IVF_PARAMS["dim"],
            k=ANN_IVF_PARAMS["k"],
            num_centroids=ANN_IVF_PARAMS["num_centroids"],
            nprobe=ANN_IVF_PARAMS["nprobe"],
            iters=ANN_IVF_PARAMS["iters"],
            **IVF_SAMPLE_PARAMS,
        ),
    )


def _minhash_recall_oracle() -> str:
    from web_crawler_spark.oracle.approx_mirror import write_minhash_pairs

    cfg = _minhash_cfg(_mirror_sf_dir())
    p = write_minhash_pairs(_mirror_sf_dir(), **cfg)
    k = cfg["shingle_k"]
    thr = cfg["threshold"]
    return (
        f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN ['']
              WHEN len(t) <= {k} THEN [t]
              ELSE list_distinct(list_transform(
                     range(1, len(t) - {k - 2}),
                     i -> substring(t, CAST(i AS INT), {k}))) END AS grams
  FROM (SELECT doc_id, lower(text) AS t FROM documents)
),
e AS (SELECT doc_id, unnest(grams) AS gr FROM g),
sizes AS (SELECT doc_id, len(grams) AS n FROM g),
inter AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS ni
  FROM e l JOIN e r ON l.gr = r.gr AND l.doc_id < r.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON inter.id_a = sa.doc_id
  JOIN sizes sb ON inter.id_b = sb.doc_id
  WHERE ni / (sa.n + sb.n - ni) >= {thr}
),
approx AS (SELECT id_a, id_b FROM read_parquet('{p}')),
"""
        + _mirror_guard_cte(p, "documents")
        + _RECALL_M_SQL.format(keys="id_a, id_b").lstrip()
        + _recall_tail_sql("dedup_minhash_recall")
    )


def _simhash_recall_oracle() -> str:
    from web_crawler_spark.oracle.approx_mirror import write_simhash_values

    p = write_simhash_values(_mirror_sf_dir())
    h = SIMHASH_MAX_HAMMING
    chunk_eq = " OR ".join(
        f"((a.sh >> {16 * i}) & 65535) = ((b.sh >> {16 * i}) & 65535)"
        for i in range(4)
    )
    return (
        f"""
WITH sh AS (SELECT doc_id, sh FROM read_parquet('{p}')),
p2 AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.sh, b.sh)) AS ham,
         ({chunk_eq}) AS blocked
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
),
exact AS (SELECT id_a, id_b FROM p2 WHERE ham <= {h}),
approx AS (SELECT id_a, id_b FROM p2 WHERE blocked AND ham <= {h}),
"""
        + _mirror_guard_cte(p, "documents")
        + _RECALL_M_SQL.format(keys="id_a, id_b").lstrip()
        + _recall_tail_sql("dedup_simhash_recall")
    )


def _embedding_lsh_recall_oracle() -> str:
    from web_crawler_spark.oracle.approx_mirror import (
        write_embedding_lsh_pairs,
    )

    cfg = _emb_lsh_cfg(_mirror_sf_dir())
    p = write_embedding_lsh_pairs(_mirror_sf_dir(), **cfg)
    thr = cfg["threshold"]
    return (
        f"""
WITH exact AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= {thr}
),
approx AS (SELECT id_a, id_b FROM read_parquet('{p}')),
"""
        + _mirror_guard_cte(p, "embeddings")
        + _RECALL_M_SQL.format(keys="id_a, id_b").lstrip()
        + _recall_tail_sql("dedup_embedding_lsh_recall")
    )


# ---------------------------------------------------------------------------
# crawl engine (rows-only: iterative multi-round jobs, not SQL)
# ---------------------------------------------------------------------------

_CRAWL_CACHE: dict[str, dict[str, DataFrame]] = {}


def _crawl_state(spark: SparkSession) -> dict[str, DataFrame]:
    """Run the fixture crawl once per Spark app and cache the result
    views (visits/documents/blocked/seen/fetch_log)."""
    key = spark.sparkContext.applicationId
    if key in _CRAWL_CACHE:
        return _CRAWL_CACHE[key]
    from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_pages,
        generate_sites,
    )

    cfg = WebGraphConfig(hosts=2, pages_per_host=12, seed=42)
    pages = spark.createDataFrame(generate_pages(cfg))
    sites = spark.createDataFrame(generate_sites(cfg))
    state_dir = os.path.join(tempfile.gettempdir(), f"wcs_entry_{key}")
    eng = CrawlEngine(
        spark, pages, sites, config=CrawlConfig(state_dir=state_dir)
    )
    eng.run(fresh=True)
    out = {
        "visits": eng.visits(),
        "documents": eng.documents(),
        "blocked": eng.blocked_report(),
        "seen": eng.seen_keys(),
        "fetch_log": eng.read_all("fetch_log"),
        "routing": eng.routing_graph(),
    }
    _CRAWL_CACHE[key] = out
    return out


def q_crawl_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full fixture crawl → BFS visit order. DuckDB-oracled:
    the oracle BFS runs over the generator's STRUCTURAL edge list
    (fixtures.webgraph.generate_admitted_edges — independent of the
    engine's parse/classify/normalize pipeline) as a recursive CTE:
    BFS levels → shortest-path DAG → lexicographic-min priority path,
    which is exactly the first-wins FIFO order of the reference
    (frontier.py:30,46-51)."""
    return _crawl_state(spark)["visits"].select(
        F.col("siteid").cast("long").alias("siteid"),
        "url_key",
        F.col("visit_ord").cast("long").alias("visit_ord"),
        F.col("depth").cast("long").alias("depth"),
        "parent_key",
    )


_VISITS_ORACLE_DIR = os.path.join(tempfile.gettempdir(), "wcs_visits_oracle")


def _bfs_cte_sql() -> str:
    """Write the structural edge/seed/doc-stat parquet for the fixture
    web and return the shared recursive-CTE BFS prefix (``WITH ... best``)
    the crawl_visits / crawl_routing_graph / crawl_documents oracles all
    build on.

    Priority-path equivalence: the engine ranks each round by
    (depth, parent_ord, link_idx, url_key-tiebreak-for-seeds); by
    induction parent_ord order ≡ parent priority-path order, so the
    global visit order is rank over (depth, path) with
    path = parent_path || link_ord — lists compare lexicographically
    and all compared paths at a given depth have equal length."""
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_admitted_edges,
        generate_expected_doc_stats,
        generate_seed_keys,
    )

    os.makedirs(_VISITS_ORACLE_DIR, exist_ok=True)
    e = os.path.join(_VISITS_ORACLE_DIR, "edges.parquet")
    s = os.path.join(_VISITS_ORACLE_DIR, "seeds.parquet")
    d = os.path.join(_VISITS_ORACLE_DIR, "doc_stats.parquet")
    cfg = WebGraphConfig(hosts=2, pages_per_host=12, seed=42)  # = _crawl_state
    generate_admitted_edges(cfg).to_parquet(e, index=False)
    generate_seed_keys(cfg).to_parquet(s, index=False)
    generate_expected_doc_stats(cfg).to_parquet(d, index=False)
    return f"""
WITH RECURSIVE
edges AS (SELECT src, dst, "ord" AS lord FROM read_parquet('{e}')),
doc_stats AS (SELECT * FROM read_parquet('{d}')),
seeds AS (
  SELECT siteid, url_key,
         CAST(row_number() OVER (ORDER BY url_key) AS BIGINT) AS srank
  FROM read_parquet('{s}')
),
lvl AS (
  SELECT siteid, url_key AS url, 0 AS depth FROM seeds
  UNION
  SELECT l.siteid, e.dst, l.depth + 1
  FROM lvl l JOIN edges e ON e.src = l.url
  WHERE l.depth + 1 < 64
),
dist AS (SELECT siteid, url, min(depth) AS depth FROM lvl GROUP BY 1, 2),
paths AS (
  SELECT s.siteid, s.url_key AS url, 0 AS depth,
         CAST(NULL AS VARCHAR) AS parent, [s.srank] AS path
  FROM seeds s
  UNION
  SELECT p.siteid, e.dst, p.depth + 1, p.url,
         list_append(p.path, CAST(e.lord AS BIGINT))
  FROM paths p
  JOIN dist dp ON dp.siteid = p.siteid AND dp.url = p.url
              AND dp.depth = p.depth
  JOIN edges e ON e.src = p.url
  JOIN dist dc ON dc.siteid = p.siteid AND dc.url = e.dst
              AND dc.depth = p.depth + 1
),
best AS (
  SELECT siteid, url, depth, parent, path,
         row_number() OVER (PARTITION BY siteid, url ORDER BY path) AS rk
  FROM paths
)
"""


def _visits_oracle_sql() -> str:
    return _bfs_cte_sql() + """
SELECT CAST(siteid AS BIGINT) AS siteid,
       url AS url_key,
       CAST(row_number() OVER (ORDER BY depth, path) AS BIGINT) AS visit_ord,
       CAST(depth AS BIGINT) AS depth,
       parent AS parent_key
FROM best
WHERE rk = 1
"""


def _routing_oracle_sql() -> str:
    """F7 oracle: the engine's frontier edges carry each url's FIRST
    discovery parent, which the BFS CTE proves equals the
    lexicographic-min priority-path parent — so the adjacency view is
    the BFS tree grouped by parent with lexicographically sorted
    children (sort_array ≡ ORDER BY on ASCII URLs)."""
    return _bfs_cte_sql() + """
SELECT CAST(siteid AS BIGINT) AS siteid,
       parent,
       CAST(count(*) AS BIGINT) AS n_children,
       string_agg(url, '|' ORDER BY url) AS children
FROM best
WHERE rk = 1 AND parent IS NOT NULL
GROUP BY siteid, parent
"""


def _documents_oracle_sql() -> str:
    """S8/X1 documents oracle: BFS visited set joined to the
    generator's TEMPLATE-derived span-count expectations
    (fixtures.webgraph.generate_expected_doc_stats — counting the
    template's blocks, not running the parser), aggregated per
    canonical doc_id exactly like the engine's last-write-wins
    documents view (www-alias pages share a doc_id; their span counts
    are equal by construction, so max ≡ last-write)."""
    return _bfs_cte_sql() + """
SELECT d.doc_id,
       CAST(max(d.siteid) AS BIGINT) AS siteid,
       CAST(max(d.n_spans) AS BIGINT) AS n_spans,
       CAST(max(d.n_text_spans) AS BIGINT) AS n_text_spans,
       CAST(max(d.n_link_spans) AS BIGINT) AS n_link_spans,
       CAST(max(d.n_media_spans) AS BIGINT) AS n_media_spans
FROM best b JOIN doc_stats d ON d.url_key = b.url
WHERE b.rk = 1
GROUP BY d.doc_id
"""


def q_crawl_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawled span documents (input_hint schema): per-doc span stats.
    DuckDB-oracled: BFS visited set × the generator's template-derived
    span-count expectations (see _documents_oracle_sql)."""
    docs = _crawl_state(spark)["documents"]
    return docs.select(
        "doc_id",
        F.col("siteid").cast("long").alias("siteid"),
        F.size("spans").cast("long").alias("n_spans"),
        F.size(F.filter("spans", lambda s: s["kind"] == F.lit("text")))
        .cast("long")
        .alias("n_text_spans"),
        F.size(F.filter("spans", lambda s: s["kind"] == F.lit("link")))
        .cast("long")
        .alias("n_link_spans"),
        F.size(F.filter("spans", lambda s: s["kind"] == F.lit("media")))
        .cast("long")
        .alias("n_media_spans"),
    )


def _blocked_oracle_sql() -> str:
    """A4/P10 oracle: the template-derived blocked-link expectations
    (fixtures.webgraph.generate_blocked_expectations — counting the
    template's blocked anchors per page, not running the parser or the
    classifier) joined to the BFS visited set, aggregated per rule with
    the same sorted-first-5 sample the engine's blocked_report slices."""
    from web_crawler_spark.fixtures.webgraph import (
        WebGraphConfig,
        generate_blocked_expectations,
    )

    os.makedirs(_VISITS_ORACLE_DIR, exist_ok=True)
    bx = os.path.join(_VISITS_ORACLE_DIR, "blocked_exp.parquet")
    cfg = WebGraphConfig(hosts=2, pages_per_host=12, seed=42)  # = _crawl_state
    generate_blocked_expectations(cfg).to_parquet(bx, index=False)
    return _bfs_cte_sql() + f"""
, visited AS (SELECT DISTINCT url FROM best WHERE rk = 1),
hits AS (
  SELECT b.block_type, b.url
  FROM read_parquet('{bx}') b JOIN visited v ON v.url = b.src_url
),
ranked AS (
  SELECT block_type, url,
         row_number() OVER (PARTITION BY block_type ORDER BY url) AS rn
  FROM hits
),
samples AS (
  SELECT block_type, string_agg(url, '|' ORDER BY url) AS sample_urls
  FROM ranked WHERE rn <= 5 GROUP BY block_type
)
SELECT h.block_type,
       CAST(count(*) AS BIGINT) AS count,
       s.sample_urls
FROM hits h JOIN samples s USING (block_type)
GROUP BY h.block_type, s.sample_urls
"""


def q_crawl_blocked_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/P10 block report: per-rule counts + deterministic URL sample.
    DuckDB-oracled: template-derived blocked-link expectations × BFS
    visited set (see _blocked_oracle_sql)."""
    b = _crawl_state(spark)["blocked"]
    # sample serialized with concat_ws: the driver's canonicalizer
    # sorts rows before hashing and cannot sort list cells
    return b.select(
        "block_type",
        "count",
        F.concat_ws("|", F.slice(F.sort_array("urls"), 1, 5)).alias("sample_urls"),
    )


def q_compare_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPARE flagship (compare_engine.py:36-162 — J3 join + H3 change
    detection + A8 difflib scoring + A9 severity + SO3 script diff) as
    one driver-oracled per-row query. Five deterministic page variants
    are derived per documents row (doc_id % 5): 0 unchanged, 1
    script-only injection (invisible to the semantic hash BY DESIGN —
    normalize_html drops script subtrees; script_injection_scan is the
    path that catches it), 2 text edit, 3 structural re-nest, 4 full
    defacement + injected script. The full engine path runs: baselines
    built from the base variant, observations from the mutated one,
    compare_observations joins and scores them. The DuckDB oracle
    mirrors the semantic-line/difflib math analytically (closed forms
    per variant over the 7-line semantic tree — see ORACLE_COMPARE)."""
    from web_crawler_spark.engine.compare import (
        build_baselines,
        compare_observations,
        observe_pages,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url_key"),
        F.lit(1).alias("siteid"),
        "text",
    )
    v = F.pmod(F.col("url_key").cast("long"), F.lit(5))
    pre, post = "<html><body><p>", "</p></body></html>"
    base_html = F.concat(F.lit(pre), F.col("text"), F.lit(post))
    obs_html = (
        F.when(
            v == 1,
            F.concat(
                F.lit(pre),
                F.col("text"),
                F.lit(
                    '</p><script src="https://x.test/inject.js">'
                    "</script></body></html>"
                ),
            ),
        )
        .when(v == 2, F.concat(F.lit(pre), F.col("text"), F.lit(" zzznew" + post)))
        .when(
            v == 3,
            F.concat(
                F.lit("<html><body><div><p>"),
                F.col("text"),
                F.lit("</p></div></body></html>"),
            ),
        )
        .when(
            v == 4,
            F.lit(
                '<h1>DEFACED</h1><script src="https://evil.test/x.js"></script>'
            ),
        )
        .otherwise(base_html)
    )
    base = build_baselines(d.select("siteid", "url_key", base_html.alias("html")))
    obs = observe_pages(d.select("siteid", "url_key", obs_html.alias("html")))
    out = compare_observations(obs, base)
    return out.select(
        F.col("url_key").cast("long").alias("doc_id"),
        "changed",
        F.col("defacement_score").alias("score"),
        "severity",
        F.concat_ws("|", F.sort_array("scripts_added")).alias("scripts_added"),
    )


ORACLE_COMPARE = """
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(doc_id % 5 AS INT) AS v,
         (length(trim(text)) > 0) AS has_text
  FROM documents
),
-- semantic_lines of <html><body><p>text</p></body></html> is a 7-line
-- tree (6 when text is empty); difflib changed-line counts per variant:
-- v2 replaces the text line (or inserts it when base had none), v3
-- re-indents the 3 middle lines (2 when no text), v4 shares no line
-- with the baseline so every baseline line counts; v1's script-only
-- change is invisible to the noise-dropping hash so changed=false
s AS (
  SELECT doc_id, v,
         CAST(6 + CASE WHEN has_text THEN 1 ELSE 0 END AS DOUBLE) AS base_lines,
         CASE v
           WHEN 2 THEN 1.0
           WHEN 3 THEN CASE WHEN has_text THEN 3.0 ELSE 2.0 END
           WHEN 4 THEN CAST(6 + CASE WHEN has_text THEN 1 ELSE 0 END AS DOUBLE)
           ELSE 0.0
         END AS changed_lines
  FROM p
),
sc AS (
  SELECT doc_id, v,
         v IN (2, 3, 4) AS changed,
         round(least(100.0, 100.0 * changed_lines / base_lines), 2) AS score
  FROM s
)
SELECT doc_id, changed, score,
       CASE WHEN NOT changed THEN 'NONE'
            WHEN score < 5 THEN 'LOW'
            WHEN score < 20 THEN 'MEDIUM'
            WHEN score < 50 THEN 'HIGH'
            ELSE 'CRITICAL' END AS severity,
       CASE WHEN v = 4 THEN 'https://evil.test/x.js' ELSE '' END AS scripts_added
FROM sc
"""


_A3_EXTRA_URLS = (
    "https://h.test/page/2/",
    "https://h.test/assets/x.png",
    "https://h.test/theme.css",
    "https://h.test/api/v1/items",
)


def _a3_oracle_sql() -> str:
    """A3 oracle: the fixture URL corpus is written to parquet and the
    multi-label classify rules (oracle/semantics.py:186-214) are
    re-expressed as one UNION ALL branch per label — membership is the
    parity contract, the sample is the first 3 lexicographic URLs."""
    from web_crawler_spark.fixtures.webgraph import WebGraphConfig, generate_pages
    import pandas as pd

    os.makedirs(_VISITS_ORACLE_DIR, exist_ok=True)
    p = os.path.join(_VISITS_ORACLE_DIR, "a3_urls.parquet")
    pages = generate_pages(WebGraphConfig(hosts=2, pages_per_host=12))
    pd.DataFrame({"url": list(pages["url"]) + list(_A3_EXTRA_URLS)}).to_parquet(
        p, index=False
    )
    return rf"""
WITH corpus AS (SELECT url FROM read_parquet('{p}')),
parsed AS (
  SELECT url, lower(url) AS low,
         lower(regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1)) AS path
  FROM corpus
),
labeled AS (
  SELECT 'pagination' AS type, url FROM parsed
   WHERE regexp_matches(low, '(/page/|/p/|\?page=|\?p=|/pagination/)')
  UNION ALL
  SELECT 'assets_uploads', url FROM parsed
   WHERE regexp_matches(low, '(/uploads/|/assets/|/media/|/files/)')
      OR regexp_matches(path, '\.(pdf|jpg|jpeg|png|gif|svg)$')
  UNION ALL
  SELECT 'scripts_styles', url FROM parsed
   WHERE regexp_matches(path, '\.(css|js)$')
  UNION ALL
  SELECT 'api_like', url FROM parsed
   WHERE regexp_matches(low, '(wp-json|/api/)')
  UNION ALL
  SELECT 'normal_html', url FROM parsed
   WHERE NOT (regexp_matches(low, '(/page/|/p/|\?page=|\?p=|/pagination/)')
           OR regexp_matches(low, '(/uploads/|/assets/|/media/|/files/)')
           OR regexp_matches(path, '\.(pdf|jpg|jpeg|png|gif|svg)$')
           OR regexp_matches(path, '\.(css|js)$')
           OR regexp_matches(low, '(wp-json|/api/)'))
)
SELECT type,
       CAST(count(*) AS BIGINT) AS count,
       array_to_string(list_slice(list(url ORDER BY url), 1, 3), '|') AS sample
FROM labeled
GROUP BY type
"""


def q_a3_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 classification distribution (analysis_generator.py:30-48):
    classify fixture URLs via the multi-label UDF, explode, count per
    type with a deterministic ordered sample. DuckDB-oracled (see
    _a3_oracle_sql)."""
    from web_crawler_spark.fixtures.webgraph import WebGraphConfig, generate_pages
    from web_crawler_spark.functions.urls import classify_url_udf

    pages = spark.createDataFrame(
        generate_pages(WebGraphConfig(hosts=2, pages_per_host=12))
    )
    extra = spark.createDataFrame(
        [(u,) for u in _A3_EXTRA_URLS], "url string"
    )
    urls = pages.select("url").unionByName(extra)
    return (
        urls.select("url", F.explode(classify_url_udf(F.col("url"))).alias("type"))
        .groupBy("type")
        .agg(
            F.count("*").alias("count"),
            F.concat_ws(
                "|", F.slice(F.sort_array(F.collect_list("url")), 1, 3)
            ).alias("sample"),
        )
    )


def _media_oracle_parquet() -> str:
    """Materialize the deterministic media fixture once for the
    multimodal oracles (payload bytes land in parquet as BLOBs DuckDB
    can hex-slice)."""
    from web_crawler_spark.fixtures.media import generate_media

    os.makedirs(_VISITS_ORACLE_DIR, exist_ok=True)
    p = os.path.join(_VISITS_ORACLE_DIR, "media.parquet")
    generate_media(n=60).to_parquet(p, index=False)
    return p


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + resize plan, driver-oracled: binary payloads
    → mapInPandas decode → typed metadata + native resize targets. The
    FakeCodec header is a fixed big-endian struct (>4s1sIIII) the
    DuckDB oracle unpacks by hex-slicing the same blob bytes."""
    from pyspark.sql import functions as F2

    from web_crawler_spark.operators.multimodal import decode_media, resize_plan

    media = spark.read.parquet(_media_oracle_parquet())
    dec = resize_plan(decode_media(media), max_dim=256)
    return dec.select(
        "media_ref", "kind", "width", "height", "duration_ms", "n_frames",
        "target_width", "target_height", "payload_bytes",
        (F2.col("ok") == "ok").alias("decoded_ok"),
    )


def _mm_decode_oracle_sql() -> str:
    """FakeCodec header mirror: magic 'FAKE' (hex 46414B45), then four
    big-endian uint32s at byte offsets 5/9/13/17 (hex char offsets
    11/19/27/35), parsed via ('0x' || hex-slice)::BIGINT; resize plan
    mirrored natively."""
    p = _media_oracle_parquet()
    return f"""
WITH m AS (
  SELECT media_ref, kind, hex(payload) AS h, octet_length(payload) AS n
  FROM read_parquet('{p}')
),
dec AS (
  SELECT media_ref, kind, n,
         (n >= 21 AND substring(h, 1, 8) = '46414B45') AS ok,
         CASE WHEN n >= 21 AND substring(h, 1, 8) = '46414B45'
              THEN ('0x' || substring(h, 11, 8))::BIGINT END AS w,
         CASE WHEN n >= 21 AND substring(h, 1, 8) = '46414B45'
              THEN ('0x' || substring(h, 19, 8))::BIGINT END AS ht,
         CASE WHEN n >= 21 AND substring(h, 1, 8) = '46414B45'
              THEN ('0x' || substring(h, 27, 8))::BIGINT END AS dur,
         CASE WHEN n >= 21 AND substring(h, 1, 8) = '46414B45'
              THEN ('0x' || substring(h, 35, 8))::BIGINT END AS nf
  FROM m
)
SELECT media_ref, kind,
       CAST(w AS INT) AS width,
       CAST(ht AS INT) AS height,
       CAST(dur AS INT) AS duration_ms,
       CAST(nf AS INT) AS n_frames,
       CAST(CASE WHEN greatest(w, ht) > 256
                 THEN round(w * (256.0 / greatest(w, ht)))
                 ELSE round(w * 1.0) END AS INT) AS target_width,
       CAST(CASE WHEN greatest(w, ht) > 256
                 THEN round(ht * (256.0 / greatest(w, ht)))
                 ELSE round(ht * 1.0) END AS INT) AS target_height,
       CAST(n AS BIGINT) AS payload_bytes,
       ok AS decoded_ok
FROM dec
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram feature extraction, driver-oracled on its
    integer-exact facets: vector width, dominant histogram bin (numpy
    argmax ≡ first-max), and nonzero-bin count. The DuckDB oracle
    recomputes the 64-bin byte histogram from the raw blob bytes
    (hex-sliced), fully independent of the numpy path."""
    from pyspark.sql import functions as F2

    from web_crawler_spark.operators.multimodal import extract_features

    media = spark.read.parquet(_media_oracle_parquet())
    feats = extract_features(media, bins=64)
    return feats.select(
        "media_ref",
        "kind",
        F2.size("features").cast("long").alias("n_dims"),
        (F2.array_position("features", F2.array_max("features")) - 1)
        .cast("long")
        .alias("dominant_bin"),
        F2.size(F2.filter("features", lambda x: x > 0))
        .cast("long")
        .alias("n_nonzero"),
    )


def _mm_features_oracle_sql() -> str:
    p = _media_oracle_parquet()
    return f"""
WITH m AS (
  SELECT media_ref, kind, hex(payload) AS h, octet_length(payload) AS n
  FROM read_parquet('{p}')
),
b AS (
  SELECT media_ref, kind,
         unnest(range(0, n)) AS i, h
  FROM m
),
bins AS (
  SELECT media_ref, kind,
         ('0x' || substring(h, CAST(2 * i + 1 AS INT), 2))::INT // 4 AS bin
  FROM b
),
cnt AS (SELECT media_ref, kind, bin, count(*) AS c FROM bins GROUP BY ALL),
top AS (
  SELECT media_ref, kind, bin, c,
         row_number() OVER (PARTITION BY media_ref ORDER BY c DESC, bin ASC) AS rk,
         count(*) OVER (PARTITION BY media_ref) AS nz
  FROM cnt
)
SELECT media_ref, kind,
       CAST(64 AS BIGINT) AS n_dims,
       CAST(bin AS BIGINT) AS dominant_bin,
       CAST(nz AS BIGINT) AS n_nonzero
FROM top WHERE rk = 1
"""


def q_crawl_routing_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 routing graph: parent → ordered discovered children from the
    fixture crawl. DuckDB-oracled via the BFS-tree adjacency (see
    _routing_oracle_sql)."""
    r = _crawl_state(spark)["routing"]
    # children serialized (array cells break the driver's row sort)
    return r.select(
        F.col("siteid").cast("long").alias("siteid"),
        "parent",
        F.size("children").cast("long").alias("n_children"),
        F.concat_ws("|", "children").alias("children"),
    )


def q_x1_parse_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 parse, driver-oracled on the BASELINE.json input_hint per-row
    invariant: span-sequence equality (kind, text, media_ref, order).
    The Spark side parses HTML distributed (Arrow UDF → posexplode to
    one row per span); the oracle scans the pure-Python span parse
    pre-materialized to parquet at oracle-build time (the same
    mechanism crawl_visits uses for its BFS oracle)."""
    from web_crawler_spark.fixtures.webgraph import WebGraphConfig, generate_pages
    from web_crawler_spark.functions.html import extract_spans_udf

    pages = spark.createDataFrame(
        generate_pages(WebGraphConfig(hosts=1, pages_per_host=8, seed=42))
    )
    parsed = pages.select(
        F.col("url"),
        extract_spans_udf(F.col("html"), F.col("url")).alias("spans"),
    )
    s = parsed.select("url", F.posexplode("spans").alias("idx", "s"))
    return s.select(
        "url",
        F.col("idx").cast("long").alias("idx"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").cast("long").alias("offset"),
    )


def _x1_oracle_sql() -> str:
    """Pre-materialize the pure-Python span oracle (oracle/htmlspans
    driven row-by-row on the driver — no Spark) for the same fixture
    pages, then scan it."""
    import pandas as pd

    from web_crawler_spark.fixtures.webgraph import WebGraphConfig, generate_pages
    from web_crawler_spark.oracle.htmlspans import extract_spans

    os.makedirs(_VISITS_ORACLE_DIR, exist_ok=True)
    p = os.path.join(_VISITS_ORACLE_DIR, "x1_spans.parquet")
    pages = generate_pages(WebGraphConfig(hosts=1, pages_per_host=8, seed=42))
    rows = []
    for u, h in zip(pages["url"], pages["html"]):
        spans = extract_spans(h, u) if isinstance(h, str) and h else []
        for i, sp in enumerate(spans):
            rows.append(
                {
                    "url": u,
                    "idx": i,
                    "kind": sp["kind"],
                    "text": sp["text"],
                    "media_ref": sp["media_ref"],
                    "offset": sp["offset"],
                }
            )
    pd.DataFrame(rows).to_parquet(p, index=False)
    return (
        "SELECT url, CAST(idx AS BIGINT) AS idx, kind, text, media_ref, "
        f"CAST(\"offset\" AS BIGINT) AS \"offset\" FROM read_parquet('{p}')"
    )


# ---------------------------------------------------------------------------
# event-time window queries (r4): the batch faces of the streaming
# tier's window operators (§2.L), driver-oracled. The same
# session_window / window plans run under readStream with a watermark
# (streaming ≡ batch pinned by test_streaming.py); here DuckDB
# re-derives the windows INDEPENDENTLY — sessions via gaps-and-islands
# (lag → boundary flag → running sum → group), tumbling via
# time_bucket — so a green row checks Spark's window semantics against
# a different formulation, not a translation. Window bounds are
# emitted as epoch microseconds (BIGINT) so the value hash carries no
# timestamp-rendering or timezone risk.
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30
BURST_MIN_EVENTS = 3


def q_w1_error_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user SESSION windows over error events (gap 30 min): the
    batch face of `streaming.windows.sessionized_error_bursts` (same
    F.session_window plan, host→user_id). Session semantics: an event
    extends the session iff it lands strictly inside last_ts + gap;
    end = last_ts + gap."""
    # parquet ts is TIMESTAMP_NTZ and STAYS NTZ through the window:
    # epoch micros come from timestampdiff against the NTZ epoch, so
    # the value is SESSION-TIMEZONE-INDEPENDENT (a cast to TIMESTAMP +
    # unix_micros would shift by the driver session's zone, while
    # DuckDB's epoch_us on the naive value would not — the o1 lesson)
    e = _t(spark, sf_dir, "events")
    ntz_us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {})"
    return (
        e.filter(F.col("event_type") == "error")
        .groupBy(
            F.session_window(
                F.col("ts"), f"{SESSION_GAP_MIN} minutes"
            ).alias("s"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_errors"),
            F.round(F.sum("value"), 4).alias("err_value"),
        )
        .select(
            "user_id",
            F.expr(ntz_us.format("s.start")).alias("session_start_us"),
            F.expr(ntz_us.format("s.end")).alias("session_end_us"),
            "n_errors",
            (F.col("n_errors") >= BURST_MIN_EVENTS).alias("is_burst"),
            "err_value",
        )
    )


ORACLE_W1 = f"""
WITH err AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'error'
),
lagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM err
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagged
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE)
         AS session_end_us,
       count(*) AS n_errors,
       count(*) >= {BURST_MIN_EVENTS} AS is_burst,
       round(sum(value), 4) AS err_value
FROM sess
GROUP BY user_id, sid
"""


def q_w2_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type (the batch
    face of `streaming.windows.windowed_host_stats`): count + value
    sum per (window, type). Spark aligns tumbling windows to the 1970
    epoch; DuckDB's time_bucket to 2000-01-01 — identical boundaries
    at whole-hour widths."""
    e = _t(spark, sf_dir, "events")
    ntz_us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {})"
    return (
        e.groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.expr(ntz_us.format("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLE_W2 = """
SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# training-data curation extras (r5): Gopher-style quality filter, PII
# scrub, benchmark-contamination check (task brief §extras). All three
# are driver-oracled; the filter is a pure per-row projection (zero
# shuffle at any scale), the contamination check is the one shape that
# genuinely joins — on a 16-hex-char gram key with the benchmark side
# broadcast (real benchmark suites are small and fixed).
# ---------------------------------------------------------------------------


def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document quality filter (Rae et al. 2021 §A1.1
    adapted to this corpus's word-soup text): word count bounds, mean
    word length, stopword fraction, duplicate-bigram and
    duplicate-5-gram fractions, and the combined keep flag. All ratios are emitted as
    integer basis points / centi-chars via bigint floor division so the
    DuckDB mirror is bit-exact (no float rounding seam). One Arrow UDF
    pass per row (`gopher_stats_udf` — Catalyst higher-order lambdas
    are interpreted and measured ~30× slower here) then native integer
    arithmetic; the plan is scan → project, no exchange, at any corpus
    size."""
    d = _t(spark, sf_dir, "documents")
    stats = gopher_stats_udf()
    base = d.select("doc_id", stats(F.col("text")).alias("_s")).select(
        "doc_id",
        F.col("_s.n_words").alias("n_words"),
        F.col("_s.chars").alias("_chars"),
        F.col("_s.n_stop").alias("_stop"),
        F.col("_s.g2").alias("_g2"),
        F.col("_s.g2u").alias("_g2u"),
        F.col("_s.g5").alias("_g5"),
        F.col("_s.g5u").alias("_g5u"),
    )
    scored = base.select(
        "doc_id",
        "n_words",
        F.expr("(_chars * 100) div n_words").alias("mean_wlen_c"),
        F.expr("(_stop * 10000) div n_words").alias("stop_bp"),
        F.expr(
            "CASE WHEN _g2 > 0 THEN ((_g2 - _g2u) * 10000) div _g2 ELSE 0 END"
        ).alias("dup_2gram_bp"),
        F.expr(
            "CASE WHEN _g5 > 0 THEN ((_g5 - _g5u) * 10000) div _g5 ELSE 0 END"
        ).alias("dup_5gram_bp"),
    )
    return scored.withColumn(
        "keep",
        F.col("n_words").between(30, 120)
        & (F.col("stop_bp") >= 500)
        & (F.col("dup_2gram_bp") <= 800)
        & F.col("mean_wlen_c").between(300, 700),
    )


ORACLE_QUALITY_GOPHER = r"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), s AS (
  SELECT doc_id,
         len(words) AS n_words,
         list_sum(list_transform(words, x -> len(x))) AS chars,
         len(list_filter(words, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS stop,
         CASE WHEN len(words) >= 2
              THEN list_transform(range(1, len(words)),
                                  i -> array_to_string(words[i:i+1], ' '))
              ELSE [] END AS g2,
         CASE WHEN len(words) >= 5
              THEN list_transform(range(1, len(words) - 3),
                                  i -> array_to_string(words[i:i+4], ' '))
              ELSE [] END AS g5
  FROM w
), r AS (
  SELECT doc_id, n_words,
         ((chars * 100) // n_words)::BIGINT AS mean_wlen_c,
         ((stop * 10000) // n_words)::BIGINT AS stop_bp,
         (CASE WHEN len(g2) > 0
               THEN ((len(g2) - len(list_distinct(g2))) * 10000) // len(g2)
               ELSE 0 END)::BIGINT AS dup_2gram_bp,
         (CASE WHEN len(g5) > 0
               THEN ((len(g5) - len(list_distinct(g5))) * 10000) // len(g5)
               ELSE 0 END)::BIGINT AS dup_5gram_bp
  FROM s
)
SELECT doc_id, n_words, mean_wlen_c, stop_bp, dup_2gram_bp, dup_5gram_bp,
       (n_words BETWEEN 30 AND 120 AND stop_bp >= 500
        AND dup_2gram_bp <= 800
        AND mean_wlen_c BETWEEN 300 AND 700) AS keep
FROM r
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents: per-type match counts on the
    original text plus the md5 of the scrubbed text (email → IPv4 →
    phone replacement chain, `functions/text.pii_scrub_col`). The
    corpus text itself carries no PII, so a deterministic contact
    suffix derived from (doc_id, source) is appended identically in
    both engines — the oracle proves the regex chain, ordering, and
    replace-all semantics match RE2 exactly. Per-row projection, zero
    shuffle."""
    d = _t(spark, sf_dir, "documents")
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    base = d.select("doc_id", full.alias("_full"))
    return base.select(
        "doc_id",
        F.regexp_count("_full", F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("_full", F.lit(PII_IPV4_RE)).alias("n_ips"),
        F.regexp_count("_full", F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.md5(pii_scrub_col(F.col("_full"))).alias("scrub_md5"),
    )


ORACLE_PII_SCRUB = r"""
WITH f AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '@' || source
              || '.example.com from 10.' || (doc_id % 256)::VARCHAR
              || '.0.' || (doc_id % 100)::VARCHAR
              || ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
           AS full_t
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(full_t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
  len(regexp_extract_all(full_t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
  len(regexp_extract_all(full_t, '\+\d{1,2}-\d{3}-\d{4}')) AS n_phones,
  md5(regexp_replace(regexp_replace(regexp_replace(full_t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g')) AS scrub_md5
FROM f
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation flow as ONE declarative plan — the user story
    every individual query serves: quality filter (Gopher stats) →
    exact dedup on content md5 (min-doc_id keeper) → domain cap
    (hash-ordered top-K per source) → train/val/test split → sequence
    packing (per-(split, shard) window cumsum). Catalyst sees a single
    plan — the per-row stages fuse into the scan projection, and the
    three window stages each shuffle once on their own key, which is
    the minimum any engine needs for these semantics. The oracle
    chains the proven per-stage CTEs, so the composition is verified
    end-to-end, not just stage-wise."""
    from web_crawler_spark.operators.sampling import train_val_test_split

    d = _t(spark, sf_dir, "documents")
    stats = gopher_stats_udf()
    scored = d.select(
        "doc_id", "source", "text", stats(F.col("text")).alias("_s")
    ).select(
        "doc_id",
        "source",
        "text",
        F.col("_s.n_words").alias("n_words"),
        F.expr("(_s.chars * 100) div _s.n_words").alias("_mwc"),
        F.expr("(_s.n_stop * 10000) div _s.n_words").alias("_sbp"),
        F.expr(
            "CASE WHEN _s.g2 > 0 THEN ((_s.g2 - _s.g2u) * 10000) div _s.g2"
            " ELSE 0 END"
        ).alias("_dbp"),
    )
    kept = (
        scored.filter(
            F.col("n_words").between(30, 120)
            & (F.col("_sbp") >= 500)
            & (F.col("_dbp") <= 800)
            & F.col("_mwc").between(300, 700)
        )
        .withColumn("content_md5", F.md5("text"))
        .select("doc_id", "source", "n_words", "content_md5")
    )
    w_dup = Window.partitionBy("content_md5").orderBy("doc_id")
    dd = (
        kept.withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w_cap = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    capped = (
        dd.withColumn("_rk", F.row_number().over(w_cap))
        .filter(F.col("_rk") <= DOMAIN_CAP_K)
        .drop("_rk", "content_md5")
    )
    sp = train_val_test_split(capped, "doc_id")
    w_pack = Window.partitionBy("split", F.expr("doc_id % 8")).orderBy("doc_id")
    return sp.withColumn("_cum", F.sum("n_words").over(w_pack)).select(
        "doc_id",
        "source",
        "split",
        "n_words",
        F.expr("CAST(_cum - n_words AS BIGINT)").alias("start_offset"),
        F.expr(f"(_cum - n_words) div {PACK_BLOCK_TOKENS}").alias(
            "block_first"
        ),
    )


ORACLE_CURATION_PIPELINE = r"""
WITH w AS (
  SELECT doc_id, source, text, string_split(text, ' ') AS words FROM documents
), s AS (
  SELECT doc_id, source, text,
         len(words) AS n_words,
         list_sum(list_transform(words, x -> len(x))) AS chars,
         len(list_filter(words, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS stop,
         CASE WHEN len(words) >= 2
              THEN list_transform(range(1, len(words)),
                                  i -> array_to_string(words[i:i+1], ' '))
              ELSE [] END AS g2
  FROM w
), r AS (
  SELECT doc_id, source, text, n_words,
         (chars * 100) // n_words AS mwc,
         (stop * 10000) // n_words AS sbp,
         CASE WHEN len(g2) > 0
              THEN ((len(g2) - len(list_distinct(g2))) * 10000) // len(g2)
              ELSE 0 END AS dbp
  FROM s
), kept AS (
  SELECT doc_id, source, n_words, md5(text) AS content_md5
  FROM r
  WHERE n_words BETWEEN 30 AND 120 AND sbp >= 500
    AND dbp <= 800 AND mwc BETWEEN 300 AND 700
), dd AS (
  SELECT doc_id, source, n_words FROM (
    SELECT *, row_number() OVER (PARTITION BY content_md5 ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
), capped AS (
  SELECT doc_id, source, n_words FROM (
    SELECT doc_id, source, n_words,
           row_number() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rk
    FROM dd
  ) WHERE rk <= 15
), sp AS (
  SELECT doc_id, source, n_words,
         CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 15))
                   ::BIGINT % 1000000 < 900000 THEN 'train'
              WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 15))
                   ::BIGINT % 1000000 < 950000 THEN 'val'
              ELSE 'test' END AS split
  FROM capped
), packed AS (
  SELECT doc_id, source, split, n_words,
         sum(n_words) OVER (PARTITION BY split, doc_id % 8 ORDER BY doc_id) AS cum
  FROM sp
)
SELECT doc_id, source, split, n_words,
       (cum - n_words)::BIGINT AS start_offset,
       ((cum - n_words) // 512)::BIGINT AS block_first
FROM packed
"""


PAGERANK_ITERS = 5


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-dup similarity graph (edges =
    exact bigram-Jaccard pairs ≥ 0.2, both directions) — the
    canonical-selection pattern: the highest-rank doc in each dup
    cluster is the representative to keep. Fixed-point bigint
    arithmetic end to end (`operators/dedup.pagerank`), so the DuckDB
    oracle — which recomputes the SAME edge set from the pair CTEs and
    chains five iteration CTEs — matches bit-for-bit with no float
    summation-order seam. Per iteration one join + one groupBy-sum on
    node id; lineage checkpoint-truncated; scales like
    `dedup_clusters`."""
    from web_crawler_spark.operators.dedup import pagerank

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs_blocked(d, "doc_id", "text", n=2, threshold=0.2)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    ranks = pagerank(
        d.select("doc_id"), edges, id_col="doc_id", iters=PAGERANK_ITERS
    )
    return ranks.select(
        F.col("node").alias("doc_id"), F.col("rank").alias("pagerank")
    )


def _pagerank_oracle_sql() -> str:
    cte = (
        "WITH "
        + _NGRAM_PAIRS_CTES
        + """,
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT doc_id AS node FROM documents),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank FROM nodes)"""
    )
    for i in range(1, PAGERANK_ITERS + 1):
        cte += f""",
r{i} AS (
  SELECT n.node,
         CAST(150000000 + coalesce(
           sum((r.rank * 85 // 100) // d.deg), 0) AS BIGINT) AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r{i - 1} r ON r.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.node
)"""
    return (
        cte
        + f"\nSELECT node AS doc_id, rank AS pagerank FROM r{PAGERANK_ITERS}"
    )


INCREMENTAL_BATCH_MOD = 5  # doc_id % MOD == 0 plays the new crawl batch


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the per-batch production pattern: dedupe a
    NEW crawl batch (doc_id % 5 == 0) against the already-indexed
    corpus (the rest) with exact word-bigram Jaccard. Picks the
    physical plan by corpus regime like `q_dedup_ngram_jaccard`: at
    scale, `operators/dedup.ngram_jaccard_join` (batch grams
    broadcast, corpus probed map-side — no corpus self-join, cost
    scales with the batch); in the dense fixture regime the
    blocked-tile plan filtered to straddle pairs (the shared-vocab
    corpus defeats any gram equi-join). Both plans exact, same
    oracle."""
    from web_crawler_spark.operators.dedup import ngram_jaccard_join

    d = _t(spark, sf_dir, "documents")
    a_new = F.col("id_a") % INCREMENTAL_BATCH_MOD == 0
    b_new = F.col("id_b") % INCREMENTAL_BATCH_MOD == 0
    if d.count() > _NGRAM_BLOCKED_MAX_DOCS:
        # scale path: broadcast-probe two-sided join — never a corpus
        # self-join (see ngram_jaccard_join)
        return ngram_jaccard_join(
            d.filter(F.col("doc_id") % INCREMENTAL_BATCH_MOD == 0),
            d.filter(F.col("doc_id") % INCREMENTAL_BATCH_MOD != 0),
            "doc_id", "text", n=2, threshold=0.2,
        )
    # dense/fixture regime: the small shared vocabulary defeats the
    # gram equi-join exactly as it defeats AllPairs prefix filtering
    # (34 s vs 2 s at sf0.1, same finding as q_dedup_ngram_jaccard) —
    # derive the straddle pairs from the blocked-tile plan instead
    pairs = ngram_jaccard_pairs_blocked(d, "doc_id", "text", n=2, threshold=0.2)
    return pairs.filter(a_new != b_new).select(
        F.when(a_new, F.col("id_a")).otherwise(F.col("id_b")).alias("id_new"),
        F.when(a_new, F.col("id_b")).otherwise(F.col("id_a")).alias("id_index"),
        "jaccard",
    )


ORACLE_DEDUP_INCREMENTAL = r"""
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w)),
                                      i -> w[i] || ' ' || w[i+1])) AS grams
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
        FROM documents)
), be AS (
  SELECT doc_id, unnest(grams) AS gr FROM g WHERE doc_id % 5 = 0
), ie AS (
  SELECT doc_id, unnest(grams) AS gr FROM g WHERE doc_id % 5 <> 0
), sizes AS (
  SELECT doc_id, len(grams) AS n FROM g
), inter AS (
  SELECT b.doc_id AS id_new, i.doc_id AS id_index, count(*) AS ni
  FROM be b JOIN ie i ON b.gr = i.gr
  GROUP BY 1, 2
)
SELECT id_new, id_index, round(ni / (sb.n + si.n - ni), 4) AS jaccard
FROM inter
JOIN sizes sb ON inter.id_new = sb.doc_id
JOIN sizes si ON inter.id_index = si.doc_id
WHERE ni / (sb.n + si.n - ni) >= 0.2
"""


DOMAIN_CAP_K = 15  # max docs kept per source (fixture corpus has 25/source, so the cap binds)


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-balanced downsampling: keep at most K docs per source,
    chosen by a content-keyed hash order (md5 of doc_id) rather than
    ingestion order, so the survivors are an unbiased deterministic
    sample of each over-represented domain. Compiles to
    WindowGroupLimit like the frontier dequeue (rank limit applied
    map-side below the exchange — only ≤K rows per group shuffle), so
    capping a 100 TB corpus ships K rows per domain, not the domain."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select(
            "doc_id",
            "source",
            F.row_number().over(w).alias("rank_in_source"),
        )
        .filter(F.col("rank_in_source") <= DOMAIN_CAP_K)
    )


ORACLE_DOMAIN_CAP = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rank_in_source
  FROM documents
)
SELECT doc_id, source, rank_in_source FROM r WHERE rank_in_source <= 15
"""


PACK_BLOCK_TOKENS = 512  # tokens per packed training block (fixture scale)
PACK_SHARDS = 8


def q_dataset_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (concatenate-and-chunk): documents
    are concatenated in deterministic (shard, doc_id) order and cut
    into fixed token blocks; each doc reports its start offset and the
    block range it lands in. One window cumsum per shard — the plan is
    a single exchange on the shard key plus a shard-local sort, which
    is exactly how distributed packing bounds memory at 100 TB: block
    ids are shard-local, shards scale with the cluster, and no global
    order is ever materialized. All outputs are bigints via floor
    division, so the DuckDB mirror is bit-exact."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        token_count_col(F.col("text")).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = base.withColumn("_cum", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr("CAST(_cum - n_tokens AS BIGINT)").alias("start_offset"),
        F.expr(f"(_cum - n_tokens) div {PACK_BLOCK_TOKENS}").alias(
            "block_first"
        ),
        F.expr(f"(_cum - 1) div {PACK_BLOCK_TOKENS}").alias("block_last"),
        F.expr(
            f"(_cum - 1) div {PACK_BLOCK_TOKENS}"
            f" - (_cum - n_tokens) div {PACK_BLOCK_TOKENS} + 1"
        ).alias("n_blocks"),
    )


ORACLE_DATASET_PACK = r"""
WITH t AS (
  SELECT doc_id, doc_id % 8 AS shard,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
  FROM t
)
SELECT doc_id, shard, n_tokens,
       (cum - n_tokens)::BIGINT AS start_offset,
       ((cum - n_tokens) // 512)::BIGINT AS block_first,
       ((cum - 1) // 512)::BIGINT AS block_last,
       ((cum - 1) // 512 - (cum - n_tokens) // 512 + 1)::BIGINT AS n_blocks
FROM c
"""


CONTAMINATION_BENCH_MOD = 7  # doc_id % MOD == 0 plays the held-out benchmark


def q_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check (the n-gram overlap test used
    before training-data release): every corpus doc is scored by how
    many of its distinct word-8-grams appear anywhere in the held-out
    benchmark slice (doc_id % 7 == 0 plays the benchmark). Grams are
    keyed by a 16-hex-char md5 prefix so the exchange ships 16-byte
    keys, never gram strings; the benchmark key set is broadcast —
    real benchmark suites are a few thousand docs regardless of corpus
    size, so the corpus side joins map-side with zero shuffle of the
    100 TB side (the groupBy on doc_id shuffles only hit rows). Gram
    keys come from `make_gram_key_udf` (Arrow UDF ≡ the native
    substr(md5(gram),1,16) formulation, parity-pinned in
    tests/test_curation.py — the interpreted transform+slice lambda
    chain measured ~30× slower)."""
    d = _t(spark, sf_dir, "documents")
    gram_keys = make_gram_key_udf(n=8, prefix=16)
    # the gram UDF runs on two DISJOINT slices — once over the small
    # benchmark docs, once over the corpus docs feeding the broadcast
    # join directly — and the left-join base is a plain doc_id scan, so
    # no frame has multiple consumers and nothing needs a persist
    # barrier (an earlier shape barriered one shared gram frame; the
    # cache write/read of the wide key arrays was pure memory-bandwidth
    # cost at scale)
    bench = (
        d.filter(F.col("doc_id") % CONTAMINATION_BENCH_MOD == 0)
        .select(F.explode(gram_keys(F.col("text"))).alias("gkey"))
        .distinct()
    )
    corpus_grams = d.filter(
        F.col("doc_id") % CONTAMINATION_BENCH_MOD != 0
    ).select("doc_id", F.explode(gram_keys(F.col("text"))).alias("gkey"))
    hits = (
        corpus_grams.join(F.broadcast(bench), "gkey")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))  # keys pre-distinct per doc
    )
    return (
        d.filter(F.col("doc_id") % CONTAMINATION_BENCH_MOD != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_contaminated_grams"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


ORACLE_CONTAMINATION = r"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           CASE WHEN len(words) >= 8
                THEN list_transform(range(1, len(words) - 6),
                                    i -> array_to_string(words[i:i+7], ' '))
                ELSE [] END,
           x -> substr(md5(x), 1, 16))) AS gkeys
  FROM w
), bench AS (
  SELECT DISTINCT unnest(gkeys) AS gkey FROM g WHERE doc_id % 7 = 0
), corpus AS (
  SELECT doc_id, gkeys FROM g WHERE doc_id % 7 <> 0
), cg AS (
  SELECT doc_id, unnest(gkeys) AS gkey FROM corpus
), hits AS (
  SELECT doc_id, count(*) AS n FROM cg JOIN bench USING (gkey) GROUP BY doc_id
)
SELECT c.doc_id,
       coalesce(h.n, 0)::BIGINT AS n_contaminated_grams,
       coalesce(h.n, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "a1_source_summary": q_a1_source_summary,
    "a3_token_distribution": q_a3_token_distribution,
    "a5_scalar_stats": q_a5_scalar_stats,
    "a6_distinct_scan": q_a6_distinct_scan,
    "o1_recent_topk": q_o1_recent_topk,
    "o6_topk_per_group": q_o6_topk_per_group,
    "j2_dim_join": q_j2_dim_join,
    "so1_snapshot_compare": q_so1_snapshot_compare,
    "so5_rule_chain": q_so5_rule_chain,
    "h1_content_hashes": q_h1_content_hashes,
    "a9_severity_bands": q_a9_severity_bands,
    "p_admission_pipeline": q_p_admission_pipeline,
    "x2_classification_native": q_x2_classification_native,
    "robots_eval": q_robots_eval,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_ngram_jaccard_allpairs": q_dedup_ngram_jaccard_allpairs,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "dedup_clusters": q_dedup_clusters,
    "dedup_incremental": q_dedup_incremental,
    "graph_pagerank": q_graph_pagerank,
    "curation_pipeline": q_curation_pipeline,
    "text_quality": q_text_quality,
    "quality_gopher": q_quality_gopher,
    "pii_scrub": q_pii_scrub,
    "contamination_ngrams": q_contamination_ngrams,
    "lang_id": q_lang_id,
    "fingerprints": q_fingerprints,
    "dataset_split": q_dataset_split,
    "dataset_pack": q_dataset_pack,
    "domain_cap": q_domain_cap,
    "ann_brute_force_topk": q_ann_topk,
    "ann_lsh_topk": q_ann_lsh,
    "ann_ivf_topk": q_ann_ivf,
    "ann_lsh_recall": q_ann_lsh_recall,
    "ann_ivf_recall": q_ann_ivf_recall,
    "dedup_minhash_recall": q_dedup_minhash_recall,
    "dedup_simhash_recall": q_dedup_simhash_recall,
    "dedup_embedding_lsh_recall": q_dedup_embedding_lsh_recall,
    "crawl_visits": q_crawl_visits,
    "crawl_documents": q_crawl_documents,
    "crawl_blocked_report": q_crawl_blocked_report,
    "crawl_routing_graph": q_crawl_routing_graph,
    "x1_parse_spans": q_x1_parse_spans,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_features": q_multimodal_features,
    "compare_observations": q_compare_observations,
    "a3_classification": q_a3_classification,
    "w1_error_sessions": q_w1_error_sessions,
    "w2_event_windows": q_w2_event_windows,
}

ORACLES: dict[str, str] = {
    "a1_source_summary": ORACLE_A1,
    "a3_token_distribution": ORACLE_A3,
    "a5_scalar_stats": ORACLE_A5,
    "a6_distinct_scan": ORACLE_A6,
    "o1_recent_topk": ORACLE_O1,
    "o6_topk_per_group": ORACLE_O6,
    "j2_dim_join": ORACLE_J2,
    "so1_snapshot_compare": ORACLE_SO1,
    "h1_content_hashes": ORACLE_H1,
    "a9_severity_bands": ORACLE_A9,
    "p_admission_pipeline": ORACLE_P_ADMISSION,
    "x2_classification_native": ORACLE_X2_CLASSIFICATION,
    "robots_eval": ORACLE_ROBOTS,
    "lang_id": ORACLE_LANG_ID,
    "fingerprints": ORACLE_FINGERPRINTS,
    "dataset_split": ORACLE_DATASET_SPLIT,
    "dataset_pack": ORACLE_DATASET_PACK,
    "domain_cap": ORACLE_DOMAIN_CAP,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": ORACLE_DEDUP_NGRAM,
    "dedup_ngram_jaccard_allpairs": ORACLE_DEDUP_NGRAM,
    "crawl_visits": _visits_oracle_sql(),
    "crawl_routing_graph": _routing_oracle_sql(),
    "crawl_documents": _documents_oracle_sql(),
    "crawl_blocked_report": _blocked_oracle_sql(),
    "a3_classification": _a3_oracle_sql(),
    "x1_parse_spans": _x1_oracle_sql(),
    "multimodal_decode": _mm_decode_oracle_sql(),
    "multimodal_features": _mm_features_oracle_sql(),
    "so5_rule_chain": ORACLE_SO5_RULES,
    "dedup_embedding": ORACLE_DEDUP_EMBEDDING,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "dedup_incremental": ORACLE_DEDUP_INCREMENTAL,
    "graph_pagerank": _pagerank_oracle_sql(),
    "curation_pipeline": ORACLE_CURATION_PIPELINE,
    "text_quality": ORACLE_TEXT_QUALITY,
    "quality_gopher": ORACLE_QUALITY_GOPHER,
    "pii_scrub": ORACLE_PII_SCRUB,
    "contamination_ngrams": ORACLE_CONTAMINATION,
    "ann_brute_force_topk": ORACLE_ANN,
    "compare_observations": ORACLE_COMPARE,
    "w1_error_sessions": ORACLE_W1,
    "w2_event_windows": ORACLE_W2,
    # no oracle (rows-only, by design): dedup_minhash_lsh, dedup_simhash,
    # dedup_embedding_lsh, ann_lsh_topk, ann_ivf_topk (approximate /
    # signature UDFs not SQL-expressible); pytest gates their semantics
    # against pure-Python oracles, and each has a DRIVER-ORACLED recall
    # companion row (see LAZY_ORACLES) asserting a recall floor vs the
    # exact tier on the same fixtures
}

# oracle SQL that must be built lazily (the approximate-side mirror
# pre-materializes parquet at build time — too heavy for module
# import, which bench/tests hit constantly). Resolved by
# build_oracles(), which __spark_entry__.oracle_sql() calls.
LAZY_ORACLES: dict[str, Callable[[], str]] = {
    "ann_lsh_recall": _ann_lsh_recall_oracle,
    "ann_ivf_recall": _ann_ivf_recall_oracle,
    "dedup_minhash_recall": _minhash_recall_oracle,
    "dedup_simhash_recall": _simhash_recall_oracle,
    "dedup_embedding_lsh_recall": _embedding_lsh_recall_oracle,
}


def build_oracles() -> dict[str, str]:
    """The full oracle map: static SQL plus the lazily-built recall
    oracles (which write the approximate-side mirror parquet as a side
    effect)."""
    out = dict(ORACLES)
    for name, fn in LAZY_ORACLES.items():
        out[name] = fn()
    return out
