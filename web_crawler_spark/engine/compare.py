"""COMPARE mode: defacement detection as one DataFrame plan.

Reference lifecycle (SURVEY.md §3.3, /root/reference/baseline-crawler/
crawler/compare_engine.py:36-162): per crawled page, probe the
selected-pages dim (994 rows, loaded once), look up the baseline hash,
compare, and for changed pages compute the semantic-line diff score
and severity, then upsert an observations row.

Spark shape (all built-in until the scoring UDF):

  observed ⋈ broadcast(selected) ⋈ baselines          (J2, J5, J3)
    → changed = observed_hash != baseline_hash        (H3)
    → changed rows only → defacement score pandas UDF (A8)
    → severity F.when chain                           (A9)
    → script-source set diff via array_except         (SO3)

Keys are canonicalized once with U2 (get_canonical_id semantics) so
the reference's trailing-slash 3-way probe (U7, compare_engine.py:
42-60) collapses into a plain equi-join — same match set, one pass.

Scale: `selected` and the per-site baseline slice are broadcast when
small; at 10^10 URLs the baselines table is Iceberg bucketed by
(site_id, xxhash64(url_key)) and the join is co-partitioned
sort-merge with AQE skew splitting. Only *changed* rows (rare) pay
the Python scoring UDF — the unchanged fast path never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawler_spark.functions.html import (
    defacement_score_udf,
    diff_artifact_udf,
    script_sources_udf,
    semantic_hash_col,
    severity_col,
)


def observe_pages(pages: DataFrame, url_col: str = "url_key",
                  html_col: str = "html") -> DataFrame:
    """Crawled HTML → observed rows: canonical key + semantic hash
    (compare_engine.py:42-46: observed_hash = sha256(normalize_html))."""
    return pages.withColumn("observed_hash", semantic_hash_col(F.col(html_col)))


def compare_observations(
    observed: DataFrame,
    baselines: DataFrame,
    selected: DataFrame | None = None,
    site_col: str = "siteid",
    key_col: str = "url_key",
    include_diff: bool = False,
) -> DataFrame:
    """Join observed pages to baselines and score changes.

    observed:  siteid, url_key, observed_hash, html
    baselines: siteid, url_key, baseline_hash, baseline_html
    selected:  optional dim (siteid, url_key) — only these pages are
               compared (defacement_sites 'selected' rows, J2).

    Output: siteid, url_key, baseline_hash, observed_hash, changed,
    defacement_score, severity, scripts_added, scripts_removed
    [, diff_artifact JSON when include_diff — changed rows only,
    compare_utils.py:160-282 side-by-side semantics].
    """
    obs = observed
    if selected is not None:
        obs = obs.join(
            F.broadcast(selected.select(site_col, key_col).distinct()),
            [site_col, key_col],
            "inner",
        )
    b = baselines.select(
        site_col,
        key_col,
        "baseline_hash",
        F.col("baseline_html"),
    )
    joined = obs.join(b, [site_col, key_col], "inner")
    changed = F.col("observed_hash") != F.col("baseline_hash")
    scored = joined.withColumn("changed", changed).withColumn(
        "defacement_score",
        F.when(
            changed,
            defacement_score_udf(
                # UDF sees NULL on the unchanged fast path → no Python cost
                F.when(changed, F.col("baseline_html")),
                F.when(changed, F.col("html")),
            ),
        ).otherwise(F.lit(0.0)),
    )
    scored = scored.withColumn(
        "severity",
        F.when(changed, severity_col(F.col("defacement_score"))).otherwise(
            F.lit("NONE")
        ),
    )
    base_scripts = script_sources_udf(
        F.when(changed, F.col("baseline_html")), F.col(key_col)
    )
    obs_scripts = script_sources_udf(
        F.when(changed, F.col("html")), F.col(key_col)
    )
    scored = scored.withColumn(
        "scripts_added",
        F.when(changed, F.array_except(obs_scripts, base_scripts)).otherwise(
            F.array().cast("array<string>")
        ),
    ).withColumn(
        "scripts_removed",
        F.when(changed, F.array_except(base_scripts, obs_scripts)).otherwise(
            F.array().cast("array<string>")
        ),
    )
    out_cols = [
        site_col,
        key_col,
        "baseline_hash",
        "observed_hash",
        "changed",
        "defacement_score",
        "severity",
        "scripts_added",
        "scripts_removed",
    ]
    if include_diff:
        scored = scored.withColumn(
            "diff_artifact",
            F.when(
                changed,
                diff_artifact_udf(
                    F.when(changed, F.col("baseline_html")),
                    F.when(changed, F.col("html")),
                ),
            ),
        )
        out_cols.append("diff_artifact")
    return scored.select(*out_cols)


def build_baselines(pages: DataFrame, site_col: str = "siteid",
                    key_col: str = "url_key",
                    html_col: str = "html") -> DataFrame:
    """BASELINE mode (SURVEY.md §3.2): distinct HTML pages → semantic
    hash + stored html. Production: MERGE INTO baselines ON
    (siteid, url_key); here the DataFrame the merge would produce."""
    return pages.select(
        site_col,
        key_col,
        semantic_hash_col(F.col(html_col)).alias("baseline_hash"),
        F.col(html_col).alias("baseline_html"),
    ).dropDuplicates([site_col, key_col])


def baseline_upsert(
    existing: DataFrame | None,
    pages: DataFrame,
    site_col: str = "siteid",
    key_col: str = "url_key",
    html_col: str = "html",
) -> tuple[DataFrame, DataFrame]:
    """BASELINE-mode upsert with A7 action accounting
    (baseline_store.py:58-95 + baseline_worker.py:33-78): a page whose
    (siteid, url_key) already has a baseline row is 'updated' (the
    reference overwrites file + row in place regardless of hash), else
    'created'.

    Returns (merged_baselines, actions) where actions = per-action
    counts (the reference's end-of-run counters). Production: a single
    Iceberg `MERGE INTO baselines` — this is the DataFrame the merge
    would leave behind, plus the audit the counters provide."""
    new = build_baselines(pages, site_col, key_col, html_col)
    if existing is None:
        actions = new.select(F.lit("created").alias("action")).groupBy(
            "action"
        ).agg(F.count("*").alias("count"))
        return new, actions
    keys = existing.select(site_col, key_col).withColumn("_had", F.lit(1))
    tagged = new.join(keys, [site_col, key_col], "left").withColumn(
        "action",
        F.when(F.col("_had").isNotNull(), "updated").otherwise("created"),
    )
    actions = tagged.groupBy("action").agg(F.count("*").alias("count"))
    merged = tagged.drop("_had", "action").unionByName(
        existing.join(new.select(site_col, key_col), [site_col, key_col],
                      "left_anti")
    )
    return merged, actions


def script_injection_scan(
    observed: DataFrame,
    baselines: DataFrame,
    site_col: str = "siteid",
    key_col: str = "url_key",
) -> DataFrame:
    """Independent script-source scan (detection/detector.py:50-68 —
    the reference's *intended* high-severity path; dead code there
    because of missing imports, semantics reconstructed per SURVEY.md
    §2.D X6 note). Runs regardless of the semantic hash, because
    normalize_html strips <script> tags before hashing — a script-only
    injection is invisible to the hash compare (X4, H2) by design.

    Output: siteid, url_key, scripts_added, scripts_removed, flagged
    (flagged = any new external script source — HIGH-severity signal).
    """
    b = baselines.select(
        site_col, key_col, F.col("baseline_html")
    )
    joined = observed.join(b, [site_col, key_col], "inner")
    base_scripts = script_sources_udf(F.col("baseline_html"), F.col(key_col))
    obs_scripts = script_sources_udf(F.col("html"), F.col(key_col))
    return joined.select(
        site_col,
        key_col,
        F.array_except(obs_scripts, base_scripts).alias("scripts_added"),
        F.array_except(base_scripts, obs_scripts).alias("scripts_removed"),
    ).withColumn("flagged", F.size("scripts_added") > 0)


def detect_rules(
    observed: DataFrame,
    baselines: DataFrame,
    site_col: str = "siteid",
    key_col: str = "url_key",
) -> DataFrame:
    """detector.py:40-143 rule chain as ONE native column pipeline —
    first matching rule wins, exactly the reference's return order:

      script_src_change → HIGH    (external script added/removed)
      none              → NONE    (hashes equal)
      dom_change        → MEDIUM  (opening-tag sequence differs, X6)
      semantic_reorder  → LOW     (token multisets equal, SO5)
      content_change    → MEDIUM  (fallback)

    The reference's semantic_normalize_html / dom_structure_fingerprint
    are dead imports (never defined); the tag-sequence fingerprint and
    the tag-stripped \\w+ token multiset reconstruct their documented
    intent. Everything is Catalyst-native (regexp/array HOFs): zero
    Python in this path.
    """
    b = baselines.select(site_col, key_col, "baseline_hash", "baseline_html")
    j = observed.join(b, [site_col, key_col], "inner")
    return detect_rules_paired(j, site_col=site_col, key_col=key_col)


def detect_rules_paired(
    pairs: DataFrame,
    site_col: str = "siteid",
    key_col: str = "url_key",
) -> DataFrame:
    """detect_rules over an already-paired frame (baseline_html /
    baseline_hash alongside html / observed_hash in the same row) —
    no join, no shuffle of HTML bodies. Use when baseline and observed
    come pre-aligned (snapshot diffing of a single keyed table); the
    two-frame detect_rules wraps this after its equi-join."""
    from web_crawler_spark.functions.html import (
        dom_fingerprint_col,
        script_sources_col,
        token_multiset_col,
    )

    bh, oh = F.col("baseline_html"), F.col("html")
    added = F.array_except(script_sources_col(oh), script_sources_col(bh))
    removed = F.array_except(script_sources_col(bh), script_sources_col(oh))
    changed = F.col("observed_hash") != F.col("baseline_hash")
    rule = (
        F.when(F.size(added) + F.size(removed) > 0, "script_src_change")
        .when(~changed, "none")
        .when(dom_fingerprint_col(bh) != dom_fingerprint_col(oh), "dom_change")
        .when(token_multiset_col(bh) == token_multiset_col(oh), "semantic_reorder")
        .otherwise("content_change")
    )
    sev = (
        F.when(rule == "script_src_change", "HIGH")
        .when(rule == "none", "NONE")
        .when(rule == "semantic_reorder", "LOW")
        .otherwise("MEDIUM")
    )
    return pairs.select(
        site_col,
        key_col,
        changed.alias("html_changed"),
        rule.alias("severity_rule"),
        sev.alias("severity"),
        added.alias("scripts_added"),
        removed.alias("scripts_removed"),
    )


def observations_summary(observations: DataFrame) -> DataFrame:
    """A5/A7-style rollup: counts per severity + changed tally."""
    return observations.groupBy("severity").agg(
        F.count("*").alias("n_pages"),
        F.count(F.when(F.col("changed"), 1)).alias("n_changed"),
        F.round(F.avg("defacement_score"), 4).alias("avg_score"),
    )
