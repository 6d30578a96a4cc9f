"""RFC 9309 robots.txt rule evaluation as a vectorized UDF.

North-rule addition with NO reference counterpart (SURVEY.md §7 phase 8):
the reference never reads robots.txt. Semantics implemented: per (host,
user-agent) rule set; longest-match wins; allow wins length ties; no
matching rule → allowed. `*` wildcards and `$` end-anchors in rule paths
are supported per RFC 9309 §2.2.3.

The rule table is a small dim (one row per rule) — it's collected,
compiled once per executor via broadcast capture, and evaluated over
Arrow batches in numpy-speed Python (regex per rule, rules per host are
few). The crawl-delay side feeds the politeness token bucket
(operators/politeness.py).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def _compile_rule(path_prefix: str) -> tuple[re.Pattern, int]:
    """RFC 9309 pattern → anchored regex + specificity (pattern length)."""
    spec = len(path_prefix)
    anchored_end = path_prefix.endswith("$")
    body = path_prefix[:-1] if anchored_end else path_prefix
    pattern = "^" + ".*".join(re.escape(p) for p in body.split("*"))
    if anchored_end:
        pattern += "$"
    return re.compile(pattern), spec


class RobotsMatcher:
    """Compiled per-host rule sets, usable inside pandas UDFs."""

    def __init__(self, rules: list[tuple[str, str, str]]):
        # rules: (host, rule_type, path_prefix) — '*' UA rules only for now
        self._by_host: dict[str, list[tuple[re.Pattern, int, bool]]] = {}
        for host, rule_type, prefix in rules:
            rx, spec = _compile_rule(prefix or "/")
            self._by_host.setdefault(host, []).append(
                (rx, spec, rule_type == "allow")
            )

    def allowed(self, host: str, path: str) -> bool:
        rules = self._by_host.get(host)
        if not rules:
            return True
        best_spec, best_allow = -1, True
        for rx, spec, is_allow in rules:
            if rx.match(path):
                # longest match wins; allow wins ties (RFC 9309 §2.2.2)
                if spec > best_spec or (spec == best_spec and is_allow):
                    best_spec, best_allow = spec, is_allow
        return best_allow

    @classmethod
    def from_df(cls, robots: DataFrame, user_agent: str = "*") -> "RobotsMatcher":
        rows = (
            robots.filter(F.col("user_agent").isin("*", user_agent))
            .select("host", "rule_type", "path_prefix")
            .collect()
        )
        return cls([(r["host"], r["rule_type"], r["path_prefix"]) for r in rows])

    def allowed_udf(self):
        matcher = self

        @F.pandas_udf(BooleanType())
        def robots_allowed(host: pd.Series, path: pd.Series) -> pd.Series:
            return pd.Series(
                [matcher.allowed(h or "", p or "/") for h, p in zip(host, path)]
            )

        return robots_allowed


def robots_allowed_col(matcher: RobotsMatcher, host: Column, path: Column) -> Column:
    return matcher.allowed_udf()(host, path)
