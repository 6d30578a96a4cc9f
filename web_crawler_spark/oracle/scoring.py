"""Defacement scoring / change-detection kernels (SURVEY.md §2.E/H, A8/A9).

Behavior parity targets (reference at /root/reference/baseline-crawler/):
- ``defacement_percentage`` ≡ calculate_defacement_percentage
  (compare_utils.py:321-346): changed semantic lines / baseline lines ×100,
  capped at 100, rounded to 2.
- ``script_sources``        ≡ the script-src set used by the detector
  (crawler/detection/detector.py:51-56).
- ``token_multiset``        ≡ detector.py:34-37 (strip tags, \\w+ lowercase).

difflib is stdlib, so these run inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import difflib
import re

from web_crawler_spark.oracle.htmlspans import extract_spans, semantic_lines

_TAG_RE = re.compile(r"<[^>]+>")
_WORD_RE = re.compile(r"\w+")


def defacement_percentage(baseline_html: str, observed_html: str) -> float:
    """Percent of baseline semantic lines changed (replace/delete sides
    count baseline lines, insert counts observed lines), capped at 100."""
    base = semantic_lines(baseline_html)
    obs = semantic_lines(observed_html)
    if not base:
        return 100.0 if obs else 0.0
    sm = difflib.SequenceMatcher(None, base, obs)
    changed = 0
    for op, i1, i2, j1, j2 in sm.get_opcodes():
        if op in ("replace", "delete"):
            changed += i2 - i1
        elif op == "insert":
            changed += j2 - j1
    return round(min(100.0, changed / len(base) * 100.0), 2)


def script_sources(html: str, base_url: str) -> list[str]:
    """Sorted distinct external script sources (detector.py:51-56)."""
    return sorted(
        {
            s["media_ref"]
            for s in extract_spans(html, base_url)
            if s["kind"] == "script" and s["media_ref"]
        }
    )


def token_multiset(html: str) -> dict[str, int]:
    """Lowercased \\w+ token counts over tag-stripped HTML (detector.py:34-37)."""
    counts: dict[str, int] = {}
    for tok in _WORD_RE.findall(_TAG_RE.sub(" ", html or "").lower()):
        counts[tok] = counts.get(tok, 0) + 1
    return counts
