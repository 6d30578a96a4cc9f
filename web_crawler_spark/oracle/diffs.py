"""Diff-artifact kernel (compare_utils.py:55-282 semantics).

The reference renders ONE side-by-side HTML diff file per changed page:
semantic lines → SequenceMatcher opcodes → context ranges (merged) →
row stream with classes ctx/add/del/mod and 1-based line numbers
(compare_utils.py:_collect_change_ranges / _render_side_by_side_block).

Here the row stream IS the artifact (structured, storable in a table
column); `render_html_diff` wraps it in the same table structure when a
file is wanted. Pure stdlib → runs inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import difflib
import json
from html import escape

from web_crawler_spark.oracle.htmlspans import semantic_lines

DEFAULT_CONTEXT = 2


def collect_change_ranges(
    a_lines: list[str], b_lines: list[str], context: int = DEFAULT_CONTEXT
) -> list[tuple[int, int]]:
    """Merged [start, end) windows around every non-equal opcode
    (compare_utils.py:56-77)."""
    sm = difflib.SequenceMatcher(None, a_lines, b_lines)
    ranges = []
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == "equal":
            continue
        ranges.append((max(0, min(i1, j1) - context), max(i2, j2) + context))
    merged: list[list[int]] = []
    for r in sorted(ranges):
        if not merged or r[0] > merged[-1][1]:
            merged.append(list(r))
        else:
            merged[-1][1] = max(merged[-1][1], r[1])
    return [(s, e) for s, e in merged]


def render_block_rows(
    a_lines: list[str], b_lines: list[str], start: int, end: int
) -> list[dict]:
    """Side-by-side rows for one range — class + line-number semantics
    identical to compare_utils.py:95-155 (replace pads the short side,
    pad rows get empty line numbers, equal-within-replace is ctx)."""
    sm = difflib.SequenceMatcher(None, a_lines[start:end], b_lines[start:end])
    rows: list[dict] = []
    a_ln = b_ln = start + 1

    def row(cls, aln, atxt, bln, btxt):
        rows.append(
            {"cls": cls, "a_ln": aln, "a": atxt, "b_ln": bln, "b": btxt}
        )

    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == "equal":
            for k in range(i2 - i1):
                row("ctx", a_ln, a_lines[start + i1 + k], b_ln,
                    b_lines[start + j1 + k])
                a_ln += 1
                b_ln += 1
        elif tag == "delete":
            for line in a_lines[start + i1 : start + i2]:
                row("del", a_ln, line, "", "")
                a_ln += 1
        elif tag == "insert":
            for line in b_lines[start + j1 : start + j2]:
                row("add", "", "", b_ln, line)
                b_ln += 1
        elif tag == "replace":
            for k in range(max(i2 - i1, j2 - j1)):
                left = a_lines[start + i1 + k] if i1 + k < i2 else ""
                right = b_lines[start + j1 + k] if j1 + k < j2 else ""
                row("ctx" if left == right else "mod",
                    a_ln if left else "", left,
                    b_ln if right else "", right)
                if left:
                    a_ln += 1
                if right:
                    b_ln += 1
    return rows


def diff_artifact(
    baseline_html: str, observed_html: str, context: int = DEFAULT_CONTEXT
) -> dict:
    """The structured artifact: blocks of side-by-side rows plus change
    tallies. Empty blocks ⇒ 'No changes detected' (compare_utils.py:190)."""
    a_lines = semantic_lines(baseline_html or "")
    b_lines = semantic_lines(observed_html or "")
    blocks = []
    for start, end in collect_change_ranges(a_lines, b_lines, context):
        rows = render_block_rows(a_lines, b_lines, start, end)
        if rows:
            blocks.append(rows)
    tallies = {"add": 0, "del": 0, "mod": 0, "ctx": 0}
    for blk in blocks:
        for r in blk:
            tallies[r["cls"]] += 1
    return {"blocks": blocks, "tallies": tallies, "changed": bool(blocks)}


def diff_artifact_json(baseline_html: str, observed_html: str,
                       context: int = DEFAULT_CONTEXT) -> str:
    return json.dumps(
        diff_artifact(baseline_html, observed_html, context),
        separators=(",", ":"),
    )


def render_html_diff(url: str, artifact: dict) -> str:
    """HTML rendering with the reference's table structure
    (compare_utils.py:176-201: Baseline|Observed header, row classes,
    'sep' rows between blocks, 'No changes detected.' fallback)."""
    if not artifact["blocks"]:
        body = "<p>No changes detected.</p>"
    else:
        all_rows = []
        for blk in artifact["blocks"]:
            for r in blk:
                all_rows.append(
                    f"<tr class='{r['cls']}'>"
                    f"<td class='ln'>{r['a_ln']}</td>"
                    f"<td class='code'>{escape(r['a'])}</td>"
                    f"<td class='ln'>{r['b_ln']}</td>"
                    f"<td class='code'>{escape(r['b'])}</td>"
                    f"</tr>"
                )
            all_rows.append("<tr class='sep'><td colspan='4'></td></tr>")
        body = (
            "<table class='diff'>"
            "<tr class='col-header'>"
            "<th colspan='2'>Baseline</th>"
            "<th colspan='2'>Observed</th>"
            "</tr>" + "".join(all_rows) + "</table>"
        )
    return (
        f"<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
        f"<title>Diff for {escape(url)}</title></head>"
        f"<body><h2>Changes for {escape(url)}</h2>{body}</body></html>"
    )
