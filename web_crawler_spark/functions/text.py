"""Text-analysis kernels for training-data pipelines (task brief §extras).

Everything here runs over the `documents(text)` table. Native
expressions where Catalyst can express it (token counts, ratios,
quality bands); Arrow-vectorized pandas UDFs for the genuinely
procedural kernels (n-gram language ID, rolling-hash fingerprints,
minhash signatures).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

# ---------------------------------------------------------------------------
# token counting / quality scoring — native (JVM, codegen)
# ---------------------------------------------------------------------------


def token_count_col(text: Column) -> Column:
    """Whitespace token count (matches DuckDB
    len(regexp_split_to_array(trim(text), '\\s+')))."""
    return F.size(F.split(F.trim(text), r"\s+"))


def alpha_ratio_col(text: Column) -> Column:
    """Share of ASCII-alphabetic characters."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0))


def stopword_hits_col(text: Column) -> Column:
    """Count of common-English stopword occurrences (quality signal)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(r"\b(the|a|and|of|to|in|is|it)\b"), F.lit(0)
        )
    )


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality score: length, alpha ratio, stopword rate.
    Deliberately simple arithmetic so the DuckDB oracle can mirror it."""
    toks = token_count_col(text).cast("double")
    stop_rate = F.when(toks > 0, stopword_hits_col(text) / toks).otherwise(F.lit(0.0))
    len_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.4 * alpha_ratio_col(text) + 0.2 * F.least(
            stop_rate * 5.0, F.lit(1.0)
        ),
        6,
    )


def quality_band_col(score: Column) -> Column:
    return (
        F.when(score < 0.25, "low")
        .when(score < 0.5, "medium")
        .when(score < 0.75, "high")
        .otherwise("excellent")
    )


# ---------------------------------------------------------------------------
# BPE-ish subword token estimate — native
# ---------------------------------------------------------------------------


def subword_count_col(text: Column) -> Column:
    """Rough BPE token estimate: word pieces of ≤4 chars + punctuation
    tokens, via regex segmentation (SQL-mirrorable)."""
    return F.size(
        F.regexp_extract_all(
            text, F.lit(r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )


# ---------------------------------------------------------------------------
# word-level stats: Gopher-style quality filters / contamination grams
# (task brief §extras: training-data quality filtering at 100 TB). All
# native Catalyst — per-row list expressions, no UDF, no shuffle.
# ---------------------------------------------------------------------------


def words_col(text: Column) -> Column:
    """Single-space word split (documents.text is space-joined word
    soup). Mirrors DuckDB ``string_split(text, ' ')`` — NOT the regex
    split used by `token_count_col`, so empty-string parity on repeated
    separators is preserved between engines."""
    return F.split(text, " ")


def word_ngrams_col(words: Column, n: int) -> Column:
    """Word n-gram windows as space-joined strings; empty array when the
    doc has < n words. 1-based windows in both engines — DuckDB mirror:
    ``list_transform(range(1, len(words) - n + 2),
    i -> array_to_string(words[i:i+n-1], ' '))``."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast(ArrayType(StringType()))
    )


# Gopher-style stopword set restricted to this corpus's vocabulary so
# the filter has signal on the synthetic word soup (the fuller
# stopword regex lives in `stopword_hits_col`).
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and")
_GOPHER_SET = frozenset(GOPHER_STOPWORDS)


def gopher_stats_udf():
    """Arrow-vectorized word/stopword/dup-n-gram statistics — one pass
    per document, one struct row out. Semantics are EXACTLY the native
    column formulation (`words_col`/`word_ngrams_col` + array_distinct;
    parity pinned in tests/test_curation.py): Python ``str.split(' ')``
    ≡ Spark ``split(text, ' ')`` ≡ DuckDB ``string_split`` including
    empty-string tokens on repeated separators. A UDF rather than
    native expressions because Catalyst evaluates higher-order lambdas
    (transform + slice + concat_ws per window) interpreted, ~30× slower
    per row than this single vectorized pass — measured at bench scale,
    BENCH.md §3d."""

    @F.pandas_udf(
        "n_words long, chars long, n_stop long, "
        "g2 long, g2u long, g5 long, g5u long"
    )
    def _stats(text: pd.Series) -> pd.DataFrame:
        rows = []
        for t in text:
            words = (t if isinstance(t, str) else "").split(" ")
            n = len(words)
            chars = sum(map(len, words))
            stop = sum(1 for w in words if w in _GOPHER_SET)
            g2 = [" ".join(words[i : i + 2]) for i in range(n - 1)]
            g5 = [" ".join(words[i : i + 5]) for i in range(n - 4)]
            rows.append(
                (n, chars, stop, len(g2), len(set(g2)), len(g5), len(set(g5)))
            )
        return pd.DataFrame(
            rows, columns=["n_words", "chars", "n_stop", "g2", "g2u", "g5", "g5u"]
        )

    return _stats


def make_gram_key_udf(n: int = 8, prefix: int = 16):
    """Distinct word-n-gram md5-prefix keys per document, vectorized.
    Key ≡ ``substr(md5(gram), 1, prefix)`` on the exact gram string, so
    the DuckDB mirror recomputes it with its own md5 — element order of
    the returned array is unspecified (consumers explode + distinct)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _keys(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            words = (t if isinstance(t, str) else "").split(" ")
            if len(words) < n:
                out.append([])
                continue
            seen = {
                hashlib.md5(
                    " ".join(words[i : i + n]).encode("utf-8")
                ).hexdigest()[:prefix]
                for i in range(len(words) - n + 1)
            }
            out.append(sorted(seen))
        return pd.Series(out)

    return _keys


# ---------------------------------------------------------------------------
# PII scrubbing — native regexp_replace chain (RE2-safe patterns: no
# backreferences or lookarounds, so Java regex ≡ DuckDB RE2 on these)
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"


def pii_scrub_col(text: Column) -> Column:
    """Redact email → IPv4 → phone, in that fixed order (email first:
    its local/domain parts contain dots and digits that the later
    patterns must not see). Replacement is a typed placeholder so
    downstream token statistics stay stable."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


# ---------------------------------------------------------------------------
# language ID — vectorized heuristic UDF (no SQL equivalent → rows-only check)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that", "with"),
    "de": ("der", "die", "und", "ist", "nicht", "das"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "es": ("el", "la", "los", "que", "es", "una"),
    "zh": (),  # detected by CJK codepoint ratio
}


def _detect_lang(text: str) -> str:
    if not text:
        return "und"
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk / max(len(text), 1) > 0.05:
        return "zh"
    words = text.lower().split()
    if not words:
        return "und"
    bag = set(words)
    best, best_hits = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        hits = sum(1 for m in markers if m in bag)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


@F.pandas_udf(StringType())
def language_id_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: _detect_lang(t if isinstance(t, str) else ""))


# ---------------------------------------------------------------------------
# document fingerprinting — rolling polynomial hash (UDF, rows-only check)
# ---------------------------------------------------------------------------

_FP_MOD = (1 << 61) - 1
_FP_BASE = 131


@F.pandas_udf(LongType())
def rolling_fingerprint_udf(text: pd.Series) -> pd.Series:
    """Deterministic polynomial rolling hash over bytes, mod 2^61-1."""

    def fp(t: str) -> int:
        h = 0
        for b in (t or "").encode("utf-8", "ignore"):
            h = (h * _FP_BASE + b) % _FP_MOD
        return h

    return text.map(lambda t: fp(t if isinstance(t, str) else ""))


# ---------------------------------------------------------------------------
# minhash signatures — numpy-vectorized over Arrow batches
# ---------------------------------------------------------------------------

_P31 = np.uint64((1 << 31) - 1)  # Mersenne; a·h < 2^62 fits uint64 exactly
_SHINGLE_BASE = 131


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, int(_P31), size=num_perm).astype(np.uint64)
    b = rng.randint(0, int(_P31), size=num_perm).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-byte-shingle hashes, fully vectorized: sliding-window
    polynomial hash mod 2^31−1 (terms sum < 2^42, exact in int64)."""
    bs = np.frombuffer((text or "").lower().encode("utf-8", "ignore"), dtype=np.uint8)
    if len(bs) == 0:
        return np.array([0], dtype=np.uint64)
    if len(bs) < k:
        win = bs[None, :]
        powers = _SHINGLE_BASE ** np.arange(len(bs) - 1, -1, -1, dtype=np.int64)
    else:
        win = np.lib.stride_tricks.sliding_window_view(bs, k)
        powers = _SHINGLE_BASE ** np.arange(k - 1, -1, -1, dtype=np.int64)
    h = (win.astype(np.int64) @ powers) % np.int64(_P31)
    return np.unique(h.astype(np.uint64))


def make_minhash_udf(num_perm: int = 64, shingle_k: int = 5, seed: int = 7):
    a, b = _perm_params(num_perm, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_sig(text: pd.Series) -> pd.Series:
        # (a·h + b) mod p, min over shingles, per permutation — the
        # permutation pass runs over the WHOLE Arrow batch's
        # concatenated shingle vector with one segmented min
        # (minimum.reduceat) per permutation: O(docs) python, identical
        # values to the per-doc formulation
        hs = [
            _shingle_hashes(t if isinstance(t, str) else "", shingle_k)
            for t in text
        ]
        if not hs:
            return pd.Series([], dtype=object)
        lens = np.array([len(h) for h in hs], dtype=np.int64)
        flat = np.concatenate(hs)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        out = np.empty((len(hs), num_perm), dtype=np.int64)
        for p in range(num_perm):
            vals = (a[p] * flat + b[p]) % _P31
            out[:, p] = np.minimum.reduceat(vals, starts).astype(np.int64)
        return pd.Series(out.tolist())

    return minhash_sig


# ---------------------------------------------------------------------------
# simhash — 64-bit, numpy-vectorized
# ---------------------------------------------------------------------------


_SIMHASH_BASE = np.uint64(1099511628211)  # FNV-ish odd multiplier


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (avalanches the weak polynomial
    token hash into uniformly distributed 64-bit values)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return x ^ (x >> np.uint64(31))


@F.pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """64-bit simhash over whitespace tokens — one numpy pass for the
    WHOLE Arrow batch: all docs' tokens are concatenated, per-token
    polynomial hashes computed with a single reduceat (uint64
    wraparound arithmetic, splitmix64-finalized), then the ±1 bit sums
    fold back per doc with a second reduceat. No per-token Python."""
    texts = [(t if isinstance(t, str) else "").lower() for t in text]
    toks_per_doc = [t.split() for t in texts]
    n_toks = np.array([len(ts) for ts in toks_per_doc], dtype=np.int64)
    flat = [tok for ts in toks_per_doc for tok in ts]
    out = np.zeros(len(texts), dtype=np.int64)
    if flat:
        joined = "".join(flat).encode("utf-8", "ignore")
        lens = np.array([len(tok.encode("utf-8", "ignore")) for tok in flat],
                        dtype=np.int64)
        b = np.frombuffer(joined, dtype=np.uint8).astype(np.uint64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lens)
        exp = np.repeat(lens, lens) - 1 - pos
        max_len = int(lens.max()) if len(lens) else 1
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            powers = np.empty(max_len, dtype=np.uint64)
            powers[0] = 1
            for i in range(1, max_len):
                powers[i] = powers[i - 1] * _SIMHASH_BASE
            keep = lens > 0
            tok_hash = np.zeros(len(flat), dtype=np.uint64)
            if keep.any():
                contrib = b * powers[exp]
                tok_hash[keep] = np.add.reduceat(contrib, starts[keep])
        tok_hash = _splitmix64(tok_hash)
        # per-doc ±1 bit sums without a (n_tokens, 64) matrix: one
        # bincount per bit position (weights = that bit across all
        # tokens), O(docs) memory; bit b of the signature is set iff
        # 1-bits outnumber 0-bits (2·ones > n_tokens)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), n_toks)
        sig = np.zeros(len(texts), dtype=np.uint64)
        for bbit in range(64):
            ones = np.bincount(
                doc_idx,
                weights=((tok_hash >> np.uint64(bbit)) & np.uint64(1)).astype(
                    np.float64
                ),
                minlength=len(texts),
            ).astype(np.int64)
            sig |= ((2 * ones > n_toks).astype(np.uint64)) << np.uint64(bbit)
        out = sig.astype(np.int64)  # two's-complement view
        out[n_toks == 0] = 0
    return pd.Series(out)
