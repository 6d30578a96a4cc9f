"""Size-tuned banding planner for the LSH tiers (sign-LSH + minhash).

Why this exists: the recall gates (BENCH.md §3b) showed that a FIXED
band config pays a large constant candidate fraction on a
weakly-correlated corpus — the asymptotic LSH win (candidate pairs
~ n^(1+rho), rho = ln p1 / ln p2) only materializes when the band
width r grows with log n. This module computes that sizing
analytically so a 10^9-item corpus gets wider bands (sparser buckets)
and more of them (recall held at the target), instead of inheriting a
config grid-searched at 10^4 items.

The collision model is the standard banding S-curve over per-unit
agreement probability p:

- one band of r bits/rows collides with probability p^r
  (+ r·p^(r-1)·(1-p) when one side is probed with every single-bit
  flip — the ``multiprobe`` variant of
  `similarity.make_hyperplane_udf`, which collides on band hamming
  distance ≤ 1);
- b independent bands: P(collide) = 1 − (1 − P_band)^b — this is the
  RECALL for a duplicate pair (p = p_dup) and the expected CANDIDATE
  FRACTION for a background pair (p = p_bg).

For sign-LSH, p(cos) = 1 − arccos(cos)/π (hyperplane rounding,
Goemans–Williamson); for minhash, p equals the Jaccard similarity
itself. The planner enumerates band widths, takes the minimal band
count meeting the recall target at each width, scores each config by
expected per-item work (candidate partners + index rows emitted), and
returns the argmin. `tests/test_lsh_plan.py` validates the model
against Monte-Carlo banding of the REAL signature kernels and against
a live Spark run of `embedding_cosine_pairs_lsh`.

Reference anchor: the reference crawler has no LSH tier; this backs
the task brief's dedup/ANN extras at 100 TB scale (BENCH.md §3b
"honest scale reading").
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

# the int64 band packing in make_hyperplane_udf tags band ids above bit
# 32, so a band may hold at most 32 sign bits; minhash band hashes are
# xxhash64 over row slices and carry no such cap, but >64 rows/band is
# never optimal under any sane budget.
MAX_SIGN_BITS_PER_BAND = 32


def sign_bit_agreement(cos: float) -> float:
    """P(one random hyperplane puts both vectors on the same side) for
    a pair at the given cosine: 1 − θ/π."""
    c = min(1.0, max(-1.0, cos))
    return 1.0 - math.acos(c) / math.pi


def band_collision_prob(p: float, r: int, multiprobe: bool = False) -> float:
    """P(one r-unit band collides) for a pair with per-unit agreement
    p; with single-bit multiprobe on one side, collision happens at
    band hamming distance ≤ 1."""
    base = p**r
    if multiprobe and r > 1:
        base += r * p ** (r - 1) * (1.0 - p)
    elif multiprobe and r == 1:
        base = 1.0  # probing the only bit always collides
    return min(1.0, base)


def collision_prob(p: float, r: int, b: int, multiprobe: bool = False) -> float:
    """P(pair shares ≥1 bucket) under b independent r-unit bands —
    recall when p = p_dup, expected candidate fraction when p = p_bg."""
    return 1.0 - (1.0 - band_collision_prob(p, r, multiprobe)) ** b


# ---------------------------------------------------------------------------
# query-directed probing model (r5): probe only the m smallest-|margin|
# bits per band instead of all r single-bit flips
# ---------------------------------------------------------------------------
#
# Geometry (Goemans–Williamson frame): for a pair (q, c) at angle θ and
# a hyperplane w ~ N(0, I), write u = q·w ~ N(0,1) and decompose
# c = cosθ·q + sinθ·q⊥ so c·w = cosθ·u + sinθ·z with z ~ N(0,1)
# independent. The bit DISAGREES iff sign(u) ≠ sign(cosθ·u + sinθ·z):
#
#   P(disagree | margin |u| = t) = Φ(−t·cotθ)          =: g(t)
#
# — decreasing in t for θ < π/2. Disagreements concentrate on the
# query's SMALL-margin bits, while for a background pair (θ = π/2,
# cotθ = 0) g ≡ 1/2 is margin-independent. Probing the m
# smallest-margin bits therefore catches a duplicate's single
# disagreeing bit with probability far above m/r, but catches a
# background pair's with exactly m/r — the asymmetry that makes
# directed probing strictly cheaper than the full r-flip probe set at
# equal recall. A band collides under m-probe iff it has 0
# disagreements, or exactly 1 whose margin ranks among the m smallest:
#
#   P_band(θ, r, m) = A(∞)^r
#     + r·∫ f(t)·g(t)·Σ_{k<m} C(r−1,k)·A(t)^k·(A(∞)−A(t))^{r−1−k} dt
#
# with f the half-normal margin density and A(t) = ∫₀ᵗ f(1−g) — the
# probability another bit agrees AND has margin below t. Evaluated by
# deterministic trapezoid quadrature (no Monte-Carlo in the planner);
# tests/test_lsh_plan.py validates it against the real signature
# kernel. m = r reduces to the closed-form multiprobe S-curve above;
# m = 0 to the plain p^r band.

_QUAD_POINTS = 4001
_QUAD_TMAX = 8.0


def _norm_cdf(x: np.ndarray) -> np.ndarray:
    erf = np.frompyfunc(math.erf, 1, 1)
    return 0.5 * (1.0 + erf(x / math.sqrt(2.0)).astype(np.float64))


@lru_cache(maxsize=512)
def _directed_tables(theta: float):
    t = np.linspace(0.0, _QUAD_TMAX, _QUAD_POINTS)
    dt = t[1] - t[0]
    dens = math.sqrt(2.0 / math.pi) * np.exp(-0.5 * t * t)
    if theta <= 1e-12:
        g = np.zeros_like(t)
    elif theta >= math.pi - 1e-12:
        g = np.ones_like(t)
    else:
        g = _norm_cdf(-t * (math.cos(theta) / math.sin(theta)))
    fg = dens * (1.0 - g)
    # cumulative trapezoid of f·(1−g): A(t)
    a = np.concatenate(([0.0], np.cumsum((fg[1:] + fg[:-1]) * 0.5 * dt)))
    return t, dt, dens, g, a


@lru_cache(maxsize=4096)
def directed_band_collision_prob(theta: float, r: int, m: int) -> float:
    """P(one r-bit band collides) for a pair at angle theta when the
    query side probes its m smallest-|margin| single-bit flips
    (m = 0: exact band match only; m >= r: the full probe set)."""
    if r < 1:
        raise ValueError("band width must be >= 1")
    m = max(0, min(m, r))
    t, dt, dens, g, a = _directed_tables(theta)
    p_agree = a[-1]  # = 1 − θ/π up to quadrature error
    zero = p_agree**r
    if m == 0:
        return min(1.0, zero)
    if r == 1:
        return 1.0  # probing the only bit always collides
    below, above = a, p_agree - a
    sk = np.zeros_like(t)
    for k in range(m):
        sk += math.comb(r - 1, k) * below**k * above ** (r - 1 - k)
    integ = dens * g * sk
    one_cov = r * float(np.sum((integ[1:] + integ[:-1]) * 0.5 * dt))
    return min(1.0, zero + one_cov)


def directed_collision_prob(theta: float, r: int, b: int, m: int) -> float:
    """P(pair shares ≥1 bucket) under b bands with m-bit directed
    probing — recall at theta_dup, candidate fraction at theta_bg."""
    return 1.0 - (1.0 - directed_band_collision_prob(theta, r, m)) ** b


# ---------------------------------------------------------------------------
# measured background distributions (r5): cost candidates against the
# corpus's OWN pair-similarity distribution instead of a guessed point.
# Motivation (BENCH.md §3b-app): the fixture documents corpus has
# random-pair Jaccard mean 0.18 / p90 0.25, not the 0.05 the minhash
# calibration guessed — the mis-calibrated planner sized 3-row bands
# whose banding join emitted 13 % of ALL pairs as candidates (1.66M at
# n = 5,000), exactly 27·0.18³. The S-curve is convex in the upper
# tail, so no single quantile is a safe point summary; the planner
# therefore takes a VECTOR of sampled background quantiles and costs
# the expected candidate fraction over it.
# ---------------------------------------------------------------------------


def _bg_points(bg, dup: float, name: str) -> np.ndarray:
    """Normalize a background spec (scalar, or a sampled quantile
    vector from `measure_*_background`) to a 1-D array strictly below
    the duplicate threshold. Sampled points at or above the threshold
    ARE duplicates under the operator's own definition — recall mass,
    not background cost — so they are dropped, not clamped."""
    arr = np.atleast_1d(np.asarray(bg, dtype=np.float64))
    kept = arr[arr < dup]
    if kept.size == 0:
        raise ValueError(
            f"every sampled {name} point is >= the duplicate threshold "
            f"{dup}; under this calibration the corpus is all-duplicates "
            "— raise the threshold or check the sample"
        )
    return kept


def _read_parquet_head(path: str, columns: list, scan_cap: int):
    """Driver-side bounded read: the first `scan_cap` rows of the
    pruned columns — O(scan_cap) I/O regardless of corpus size (the
    same flat cost a 100 TB corpus pays), no Spark job. `path` may be
    a single parquet file or a directory of part files (the first
    files in sorted name order are read until the cap)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        if not parts:
            raise FileNotFoundError(f"no parquet part files under {path}")
    else:
        parts = [path]
    batches, got = [], 0
    for part in parts:
        for batch in pq.ParquetFile(part).iter_batches(
            batch_size=min(scan_cap, 4096), columns=columns
        ):
            batches.append(batch)
            got += batch.num_rows
            if got >= scan_cap:
                break
        if got >= scan_cap:
            break
    return pa.Table.from_batches(batches).slice(0, scan_cap).to_pandas()


def _stable_sample_idx(ids, k: int, salt: str = "lshbg") -> np.ndarray:
    """Indices of the k ids with smallest md5(salt + id) — the same
    deterministic order-independent sampling idiom the IVF centroid
    trainer uses (operators/similarity.py), so two runs (and the
    recall mirror) measure the identical subsample."""
    import hashlib

    keys = np.array(
        [hashlib.md5((salt + str(i)).encode()).hexdigest() for i in ids]
    )
    return np.argsort(keys, kind="stable")[:k]


def _pair_quantiles(vals: np.ndarray, q_points: int) -> np.ndarray:
    """q_points evenly spaced quantiles (midpoint rule) of the sampled
    pair-similarity values — a compact deterministic summary the
    planner can integrate the S-curve over."""
    qs = (np.arange(q_points) + 0.5) / q_points
    return np.quantile(vals, qs)


def measure_jaccard_background(
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    num_perm: int = 128,
    k: int = 256,
    scan_cap: int = 8192,
    q_points: int = 33,
) -> np.ndarray:
    """Measured background pair-Jaccard distribution of a document
    corpus: `q_points` quantiles over ALL pairs of a deterministic
    k-doc sample (bounded I/O via `_read_parquet_head`). Similarity is
    minhash-signature agreement under the SAME kernel the operator
    uses (`functions.text.make_minhash_udf`), so the measured
    distribution is exactly what the banding join will see. Feed the
    result to ``plan_minhash(j_bg=...)``."""
    from web_crawler_spark.functions.text import make_minhash_udf

    df = _read_parquet_head(path, [id_col, text_col], scan_cap)
    idx = _stable_sample_idx(df[id_col].tolist(), k)
    texts = df[text_col].iloc[idx].reset_index(drop=True)
    sig_fn = make_minhash_udf(num_perm=num_perm, shingle_k=shingle_k).func
    sigs = np.array(sig_fn(texts).tolist())
    agree = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
    iu = np.triu_indices(len(sigs), 1)
    return _pair_quantiles(agree[iu], q_points)


def measure_cosine_background(
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 512,
    scan_cap: int = 8192,
    q_points: int = 17,
) -> np.ndarray:
    """Measured background pair-cosine distribution of an embedding
    corpus (same deterministic bounded-sample protocol as
    `measure_jaccard_background`). Feed to
    ``plan_sign_lsh(cos_bg=...)``."""
    df = _read_parquet_head(path, [id_col, vec_col], scan_cap)
    idx = _stable_sample_idx(df[id_col].tolist(), k)
    v = np.vstack(df[vec_col].iloc[idx].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    v = v / np.where(norms == 0.0, 1.0, norms)
    gram = v @ v.T
    iu = np.triu_indices(len(v), 1)
    return _pair_quantiles(np.clip(gram[iu], -1.0, 1.0), q_points)


@dataclass(frozen=True)
class LshPlan:
    """A planned banding config plus its model predictions."""

    bits_per_band: int  # r (sign bits, or minhash rows, per band)
    bands: int  # b
    multiprobe: bool
    predicted_recall: float  # collision_prob at p_dup
    candidate_fraction: float  # collision_prob at p_bg
    cost_per_item: float  # expected candidate partners + index rows
    # sign-LSH only: how many smallest-|margin| single-bit flips the
    # query side probes per band (0 = none, bits_per_band = full set);
    # feeds make_hyperplane_udf(probe_bits=...)
    probe_bits: int = 0

    @property
    def num_bits(self) -> int:
        """Total signature width (``num_bits``/``num_perm`` argument of
        the signature UDFs)."""
        return self.bits_per_band * self.bands


def _plan(
    p_dup: float,
    p_bg: float,
    n: int,
    target_recall: float,
    multiprobe: bool,
    max_units_per_band: int,
    max_bands: int,
    index_row_cost: float,
) -> LshPlan:
    if not 0.0 < p_dup <= 1.0:
        raise ValueError(f"need 0 < p_dup <= 1 (got {p_dup=})")
    bg = _bg_points(p_bg, p_dup, "background similarity")
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    best: LshPlan | None = None
    for r in range(1, max_units_per_band + 1):
        pb = band_collision_prob(p_dup, r, multiprobe)
        if pb >= 1.0:
            b = 1
        else:
            # minimal band count hitting the recall target
            b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pb))
        if b > max_bands:
            continue  # this width can't reach the target affordably
        # expected candidate fraction over the (sampled) background
        # similarity distribution — the S-curve is convex in its upper
        # tail, so integrating over measured quantiles is materially
        # more honest than any single-point bg summary
        frac = float(
            np.mean([collision_prob(p, r, b, multiprobe) for p in bg])
        )
        # expected per-item work: candidate partners generated among the
        # other n−1 items, plus the index rows this item emits into the
        # band join (each a shuffled row): b on the base frame, plus
        # b·(r+1) on the probed frame under single-bit multiprobe.
        probe_rows = b * ((r + 2) if multiprobe else 1.0)
        cost = (n - 1) * frac + index_row_cost * probe_rows
        plan = LshPlan(
            bits_per_band=r,
            bands=b,
            multiprobe=multiprobe,
            predicted_recall=collision_prob(p_dup, r, b, multiprobe),
            candidate_fraction=frac,
            cost_per_item=cost,
            probe_bits=r if multiprobe else 0,
        )
        if best is None or plan.cost_per_item < best.cost_per_item:
            best = plan
    if best is None:
        raise ValueError(
            "no config reaches the recall target within the band budget; "
            "raise max_bands or lower target_recall"
        )
    return best


def _plan_sign(
    theta_dup: float,
    theta_bg,
    n: int,
    target_recall: float,
    probe_opts,
    max_bands: int,
    index_row_cost: float,
) -> LshPlan:
    thetas = np.atleast_1d(np.asarray(theta_bg, dtype=np.float64))
    best: LshPlan | None = None
    for r in range(1, MAX_SIGN_BITS_PER_BAND + 1):
        for m in probe_opts(r):
            pb = directed_band_collision_prob(theta_dup, r, m)
            if pb <= 0.0:
                continue
            if pb >= 1.0:
                b = 1
            else:
                b = max(
                    1,
                    math.ceil(
                        math.log(1.0 - target_recall) / math.log(1.0 - pb)
                    ),
                )
            if b > max_bands:
                continue
            # expected fraction over the (sampled) background angles
            frac = float(
                np.mean(
                    [
                        directed_collision_prob(float(th), r, b, m)
                        for th in thetas
                    ]
                )
            )
            # per-item shuffled index rows: b on the base frame, plus
            # b·(m+1) on the probed frame under m-bit directed probing
            probe_rows = b * ((m + 2) if m > 0 else 1.0)
            cost = (n - 1) * frac + index_row_cost * probe_rows
            plan = LshPlan(
                bits_per_band=r,
                bands=b,
                multiprobe=m > 0,
                predicted_recall=directed_collision_prob(theta_dup, r, b, m),
                candidate_fraction=frac,
                cost_per_item=cost,
                probe_bits=m,
            )
            if best is None or plan.cost_per_item < best.cost_per_item:
                best = plan
    if best is None:
        raise ValueError(
            "no config reaches the recall target within the band budget; "
            "raise max_bands or lower target_recall"
        )
    return best


def plan_sign_lsh(
    n: int,
    cos_dup: float,
    cos_bg: float = 0.0,
    target_recall: float = 0.9,
    multiprobe: bool = True,
    max_bands: int = 128,
    index_row_cost: float = 1.0,
    probe_bits: int | str = "auto",
) -> LshPlan:
    """Size a hyperplane-LSH banding for a corpus of n vectors whose
    duplicate pairs sit at cosine ≥ cos_dup over a background at
    cos_bg — a guessed scalar (≈0 for random high-dim vectors), or
    the measured quantile vector from `measure_cosine_background`,
    which captures the correlated upper tail a point guess misses.
    Feed the result to
    `embedding_cosine_pairs_lsh` / `lsh_topk` as
    ``num_bits=plan.num_bits, bands=plan.bands,
    multiprobe=plan.multiprobe, probe_bits=plan.probe_bits``.

    ``probe_bits``: "auto" (default) lets the optimizer choose among
    no probing, m ∈ {1, 2, 4} query-directed smallest-|margin| flips,
    and the full per-band flip set — directed probing catches a
    duplicate's disagreeing bit far above m/r (disagreements
    concentrate on small margins) while background pairs gain only
    m/r, so it usually dominates the full probe set on cost at equal
    recall. An int pins m; ``multiprobe=False`` forbids probing."""
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    if not -1.0 <= cos_dup <= 1.0:
        raise ValueError(f"need -1 <= cos_dup <= 1 (got {cos_dup=})")
    # cos_bg: a guessed scalar, or a measured quantile vector from
    # `measure_cosine_background` — points at/above cos_dup are
    # duplicate mass, not background cost (dropped by _bg_points)
    bg = _bg_points(cos_bg, cos_dup, "background cosine")
    theta_dup = math.acos(min(1.0, max(-1.0, cos_dup)))
    theta_bg = np.arccos(np.clip(bg, -1.0, 1.0))
    if not multiprobe:
        probe_opts = lambda r: (0,)  # noqa: E731
    elif probe_bits == "auto":
        probe_opts = lambda r: sorted({0, 1, 2, min(4, r), r})  # noqa: E731
    else:
        m_fixed = int(probe_bits)
        probe_opts = lambda r: (min(m_fixed, r),)  # noqa: E731
    return _plan_sign(
        theta_dup,
        theta_bg,
        n,
        target_recall,
        probe_opts,
        max_bands,
        index_row_cost,
    )


def plan_minhash(
    n: int,
    j_dup: float,
    j_bg=0.05,
    target_recall: float = 0.9,
    max_rows_per_band: int = 16,
    max_bands: int = 64,
    index_row_cost: float = 1.0,
) -> LshPlan:
    """Size a minhash banding for a corpus of n documents whose
    near-dup pairs have Jaccard ≥ j_dup over a background at j_bg —
    a guessed scalar, or (better) the measured quantile vector from
    `measure_jaccard_background(path)`: the planner then integrates
    the candidate cost over the corpus's real pair-Jaccard
    distribution instead of a point guess (boilerplate-heavy corpora
    sit far above the textbook 0.05). Feed to `minhash_lsh_pairs` as
    ``num_perm=plan.num_bits, bands=plan.bands`` (bits_per_band =
    rows per band; no multiprobe — band hashes are xxhash64 digests,
    not bit-decomposable)."""
    return _plan(
        j_dup,
        j_bg,
        n,
        target_recall,
        multiprobe=False,
        max_units_per_band=max_rows_per_band,
        max_bands=max_bands,
        index_row_cost=index_row_cost,
    )
