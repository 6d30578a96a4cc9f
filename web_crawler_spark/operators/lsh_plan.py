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


@dataclass(frozen=True)
class LshPlan:
    """A planned banding config plus its model predictions."""

    bits_per_band: int  # r (sign bits, or minhash rows, per band)
    bands: int  # b
    multiprobe: bool
    predicted_recall: float  # collision_prob at p_dup
    candidate_fraction: float  # collision_prob at p_bg
    cost_per_item: float  # expected candidate partners + index rows

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
    if not p_bg < p_dup <= 1.0:
        raise ValueError(f"need p_bg < p_dup <= 1 (got {p_bg=}, {p_dup=})")
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
        frac = collision_prob(p_bg, r, b, multiprobe)
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
) -> LshPlan:
    """Size a hyperplane-LSH banding for a corpus of n vectors whose
    duplicate pairs sit at cosine ≥ cos_dup over a background at
    cos_bg (≈0 for random high-dim vectors). Feed the result to
    `embedding_cosine_pairs_lsh` / `lsh_topk` as
    ``num_bits=plan.num_bits, bands=plan.bands,
    multiprobe=plan.multiprobe``."""
    return _plan(
        sign_bit_agreement(cos_dup),
        sign_bit_agreement(cos_bg),
        n,
        target_recall,
        multiprobe,
        MAX_SIGN_BITS_PER_BAND,
        max_bands,
        index_row_cost,
    )


def plan_minhash(
    n: int,
    j_dup: float,
    j_bg: float = 0.05,
    target_recall: float = 0.9,
    max_rows_per_band: int = 16,
    max_bands: int = 64,
    index_row_cost: float = 1.0,
) -> LshPlan:
    """Size a minhash banding for a corpus of n documents whose
    near-dup pairs have Jaccard ≥ j_dup over a background at j_bg.
    Feed to `minhash_lsh_pairs` as ``num_perm=plan.num_bits,
    bands=plan.bands`` (bits_per_band = rows per band; no multiprobe
    — band hashes are xxhash64 digests, not bit-decomposable)."""
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
