"""Bubble Entropy kernel — Manis, Aktaruzzaman & Sassi 2017 (IEEE
Trans. Biomed. Eng. 64:2711, "Bubble entropy: an entropy almost free
of parameters").

The fifth member of the engine's regularity family (SampEn, PermEn,
ApEn, FuzzyEn).  Bubble entropy ranks — it needs NO tolerance r and
no normalization (scale- and shift-invariant by construction): each
embedded vector is characterized by the number of swaps bubble sort
needs to order it (= its inversion count), and the signal by the
Rényi-2 entropy of the swap-count distribution, differenced across
embedding dimensions:

    n_i(k)  = #{(a, b) : a < b, x_{i+a} > x_{i+b}}   (inversions,
              windows i = 1..N-k+1)
    H_k     = -ln( Σ_j c_j² / n_w² )    over the swap-count histogram
    bubble  = (H_{m+1} - H_m) / ln((m+1)/(m-1))

Determinism contract: inversion counts and histogram counts are exact
integers; Σc² is an exact int64 (histogram over at most k(k-1)/2 + 1
bins); each H is ONE fixed float expression (-ln(S/(n_w·n_w))), so an
independent SQL replay (pairwise > comparisons on lead() columns)
reproduces every double bit-for-bit.  Ties count as NO swap (strict
>), matching SQL's strict comparison exactly — no float tolerance
anywhere.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["bubble_entropy", "swap_renyi2"]


def _swap_counts(x: np.ndarray, k: int) -> np.ndarray:
    emb = np.lib.stride_tricks.sliding_window_view(x, k)  # (nw, k)
    nw = emb.shape[0]
    swaps = np.zeros(nw, dtype=np.int64)
    for a in range(k):
        for b in range(a + 1, k):
            swaps += (emb[:, a] > emb[:, b]).astype(np.int64)
    return swaps


def swap_renyi2(x: np.ndarray, k: int) -> float:
    """H_k = -ln(Σc²/n_w²) of the swap-count histogram at embedding
    dimension k.  NaN when fewer than 1 window exists."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    if x.size < k:
        return float("nan")
    swaps = _swap_counts(x, k)
    nw = swaps.size
    c = np.bincount(swaps)
    s2 = int((c.astype(object) ** 2).sum())
    return -math.log(float(s2) / (float(nw) * float(nw)))


def bubble_entropy(x: np.ndarray, m: int = 4) -> float:
    """Bubble entropy at embedding dimension m (the paper's
    normalized H_{m+1} - H_m difference).  NaN when the sequence is
    shorter than m + 1 windows' worth (n < m + 1)."""
    if m < 2:
        raise ValueError(f"m must be >= 2, got {m}")
    x = np.ascontiguousarray(x, dtype=np.float64)
    if x.size < m + 1:
        return float("nan")
    h_m = swap_renyi2(x, m)
    h_m1 = swap_renyi2(x, m + 1)
    return (h_m1 - h_m) / math.log((m + 1.0) / (m - 1.0))
