"""Approximate Entropy (ApEn) kernel — Pincus 1991, PNAS 88:2297.

The third member of the engine's regularity family (SampEn, PermEn,
ApEn).  Published definition, kept exactly:

    C_i^m(r)  = #{ j : max_k |x_{i+k} - x_{j+k}| <= r } / (N - m + 1)
                (j ranges over all N-m+1 templates, INCLUDING j = i)
    Phi_m(r)  = (N - m + 1)^{-1} * sum_i ln C_i^m(r)
    ApEn(m,r) = Phi_m(r) - Phi_{m+1}(r)

Two deliberate contrasts with this repo's SampEn (both are the
published definitions, not bugs): the match predicate is ``<= r``
(SampEn's reference code uses strict ``<``), and self-matches are
counted (which is what keeps every ln argument positive — ApEn is
total, SampEn is NULL when no (m+1)-match exists).

Determinism contract: the per-template counts are exact integers; the
Phi sums accumulate ln terms SEQUENTIALLY in template order (a plain
float fold, matching an ORDER BY-ed SQL ``sum`` exactly — numpy's
pairwise ``sum`` would differ in the last ulp), so an independent
DuckDB replay reproduces the doubles bit-for-bit before rounding.
The O(n²·m) pair sweep itself is vectorized (blocked Chebyshev
broadcasting), only the final ~n-term fold is a Python loop.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["apen", "apen_znormed"]


def _phi(x: np.ndarray, m: int, r: float) -> float:
    n = x.size
    nw = n - m + 1
    emb = np.lib.stride_tricks.sliding_window_view(x, m)  # (nw, m)
    # blocked pairwise Chebyshev counts: exact integers
    counts = np.zeros(nw, dtype=np.int64)
    block = max(1, min(nw, 4_000_000 // max(nw, 1) + 1))
    for s in range(0, nw, block):
        e = min(s + block, nw)
        d = np.abs(emb[s:e, None, :] - emb[None, :, :]).max(axis=2)
        counts[s:e] = (d <= r).sum(axis=1)
    acc = 0.0
    inv = float(nw)
    for c in counts:
        acc += math.log(c / inv)
    return acc / inv


def apen(x: np.ndarray, m: int = 1, r: float = 0.2) -> float:
    """ApEn(m, r) of a raw sequence (no normalization).  NaN when the
    sequence is too short (need N >= m + 2 so Phi_{m+1} has >= 1
    template)."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if r < 0:
        raise ValueError(f"r must be >= 0, got {r}")
    x = np.ascontiguousarray(x, dtype=np.float64)
    if x.size < m + 2:
        return float("nan")
    return _phi(x, m, r) - _phi(x, m + 1, r)


def apen_znormed(x: np.ndarray, m: int = 1, r: float = 0.2) -> float:
    """ApEn of the z-normalized sequence (ddof=1, the engine's W12
    convention — r is then in population-SD units, the standard usage).
    NaN for constant or too-short sequences."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.size
    if n < m + 2:
        return float("nan")
    mu = float(x.sum()) / n
    d = x - mu
    var = float(d @ d) / (n - 1)
    if var <= 0.0:
        return float("nan")
    return apen(d / math.sqrt(var), m=m, r=r)
