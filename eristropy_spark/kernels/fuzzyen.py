"""Fuzzy Entropy (FuzzyEn) kernel — Chen, Wang, Xie & Wang 2007
(IEEE TNSRE 15:266, "Characterization of surface EMG signal based on
fuzzy entropy").

The fourth member of the engine's regularity family (SampEn, PermEn,
ApEn, FuzzyEn).  FuzzyEn replaces SampEn's hard <r match indicator
with a smooth Gaussian membership over BASELINE-REMOVED templates —
the two properties that made it the EMG/EEG standard: continuity in r
(no cliff when a distance crosses the tolerance) and robustness to
local drift (each template is centered before comparison).

Definition kept here (the SampEn-style convention of the paper):

    u_i^k      = [x_i .. x_{i+k-1}] - mean(x_i .. x_{i+k-1})
    d_ij       = max_l |u_i[l] - u_j[l]|           (Chebyshev)
    D_ij       = exp(-(d_ij)^2 / r)                (fuzzy power 2)
    phi_k      = sum_{i != j} D_ij / (nt * (nt-1)),  nt = N - m
                 (both k = m and k = m+1 use the SAME template count
                  nt = N - m: length-m windows drop their last one)
    FuzzyEn    = ln(phi_m) - ln(phi_{m+1})

Determinism contract: every membership D_ij is floor-quantized onto
the 9-decimal grid (floor(D*1e9 + 0.5), one fixed float expression)
and summed as EXACT integers — order-free, so numpy's blocked sweep,
any partitioning, and an independent DuckDB DECIMAL(10,9) replay all
produce the identical sum; nt <= ~3000 keeps the integer total under
2^53, so the final (sum/1e9)/(nt*(nt-1)) division sequence is the
same correctly-rounded double in both engines.  The O(n²·m) pair
sweep is vectorized (blocked Chebyshev broadcasting); there is no
per-pair Python.

Note m = 1 is degenerate by construction (a centered 1-template is
identically zero, so phi_1 = 1); require m >= 2.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["fuzzyen", "fuzzyen_znormed"]

_SCALE = 1e9


def _phi_int(x: np.ndarray, k: int, nt: int, r: float) -> int:
    """Exact integer sum of 9-dp-quantized memberships over ordered
    pairs (i != j) of the first ``nt`` centered k-templates."""
    emb = np.lib.stride_tricks.sliding_window_view(x, k)[:nt]  # (nt, k)
    # left-to-right fold, mirroring the SQL ((x0 + x1) + x2) / k
    s = emb[:, 0].copy()
    for col in range(1, k):
        s = s + emb[:, col]
    u = emb - (s / float(k))[:, None]

    total = 0
    block = max(1, min(nt, 4_000_000 // max(nt, 1) + 1))
    for lo in range(0, nt, block):
        hi = min(lo + block, nt)
        d = np.abs(u[lo:hi, None, :] - u[None, :, :]).max(axis=2)
        q = np.floor(np.exp(-(d * d) / r) * _SCALE + 0.5).astype(np.int64)
        total += int(q.sum())
    # self-pairs have d = 0 -> D = 1 -> q = 1e9 exactly; drop them
    return total - nt * int(_SCALE)


def fuzzyen(x: np.ndarray, m: int = 2, r: float = 0.2) -> float:
    """FuzzyEn(m, r) of a raw sequence.  NaN when too short
    (need N >= m + 2 so each phase has >= 2 templates)."""
    if m < 2:
        raise ValueError(f"m must be >= 2 (m=1 is degenerate), got {m}")
    if not r > 0:
        raise ValueError(f"r must be > 0, got {r}")
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.size
    nt = n - m
    if nt < 2:
        return float("nan")
    denom = float(nt * (nt - 1))
    s_m = _phi_int(x, m, nt, r)
    s_m1 = _phi_int(x, m + 1, nt, r)
    if s_m <= 0 or s_m1 <= 0:
        return float("nan")
    phi_m = (float(s_m) / _SCALE) / denom
    phi_m1 = (float(s_m1) / _SCALE) / denom
    return math.log(phi_m) - math.log(phi_m1)


def fuzzyen_znormed(x: np.ndarray, m: int = 2, r: float = 0.2) -> float:
    """FuzzyEn of the z-normalized sequence (ddof=1, the engine's W12
    convention — r is then in SD² units).  NaN for constant or
    too-short sequences."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.size
    if n - m < 2:
        return float("nan")
    mu = float(x.sum()) / n
    d = x - mu
    var = float(d @ d) / (n - 1)
    if var <= 0.0:
        return float("nan")
    return fuzzyen(d / math.sqrt(var), m=m, r=r)
