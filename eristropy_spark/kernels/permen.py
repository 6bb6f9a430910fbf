"""Permutation Entropy (Bandt & Pompe 2002) — vectorized NumPy kernel.

The reference *advertises* PermEn (README.md:14; the runtime warning at
eristropy/sample_entropy.py:342 says "using our PermEn class") but ships
no implementation, so this kernel follows the public Bandt–Pompe
definition: Shannon entropy of the distribution of ordinal patterns of
embedded windows ``(x_t, x_{t+τ}, …, x_{t+(m−1)τ})``.

Conventions (documented because there is no reference code to match):

* ties are broken by time order (stable argsort), the usual
  Bandt–Pompe convention — a constant signal has a single pattern and
  PermEn exactly 0.0;
* natural log, like the reference's SampEn;
* ``normalize=True`` divides by ``log(m!)`` so the result lies in
  [0, 1].
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["permen", "ordinal_pattern_codes"]


def ordinal_pattern_codes(x: np.ndarray, m: int, delay: int = 1) -> np.ndarray:
    """Lehmer-coded ordinal pattern of every embedded window.

    Returns an int64 vector of length ``n - (m-1)*delay`` where equal
    codes <=> equal ordinal patterns.
    """
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.size
    n_win = n - (m - 1) * delay
    if n_win <= 0:
        return np.empty(0, dtype=np.int64)

    # (n_win, m) embedding without copying the data m times
    idx = np.arange(n_win)[:, None] + delay * np.arange(m)[None, :]
    windows = x[idx]
    ranks = np.argsort(np.argsort(windows, axis=1, kind="stable"), axis=1, kind="stable")
    # mixed-radix encode: rank vector -> unique integer (m <= 20 fits int64)
    radix = (m ** np.arange(m)).astype(np.int64)
    return ranks.astype(np.int64) @ radix


def permen(x: np.ndarray, m: int = 3, delay: int = 1, normalize: bool = False) -> float:
    """Permutation entropy of ``x`` at embedding order ``m`` and lag ``delay``."""
    codes = ordinal_pattern_codes(x, m, delay)
    if codes.size == 0:
        return float("nan")
    _, counts = np.unique(codes, return_counts=True)
    p = counts / counts.sum()
    h = float(-(p * np.log(p)).sum())
    if normalize:
        h /= math.log(math.factorial(m))
    return h
