"""Lake et al. analytic CP mean/SD for SampEn confidence intervals.

Implements the conditional-probability estimator and its analytical
standard deviation from Lake, Richman, Griffin & Moorman, "Sample
entropy analysis of neonatal heart rate variability" (Am J Physiol
2002) — the same published algorithm the reference wraps
(eristropy/extras.py:51-191, itself derived from PhysioNet's public
``sampen.c``).  Quantities:

* ``p = A_m / B_m`` — CP that a match of length m extends to m+1
  (``-log p`` is SampEn, cross-checked against kernels/sampen.py),
* ``sd`` — SD of the CP estimate accounting for overlapping-template
  correlation: ``var = p(1-p)/B + max(0, (N2 - N1·p²))/B²`` where N1/N2
  accumulate lag-binned products of per-index match counts with
  run-length overlap corrections.

The run/overlap bookkeeping is inherently sequential per i (run-length
recurrences), so this kernel is plain loops over NumPy arrays — used
by the SampEnEfficiency r-grid, where each (sequence, r) cell is an
independent task and the parallelism lives at the Spark layer.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["cp_mean_sd"]


def cp_mean_sd(x: np.ndarray, m: int, r: float) -> tuple[float, float]:
    """(CP, SD(CP)) at embedding m and tolerance r (strict ``< r``)."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.size
    mm = m + 1  # template orders tracked: 1..mm
    lag_window = 2 * mm

    run = np.zeros(n, dtype=np.int64)
    run_prev = np.zeros(n, dtype=np.int64)
    # R1[i, j]: run length at outer step i, offset j (first lag_window offsets)
    R1 = np.zeros((n, lag_window), dtype=np.int64)
    R2 = np.zeros((n, lag_window), dtype=np.int64)
    F = np.zeros((n, lag_window), dtype=np.int64)
    F1 = np.zeros((n, mm), dtype=np.int64)
    A = np.zeros(mm, dtype=np.float64)
    B = np.zeros(mm, dtype=np.float64)

    for i in range(n - 1):
        nj = n - i - 1
        match = np.abs(x[i + 1 :] - x[i]) < r
        run[:nj] = np.where(match, run_prev[:nj] + 1, 0)
        capped = np.minimum(run[:nj], mm)
        # order-count updates (vectorized over offsets)
        for order in range(mm):
            hits = capped > order
            c = int(hits.sum())
            A[order] += c
            if hits[nj - 1]:
                B[order] += c - 1
            else:
                B[order] += c
            F1[i, order] += c
            F[i, order] += c
            js = np.nonzero(hits)[0] + i + 1
            np.add.at(F, (js, order), 1)
        run_prev[:nj] = run[:nj]
        # NOTE: offsets >= nj keep their last-valid run value here — the
        # published algorithm copies the first lag_window entries of the
        # persistent run buffer verbatim (extras.py:124-127), so rows
        # near the end of the series carry those carried-over values
        R1[i, :] = run[:lag_window]

    # R2[i, j] = run length of the pair ending at i with lag j+1
    for i in range(1, lag_window):
        for j in range(i - 1):
            R2[i, j] = R1[i - j - 1, j]
    for i in range(lag_window, n):
        for j in range(lag_window):
            R2[i, j] = R1[i - j - 1, j]

    F2 = F[:, :mm] - F1  # matches where i is the right endpoint

    # K accumulators: K[m_order][d] for d = 0..mm  (d=0 slot: same-index pairs)
    K = np.zeros((mm, mm + 1), dtype=np.float64)
    for order in range(mm):
        FF = F[:, order].astype(np.float64)
        K[order, 0] = float((FF * (FF - 1)).sum())

    # lag-d cross products with run-overlap corrections
    dd = 1
    for order in range(mm):
        d2 = order + 1 if order + 1 < mm - 1 else mm - 1
        for d in range(d2 + 1):
            i1s = np.arange(d + 1, n)
            i2s = i1s - d - 1
            nm1 = F1[i1s, order].astype(np.int64).copy()
            nm3 = F1[i2s, order].astype(np.int64).copy()
            nm2 = F2[i1s, order].astype(np.int64).copy()
            nm4 = F2[i2s, order].astype(np.int64).copy()
            thresh = order + 1
            for j in range(dd - 1):
                nm1 -= R1[i1s, j] >= thresh
                nm4 -= R2[i1s, j] >= thresh
            for j in range(2 * (d + 1)):
                nm2 -= R2[i1s, j] >= thresh
            for j in range(2 * d + 1):
                nm3 -= R1[i2s, j] >= thresh
            K[order, d + 1] += float((2 * (nm1 + nm2) * (nm3 + nm4)).sum())

    # shift B to "denominator" convention: B[m] counts matches of order m
    for order in range(mm - 1, 0, -1):
        B[order] = B[order - 1]
    B[0] = n * (n - 1) / 2.0

    p = A / B
    var_base = p * (1.0 - p) / B

    N1 = np.zeros(mm, dtype=np.float64)
    N1[0] = float(n * (n - 1) * (n - 2))
    for order in range(mm - 1):
        N1[order + 1] = K[order, : order + 2].sum()
    N2 = np.array([K[order, : order + 1].sum() for order in range(mm)])

    var = var_base.copy()
    dv = (N2 - N1 * p * p) / (B * B)
    var[dv > 0] += dv[dv > 0]
    sd = np.sqrt(var)

    return float(p[mm - 1]), float(sd[mm - 1])
