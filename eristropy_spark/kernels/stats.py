"""Scalar reduction kernels (reference parity: eristropy/utils.py:8-68).

All functions take/return float64 NumPy values.  The reference compiles
these with Numba ``fastmath=True``; we rely on NumPy's pairwise
summation instead, which matches the reference's own test tolerances
(tests/test_utils.py:15-61 compare against ``np.mean`` etc.).
"""

from __future__ import annotations

import numpy as np


def mean(x: np.ndarray) -> float:
    """Arithmetic mean (reference: utils.py:8-17)."""
    return float(np.mean(x))


def standard_error(x: np.ndarray) -> float:
    """Population standard deviation, ddof=0 (reference: utils.py:25-35).

    NOTE: despite the name this is sqrt(sum((x - xbar)^2) / n) — the
    reference divides by ``n`` (utils.py:34) and its own test oracle is
    ``np.sqrt(np.var(x))`` (tests/test_utils.py:31-39).  Spark-side
    equivalent is ``F.stddev_pop``, never ``stddev_samp``.
    """
    return float(np.sqrt(np.var(x)))


def mean_squared_error(y: np.ndarray, yhat: np.ndarray) -> float:
    """MSE between two equal-length vectors (reference: utils.py:43-68)."""
    d = np.asarray(y, dtype=np.float64) - np.asarray(yhat, dtype=np.float64)
    return float(np.mean(d * d))
