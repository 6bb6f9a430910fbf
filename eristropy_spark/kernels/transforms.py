"""Per-signal stationarity transforms (difference / linreg-detrend / z-norm).

Reference parity notes:
* ``difference`` — eristropy/difference.py:5-26: np.diff, raises on
  n < 2 and on NaN/inf.
* ``detrend_linreg`` — eristropy/linreg.py:6-35: OLS with intercept on
  the *actual timestamps*; the reference's own test oracle is
  ``np.linalg.lstsq`` (tests/test_linreg.py:13-16), which is what we use
  (sklearn is not installed here).
* ``znorm`` — eristropy/stationarity.py:167-170 applied through
  ``groupby().transform`` (stationarity.py:279-281): pandas passes a
  Series, so ``.std()`` is **ddof=1** (sample std — SURVEY.md §7.3
  hazard 4).  Spark-side equivalent: ``stddev_samp``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["difference", "detrend_linreg", "znorm"]


def difference(x: np.ndarray) -> np.ndarray:
    """First difference; output has length n-1 (difference.py:5-26)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2:
        raise ValueError("Input must have at least two elements.")
    if not np.isfinite(x).all():
        raise ValueError("Input contains NaN or np.inf values.")
    return np.diff(x)


def detrend_linreg(t: np.ndarray, y: np.ndarray) -> np.ndarray:
    """OLS-detrend y on t (with intercept); returns residuals (linreg.py:6-35)."""
    t = np.asarray(t, dtype=np.float64).reshape(-1)
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    A = np.column_stack([np.ones_like(t), t])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    return y - A @ beta


def znorm(x: np.ndarray, ddof: int = 1) -> np.ndarray:
    """Zero-mean / unit-variance normalization, sample std by default."""
    x = np.asarray(x, dtype=np.float64)
    return (x - x.mean()) / x.std(ddof=ddof)
