"""RBF Gaussian-process detrending (reference: eristropy/gp.py, numba path).

Pure NumPy: Cholesky factorization replaces scipy's cho_factor/cho_solve
(gp.py:186-209; scipy is not installed here), expanding-window CV
length-scale selection matches ``_time_series_split`` /
``_find_best_ls`` (gp.py:146-183, 387-428), and detrending subtracts
the GP posterior mean at the training points (gp.py:431-470).  Note the
reference uses positions ``arange(n)`` as X, not real timestamps
(gp.py:531) — we keep that.

Golden anchors from the reference's tests (tests/test_gp.py:92-141):
CV error 0.7484052691169865 and best ls 0.5 on the 10-point rng(17)
fixture; detrended residuals at atol=1e-6.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "rbf_kernel",
    "time_series_split",
    "solve_cholesky",
    "gp_fit",
    "gp_predict",
    "cv_error",
    "find_best_ls",
    "detrend_gp",
]


def _sq_dists(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Pairwise squared Euclidean distances, (n, m), by broadcasting."""
    d = X[:, None, :] - Y[None, :, :]
    return np.einsum("ijk,ijk->ij", d, d)


def rbf_kernel(D: np.ndarray, ls: float) -> np.ndarray:
    """exp(-D / (2 ls^2)) on a squared-distance matrix (gp.py:116-143)."""
    return np.exp(-0.5 * D / (ls * ls))


def time_series_split(n: int, n_splits: int = 5) -> list[tuple[np.ndarray, np.ndarray]]:
    """Expanding-prefix CV splits, test size n // (n_splits+1) (gp.py:146-183)."""
    idx = np.arange(n)
    test_size = n // (n_splits + 1)
    splits = []
    for test_start in range(n - n_splits * test_size, n, test_size):
        splits.append((idx[:test_start], idx[test_start : test_start + test_size]))
    return splits


def solve_cholesky(K: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Solve K a = y for PD K via Cholesky (gp.py:186-209, scipy-free)."""
    L = np.linalg.cholesky(K)
    w = np.linalg.solve(L, y)
    return np.linalg.solve(L.T, w)


def gp_fit(X: np.ndarray, y: np.ndarray, ls: float, eps: float = 1e-6) -> np.ndarray:
    """alpha = (K + eps I)^-1 y (gp.py:242-280 with jitter gp.py:212-239)."""
    K = rbf_kernel(_sq_dists(X, X), ls)
    K[np.diag_indices_from(K)] += eps
    return solve_cholesky(K, y)


def gp_predict(X: np.ndarray, Xstar: np.ndarray, ls: float, a: np.ndarray) -> np.ndarray:
    """Posterior mean K(X, X*)^T a (gp.py:283-313)."""
    K = rbf_kernel(_sq_dists(X, Xstar), ls)
    return K.T @ a


def cv_error(
    X: np.ndarray, y: np.ndarray, ls: float, n_splits: int = 5, eps: float = 1e-6
) -> float:
    """Mean MSE across expanding-window splits (gp.py:342-384)."""
    splits = time_series_split(X.shape[0], n_splits)
    errs = np.empty(len(splits), dtype=np.float64)
    for i, (tr, te) in enumerate(splits):
        a = gp_fit(X[tr], y[tr], ls, eps)
        yhat = gp_predict(X[tr], X[te], ls, a)
        d = y[te] - yhat
        errs[i] = np.mean(d * d)
    return float(np.mean(errs))


def find_best_ls(
    X: np.ndarray,
    y: np.ndarray,
    ls_vals: np.ndarray,
    n_splits: int = 5,
    eps: float = 1e-6,
) -> float:
    """ls with minimal CV error; ties -> first, like argmin (gp.py:387-428)."""
    errs = np.array([cv_error(X, y, ls, n_splits, eps) for ls in ls_vals])
    return float(ls_vals[int(np.argmin(errs))])


def detrend_gp(
    y: np.ndarray,
    ls_vals: np.ndarray,
    n_splits: int = 5,
    eps: float = 1e-6,
) -> np.ndarray:
    """Residuals after subtracting the CV-selected GP trend (gp.py:431-470).

    X is positions 0..n-1, matching the reference's
    ``np.arange(group.shape[0])`` (gp.py:531).
    """
    y = np.asarray(y, dtype=np.float64)
    X = np.arange(y.shape[0], dtype=np.float64).reshape(-1, 1)
    ls_star = find_best_ls(X, y, ls_vals, n_splits, eps)
    a = gp_fit(X, y, ls_star, eps)
    return y - gp_predict(X, X, ls_star, a)
