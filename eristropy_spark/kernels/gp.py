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
    "detrend_gp_sklearn",
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


def detrend_gp_sklearn(
    y: np.ndarray,
    ls_range: tuple[float, float] = (10.0, 100.0),
    n_iter: int = 10,
    n_splits: int = 5,
    alpha: float = 1e-10,
    rng: np.random.RandomState | None = None,
) -> np.ndarray:
    """Residuals under the reference's SKLEARN-path semantics
    (gp.py:18-113), reimplemented scikit-free (sklearn/scipy are not
    installed here; this replicates their documented behavior, it does
    not wrap them):

    * candidate length scales — ``n_iter`` sequential draws
      ``lo + (hi-lo)·rng.random_sample()`` (ParameterSampler over
      ``scipy.stats.uniform(loc, scale)`` with a shared RandomState);
    * estimator — GaussianProcessRegressor with a FIXED RBF kernel,
      ``alpha=1e-10`` (sklearn default) and ``normalize_y=True``: the
      GP fits the train-standardized response (ddof-0 std, guarded to 1
      for constant folds) and predictions are de-standardized;
    * selection — mean ``neg_mean_squared_error`` across
      ``TimeSeriesSplit()`` folds, maximized, first-occurrence ties
      (RandomizedSearchCV's argmax), then a refit on the full series.

    Differences vs :func:`detrend_gp` (the numba path): per-call random
    candidates instead of one shared driver grid, y-standardization
    inside the fit, and the 1e-10 jitter instead of 1e-6 — so the two
    paths genuinely select different trends on CV-sensitive series
    (distinct-path test pins that).  The reference's sklearn branch
    also mislabels residuals via ``np.repeat(signal_id, n)``
    (gp.py:104, the column NAME instead of the id — corrupting output
    whenever signals have unequal lengths); here labeling is the Spark
    group key, so the bug is structurally fixed rather than copied.

    An ill-conditioned fold (large ls on a long integer grid) escalates
    the jitter ×10 up to 1e-4 before failing — sklearn raises its
    "increase alpha" error there; a 10^12-sequence job must not.
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.shape[0]
    if n // (n_splits + 1) < 1:
        raise ValueError(
            f"series of length {n} cannot form {n_splits} time-series CV "
            "splits (sklearn's TimeSeriesSplit would raise here too)"
        )
    if rng is None:
        rng = np.random.RandomState(0)
    lo, hi = float(ls_range[0]), float(ls_range[1])
    cands = lo + (hi - lo) * np.array(
        [rng.random_sample() for _ in range(n_iter)], dtype=np.float64
    )
    X = np.arange(n, dtype=np.float64).reshape(-1, 1)
    splits = time_series_split(n, n_splits)

    def _fit_predict(tr: np.ndarray, te: np.ndarray, ls: float) -> np.ndarray:
        ym = float(y[tr].mean())
        ys = float(y[tr].std())
        ys = ys if ys > 0.0 else 1.0
        yn = (y[tr] - ym) / ys
        jitter = alpha
        while True:
            try:
                K = rbf_kernel(_sq_dists(X[tr], X[tr]), ls)
                K[np.diag_indices_from(K)] += jitter
                a = solve_cholesky(K, yn)
                break
            except np.linalg.LinAlgError:
                jitter *= 10.0
                if jitter > 1e-4:
                    raise
        return ys * gp_predict(X[tr], X[te], ls, a) + ym

    scores = np.empty(n_iter, dtype=np.float64)
    for i, ls in enumerate(cands):
        fold = np.empty(len(splits), dtype=np.float64)
        for j, (tr, te) in enumerate(splits):
            d = y[te] - _fit_predict(tr, te, float(ls))
            fold[j] = -np.mean(d * d)
        scores[i] = fold.mean()
    best = float(cands[int(np.argmax(scores))])
    full = np.arange(n)
    return y - _fit_predict(full, full, best)


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
