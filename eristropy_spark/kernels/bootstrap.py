"""Politis–Romano stationary bootstrap (reference: eristropy/bootstrap.py).

Structure matches the reference exactly — random block start, geometric
block length via inverse-CDF of a uniform draw (utils.py:20-22), wrap-
around at n, truncate the final block — but the RNG topology differs by
design: the reference seeds one *global* Numba RNG (utils.py:38-40), so
its draws depend on group iteration order, which no distributed engine
can reproduce.  We thread an explicit ``np.random.Generator`` that
callers derive deterministically per sequence (see
``eristropy_spark.kernels.rng.sequence_rng``), making every bootstrap
reproducible regardless of partitioning, task order, or parallelism
level (SURVEY.md §7.3 hazard 6).  The reference's own bootstrap tests
assert structural/distributional properties, not exact draws
(tests/test_bootstrap.py:12-76) — ours pass the same properties.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["unif_to_geom", "block_indices", "single_stationary_boot", "stationary_bootstrap"]


def unif_to_geom(u: float, p: float) -> int:
    """Inverse-CDF map of u ~ U(0,1) to a Geometric(p) draw (utils.py:20-22)."""
    return int(math.ceil(math.log(1.0 - u) / math.log(1.0 - p)))


def block_indices(n: int, p: float, rng: np.random.Generator) -> np.ndarray:
    """One bootstrap block: uniform start, geometric length, wraparound.

    Reference: bootstrap.py:9-23 (``_get_idx``).
    """
    t_start = int(rng.integers(0, n))  # inclusive 0..n-1, like randint(0, n-1)
    u = float(rng.random())
    b = unif_to_geom(u, p)

    if t_start + b >= n:
        return np.concatenate(
            (
                np.arange(t_start, n, dtype=np.int64),
                np.arange(0, b - (n - t_start), dtype=np.int64),
            )
        )
    return np.arange(t_start, t_start + b, dtype=np.int64)


def single_stationary_boot(n: int, p: float, rng: np.random.Generator) -> np.ndarray:
    """Index vector of one stationary-bootstrap resample (bootstrap.py:26-41)."""
    out = np.empty(n, dtype=np.int64)
    s = 0
    while s < n:
        idx = block_indices(n, p, rng)
        if idx.size > n - s:
            idx = idx[: n - s]
        out[s : s + idx.size] = idx
        s += idx.size
    return out


def stationary_bootstrap(
    x: np.ndarray, p: float, n_boot: int, rng: np.random.Generator
) -> np.ndarray:
    """(n_boot, n) matrix of stationary-bootstrap resamples (bootstrap.py:44-64)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    X = np.empty((n_boot, n), dtype=np.float64)
    for i in range(n_boot):
        X[i, :] = x[single_stationary_boot(n, p, rng)]
    return X
