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

__all__ = ["permen", "permen_many", "ordinal_pattern_codes"]


def ordinal_pattern_codes(x: np.ndarray, m: int, delay: int = 1) -> np.ndarray:
    """Lehmer-coded ordinal pattern of every embedded window.

    Returns an int64 vector of length ``n - (m-1)*delay`` where equal
    codes <=> equal ordinal patterns.
    """
    _check_order(m)
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.size
    n_win = n - (m - 1) * delay
    if n_win <= 0:
        return np.empty(0, dtype=np.int64)

    # (n_win, m) embedding without copying the data m times
    idx = np.arange(n_win)[:, None] + delay * np.arange(m)[None, :]
    windows = x[idx]
    ranks = np.argsort(np.argsort(windows, axis=1, kind="stable"), axis=1, kind="stable")
    # mixed-radix encode: rank vector -> unique integer (codes < m^m,
    # so int64 holds them iff m <= 15 — enforced by _check_order; numpy
    # integer overflow is SILENT, so this must fail loud instead)
    radix = (m ** np.arange(m)).astype(np.int64)
    return ranks.astype(np.int64) @ radix


_INT64_MAX = 2**63 - 1


def _check_order(m: int) -> int:
    """Fail loud on embedding orders whose mixed-radix codes overflow
    int64 (m^m >= 2^63 at m >= 16).  Silent numpy wraparound would merge
    unrelated ordinal patterns and return wrong entropies with no error.
    Returns ``m**m`` (as a Python int) for reuse by the batch packer."""
    base = m**m
    if m < 2 or base > _INT64_MAX:
        raise ValueError(
            f"embedding order m={m} is outside the supported range "
            "2 <= m <= 15: ordinal-pattern codes are packed into int64 "
            "(m^m must stay below 2^63), and numpy would wrap silently"
        )
    return base


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


def permen_many(
    seqs: list,
    m: int = 3,
    delay: int = 1,
    normalize: bool = False,
    max_batch_windows: int = 4_000_000,
) -> np.ndarray:
    """PermEn for a list of 1-D arrays (None / too-short → NaN).

    Bit-identical to calling :func:`permen` per sequence (equivalence-
    tested); the mechanics are batched like ``sampen_many``: every
    embedded window of EVERY sequence in the batch rides one global
    (W, m) matrix through a single double-argsort + radix encode, and
    the per-(sequence, pattern) histogram falls out of one ``np.unique``
    over combined ``seq·m^m + code`` keys.  This removes the per-row
    Python loop that was the last interpreter-bound cost on the
    entropy projection's hot path — only the final per-sequence
    entropy fold touches Python, as one tiny contiguous-slice ``.sum()``
    per sequence (kept scalar-shaped so the pairwise-summation order,
    and therefore the bits, match the scalar kernel exactly).

    ``max_batch_windows`` chunks gigantic batches so the transient
    (W, m) embedding stays comfortably in memory.
    """
    n_seq = len(seqs)
    base_py = _check_order(m)  # m^m as a Python int (overflow-safe)
    # the (sequence, pattern) key packs seq_of_win * m^m + code into
    # int64; bound how many sequences share one chunk so the largest
    # key (n_chunk * m^m - 1) cannot wrap (ADVICE r4: at m=15 a chunk
    # of >20 sequences would overflow SILENTLY and merge histograms)
    max_chunk_seqs = max(1, _INT64_MAX // base_py)
    out = np.full(n_seq, np.nan, dtype=np.float64)
    span = (m - 1) * delay
    log_fact = math.log(math.factorial(m))

    items = []  # (index, float64 array)
    for idx, s in enumerate(seqs):
        if s is None:
            continue
        x = np.ascontiguousarray(s, dtype=np.float64)
        if x.size - span <= 0:
            continue
        items.append((idx, x))
    if not items:
        return out

    radix = (m ** np.arange(m)).astype(np.int64)
    base = np.int64(m) ** np.int64(m)  # codes < m^m

    start = 0
    while start < len(items):
        end, win_total = start, 0
        while end < len(items):
            nw = items[end][1].size - span
            if end > start and (
                win_total + nw > max_batch_windows
                or end - start >= max_chunk_seqs
            ):
                break
            win_total += nw
            end += 1
        chunk = items[start:end]
        lens = np.array([x.size for _, x in chunk], dtype=np.int64)
        idxs = np.array([i for i, _ in chunk], dtype=np.int64)
        n_wins = lens - span
        flat = np.concatenate([x for _, x in chunk])
        seq_off = np.zeros(len(chunk), dtype=np.int64)
        np.cumsum(lens[:-1], out=seq_off[1:])
        win_off = np.zeros(len(chunk) + 1, dtype=np.int64)
        np.cumsum(n_wins, out=win_off[1:])
        W = int(win_off[-1])

        seq_of_win = np.repeat(np.arange(len(chunk), dtype=np.int64), n_wins)
        within = np.arange(W, dtype=np.int64) - win_off[seq_of_win]
        starts = seq_off[seq_of_win] + within
        windows = flat[starts[:, None] + delay * np.arange(m)[None, :]]
        ranks = np.argsort(
            np.argsort(windows, axis=1, kind="stable"), axis=1, kind="stable"
        )
        codes = ranks.astype(np.int64) @ radix

        key = seq_of_win * base + codes
        ukey, counts = np.unique(key, return_counts=True)
        useq = ukey // base
        p = counts / n_wins[useq].astype(np.float64)
        contrib = p * np.log(p)
        seg = np.searchsorted(useq, np.arange(len(chunk) + 1))
        for s in range(len(chunk)):
            h = -float(contrib[seg[s] : seg[s + 1]].sum())
            out[idxs[s]] = h / log_fact if normalize else h
        start = end
    return out
