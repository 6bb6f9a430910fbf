"""Higuchi fractal dimension: golden vs an independent float
implementation, signal-class anchors, edge cases, partition
invariance."""

import math

import numpy as np
import pytest

from eristropy_spark.operators.fractal import higuchi_fd


def _higuchi_float(x, kmax):
    """Independent straight-from-the-paper float implementation — no
    integer algebra, no quantization grids."""
    x = np.asarray(x, float)
    n = len(x)
    lks, lnk = [], []
    for k in range(1, kmax + 1):
        lm = []
        for m in range(1, k + 1):
            idx = np.arange(m - 1, n, k)
            if idx.size < 2:
                return None
            nm = idx.size - 1
            a = np.abs(np.diff(x[idx])).sum()
            lm.append(a * (n - 1) / (nm * k * k))
        lk = float(np.mean(lm))
        if lk <= 0:
            return None
        lks.append(math.log(lk))
        lnk.append(math.log(k))
    sx, sy = sum(lnk), sum(lks)
    sxy = sum(a * b for a, b in zip(lnk, lks))
    sxx = sum(a * a for a in lnk)
    K = kmax
    return -(K * sxy - sx * sy) / (K * sxx - sx * sx)


def _df(spark, seqs):
    return spark.createDataFrame(
        [(f"d{i}", [int(t) for t in s]) for i, s in enumerate(seqs)],
        "doc_id string, tokens array<int>",
    )


def test_matches_float_reference(spark):
    rng = np.random.default_rng(3)
    seqs = [rng.integers(-800, 800, size=int(n)) for n in rng.integers(16, 200, 8)]
    rows = {
        r.doc_id: r
        for r in higuchi_fd(_df(spark, seqs), kmax=6).collect()
    }
    for i, s in enumerate(seqs):
        ref = _higuchi_float(s, 6)
        got = rows[f"d{i}"]
        assert got.n == len(s) and got.kmax == 6
        assert got.fd == pytest.approx(ref, abs=1e-5)


def test_signal_class_anchors(spark):
    rng = np.random.default_rng(9)
    ramp = np.arange(2000) * 3  # smooth curve -> FD ~ 1
    noise = rng.integers(-10000, 10000, size=2000)  # white noise -> FD ~ 2
    rows = {
        r.doc_id: r.fd
        for r in higuchi_fd(_df(spark, [ramp, noise]), kmax=8).collect()
    }
    assert rows["d0"] == pytest.approx(1.0, abs=0.01)
    assert rows["d1"] == pytest.approx(2.0, abs=0.05)


def test_edges(spark):
    # too short (< 2*kmax) and flat -> NULL fd, row kept
    rows = {
        r.doc_id: r
        for r in higuchi_fd(_df(spark, [[1, 2, 3], [5] * 40]), kmax=6).collect()
    }
    assert rows["d0"].fd is None and rows["d0"].n == 3
    assert rows["d1"].fd is None and rows["d1"].n == 40


def test_partition_invariance(spark):
    rng = np.random.default_rng(31)
    seqs = [rng.integers(0, 1000, size=50) for _ in range(6)]
    df = _df(spark, seqs)
    a = higuchi_fd(df.repartition(1), kmax=6).orderBy("doc_id").collect()
    b = higuchi_fd(df.repartition(5), kmax=6).orderBy("doc_id").collect()
    assert a == b


# ---------------------------------------------------------------- DFA


def _dfa_float(x, sizes):
    """Independent float DFA (Peng et al. 1994), no integer algebra."""
    x = np.asarray(x, float)
    n = len(x)
    y = np.cumsum(x - x.mean())
    pts = []
    for s in sizes:
        B = n // s
        if B < 1:
            continue
        ssr_tot = 0.0
        t = np.arange(1, n + 1, dtype=float)
        for b in range(B):
            sl = slice(b * s, (b + 1) * s)
            coef = np.polyfit(t[sl], y[sl], 1)
            resid = y[sl] - np.polyval(coef, t[sl])
            ssr_tot += float((resid**2).sum())
        f = math.sqrt(ssr_tot / (B * s))
        if f <= 0:
            continue
        pts.append((math.log(s), math.log(f)))
    if len(pts) < 2:
        return None
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    return float(np.polyfit(xs, ys, 1)[0])


def test_dfa_matches_float_reference(spark):
    from eristropy_spark.operators.fractal import dfa

    rng = np.random.default_rng(17)
    seqs = [rng.integers(-900, 900, size=int(m)) for m in rng.integers(20, 300, 8)]
    rows = {r.doc_id: r for r in dfa(_df(spark, seqs)).collect()}
    for i, s in enumerate(seqs):
        ref = _dfa_float(s, (4, 8, 16, 32))
        got = rows[f"d{i}"]
        assert got.n == len(s)
        if ref is None:
            assert got.alpha is None
        else:
            # unit-grid SSR quantization costs ~1e-4 relative on the
            # smallest boxes; the estimator itself is what's pinned
            assert got.alpha == pytest.approx(ref, abs=5e-3)


def test_dfa_signal_class_anchors(spark):
    from eristropy_spark.operators.fractal import dfa

    rng = np.random.default_rng(41)
    noise = rng.integers(-10000, 10000, size=4096)  # white -> ~0.5
    walk = np.cumsum(rng.integers(-500, 500, size=4096))  # brownian -> ~1.5
    rows = {
        r.doc_id: r.alpha
        for r in dfa(
            _df(spark, [noise, walk]), sizes=(8, 16, 32, 64, 128)
        ).collect()
    }
    assert rows["d0"] == pytest.approx(0.5, abs=0.08)
    assert rows["d1"] == pytest.approx(1.5, abs=0.12)


def test_dfa_edges_and_partition_invariance(spark):
    from eristropy_spark.operators.fractal import dfa

    rng = np.random.default_rng(53)
    seqs = [rng.integers(0, 1000, size=40) for _ in range(4)]
    seqs.append(np.array([1, 2, 3]))  # too short -> 0 scales, NULL
    seqs.append(np.arange(64) * 5)  # perfectly linear profile boxes
    df = _df(spark, seqs)
    a = dfa(df.repartition(1)).orderBy("doc_id").collect()
    b = dfa(df.repartition(5)).orderBy("doc_id").collect()
    assert a == b
    short = [r for r in a if r.doc_id == "d4"][0]
    assert short.n_scales == 0 and short.alpha is None
