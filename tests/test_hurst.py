"""Hurst R/S analysis — local-recomputation parity, persistence
discrimination (walk vs noise vs mean-reverting), degenerate inputs,
partition invariance."""

import math

import numpy as np
import pytest

from eristropy_spark.operators.hurst import hurst_points, hurst_rs


def _r6(v):
    return math.floor(v * 1e6 + 0.5) / 1e6


def _hurst_local(x, min_size=4):
    """Independent literal recomputation of the documented algorithm."""
    n = len(x)
    pts = []
    s = min_size
    while 2 * s <= n:
        rss = []
        for b in range(n // s):
            xb = np.asarray(x[b * s:(b + 1) * s], dtype=np.float64)
            mu = float(xb.sum()) / s
            dev = xb - mu
            var = float(dev @ dev) / (s - 1)
            if var <= 0:
                continue
            y = np.cumsum(dev)
            rss.append((float(y.max()) - float(y.min())) / math.sqrt(var))
        if rss:
            acc = 0.0
            for v in rss:
                acc += v
            rs = _r6(acc / len(rss))
            if rs > 0:
                pts.append((math.log(s), math.log(rs)))
        s *= 2
    if len(pts) < 2:
        return len(pts), None
    k = float(len(pts))
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    return len(pts), (k * sxy - sx * sy) / (k * sxx - sx * sx)


def test_hurst_matches_local():
    rng = np.random.default_rng(3)
    x = np.round(rng.normal(size=500).cumsum() * 100)
    k, h = hurst_rs(x)
    kw, hw = _hurst_local(list(x))
    assert k == kw
    assert h == pytest.approx(hw, abs=1e-12)


def test_hurst_discriminates_processes():
    rng = np.random.default_rng(1)
    eps = rng.normal(size=4096)
    walk = np.round(eps.cumsum() * 100)          # persistent: H near 1
    noise = np.round(eps * 100)                  # iid increments: H ~ 0.5
    # strongly mean-reverting AR(1) with negative coefficient
    mr = np.zeros(4096)
    for t in range(1, 4096):
        mr[t] = -0.8 * mr[t - 1] + eps[t]
    mr = np.round(mr * 100)
    _, h_walk = hurst_rs(walk)
    _, h_noise = hurst_rs(noise)
    _, h_mr = hurst_rs(mr)
    assert h_walk > 0.85
    assert 0.4 < h_noise < 0.65
    assert h_mr < h_noise < h_walk


def test_hurst_degenerate():
    assert hurst_rs(np.arange(7.0)) == (0, None)          # too short
    k, h = hurst_rs(np.full(100, 5.0))                    # constant
    assert h is None


def test_hurst_points_partition_invariance(spark):
    rng = np.random.default_rng(9)
    seqs = {f"d{i}": [float(v) for v in
                      np.round(rng.normal(size=200).cumsum() * 100)]
            for i in range(8)}
    seqs["short"] = [1.0, 2.0, 3.0]
    df = spark.createDataFrame(
        [(k, v) for k, v in seqs.items()], "doc_id string, tokens array<double>"
    )
    a = {r["doc_id"]: tuple(r) for r in hurst_points(df.repartition(1)).collect()}
    b = {r["doc_id"]: tuple(r) for r in hurst_points(df.repartition(5)).collect()}
    assert a == b
    assert a["short"][2] == 0 and a["short"][3] is None
    for k, v in seqs.items():
        if k == "short":
            continue
        kw, hw = _hurst_local(v)
        assert a[k][2] == kw and a[k][3] == pytest.approx(hw, abs=1e-12)

    with pytest.raises(ValueError, match="min_size"):
        hurst_points(df, min_size=1)
