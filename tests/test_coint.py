"""coint_eg_pairs — value parity against a local fixed-order replay,
planted-cointegration discrimination, degenerate guards."""

import datetime

import numpy as np
import pytest

from eristropy_spark.operators.coint import coint_eg_pairs


def _df(spark, series: dict[str, np.ndarray], step_sec: int = 60):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (name, base + datetime.timedelta(seconds=step_sec * t), float(v))
        for name, vals in series.items()
        for t, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "source string, ts timestamp, value double")


def _fq(v, d=6):
    return np.floor(np.asarray(v, dtype=float) * 10**d + 0.5) / 10**d


def _local_eg(x, y):
    x, y = _fq(x), _fq(y)
    n = len(x)
    sx, sy, sxx, sxy = x.sum(), y.sum(), (x * x).sum(), (x * y).sum()
    det = sxx - sx * sx / n
    if det <= 0:
        return None
    b = (sxy - sx * sy / n) / det
    a = sy / n - b * sx / n
    u = _fq(y - a - b * x)
    up, uc = u[:-1], u[1:]
    s11, s22, s12 = (up * up).sum(), (uc * uc).sum(), (up * uc).sum()
    if s11 <= 0:
        return a, b, None, None
    rho = (s12 - s11) / s11
    ssr = (s22 - 2 * s12 + s11) - 2 * rho * (s12 - s11) + rho * rho * s11
    s2 = ssr / (len(up) - 1)
    tau = rho / np.sqrt(s2 / s11) if s2 > 0 else None
    return a, b, rho, tau


def test_coint_matches_local_replay(spark):
    rng = np.random.default_rng(23)
    t = 250
    w = rng.normal(0, 1, t).cumsum()
    series = {
        "a": w + rng.normal(0, 0.3, t),
        "b": 2.0 * w + 5 + rng.normal(0, 0.3, t),
        "c": rng.normal(0, 1, t).cumsum() + 100,
    }
    out = {
        (r["source_x"], r["source_y"]): r
        for r in coint_eg_pairs(_df(spark, series), bucket_sec=60).collect()
    }
    assert len(out) == 3
    for sx, sy in [("a", "b"), ("a", "c"), ("b", "c")]:
        a, b, rho, tau = _local_eg(series[sx], series[sy])
        row = out[(sx, sy)]
        assert row["n"] == t and row["n_pairs"] == t - 1
        assert row["alpha"] == pytest.approx(a, rel=1e-9)
        assert row["beta"] == pytest.approx(b, rel=1e-9)
        assert row["rho"] == pytest.approx(rho, rel=1e-9)
        assert row["tau"] == pytest.approx(tau, rel=1e-9)


def test_coint_discriminates(spark):
    rng = np.random.default_rng(29)
    t = 400
    w = rng.normal(0, 1, t).cumsum()
    series = {
        "tied1": w + rng.normal(0, 0.2, t),
        "tied2": -1.5 * w + 3 + rng.normal(0, 0.2, t),
        "loner": rng.normal(0, 1, t).cumsum(),
    }
    out = {
        (r["source_x"], r["source_y"]): r
        for r in coint_eg_pairs(_df(spark, series), bucket_sec=60).collect()
    }
    assert out[("tied1", "tied2")]["coint_5pct"]
    assert not out[("loner", "tied1")]["coint_5pct"]
    assert not out[("loner", "tied2")]["coint_5pct"]
    # negative hedge ratio recovered
    assert out[("tied1", "tied2")]["beta"] == pytest.approx(-1.5, abs=0.1)


def test_coint_gap_guard_and_degenerate(spark):
    rng = np.random.default_rng(31)
    t = 60
    # series 'g' has every 3rd bucket missing -> fewer consecutive pairs
    base = datetime.datetime(2024, 1, 1)
    rows = []
    kept = 0
    for i in range(t):
        if i % 3 != 2:
            rows.append(("g", base + datetime.timedelta(minutes=i), float(i + rng.normal())))
            kept += 1
    for i in range(t):
        rows.append(("h", base + datetime.timedelta(minutes=i), float(2 * i)))
        rows.append(("k", base + datetime.timedelta(minutes=i), 7.0))  # constant
        rows.append(("aa", base + datetime.timedelta(minutes=i), 3.0))  # constant, sorts first
    df = spark.createDataFrame(rows, "source string, ts timestamp, value double")
    out = {
        (r["source_x"], r["source_y"]): r
        for r in coint_eg_pairs(df, bucket_sec=60, min_overlap=4).collect()
    }
    gh = out[("g", "h")]
    assert gh["n"] == kept
    # consecutive-bucket guard: only i%3 in {0,1} adjacency pairs survive
    assert gh["n_pairs"] == sum(1 for i in range(1, t) if i % 3 != 2 and (i - 1) % 3 != 2)
    # constant x side -> det <= 0 -> pair absent entirely
    assert ("aa", "h") not in out and ("aa", "g") not in out
    # constant y side -> zero residual energy -> row kept, tau NULL
    hk = out[("h", "k")]
    assert hk["tau"] is None and hk["rho"] is None and hk["beta"] == 0.0
