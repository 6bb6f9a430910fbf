"""granger_pairs — numpy-lstsq parity, planted-causality recovery,
degenerate designs, validation."""

import datetime as dt

import numpy as np
import pytest

from eristropy_spark.operators.granger import granger_pairs


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def _events_df(spark, series: dict[str, list[float]], bucket_sec=60):
    rows = []
    for src, vals in series.items():
        for i, v in enumerate(vals):
            rows.append((src, _ts(i * bucket_sec + 1.0), float(v)))
    return spark.createDataFrame(rows, "source string, ts timestamp, value double")


def _granger_local(x, y):
    """numpy OLS on the same quantized grid values."""
    q = lambda a: np.floor(np.asarray(a, dtype=np.float64) * 1e6 + 0.5) / 1e6
    x, y = q(x), q(y)
    z = y[1:]
    u = y[:-1]
    w = x[:-1]
    n = z.size
    a_r = np.column_stack([np.ones(n), u])
    ssr_r = float(((z - a_r @ np.linalg.lstsq(a_r, z, rcond=None)[0]) ** 2).sum())
    a_f = np.column_stack([np.ones(n), u, w])
    coef = np.linalg.lstsq(a_f, z, rcond=None)[0]
    ssr_f = float(((z - a_f @ coef) ** 2).sum())
    f = (ssr_r - ssr_f) / (ssr_f / (n - 3)) if ssr_f > 0 else None
    return n, float(coef[1]), float(coef[2]), ssr_r, ssr_f, f


def test_matches_numpy_ols(spark):
    rng = np.random.default_rng(51)
    series = {
        "a": rng.normal(10, 2, size=40).tolist(),
        "b": rng.normal(5, 1, size=40).tolist(),
        "c": rng.normal(0, 3, size=40).tolist(),
    }
    out = {
        (r["source_x"], r["source_y"]): r
        for r in granger_pairs(_events_df(spark, series), min_overlap=8).collect()
    }
    assert len(out) == 6  # ordered pairs
    for sx in series:
        for sy in series:
            if sx == sy:
                continue
            n, by, bx, ssr_r, ssr_f, f = _granger_local(series[sx], series[sy])
            r = out[(sx, sy)]
            assert r["n"] == n
            assert r["beta_y"] == pytest.approx(by, rel=1e-6, abs=1e-9)
            assert r["beta_x"] == pytest.approx(bx, rel=1e-6, abs=1e-9)
            assert r["ssr_r"] == pytest.approx(ssr_r, rel=1e-6)
            assert r["ssr_f"] == pytest.approx(ssr_f, rel=1e-6)
            assert r["f_stat"] == pytest.approx(f, rel=1e-5)


def test_planted_causality_is_directional(spark):
    rng = np.random.default_rng(52)
    x = rng.normal(0, 1, size=120)
    y = np.zeros(120)
    for t in range(1, 120):  # y driven by x's past, not vice versa
        y[t] = 0.3 * y[t - 1] + 0.9 * x[t - 1] + 0.05 * rng.normal()
    out = {
        (r["source_x"], r["source_y"]): r
        for r in granger_pairs(
            _events_df(spark, {"x": x.tolist(), "y": y.tolist()})
        ).collect()
    }
    assert out[("x", "y")]["f_stat"] > 50  # x -> y strongly causal
    assert out[("y", "x")]["f_stat"] < 10  # reverse direction weak


def test_degenerate_designs_null(spark):
    series = {
        "const": [5.0] * 20,  # zero-variance regressor
        "copy1": list(range(20)),
        "copy2": list(range(20)),  # collinear with copy1's lag
        "noise": np.random.default_rng(53).normal(0, 1, 20).tolist(),
    }
    out = {
        (r["source_x"], r["source_y"]): r
        for r in granger_pairs(_events_df(spark, series), min_overlap=8).collect()
    }
    # y = const: Suu = 0 -> everything NULL
    assert out[("noise", "const")]["ssr_r"] is None
    assert out[("noise", "const")]["f_stat"] is None
    # x's lag collinear with y's own lag (copy1 vs copy2): det = 0
    assert out[("copy1", "copy2")]["f_stat"] is None


def test_validates(spark):
    df = _events_df(spark, {"a": [1.0, 2.0]})
    with pytest.raises(ValueError, match="bucket_sec"):
        granger_pairs(df, bucket_sec=0)
    with pytest.raises(ValueError, match="min_overlap"):
        granger_pairs(df, min_overlap=3)


def test_partition_invariance(spark):
    rng = np.random.default_rng(54)
    series = {s: rng.normal(0, 1, 30).tolist() for s in ("a", "b", "c")}
    d1 = _events_df(spark, series).coalesce(1)
    d8 = _events_df(spark, series).repartition(8)
    a = sorted(map(tuple, granger_pairs(d1).collect()))
    b = sorted(map(tuple, granger_pairs(d8).collect()))
    assert a == b  # DECIMAL sums make this bit-identical
