"""holt_winters — textbook-recursion parity, seasonal tracking on a
planted cycle, short-key dropping, parameter guards."""

import datetime
import math

import numpy as np
import pytest

from eristropy_spark.operators.smoothing import holt_winters


def _events_df(spark, series: dict[str, list[float]]):
    rows = []
    eid = 0
    for k, vals in series.items():
        for j, v in enumerate(vals):
            rows.append(
                (k, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=j),
                 eid, float(v))
            )
            eid += 1
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )


def _hw_local(vals, m, a, b, g):
    """Independent textbook recursion (float values, no quantization —
    parity asserted to ~1e-6, the grid resolution)."""
    x = list(vals)
    n = len(x)
    if n < 2 * m:
        return None
    l0 = sum(x[:m]) / m
    b0 = sum(x[m + i] - x[i] for i in range(m)) / (m * m)
    seas = [x[i] - l0 for i in range(m)]
    lvl, trd = l0, b0
    ring = list(seas)
    out = []
    for t in range(m, n):
        su = ring[0]
        f = lvl + trd + su
        nl = a * (x[t] - su) + (1 - a) * (lvl + trd)
        nb = b * (nl - lvl) + (1 - b) * trd
        ns = g * (x[t] - nl) + (1 - g) * su
        ring = ring[1:] + [ns]
        lvl, trd = nl, nb
        out.append((t + 1, nl, nb, ns, f))
    return seas, out


def test_holt_winters_matches_local(spark):
    rng = np.random.default_rng(31)
    m = 7
    series = {}
    for i in range(4):
        n = int(rng.integers(2 * m, 60))
        base = rng.normal(100, 5, size=n)
        seasonal = 10 * np.sin(2 * np.pi * np.arange(n) / m)
        series[f"u{i}"] = [float(v) for v in base + seasonal]
    out = holt_winters(
        _events_df(spark, series), "user_id", period=m,
        alpha=0.3, beta=0.1, gamma=0.2, tiebreak_col="event_id",
    ).collect()
    rows = {}
    for r in out:
        rows.setdefault(r["user_id"], {})[r["i"]] = r
    for k, vals in series.items():
        seas, rec = _hw_local(vals, m, 0.3, 0.1, 0.2)
        assert len(rows[k]) == len(vals)
        for i in range(1, m + 1):
            r = rows[k][i]
            assert r["level"] is None and r["fitted"] is None
            assert r["seasonal"] == pytest.approx(seas[i - 1], abs=1e-5)
        for t, lvl, trd, ns, f in rec:
            r = rows[k][t]
            assert r["level"] == pytest.approx(lvl, abs=1e-5)
            assert r["trend"] == pytest.approx(trd, abs=1e-5)
            assert r["seasonal"] == pytest.approx(ns, abs=1e-5)
            assert r["fitted"] == pytest.approx(f, abs=1e-5)


def test_holt_winters_tracks_pure_cycle(spark):
    # a noiseless trend+cycle: one-step forecasts converge onto truth
    m = 4
    n = 48
    vals = [10.0 + 0.5 * t + [0.0, 5.0, -2.0, -3.0][t % m] for t in range(n)]
    out = holt_winters(
        _events_df(spark, {"u": vals}), "user_id", period=m,
        alpha=0.5, beta=0.25, gamma=0.5, tiebreak_col="event_id",
    ).collect()
    tail = sorted(
        (r for r in out if r["i"] is not None and r["i"] > n - m),
        key=lambda r: r["i"],
    )
    for r in tail:
        truth = vals[r["i"] - 1]
        assert r["fitted"] == pytest.approx(truth, abs=0.25)


def test_holt_winters_drops_short_keys(spark):
    series = {"long": [float(v) for v in range(20)], "short": [1.0] * 10}
    out = holt_winters(
        _events_df(spark, series), "user_id", period=7,
        tiebreak_col="event_id",
    ).collect()
    assert {r["user_id"] for r in out} == {"long"}
    assert len(out) == 20


def test_holt_winters_guards(spark):
    df = _events_df(spark, {"u": [1.0] * 20})
    with pytest.raises(ValueError):
        holt_winters(df, "user_id", period=1)
    with pytest.raises(ValueError):
        holt_winters(df, "user_id", alpha=0.0)
    with pytest.raises(ValueError):
        holt_winters(df, "user_id", beta=1.5)
    with pytest.raises(ValueError):
        holt_winters(df, "user_id", exact_decimals=0)
