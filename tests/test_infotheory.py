"""mutual_info_pairs / transfer_entropy_pairs — local-recomputation
parity, independence => 0, planted-coupling directionality, guards."""

import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from eristropy_spark.operators.infotheory import (
    mutual_info_pairs,
    transfer_entropy_pairs,
)


def _events_df(spark, series: dict[str, list[float]], step_sec=60):
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for src, vals in series.items():
        for j, v in enumerate(vals):
            rows.append((eid, t0 + timedelta(seconds=j * step_sec), src, float(v)))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, source string, value double"
    )


def _symbols(vals):
    # one bucket per sample (step == bucket), mean-symbolized exactly
    u = [math.floor(math.floor(v * 1e6 + 0.5) / 1e6 * 1e6 + 0.5) for v in vals]
    s, n = sum(u), len(u)
    return [1 if ui * n > s else 0 for ui in u]


def _mi_local(sx, sy):
    n = len(sx)
    c = [[0, 0], [0, 0]]
    for a, b in zip(sx, sy):
        c[a][b] += 1
    mi_q = 0
    for a in (0, 1):
        for b in (0, 1):
            cc = c[a][b]
            if cc == 0:
                continue
            ra = c[a][0] + c[a][1]
            kb = c[0][b] + c[1][b]
            mi_q += math.floor(cc / n * math.log(cc * n / (ra * kb)) * 1e12 + 0.5)
    return c, mi_q / 1e12


def _te_local(sx, sy):
    # triples (y_t, y_{t-1}, x_{t-1})
    trip = [(sy[t], sy[t - 1], sx[t - 1]) for t in range(1, len(sy))]
    n = len(trip)
    c = {}
    for j in (0, 1):
        for k in (0, 1):
            for el in (0, 1):
                c[(j, k, el)] = sum(1 for t in trip if t == (j, k, el))
    te_q = 0
    for j in (0, 1):
        for k in (0, 1):
            for el in (0, 1):
                cc = c[(j, k, el)]
                if cc == 0:
                    continue
                m_kl = c[(0, k, el)] + c[(1, k, el)]
                r_jk = c[(j, k, 0)] + c[(j, k, 1)]
                m_k = sum(c[(a, k, b)] for a in (0, 1) for b in (0, 1))
                te_q += math.floor(
                    cc / n * math.log(cc * m_k / (m_kl * r_jk)) * 1e12 + 0.5
                )
    return n, te_q / 1e12


@pytest.fixture(scope="module")
def coupled():
    rng = np.random.default_rng(17)
    n = 400
    x = rng.normal(50, 10, size=n)
    # y follows x with one-step lag plus noise: TE(x->y) >> TE(y->x)
    y = np.empty(n)
    y[0] = 50.0
    y[1:] = x[:-1] + rng.normal(0, 1, size=n - 1)
    z = rng.normal(50, 10, size=n)  # independent
    w = x + rng.normal(0, 1, size=n)  # contemporaneous copy (for MI)
    return {
        "x": [float(v) for v in x],
        "y": [float(v) for v in y],
        "z": [float(v) for v in z],
        "w": [float(v) for v in w],
    }


def test_mutual_info_matches_local(spark, coupled):
    out = {
        (r["source_x"], r["source_y"]): r
        for r in mutual_info_pairs(
            _events_df(spark, coupled), bucket_sec=60
        ).collect()
    }
    syms = {k: _symbols(v) for k, v in coupled.items()}
    for a, b in (("x", "y"), ("x", "z"), ("y", "z"), ("w", "x"), ("w", "z")):
        c, mi = _mi_local(syms[a], syms[b])
        r = out[(a, b)]
        assert (r["c00"], r["c01"], r["c10"], r["c11"]) == (
            c[0][0], c[0][1], c[1][0], c[1][1]
        )
        assert r["mi"] == pytest.approx(mi, abs=2e-6)
    # the contemporaneous copy carries far more information than an
    # independent pair (x drives y at lag 1, so SAME-bucket x,y is weak)
    assert out[("w", "x")]["mi"] > 5 * out[("w", "z")]["mi"]
    assert out[("w", "x")]["mi"] > 0.1


def test_transfer_entropy_matches_local_and_directional(spark, coupled):
    out = {
        (r["source_x"], r["source_y"]): r
        for r in transfer_entropy_pairs(
            _events_df(spark, coupled), bucket_sec=60
        ).collect()
    }
    syms = {k: _symbols(v) for k, v in coupled.items()}
    for a, b in (("x", "y"), ("y", "x"), ("x", "z"), ("z", "x")):
        n, te = _te_local(syms[a], syms[b])
        r = out[(a, b)]
        assert r["n"] == n
        assert r["te"] == pytest.approx(te, abs=2e-6), (a, b)
    # planted causality: x drives y, not the reverse
    assert out[("x", "y")]["te"] > 3 * out[("y", "x")]["te"]
    assert out[("x", "y")]["te"] > 5 * out[("x", "z")]["te"]


def test_constant_source_zero_information(spark):
    rng = np.random.default_rng(3)
    series = {
        "const": [42.0] * 60,
        "noise": [float(v) for v in rng.normal(0, 1, size=60)],
    }
    mi = mutual_info_pairs(_events_df(spark, series), bucket_sec=60).collect()
    assert len(mi) == 1 and mi[0]["mi"] == 0.0
    te = {
        (r["source_x"], r["source_y"]): r["te"]
        for r in transfer_entropy_pairs(
            _events_df(spark, series), bucket_sec=60
        ).collect()
    }
    assert te[("const", "noise")] == 0.0


def test_min_overlap_and_guards(spark):
    series = {"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]}
    df = _events_df(spark, series)
    assert mutual_info_pairs(df, min_overlap=8).count() == 0
    assert transfer_entropy_pairs(df, min_overlap=8).count() == 0
    with pytest.raises(ValueError):
        mutual_info_pairs(df, bucket_sec=0)
    with pytest.raises(ValueError):
        transfer_entropy_pairs(df, min_overlap=0)
