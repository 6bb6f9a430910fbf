"""dcca_pairs — local-recomputation parity (independent textbook
DCCA over the same quantization protocol), planted shared-component
coupling, anti-correlation, trend immunity, guards."""

import datetime
import math

import numpy as np
import pytest

from eristropy_spark.operators.dcca import dcca_pairs


def _events_df(spark, series: dict[str, list[float]], step_sec=600):
    rows = []
    eid = 0
    for src, vals in series.items():
        for j, v in enumerate(vals):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(seconds=j * step_sec), src, float(v))
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, source string, value double"
    )


def _dcca_local(xs, ys, s):
    """Textbook rho_DCCA with the operator's quantization protocol."""
    ux = [math.floor(v * 100.0 + 0.5) for v in xs]
    uy = [math.floor(v * 100.0 + 0.5) for v in ys]
    n = len(ux)
    cx = np.cumsum(ux)
    cy = np.cumsum(uy)
    t = np.arange(1, n + 1)
    yvx = (n * cx - t * int(sum(ux))) / n
    yvy = (n * cy - t * int(sum(uy))) / n
    q = 1e6
    ssrxy = ssrxx = ssryy = 0
    nb = 0
    for b in range(n // s):
        zx = yvx[b * s:(b + 1) * s] - yvx[b * s]
        zy = yvy[b * s:(b + 1) * s] - yvy[b * s]
        tp = np.arange(1, s + 1, dtype=float)
        szx = math.floor(0.5 + q * 0) + sum(
            math.floor(v * q + 0.5) for v in zx
        )
        szy = sum(math.floor(v * q + 0.5) for v in zy)
        sxx = sum(math.floor(v * v * q + 0.5) for v in zx)
        syy = sum(math.floor(v * v * q + 0.5) for v in zy)
        sxy = sum(math.floor(a * b2 * q + 0.5) for a, b2 in zip(zx, zy))
        stx = sum(math.floor(tt * v * q + 0.5) for tt, v in zip(tp, zx))
        sty = sum(math.floor(tt * v * q + 0.5) for tt, v in zip(tp, zy))
        m = float(s)
        st = s * (s + 1) / 2
        stt = s * (s + 1) * (2 * s + 1) / 6
        d = {k: v / q for k, v in dict(
            szx=szx, szy=szy, sxx=sxx, syy=syy, sxy=sxy, stx=stx, sty=sty
        ).items()}
        ctt = stt - st * st / m
        ctx = d["stx"] - st * d["szx"] / m
        cty = d["sty"] - st * d["szy"] / m
        rxy = (d["sxy"] - d["szx"] * d["szy"] / m) - ctx * cty / ctt
        rxx = (d["sxx"] - d["szx"] * d["szx"] / m) - ctx * ctx / ctt
        ryy = (d["syy"] - d["szy"] * d["szy"] / m) - cty * cty / ctt
        ssrxy += math.floor(rxy * q + 0.5)
        ssrxx += math.floor(rxx * q + 0.5)
        ssryy += math.floor(ryy * q + 0.5)
        nb += 1
    if ssrxx <= 0 or ssryy <= 0:
        return nb, None
    return nb, ssrxy / math.sqrt(ssrxx * ssryy)


@pytest.fixture(scope="module")
def coupled_series():
    rng = np.random.default_rng(23)
    n = 128
    common = rng.normal(0, 10, size=n)
    a = 100 + common + rng.normal(0, 1, size=n)
    b = 200 + common + rng.normal(0, 1, size=n)
    c = 100 - common + rng.normal(0, 1, size=n)
    d = 100 + rng.normal(0, 10, size=n)
    return {
        "a": [float(v) for v in a],
        "b": [float(v) for v in b],
        "c": [float(v) for v in c],
        "d": [float(v) for v in d],
    }


def test_dcca_matches_local(spark, coupled_series):
    out = {
        (r["source_x"], r["source_y"], r["scale"]): r
        for r in dcca_pairs(
            _events_df(spark, coupled_series), scales=(4, 8)
        ).collect()
    }
    names = sorted(coupled_series)
    for i, x in enumerate(names):
        for y in names[i + 1:]:
            for s in (4, 8):
                nb, rho = _dcca_local(
                    coupled_series[x], coupled_series[y], s
                )
                r = out[(x, y, s)]
                assert r["n_boxes"] == nb
                if rho is None:
                    assert r["rho"] is None
                else:
                    assert r["rho"] == pytest.approx(rho, abs=2e-6), (x, y, s)


def test_dcca_detects_planted_coupling(spark, coupled_series):
    out = {
        (r["source_x"], r["source_y"], r["scale"]): r["rho"]
        for r in dcca_pairs(
            _events_df(spark, coupled_series), scales=(8,)
        ).collect()
    }
    assert out[("a", "b", 8)] > 0.9          # shared component
    assert out[("a", "c", 8)] < -0.9         # anti-correlated
    assert abs(out[("a", "d", 8)]) < 0.5     # independent


def test_dcca_trend_immunity(spark):
    # a strong shared LINEAR trend with independent fluctuations:
    # plain Pearson of the raw series would be ~1; rho_DCCA stays small
    rng = np.random.default_rng(5)
    n = 512
    trend = 0.5 * np.arange(n)
    a = trend + rng.normal(0, 10, size=n)
    b = trend + rng.normal(0, 10, size=n)
    raw_pearson = float(np.corrcoef(a, b)[0, 1])
    assert raw_pearson > 0.9
    out = dcca_pairs(
        _events_df(spark, {"a": [float(v) for v in a],
                           "b": [float(v) for v in b]}),
        scales=(8,),
    ).collect()
    assert abs(out[0]["rho"]) < 0.5


def test_dcca_guards(spark):
    df = _events_df(spark, {"a": [1.0] * 40, "b": [2.0] * 40})
    with pytest.raises(ValueError):
        dcca_pairs(df, scales=(2,))
    with pytest.raises(ValueError):
        dcca_pairs(df, scales=(4,), min_overlap=4)
    with pytest.raises(ValueError):
        dcca_pairs(df, bucket_sec=0)
    # constant series: zero self-fluctuation => NULL rho
    out = dcca_pairs(df, scales=(4,), min_overlap=8).collect()
    assert out[0]["rho"] is None
