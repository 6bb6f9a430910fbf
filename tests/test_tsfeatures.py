"""ts_features / page_hinkley — local-recomputation parity, alarm
behavior on planted shifts, degenerate inputs, parameter guards."""

import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from eristropy_spark.operators.changepoint import page_hinkley
from eristropy_spark.operators.tsfeatures import ts_features


def _tokens_df(spark, seqs: dict[str, list[int]]):
    return spark.createDataFrame(
        [(k, v) for k, v in seqs.items()], "doc_id string, tokens array<int>"
    )


def _feats_local(x: list[int]):
    n = len(x)
    s = sum(x)
    c = [1 if v * n > s else (-1 if v * n < s else 0) for v in x]
    d = [b - a for a, b in zip(x, x[1:])]

    def longest(flag):
        best = cur = 0
        for v in c:
            cur = cur + 1 if v == flag else 0
            best = max(best, cur)
        return best

    return {
        "n": n,
        "sum_x": s,
        "abs_energy": sum(v * v for v in x),
        "rng": max(x) - min(x),
        "n_above_mean": sum(1 for v in c if v == 1),
        "n_crossings": sum(
            1 for a, b in zip(c, c[1:]) if (a > 0 and b < 0) or (a < 0 and b > 0)
        ),
        "strike_above": longest(1),
        "strike_below": longest(-1),
        "mean_abs_change": (sum(abs(v) for v in d) / (n - 1)) if n >= 2 else None,
        "cid_ce": math.sqrt(sum(v * v for v in d)) if n >= 2 else None,
    }


def test_ts_features_matches_local(spark):
    rng = np.random.default_rng(13)
    seqs = {
        f"d{i}": [int(v) for v in rng.integers(-50, 400, size=int(rng.integers(1, 120)))]
        for i in range(15)
    }
    seqs["const"] = [9] * 25
    seqs["one"] = [4]
    out = {r["doc_id"]: r for r in ts_features(_tokens_df(spark, seqs)).collect()}
    for k, x in seqs.items():
        want = _feats_local(x)
        r = out[k]
        for col in ("n", "sum_x", "abs_energy", "rng", "n_above_mean",
                    "n_crossings", "strike_above", "strike_below"):
            assert r[col] == want[col], (k, col)
        for col in ("mean_abs_change", "cid_ce"):
            if want[col] is None:
                assert r[col] is None
            else:
                assert r[col] == pytest.approx(want[col], rel=1e-12)


def test_ts_features_constant_signal(spark):
    r = ts_features(_tokens_df(spark, {"c": [5] * 12})).collect()[0]
    assert r["n_above_mean"] == 0 and r["n_crossings"] == 0
    assert r["strike_above"] == 0 and r["strike_below"] == 0
    assert r["mean_abs_change"] == 0.0 and r["cid_ce"] == 0.0


# ------------------------------------------------------------ page_hinkley
def _events_df(spark, series: dict[str, list[float]]):
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for key, vals in series.items():
        for j, v in enumerate(vals):
            rows.append((eid, t0 + timedelta(minutes=j), key, float(v)))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, sig string, value double"
    )


def _ph_local(vals, delta, lam, d=6):
    scale = 10 ** d
    qs = [math.floor(v * scale + 0.5) / scale for v in vals]
    s = 0.0
    m = 0
    mn = 0
    ph_max = 0
    alarm = None
    lam_u = round(lam * scale)
    for i, v in enumerate(qs, start=1):
        s = round(s + v, d)
        term = v - s / i - delta
        tq = math.floor(term * scale + 0.5)
        m += tq
        mn = min(mn, m) if i > 1 else m
        ph = m - mn
        ph_max = max(ph_max, ph)
        if alarm is None and ph > lam_u:
            alarm = i
    return ph_max / scale, alarm


def test_page_hinkley_matches_local(spark):
    rng = np.random.default_rng(21)
    series = {
        f"s{i}": [float(v) for v in rng.normal(50, 5, size=40)] for i in range(6)
    }
    # planted upward shift halfway
    series["shift"] = [50.0] * 20 + [80.0] * 20
    out = {
        r["sig"]: r
        for r in page_hinkley(
            _events_df(spark, series), key="sig", value_col="value",
            tiebreak_col="event_id", delta=0.5, lam=25.0,
        ).collect()
    }
    for k, vals in series.items():
        want_max, want_alarm = _ph_local(vals, 0.5, 25.0)
        r = out[k]
        assert r["n"] == len(vals)
        assert r["ph_max"] == pytest.approx(want_max, abs=2e-6), k
        assert r["alarm_i"] == want_alarm, k


def test_page_hinkley_shift_alarms_stationary_does_not(spark):
    rng = np.random.default_rng(2)
    series = {
        "flat": [float(v) for v in rng.normal(10, 0.5, size=60)],
        "jump": [10.0] * 30 + [30.0] * 30,
    }
    out = {
        r["sig"]: r
        for r in page_hinkley(
            _events_df(spark, series), key="sig", value_col="value",
            tiebreak_col="event_id", delta=0.5, lam=25.0,
        ).collect()
    }
    assert out["flat"]["alarm_i"] is None
    assert out["jump"]["alarm_i"] is not None
    assert 31 <= out["jump"]["alarm_i"] <= 40
    assert out["jump"]["ph_max"] > out["flat"]["ph_max"]


def test_page_hinkley_guards(spark):
    df = _events_df(spark, {"a": [1.0, 2.0]})
    with pytest.raises(ValueError):
        page_hinkley(df, key="sig", lam=0.0)
    with pytest.raises(ValueError):
        page_hinkley(df, key="sig", delta=1e-9)
    with pytest.raises(ValueError):
        page_hinkley(df, key="sig", exact_decimals=0)
