"""ttest_drift / energy_drift — value parity against numpy brute force,
shift/scale discrimination, empty-half guards."""

import numpy as np
import pytest

from eristropy_spark.operators.drift import energy_drift, ttest_drift


def _df(spark, keyvals: dict[str, np.ndarray]):
    rows = [
        (k, i, float(v))
        for k, vals in keyvals.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "key string, ts long, value double")


def _halves(vals):
    n = len(vals)
    return np.asarray(vals[: n // 2], float), np.asarray(vals[n // 2 :], float)


def test_ttest_matches_numpy(spark):
    rng = np.random.default_rng(43)
    data = {
        "shift": np.concatenate([rng.normal(0, 1, 150), rng.normal(1, 1, 170)]),
        "same": rng.normal(5, 2, 257),
        "scale": np.concatenate([rng.normal(0, 1, 100), rng.normal(0, 4, 100)]),
    }
    out = {r["key"]: r for r in ttest_drift(_df(spark, data), "key", ts_col="ts").collect()}
    for k, vals in data.items():
        a, b = _halves(vals)
        ma, mb = a.mean(), b.mean()
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (ma - mb) / np.sqrt(se2)
        dof = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        pooled = ((len(a) - 1) * va + (len(b) - 1) * vb) / (len(a) + len(b) - 2)
        r = out[k]
        assert r["n_ref"] == len(a) and r["n_cur"] == len(b)
        assert r["mean_ref"] == pytest.approx(ma, abs=1e-9)
        assert r["mean_cur"] == pytest.approx(mb, abs=1e-9)
        assert r["t_stat"] == pytest.approx(t, rel=1e-9)
        assert r["dof"] == pytest.approx(dof, rel=1e-9)
        assert r["cohen_d"] == pytest.approx((ma - mb) / np.sqrt(pooled), rel=1e-9)
        assert r["f_ratio"] == pytest.approx(va / vb, rel=1e-9)
    # discrimination: the shifted key rejects, the stable one doesn't
    assert abs(out["shift"]["t_stat"]) > 4.0
    assert abs(out["same"]["t_stat"]) < 3.0
    assert out["scale"]["f_ratio"] < 0.3  # variance quadrupled in cur half


def test_ttest_guards(spark):
    out = ttest_drift(
        _df(spark, {"tiny": np.array([1.0, 2.0, 3.0])}), "key", ts_col="ts"
    ).collect()[0]
    # ref half has 1 point -> t undefined, means still emitted
    assert out["t_stat"] is None and out["dof"] is None
    assert out["mean_ref"] == 1.0
    const = ttest_drift(
        _df(spark, {"c": np.full(20, 7.0)}), "key", ts_col="ts"
    ).collect()[0]
    assert const["t_stat"] is None and const["f_ratio"] is None


def test_energy_matches_bruteforce(spark):
    rng = np.random.default_rng(47)
    data = {
        "shift": np.concatenate([rng.normal(0, 1, 120), rng.normal(2, 1, 140)]),
        "same": rng.normal(0, 1, 200),
        "scale": np.concatenate([rng.normal(0, 1, 90), rng.normal(0, 3, 110)]),
    }
    out = {r["key"]: r for r in energy_drift(_df(spark, data), "key", ts_col="ts").collect()}
    for k, vals in data.items():
        a, b = _halves(vals)
        aa = np.abs(a[:, None] - b[None, :]).mean()
        bb = np.abs(a[:, None] - a[None, :]).mean()
        cc = np.abs(b[:, None] - b[None, :]).mean()
        d2 = 2 * aa - bb - cc
        r = out[k]
        assert r["e_dist"] == pytest.approx(d2, rel=1e-7, abs=1e-9)
        assert r["e_stat"] == pytest.approx(
            len(a) * len(b) / (len(a) + len(b)) * d2, rel=1e-7, abs=1e-9
        )
    # energy reacts to BOTH shift and pure scale change (mean-preserving)
    assert out["shift"]["e_stat"] > out["same"]["e_stat"]
    assert out["scale"]["e_stat"] > out["same"]["e_stat"]


def test_energy_guards(spark):
    one = energy_drift(
        _df(spark, {"k": np.array([1.0])}), "key", ts_col="ts"
    ).collect()[0]
    assert one["e_dist"] is None
    # identical halves -> D2 == 0 exactly
    same = energy_drift(
        _df(spark, {"k": np.array([1.0, 2.0, 3.0, 1.0, 2.0, 3.0])}),
        "key",
        ts_col="ts",
    ).collect()[0]
    assert same["e_dist"] == pytest.approx(0.0, abs=1e-12)
