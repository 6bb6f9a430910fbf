"""backtest_baselines — literal-recomputation parity, forecastability
discrimination, degenerate series, partition invariance."""

import numpy as np
import pytest


from eristropy_spark.operators.backtest import backtest_baselines


def _local_backtest(y):
    """Literal definition from Hyndman & Koehler 2006, with the
    operator's 12-dp / 6-dp exact-DECIMAL term quantization mirrored
    (|e| at 1e12, e² at 1e6, summed as exact ints)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    e_naive = [y[t] - y[t - 1] for t in range(1, n)]
    # left-to-right prefix sum, mirroring the engines' running frame
    e_mean, s = [], 0.0
    for t in range(1, n):
        s += float(y[t - 1])
        e_mean.append(y[t] - s / t)
    e_drift = [
        y[t] - (y[t - 1] + (y[t - 1] - y[0]) / (t - 1)) for t in range(2, n)
    ]

    def q12(es):
        return sum(int(np.floor(abs(e) * 1e12 + 0.5)) for e in es)

    def q6sq(es):
        return sum(int(np.floor(e * e * 1e6 + 0.5)) for e in es)

    sn = q12(e_naive)
    mae_naive = sn / 1e12 / len(e_naive) if e_naive else None
    out = {
        "n": n,
        "mae_naive": mae_naive,
        "rmse_naive": float(np.sqrt(q6sq(e_naive) / 1e6 / len(e_naive)))
        if e_naive
        else None,
        "mae_mean": q12(e_mean) / 1e12 / len(e_mean) if e_mean else None,
        "mae_drift": q12(e_drift) / 1e12 / len(e_drift)
        if e_drift
        else None,
    }
    nz = e_naive and sn > 0
    out["mase_mean"] = out["mae_mean"] / mae_naive if nz else None
    out["mase_drift"] = (
        out["mae_drift"] / mae_naive
        if nz and out["mae_drift"] is not None
        else None
    )
    return out


def _df(spark, groups):
    rows = [
        (k, i, float(v))
        for k, ys in groups.items()
        for i, v in enumerate(ys)
    ]
    return spark.createDataFrame(rows, "key string, ts long, value double")


def test_matches_literal(spark):
    rng = np.random.default_rng(51)
    groups = {
        f"k{i}": rng.normal(size=rng.integers(2, 40)).tolist()
        for i in range(8)
    }
    out = {
        r["key"]: r
        for r in backtest_baselines(
            _df(spark, groups), key="key", ts_col="ts"
        ).collect()
    }
    for k, ys in groups.items():
        want = _local_backtest(ys)
        got = out[k]
        assert got["n"] == want["n"]
        for c in (
            "mae_naive", "rmse_naive", "mae_mean", "mae_drift",
            "mase_mean", "mase_drift",
        ):
            if want[c] is None:
                assert got[c] is None, (k, c)
            else:
                assert got[c] == pytest.approx(want[c], rel=1e-12), (k, c)


def test_discriminates_forecastability(spark):
    rng = np.random.default_rng(52)
    # mean-reverting iid noise: the mean forecaster beats naive
    noise = rng.normal(size=400).tolist()
    # random walk: naive is optimal, mean badly behind
    walk = np.cumsum(rng.normal(size=400)).tolist()
    out = {
        r["key"]: r
        for r in backtest_baselines(
            _df(spark, {"noise": noise, "walk": walk}), key="key", ts_col="ts"
        ).collect()
    }
    assert out["noise"]["mase_mean"] < 1.0
    assert out["walk"]["mase_mean"] > 1.0


def test_degenerate_series(spark):
    out = {
        r["key"]: r
        for r in backtest_baselines(
            _df(spark, {"one": [5.0], "const": [2.0, 2.0, 2.0]}),
            key="key",
            ts_col="ts",
        ).collect()
    }
    # single point: no one-step errors at all
    assert out["one"]["mae_naive"] is None
    assert out["one"]["mase_mean"] is None
    # constant: naive MAE is 0 -> MASE undefined, plain MAEs fine
    assert out["const"]["mae_naive"] == 0.0
    assert out["const"]["mase_mean"] is None
    assert out["const"]["mase_drift"] is None


def test_partition_invariant(spark):
    rng = np.random.default_rng(53)
    groups = {
        f"k{i}": rng.normal(size=30).tolist() for i in range(10)
    }
    df = _df(spark, groups)
    a = sorted(
        map(tuple, backtest_baselines(df, key="key", ts_col="ts").collect())
    )
    b = sorted(
        map(
            tuple,
            backtest_baselines(
                df.repartition(17), key="key", ts_col="ts"
            ).collect(),
        )
    )
    assert a == b
