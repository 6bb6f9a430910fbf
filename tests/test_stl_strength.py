"""stl_strength (Wang–Smith–Hyndman decomposition strength) —
discrimination on planted structure, local recomputation parity from
the decompose output, degenerate inputs, partition invariance."""

import datetime as dt
import math

import numpy as np
import pytest

from eristropy_spark.operators.decompose import seasonal_decompose, stl_strength


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=float(sec))


def _events_df(spark, series: dict[str, list[float]]):
    rows = [
        (k, _ts(i), i, float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )


def _keyed(df):
    return {r["user_id"]: r for r in df.collect()}


def _planted(n=120, period=12, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=float)
    noise = rng.normal(0, 0.1, n)
    return {
        "seasonal": list(3.0 * np.sin(2 * math.pi * t / period) + noise),
        "trend": list(0.5 * t + noise),
        "noise": list(rng.normal(0, 1, n)),
    }


def test_strength_discriminates_planted_structure(spark):
    got = _keyed(
        stl_strength(
            _events_df(spark, _planted()), "user_id", period=12,
            tiebreak_col="event_id",
        )
    )
    assert got["seasonal"]["seasonal_strength"] > 0.95
    assert got["seasonal"]["trend_strength"] < 0.5
    assert got["trend"]["trend_strength"] > 0.95
    assert got["noise"]["seasonal_strength"] < 0.6
    assert got["noise"]["trend_strength"] < 0.6
    for k in ("seasonal", "trend", "noise"):
        for c in ("trend_strength", "seasonal_strength"):
            assert 0.0 <= got[k][c] <= 1.0


def test_strength_matches_local_from_decompose(spark):
    """The aggregation layer, recomputed locally from the decompose
    output itself (same 6-dp quantization, population variance)."""
    df = _events_df(spark, _planted(seed=3))
    dec = (
        seasonal_decompose(df, "user_id", 12, tiebreak_col="event_id")
        .where("trend is not null")
        .select("user_id", "trend", "seasonal", "remainder")
        .toPandas()
    )
    got = _keyed(
        stl_strength(df, "user_id", period=12, tiebreak_col="event_id")
    )

    def q6(x):
        return np.floor(x * 1e6 + 0.5) / 1e6

    for k, g in dec.groupby("user_id"):
        r = q6(g["remainder"].to_numpy())
        ds = q6((g["remainder"] + g["seasonal"]).to_numpy())
        dt_ = q6((g["remainder"] + g["trend"]).to_numpy())
        row = got[k]
        assert row["n_used"] == len(g)
        assert row["var_rem"] == pytest.approx(np.var(r), abs=1e-9)
        assert row["trend_strength"] == pytest.approx(
            max(0.0, 1.0 - np.var(r) / np.var(dt_)), abs=1e-9
        )
        assert row["seasonal_strength"] == pytest.approx(
            max(0.0, 1.0 - np.var(r) / np.var(ds)), abs=1e-9
        )


def test_strength_degenerate_constant(spark):
    # constant series: every component variance is 0 -> NULL strengths
    got = _keyed(
        stl_strength(
            _events_df(spark, {"const": [2.0] * 48}), "user_id", period=12
        )
    )
    assert got["const"]["var_rem"] == 0.0
    assert got["const"]["trend_strength"] is None
    assert got["const"]["seasonal_strength"] is None


def test_strength_partition_invariance(spark):
    df = _events_df(spark, _planted(seed=9))
    a = _keyed(stl_strength(df.repartition(1), "user_id", period=12,
                            tiebreak_col="event_id"))
    b = _keyed(stl_strength(df.repartition(11), "user_id", period=12,
                            tiebreak_col="event_id"))
    for k in a:
        for c in ("var_rem", "trend_strength", "seasonal_strength"):
            assert a[k][c] == b[k][c]  # bit-identical (decimal sums)
