"""rsi_macd — literal-recursion parity, pinned RSI semantics on flat /
monotone series, short-key NULLs, partition invariance, guards."""

import datetime
import math

import numpy as np
import pytest

from eristropy_spark.operators.momentum import rsi_macd


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


def _local(vals, n=14, fast=12, slow=26, signal=9):
    """Independent literal recursion (same pinned semantics)."""
    af, as_, ag_a = 2.0 / (fast + 1), 2.0 / (slow + 1), 2.0 / (signal + 1)
    out = []
    ef = es = sg = ag = al = 0.0
    seed_g = seed_l = 0.0
    for i, v in enumerate(vals):
        if i == 0:
            ef = es = v
            m = 0.0
            sg = 0.0
            rsi = None
        else:
            ef = (1 - af) * ef + af * v
            es = (1 - as_) * es + as_ * v
            m = ef - es
            sg = (1 - ag_a) * sg + ag_a * m
            d = v - vals[i - 1]
            g, ls = max(d, 0.0), max(-d, 0.0)
            if i < n:
                seed_g += g
                seed_l += ls
                rsi = None
            else:
                if i == n:
                    ag, al = (seed_g + g) / n, (seed_l + ls) / n
                else:
                    ag, al = (ag * (n - 1) + g) / n, (al * (n - 1) + ls) / n
                if al == 0.0:
                    rsi = 100.0 if ag > 0.0 else 50.0
                else:
                    rsi = 100.0 - 100.0 / (1.0 + ag / al)
        out.append((m, sg, m - sg, rsi))
    return out


def test_matches_local_recursion(spark):
    rng = np.random.default_rng(47)
    series = {
        f"u{i}": list(np.round(rng.normal(50, 10, size=int(rng.integers(20, 60))), 2))
        for i in range(4)
    }
    df = _events_df(spark, series)
    r = rsi_macd(df, "user_id", tiebreak_col="event_id")
    got = {
        (row["user_id"], row["event_id"]): row
        for row in r.collect()
    }
    for k, vals in series.items():
        base_eid = min(e for (u, e) in got if u == k)
        exp = _local(vals)
        for j, (m, sg, h, rsi) in enumerate(exp):
            row = got[(k, base_eid + j)]
            assert row["macd"] == pytest.approx(m, abs=1e-9)
            assert row["macd_signal"] == pytest.approx(sg, abs=1e-9)
            assert row["macd_hist"] == pytest.approx(h, abs=1e-9)
            if rsi is None:
                assert row["rsi"] is None or math.isnan(row["rsi"])
            else:
                assert row["rsi"] == pytest.approx(rsi, abs=1e-9)


def test_pinned_semantics_flat_and_monotone(spark):
    df = _events_df(
        spark,
        {
            "flat": [5.0] * 20,
            "up": list(range(20)),
            "down": list(range(20, 0, -1)),
        },
    )
    rows = rsi_macd(df, "user_id", tiebreak_col="event_id").collect()
    by_user = {}
    for row in rows:
        by_user.setdefault(row["user_id"], []).append(row)
    for u in by_user:
        by_user[u].sort(key=lambda r: r["event_id"])
    # flat: all deltas 0 -> ag = al = 0 -> pinned 50; macd identically 0
    for row in by_user["flat"]:
        assert row["macd"] == 0.0 and row["macd_signal"] == 0.0
    assert all(r["rsi"] == 50.0 for r in by_user["flat"][14:])
    # strictly increasing: al = 0, ag > 0 -> pinned 100
    assert all(r["rsi"] == 100.0 for r in by_user["up"][14:])
    # strictly decreasing: ag = 0, al > 0 -> RSI = 0
    assert all(r["rsi"] == pytest.approx(0.0) for r in by_user["down"][14:])


def test_short_key_all_null_rsi(spark):
    df = _events_df(spark, {"s": [1.0, 3.0, 2.0]})
    rows = rsi_macd(df, "user_id", tiebreak_col="event_id").collect()
    assert len(rows) == 3
    assert all(r["rsi"] is None or math.isnan(r["rsi"]) for r in rows)
    # macd defined from the first point
    assert all(r["macd"] is not None for r in rows)


def test_partition_invariance(spark):
    rng = np.random.default_rng(11)
    series = {f"u{i}": list(rng.normal(0, 1, size=30)) for i in range(3)}
    df = _events_df(spark, series)
    a = rsi_macd(df.repartition(1), "user_id", tiebreak_col="event_id")
    b = rsi_macd(df.repartition(16), "user_id", tiebreak_col="event_id")
    pa = a.orderBy("event_id").toPandas()
    pb = b.orderBy("event_id").toPandas()
    for c in ("macd", "macd_signal", "macd_hist", "rsi"):
        np.testing.assert_array_equal(pa[c].to_numpy(), pb[c].to_numpy())


def test_param_guards(spark):
    df = _events_df(spark, {"s": [1.0, 2.0]})
    with pytest.raises(ValueError):
        rsi_macd(df, "user_id", rsi_period=0)
    with pytest.raises(ValueError):
        rsi_macd(df, "user_id", fast=26, slow=12)
    with pytest.raises(ValueError):
        rsi_macd(df, "user_id", signal=0)
