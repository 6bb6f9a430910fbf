"""Time-range rolling stats: local-recomputation parity (sub-second
timestamps + ties), boundary inclusion, std NULL semantics, partition
invariance, and the z-score guard rules."""

import datetime as dt
import math

import numpy as np
import pytest

from eristropy_spark.operators.rolling import rolling_stats, rolling_zscore

UTC = dt.timezone.utc
BASE = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _ts(us):
    return (BASE + dt.timedelta(microseconds=us)).replace(tzinfo=None)


def _mk_rows():
    # two signals; sub-second spacing, a tie, and an exactly-window-old
    # point (at W=2.5s the 0us row is included from the 2_500_000us row)
    rows = []
    a = [0, 700_000, 700_000, 1_400_000, 2_500_000, 6_000_000]
    for i, us in enumerate(a):
        rows.append((1, _ts(us), float(i + 1)))
    b = [100_000, 3_000_000]
    for i, us in enumerate(b):
        rows.append((2, _ts(us), 10.0 * (i + 1)))
    return rows


def _local(rows, window_sec):
    span = int(round(window_sec * 1_000_000))
    out = {}
    for k, ts, v in rows:
        us = int((ts.replace(tzinfo=UTC) - BASE).total_seconds() * 1e6)
        win = [
            v2
            for k2, ts2, v2 in rows
            if k2 == k
            and us - span
            <= int((ts2.replace(tzinfo=UTC) - BASE).total_seconds() * 1e6)
            <= us
        ]
        std = float(np.std(win, ddof=1)) if len(win) > 1 else None
        out[(k, us, v)] = (
            float(np.mean(win)), std, min(win), max(win), len(win)
        )
    return out


def test_rolling_stats_matches_local(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, "sig long, ts timestamp_ntz, value double")
    got = {}
    for r in rolling_stats(df, "sig", window_sec=2.5).collect():
        us = int((r.ts.replace(tzinfo=UTC) - BASE).total_seconds() * 1e6)
        got[(r.sig, us, r.value)] = (
            r.roll_mean, r.roll_std, r.roll_min, r.roll_max, r.roll_n
        )
    want = _local(rows, 2.5)
    assert set(got) == set(want)
    for key in want:
        gm, gs, gmin, gmax, gn = got[key]
        wm, ws, wmin, wmax, wn = want[key]
        assert math.isclose(gm, wm, rel_tol=1e-12)
        assert (gs is None) == (ws is None)
        if ws is not None:
            assert math.isclose(gs, ws, rel_tol=1e-12)
        assert (gmin, gmax, gn) == (wmin, wmax, wn)


def test_rolling_ties_included_both_sides(spark):
    # equal-ts rows are frame peers: BOTH appear in each other's window
    rows = [(1, _ts(0), 1.0), (1, _ts(0), 3.0)]
    df = spark.createDataFrame(rows, "sig long, ts timestamp_ntz, value double")
    res = rolling_stats(df, "sig", window_sec=1.0).collect()
    assert all(r.roll_n == 2 and r.roll_mean == 2.0 for r in res)


def test_rolling_partition_invariant(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, "sig long, ts timestamp_ntz, value double")
    a = sorted(map(tuple, rolling_stats(df, "sig", window_sec=2.5).collect()))
    b = sorted(
        map(
            tuple,
            rolling_stats(
                df.repartition(7), "sig", window_sec=2.5
            ).collect(),
        )
    )
    assert a == b and a


def test_rolling_zscore_rules(spark):
    rows = [
        (1, _ts(0), 1.0),          # 1-point window -> NULL
        (1, _ts(1_000_000), 1.0),  # std == 0 -> NULL
        (1, _ts(2_000_000), 4.0),  # real z
        (1, _ts(60_000_000), 9.9),  # window slid past everything -> NULL
    ]
    df = spark.createDataFrame(rows, "sig long, ts timestamp_ntz, value double")
    res = {r.value: r.zscore for r in rolling_zscore(
        df, "sig", window_sec=5.0).collect()}
    assert res[9.9] is None and res[1.0] is None
    win = [1.0, 1.0, 4.0]
    assert math.isclose(
        res[4.0], (4.0 - np.mean(win)) / np.std(win, ddof=1), rel_tol=1e-12
    )


def test_rolling_validation(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1.0)], "sig long, ts timestamp_ntz, value double"
    )
    with pytest.raises(ValueError):
        rolling_stats(df, "sig", window_sec=0)
    with pytest.raises(ValueError):
        rolling_stats(df, "sig", stats=("mean", "median"))
    with pytest.raises(ValueError):
        rolling_stats(df, "sig", stats=())
    with pytest.raises(ValueError):
        rolling_zscore(df, "sig", min_points=1)
