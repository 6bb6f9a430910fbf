"""Croston's method — literal-recursion parity with a local replay,
zero-run (no-densify) interval semantics, SBA factor, single-bucket
init, partition invariance, validation guards."""

import datetime

import numpy as np
import pytest

from eristropy_spark.operators.intermittent import croston


def _t(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(
        minutes=minute, seconds=second
    )


def _local_croston(bucket_counts, alpha=0.1):
    """[(k, x, g, z, p, f, sba)] over ordered (minute_idx, count)."""
    a = alpha
    out = []
    z = p = 0.0
    prev = None
    for k, (idx, x) in enumerate(bucket_counts, 1):
        g = 1 if prev is None else idx - prev
        if prev is None:
            z, p = float(x), float(g)
        else:
            z = a * x + (1.0 - a) * z
            p = a * g + (1.0 - a) * p
        prev = idx
        out.append((k, x, g, z, p, z / p, (1.0 - 0.5 * a) * (z / p)))
    return out


def test_croston_matches_local(spark):
    # key 'a': bursts at minutes 0 (3 events), 5 (1), 6 (2), 20 (4)
    rows = (
        [("a", _t(0, s)) for s in (1, 2, 3)]
        + [("a", _t(5))]
        + [("a", _t(6, s)) for s in (10, 50)]
        + [("a", _t(20, s)) for s in (0, 1, 2, 3)]
    )
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = croston(df, "user_id").orderBy("k").collect()
    want = _local_croston([(0, 3), (5, 1), (6, 2), (20, 4)])
    assert len(got) == len(want)
    for r, (k, x, g, z, p, f, sba) in zip(got, want):
        assert (r["k"], r["x"], r["interval"]) == (k, x, g)
        # bit-identical: same literal float ops in the same order
        assert r["z"] == z and r["p"] == p
        assert r["croston"] == f and r["sba"] == sba


def test_croston_interval_carries_zero_runs(spark):
    # a 60-minute silence must enter p as the literal gap, with no
    # densified rows in between
    rows = [("a", _t(0)), ("a", _t(60))]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = croston(df, "user_id").orderBy("k").collect()
    assert [r["interval"] for r in got] == [1, 60]
    assert len(got) == 2  # demand buckets only — zeros never emitted
    r2 = got[1]
    assert r2["p"] == 0.1 * 60 + 0.9 * 1.0
    assert r2["croston"] == r2["z"] / r2["p"]


def test_croston_single_bucket_init(spark):
    df = spark.createDataFrame(
        [("a", _t(7, s)) for s in range(5)], "user_id string, ts timestamp"
    )
    r = croston(df, "user_id").collect()
    assert len(r) == 1
    assert r[0]["x"] == 5 and r[0]["interval"] == 1
    assert r[0]["z"] == 5.0 and r[0]["p"] == 1.0 and r[0]["croston"] == 5.0
    assert r[0]["sba"] == 0.95 * 5.0


def test_croston_partition_invariance(spark):
    rng = np.random.default_rng(5)
    rows = [
        (f"k{i % 3}", _t(int(m), int(s)))
        for i, (m, s) in enumerate(
            zip(rng.integers(0, 300, 400), rng.integers(0, 60, 400))
        )
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    a = {tuple(r) for r in croston(df.repartition(1), "user_id").collect()}
    b = {tuple(r) for r in croston(df.repartition(17), "user_id").collect()}
    assert a == b


def test_croston_hour_bucket_and_guards(spark):
    rows = [("a", _t(0)), ("a", _t(59)), ("a", _t(120))]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = croston(df, "user_id", bucket="hour").orderBy("k").collect()
    assert [r["x"] for r in got] == [2, 1]
    assert [r["interval"] for r in got] == [1, 2]
    with pytest.raises(ValueError, match="alpha"):
        croston(df, "user_id", alpha=0.0)
    with pytest.raises(ValueError, match="bucket"):
        croston(df, "user_id", bucket="week")
