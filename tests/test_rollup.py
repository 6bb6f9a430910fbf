"""Retention-cascade tier parity + gap-fill tests (north rule)."""

import datetime as dt

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from eristropy_spark.operators.gapfill import gapfill_linear, gapfill_locf
from eristropy_spark.operators.rollup import cascade, entropy_points, rollup_tier


def _points_df(spark):
    """Synthetic entropy points: 3 sources, irregular timestamps, some NaN."""
    rng = np.random.default_rng(42)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(500):
        src = f"src{i % 3}"
        ts = base + dt.timedelta(seconds=int(rng.integers(0, 7200)))
        sampen = float("nan") if i % 37 == 0 else float(rng.uniform(0.1, 2.5))
        rows.append(
            Row(
                doc_id=f"d{i}",
                source=src,
                ts=ts,
                sampen=sampen,
                permen=float(rng.uniform(0, 1)),
            )
        )
    return spark.createDataFrame(rows)


def _tier_key(rows):
    return {
        (r["source"], r["bucket"]): (
            r["n_seq"],
            r["n_sampen"],
            None if r["sum_sampen"] is None else round(r["sum_sampen"], 9),
            None if r["min_sampen"] is None else round(r["min_sampen"], 9),
            None if r["max_sampen"] is None else round(r["max_sampen"], 9),
            None if r["avg_sampen"] is None else round(r["avg_sampen"], 9),
        )
        for r in rows
    }


def test_cascade_tier_parity(spark):
    """1-hour computed through the cascade == 1-hour computed from raw."""
    pts = _points_df(spark)
    tiers = cascade(pts)
    via_cascade = _tier_key(tiers["1hour"].collect())
    direct = _tier_key(rollup_tier(pts, "hour", from_tier=False).collect())
    assert via_cascade == direct
    # minute tier sanity: sums of n_seq equal the input row count
    assert sum(r["n_seq"] for r in tiers["1min"].collect()) == 500


def test_cascade_salted_equals_unsalted(spark):
    pts = _points_df(spark)
    plain = _tier_key(rollup_tier(pts, "minute").collect())
    salted = _tier_key(rollup_tier(pts, "minute", salt=8).collect())
    assert plain == salted


def test_cascade_parallelism_invariance(spark):
    """Same rolled-up points at different partitioning (scaling-equality leg)."""
    pts = _points_df(spark)
    a = _tier_key(rollup_tier(pts.repartition(1), "hour").collect())
    b = _tier_key(rollup_tier(pts.repartition(16), "hour").collect())
    assert a == b


def test_entropy_points_schema(spark):
    rng = np.random.default_rng(17)
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            doc_id=f"s{i}",
            tokens=[float(v) for v in rng.normal(size=80)],
            n_tok=80,
            source="srcA",
            first_ts=base + dt.timedelta(minutes=i),
        )
        for i in range(4)
    ]
    pts = entropy_points(spark.createDataFrame(rows), m=1, r=0.2)
    got = pts.collect()
    assert {"doc_id", "source", "ts", "sampen", "permen"} == set(pts.columns)
    assert len(got) == 4


def _sparse_rollup(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(source="a", bucket=base + dt.timedelta(minutes=0), avg_sampen=1.0),
        Row(source="a", bucket=base + dt.timedelta(minutes=3), avg_sampen=4.0),
        Row(source="a", bucket=base + dt.timedelta(minutes=5), avg_sampen=2.0),
        Row(source="b", bucket=base + dt.timedelta(minutes=1), avg_sampen=7.0),
    ]
    return spark.createDataFrame(rows), base


def test_gapfill_locf(spark):
    roll, base = _sparse_rollup(spark)
    out = gapfill_locf(roll, "1 minute", ("avg_sampen",))
    got = {
        (r["source"], r["bucket"]): r["avg_sampen"] for r in out.collect()
    }
    # source a: minutes 0..5 dense; 1,2 carry 1.0; 4 carries 4.0
    assert got[("a", base + dt.timedelta(minutes=1))] == 1.0
    assert got[("a", base + dt.timedelta(minutes=2))] == 1.0
    assert got[("a", base + dt.timedelta(minutes=4))] == 4.0
    assert got[("a", base + dt.timedelta(minutes=5))] == 2.0
    # source b: single bucket, no fill needed
    assert got[("b", base + dt.timedelta(minutes=1))] == 7.0
    assert len(got) == 7


def test_gapfill_linear(spark):
    roll, base = _sparse_rollup(spark)
    out = gapfill_linear(roll, "1 minute", ("avg_sampen",))
    got = {
        (r["source"], r["bucket"]): r["avg_sampen"] for r in out.collect()
    }
    # linear between (0 -> 1.0) and (3 -> 4.0): minute 1 = 2.0, minute 2 = 3.0
    np.testing.assert_almost_equal(got[("a", base + dt.timedelta(minutes=1))], 2.0)
    np.testing.assert_almost_equal(got[("a", base + dt.timedelta(minutes=2))], 3.0)
    # between (3 -> 4.0) and (5 -> 2.0): minute 4 = 3.0
    np.testing.assert_almost_equal(got[("a", base + dt.timedelta(minutes=4))], 3.0)
    # real points untouched
    assert got[("a", base + dt.timedelta(minutes=3))] == 4.0


def test_cardinality_rollup_exact_and_hll(spark):
    """Exact distinct counts match a local recomputation; the HLL++
    approx path lands within its published ~2-4% error band."""
    import collections
    import datetime

    import numpy as np
    from pyspark.sql import Row

    from eristropy_spark.operators.rollup import cardinality_rollup

    rng = np.random.default_rng(5)
    rows = [
        Row(
            ts=datetime.datetime(2024, 1, 1, int(i % 3)),
            source="s" + str(i % 2),
            user_id=int(rng.integers(0, 200)),
        )
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["source"], r["bucket"]): (r["n_events"], r["n_distinct"])
        for r in cardinality_rollup(df, "hour", "user_id").collect()
    }
    groups = collections.defaultdict(set)
    counts = collections.Counter()
    for r in rows:
        k = (r.source, r.ts.replace(minute=0))
        groups[k].add(r.user_id)
        counts[k] += 1
    assert got == {k: (counts[k], len(v)) for k, v in groups.items()}
    approx = {
        (r["source"], r["bucket"]): r["n_distinct"]
        for r in cardinality_rollup(
            df, "hour", "user_id", exact=False
        ).collect()
    }
    for k, (_, exact_n) in got.items():
        assert abs(approx[k] - exact_n) / exact_n < 0.1


# -------------------------------------------------------------- ohlc_rollup

def test_ohlc_rollup_matches_local(spark):
    import datetime as dt

    from eristropy_spark.operators.rollup import ohlc_rollup

    b = dt.datetime(2024, 1, 1)
    rows = [
        # (source, ts, event_id, value); one bucket with a ts TIE at open
        ("a", b + dt.timedelta(minutes=0), 2, 5.0),
        ("a", b + dt.timedelta(minutes=0), 1, 3.0),  # tie: lower id opens
        ("a", b + dt.timedelta(minutes=30), 3, 9.0),
        ("a", b + dt.timedelta(minutes=59), 4, 1.0),
        ("a", b + dt.timedelta(hours=1, minutes=5), 5, 7.0),  # next bucket
        ("b", b + dt.timedelta(minutes=10), 6, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "source string, ts timestamp_ntz, event_id long, value double"
    )
    got = {
        (r.source, r.bucket): (r.open, r.high, r.low, r.close, r.n)
        for r in ohlc_rollup(df, "hour", tiebreak_col="event_id").collect()
    }
    assert got[("a", b)] == (3.0, 9.0, 1.0, 1.0, 4)
    assert got[("a", b + dt.timedelta(hours=1))] == (7.0, 7.0, 7.0, 7.0, 1)
    assert got[("b", b)] == (2.0, 2.0, 2.0, 2.0, 1)


def test_ohlc_rollup_partition_invariant(spark):
    import datetime as dt

    import numpy as np

    from eristropy_spark.operators.rollup import ohlc_rollup

    rng = np.random.RandomState(11)
    b = dt.datetime(2024, 1, 1)
    rows = [
        (
            "s" + str(int(rng.randint(3))),
            b + dt.timedelta(seconds=int(rng.randint(7200))),
            i,
            float(rng.randn()),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "source string, ts timestamp_ntz, event_id long, value double"
    )
    a = sorted(map(tuple, ohlc_rollup(df, "hour", tiebreak_col="event_id").collect()))
    c = sorted(
        map(
            tuple,
            ohlc_rollup(
                df.repartition(13), "hour", tiebreak_col="event_id"
            ).collect(),
        )
    )
    assert a == c and a


# --------------------------------------------------------- histogram_rollup

def test_histogram_rollup_matches_local(spark):
    import datetime as dt

    import numpy as np

    from eristropy_spark.operators.rollup import histogram_rollup

    rng = np.random.RandomState(5)
    b = dt.datetime(2024, 1, 1)
    rows = [
        (
            "s" + str(i % 2),
            b + dt.timedelta(minutes=int(rng.randint(0, 120))),
            float(rng.randn() * 3),  # some values beyond [lo, hi)
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "source string, ts timestamp_ntz, value double")
    lo, hi, nb = -2.0, 2.0, 8
    width = (hi - lo) / nb

    def clamp(v):
        import math

        return min(max(int(math.floor((v - lo) / width)), 0), nb - 1)

    want = {}
    for s, ts, v in rows:
        key = (s, ts.replace(minute=0, second=0, microsecond=0), clamp(v))
        want[key] = want.get(key, 0) + 1
    got = {
        (r.source, r.bucket, r.bin): r.cnt
        for r in histogram_rollup(df, "hour", lo, hi, nb).collect()
    }
    assert got == want
    assert sum(got.values()) == 400  # closed histogram: nothing dropped


def test_histogram_rollup_validation(spark):
    import pytest

    from eristropy_spark.operators.rollup import histogram_rollup

    df = spark.createDataFrame(
        [("a", __import__("datetime").datetime(2024, 1, 1), 1.0)],
        "source string, ts timestamp_ntz, value double",
    )
    with pytest.raises(ValueError):
        histogram_rollup(df, "hour", 0.0, 1.0, n_bins=0)
    with pytest.raises(ValueError):
        histogram_rollup(df, "hour", 1.0, 1.0)


# ---------------------------------------------------------------- Allan

import numpy as np
import pytest as _pytest

from eristropy_spark.operators.rollup import allan_variance


def _allan_local(secs, vals, tau):
    b = np.floor(np.asarray(secs) / tau).astype(np.int64)
    uniq = np.unique(b)
    means = {int(u): np.mean([v for bb, v in zip(b, vals) if bb == u]) for u in uniq}
    pairs = [(means[u + 1] - means[u]) ** 2 for u in uniq if u + 1 in means]
    if not pairs:
        return None, 0
    return float(np.sum(pairs) / (2 * len(pairs))), len(pairs)


def _ts_df(spark, secs, vals, key="s1"):
    rows = [
        (key, float(s), float(v)) for s, v in zip(secs, vals)
    ]
    return spark.createDataFrame(rows, "sid string, sec double, value double").select(
        "sid", F.timestamp_seconds("sec").alias("ts"), "value"
    )


def test_allan_matches_bruteforce(spark):
    rng = np.random.default_rng(67)
    secs = np.sort(rng.uniform(0, 7200, 600))
    vals = rng.normal(10, 2, 600)
    df = _ts_df(spark, secs, vals)
    rows = {
        r["tau_s"]: r
        for r in allan_variance(df, "sid", taus=(60, 240)).collect()
    }
    for tau in (60, 240):
        ref, m = _allan_local(np.floor(secs), vals, tau)
        r = rows[tau]
        assert r["m_pairs"] == m
        assert r["avar"] == _pytest.approx(ref, abs=1e-5)
        assert r["adev"] == _pytest.approx(np.sqrt(ref), abs=1e-5)


def test_allan_white_noise_slope_down_random_walk_up(spark):
    rng = np.random.default_rng(71)
    n = 4096
    secs = np.arange(n, dtype=float)
    white = rng.normal(0, 1, n)
    walk = np.cumsum(rng.normal(0, 1, n))
    aw = {
        r["tau_s"]: r["avar"]
        for r in allan_variance(
            _ts_df(spark, secs, white), "sid", taus=(4, 16, 64)
        ).collect()
    }
    ar = {
        r["tau_s"]: r["avar"]
        for r in allan_variance(
            _ts_df(spark, secs, walk), "sid", taus=(4, 16, 64)
        ).collect()
    }
    # white noise: AVAR ~ 1/tau (averaging helps); random walk: ~ tau
    assert aw[4] > aw[16] > aw[64]
    assert ar[4] < ar[16] < ar[64]


def test_allan_gappy_series_pairs_only_adjacent(spark):
    # buckets 0,1,5,6 at tau=10: adjacent pairs (0,1) and (5,6) only
    secs = [5.0, 15.0, 55.0, 65.0]
    vals = [1.0, 3.0, 10.0, 14.0]
    r = allan_variance(_ts_df(spark, secs, vals), "sid", taus=(10,)).first()
    assert r["n_buckets"] == 4 and r["m_pairs"] == 2
    assert r["avar"] == _pytest.approx((4.0 + 16.0) / 4.0, abs=1e-9)


def test_allan_single_bucket_null(spark):
    r = allan_variance(
        _ts_df(spark, [1.0, 2.0], [5.0, 7.0]), "sid", taus=(60,)
    ).first()
    assert r["avar"] is None and r["m_pairs"] == 0


# ---------------------------------------------------------------- Hadamard

from eristropy_spark.operators.rollup import hadamard_variance


def _hadamard_local(secs, vals, tau):
    b = np.floor(np.asarray(secs) / tau).astype(np.int64)
    uniq = np.unique(b)
    means = {int(u): np.mean([v for bb, v in zip(b, vals) if bb == u]) for u in uniq}
    trips = [
        (means[u + 2] - 2 * means[u + 1] + means[u]) ** 2
        for u in uniq
        if u + 1 in means and u + 2 in means
    ]
    if not trips:
        return None, 0
    return float(np.sum(trips) / (6 * len(trips))), len(trips)


def test_hadamard_matches_bruteforce(spark):
    rng = np.random.default_rng(83)
    secs = np.sort(rng.uniform(0, 7200, 700))
    vals = rng.normal(5, 3, 700)
    rows = {
        r["tau_s"]: r
        for r in hadamard_variance(
            _ts_df(spark, secs, vals), "sid", taus=(60, 240)
        ).collect()
    }
    for tau in (60, 240):
        ref, m = _hadamard_local(np.floor(secs), vals, tau)
        r = rows[tau]
        assert r["m_triples"] == m
        assert r["hvar"] == _pytest.approx(ref, abs=1e-5)
        assert r["hdev"] == _pytest.approx(np.sqrt(ref), abs=1e-5)


def test_hadamard_immune_to_linear_drift_allan_is_not(spark):
    n = 4096
    secs = np.arange(n, dtype=float)
    rng = np.random.default_rng(89)
    noise = rng.normal(0, 0.5, n)
    drift = 0.05 * secs + noise
    taus = (8, 64)
    av = {
        r["tau_s"]: r["avar"]
        for r in allan_variance(_ts_df(spark, secs, drift), "sid", taus=taus).collect()
    }
    hv = {
        r["tau_s"]: r["hvar"]
        for r in hadamard_variance(
            _ts_df(spark, secs, drift), "sid", taus=taus
        ).collect()
    }
    hv_pure = {
        r["tau_s"]: r["hvar"]
        for r in hadamard_variance(
            _ts_df(spark, secs, noise), "sid", taus=taus
        ).collect()
    }
    # the ramp dominates Allan at long tau (AVAR ~ (drift*tau)^2/2)
    assert av[64] > 100 * hv[64]
    # Hadamard on drift+noise ~ Hadamard on noise alone
    assert hv[64] == _pytest.approx(hv_pure[64], rel=0.05)


def test_hadamard_needs_three_adjacent(spark):
    # buckets 0,1 and 5,6,7 at tau=10: one triple (5,6,7)
    secs = [5.0, 15.0, 55.0, 65.0, 75.0]
    vals = [1.0, 2.0, 10.0, 13.0, 20.0]
    r = hadamard_variance(_ts_df(spark, secs, vals), "sid", taus=(10,)).first()
    assert r["n_buckets"] == 5 and r["m_triples"] == 1
    # (20 - 2*13 + 10)^2 / 6 = 16/6
    assert r["hvar"] == _pytest.approx(16.0 / 6.0, abs=1e-9)
