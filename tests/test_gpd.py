"""GPD peaks-over-threshold PWM fit — literal-definition parity with
a local replay, parameter recovery on synthetic GPD/exponential
tails, min_k NULL rule, degenerate-tail NULLs, partition invariance,
guards."""

import math

import numpy as np
import pytest

from eristropy_spark.operators.tails import gpd_pot


def _qcont(sorted_vals, p):
    n = len(sorted_vals)
    h = (n - 1) * p
    lo = int(h)
    frac = h - lo
    v = float(sorted_vals[lo])
    if frac > 0.0:
        v = v + (float(sorted_vals[lo + 1]) - v) * frac
    return v


def _local_gpd(vals, q=0.9, min_k=10):
    u = _qcont(sorted(vals), q)
    y = sorted(float(v) - u for v in vals if v > u)
    k = len(y)
    if k == 0:
        return None
    s0 = sum(int(math.floor(t * 1e6 + 0.5)) for t in y)
    s1 = sum(
        int(math.floor((((k - j) / (k - 1) if k > 1 else 0.0) * t) * 1e6 + 0.5))
        for j, t in enumerate(y, 1)
    )
    b0 = (s0 / 1e6) / k
    b1 = (s1 / 1e6) / k
    if k < min_k:
        return (len(vals), u, k, None, None, None, None)
    den = b0 - 2.0 * b1
    xi = 2.0 - b0 / den if den != 0.0 else None
    sg = 2.0 * b0 * b1 / den if den != 0.0 else None
    return (len(vals), u, k, b0, b1, xi, sg)


def test_gpd_matches_local(spark):
    rng = np.random.default_rng(8)
    rows = [("s1", float(v)) for v in rng.normal(10, 5, 300)] + [
        ("s2", float(v)) for v in rng.pareto(3, 200) * 10
    ]
    df = spark.createDataFrame(rows, "source string, value double")
    got = {r["source"]: r for r in gpd_pot(df, "source").collect()}
    for src in ("s1", "s2"):
        vals = [v for s, v in rows if s == src]
        n, u, k, b0, b1, xi, sg = _local_gpd(vals)
        r = got[src]
        assert (r["n"], r["k"]) == (n, k)
        assert r["u"] == u
        # bit-identical: quantized-term sums + fixed float expressions
        assert r["b0"] == b0 and r["b1"] == b1
        assert r["xi"] == xi and r["sigma"] == sg


def test_gpd_recovers_parameters(spark):
    # exceedances above any threshold of a GPD(xi, sigma) are GPD with
    # the same xi — draw via inverse CDF for a deterministic sample
    rng = np.random.default_rng(9)
    n = 20_000
    u01 = rng.uniform(0, 1, n)

    def draws(xi, sigma):
        if xi == 0.0:
            return -sigma * np.log(1 - u01)
        return sigma / xi * ((1 - u01) ** (-xi) - 1.0)

    rows = (
        [("heavy", float(v)) for v in draws(0.3, 2.0)]
        + [("expo", float(v)) for v in draws(0.0, 2.0)]
        + [("bounded", float(v)) for v in draws(-0.4, 2.0)]
    )
    df = spark.createDataFrame(rows, "source string, value double")
    got = {r["source"]: r for r in gpd_pot(df, "source", q=0.8).collect()}
    assert got["heavy"]["xi"] == pytest.approx(0.3, abs=0.08)
    assert got["expo"]["xi"] == pytest.approx(0.0, abs=0.08)
    assert got["bounded"]["xi"] == pytest.approx(-0.4, abs=0.08)
    # sign ordering is the diagnostic that matters at the margin
    assert got["heavy"]["xi"] > got["expo"]["xi"] > got["bounded"]["xi"]
    assert got["heavy"]["sigma"] > 0


def test_gpd_min_k_and_degenerate(spark):
    # 20 points -> k = 2 exceedances at q=0.9: below min_k -> NULLs
    rows = [("tiny", float(v)) for v in range(20)]
    # all-equal exceedances: b0 = 2*b1 exactly? (two equal values:
    # weights 1 and 0 -> b1 = b0/2) -> xi/sigma NULL even at min_k=2
    rows += [("flat", 0.0)] * 30 + [("flat", 5.0), ("flat", 5.0)]
    df = spark.createDataFrame(rows, "source string, value double")
    got = {r["source"]: r for r in gpd_pot(df, "source", min_k=2).collect()}
    t = got["tiny"]
    assert t["k"] == 2 and t["b0"] is not None  # min_k=2 keeps it
    got10 = {r["source"]: r
             for r in gpd_pot(df, "source", min_k=10).collect()}
    assert got10["tiny"]["b0"] is None and got10["tiny"]["k"] == 2
    f = got["flat"]
    assert f["k"] == 2 and f["xi"] is None and f["sigma"] is None
    assert f["b0"] == 2 * f["b1"]


def test_gpd_partition_invariance(spark):
    rng = np.random.default_rng(10)
    rows = [(f"s{i % 4}", float(v)) for i, v in enumerate(rng.gamma(2, 3, 800))]
    df = spark.createDataFrame(rows, "source string, value double")
    a = {tuple(r) for r in gpd_pot(df.repartition(1), "source").collect()}
    b = {tuple(r) for r in gpd_pot(df.repartition(13), "source").collect()}
    assert a == b


def test_gpd_guards(spark):
    df = spark.createDataFrame([("a", 1.0)], "source string, value double")
    with pytest.raises(ValueError, match="q"):
        gpd_pot(df, "source", q=1.0)
    with pytest.raises(ValueError, match="min_k"):
        gpd_pot(df, "source", min_k=1)


# --------------------------------------------------- gumbel block maxima


def _bm_df(spark, rows):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (sig, t0 + dt.timedelta(seconds=int(s)), float(v))
        for sig, s, v in rows
    ]
    return spark.createDataFrame(data, "sig string, ts timestamp, value double")


def test_gumbel_matches_local(spark):
    from eristropy_spark.operators.tails import gumbel_blockmax

    rng = np.random.default_rng(47)
    rows = []
    for b in range(60):
        for i in range(5):
            rows.append(("a", b * 3600 + i * 60, float(rng.normal(10, 3))))
    got = gumbel_blockmax(_bm_df(spark, rows), "sig").collect()[0]

    # local replay with the same quantize-then-sum protocol
    import collections

    blocks = collections.defaultdict(list)
    for _, s, v in rows:
        blocks[s // 3600].append(v)
    x = np.sort([max(vs) for vs in blocks.values()])
    t0q = np.floor(x * 1e6 + 0.5).astype(np.int64)
    m = len(x)
    b0 = (t0q.sum() / 1e6) / m
    b1 = ((np.arange(m) * t0q).sum() / 1e6) / (m * (m - 1))
    sigma = (2 * b1 - b0) / math.log(2.0)
    mu = b0 - 0.5772156649015329 * sigma
    rl = mu + sigma * (-math.log(-math.log(1 - 1 / 100.0)))
    assert got["m"] == m
    assert got["b0"] == pytest.approx(b0, rel=1e-12)
    assert got["sigma"] == pytest.approx(sigma, rel=1e-12)
    assert got["mu"] == pytest.approx(mu, rel=1e-12)
    assert got["return_level"] == pytest.approx(rl, rel=1e-12)


def test_gumbel_recovers_parameters(spark):
    """Block maxima drawn from Gumbel(mu=50, sigma=8) via the inverse
    CDF: the PWM fit lands near the truth."""
    from eristropy_spark.operators.tails import gumbel_blockmax

    rng = np.random.default_rng(53)
    rows = [
        ("g", b * 3600, 50.0 - 8.0 * math.log(-math.log(rng.uniform())))
        for b in range(500)
    ]
    got = gumbel_blockmax(_bm_df(spark, rows), "sig").collect()[0]
    assert got["mu"] == pytest.approx(50.0, abs=1.5)
    assert got["sigma"] == pytest.approx(8.0, abs=1.0)
    # 100-block return level beyond the observed median block max
    assert got["return_level"] > 70.0


def test_gumbel_min_blocks_and_guards(spark):
    from eristropy_spark.operators.tails import gumbel_blockmax

    rows = [("a", b * 3600, float(b)) for b in range(3)]
    got = gumbel_blockmax(_bm_df(spark, rows), "sig", min_blocks=5).collect()
    assert got[0]["m"] == 3 and got[0]["mu"] is None

    with pytest.raises(ValueError):
        gumbel_blockmax(_bm_df(spark, rows), "sig", block_sec=0)
    with pytest.raises(ValueError):
        gumbel_blockmax(_bm_df(spark, rows), "sig", t_return=1.0)
    with pytest.raises(ValueError):
        gumbel_blockmax(_bm_df(spark, rows), "sig", min_blocks=1)


# ------------------------------------------------------- extremal index


def test_extremal_index_discriminates_clustering(spark):
    from eristropy_spark.operators.tails import extremal_index

    rng = np.random.default_rng(59)
    rows = [("iid", i, float(v)) for i, v in enumerate(rng.normal(0, 1, 2000))]
    x = 0.0
    for i in range(2000):
        x = 0.85 * x + float(rng.normal(0, 1)) * 0.53
        rows.append(("clust", i, x))
    got = {
        r["sig"]: r
        for r in extremal_index(_bm_df(spark, rows), "sig", q=0.95).collect()
    }
    assert got["iid"]["theta"] > 0.8
    assert got["clust"]["theta"] < 0.6
    assert got["iid"]["n_exc"] == got["clust"]["n_exc"] == 100


def test_extremal_index_matches_local(spark):
    from eristropy_spark.operators.tails import extremal_index

    rng = np.random.default_rng(61)
    vals = rng.normal(0, 1, 800)
    rows = [("a", i, float(v)) for i, v in enumerate(vals)]
    got = extremal_index(_bm_df(spark, rows), "sig", q=0.9).collect()[0]

    u = _qcont(np.sort(vals), 0.9)
    idx = np.nonzero(vals > u)[0] + 1
    T = np.diff(idx).astype(np.int64)
    N = len(idx)
    if T.max() <= 2:
        th = 2.0 * T.sum() ** 2 / ((N - 1) * (T.astype(object) ** 2).sum())
    else:
        th = (
            2.0 * (T - 1).sum() ** 2
            / ((N - 1) * ((T - 1) * (T - 2)).sum())
        )
    assert got["n_exc"] == N
    assert got["theta"] == pytest.approx(min(1.0, th), rel=1e-12)
    assert got["u"] == pytest.approx(u, rel=1e-12)


def test_extremal_index_degenerate(spark):
    from eristropy_spark.operators.tails import extremal_index

    # one exceedance -> no gaps -> NULL theta
    rows = [("a", i, 1.0 if i != 7 else 100.0) for i in range(20)]
    got = extremal_index(_bm_df(spark, rows), "sig", q=0.9).collect()
    assert got[0]["n_exc"] == 1 and got[0]["theta"] is None
    with pytest.raises(ValueError):
        extremal_index(_bm_df(spark, rows), "sig", q=1.5)


def test_evt_partition_invariance(spark):
    from eristropy_spark.operators.tails import extremal_index, gumbel_blockmax

    rng = np.random.default_rng(67)
    rows = [
        (f"s{i % 3}", i * 60, float(rng.normal(0, 5)))
        for i in range(900)
    ]
    df = _bm_df(spark, rows)
    for op in (
        lambda d: gumbel_blockmax(d, "sig"),
        lambda d: extremal_index(d, "sig", q=0.9),
    ):
        a = op(df.repartition(1)).orderBy("sig").collect()
        b = op(df.repartition(13)).orderBy("sig").collect()
        assert [r.asDict() for r in a] == [r.asDict() for r in b]
