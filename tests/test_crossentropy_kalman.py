"""cross_sampen_pairs + kalman_level — brute-force / literal-recursion
parity, synchrony discrimination, degenerate inputs, partition
invariance."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from eristropy_spark.operators.crossentropy import (
    cross_sampen_kernel,
    cross_sampen_pairs,
)
from eristropy_spark.operators.smoothing import kalman_level


def _cse_brute(u, v, m, r):
    """Literal definition: Chebyshev template matches, strict < r."""
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    zu = (u - u.mean()) / u.std(ddof=1)
    zv = (v - v.mean()) / v.std(ddof=1)
    b_cnt = a_cnt = 0
    for i in range(len(u) - m):
        for j in range(len(v) - m):
            if max(abs(zu[i + k] - zv[j + k]) for k in range(m)) < r:
                b_cnt += 1
                if abs(zu[i + m] - zv[j + m]) < r:
                    a_cnt += 1
    cse = -math.log(a_cnt / b_cnt) if a_cnt > 0 and b_cnt > 0 else None
    return b_cnt, a_cnt, cse


def test_kernel_matches_brute(m=2):
    rng = np.random.default_rng(21)
    for _ in range(20):
        u = rng.integers(0, 10, size=rng.integers(5, 25))
        v = rng.integers(0, 10, size=rng.integers(5, 25))
        for mm in (1, 2):
            assert cross_sampen_kernel(u, v, mm, 0.4) == _cse_brute(
                u, v, mm, 0.4
            )


def test_kernel_degenerate():
    assert cross_sampen_kernel(np.array([1]), np.array([1, 2, 3]), 1, 0.2) == (
        0,
        0,
        None,
    )
    # constant series: zero variance -> None
    assert cross_sampen_kernel(
        np.array([3, 3, 3, 3]), np.array([1, 2, 3]), 1, 0.2
    ) == (0, 0, None)


def test_kernel_synchrony_discriminates():
    rng = np.random.default_rng(22)
    base = rng.integers(0, 50, size=60)
    echo = base + rng.integers(0, 2, size=60)  # tracks base
    indep = rng.integers(0, 50, size=60)
    _, _, cse_sync = cross_sampen_kernel(base, echo, 1, 0.2)
    _, _, cse_ind = cross_sampen_kernel(base, indep, 1, 0.2)
    assert cse_sync < cse_ind  # synchronized pair = lower cross-entropy


def _pairs_df(spark, groups):
    rows = [
        (key, src, [int(x) for x in arr]) for key, src, arr in groups
    ]
    return spark.createDataFrame(
        rows, "user string, source string, tokens array<int>"
    )


def test_operator_matches_kernel(spark):
    rng = np.random.default_rng(23)
    groups = []
    series = {}
    for u in ("u1", "u2"):
        for s in ("a", "b", "c"):
            arr = rng.integers(0, 12, size=rng.integers(6, 30))
            groups.append((u, s, arr))
            series[(u, s)] = arr
    out = {
        (r["key"], r["src_a"], r["src_b"]): r
        for r in cross_sampen_pairs(
            _pairs_df(spark, groups), m=1, r=0.2
        ).collect()
    }
    assert len(out) == 2 * 3  # 3 unordered pairs per user
    for (u, sa), ua in series.items():
        for (u2, sb), vb in series.items():
            if u2 != u or sa >= sb:
                continue
            b_cnt, a_cnt, cse = cross_sampen_kernel(ua, vb, 1, 0.2)
            r = out[(u, sa, sb)]
            assert (r["b_cnt"], r["a_cnt"]) == (b_cnt, a_cnt)
            assert (r["n_a"], r["n_b"]) == (len(ua), len(vb))
            if cse is None:
                assert r["cse"] is None
            else:
                assert r["cse"] == pytest.approx(cse, abs=0)


def test_operator_partition_invariant(spark):
    rng = np.random.default_rng(24)
    groups = [
        (f"u{i}", s, rng.integers(0, 9, size=20))
        for i in range(6)
        for s in ("a", "b", "c")
    ]
    d1 = _pairs_df(spark, groups).coalesce(1)
    d8 = _pairs_df(spark, groups).repartition(8)
    a = sorted(map(tuple, cross_sampen_pairs(d1).collect()))
    b = sorted(map(tuple, cross_sampen_pairs(d8).collect()))
    assert a == b


def test_operator_validates(spark):
    df = _pairs_df(spark, [("u", "a", [1, 2])])
    with pytest.raises(ValueError, match="m must"):
        cross_sampen_pairs(df, m=0)
    with pytest.raises(ValueError, match="r must"):
        cross_sampen_pairs(df, r=0.0)


# ---------------------------------------------------------- kalman_level


def _kalman_local(z, q, r):
    xh, pv, kg, rs = [z[0]], [r], [None], [None]
    x, p = z[0], r
    for t in range(1, len(z)):
        pp = p + q
        k = pp / (pp + r)
        resid = z[t] - x
        x = x + k * (z[t] - x)
        p = (1.0 - k) * pp
        xh.append(x)
        pv.append(p)
        kg.append(k)
        rs.append(resid)
    return xh, pv, kg, rs


def test_kalman_matches_literal_recursion(spark):
    rng = np.random.default_rng(25)
    rows = []
    series = {}
    for key in ("k1", "k2", "k3"):
        z = [float(v) for v in rng.normal(10, 2, size=rng.integers(1, 40))]
        series[key] = z
        rows += [(key, float(i), z[i]) for i in range(len(z))]
    df = spark.createDataFrame(rows, "key string, ts double, value double")
    out = kalman_level(df, key="key", ts_col="ts", q=0.1, r=1.0)
    got = {}
    for r in out.collect():
        got.setdefault(r["key"], []).append(
            (r["ts"], r["xhat"], r["pvar"], r["kgain"], r["resid"])
        )
    for key, z in series.items():
        xh, pv, kg, rs = _kalman_local(z, 0.1, 1.0)
        g = sorted(got[key])
        for t in range(len(z)):
            assert g[t][1] == xh[t]  # bit-exact literal recursion
            assert g[t][2] == pv[t]
            assert g[t][3] == kg[t]
            assert g[t][4] == rs[t]


def test_kalman_gain_converges_to_steady_state(spark):
    q, r = 0.1, 1.0
    # steady state: P+ solves p = (1-k)(p+q), k = (p+q)/(p+q+r)
    z = [0.0] * 200
    df = spark.createDataFrame(
        [("k", float(i), z[i]) for i in range(len(z))],
        "key string, ts double, value double",
    )
    rows = sorted(
        kalman_level(df, key="key", ts_col="ts", q=q, r=r).collect(),
        key=lambda r: r["ts"],
    )
    k_inf = rows[-1]["kgain"]
    # fixed point of the Riccati recursion for the local-level model
    pp = rows[-1]["pvar"] + q
    assert k_inf == pytest.approx(pp / (pp + r), abs=1e-12)
    assert abs(rows[-1]["kgain"] - rows[-2]["kgain"]) < 1e-12


def test_kalman_tracks_step_change(spark):
    z = [0.0] * 30 + [10.0] * 30
    df = spark.createDataFrame(
        [("k", float(i), z[i]) for i in range(len(z))],
        "key string, ts double, value double",
    )
    rows = sorted(
        kalman_level(df, key="key", ts_col="ts", q=0.5, r=1.0).collect(),
        key=lambda r: r["ts"],
    )
    assert abs(rows[29]["xhat"]) < 0.1
    assert rows[30]["resid"] == pytest.approx(10.0 - rows[29]["xhat"], abs=0)
    assert rows[-1]["xhat"] > 9.5


def test_kalman_validates(spark):
    df = spark.createDataFrame(
        [("k", 0.0, 1.0)], "key string, ts double, value double"
    )
    with pytest.raises(ValueError, match="q must"):
        kalman_level(df, key="key", q=0.0)
    with pytest.raises(ValueError, match="r must"):
        kalman_level(df, key="key", r=-1.0)
