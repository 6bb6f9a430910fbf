"""dtw_pairs — brute-force dp parity (full + banded), metric
properties, truncation, degenerate inputs, partition invariance."""

import numpy as np
import pytest

from eristropy_spark.operators.dtw import _BIG, dtw_kernel, dtw_pairs

BIG = int(_BIG)


def _dtw_brute(u, v, band=None):
    """Literal O(L^2) per-cell dp — the textbook recurrence."""
    la, lb = len(u), len(v)
    dp = [[BIG] * (lb + 1) for _ in range(la + 1)]
    dp[0][0] = 0
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            if band is not None and abs(i - j) > band:
                continue
            m = min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1])
            if m < BIG:
                dp[i][j] = abs(u[i - 1] - v[j - 1]) + m
    return None if dp[la][lb] >= BIG else dp[la][lb]


def test_kernel_matches_brute():
    rng = np.random.default_rng(31)
    for _ in range(120):
        u = rng.integers(-100, 100, size=rng.integers(1, 14))
        v = rng.integers(-100, 100, size=rng.integers(1, 14))
        assert dtw_kernel(u, v) == _dtw_brute(list(u), list(v))


def test_kernel_matches_brute_banded():
    rng = np.random.default_rng(32)
    for _ in range(120):
        u = rng.integers(-100, 100, size=rng.integers(1, 14))
        v = rng.integers(-100, 100, size=rng.integers(1, 14))
        band = int(rng.integers(0, 15))
        assert dtw_kernel(u, v, band=band) == _dtw_brute(
            list(u), list(v), band=band
        )


def test_kernel_metric_properties():
    rng = np.random.default_rng(33)
    u = rng.integers(0, 50, size=20)
    v = rng.integers(0, 50, size=17)
    # identity and symmetry
    assert dtw_kernel(u, u) == 0
    assert dtw_kernel(u, v) == dtw_kernel(v, u)
    # constant-vs-constant: every cell costs |a-b|; optimal path takes
    # max(n, m) steps
    assert dtw_kernel(np.full(6, 3), np.full(9, 8)) == 9 * 5
    # wide band == no band
    assert dtw_kernel(u, v, band=100) == dtw_kernel(u, v)


def test_kernel_degenerate():
    assert dtw_kernel(np.array([], dtype=np.int64), np.array([1, 2])) is None
    # band narrower than the length gap: corners unreachable
    assert dtw_kernel(np.arange(10), np.arange(3), band=2) is None
    with pytest.raises(ValueError):
        dtw_kernel(np.array([1]), np.array([1]), band=-1)


def _pairs_df(spark, groups):
    rows = [(key, src, [int(x) for x in arr]) for key, src, arr in groups]
    return spark.createDataFrame(
        rows, "user string, source string, tokens array<int>"
    )


def test_operator_matches_kernel(spark):
    rng = np.random.default_rng(34)
    groups, series = [], {}
    for u in ("u1", "u2"):
        for s in ("a", "b", "c"):
            arr = rng.integers(0, 40, size=rng.integers(4, 30))
            groups.append((u, s, arr))
            series[(u, s)] = arr
    out = {
        (r["key"], r["src_a"], r["src_b"]): r
        for r in dtw_pairs(_pairs_df(spark, groups), max_len=64).collect()
    }
    assert len(out) == 2 * 3
    for (u, sa), ua in series.items():
        for (u2, sb), vb in series.items():
            if u2 != u or sa >= sb:
                continue
            d = dtw_kernel(ua, vb)
            r = out[(u, sa, sb)]
            assert r["dtw"] == d
            assert (r["n_a"], r["n_b"]) == (len(ua), len(vb))
            assert r["dtw_norm"] == pytest.approx(
                d / (len(ua) + len(vb)), abs=0
            )


def test_operator_truncates_before_dp(spark):
    rng = np.random.default_rng(35)
    ua = rng.integers(0, 30, size=50)
    vb = rng.integers(0, 30, size=12)
    out = dtw_pairs(
        _pairs_df(spark, [("u", "a", ua), ("u", "b", vb)]), max_len=8
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (8, 8)
    assert r["dtw"] == dtw_kernel(ua[:8], vb[:8])


def test_operator_banded_and_validation(spark):
    rng = np.random.default_rng(36)
    ua = rng.integers(0, 30, size=20)
    vb = rng.integers(0, 30, size=20)
    df = _pairs_df(spark, [("u", "a", ua), ("u", "b", vb)])
    r = dtw_pairs(df, max_len=64, band=3).collect()[0]
    assert r["dtw"] == dtw_kernel(ua, vb, band=3)
    # unreachable band -> NULL row, not a crash
    df2 = _pairs_df(
        spark, [("u", "a", rng.integers(0, 9, 15)), ("u", "b", rng.integers(0, 9, 3))]
    )
    r2 = dtw_pairs(df2, max_len=64, band=2).collect()[0]
    assert r2["dtw"] is None and r2["dtw_norm"] is None
    with pytest.raises(ValueError):
        dtw_pairs(df, max_len=0)
    with pytest.raises(ValueError):
        dtw_pairs(df, band=-1)


def test_operator_partition_invariant(spark):
    rng = np.random.default_rng(37)
    groups = [
        (f"u{i}", s, rng.integers(0, 25, size=rng.integers(3, 20)))
        for i in range(6)
        for s in ("a", "b")
    ]
    df = _pairs_df(spark, groups)
    base = sorted(
        map(tuple, dtw_pairs(df, max_len=16).collect())
    )
    shuffled = sorted(
        map(tuple, dtw_pairs(df.repartition(13), max_len=16).collect())
    )
    assert base == shuffled
