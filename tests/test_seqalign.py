"""align_pairs — brute-force dp parity for edit distance and LCS,
classic identities, truncation, degenerate inputs, partition
invariance."""

import numpy as np
import pytest

from eristropy_spark.operators.seqalign import (
    align_pairs,
    edit_distance_kernel,
    lcs_kernel,
)


def _lev_brute(u, v):
    la, lb = len(u), len(v)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        new = [i] * (lb + 1)
        for j in range(1, lb + 1):
            new[j] = min(
                dp[j] + 1, new[j - 1] + 1, dp[j - 1] + (u[i - 1] != v[j - 1])
            )
        dp = new
    return dp[lb]


def _lcs_brute(u, v):
    la, lb = len(u), len(v)
    dp = [0] * (lb + 1)
    for i in range(1, la + 1):
        new = [0] * (lb + 1)
        for j in range(1, lb + 1):
            new[j] = max(
                dp[j], new[j - 1], dp[j - 1] + (u[i - 1] == v[j - 1])
            )
        dp = new
    return dp[lb]


def test_kernels_match_brute():
    rng = np.random.default_rng(41)
    for _ in range(150):
        u = rng.integers(0, 8, size=rng.integers(0, 14))
        v = rng.integers(0, 8, size=rng.integers(0, 14))
        assert edit_distance_kernel(u, v) == _lev_brute(list(u), list(v))
        assert lcs_kernel(u, v) == _lcs_brute(list(u), list(v))


def test_kernel_identities():
    rng = np.random.default_rng(42)
    u = rng.integers(0, 50, size=20)
    v = rng.integers(0, 50, size=17)
    assert edit_distance_kernel(u, u) == 0
    assert lcs_kernel(u, u) == 20
    # symmetry
    assert edit_distance_kernel(u, v) == edit_distance_kernel(v, u)
    assert lcs_kernel(u, v) == lcs_kernel(v, u)
    # disjoint alphabets: every token substituted/inserted
    a = np.zeros(9, dtype=np.int64)
    b = np.ones(5, dtype=np.int64)
    assert edit_distance_kernel(a, b) == 9
    assert lcs_kernel(a, b) == 0
    # the classic link: for unit costs, edit >= max(n)-lcs and
    # edit <= n_a + n_b - 2*lcs
    e, c = edit_distance_kernel(u, v), lcs_kernel(u, v)
    assert max(20, 17) - c <= e <= 20 + 17 - 2 * c
    # empty sides
    empty = np.empty(0, dtype=np.int64)
    assert edit_distance_kernel(empty, v) == 17
    assert lcs_kernel(empty, v) == 0


def _pairs_df(spark, groups):
    rows = [(key, src, [int(x) for x in arr]) for key, src, arr in groups]
    return spark.createDataFrame(
        rows, "user string, source string, tokens array<int>"
    )


def test_operator_matches_kernels(spark):
    rng = np.random.default_rng(43)
    groups, series = [], {}
    for u in ("u1", "u2"):
        for s in ("a", "b", "c"):
            arr = rng.integers(0, 6, size=rng.integers(2, 28))
            groups.append((u, s, arr))
            series[(u, s)] = arr
    out = {
        (r["key"], r["src_a"], r["src_b"]): r
        for r in align_pairs(_pairs_df(spark, groups), max_len=64).collect()
    }
    assert len(out) == 2 * 3
    for (u, sa), ua in series.items():
        for (u2, sb), vb in series.items():
            if u2 != u or sa >= sb:
                continue
            r = out[(u, sa, sb)]
            ed = edit_distance_kernel(ua, vb)
            assert r["edit_dist"] == ed
            assert r["lcs_len"] == lcs_kernel(ua, vb)
            assert r["edit_sim"] == pytest.approx(
                1.0 - ed / max(len(ua), len(vb)), abs=0
            )


def test_operator_truncates_and_validates(spark):
    rng = np.random.default_rng(44)
    ua = rng.integers(0, 5, size=40)
    vb = rng.integers(0, 5, size=9)
    df = _pairs_df(spark, [("u", "a", ua), ("u", "b", vb)])
    r = align_pairs(df, max_len=6).collect()[0]
    assert (r["n_a"], r["n_b"]) == (6, 6)
    assert r["edit_dist"] == edit_distance_kernel(ua[:6], vb[:6])
    assert r["lcs_len"] == lcs_kernel(ua[:6], vb[:6])
    with pytest.raises(ValueError):
        align_pairs(df, max_len=0)


def test_operator_partition_invariant(spark):
    rng = np.random.default_rng(45)
    groups = [
        (f"u{i}", s, rng.integers(0, 7, size=rng.integers(1, 18)))
        for i in range(6)
        for s in ("a", "b")
    ]
    df = _pairs_df(spark, groups)
    base = sorted(map(tuple, align_pairs(df, max_len=16).collect()))
    shuffled = sorted(
        map(tuple, align_pairs(df.repartition(11), max_len=16).collect())
    )
    assert base == shuffled
