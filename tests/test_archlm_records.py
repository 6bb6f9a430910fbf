"""arch_lm / record_stats — value parity against numpy/bruteforce,
volatility-clustering and trend discrimination, guards."""

import math

import numpy as np
import pytest

from eristropy_spark.operators.randomtests import arch_lm, record_stats


def _tokens_df(spark, seqs: dict[str, list[int]]):
    rows = [(k, [int(x) for x in v], len(v), "src") for k, v in seqs.items()]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def _arch_local(x):
    s = np.diff(np.asarray(x, dtype=float)) ** 2
    u, v = s[:-1], s[1:]
    np_ = len(u)
    if np_ < 3 or u.var() == 0 or v.var() == 0:
        return np_, None, None
    r = np.corrcoef(u, v)[0, 1]
    return np_, r * r, np_ * r * r


def test_arch_lm_matches_numpy(spark):
    rng = np.random.default_rng(29)
    seqs = {
        f"d{i}": [int(x) for x in rng.integers(-5000, 5000,
                                               size=int(rng.integers(5, 40)))]
        for i in range(10)
    }
    out = {r["doc_id"]: r for r in arch_lm(_tokens_df(spark, seqs)).collect()}
    for k, v in seqs.items():
        np_, r2, lm = _arch_local(v)
        row = out[k]
        assert row["n_pairs"] == np_
        if r2 is None:
            assert row["r2"] is None and row["lm"] is None
        else:
            assert row["r2"] == pytest.approx(r2, rel=1e-9)
            assert row["lm"] == pytest.approx(lm, rel=1e-9)


def test_arch_lm_detects_volatility_clustering(spark):
    rng = np.random.default_rng(31)
    n = 400
    # ARCH(1): sigma_t^2 = 1 + 0.9 * d_{t-1}^2 — strongly clustered
    d = np.zeros(n)
    for t in range(1, n):
        d[t] = rng.standard_normal() * math.sqrt(1.0 + 0.9 * d[t - 1] ** 2)
    arch_x = np.cumsum(d * 100).astype(int)
    iid_x = np.cumsum(rng.standard_normal(n) * 100).astype(int)
    out = {r["doc_id"]: r for r in arch_lm(_tokens_df(spark, {
        "arch": list(arch_x), "iid": list(iid_x),
    })).collect()}
    # chi2(1) 99th percentile = 6.63: the ARCH series must reject hard,
    # the homoskedastic random walk must not
    assert out["arch"]["lm"] > 6.63
    assert out["iid"]["lm"] < 6.63


def test_arch_lm_guards(spark):
    out = {r["doc_id"]: r for r in arch_lm(_tokens_df(spark, {
        "short": [1, 2, 3, 4],        # n < 5 dropped
        "const": [3, 3, 3, 3, 3, 3],  # zero variance → NULL stats
    })).collect()}
    assert "short" not in out
    assert out["const"]["r2"] is None and out["const"]["lm"] is None


def _records_local(x):
    up = dn = 1
    mx = mn = x[0]
    for v in x[1:]:
        if v > mx:
            up += 1
            mx = v
        if v < mn:
            dn += 1
            mn = v
    return up, dn


def test_record_stats_matches_bruteforce(spark):
    rng = np.random.default_rng(37)
    seqs = {
        f"d{i}": [int(x) for x in rng.integers(-100, 100,
                                               size=int(rng.integers(2, 50)))]
        for i in range(10)
    }
    seqs["ties"] = [5, 5, 7, 7, 3, 3, 9, 1, 9, 1]
    out = {r["doc_id"]: r for r in
           record_stats(_tokens_df(spark, seqs)).collect()}
    for k, v in seqs.items():
        up, dn = _records_local(v)
        row = out[k]
        assert (row["n_up"], row["n_down"]) == (up, dn), k
        assert row["asym"] == up - dn
        assert row["rec_rate"] == pytest.approx(
            (up + dn) / (2 * len(v)), rel=1e-12
        )


def test_record_stats_trend_vs_noise(spark):
    rng = np.random.default_rng(41)
    n = 256
    out = {r["doc_id"]: r for r in record_stats(_tokens_df(spark, {
        "trend": list(range(n)),                       # every step a record
        "noise": [int(x) for x in rng.integers(-10**6, 10**6, size=n)],
    })).collect()}
    assert out["trend"]["n_up"] == n and out["trend"]["n_down"] == 1
    # iid: E[records] = H_256 ≈ 6.12 per side; allow a generous band
    h_n = sum(1.0 / k for k in range(1, n + 1))
    for side in ("n_up", "n_down"):
        assert out["noise"][side] < 4 * h_n
    assert abs(out["noise"]["asym"]) < n / 4
