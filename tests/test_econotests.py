"""kpss / durbin_watson — value parity against numpy, directional
discrimination (random walk vs white noise), degenerate-series guards."""

import numpy as np
import pytest

from eristropy_spark.operators.econotests import durbin_watson, kpss


def _tokens_df(spark, seqs: dict[str, list[int]]):
    rows = [(k, [int(x) for x in v], len(v), "src") for k, v in seqs.items()]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def _kpss_local(x):
    x = np.asarray(x, dtype=float)
    n = len(x)
    e = x - x.mean()
    s = e.cumsum()
    lag = int(np.floor(4.0 * (n / 100.0) ** 0.25))
    lrv = (e * e).sum() / n
    for j in range(1, lag + 1):
        lrv += 2.0 * (1.0 - j / (lag + 1.0)) * (e[:-j] * e[j:]).sum() / n
    if lrv <= 0:
        return lag, None
    return lag, (s * s).sum() / (n * n * lrv)


def _dw_local(x):
    x = np.asarray(x, dtype=float)
    e = x - x.mean()
    den = (e * e).sum()
    if den == 0:
        return None
    return (np.diff(x) ** 2).sum() / den


def test_kpss_matches_numpy(spark):
    rng = np.random.default_rng(47)
    seqs = {}
    for i in range(8):
        n = int(rng.integers(5, 120))
        raw = rng.integers(-5000, 5000, size=n)
        seqs[f"d{i}"] = [int(v) for v in (raw.cumsum() if i % 2 else raw)]
    out = {r["doc_id"]: r for r in kpss(_tokens_df(spark, seqs)).collect()}
    for k, v in seqs.items():
        lag, eta = _kpss_local(v)
        row = out[k]
        assert row["bandwidth"] == lag
        assert row["n"] == len(v)
        if eta is None:
            assert row["eta"] is None
        else:
            assert row["eta"] == pytest.approx(eta, rel=1e-9)
            assert row["reject_5pct"] == (row["eta"] > 0.463)


def test_kpss_discriminates_walk_from_noise(spark):
    rng = np.random.default_rng(53)
    noise = [int(v) for v in rng.integers(-100, 100, size=400)]
    walk = [int(v) for v in rng.integers(-100, 100, size=400).cumsum()]
    out = {
        r["doc_id"]: r
        for r in kpss(_tokens_df(spark, {"noise": noise, "walk": walk})).collect()
    }
    # white noise is level-stationary (fail to reject); a random walk is not
    assert not out["noise"]["reject_5pct"]
    assert out["walk"]["reject_5pct"]
    assert out["walk"]["eta"] > out["noise"]["eta"]


def test_kpss_guards(spark):
    out = kpss(
        _tokens_df(spark, {"const": [7] * 30, "short": [1, 2, 3, 4]})
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert "short" not in rows  # below min_n=5
    assert rows["const"]["eta"] is None
    assert rows["const"]["reject_5pct"] is None


def test_durbin_watson_matches_numpy(spark):
    rng = np.random.default_rng(59)
    seqs = {
        f"d{i}": [
            int(v)
            for v in rng.integers(-5000, 5000, size=int(rng.integers(2, 80)))
        ]
        for i in range(10)
    }
    out = {
        r["doc_id"]: r for r in durbin_watson(_tokens_df(spark, seqs)).collect()
    }
    for k, v in seqs.items():
        ref = _dw_local(v)
        row = out[k]
        assert row["n"] == len(v)
        if ref is None:
            assert row["dw"] is None and row["rho1"] is None
        else:
            assert row["dw"] == pytest.approx(ref, rel=1e-9)
            assert row["rho1"] == pytest.approx(1.0 - ref / 2.0, rel=1e-9)


def test_durbin_watson_direction(spark):
    rng = np.random.default_rng(61)
    # positively autocorrelated (random walk) -> DW << 2;
    # alternating series -> DW ~ 4; white noise -> DW ~ 2
    walk = [int(v) for v in rng.integers(-50, 50, size=500).cumsum()]
    alt = [1000 * (-1) ** i for i in range(500)]
    noise = [int(v) for v in rng.integers(-1000, 1000, size=500)]
    out = {
        r["doc_id"]: r
        for r in durbin_watson(
            _tokens_df(spark, {"walk": walk, "alt": alt, "noise": noise})
        ).collect()
    }
    assert out["walk"]["dw"] < 1.0
    assert out["alt"]["dw"] > 3.5
    assert 1.5 < out["noise"]["dw"] < 2.5


def test_durbin_watson_constant_is_null(spark):
    out = durbin_watson(_tokens_df(spark, {"c": [3, 3, 3, 3]})).collect()
    assert out[0]["dw"] is None
