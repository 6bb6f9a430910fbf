"""multiscale_entropy — independent local recomputation (classic
double-loop SampEn over mean-coarse-grained z-values), Costa-curve
properties, degenerate inputs."""

import math

import numpy as np
import pytest

from eristropy_spark.operators.mse import mse_one, multiscale_entropy


def _tokens_df(spark, seqs: dict[str, list[int]]):
    return spark.createDataFrame(
        [(k, v) for k, v in seqs.items()], "doc_id string, tokens array<int>"
    )


def _classic_mse(x: list[int], scales, m=2, r=0.2):
    """Textbook formulation: z-norm once (ddof=1), coarse-grain by
    mean, count template matches with an explicit double loop."""
    z = np.asarray(x, dtype=np.float64)
    sd = z.std(ddof=1) if len(z) >= 2 else 0.0
    out = {}
    for s in scales:
        nc = len(z) // s
        if nc < m + 1 or sd == 0:
            out[s] = (nc, 0, 0, None)
            continue
        c = z[: nc * s].reshape(nc, s).mean(axis=1)
        c = (c - z.mean()) / sd
        b = a = 0
        for i in range(nc - 1):
            for j in range(i + 1, nc - 1):
                if abs(c[i] - c[j]) < r:
                    b += 1
                    if abs(c[i + 1] - c[j + 1]) < r:
                        a += 1
        se = -math.log(a / b) if a > 0 and b > 0 else None
        out[s] = (nc, b, a, se)
    return out


def test_mse_one_matches_classic():
    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(8, 200))
        x = rng.integers(0, 1000, size=n).astype(np.int64)
        got = {s: (nc, b, a, se) for s, nc, b, a, se in mse_one(x, (1, 2, 3, 4))}
        want = _classic_mse([int(v) for v in x], (1, 2, 3, 4))
        for s in (1, 2, 3, 4):
            nc_g, b_g, a_g, se_g = got[s]
            nc_w, b_w, a_w, se_w = want[s]
            assert (nc_g, b_g, a_g) == (nc_w, b_w, a_w), (s, n)
            if se_w is None:
                assert se_g is None
            else:
                assert se_g == pytest.approx(se_w, rel=1e-9)


def test_mse_white_noise_curve_decreases():
    # Costa 2002: for white noise the MSE curve falls with scale
    rng = np.random.default_rng(42)
    x = rng.integers(0, 10000, size=4000).astype(np.int64)
    rows = {s: se for s, nc, b, a, se in mse_one(x, (1, 2, 4, 8))}
    assert rows[1] > rows[2] > rows[4] > rows[8] > 0


def test_mse_spark_matches_kernel(spark):
    rng = np.random.default_rng(9)
    seqs = {
        f"d{i}": [int(v) for v in rng.integers(0, 500, size=int(rng.integers(5, 80)))]
        for i in range(12)
    }
    seqs["const"] = [7] * 30
    seqs["short"] = [1, 2]
    out = multiscale_entropy(
        _tokens_df(spark, seqs), scales=(1, 2, 3)
    ).collect()
    got = {(r["doc_id"], r["scale"]): r for r in out}
    assert len(got) == len(seqs) * 3
    for k, x in seqs.items():
        for s, nc, b, a, se in mse_one(np.asarray(x, dtype=np.int64), (1, 2, 3)):
            r = got[(k, s)]
            assert (r["n_coarse"], r["b_cnt"], r["a_cnt"]) == (nc, b, a)
            if se is None:
                assert r["sampen"] is None
            else:
                assert r["sampen"] == pytest.approx(se, rel=1e-12)


def test_mse_degenerate(spark):
    out = multiscale_entropy(
        _tokens_df(spark, {"const": [3] * 20, "one": [5]}), scales=(1, 2)
    ).collect()
    for r in out:
        assert r["sampen"] is None and r["b_cnt"] == 0 and r["a_cnt"] == 0


def test_mse_validates_params(spark):
    df = _tokens_df(spark, {"a": [1, 2, 3]})
    with pytest.raises(ValueError):
        multiscale_entropy(df, scales=())
    with pytest.raises(ValueError):
        multiscale_entropy(df, scales=(0, 1))
    with pytest.raises(ValueError):
        multiscale_entropy(df, m=3)
