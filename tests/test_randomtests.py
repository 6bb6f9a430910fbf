"""runs_test / turning_points / variance_ratio / kn_bigram_score —
local-recomputation parity, hand-pinned goldens, degenerate inputs,
partition invariance."""

import math
from collections import Counter

import numpy as np
import pytest

from eristropy_spark.operators.corpus import kn_bigram_score
from eristropy_spark.operators.randomtests import (
    runs_test,
    turning_points,
    variance_ratio,
)


def _tokens_df(spark, seqs: dict[str, list[int]]):
    return spark.createDataFrame(
        [(k, v) for k, v in seqs.items()], "doc_id string, tokens array<int>"
    )


def _runs_local(x: list[int]):
    s = sorted(x)
    n = len(s)
    med = (s[(n - 1) // 2] + s[n // 2]) / 2.0
    signs = [1 if v > med else -1 for v in x if v != med]
    m = len(signs)
    n1 = sum(1 for v in signs if v == 1)
    n2 = m - n1
    runs = (
        0
        if m == 0
        else 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    )
    a = 2.0 * n1 * n2
    z = None
    if n1 >= 1 and n2 >= 1 and a > m:
        e = 1.0 + a / m
        v = (a * (a - m)) / (m * m * (m - 1.0))
        z = (runs - e) / math.sqrt(v)
    return n1, n2, runs, z


def _tp_local(x: list[int]):
    d = [b - a for a, b in zip(x, x[1:])]
    tp = sum(1 for a, b in zip(d, d[1:]) if a * b < 0)
    n = len(x)
    if n < 3:
        return 0, None
    et = 2.0 * (n - 2.0) / 3.0
    vt = (16.0 * n - 29.0) / 90.0
    return tp, (tp - et) / math.sqrt(vt)


def _vr_local(x: list[int], q: int):
    n = len(x)
    t = n - 1
    if t <= q:
        return None, None
    d = np.diff(np.asarray(x, dtype=np.int64))
    mu = (x[-1] - x[0]) / t
    ssd = float((d * d).sum()) - mu * float(d.sum())
    if ssd <= 0:
        return None, None
    y = np.asarray(x[q:], dtype=np.int64) - np.asarray(x[:-q], dtype=np.int64)
    qmu = q * mu
    nq = t - q + 1.0
    ssy = float((y * y).sum()) - 2.0 * qmu * float(y.sum()) + nq * qmu * qmu
    mden = q * nq * (1.0 - q / t)
    vr = (ssy / mden) / (ssd / (t - 1.0))
    z = (
        math.sqrt(t)
        * (vr - 1.0)
        / math.sqrt(2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q))
    )
    return vr, z


# ------------------------------------------------------------ runs_test


def test_runs_matches_local(spark):
    rng = np.random.default_rng(11)
    seqs = {
        f"d{i}": [int(v) for v in rng.integers(0, 9, size=rng.integers(4, 50))]
        for i in range(10)
    }
    out = {r["doc_id"]: r for r in runs_test(_tokens_df(spark, seqs)).collect()}
    for k, x in seqs.items():
        n1, n2, runs, z = _runs_local(x)
        r = out[k]
        assert (r["n"], r["n1"], r["n2"], r["runs"]) == (len(x), n1, n2, runs)
        if z is None:
            assert r["z"] is None
        else:
            assert r["z"] == pytest.approx(z, abs=1e-12)


def test_runs_alternating_and_constant(spark):
    seqs = {
        "alt": [0, 5, 0, 5, 0, 5, 0, 5],  # maximal runs, z > 0
        "blocky": [0, 0, 0, 0, 5, 5, 5, 5],  # 2 runs, z < 0
        "const": [3, 3, 3, 3],  # all values == median -> degenerate
        "single": [7],
    }
    out = {r["doc_id"]: r for r in runs_test(_tokens_df(spark, seqs)).collect()}
    assert out["alt"]["runs"] == 8 and out["alt"]["z"] > 0
    assert out["blocky"]["runs"] == 2 and out["blocky"]["z"] < 0
    assert out["const"]["n1"] == 0 and out["const"]["runs"] == 0
    assert out["const"]["z"] is None
    assert out["single"]["z"] is None


# -------------------------------------------------------- turning_points


def test_turning_points_matches_local(spark):
    rng = np.random.default_rng(12)
    seqs = {
        f"d{i}": [int(v) for v in rng.integers(0, 7, size=rng.integers(1, 40))]
        for i in range(10)
    }
    out = {
        r["doc_id"]: r for r in turning_points(_tokens_df(spark, seqs)).collect()
    }
    for k, x in seqs.items():
        tp, z = _tp_local(x)
        r = out[k]
        assert (r["n"], r["tp"]) == (len(x), tp)
        if z is None:
            assert r["z"] is None
        else:
            assert r["z"] == pytest.approx(z, abs=1e-12)


def test_turning_points_ties_never_count(spark):
    seqs = {
        "plateau": [1, 2, 2, 1],  # zero-slope step kills both products
        "peak": [1, 3, 1],
        "mono": [1, 2, 3, 4, 5],
    }
    out = {
        r["doc_id"]: r for r in turning_points(_tokens_df(spark, seqs)).collect()
    }
    assert out["plateau"]["tp"] == 0
    assert out["peak"]["tp"] == 1
    assert out["mono"]["tp"] == 0 and out["mono"]["z"] < 0


# -------------------------------------------------------- variance_ratio


def test_variance_ratio_matches_local(spark):
    rng = np.random.default_rng(13)
    seqs = {
        f"d{i}": [int(v) for v in rng.integers(0, 30, size=rng.integers(8, 60))]
        for i in range(10)
    }
    out = {
        r["doc_id"]: r
        for r in variance_ratio(_tokens_df(spark, seqs), q=4).collect()
    }
    for k, x in seqs.items():
        vr, z = _vr_local(x, 4)
        r = out[k]
        if vr is None:
            assert r["vr"] is None and r["z"] is None
        else:
            assert r["vr"] == pytest.approx(vr, abs=1e-12)
            assert r["z"] == pytest.approx(z, abs=1e-12)


def test_variance_ratio_discriminates(spark):
    rng = np.random.default_rng(14)
    steps = rng.integers(-3, 4, size=400)
    walk = [int(v) for v in np.cumsum(steps)]  # momentum-free walk: vr ~ 1
    noise = [int(v) for v in rng.integers(0, 50, size=400)]  # mean-reverting
    trend = [int(3 * i + rng.integers(0, 2)) for i in range(400)]
    out = {
        r["doc_id"]: r
        for r in variance_ratio(
            _tokens_df(spark, {"walk": walk, "noise": noise, "trend": trend}),
            q=4,
        ).collect()
    }
    assert abs(out["walk"]["vr"] - 1.0) < 0.5
    assert out["noise"]["vr"] < 0.6  # i.i.d. level series -> VR << 1
    assert out["trend"]["z"] is not None


def test_variance_ratio_guards(spark):
    with pytest.raises(ValueError, match="q must be"):
        variance_ratio(_tokens_df(spark, {"a": [1, 2]}), q=1)
    out = {
        r["doc_id"]: r
        for r in variance_ratio(
            _tokens_df(spark, {"short": [1, 2, 3, 4, 5], "const": [2] * 20}),
            q=4,
        ).collect()
    }
    assert out["short"]["vr"] is None  # T = 4 == q -> undefined
    assert out["const"]["vr"] is None  # ssd = 0


def test_randomtests_partition_invariance(spark):
    rng = np.random.default_rng(15)
    seqs = {
        f"d{i}": [int(v) for v in rng.integers(0, 11, size=30)] for i in range(12)
    }
    df1 = _tokens_df(spark, seqs).coalesce(1)
    df8 = _tokens_df(spark, seqs).repartition(8)
    for op in (runs_test, turning_points, lambda d: variance_ratio(d, q=4)):
        a = sorted(map(tuple, op(df1).collect()))
        b = sorted(map(tuple, op(df8).collect()))
        assert a == b  # bit-identical across partitionings


# ------------------------------------------------------- kn_bigram_score


def _kn_local(docs: dict[str, str], d: float = 0.75):
    bigrams = {
        k: list(zip(v.split(" "), v.split(" ")[1:])) for k, v in docs.items()
    }
    c12 = Counter(b for bs in bigrams.values() for b in bs)
    c1 = Counter()
    n1r = Counter()
    n1l = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1r[w1] += 1
        n1l[w2] += 1
    b_total = float(len(c12))
    out = {}
    for k, bs in bigrams.items():
        if not bs:
            out[k] = (0, 0, None, None)
            continue
        slp = 0.0
        for (w1, w2), cnt in Counter(bs).items():
            p = (c12[(w1, w2)] - d + d * n1r[w1] * n1l[w2] / b_total) / c1[w1]
            slp += cnt * math.log(p)
        logp = slp / len(bs)
        out[k] = (len(bs), len(Counter(bs)), logp, math.exp(-logp))
    return out


def test_kn_bigram_matches_local(spark):
    docs = {
        "a": "the cat sat on the mat",
        "b": "the dog sat on the log",
        "c": "a cat and a dog",
        "d": "the the the the",
        "e": "single",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id string, text string"
    )
    out = {r["doc_id"]: r for r in kn_bigram_score(df).collect()}
    local = _kn_local(docs)
    for k, (nb, nt, logp, ppl) in local.items():
        r = out[k]
        assert (r["n_bigrams"], r["n_types"]) == (nb, nt)
        if logp is None:
            assert r["logp"] is None and r["ppl"] is None
        else:
            assert r["logp"] == pytest.approx(logp, abs=1e-9)
            assert r["ppl"] == pytest.approx(ppl, rel=1e-9)


def test_kn_bigram_probability_simplex(spark):
    """For a fixed context w1, KN probabilities over observed w2 plus
    the continuation mass must not exceed 1 (discount frees mass)."""
    docs = {
        "a": "x y x z x y",
        "b": "y z y x",
        "c": "z x z y z z",
    }
    local = _kn_local(docs)
    # typical docs score finite, repeated-transition docs differ
    assert all(v[2] is not None for v in local.values())
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id string, text string"
    )
    rows = kn_bigram_score(df).collect()
    assert all(r["ppl"] > 1.0 for r in rows)


def test_kn_bigram_validates_discount(spark):
    df = spark.createDataFrame([("a", "x y")], "doc_id string, text string")
    with pytest.raises(ValueError, match="discount"):
        kn_bigram_score(df, discount=1.0)
    with pytest.raises(ValueError, match="discount"):
        kn_bigram_score(df, discount=0.0)
