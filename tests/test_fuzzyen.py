"""FuzzyEn (Chen et al. 2007) — naive-definition parity fuzz,
regularity discrimination, offset invariance (the baseline-removal
property), degenerate/validation cases, operator partition
invariance."""

import math

import numpy as np
import pytest

from eristropy_spark.kernels.fuzzyen import fuzzyen, fuzzyen_znormed
from eristropy_spark.operators.fuzzyen import fuzzyen_points


def _fuzzyen_naive(x, m=2, r=0.2):
    """Literal double-loop published definition with the same 9-dp
    membership grid (the quantization is part of the pinned
    semantics)."""
    x = np.asarray(x, dtype=float)
    n = x.size
    nt = n - m
    if nt < 2:
        return float("nan")

    def phi(k):
        u = []
        for i in range(nt):
            w = x[i : i + k]
            u.append(w - w.mean())
        s = 0
        for i in range(nt):
            for j in range(nt):
                if i == j:
                    continue
                d = float(np.max(np.abs(u[i] - u[j])))
                s += int(math.floor(math.exp(-(d * d) / r) * 1e9 + 0.5))
        return (float(s) / 1e9) / float(nt * (nt - 1))

    return math.log(phi(m)) - math.log(phi(m + 1))


def test_fuzzyen_matches_naive_fuzz():
    rng = np.random.default_rng(0)
    for trial in range(8):
        n = int(rng.integers(8, 40))
        x = rng.normal(0, 1, n)
        got = fuzzyen(x, m=2, r=0.2)
        want = _fuzzyen_naive(x, m=2, r=0.2)
        assert got == pytest.approx(want, abs=1e-9), f"trial {trial}"


def test_fuzzyen_m3_matches_naive():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 30)
    assert fuzzyen(x, m=3, r=0.15) == pytest.approx(
        _fuzzyen_naive(x, m=3, r=0.15), abs=1e-9
    )


def test_fuzzyen_discriminates_regularity():
    rng = np.random.default_rng(2)
    t = np.arange(200, dtype=float)
    sine = np.sin(2 * math.pi * t / 20)
    noise = rng.normal(0, 1, 200)
    assert fuzzyen_znormed(sine) < 0.6
    assert fuzzyen_znormed(noise) > 1.0
    assert fuzzyen_znormed(sine) < fuzzyen_znormed(noise)


def test_fuzzyen_offset_invariance():
    # template centering: a constant offset never reaches the distance,
    # even without z-normalization
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 60)
    assert fuzzyen(x + 5.0) == fuzzyen(x)


def test_fuzzyen_degenerate_and_validation():
    assert math.isnan(fuzzyen(np.array([1.0, 2.0, 3.0])))  # n < m+2
    assert math.isnan(fuzzyen_znormed(np.ones(50)))  # constant
    with pytest.raises(ValueError, match="m must be >= 2"):
        fuzzyen(np.arange(10.0), m=1)
    with pytest.raises(ValueError, match="r must be > 0"):
        fuzzyen(np.arange(10.0), r=0.0)


def test_fuzzyen_points_partition_invariance(spark):
    rng = np.random.default_rng(4)
    rows = [
        (f"d{i}", [int(x) for x in rng.integers(0, 50, 40)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    a = {
        r["doc_id"]: r["fuzzyen"]
        for r in fuzzyen_points(df.repartition(1)).collect()
    }
    b = {
        r["doc_id"]: r["fuzzyen"]
        for r in fuzzyen_points(df.repartition(5)).collect()
    }
    assert a == b
    # and the operator agrees with the kernel bit-for-bit
    for doc_id, toks in rows:
        want = fuzzyen_znormed(np.array(toks, dtype=float))
        if math.isnan(want):
            assert a[doc_id] is None
        else:
            assert a[doc_id] == want
