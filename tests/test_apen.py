"""ApEn kernel (Pincus 1991) — naive-definition parity fuzz, published
properties, degenerate inputs, and the Spark projection's partition
invariance."""

import math

import numpy as np
import pytest

from eristropy_spark.kernels.apen import apen, apen_znormed
from eristropy_spark.operators.apen import apen_points


def _apen_naive(x, m, r):
    """Literal textbook definition (O(n^2 m) loops) — the independent
    cross-check for the vectorized kernel."""
    n = len(x)
    if n < m + 2:
        return float("nan")

    def phi(mm):
        nw = n - mm + 1
        acc = 0.0
        for i in range(nw):
            c = 0
            for j in range(nw):
                if max(abs(x[i + k] - x[j + k]) for k in range(mm)) <= r:
                    c += 1
            acc += math.log(c / nw)
        return acc / nw

    return phi(m) - phi(m + 1)


def test_apen_matches_naive_definition():
    rng = np.random.default_rng(4)
    for n in (5, 12, 37, 80):
        for m in (1, 2):
            x = np.round(rng.normal(size=n) * 50)
            got = apen(x, m=m, r=10.0)
            want = _apen_naive(list(x), m, 10.0)
            assert got == pytest.approx(want, abs=1e-12), (n, m)


def test_apen_regular_vs_random():
    rng = np.random.default_rng(8)
    t = np.arange(400, dtype=np.float64)
    sine = np.sin(2 * np.pi * t / 40)
    noise = rng.normal(size=400)
    assert apen_znormed(sine, m=2, r=0.2) < apen_znormed(noise, m=2, r=0.2)


def test_apen_degenerate_and_validation():
    assert math.isnan(apen(np.array([1.0, 2.0]), m=1))
    assert math.isnan(apen_znormed(np.full(20, 3.0)))
    with pytest.raises(ValueError, match="m must"):
        apen(np.arange(10.0), m=0)
    with pytest.raises(ValueError, match="r must"):
        apen(np.arange(10.0), r=-0.1)


def test_apen_points_partition_invariance(spark):
    rng = np.random.default_rng(6)
    seqs = {f"d{i}": [float(v) for v in np.round(rng.normal(size=30) * 100)]
            for i in range(10)}
    seqs["short"] = [1.0, 2.0]
    seqs["flat"] = [5.0] * 15
    df = spark.createDataFrame(
        [(k, v) for k, v in seqs.items()], "doc_id string, tokens array<double>"
    )
    a = {r["doc_id"]: (r["n"], r["apen"])
         for r in apen_points(df.repartition(1)).collect()}
    b = {r["doc_id"]: (r["n"], r["apen"])
         for r in apen_points(df.repartition(5)).collect()}
    assert a == b
    assert a["short"] == (2, None)
    assert a["flat"] == (15, None)
    for k, v in seqs.items():
        if k in ("short", "flat"):
            continue
        want = apen_znormed(np.asarray(v), m=1, r=0.2)
        assert a[k][1] == pytest.approx(want, abs=1e-12)
