"""Haar wavelet entropy — exact-spectrum parity with a literal Haar
implementation, octave localization of planted cycles, Parseval-style
energy accounting, degenerate inputs, partition invariance."""

import math

import numpy as np
import pytest

from eristropy_spark.operators.wavelet import haar_spectrum, wavelet_entropy


def _haar_naive(x, max_level=12):
    """Literal per-block double loop."""
    x = [int(v) for v in x]
    n = len(x)
    out = []
    k = 1
    while (1 << k) <= n and k <= max_level:
        size = 1 << k
        half = size // 2
        e = 0
        for b in range(n // size):
            blk = x[b * size : (b + 1) * size]
            d = sum(blk[:half]) - sum(blk[half:])
            e += d * d
        out.append((k, e, e / size))
        k += 1
    return out


def test_haar_spectrum_matches_naive():
    rng = np.random.default_rng(0)
    for n in (2, 3, 17, 64, 100, 257):
        x = rng.integers(-1000, 1000, n)
        assert haar_spectrum(x) == _haar_naive(x)


def test_wavelet_localizes_planted_cycle(spark):
    # a square wave of period 8 concentrates energy at level 3
    # (blocks of 8 = one full cycle; the half-difference is maximal
    # at the octave matching the half-period alignment)
    t = np.arange(256)
    square = np.where((t // 4) % 2 == 0, 100, -100)
    rng = np.random.default_rng(1)
    noise = rng.integers(-100, 100, 256)
    df = spark.createDataFrame(
        [("square", [int(v) for v in square]),
         ("noise", [int(v) for v in noise])],
        "doc_id string, tokens array<int>",
    )
    got = {r["doc_id"]: r for r in wavelet_entropy(df).collect()}
    assert got["square"]["dominant_level"] == 3
    assert got["square"]["p_dominant"] > 0.95
    # noise spreads energy: entropy well above the rhythm's
    assert got["noise"]["h_wavelet"] > got["square"]["h_wavelet"] + 0.5
    assert got["noise"]["n_levels"] == 8


def test_wavelet_entropy_matches_local(spark):
    rng = np.random.default_rng(2)
    rows = [(f"d{i}", [int(v) for v in rng.integers(0, 50, 90)])
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r for r in wavelet_entropy(df).collect()}
    for doc_id, toks in rows:
        spec = _haar_naive(toks)
        total = 0.0
        for _, _, e in spec:
            total += e
        h = 0.0
        for _, _, e in spec:
            p = e / total
            if p > 0:
                h += p * math.log(p)
        assert got[doc_id]["h_wavelet"] == pytest.approx(-h, abs=1e-6)
        assert got[doc_id]["n_levels"] == len(spec)


def test_wavelet_degenerate(spark):
    df = spark.createDataFrame(
        [("const", [7] * 40), ("one", [3]), ("two", [1, 5])],
        "doc_id string, tokens array<int>",
    )
    got = {r["doc_id"]: r for r in wavelet_entropy(df).collect()}
    assert got["const"]["h_wavelet"] is None  # zero detail energy
    assert got["const"]["n_levels"] == 5
    assert got["one"]["n_levels"] == 0 and got["one"]["h_wavelet"] is None
    # n=2: single level, a lone energy bin -> H = 0, p = 1
    assert got["two"]["h_wavelet"] == 0.0
    assert got["two"]["p_dominant"] == 1.0


def test_wavelet_partition_invariance(spark):
    rng = np.random.default_rng(3)
    rows = [(f"d{i}", [int(v) for v in rng.integers(0, 99, 70)])
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    a = {r["doc_id"]: r for r in wavelet_entropy(df.repartition(1)).collect()}
    b = {r["doc_id"]: r for r in wavelet_entropy(df.repartition(7)).collect()}
    for k in a:
        assert a[k] == b[k]
