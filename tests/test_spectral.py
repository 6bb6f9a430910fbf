"""Walsh–Hadamard spectral entropy — exact-coefficient parity with a
literal O(n'²) transform, Walsh-tone localization, white-noise spread,
Parseval accounting, overflow slow-path equivalence, degenerate
inputs, partition invariance."""

import math

import numpy as np
import pytest

from eristropy_spark.operators.spectral import spectral_entropy_wht, wht_spectrum


def _wht_naive(x, max_log2=12):
    """Literal definition: c_j = Σ_i (-1)^popcount(i&j) x_i."""
    x = [int(v) for v in x]
    n = len(x)
    if n < 2:
        return []
    lg = min(n.bit_length() - 1, max_log2)
    np_ = 1 << lg
    out = []
    for j in range(1, np_):
        c = sum(-v if bin(i & j).count("1") % 2 else v
                for i, v in enumerate(x[:np_]))
        out.append((j, c * c))
    return out


def test_wht_matches_naive():
    rng = np.random.default_rng(0)
    for n in (2, 3, 17, 64, 100, 257):
        x = rng.integers(-1000, 1000, n)
        assert wht_spectrum(x) == _wht_naive(x)


def test_wht_overflow_slow_path_matches_fast():
    # n'·max|x| ≥ 2^62 forces the object-int butterfly; equality with
    # the naive transform proves the slow path is the same transform
    big = 2**60
    x = [big, -big, big // 3, -big // 7, big, big, -big, 0]
    assert wht_spectrum(x) == _wht_naive(x)
    # and the fast path on the scaled-down twin agrees structurally
    small = [v >> 40 for v in x]
    assert wht_spectrum(small) == _wht_naive(small)


def test_wht_parseval():
    # Σ_j c_j² (including DC) = n' · Σ x_i² over the prefix
    rng = np.random.default_rng(1)
    x = rng.integers(-500, 500, 64)
    spec = dict(wht_spectrum(x))
    dc = int(x.sum()) ** 2
    assert dc + sum(spec.values()) == 64 * int((x.astype(object) ** 2).sum())


def test_wht_localizes_walsh_tone(spark):
    # a pure Walsh function w_j (±1 pattern of popcount(i&j)) has ALL
    # its AC power at index j
    n = 128
    j_star = 21
    tone = [100 * (1 if bin(i & j_star).count("1") % 2 == 0 else -1)
            for i in range(n)]
    rng = np.random.default_rng(2)
    noise = rng.integers(-100, 100, n)
    df = spark.createDataFrame(
        [("tone", tone), ("noise", [int(v) for v in noise])],
        "doc_id string, tokens array<int>",
    )
    got = {r["doc_id"]: r for r in spectral_entropy_wht(df).collect()}
    assert got["tone"]["dominant_j"] == j_star
    assert got["tone"]["p_dominant"] == pytest.approx(1.0)
    assert got["tone"]["h_spectral"] == pytest.approx(0.0, abs=1e-12)
    # white noise spreads power: per-coefficient power is ~χ²₁, which
    # sits the entropy a constant below ln(n'-1) — still far above any
    # concentrated spectrum
    assert got["noise"]["h_spectral"] > 0.8 * math.log(n - 1)
    assert got["noise"]["p_dominant"] < 0.2
    assert got["noise"]["n_fft"] == n


def test_spectral_degenerate_inputs(spark):
    df = spark.createDataFrame(
        [("empty", []), ("one", [5]), ("const", [7] * 16),
         ("two", [3, 9])],
        "doc_id string, tokens array<int>",
    )
    got = {r["doc_id"]: r for r in spectral_entropy_wht(df).collect()}
    assert got["empty"]["n"] == 0 and got["empty"]["h_spectral"] is None
    assert got["one"]["n_fft"] == 1 and got["one"]["h_spectral"] is None
    # constant prefix: zero AC power → NULL stats, n_fft still reported
    assert got["const"]["n_fft"] == 16 and got["const"]["h_spectral"] is None
    # n=2: single coefficient, entropy exactly 0, dominant_j = 1
    assert got["two"]["n_fft"] == 2
    assert got["two"]["h_spectral"] == pytest.approx(0.0)
    assert got["two"]["dominant_j"] == 1 and got["two"]["p_dominant"] == 1.0


def test_spectral_partition_invariance(spark):
    rng = np.random.default_rng(3)
    rows = [(f"d{i}", [int(v) for v in rng.integers(-1000, 1000, ln)])
            for i, ln in enumerate([2, 5, 33, 64, 100, 257, 513])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    a = {tuple(r) for r in spectral_entropy_wht(df.repartition(1)).collect()}
    b = {tuple(r) for r in spectral_entropy_wht(df.repartition(13)).collect()}
    assert a == b


def test_spectral_matches_local(spark):
    rng = np.random.default_rng(4)
    rows = [(f"d{i}", [int(v) for v in rng.integers(-100, 100, ln)])
            for i, ln in enumerate([8, 31, 70])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r for r in spectral_entropy_wht(df).collect()}
    for doc_id, toks in rows:
        spec = _wht_naive(toks)
        total = sum(e for _, e in spec)
        h = -sum((e / total) * math.log(e / total)
                 for _, e in spec if e > 0)
        j_best, e_best = min(spec, key=lambda t: (-t[1], t[0]))
        r = got[doc_id]
        assert r["h_spectral"] == pytest.approx(h, rel=1e-12)
        assert r["dominant_j"] == j_best
        assert r["p_dominant"] == pytest.approx(e_best / total, rel=1e-12)
