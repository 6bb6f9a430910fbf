"""Bubble entropy (Manis et al. 2017) — naive-definition parity,
scale/shift invariance (the rank-arithmetic property), regularity
discrimination, degenerate/validation, operator ≡ kernel."""

import math
from collections import Counter

import numpy as np
import pytest

from eristropy_spark.kernels.bubble import bubble_entropy, swap_renyi2
from eristropy_spark.operators.bubble import bubble_points


def _swap_renyi2_naive(x, k):
    counts = Counter()
    for i in range(len(x) - k + 1):
        w = x[i : i + k]
        swaps = sum(
            1
            for a in range(k)
            for b in range(a + 1, k)
            if w[a] > w[b]
        )
        counts[swaps] += 1
    nw = len(x) - k + 1
    s2 = sum(c * c for c in counts.values())
    return -math.log(s2 / (nw * nw))


def test_swap_renyi2_matches_naive():
    rng = np.random.default_rng(0)
    for n in (6, 17, 50, 120):
        x = rng.normal(0, 1, n)
        for k in (3, 4, 5):
            assert swap_renyi2(x, k) == pytest.approx(
                _swap_renyi2_naive(list(x), k), abs=1e-12
            )


def test_bubble_matches_naive():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 80)
    want = (_swap_renyi2_naive(list(x), 5) - _swap_renyi2_naive(list(x), 4)) / math.log(5 / 3)
    assert bubble_entropy(x, m=4) == pytest.approx(want, abs=1e-12)


def test_bubble_scale_and_shift_invariance():
    # rank arithmetic: affine maps with positive slope never change it
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 100)
    assert bubble_entropy(x) == bubble_entropy(3.7 * x + 100.0)


def test_bubble_discriminates_regularity():
    rng = np.random.default_rng(3)
    t = np.arange(300, dtype=float)
    sine = np.sin(2 * math.pi * t / 30)
    noise = rng.normal(0, 1, 300)
    assert bubble_entropy(sine) < bubble_entropy(noise)
    # a monotone ramp has ONE swap profile per window: zero entropy at
    # both dimensions
    ramp = np.arange(50, dtype=float)
    assert swap_renyi2(ramp, 4) == 0.0
    assert bubble_entropy(ramp) == 0.0


def test_bubble_degenerate_and_validation():
    assert math.isnan(bubble_entropy(np.arange(4.0), m=4))  # n < m+1
    with pytest.raises(ValueError, match="m must be >= 2"):
        bubble_entropy(np.arange(10.0), m=1)


def test_bubble_points_matches_kernel(spark):
    rng = np.random.default_rng(4)
    rows = [
        (f"d{i}", [int(v) for v in rng.integers(0, 50, 40)])
        for i in range(10)
    ] + [("short", [1, 2, 3, 4])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r for r in bubble_points(df.repartition(3), m=4).collect()}
    for doc_id, toks in rows:
        x = np.asarray(toks, dtype=float)
        if len(toks) < 5:
            assert got[doc_id]["bubble"] is None
            assert got[doc_id]["h_m"] is None
        else:
            assert got[doc_id]["h_m"] == swap_renyi2(x, 4)
            assert got[doc_id]["bubble"] == bubble_entropy(x, m=4)
