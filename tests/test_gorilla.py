"""Gorilla codec round-trip property tests (token-array-equality invariant)."""

import numpy as np
import pytest

from eristropy_spark.kernels.gorilla import (
    decode_floats,
    decode_ints,
    encode_floats,
    encode_ints,
)


@pytest.mark.parametrize(
    "x",
    [
        np.array([], dtype=np.float64),
        np.array([3.14]),
        np.zeros(100),
        np.full(50, 12.5),
        np.linspace(-5, 5, 257),
        np.random.default_rng(17).normal(size=1000),
        np.array([1.0, np.inf, -np.inf, 0.0, -0.0]),
        np.random.default_rng(3).uniform(-1e18, 1e18, size=200),
    ],
    ids=["empty", "single", "zeros", "const", "linspace", "normal", "inf", "huge"],
)
def test_float_roundtrip(x):
    got = decode_floats(encode_floats(x))
    np.testing.assert_array_equal(got, x)


def test_float_nan_roundtrip():
    x = np.array([1.0, np.nan, 2.0])
    got = decode_floats(encode_floats(x))
    assert np.isnan(got[1]) and got[0] == 1.0 and got[2] == 2.0


@pytest.mark.parametrize(
    "x",
    [
        np.array([], dtype=np.int64),
        np.array([42], dtype=np.int64),
        np.arange(1000, dtype=np.int64),  # constant delta => all dod=0
        np.array([-5, -5, -5, -5], dtype=np.int64),
        np.random.default_rng(17).integers(0, 50_000, size=500).astype(np.int64),
        np.random.default_rng(3).integers(-(2**40), 2**40, size=100).astype(np.int64),
        np.cumsum(np.random.default_rng(9).integers(55, 65, size=1000)).astype(np.int64),
    ],
    ids=["empty", "single", "arange", "const-neg", "tokens", "wide", "timestampish"],
)
def test_int_roundtrip(x):
    got = decode_ints(encode_ints(x))
    np.testing.assert_array_equal(got, x)


def test_compression_wins_on_regular_timestamps():
    # regular timestamps are the codec's design case: ~1.37 bits/point in
    # the Gorilla paper; here just assert better than 8x vs raw int64
    ts = (1_700_000_000_000 + 60_000 * np.arange(10_000)).astype(np.int64)
    enc = encode_ints(ts)
    assert len(enc) * 8 < ts.nbytes


def test_compression_wins_on_slow_floats():
    x = np.full(10_000, 98.6)
    enc = encode_floats(x)
    assert len(enc) * 8 < x.nbytes
