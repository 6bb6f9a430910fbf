"""irreversibility / hjorth / katz_fd — local-recomputation parity,
hand-pinned goldens, degenerate inputs."""

import math

import numpy as np
import pytest

from eristropy_spark.operators.dynamics import hjorth, irreversibility, katz_fd


def _tokens_df(spark, seqs: dict[str, list[int]]):
    return spark.createDataFrame(
        [(k, v) for k, v in seqs.items()], "doc_id string, tokens array<int>"
    )


def _irrev_local(x: list[int]):
    d = [b - a for a, b in zip(x, x[1:])]
    np_ = sum(1 for v in d if v > 0)
    nm = sum(1 for v in d if v < 0)
    sp = sum(v * v for v in d if v > 0)
    sa = sum(v * v for v in d)
    m = np_ + nm
    porta = nm / m if m > 0 else None
    guzik = sp / sa if sa > 0 else None
    z = (np_ - nm) / math.sqrt(m) if m > 0 else None
    return np_, nm, porta, guzik, z


def _hjorth_local(x: list[int]):
    def var0(v):
        k = len(v)
        s = sum(v)
        q = sum(t * t for t in v)
        return (q - s * s / k) / k

    n = len(x)
    a = var0(x)
    d1 = [b - c for c, b in zip(x, x[1:])]
    d2 = [b - c for c, b in zip(d1, d1[1:])]
    mob = None
    comp = None
    if n >= 2 and a > 0:
        mob = math.sqrt(var0(d1) / a)
    if n >= 3 and a > 0 and var0(d1) > 0:
        comp = math.sqrt(var0(d2) / var0(d1)) / math.sqrt(var0(d1) / a)
    return a, mob, comp


def _katz_local(x: list[int]):
    n = len(x)
    L = sum(abs(b - a) for a, b in zip(x, x[1:]))
    d = max(abs(v - x[0]) for v in x)
    if n < 3 or L == 0 or d == 0:
        return L, d, None
    m = n - 1
    denom = math.log(m) + math.log(d) - math.log(L)
    if denom == 0:
        return L, d, None
    return L, d, math.log(m) / denom


@pytest.fixture(scope="module")
def seqs():
    rng = np.random.default_rng(7)
    return {
        "rw": [int(v) for v in np.cumsum(rng.integers(-3, 4, size=200))],
        "noise": [int(v) for v in rng.integers(0, 100, size=150)],
        "trend_up": list(range(0, 120, 2)),
        "sawtooth": [i % 7 for i in range(140)],
        "const": [5] * 60,
        "two": [1, 9],
        "one": [42],
    }


# -------------------------------------------------------- irreversibility
def test_irreversibility_matches_local(spark, seqs):
    out = {
        r["doc_id"]: r
        for r in irreversibility(_tokens_df(spark, seqs)).collect()
    }
    for k, x in seqs.items():
        np_, nm, porta, guzik, z = _irrev_local(x)
        r = out[k]
        assert r["n"] == len(x)
        assert r["n_plus"] == np_ and r["n_minus"] == nm
        for got, want in (
            (r["porta"], porta), (r["guzik"], guzik), (r["z"], z)
        ):
            if want is None:
                assert got is None
            else:
                assert got == pytest.approx(want, abs=1e-12)


def test_irreversibility_directionality(spark):
    # strictly increasing: no negative increments — porta = 0, guzik = 1
    out = irreversibility(
        _tokens_df(spark, {"up": list(range(50))})
    ).collect()[0]
    assert out["porta"] == 0.0 and out["guzik"] == 1.0 and out["z"] == 7.0
    # time-reversible alternation: porta = guzik = 0.5, z = 0
    out = irreversibility(
        _tokens_df(spark, {"alt": [0, 1] * 25 + [0]})
    ).collect()[0]
    assert out["porta"] == 0.5 and out["guzik"] == 0.5 and out["z"] == 0.0


def test_irreversibility_degenerate(spark):
    rows = {
        r["doc_id"]: r
        for r in irreversibility(
            _tokens_df(spark, {"const": [3] * 10, "one": [1]})
        ).collect()
    }
    for k in ("const", "one"):
        r = rows[k]
        assert r["porta"] is None and r["guzik"] is None and r["z"] is None


# ----------------------------------------------------------------- hjorth
def test_hjorth_matches_local(spark, seqs):
    out = {r["doc_id"]: r for r in hjorth(_tokens_df(spark, seqs)).collect()}
    for k, x in seqs.items():
        a, mob, comp = _hjorth_local(x)
        r = out[k]
        assert r["activity"] == pytest.approx(a, rel=1e-12)
        for got, want in ((r["mobility"], mob), (r["complexity"], comp)):
            if want is None:
                assert got is None
            else:
                assert got == pytest.approx(want, rel=1e-12)


def test_hjorth_sine_vs_noise(spark):
    # Hjorth complexity ≈ 1 for a (sampled) sine, larger for white noise
    n = 512
    sine = [int(round(1000 * math.sin(2 * math.pi * 8 * i / n))) for i in range(n)]
    rng = np.random.default_rng(3)
    noise = [int(v) for v in rng.integers(-1000, 1000, size=n)]
    out = {
        r["doc_id"]: r
        for r in hjorth(
            _tokens_df(spark, {"sine": sine, "noise": noise})
        ).collect()
    }
    assert out["sine"]["complexity"] == pytest.approx(1.0, abs=0.05)
    assert out["noise"]["complexity"] > 1.2
    assert out["noise"]["mobility"] > out["sine"]["mobility"]


def test_hjorth_degenerate(spark):
    rows = {
        r["doc_id"]: r
        for r in hjorth(
            _tokens_df(spark, {"const": [7] * 10, "one": [1], "two": [1, 2]})
        ).collect()
    }
    assert rows["const"]["activity"] == 0.0
    assert rows["const"]["mobility"] is None
    assert rows["one"]["activity"] == 0.0 and rows["one"]["mobility"] is None
    assert rows["two"]["mobility"] is not None
    assert rows["two"]["complexity"] is None


# ---------------------------------------------------------------- katz_fd
def test_katz_matches_local(spark, seqs):
    out = {r["doc_id"]: r for r in katz_fd(_tokens_df(spark, seqs)).collect()}
    for k, x in seqs.items():
        L, d, kfd = _katz_local(x) if len(x) >= 2 else (0, 0, None)
        r = out[k]
        assert r["curve_len"] == L and r["extent"] == d
        if kfd is None:
            assert r["kfd"] is None
        else:
            assert r["kfd"] == pytest.approx(kfd, rel=1e-12)


def test_katz_straight_line_is_one(spark):
    # a monotone ramp has d = L: kfd = ln(m)/ln(m) = 1 exactly
    out = katz_fd(_tokens_df(spark, {"ramp": list(range(100))})).collect()[0]
    assert out["kfd"] == pytest.approx(1.0, abs=1e-12)


def test_katz_rougher_is_higher(spark):
    rng = np.random.default_rng(11)
    smooth = list(range(0, 400, 4))
    rough = [int(v) for v in np.cumsum(rng.integers(-50, 51, size=100))]
    out = {
        r["doc_id"]: r
        for r in katz_fd(
            _tokens_df(spark, {"smooth": smooth, "rough": rough})
        ).collect()
    }
    assert out["rough"]["kfd"] > out["smooth"]["kfd"] >= 1.0
