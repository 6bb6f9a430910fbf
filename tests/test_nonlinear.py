"""poincare / ordinal_census / rqa — value parity against independent
local (numpy/itertools) recomputation, signal-class discrimination
(deterministic vs noise), tie handling, degenerate-signal guards."""

import itertools
import math

import numpy as np
import pytest

from eristropy_spark.operators.nonlinear import ordinal_census, poincare, rqa


def _tokens_df(spark, seqs: dict[str, list[int]]):
    rows = [(k, [int(x) for x in v], len(v), "src") for k, v in seqs.items()]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def _seqs(rng, n_docs=8, lo=4, hi=40):
    return {
        f"d{i}": [int(x) for x in rng.integers(-500, 500,
                                               size=int(rng.integers(lo, hi)))]
        for i in range(n_docs)
    }


# ---------------------------------------------------------------- poincare

def _poincare_local(x):
    x = np.asarray(x, dtype=float)
    d = np.diff(x)
    var_x = x.var(ddof=1)
    var_d = d.var(ddof=1)
    sd1 = math.sqrt(var_d / 2.0)
    sd2 = math.sqrt(max(2.0 * var_x - var_d / 2.0, 0.0))
    return sd1, sd2


def test_poincare_matches_numpy(spark):
    seqs = _seqs(np.random.default_rng(11))
    out = {r["doc_id"]: r for r in
           poincare(_tokens_df(spark, seqs)).collect()}
    assert set(out) == set(seqs)
    for k, v in seqs.items():
        sd1, sd2 = _poincare_local(v)
        r = out[k]
        assert r["sd1"] == pytest.approx(sd1, rel=1e-12)
        assert r["sd2"] == pytest.approx(sd2, rel=1e-12)
        if sd2 > 0:
            assert r["ratio"] == pytest.approx(sd1 / sd2, rel=1e-12)
        assert r["area"] == pytest.approx(math.pi * sd1 * sd2, rel=1e-12)


def test_poincare_constant_and_short_signals(spark):
    out = {r["doc_id"]: r for r in poincare(_tokens_df(spark, {
        "const": [7, 7, 7, 7],     # sd1 = sd2 = 0, ratio NULL
        "short": [1, 2],           # n < 3 dropped
        "lin": [0, 10, 20, 30],    # pure trend: sd1 = 0, sd2 > 0
    })).collect()}
    assert "short" not in out
    assert out["const"]["sd1"] == 0.0 and out["const"]["sd2"] == 0.0
    assert out["const"]["ratio"] is None and out["const"]["area"] == 0.0
    assert out["lin"]["sd1"] == 0.0 and out["lin"]["sd2"] > 0
    assert out["lin"]["ratio"] == 0.0


# ----------------------------------------------------------- ordinal_census

_PATTERNS = list(itertools.permutations(range(3)))  # lexicographic


def _ordinal_local(x):
    """Counts keyed by pattern string '012'.. with the stable tie rule."""
    counts = {"".join(map(str, p)): 0 for p in _PATTERNS}
    for i in range(len(x) - 2):
        w = x[i:i + 3]
        order = sorted(range(3), key=lambda t: (w[t], t))
        counts["".join(map(str, order))] += 1
    return counts


def test_ordinal_census_matches_bruteforce(spark):
    seqs = _seqs(np.random.default_rng(13), lo=3, hi=60)
    seqs["ties"] = [5, 5, 5, 1, 5, 5, 9, 9, 1, 1, 5]  # heavy tie stress
    out = {r["doc_id"]: r for r in
           ordinal_census(_tokens_df(spark, seqs)).collect()}
    for k, v in seqs.items():
        loc = _ordinal_local(v)
        r = out[k]
        got = {p: r[f"n{p}"] for p in loc}
        assert got == loc, k
        w = sum(loc.values())
        assert r["n_windows"] == w == len(v) - 2
        assert r["n_missing"] == sum(1 for c in loc.values() if c == 0)
        h = -sum((c / w) * math.log(c / w) for c in loc.values() if c > 0)
        assert r["pe3"] == pytest.approx(h / math.log(6), abs=1e-12)


def test_ordinal_census_discriminates_monotone_vs_noise(spark):
    rng = np.random.default_rng(17)
    out = {r["doc_id"]: r for r in ordinal_census(_tokens_df(spark, {
        "mono": list(range(100)),
        "noise": [int(x) for x in rng.integers(0, 10**6, size=100)],
    })).collect()}
    # strictly increasing: only pattern 012 occurs → entropy 0, 5 missing
    assert out["mono"]["n012"] == 98 and out["mono"]["n_missing"] == 5
    assert out["mono"]["pe3"] == 0.0
    # iid noise visits (nearly) all six patterns with high entropy
    assert out["noise"]["n_missing"] == 0
    assert out["noise"]["pe3"] > 0.9


# ---------------------------------------------------------------------- rqa

def _rqa_local(x, radius_div=5):
    x = [int(v) for v in x]
    n = len(x)
    r = (max(x) - min(x)) // radius_div
    rec = {(i, j): abs(x[i] - x[j]) <= r
           for i in range(n) for j in range(i + 1, n)}
    n_rec = sum(rec.values())
    n_line = sum(
        1 for (i, j), e in rec.items()
        if e and (rec.get((i - 1, j - 1), False)
                  or rec.get((i + 1, j + 1), False))
    )
    return r, n * (n - 1) // 2, n_rec, n_line


def test_rqa_matches_bruteforce(spark):
    seqs = _seqs(np.random.default_rng(19), lo=2, hi=30)
    out = {r["doc_id"]: r for r in rqa(_tokens_df(spark, seqs)).collect()}
    for k, v in seqs.items():
        rad, n_pairs, n_rec, n_line = _rqa_local(v)
        row = out[k]
        assert (row["r"], row["n_pairs"], row["n_rec"], row["n_line"]) == \
            (rad, n_pairs, n_rec, n_line), k
        assert row["rr"] == pytest.approx(n_rec / n_pairs, rel=1e-12)
        if n_rec:
            assert row["det"] == pytest.approx(n_line / n_rec, rel=1e-12)
        else:
            assert row["det"] is None


def test_rqa_periodic_is_more_deterministic_than_noise(spark):
    rng = np.random.default_rng(23)
    period = [int(1000 * math.sin(2 * math.pi * t / 8)) for t in range(64)]
    noise = [int(x) for x in rng.integers(-1000, 1000, size=64)]
    out = {r["doc_id"]: r for r in rqa(_tokens_df(spark, {
        "periodic": period, "noise": noise,
    })).collect()}
    # periodic recurrences align on diagonals; iid noise recurrences don't
    assert out["periodic"]["det"] > out["noise"]["det"] + 0.1
    assert out["periodic"]["det"] > 0.65


def test_rqa_guards(spark):
    with pytest.raises(ValueError):
        rqa(_tokens_df(spark, {"a": [1, 2, 3]}), radius_div=0)
    # constant signal: r = 0, every pair recurrent; the corner pair
    # (0, n-1) has no valid diagonal neighbor, so n_line = n_pairs - 1
    out = rqa(_tokens_df(spark, {"c": [4, 4, 4, 4]})).collect()[0]
    assert out["r"] == 0 and out["n_rec"] == out["n_pairs"] == 6
    assert out["rr"] == 1.0 and out["n_line"] == 5
    assert out["det"] == pytest.approx(5 / 6, rel=1e-12)
