"""binseg_changepoints — brute-force parity, planted-shift recovery,
degenerate series, tie determinism, partition invariance."""

import numpy as np


from eristropy_spark.operators.changepoint import binseg_changepoints


def _stat(pref, lo, hi, k):
    """Mirror of the operator's statistic for segment (lo, hi] split
    after global index k: a/(j*(ln-j)) with exact-int numerator."""
    s = pref[k] - pref[lo]
    total = pref[hi] - pref[lo]
    j, ln = k - lo, hi - lo
    a = s * s * (ln - j) + (total - s) * (total - s) * j
    return float(a) / (float(j) * (ln - j))


def _best(pref, lo, hi):
    """(k, v) maximizing the split statistic, tie -> smallest k;
    None when the segment has < 2 points."""
    if hi - lo < 2:
        return None, None
    best_k, best_v = None, None
    for k in range(lo + 1, hi):
        v = _stat(pref, lo, hi, k)
        if best_v is None or v > best_v:
            best_k, best_v = k, v
    return best_k, best_v


def _binseg_local(y):
    y = [int(v) for v in y]
    n = len(y)
    pref = [0]
    for v in y:
        pref.append(pref[-1] + v)
    out = {"n": n, "k1": None, "gain1": None, "k2_left": None,
           "gain_left": None, "k2_right": None, "gain_right": None}
    k1, v1 = _best(pref, 0, n)
    if k1 is None:
        return out
    out["k1"] = k1
    out["gain1"] = v1 - float(pref[n] * pref[n]) / n
    kl, vl = _best(pref, 0, k1)
    if kl is not None:
        out["k2_left"] = kl
        out["gain_left"] = vl - float(pref[k1] * pref[k1]) / k1
    kr, vr = _best(pref, k1, n)
    if kr is not None:
        t = pref[n] - pref[k1]
        out["k2_right"] = kr
        out["gain_right"] = vr - float(t * t) / (n - k1)
    return out


def _df(spark, groups):
    rows = [
        (k, i, int(v)) for k, ys in groups.items() for i, v in enumerate(ys)
    ]
    return spark.createDataFrame(rows, "key string, ts long, value long")


def _collect(spark, groups):
    return {
        r["key"]: r
        for r in binseg_changepoints(
            _df(spark, groups), key="key", ts_col="ts"
        ).collect()
    }


def test_matches_brute(spark):
    rng = np.random.default_rng(61)
    groups = {
        f"k{i}": rng.integers(-50, 50, size=rng.integers(1, 30)).tolist()
        for i in range(10)
    }
    out = _collect(spark, groups)
    for kk, ys in groups.items():
        want = _binseg_local(ys)
        got = out[kk]
        for c in want:
            assert got[c] == want[c], (kk, c, got[c], want[c])


def test_planted_shifts(spark):
    # three equal levels: the two true breaks are 50 and 100; the
    # symmetric tie at level 1 resolves to the SMALLER k (50), and the
    # right half then recovers 100
    y = [0] * 50 + [10] * 50 + [20] * 50
    r = _collect(spark, {"g": y})["g"]
    assert r["k1"] == 50
    assert r["k2_right"] == 100
    assert r["gain1"] > 0 and r["gain_right"] > 0
    # the (pure-level) left half has no structure left
    assert r["gain_left"] == 0.0


def test_degenerate(spark):
    out = _collect(
        spark, {"one": [7], "two": [1, 9], "const": [3, 3, 3, 3]}
    )
    assert out["one"]["k1"] is None and out["one"]["gain1"] is None
    assert out["two"]["k1"] == 1
    assert out["two"]["k2_left"] is None and out["two"]["k2_right"] is None
    # constant: every split ties at zero gain -> smallest k, gain 0
    assert out["const"]["k1"] == 1
    assert out["const"]["gain1"] == 0.0


def test_partition_invariant(spark):
    rng = np.random.default_rng(62)
    groups = {f"k{i}": rng.integers(0, 20, size=40).tolist() for i in range(8)}
    df = _df(spark, groups)
    a = sorted(
        map(tuple, binseg_changepoints(df, key="key", ts_col="ts").collect())
    )
    b = sorted(
        map(
            tuple,
            binseg_changepoints(
                df.repartition(19), key="key", ts_col="ts"
            ).collect(),
        )
    )
    assert a == b
