"""Hampel rolling outlier filter — literal-definition parity with a
local replay, spike replacement vs level-shift survival, mad=0
degeneracy, edge-window truncation, partition invariance, guards."""

import numpy as np
import pytest

from eristropy_spark.operators.robust import _qcont, hampel_filter


def _local_hampel(x, w=5, k=3.0):
    xs = np.asarray(x, dtype=np.float64)
    k148 = k * 1.4826
    out = []
    n = xs.size
    for i in range(n):
        lo, hi = max(0, i - w), min(n, i + w + 1)
        med = _qcont(np.sort(xs[lo:hi]), 0.5)
        mad = _qcont(np.sort(np.abs(xs[lo:hi] - med)), 0.5)
        flag = abs(float(xs[i]) - med) > k148 * mad
        out.append((i, int(x[i]), med, mad, flag,
                    med if flag else float(xs[i])))
    return out


def test_hampel_matches_local(spark):
    rng = np.random.default_rng(6)
    rows = [(f"d{i}", [int(v) for v in rng.integers(-100, 100, ln)])
            for i, ln in enumerate([1, 2, 7, 30, 113])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {}
    for r in hampel_filter(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["i"], r["x"], r["med"], r["mad"], r["is_outlier"],
             r["cleaned"]))
    for doc_id, toks in rows:
        want = _local_hampel(toks)
        assert sorted(got[doc_id]) == want, doc_id


def test_hampel_replaces_spike_keeps_level_shift(spark):
    base = [10] * 30
    spiked = list(base)
    spiked[15] = 500                      # isolated spike
    shifted = [10] * 15 + [200] * 15      # genuine regime change
    df = spark.createDataFrame(
        [("spike", spiked), ("shift", shifted)],
        "doc_id string, tokens array<int>",
    )
    got = {}
    for r in hampel_filter(df).collect():
        got.setdefault(r["doc_id"], {})[r["i"]] = r
    # the spike is flagged and replaced by the local median
    assert got["spike"][15]["is_outlier"] is True
    assert got["spike"][15]["cleaned"] == 10.0
    assert all(not got["spike"][i]["is_outlier"] for i in range(30) if i != 15)
    # the level shift survives: the rolling median moves with the
    # signal, so interior points on both plateaus stay clean
    assert got["shift"][5]["is_outlier"] is False
    assert got["shift"][25]["is_outlier"] is False
    assert got["shift"][25]["cleaned"] == 200.0


def test_hampel_mad_zero_degeneracy(spark):
    # constant window: mad = 0 — any deviation from the median flags
    # (the classical degeneracy), the median point itself never does
    x = [5] * 11 + [6] + [5] * 11
    df = spark.createDataFrame([("c", x)], "doc_id string, tokens array<int>")
    got = {r["i"]: r for r in hampel_filter(df).collect()}
    assert got[11]["is_outlier"] is True and got[11]["cleaned"] == 5.0
    assert got[0]["is_outlier"] is False


def test_hampel_partition_invariance(spark):
    rng = np.random.default_rng(7)
    rows = [(f"d{i}", [int(v) for v in rng.integers(-50, 50, 40)])
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    a = {tuple(r) for r in hampel_filter(df.repartition(1)).collect()}
    b = {tuple(r) for r in hampel_filter(df.repartition(7)).collect()}
    assert a == b


def test_hampel_guards(spark):
    df = spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>")
    with pytest.raises(ValueError, match="half_width"):
        hampel_filter(df, half_width=0)
    with pytest.raises(ValueError, match="k"):
        hampel_filter(df, k=0.0)
    # empty arrays emit nothing; singletons are their own median
    df2 = spark.createDataFrame(
        [("e", []), ("s", [7])], "doc_id string, tokens array<int>"
    )
    got = hampel_filter(df2).collect()
    assert len(got) == 1
    assert got[0]["doc_id"] == "s" and got[0]["is_outlier"] is False
