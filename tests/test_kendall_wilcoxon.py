"""kendall_pairs / wilcoxon_signed_rank_pairs — value parity against a
direct O(n²) / midrank local recomputation, monotone and paired-shift
discrimination pins, tie handling, the fail-loud overlap guard."""

import datetime as dt
import math

import numpy as np
import pytest

from eristropy_spark.operators.rankcorr import (
    kendall_pairs,
    wilcoxon_signed_rank_pairs,
)


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def _events_df(spark, series: dict[str, list[float]], bucket_sec=60):
    rows = []
    for src, vals in series.items():
        for i, v in enumerate(vals):
            if v is not None:
                rows.append((src, _ts(i * bucket_sec + 1.0), float(v)))
    return spark.createDataFrame(
        rows, "source string, ts timestamp, value double"
    )


def _grid_int(vals):
    return [int(math.floor(v * 1e6 + 0.5)) for v in vals]


def _tau_local(a, b):
    """Direct O(n²) τ-b on the 6-dp integer grid."""
    ai, bi = _grid_int(a), _grid_int(b)
    n = len(ai)
    c = d = t1 = t2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            sa = (ai[j] > ai[i]) - (ai[j] < ai[i])
            sb = (bi[j] > bi[i]) - (bi[j] < bi[i])
            if sa * sb > 0:
                c += 1
            elif sa * sb < 0:
                d += 1
            if sa == 0:
                t1 += 1
            if sb == 0:
                t2 += 1
    n0 = n * (n - 1) // 2
    den = (n0 - t1) * (n0 - t2)
    tau = (c - d) / math.sqrt(den) if den > 0 else None
    return c, d, tau


def _wilcoxon_local(a, b):
    """Midrank signed-rank z on the 6-dp integer grid."""
    dvals = [x - y for x, y in zip(_grid_int(a), _grid_int(b)) if x != y]
    n = len(dvals)
    ad = np.abs(np.array(dvals, dtype=np.int64))
    uniq, inv, cnts = np.unique(ad, return_inverse=True, return_counts=True)
    # doubled midrank 2r = 2*minrank + t - 1
    minrank = np.concatenate(([0], np.cumsum(cnts)[:-1])) + 1
    r2 = (2 * minrank + cnts - 1)[inv]
    w2p = int(r2[np.array(dvals) > 0].sum())
    tie = int(((cnts.astype(np.int64) ** 3) - cnts).sum())
    den2 = 2 * n * (n + 1) * (2 * n + 1) - tie
    z = (2 * w2p - n * (n + 1)) * math.sqrt(3.0) / math.sqrt(den2)
    return n, w2p, z


def test_kendall_matches_local_recomputation(spark):
    rng = np.random.default_rng(11)
    a = list(rng.normal(0, 3, 40).round(3))
    b = list((np.array(a) ** 3 / 10 + rng.normal(0, 1, 40)).round(3))
    r = {
        (x["source_a"], x["source_b"]): x
        for x in kendall_pairs(_events_df(spark, {"a": a, "b": b})).collect()
    }
    c, d, tau = _tau_local(a, b)
    row = r[("a", "b")]
    assert row["n"] == 40 and row["n_c"] == c and row["n_d"] == d
    assert row["tau"] == pytest.approx(tau, abs=1e-12)


def test_kendall_monotone_pins(spark):
    a = [float(i) for i in range(20)]
    up = [float(i * i) for i in range(20)]
    down = [float(-3 * i) for i in range(20)]
    r = {
        (x["source_a"], x["source_b"]): x["tau"]
        for x in kendall_pairs(
            _events_df(spark, {"a": a, "u": up, "d": down})
        ).collect()
    }
    assert r[("a", "u")] == pytest.approx(1.0)
    assert r[("a", "d")] == pytest.approx(-1.0)
    assert r[("d", "u")] == pytest.approx(-1.0)


def test_kendall_all_tied_side_is_null_and_ties_counted(spark):
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    k = [7.0] * 5
    rows = kendall_pairs(
        _events_df(spark, {"a": a, "k": k}), min_overlap=2
    ).collect()
    assert len(rows) == 1 and rows[0]["tau"] is None
    # tie-heavy but not degenerate: matches local
    b = [1.0, 1.0, 2.0, 2.0, 3.0]
    c = [5.0, 5.0, 5.0, 1.0, 1.0]
    row = kendall_pairs(
        _events_df(spark, {"b": b, "c": c}), min_overlap=2
    ).collect()[0]
    cc, dd, tau = _tau_local(b, c)
    assert (row["n_c"], row["n_d"]) == (cc, dd)
    assert row["tau"] == pytest.approx(tau, abs=1e-12)


def test_kendall_overlap_guard_fails_loud(spark):
    a = [float(i) for i in range(30)]
    with pytest.raises(ValueError, match="max_overlap"):
        kendall_pairs(
            _events_df(spark, {"a": a, "b": a}), max_overlap=10
        ).collect()


def test_wilcoxon_matches_local_recomputation(spark):
    rng = np.random.default_rng(5)
    a = list(rng.normal(0, 2, 50).round(3))
    b = list((np.array(a) + rng.normal(0.4, 1, 50)).round(3))
    row = wilcoxon_signed_rank_pairs(
        _events_df(spark, {"a": a, "b": b})
    ).collect()[0]
    n, w2p, z = _wilcoxon_local(a, b)
    assert row["n"] == n and row["w2_plus"] == w2p
    assert row["z"] == pytest.approx(z, abs=1e-12)


def test_wilcoxon_shift_sign_and_symmetry(spark):
    rng = np.random.default_rng(9)
    base = list(rng.normal(10, 1, 60).round(3))
    hi = [v + 2.0 for v in base]
    r = {
        (x["source_a"], x["source_b"]): x["z"]
        for x in wilcoxon_signed_rank_pairs(
            _events_df(spark, {"a": base, "b": hi})
        ).collect()
    }
    # a - b uniformly negative: z strongly negative (W+ = 0)
    assert r[("a", "b")] < -6.0


def test_wilcoxon_zero_differences_drop(spark):
    a = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    b = [1.0, 2.0, 3.0, 5.0, 4.0, 8.0]  # 3 zero diffs drop
    row = wilcoxon_signed_rank_pairs(
        _events_df(spark, {"a": a, "b": b}), min_overlap=1
    ).collect()[0]
    assert row["n"] == 3
    n, w2p, z = _wilcoxon_local(a, b)
    assert row["w2_plus"] == w2p and row["z"] == pytest.approx(z, abs=1e-12)
