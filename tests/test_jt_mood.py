"""jonckheere_terpstra / mood_median — value parity against brute-force
O(n²) / contingency recomputation, trend discrimination, tie and
degenerate guards."""

import numpy as np
import pytest

from eristropy_spark.operators.grouptests import jonckheere_terpstra, mood_median


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "source string, value int")


def _jt_local(pairs):
    """Brute-force J over ordered groups + exact null moments."""
    groups = sorted(set(g for g, _ in pairs))
    xs = {g: np.array([v for gg, v in pairs if gg == g], dtype=float) for g in groups}
    two_j = 0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            a, b = xs[groups[i]][:, None], xs[groups[j]][None, :]
            two_j += int(2 * (a < b).sum() + (a == b).sum())
    ns = np.array([len(xs[g]) for g in groups], dtype=float)
    n = ns.sum()
    vals, t = np.unique([v for _, v in pairs], return_counts=True)
    t = t.astype(float)
    e = (n * n - (ns**2).sum()) / 4.0
    var = (
        (n * (n - 1) * (2 * n + 5)
         - (ns * (ns - 1) * (2 * ns + 5)).sum()
         - (t * (t - 1) * (2 * t + 5)).sum()) / 72.0
        + (ns * (ns - 1) * (ns - 2)).sum() * (t * (t - 1) * (t - 2)).sum()
        / (36.0 * n * (n - 1) * (n - 2))
        + (ns * (ns - 1)).sum() * (t * (t - 1)).sum() / (8.0 * n * (n - 1))
    )
    z = (two_j / 2.0 - e) / np.sqrt(var) if var > 0 else None
    return two_j, int(4 * e), z


def _mood_local(pairs):
    vals = np.array([v for _, v in pairs], dtype=float)
    grps = np.array([g for g, _ in pairs])
    groups = sorted(set(grps))
    med = np.median(vals)
    a = np.array([(vals[grps == g] > med).sum() for g in groups], dtype=float)
    n = np.array([(grps == g).sum() for g in groups], dtype=float)
    b = n - a
    nt, at, bt = n.sum(), a.sum(), b.sum()
    if at == 0 or bt == 0:
        return None
    ea, eb = n * at / nt, n * bt / nt
    return float(((a - ea) ** 2 / ea + (b - eb) ** 2 / eb).sum())


def test_jt_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    pairs = [
        (f"g{j}", int(v))
        for j, mu in enumerate([0, 3, 6, 9])
        for v in rng.normal(mu, 7, 80).round()
    ]
    two_j, four_e, z_ref = _jt_local(pairs)
    rows = jonckheere_terpstra(_df(spark, pairs)).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["two_j"] == two_j
        assert r["four_e"] == four_e
        assert r["z"] == pytest.approx(z_ref, abs=2e-6)
        assert r["n_total"] == len(pairs) and r["k"] == 4
    by = {r["group"]: r for r in rows}
    assert [by[f"g{j}"]["gi"] for j in range(4)] == [1, 2, 3, 4]


def test_jt_detects_monotone_trend_kw_style_null_noise_does_not(spark):
    rng = np.random.default_rng(5)
    trend = [
        (f"g{j}", int(v))
        for j, mu in enumerate([0, 4, 8])
        for v in rng.normal(mu, 3, 120).round()
    ]
    null = [
        (f"g{j}", int(v))
        for j in range(3)
        for v in rng.normal(0, 3, 120).round()
    ]
    z_t = jonckheere_terpstra(_df(spark, trend)).first()["z"]
    z_0 = jonckheere_terpstra(_df(spark, null)).first()["z"]
    assert z_t > 8.0
    assert abs(z_0) < 3.0


def test_jt_reversed_order_flips_sign(spark):
    rng = np.random.default_rng(7)
    up = [
        (f"g{j}", int(v))
        for j, mu in enumerate([0, 6])
        for v in rng.normal(mu, 2, 90).round()
    ]
    down = [("g0" if g == "g1" else "g1", v) for g, v in up]
    z_up = jonckheere_terpstra(_df(spark, up)).first()["z"]
    z_dn = jonckheere_terpstra(_df(spark, down)).first()["z"]
    assert z_up > 0 and z_dn < 0
    assert z_up == pytest.approx(-z_dn, abs=2e-6)


def test_jt_all_tied_null_z(spark):
    pairs = [("a", 5)] * 10 + [("b", 5)] * 10
    r = jonckheere_terpstra(_df(spark, pairs)).first()
    assert r["z"] is None
    assert r["two_j"] == 100  # all-equal pairs count ½ each: 2J = n_a*n_b


def test_jt_single_group_null(spark):
    r = jonckheere_terpstra(_df(spark, [("a", i) for i in range(10)])).first()
    assert r["z"] is None and r["k"] == 1


def test_mood_matches_contingency(spark):
    rng = np.random.default_rng(3)
    pairs = [
        (f"g{j}", int(v))
        for j, mu in enumerate([0, 5, -3])
        for v in rng.normal(mu, 9, 140).round()
    ]
    chi_ref = _mood_local(pairs)
    rows = mood_median(_df(spark, pairs)).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["chi2"] == pytest.approx(chi_ref, abs=5e-6)
        assert r["df"] == 2 and r["k"] == 3
        assert r["n_above"] + r["n_le"] == r["n"]
    tot = rows[0]
    assert tot["n_above_total"] == sum(r["n_above"] for r in rows)


def test_mood_median_and_cells_exact(spark):
    pairs = [("a", v) for v in [1, 2, 3, 4]] + [("b", v) for v in [3, 4, 5, 6]]
    rows = {r["group"]: r for r in mood_median(_df(spark, pairs)).collect()}
    # pooled sorted: 1 2 3 3 4 4 5 6 → median 3.5
    assert rows["a"]["median"] == 3.5
    assert rows["a"]["n_above"] == 1 and rows["a"]["n_le"] == 3
    assert rows["b"]["n_above"] == 3 and rows["b"]["n_le"] == 1


def test_mood_shifted_group_rejects_identical_does_not(spark):
    rng = np.random.default_rng(9)
    base = rng.normal(0, 4, 200).round()
    shifted = [("a", int(v)) for v in base] + [
        ("b", int(v) + 6) for v in base
    ]
    same = [("a", int(v)) for v in base] + [("b", int(v)) for v in base]
    chi_s = mood_median(_df(spark, shifted)).first()["chi2"]
    chi_0 = mood_median(_df(spark, same)).first()["chi2"]
    assert chi_s > 50.0
    assert chi_0 < 1.0


def test_mood_degenerate_all_equal_null(spark):
    pairs = [("a", 7)] * 8 + [("b", 7)] * 8
    r = mood_median(_df(spark, pairs)).first()
    assert r["chi2"] is None  # A margin empty: nothing above the median


# ---------------------------------------------------------------- CA trend

from eristropy_spark.operators.grouptests import cochran_armitage  # noqa: E402


def _ca_local(pairs):
    groups = sorted(set(g for g, _ in pairs))
    s = np.arange(1, len(groups) + 1, dtype=float)
    n = np.array([sum(1 for g, _ in pairs if g == gg) for gg in groups], float)
    r = np.array(
        [sum(v for g, v in pairs if g == gg) for gg in groups], float
    )
    nt, rt = n.sum(), r.sum()
    pbar = rt / nt
    t = (s * (r - n * pbar)).sum()
    var = pbar * (1 - pbar) * ((s * s * n).sum() - (s * n).sum() ** 2 / nt)
    if var <= 0 or rt == 0 or rt == nt:
        return None, None
    return t / np.sqrt(var), t * t / var


def test_ca_matches_formula(spark):
    rng = np.random.default_rng(13)
    pairs = [
        (f"g{j}", int(rng.random() < p))
        for j, p in enumerate([0.2, 0.35, 0.5, 0.65])
        for _ in range(200)
    ]
    z_ref, chi_ref = _ca_local(pairs)
    rows = cochran_armitage(_df(spark, pairs)).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["z"] == pytest.approx(z_ref, abs=2e-6)
        assert r["chi2"] == pytest.approx(chi_ref, abs=2e-6)
        assert r["df"] == 1 and r["k"] == 4
        assert r["successes"] <= r["n"]
    assert rows[0]["r_total"] == sum(v for _, v in pairs)


def test_ca_trend_discriminates_and_sign_flips(spark):
    rng = np.random.default_rng(17)
    up = [
        (f"g{j}", int(rng.random() < p))
        for j, p in enumerate([0.1, 0.4, 0.7])
        for _ in range(300)
    ]
    flat = [
        (f"g{j}", int(rng.random() < 0.4))
        for j in range(3)
        for _ in range(300)
    ]
    down = [(f"g{2 - int(g[1])}", v) for g, v in up]
    z_up = cochran_armitage(_df(spark, up)).first()["z"]
    z_fl = cochran_armitage(_df(spark, flat)).first()["z"]
    z_dn = cochran_armitage(_df(spark, down)).first()["z"]
    assert z_up > 8.0 and abs(z_fl) < 3.0 and z_dn < -8.0


def test_ca_degenerate_margins_null(spark):
    all_one = [("a", 1)] * 5 + [("b", 1)] * 5
    r = cochran_armitage(_df(spark, all_one)).first()
    assert r["z"] is None and r["chi2"] is None


def test_ca_nonbinary_raises(spark):
    import py4j.protocol

    with pytest.raises(Exception, match="0/1|raise|Job aborted"):
        cochran_armitage(_df(spark, [("a", 2), ("b", 0)])).collect()


# ---------------------------------------------------------------- Quade

from eristropy_spark.operators.grouptests import quade  # noqa: E402


def _rankdata(a):
    """Midrank implementation (no scipy in the sandbox)."""
    a = np.asarray(a, dtype=float)
    order = np.argsort(a, kind="mergesort")
    ranks = np.empty(len(a), dtype=float)
    sa = a[order]
    i = 0
    while i < len(a):
        j = i
        while j + 1 < len(a) and sa[j + 1] == sa[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def _quade_local(cells):
    """cells: dict[(block, treatment)] -> value; complete design."""
    blocks = sorted(set(b for b, _ in cells))
    trts = sorted(set(t for _, t in cells))
    n, k = len(blocks), len(trts)
    v = np.array([[cells[(b, t)] for t in trts] for b in blocks], float)
    r = np.apply_along_axis(_rankdata, 1, v)
    d = v.max(axis=1) - v.min(axis=1)
    q = _rankdata(d)
    s = q[:, None] * (r - (k + 1) / 2.0)
    a2 = (s**2).sum()
    sj = s.sum(axis=0)
    b = (sj**2).sum() / n
    if a2 == b:
        return None, sj
    return (n - 1) * b / (a2 - b), sj


def _cells_df(spark, cells):
    rows = [(b, t, int(v)) for (b, t), v in cells.items()]
    return spark.createDataFrame(
        rows, "block string, treatment string, value long"
    )


def test_quade_matches_bruteforce(spark):
    rng = np.random.default_rng(23)
    effect = {"t0": 0, "t1": 30, "t2": 60}
    cells = {}
    for bi in range(25):
        base = int(rng.integers(0, 500))
        scale = 1 + bi % 4
        for t, e in effect.items():
            cells[(f"b{bi:02d}", t)] = base + scale * e + int(
                rng.integers(0, 20)
            )
    f_ref, sj_ref = _quade_local(cells)
    rows = quade(_cells_df(spark, cells)).collect()
    assert len(rows) == 3
    by = {r["treatment"]: r for r in rows}
    for j, t in enumerate(sorted(effect)):
        r = by[t]
        assert r["f_stat"] == pytest.approx(f_ref, rel=1e-6)
        assert r["s4_sum"] == pytest.approx(4 * sj_ref[j], abs=0)
        assert r["j"] == j + 1 and r["k"] == 3 and r["n"] == 25
        assert r["df1"] == 2 and r["df2"] == 48


def test_quade_discriminates_effect_null_does_not(spark):
    rng = np.random.default_rng(29)
    eff, null = {}, {}
    for bi in range(30):
        base = int(rng.integers(0, 100))
        for j in range(3):
            eff[(f"b{bi}", f"t{j}")] = base + 50 * j + int(rng.integers(0, 10))
            null[(f"b{bi}", f"t{j}")] = base + int(rng.integers(0, 60))
    f_eff = quade(_cells_df(spark, eff)).first()["f_stat"]
    f_null = quade(_cells_df(spark, null)).first()["f_stat"]
    assert f_eff > 30.0
    assert f_null < 5.0


def test_quade_incomplete_blocks_drop(spark):
    cells = {(f"b{i}", f"t{j}"): 10 * i + j for i in range(6) for j in range(3)}
    full = quade(_cells_df(spark, cells)).collect()
    cells_missing = dict(cells)
    del cells_missing[("b5", "t2")]  # b5 incomplete -> dropped
    part = quade(_cells_df(spark, cells_missing)).collect()
    assert {r["n"] for r in full} == {6}
    assert {r["n"] for r in part} == {5}


def test_quade_identical_rankings_null_f(spark):
    # every block ranks t0<t1<t2 with the same range: A == B -> NULL
    cells = {
        (f"b{i}", f"t{j}"): 100 * i + j for i in range(5) for j in range(3)
    }
    r = quade(_cells_df(spark, cells)).first()
    assert r["f_stat"] is None


# ---------------------------------------------------------------- Conover

from eristropy_spark.operators.grouptests import conover_squared_ranks  # noqa: E402


def _conover_local(pairs):
    """Median-centred squared-ranks statistic (matches the operator's
    documented deviation)."""
    grps = np.array([g for g, _ in pairs])
    vals = np.array([v for _, v in pairs], dtype=float)
    groups = sorted(set(grps))
    z = np.empty(len(vals))
    for g in groups:
        m = np.median(vals[grps == g])
        z[grps == g] = np.abs(vals[grps == g] - m)
    r = _rankdata(z)
    u = r**2
    n = len(vals)
    s = np.array([u[grps == g].sum() for g in groups])
    ns = np.array([(grps == g).sum() for g in groups], dtype=float)
    sbar = u.sum() / n
    d2 = ((u**2).sum() - n * sbar**2) / (n - 1)
    if d2 <= 0:
        return None
    return ((s**2 / ns).sum() - n * sbar**2) / d2


def _rankdata_for_conover(pairs):
    grps = np.array([g for g, _ in pairs])
    vals = np.array([v for _, v in pairs], dtype=float)
    z = np.empty(len(vals))
    for g in sorted(set(grps)):
        m = np.median(vals[grps == g])
        z[grps == g] = np.abs(vals[grps == g] - m)
    return _rankdata(z)


def test_conover_matches_bruteforce(spark):
    rng = np.random.default_rng(73)
    pairs = [
        (f"g{j}", int(v))
        for j, sd in enumerate([5, 12, 25])
        for v in rng.normal(100, sd, 130).round()
    ]
    t_ref = _conover_local(pairs)
    rows = conover_squared_ranks(_df(spark, pairs)).collect()
    assert len(rows) == 3
    n_tot = sum(r["n"] for r in rows)
    for r in rows:
        assert r["t_stat"] == pytest.approx(t_ref, rel=1e-5)
        assert r["df"] == 2 and r["k"] == 3
    by = {r["group"]: r for r in rows}
    # wider group -> larger deviations -> larger normalized rank mass
    assert by["g2"]["mean_u"] > by["g0"]["mean_u"]
    # s_u sums to ~ sum over all points of (r/N)^2
    assert sum(r["s_u"] for r in rows) == pytest.approx(
        sum((_rankdata_for_conover(pairs) / n_tot) ** 2), abs=1e-4
    )


def test_conover_scale_discriminates_equal_scale_does_not(spark):
    rng = np.random.default_rng(79)
    widened = [
        (f"g{j}", int(v))
        for j, sd in enumerate([3, 15])
        for v in rng.normal(0, sd, 200).round()
    ]
    same = [
        (f"g{j}", int(v))
        for j in range(2)
        for v in rng.normal(0, 5, 200).round()
    ]
    # location shift with SAME scale must NOT trigger (median-centred)
    shifted = [
        (g, v + (500 if g == "g1" else 0)) for g, v in same
    ]
    t_w = conover_squared_ranks(_df(spark, widened)).first()["t_stat"]
    t_s = conover_squared_ranks(_df(spark, same)).first()["t_stat"]
    t_l = conover_squared_ranks(_df(spark, shifted)).first()["t_stat"]
    assert t_w > 30.0
    assert t_s < 7.0
    assert t_l < 7.0


def test_conover_all_tied_null(spark):
    pairs = [("a", 4)] * 10 + [("b", 4)] * 10
    r = conover_squared_ranks(_df(spark, pairs)).first()
    assert r["t_stat"] is None
