"""ansari_drift — Ansari–Bradley scale-drift parity against a
brute-force tie-averaged score recomputation, dispersion
discrimination, degenerate guards."""

import numpy as np
import pytest

from eristropy_spark.operators.drift import ansari_drift


def _df(spark, vals, key="s1"):
    rows = [(key, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "sid string, ts long, value double")


def _ab_local(vals):
    vals = np.asarray(vals, dtype=float)
    n = len(vals)
    ref, cur = vals[: n // 2], vals[n // 2 :]
    pooled = np.concatenate([ref, cur])
    order = np.argsort(pooled, kind="mergesort")
    pos_scores = np.minimum(
        np.arange(1, n + 1), n + 1 - np.arange(1, n + 1)
    ).astype(float)
    sp = pooled[order]
    avg = pos_scores.copy()
    i = 0
    while i < n:
        j = i
        while j + 1 < n and sp[j + 1] == sp[i]:
            j += 1
        avg[i : j + 1] = pos_scores[i : j + 1].mean()
        i = j + 1
    a = np.empty(n)
    a[order] = avg
    a_cur = a[len(ref) :]
    w = a_cur.sum()
    sa, sa2 = a.sum(), (a**2).sum()
    e = len(cur) * sa / n
    var = len(ref) * len(cur) * (n * sa2 - sa**2) / (n**2 * (n - 1))
    if var <= 0:
        return w, None
    return w, (w - e) / np.sqrt(var)


@pytest.mark.parametrize("seed,m", [(31, 200), (37, 151)])
def test_ansari_matches_bruteforce(spark, seed, m):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 40, m).astype(float)  # heavy ties
    w_ref, z_ref = _ab_local(vals)
    r = ansari_drift(_df(spark, vals), "sid", ts_col="ts").first()
    assert r["n_ref"] == m // 2 and r["n_cur"] == m - m // 2
    assert r["w"] == pytest.approx(w_ref, abs=1e-6)
    assert r["z"] == pytest.approx(z_ref, abs=1e-4)


def test_ansari_detects_scale_not_fooled_by_none(spark):
    rng = np.random.default_rng(41)
    base = rng.normal(50, 2, 150)
    wide = rng.normal(50, 8, 150)  # same center, 4x spread
    same = rng.normal(50, 2, 150)
    z_scale = ansari_drift(
        _df(spark, np.concatenate([base, wide])), "sid", ts_col="ts"
    ).first()["z"]
    z_null = ansari_drift(
        _df(spark, np.concatenate([base, same])), "sid", ts_col="ts"
    ).first()["z"]
    # current half MORE dispersed -> extremes -> low scores -> z < 0
    assert z_scale < -5.0
    assert abs(z_null) < 3.0


def test_ansari_narrowing_flips_sign(spark):
    rng = np.random.default_rng(43)
    wide = rng.normal(0, 9, 120)
    narrow = rng.normal(0, 1, 120)
    z = ansari_drift(
        _df(spark, np.concatenate([wide, narrow])), "sid", ts_col="ts"
    ).first()["z"]
    assert z > 5.0


def test_ansari_all_tied_null(spark):
    r = ansari_drift(_df(spark, [7.0] * 30), "sid", ts_col="ts").first()
    assert r["z"] is None
    # every score is the pooled mean score: W = n_cur * sa/n
    assert r["w"] == pytest.approx(15 * ((30 + 2) * 30 / 4) / 30, abs=1e-5)


def test_ansari_multi_key_independent(spark):
    rng = np.random.default_rng(47)
    a = [("a", i, float(v)) for i, v in enumerate(rng.normal(0, 1, 80))]
    b = [
        ("b", i, float(v))
        for i, v in enumerate(
            np.concatenate([rng.normal(0, 1, 40), rng.normal(0, 6, 40)])
        )
    ]
    df = spark.createDataFrame(a + b, "sid string, ts long, value double")
    rows = {r["sid"]: r for r in ansari_drift(df, "sid", ts_col="ts").collect()}
    assert abs(rows["a"]["z"]) < 3.0
    assert rows["b"]["z"] < -3.0


# ---------------------------------------------------------------- Kuiper

from eristropy_spark.operators.drift import kuiper_drift  # noqa: E402


def _kuiper_local(vals):
    vals = np.asarray(vals, dtype=float)
    n = len(vals)
    ref, cur = vals[: n // 2], vals[n // 2 :]
    na, nb = len(ref), len(cur)
    xs = np.unique(vals)
    fa = np.searchsorted(np.sort(ref), xs, side="right") / na
    fb = np.searchsorted(np.sort(cur), xs, side="right") / nb
    d = fb - fa
    dplus = max(0.0, d.max())
    dminus = max(0.0, -d.min())
    return dplus + dminus


def test_kuiper_matches_bruteforce(spark):
    rng = np.random.default_rng(53)
    vals = rng.integers(0, 30, 180).astype(float)
    v_ref = _kuiper_local(vals)
    r = kuiper_drift(_df(spark, vals), "sid", ts_col="ts").first()
    assert r["v"] == pytest.approx(v_ref, abs=1e-12)
    assert r["v_num"] == r["vplus_num"] + r["vminus_num"]
    assert r["v_num"] == round(v_ref * r["n_ref"] * r["n_cur"])


def test_kuiper_vs_ks_tail_shift_sensitivity(spark):
    # symmetric tail widening: mass moves to BOTH tails -> KS's single
    # sup point sees each direction separately, Kuiper adds them
    rng = np.random.default_rng(59)
    base = rng.normal(0, 1, 400)
    widened = rng.normal(0, 3, 400)
    vals = np.concatenate([base, widened])
    r = kuiper_drift(_df(spark, vals), "sid", ts_col="ts").first()
    from eristropy_spark.operators.drift import ks_drift

    k = ks_drift(_df(spark, vals), "sid", ts_col="ts").first()
    assert r["vplus_num"] > 0 and r["vminus_num"] > 0
    assert r["v_num"] > k["d_num"]  # V = D+ + D- strictly dominates D
    assert r["p_bound"] < 0.01


def test_kuiper_null_identical_halves_p_one(spark):
    rng = np.random.default_rng(61)
    half = rng.integers(0, 50, 100).astype(float)
    vals = np.concatenate([half, half])  # identical halves
    r = kuiper_drift(_df(spark, vals), "sid", ts_col="ts").first()
    assert r["v_num"] == 0
    assert r["p_bound"] == 1.0


# ---------------------------------------------------------------- Mood scale

from eristropy_spark.operators.drift import mood_scale_drift  # noqa: E402


def _mood_scale_local(vals):
    vals = np.asarray(vals, dtype=float)
    n = len(vals)
    ref, cur = vals[: n // 2], vals[n // 2 :]
    pooled = np.concatenate([ref, cur])
    order = np.argsort(pooled, kind="mergesort")
    pos_scores = (np.arange(1, n + 1) - (n + 1) / 2.0) ** 2
    sp = pooled[order]
    avg = pos_scores.copy()
    i = 0
    while i < n:
        j = i
        while j + 1 < n and sp[j + 1] == sp[i]:
            j += 1
        avg[i : j + 1] = pos_scores[i : j + 1].mean()
        i = j + 1
    a = np.empty(n)
    a[order] = avg
    a_cur = a[len(ref) :]
    t = a_cur.sum()
    sa, sa2 = a.sum(), (a**2).sum()
    e = len(cur) * sa / n
    var = len(ref) * len(cur) * (n * sa2 - sa**2) / (n**2 * (n - 1))
    if var <= 0:
        return t, None
    return t, (t - e) / np.sqrt(var)


@pytest.mark.parametrize("seed,m", [(101, 180), (103, 145)])
def test_mood_scale_matches_bruteforce(spark, seed, m):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 35, m).astype(float)
    t_ref, z_ref = _mood_scale_local(vals)
    r = mood_scale_drift(_df(spark, vals), "sid", ts_col="ts").first()
    assert r["t"] == pytest.approx(t_ref, rel=1e-9)
    assert r["z"] == pytest.approx(z_ref, abs=1e-4)


def test_mood_scale_sign_opposite_to_ansari(spark):
    rng = np.random.default_rng(107)
    base = rng.normal(0, 1, 150)
    wide = rng.normal(0, 6, 150)
    vals = np.concatenate([base, wide])
    zm = mood_scale_drift(_df(spark, vals), "sid", ts_col="ts").first()["z"]
    za = ansari_drift(_df(spark, vals), "sid", ts_col="ts").first()["z"]
    # cur more dispersed: mood scores (quadratic, centre-out) HIGH ->
    # z > 0; ansari scores (ends-in) LOW -> z < 0
    assert zm > 5.0 and za < -5.0


def test_mood_scale_all_tied_null(spark):
    r = mood_scale_drift(_df(spark, [3.0] * 24), "sid", ts_col="ts").first()
    assert r["z"] is None


# ---------------------------------------------------------------- Lepage

from eristropy_spark.operators.drift import lepage_drift, mannwhitney_drift  # noqa: E402


def _mwu_z_local(vals):
    vals = np.asarray(vals, dtype=float)
    n = len(vals)
    ref, cur = vals[: n // 2], vals[n // 2 :]
    pooled = np.concatenate([ref, cur])
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(n)
    sp = pooled[order]
    i = 0
    while i < n:
        j = i
        while j + 1 < n and sp[j + 1] == sp[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    r_cur = ranks[len(ref) :].sum()
    na, nb = len(ref), len(cur)
    u = r_cur - nb * (nb + 1) / 2.0
    _, t = np.unique(pooled, return_counts=True)
    tie = float((t.astype(float) ** 3 - t).sum())
    var_u = (na * nb / 12.0) * ((n + 1) - tie / (n * (n - 1)))
    if var_u <= 0:
        return None
    return (u - na * nb / 2.0) / np.sqrt(var_u)


def test_lepage_components_match_parents(spark):
    rng = np.random.default_rng(127)
    vals = rng.integers(0, 60, 240).astype(float)
    r = lepage_drift(_df(spark, vals), "sid", ts_col="ts").first()
    z_w_ref = _mwu_z_local(vals)
    _, z_ab_ref = _ab_local(vals)
    assert r["z_w"] == pytest.approx(z_w_ref, abs=1e-9)
    assert r["z_ab"] == pytest.approx(z_ab_ref, abs=1e-4)
    assert r["l_stat"] == pytest.approx(
        r["z_w"] ** 2 + r["z_ab"] ** 2, abs=1e-9
    )


def test_lepage_fires_on_shift_or_scale_or_both(spark):
    rng = np.random.default_rng(131)
    base = rng.normal(0, 2, 200)
    shift = np.concatenate([base, rng.normal(5, 2, 200)])
    scale = np.concatenate([base, rng.normal(0, 8, 200)])
    both = np.concatenate([base, rng.normal(5, 8, 200)])
    null = np.concatenate([base, rng.normal(0, 2, 200)])
    l_shift = lepage_drift(_df(spark, shift), "sid", ts_col="ts").first()
    l_scale = lepage_drift(_df(spark, scale), "sid", ts_col="ts").first()
    l_both = lepage_drift(_df(spark, both), "sid", ts_col="ts").first()
    l_null = lepage_drift(_df(spark, null), "sid", ts_col="ts").first()
    assert l_shift["l_stat"] > 30 and abs(l_shift["z_w"]) > 5
    assert l_scale["l_stat"] > 30 and abs(l_scale["z_ab"]) > 5
    assert l_both["l_stat"] > 60
    assert l_null["l_stat"] < 12


def test_lepage_all_tied_null(spark):
    r = lepage_drift(_df(spark, [5.0] * 30), "sid", ts_col="ts").first()
    assert r["l_stat"] is None and r["z_w"] is None and r["z_ab"] is None


# ---------------------------------------------------------------- Cucconi

from eristropy_spark.operators.drift import cucconi_drift  # noqa: E402


def _cucconi_local(vals):
    vals = np.asarray(vals, dtype=float)
    n = len(vals)
    ref, cur = vals[: n // 2], vals[n // 2 :]
    pooled = np.concatenate([ref, cur])
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(n)
    sp = pooled[order]
    i = 0
    while i < n:
        j = i
        while j + 1 < n and sp[j + 1] == sp[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    rj = ranks[len(ref) :]
    na, nb = len(ref), len(cur)
    sig = np.sqrt(na * nb * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5.0)
    u = (6 * (rj**2).sum() - nb * (n + 1) * (2 * n + 1)) / sig
    v = (6 * ((n + 1 - rj) ** 2).sum() - nb * (n + 1) * (2 * n + 1)) / sig
    rho = 2.0 * (n * n - 4.0) / ((2 * n + 1.0) * (8 * n + 11.0)) - 1.0
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    return u, v, c


def test_cucconi_matches_bruteforce(spark):
    rng = np.random.default_rng(137)
    vals = rng.integers(0, 45, 220).astype(float)
    u_ref, v_ref, c_ref = _cucconi_local(vals)
    r = cucconi_drift(_df(spark, vals), "sid", ts_col="ts").first()
    assert r["u"] == pytest.approx(u_ref, abs=1e-9)
    assert r["v"] == pytest.approx(v_ref, abs=1e-9)
    assert r["c_stat"] == pytest.approx(c_ref, abs=1e-9)


def test_cucconi_fires_on_shift_scale_both_not_null(spark):
    rng = np.random.default_rng(139)
    base = rng.normal(0, 2, 200)
    shift = np.concatenate([base, rng.normal(6, 2, 200)])
    scale = np.concatenate([base, rng.normal(0, 9, 200)])
    null = np.concatenate([base, rng.normal(0, 2, 200)])
    c_sh = cucconi_drift(_df(spark, shift), "sid", ts_col="ts").first()["c_stat"]
    c_sc = cucconi_drift(_df(spark, scale), "sid", ts_col="ts").first()["c_stat"]
    c_0 = cucconi_drift(_df(spark, null), "sid", ts_col="ts").first()["c_stat"]
    assert c_sh > 15 and c_sc > 15
    assert c_0 < 6


def test_cucconi_all_tied_null(spark):
    r = cucconi_drift(_df(spark, [9.0] * 30), "sid", ts_col="ts").first()
    assert r["c_stat"] is None


# ---------------------------------------------------------------- Fligner-Policello

from eristropy_spark.operators.drift import fligner_policello_drift  # noqa: E402


def _fp_local(vals):
    vals = np.asarray(vals, dtype=float)
    n = len(vals)
    x, y = vals[: n // 2], vals[n // 2 :]  # ref, cur
    P = np.array([(y < xi).sum() + 0.5 * (y == xi).sum() for xi in x])
    Q = np.array([(x < yj).sum() + 0.5 * (x == yj).sum() for yj in y])
    vx = ((P - P.mean()) ** 2).sum()
    vy = ((Q - Q.mean()) ** 2).sum()
    stud = vx + vy + P.mean() * Q.mean()
    if stud <= 0:
        return None
    return (Q.sum() - P.sum()) / (2.0 * np.sqrt(stud))


def test_fp_matches_bruteforce(spark):
    rng = np.random.default_rng(149)
    vals = rng.integers(0, 40, 190).astype(float)
    u_ref = _fp_local(vals)
    r = fligner_policello_drift(_df(spark, vals), "sid", ts_col="ts").first()
    assert r["u_stat"] == pytest.approx(u_ref, abs=1e-4)
    # doubled placement sums are exact integers
    n = len(vals)
    x, y = vals[: n // 2], vals[n // 2 :]
    P = np.array([(y < xi).sum() + 0.5 * (y == xi).sum() for xi in x])
    Q = np.array([(x < yj).sum() + 0.5 * (x == yj).sum() for yj in y])
    assert r["p2_sum"] == int(round(2 * P.sum()))
    assert r["q2_sum"] == int(round(2 * Q.sum()))


def test_fp_robust_to_unequal_variance_null(spark):
    # same center, very different spreads: a LOCATION test should stay
    # calm; FP is built for exactly this (MWU's variance is misspecified)
    rng = np.random.default_rng(151)
    vals = np.concatenate([rng.normal(0, 1, 250), rng.normal(0, 10, 250)])
    shift = np.concatenate([rng.normal(0, 1, 250), rng.normal(12, 10, 250)])
    u_null = fligner_policello_drift(
        _df(spark, vals), "sid", ts_col="ts"
    ).first()["u_stat"]
    u_shift = fligner_policello_drift(
        _df(spark, shift), "sid", ts_col="ts"
    ).first()["u_stat"]
    assert abs(u_null) < 3.0
    assert u_shift > 5.0


def test_fp_degenerate_null(spark):
    # fully separated halves: placements are constant -> V = 0 but
    # Pbar*Qbar = 0 too... actually separated: P all 0, Q all n/2;
    # Pbar*Qbar = 0 -> stud = 0 -> NULL (documented)
    vals = np.concatenate([np.arange(10), np.arange(100, 110)]).astype(float)
    r = fligner_policello_drift(_df(spark, vals), "sid", ts_col="ts").first()
    assert r["u_stat"] is None
    # all-tied halves: every placement is n/4 exactly, V = 0 but
    # Pbar*Qbar > 0 -> U is a well-defined 0 (no location evidence)
    all_tied = fligner_policello_drift(
        _df(spark, [4.0] * 20), "sid", ts_col="ts"
    ).first()
    assert all_tied["u_stat"] == 0.0
