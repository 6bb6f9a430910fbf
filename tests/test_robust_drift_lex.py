"""Round-5 batch: wasserstein_drift, robust_scale, lexical_richness —
local-recomputation parity, degenerate inputs, discrimination
properties, and partition invariance."""

import datetime as dt
import math
from collections import Counter

import numpy as np
import pytest

from eristropy_spark.operators.drift import wasserstein_drift
from eristropy_spark.operators.robust import robust_scale
from eristropy_spark.operators.text import lexical_richness


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=float(sec))


def _events_df(spark, series: dict[str, list[float]]):
    rows = [
        (k, "s", _ts(i), i, float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows,
        "user_id string, event_type string, ts timestamp, "
        "event_id long, value double",
    )


def _keyed(df):
    return {r["user_id"]: r for r in df.collect()}


def _w1_local(vals):
    """Exact 1-D W1 between first and second half, the integral-of-
    |CDF gap| formulation (independent of the operator's decimal
    plumbing up to the 12-dp term grid)."""
    n = len(vals)
    a = np.sort(np.asarray(vals[: n // 2], dtype=float))
    b = np.sort(np.asarray(vals[n // 2:], dtype=float))
    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, xs, side="right") / len(a)
    fb = np.searchsorted(b, xs, side="right") / len(b)
    return float(np.sum(np.abs(fa - fb)[:-1] * np.diff(xs)))


# ------------------------------------------------- wasserstein_drift


def test_wasserstein_parity(spark):
    rng = np.random.default_rng(7)
    series = {
        "noise": list(rng.normal(0, 1, 120)),
        "shift": list(rng.normal(0, 1, 60)) + list(rng.normal(5, 1, 60)),
        "walk": list(np.cumsum(rng.normal(0, 1, 121))),
    }
    got = _keyed(
        wasserstein_drift(
            _events_df(spark, series),
            ("user_id", "event_type"),
            tiebreak_col="event_id",
        )
    )
    for k, vals in series.items():
        n = len(vals)
        assert got[k]["n_ref"] == n // 2
        assert got[k]["n_cur"] == n - n // 2
        assert got[k]["w1"] == pytest.approx(_w1_local(vals), abs=1e-6)


def test_wasserstein_level_shift_equals_shift(spark):
    # disjoint supports: W1 between U and U+delta is exactly delta
    base = list(np.linspace(0.0, 1.0, 50))
    series = {"s": base + [v + 10.0 for v in base]}
    got = _keyed(
        wasserstein_drift(_events_df(spark, series), ("user_id", "event_type"))
    )
    assert got["s"]["w1"] == pytest.approx(10.0, abs=1e-5)


def test_wasserstein_constant_and_tiny(spark):
    got = _keyed(
        wasserstein_drift(
            _events_df(spark, {"const": [3.0] * 40, "one": [1.0]}),
            ("user_id", "event_type"),
        )
    )
    assert got["const"]["w1"] == 0.0
    # n=1: first half empty -> NULL statistic
    assert got["one"]["n_ref"] == 0
    assert got["one"]["w1"] is None


def test_wasserstein_partition_invariance(spark):
    rng = np.random.default_rng(11)
    series = {f"k{i}": list(rng.normal(i, 1 + i, 80)) for i in range(6)}
    df = _events_df(spark, series)
    a = _keyed(
        wasserstein_drift(df.repartition(1), ("user_id", "event_type"))
    )
    b = _keyed(
        wasserstein_drift(df.repartition(13), ("user_id", "event_type"))
    )
    for k in series:
        assert a[k]["w1"] == b[k]["w1"]  # bit-identical (decimal sums)


# ------------------------------------------------------ robust_scale


def test_robust_scale_matches_numpy(spark):
    rng = np.random.default_rng(3)
    series = {
        "noise": list(rng.normal(10, 2, 101)),
        "heavy": list(rng.standard_t(2, 101) * 3),
    }
    got = _keyed(robust_scale(_events_df(spark, series), ("user_id", "event_type")))
    for k, vals in series.items():
        v = np.asarray(vals)
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        sig = 1.4826 * mad
        assert got[k]["n"] == len(vals)
        assert got[k]["med"] == pytest.approx(med, rel=1e-12)
        assert got[k]["mad"] == pytest.approx(mad, rel=1e-12)
        assert got[k]["sigma_mad"] == pytest.approx(sig, rel=1e-12)
        assert got[k]["n_outliers"] == int(np.sum(np.abs(v - med) > 3.0 * sig))


def test_robust_scale_outlier_immunity(spark):
    # one absurd spike: mean/std-based z would explode, MAD barely moves
    base = list(np.linspace(0.0, 1.0, 99))
    got = _keyed(
        robust_scale(
            _events_df(spark, {"spiked": base + [1e9], "clean": base + [1.0]}),
            ("user_id", "event_type"),
        )
    )
    assert got["spiked"]["mad"] == pytest.approx(got["clean"]["mad"], rel=0.05)
    assert got["spiked"]["n_outliers"] == 1
    assert got["clean"]["n_outliers"] == 0


def test_robust_scale_constant_and_validation(spark):
    got = _keyed(
        robust_scale(_events_df(spark, {"const": [5.0] * 30}), ("user_id", "event_type"))
    )
    assert got["const"]["mad"] == 0.0
    assert got["const"]["n_outliers"] == 0
    with pytest.raises(ValueError, match="c must be"):
        robust_scale(
            _events_df(spark, {"x": [1.0]}), ("user_id", "event_type"), c=0.0
        )


# -------------------------------------------------- lexical_richness


def _docs_df(spark, docs: dict[str, str]):
    return spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id string, text string"
    )


def test_lexical_richness_matches_counter(spark):
    docs = {
        "a": "the cat sat on the mat and the cat ran",
        "b": "alpha beta gamma delta",
        "c": "x x x x x x",
    }
    got = {r["doc_id"]: r for r in lexical_richness(_docs_df(spark, docs)).collect()}
    for k, text in docs.items():
        c = Counter(text.split(" "))
        n = sum(c.values())
        v = len(c)
        hapax = sum(1 for x in c.values() if x == 1)
        m2 = sum(x * x for x in c.values())
        row = got[k]
        assert row["n_tokens"] == n
        assert row["n_types"] == v
        assert row["n_hapax"] == hapax
        assert row["ttr"] == pytest.approx(v / n, rel=1e-12)
        assert row["hapax_frac"] == pytest.approx(hapax / v, rel=1e-12)
        assert row["yule_k"] == pytest.approx(1e4 * (m2 - n) / (n * n), rel=1e-12)


def test_lexical_richness_extremes(spark):
    got = {
        r["doc_id"]: r
        for r in lexical_richness(
            _docs_df(spark, {"one": "word", "rep": "a a a a"})
        ).collect()
    }
    # single token: ttr = 1, all hapax, K = 0 (no repetition)
    assert got["one"]["ttr"] == 1.0
    assert got["one"]["yule_k"] == 0.0
    # pure repetition: K = 1e4 * (16-4)/16 = 7500, zero hapax
    assert got["rep"]["n_types"] == 1
    assert got["rep"]["n_hapax"] == 0
    assert got["rep"]["yule_k"] == pytest.approx(7500.0)


def test_lexical_richness_repetition_discriminates(spark):
    rng = np.random.default_rng(5)
    rich = " ".join(f"w{i}" for i in range(200))
    template = " ".join(
        f"w{int(i)}" for i in rng.integers(0, 10, 200)
    )
    got = {
        r["doc_id"]: r
        for r in lexical_richness(
            _docs_df(spark, {"rich": rich, "tpl": template})
        ).collect()
    }
    assert got["tpl"]["yule_k"] > 50 * got["rich"]["yule_k"] + 1
    assert got["rich"]["ttr"] > got["tpl"]["ttr"]


# ------------------------------------- vocab_coverage / token_novelty


def test_vocab_coverage_matches_counter(spark):
    from eristropy_spark.operators.corpus import vocab_coverage

    docs = {
        1: ("a", "the cat sat on the mat"),
        2: ("a", "the dog sat"),
        3: ("b", "alpha beta beta gamma gamma gamma"),
    }
    df = spark.createDataFrame(
        [(k, s, t) for k, (s, t) in docs.items()],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r for r in vocab_coverage(df).collect()}
    for src in ("a", "b"):
        c = Counter(
            w
            for k, (s, t) in docs.items()
            if s == src
            for w in t.split(" ")
        )
        n = sum(c.values())
        f1 = sum(1 for x in c.values() if x == 1)
        f2 = sum(1 for x in c.values() if x == 2)
        row = got[src]
        assert row["n_tokens"] == n
        assert row["n_types"] == len(c)
        assert row["f1"] == f1
        assert row["f2"] == f2
        assert row["p_unseen"] == pytest.approx(f1 / n, rel=1e-12)
        assert row["chao1"] == pytest.approx(
            len(c) + f1 * (f1 - 1) / (2 * (f2 + 1)), rel=1e-12
        )


def test_vocab_coverage_saturation_property(spark):
    # a saturated slice (every word repeated many times) has ~zero
    # missing mass; a one-pass slice of all-distinct words has p_unseen 1
    from eristropy_spark.operators.corpus import vocab_coverage

    df = spark.createDataFrame(
        [
            (1, "sat", " ".join(["w"] * 50)),
            (2, "fresh", " ".join(f"u{i}" for i in range(50))),
        ],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r for r in vocab_coverage(df).collect()}
    assert got["sat"]["p_unseen"] == 0.0
    assert got["sat"]["chao1"] == 1.0  # f1=0 -> floor equals observed V
    assert got["fresh"]["p_unseen"] == 1.0
    assert got["fresh"]["chao1"] == pytest.approx(50 + 50 * 49 / 2)


def test_token_novelty_curve(spark):
    from eristropy_spark.operators.corpus import token_novelty

    df = spark.createDataFrame(
        [
            (10, "a b c"),        # all novel
            (20, "a b d"),        # d novel
            (30, "a b c d"),      # nothing novel
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_novelty(df).collect()}
    assert (got[10]["n_novel"], got[10]["n_types"]) == (3, 3)
    assert (got[20]["n_novel"], got[20]["n_types"]) == (1, 3)
    assert (got[30]["n_novel"], got[30]["n_types"]) == (0, 4)
    assert got[20]["novelty_frac"] == pytest.approx(1 / 3, abs=1e-6)


def test_token_novelty_partition_invariance(spark):
    from eristropy_spark.operators.corpus import token_novelty

    rng = np.random.default_rng(2)
    rows = [
        (int(i), " ".join(f"t{int(x)}" for x in rng.integers(0, 40, 20)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r for r in token_novelty(df.repartition(1)).collect()}
    b = {r["doc_id"]: r for r in token_novelty(df.repartition(7)).collect()}
    assert a == b
    # freshness is conserved: total novel types == corpus vocabulary
    vocab = {w for _, t in rows for w in t.split(" ")}
    assert sum(r["n_novel"] for r in a.values()) == len(vocab)


# ------------------------------------------------------- heaps_law


def test_heaps_law_recovers_planted_exponent(spark):
    """Synthetic corpus drawn so V(N) ~ N^beta by construction: doc d
    introduces ~c*(N_d^b - N_{d-1}^b) fresh words among repeats."""
    from eristropy_spark.operators.corpus import heaps_law

    b_true = 0.5
    rows = []
    vocab_next = 0
    n_seen = 0
    for d in range(60):
        words = []
        for _ in range(40):
            n_seen += 1
            target_v = int(round(3.0 * n_seen**b_true))
            if target_v > vocab_next:
                words.append(f"new{vocab_next}")
                vocab_next = target_v
            else:
                words.append(f"new{max(0, vocab_next - 3)}")
        rows.append((int(d), "s", " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = heaps_law(df).collect()[0]
    assert got["n_docs"] == 60
    assert got["beta"] == pytest.approx(b_true, abs=0.08)
    assert got["k"] == pytest.approx(3.0, rel=0.5)


def test_heaps_law_matches_numpy_fit(spark):
    from eristropy_spark.operators.corpus import heaps_law

    rng = np.random.default_rng(4)
    rows = [
        (int(d), "s", " ".join(f"t{int(x)}" for x in rng.zipf(1.5, 30) % 500))
        for d in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = heaps_law(df).collect()[0]

    # independent local recomputation of the cumulative curve + fit
    seen: set[str] = set()
    nd = vd = 0
    xs, ys = [], []
    for d, _, text in sorted(rows):
        ws = text.split(" ")
        nd += len(ws)
        for w in ws:
            if w not in seen:
                seen.add(w)
                vd += 1
        xs.append(np.log(nd))
        ys.append(np.log(vd))
    beta, lnk = np.polyfit(xs, ys, 1)
    assert got["n_tokens"] == nd
    assert got["n_types"] == len(seen)
    assert got["beta"] == pytest.approx(float(beta), abs=1e-9)
    assert got["k"] == pytest.approx(float(np.exp(lnk)), rel=1e-9)


def test_heaps_law_degenerate_single_doc(spark):
    from eristropy_spark.operators.corpus import heaps_law

    df = spark.createDataFrame(
        [(1, "s", "a b c")], "doc_id long, source string, text string"
    )
    got = heaps_law(df).collect()[0]
    assert got["beta"] is None and got["k"] is None
    assert got["n_types"] == 3


# ------------------------------------------------------------ pacf


def test_pacf_matches_durbin_levinson(spark):
    """Full Durbin–Levinson recursion (independent implementation) on
    the same 6-dp-quantized autocorrelations."""
    from eristropy_spark.operators.acf import pacf_points

    rng = np.random.default_rng(8)
    rows = [
        (f"d{i}", [int(x) for x in rng.integers(0, 100, 60)])
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r for r in pacf_points(df).collect()}

    def q6(v):
        return math.floor(v * 1e6 + 0.5) / 1e6

    for doc_id, toks in rows:
        x = np.asarray(toks, dtype=float)
        n = x.size
        mu = float(x.sum()) / n
        d = x - mu
        den = float(d @ d)
        r = [1.0] + [q6(float(d[:-k] @ d[k:]) / den) for k in (1, 2, 3)]
        # Durbin–Levinson, general recursion
        phi_prev: list[float] = []
        pacf = []
        for k in range(1, 4):
            num = r[k] - sum(phi_prev[j] * r[k - 1 - j] for j in range(k - 1))
            den_k = 1.0 - sum(phi_prev[j] * r[j + 1] for j in range(k - 1))
            a = num / den_k
            pacf.append(a)
            phi_prev = [p - a * q for p, q in zip(phi_prev, phi_prev[::-1])] + [a]
        row = got[doc_id]
        assert row["pacf1"] == pytest.approx(pacf[0], abs=2e-6)
        assert row["pacf2"] == pytest.approx(pacf[1], abs=2e-6)
        assert row["pacf3"] == pytest.approx(pacf[2], abs=2e-6)


def test_pacf_ar1_cutoff(spark):
    """For an AR(1) process, PACF cuts off after lag 1: pacf2/pacf3
    are near zero while pacf1 ~ phi."""
    from eristropy_spark.operators.acf import pacf_points

    rng = np.random.default_rng(9)
    x = [0.0]
    for _ in range(2000):
        x.append(0.7 * x[-1] + rng.normal())
    toks = [int(round(v * 100)) for v in x]
    df = spark.createDataFrame(
        [("ar1", toks)], "doc_id string, tokens array<int>"
    )
    row = pacf_points(df).collect()[0]
    assert row["pacf1"] == pytest.approx(0.7, abs=0.06)
    assert abs(row["pacf2"]) < 0.08
    assert abs(row["pacf3"]) < 0.08


def test_pacf_degenerate(spark):
    from eristropy_spark.operators.acf import pacf_points

    df = spark.createDataFrame(
        [("short", [1, 2, 3]), ("const", [5] * 20)],
        "doc_id string, tokens array<int>",
    )
    got = {r["doc_id"]: r for r in pacf_points(df).collect()}
    assert got["short"]["pacf1"] is None
    assert got["const"]["pacf1"] is None


# ----------------------------------------------------- ccnet_buckets


def test_ccnet_buckets_tercile_structure(spark):
    from eristropy_spark.operators.text import build_vocab, ccnet_buckets

    rng = np.random.default_rng(6)
    rows = []
    for i in range(90):
        src = "a" if i < 45 else "b"
        # typical docs reuse a small vocab; junk docs are all-OOV
        if i % 3 == 0:
            text = " ".join(f"junk{i}_{j}" for j in range(20))
        else:
            text = " ".join(
                f"w{int(x)}" for x in rng.integers(0, 10, 20)
            )
        rows.append((i, src, text))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    vocab = build_vocab(df, top_k=50, min_count=2)
    out = ccnet_buckets(df, vocab).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert len(out) == 90
    for src, rs in by_src.items():
        got = {b: [r["score"] for r in rs if r["bucket"] == b]
               for b in ("head", "middle", "tail")}
        # ordering invariant: every head score >= every middle score
        # >= every tail score
        assert min(got["head"]) >= max(got["middle"])
        assert min(got["middle"]) >= max(got["tail"])
        # terciles are roughly balanced
        for b in ("head", "middle", "tail"):
            assert 45 / 5 <= len(got[b]) <= 45 * 2 / 3
    # the all-OOV junk docs all land in tail
    junk_ids = {i for i in range(90) if i % 3 == 0}
    for r in out:
        if r["doc_id"] in junk_ids:
            assert r["bucket"] == "tail"


def test_ccnet_buckets_partition_invariance(spark):
    from eristropy_spark.operators.text import build_vocab, ccnet_buckets

    rng = np.random.default_rng(7)
    rows = [
        (i, "s", " ".join(f"w{int(x)}" for x in rng.integers(0, 30, 15)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    vocab = build_vocab(df, top_k=20, min_count=2)
    a = {r["doc_id"]: r["bucket"]
         for r in ccnet_buckets(df.repartition(1), vocab).collect()}
    b = {r["doc_id"]: r["bucket"]
         for r in ccnet_buckets(df.repartition(9), vocab).collect()}
    assert a == b


# -------------------------------------------------------- cvm_drift


def _cvm_local(vals):
    """Literal pooled-census CvM: T = (nm/N²)·Σ w·(Fa−Fb)²."""
    n = len(vals)
    a = np.asarray(vals[: n // 2], dtype=float)
    b = np.asarray(vals[n // 2:], dtype=float)
    na, nb = len(a), len(b)
    xs, wa = np.unique(a, return_counts=True)
    ys, wb = np.unique(b, return_counts=True)
    pooled = np.unique(np.concatenate([xs, ys]))
    ca = np.array([wa[xs == v].sum() for v in pooled])
    cb = np.array([wb[ys == v].sum() for v in pooled])
    cuma, cumb = np.cumsum(ca), np.cumsum(cb)
    w = ca + cb
    gaps = cuma / na - cumb / nb
    N = na + nb
    return float(na * nb / N**2 * np.sum(w * gaps**2))


def test_cvm_matches_local(spark):
    rng = np.random.default_rng(12)
    series = {
        "noise": list(rng.normal(0, 1, 140)),
        "shift": list(rng.normal(0, 1, 70)) + list(rng.normal(1.5, 1, 70)),
        "scale": list(rng.normal(0, 1, 70)) + list(rng.normal(0, 3, 70)),
    }
    from eristropy_spark.operators.drift import cvm_drift

    got = _keyed(
        cvm_drift(_events_df(spark, series), ("user_id", "event_type"),
                  tiebreak_col="event_id")
    )
    for k, vals in series.items():
        assert got[k]["t_stat"] == pytest.approx(_cvm_local(vals), abs=1e-6)
    # discrimination: drifted series far exceed the 0.461 critical
    # value and the stable one doesn't
    assert got["shift"]["t_stat"] > 0.461
    assert got["scale"]["t_stat"] > 0.461
    assert got["noise"]["t_stat"] < 0.461
    assert got["shift"]["t_adj"] > 2.0
    assert got["noise"]["t_adj"] < 2.0


def test_cvm_degenerate_and_invariance(spark):
    from eristropy_spark.operators.drift import cvm_drift

    rng = np.random.default_rng(13)
    series = {"one": [1.0], "const": [2.0] * 30,
              "x": list(rng.normal(0, 1, 75))}
    df = _events_df(spark, series)
    got = _keyed(cvm_drift(df, ("user_id", "event_type")))
    assert got["one"]["t_stat"] is None
    assert got["const"]["t_stat"] == 0.0  # identical halves
    a = _keyed(cvm_drift(df.repartition(1), ("user_id", "event_type")))
    b = _keyed(cvm_drift(df.repartition(7), ("user_id", "event_type")))
    for k in series:
        assert a[k]["t_stat"] == b[k]["t_stat"]


# -------------------------------------------------------- cvar_tail


def test_cvar_matches_numpy(spark):
    from eristropy_spark.operators.tails import cvar_tail

    rng = np.random.default_rng(14)
    series = {
        "normal": list(rng.normal(0, 1, 200)),
        "heavy": list(rng.standard_t(2, 200) * 2),
    }
    got = _keyed(cvar_tail(_events_df(spark, series), ("user_id", "event_type")))
    for k, vals in series.items():
        v = np.asarray(vals)
        var = float(np.quantile(v, 0.95, method="linear"))
        q6 = np.floor(v[v >= var] * 1e6 + 0.5) / 1e6
        cvar = float(q6.mean())
        row = got[k]
        assert row["var_alpha"] == pytest.approx(var, rel=1e-9)
        assert row["n_exceed"] == int((v >= var).sum())
        assert row["cvar"] == pytest.approx(cvar, abs=1e-6)
        assert row["mean_excess"] == pytest.approx(cvar - var, abs=1e-6)
        assert row["cvar"] >= row["var_alpha"]
    # heavier tail -> larger mean excess
    assert got["heavy"]["mean_excess"] > got["normal"]["mean_excess"]


def test_cvar_degenerate_and_validation(spark):
    from eristropy_spark.operators.tails import cvar_tail

    got = _keyed(
        cvar_tail(_events_df(spark, {"const": [2.0] * 20, "one": [3.0]}),
                  ("user_id", "event_type"))
    )
    assert got["const"]["cvar"] == 2.0
    assert got["const"]["mean_excess"] == 0.0
    assert got["one"]["n_exceed"] == 1 and got["one"]["cvar"] == 3.0
    with pytest.raises(ValueError, match="alpha"):
        cvar_tail(_events_df(spark, {"x": [1.0]}), "user_id", alpha=1.0)


# ----------------------------------------------------- gini_balance


def test_gini_matches_textbook(spark):
    from eristropy_spark.operators.sampling import gini_balance

    rng = np.random.default_rng(15)
    rows = []
    # uniform source: every doc 10 tokens -> G = 0
    for i in range(30):
        rows.append((i, "uniform", " ".join(["w"] * 10)))
    # skewed source: one giant doc among tiny ones
    for i in range(30, 60):
        n = 1000 if i == 30 else 2
        rows.append((i, "skewed", " ".join(["w"] * n)))
    # zipf-ish source, checked against the textbook mean-difference form
    sizes = [int(x) for x in rng.zipf(1.8, 40) % 200 + 1]
    for j, n in enumerate(sizes):
        rows.append((100 + j, "zipf", " ".join(["w"] * n)))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in gini_balance(df).collect()}

    assert got["uniform"]["gini"] == 0.0
    assert got["skewed"]["gini"] > 0.9

    x = np.sort(np.asarray(sizes, dtype=float))
    n = len(x)
    want = float(
        (2 * np.sum(np.arange(1, n + 1) * x) - (n + 1) * x.sum())
        / (n * x.sum())
    )
    assert got["zipf"]["gini"] == pytest.approx(want, abs=1e-6)
    # textbook identity: G = mean absolute difference / (2*mean)
    mad = np.abs(x[:, None] - x[None, :]).mean()
    assert got["zipf"]["gini"] == pytest.approx(
        mad / (2 * x.mean()), abs=1e-6
    )


def test_gini_partition_invariance(spark):
    from eristropy_spark.operators.sampling import gini_balance

    rng = np.random.default_rng(16)
    rows = [
        (i, "s", " ".join(["w"] * int(rng.integers(1, 50))))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = gini_balance(df.repartition(1)).collect()[0]["gini"]
    b = gini_balance(df.repartition(13)).collect()[0]["gini"]
    assert a == b


# ---------------------------------------------------- quantile_drift


def test_quantile_drift_matches_numpy(spark):
    from eristropy_spark.operators.drift import quantile_drift

    rng = np.random.default_rng(17)
    vals = list(rng.normal(0, 1, 80)) + list(rng.normal(0, 3, 80))
    got = quantile_drift(
        _events_df(spark, {"s": vals}), ("user_id", "event_type"),
        tiebreak_col="event_id",
    ).collect()
    assert len(got) == 5
    a = np.asarray(vals[:80])
    b = np.asarray(vals[80:])
    for r in got:
        p = r["p"]
        assert r["q_ref"] == pytest.approx(
            float(np.quantile(a, p, method="linear")), abs=1e-6
        )
        assert r["q_cur"] == pytest.approx(
            float(np.quantile(b, p, method="linear")), abs=1e-6
        )
        assert r["shift"] == pytest.approx(r["q_cur"] - r["q_ref"], abs=2e-6)
    # a scale blow-up: tails shift outward, the median barely moves
    by_p = {r["p"]: r["shift"] for r in got}
    assert by_p[0.9] > 1.0 and by_p[0.1] < -1.0
    assert abs(by_p[0.5]) < 0.6


def test_quantile_drift_level_shift_uniform(spark):
    from eristropy_spark.operators.drift import quantile_drift

    base = list(np.linspace(0, 1, 60))
    got = quantile_drift(
        _events_df(spark, {"s": base + [v + 5.0 for v in base]}),
        ("user_id", "event_type"),
    ).collect()
    # a pure level shift moves EVERY quantile by the same amount
    for r in got:
        assert r["shift"] == pytest.approx(5.0, abs=1e-9)


def test_quantile_drift_single_point_and_validation(spark):
    from eristropy_spark.operators.drift import quantile_drift

    got = quantile_drift(
        _events_df(spark, {"one": [2.0]}), ("user_id", "event_type")
    ).collect()
    for r in got:
        assert r["q_ref"] is None  # first half empty at n=1
        assert r["shift"] is None
    with pytest.raises(ValueError, match="probs"):
        quantile_drift(
            _events_df(spark, {"x": [1.0]}), "user_id", probs=(0.0, 0.5)
        )


# ------------------------------------------------------ seasonal_mk


def test_seasonal_mk_ignores_pure_seasonality(spark):
    """A stable seasonal cycle fools plain MK (strong |z|) but not the
    seasonal test (z ~ 0); a real trend trips both."""
    from eristropy_spark.operators.robust import (
        mann_kendall,
        seasonal_mann_kendall,
    )

    cycle = [10, 50, 90, 50, 10, 0] * 20
    rng = np.random.default_rng(18)
    noise = [int(x) for x in rng.integers(-3, 4, 120)]
    seasonal = [c + e for c, e in zip(cycle, noise)]
    trended = [v + 2 * (i // 6) for i, v in enumerate(seasonal)]
    df = spark.createDataFrame(
        [("seasonal", seasonal), ("trended", trended)],
        "doc_id string, tokens array<int>",
    )
    smk = {r["doc_id"]: r for r in
           seasonal_mann_kendall(df, period=6).collect()}
    assert abs(smk["seasonal"]["z"]) < 1.96  # no trend detected
    assert smk["trended"]["z"] > 3.0  # real cross-cycle trend detected


def test_seasonal_mk_matches_local(spark):
    from eristropy_spark.operators.robust import seasonal_mann_kendall

    rng = np.random.default_rng(19)
    toks = [int(x) for x in rng.integers(0, 30, 75)]
    row = seasonal_mann_kendall(
        spark.createDataFrame([("d", toks)], "doc_id string, tokens array<int>"),
        period=6,
    ).collect()[0]

    s = 0
    var_num = 0
    for g in range(6):
        xg = toks[g::6]
        ng = len(xg)
        for a in range(ng):
            for b in range(a + 1, ng):
                s += (xg[b] > xg[a]) - (xg[b] < xg[a])
        from collections import Counter
        tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xg).values())
        var_num += ng * (ng - 1) * (2 * ng + 5) - tie
    var_s = var_num / 18.0
    z = (s - 1) / math.sqrt(var_s) if s > 0 else (
        (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
    )
    assert row["s"] == s
    assert row["var_s"] == var_s
    assert row["z"] == z


def test_seasonal_mk_degenerate(spark):
    from eristropy_spark.operators.robust import seasonal_mann_kendall

    df = spark.createDataFrame(
        [("short", [1, 2, 3]), ("const", [5] * 36)],
        "doc_id string, tokens array<int>",
    )
    got = {r["doc_id"]: r for r in
           seasonal_mann_kendall(df, period=6).collect()}
    assert got["short"]["s"] is None  # no phase has 2 points
    assert got["const"]["s"] == 0 and got["const"]["z"] is None  # var 0
    with pytest.raises(ValueError, match="period"):
        seasonal_mann_kendall(df, period=1)


# -------------------------------------------------- normality_stats


def test_normality_matches_scipy_free_local(spark):
    from eristropy_spark.operators.normality import normality_stats

    rng = np.random.default_rng(22)
    series = {
        "normal": list(rng.normal(10, 2, 300)),
        "heavy": list(rng.standard_t(3, 300) * 2),
        "skewed": list(rng.exponential(2.0, 300)),
    }
    got = _keyed(normality_stats(_events_df(spark, series), ("user_id", "event_type")))
    for k, vals in series.items():
        v6 = np.floor(np.asarray(vals) * 1e6 + 0.5) / 1e6
        mean6 = math.floor(v6.mean() * 1e6 + 0.5) / 1e6
        du = np.round((v6 - mean6) * 1e6).astype(np.int64)
        n = len(vals)
        m2 = (float((du.astype(object) ** 2).sum()) / 1e12) / n
        m3 = (float((du.astype(object) ** 3).sum()) / 1e18) / n
        m4 = (float((du.astype(object) ** 4).sum()) / 1e24) / n
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3
        jb = n / 6 * (skew**2 + kurt**2 / 4)
        row = got[k]
        assert row["skew"] == pytest.approx(skew, abs=2e-6)
        assert row["kurt_excess"] == pytest.approx(kurt, abs=2e-6)
        assert row["jb"] == pytest.approx(jb, abs=1e-4)
    # discrimination: normal passes (jb < 5.99 usually), heavy/skewed fail
    assert got["normal"]["jb"] < 8
    assert got["heavy"]["jb"] > 20 and got["heavy"]["kurt_excess"] > 1
    assert got["skewed"]["jb"] > 20 and got["skewed"]["skew"] > 1


def test_normality_grubbs_flags_spike(spark):
    from eristropy_spark.operators.normality import normality_stats

    rng = np.random.default_rng(23)
    base = list(rng.normal(0, 1, 99))
    got = _keyed(
        normality_stats(
            _events_df(spark, {"spiked": base + [15.0], "clean": base + [0.0]}),
            ("user_id", "event_type"),
        )
    )
    # Grubbs critical value at n=100, alpha=0.05 is ~3.38
    assert got["spiked"]["g_max"] > 3.38
    assert got["clean"]["g_max"] < 3.38


def test_normality_degenerate(spark):
    from eristropy_spark.operators.normality import normality_stats

    got = _keyed(
        normality_stats(
            _events_df(spark, {"const": [4.0] * 20, "two": [1.0, 2.0]}),
            ("user_id", "event_type"),
        )
    )
    assert got["const"]["jb"] is None and got["const"]["std"] == 0.0
    assert got["two"]["jb"] is None and got["two"]["std"] is not None


# ------------------------------------------------- categorical_drift


def _cat_events_df(spark, series):
    rows = [
        (k, str(c), _ts(i), i)
        for k, cats in series.items()
        for i, c in enumerate(cats)
    ]
    return spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp, event_id long"
    )


def test_categorical_drift_matches_local(spark):
    from eristropy_spark.operators.drift import categorical_drift

    rng = np.random.default_rng(24)
    series = {
        "stable": list(rng.choice(["a", "b", "c"], 120, p=[0.5, 0.3, 0.2])),
        "flip": ["a"] * 60 + ["b"] * 60,
        "new_cat": list(rng.choice(["a", "b"], 60)) + ["z"] * 60,
    }
    got = {
        r["user_id"]: r
        for r in categorical_drift(
            _cat_events_df(spark, series), "user_id",
            cat_col="event_type", tiebreak_col="event_id",
        ).collect()
    }
    for k, cats in series.items():
        n = len(cats)
        ref, cur = cats[: n // 2], cats[n // 2:]
        union = sorted(set(cats))
        C = len(union)
        js = 0.0
        for c in union:
            p = (ref.count(c) + 0.5) / (len(ref) + 0.5 * C)
            q = (cur.count(c) + 0.5) / (len(cur) + 0.5 * C)
            m = (p + q) / 2
            js += (p * math.log(p / m) + q * math.log(q / m)) / 2
        row = got[k]
        assert row["n_cats"] == C
        assert row["js_div"] == pytest.approx(js, abs=1e-6)
    # discrimination + the ln2 bound
    assert got["flip"]["js_div"] > 0.5
    assert got["new_cat"]["js_div"] > 0.3
    assert got["stable"]["js_div"] < 0.05
    for k in series:
        assert 0.0 <= got[k]["js_div"] <= math.log(2) + 1e-9


def test_categorical_drift_degenerate_and_invariance(spark):
    from eristropy_spark.operators.drift import categorical_drift

    series = {"one": ["a"], "const": ["x"] * 30}
    df = _cat_events_df(spark, series)
    got = {
        r["user_id"]: r
        for r in categorical_drift(df, "user_id", cat_col="event_type").collect()
    }
    assert got["one"]["js_div"] is None  # empty first half
    assert got["const"]["js_div"] == 0.0  # identical mixes
    a = {r["user_id"]: r["js_div"] for r in categorical_drift(
        df.repartition(1), "user_id", cat_col="event_type").collect()}
    b = {r["user_id"]: r["js_div"] for r in categorical_drift(
        df.repartition(5), "user_id", cat_col="event_type").collect()}
    assert a == b


# ------------------------------------------------------------ theil


def test_theil_matches_textbook(spark):
    from eristropy_spark.operators.sampling import theil_inequality

    rng = np.random.default_rng(43)
    rows = []
    for i in range(30):
        rows.append((i, "uniform", " ".join(["w"] * 10)))
    for i in range(30, 60):
        n = 5000 if i == 30 else 2
        rows.append((i, "giant", " ".join(["w"] * n)))
    sizes = [int(x) for x in rng.zipf(1.8, 50) % 300 + 1]
    for j, n in enumerate(sizes):
        rows.append((100 + j, "zipf", " ".join(["w"] * n)))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in theil_inequality(df).collect()}

    # uniform: all indices ~0
    assert abs(got["uniform"]["theil_t"]) < 1e-9
    assert abs(got["uniform"]["atkinson_1"]) < 1e-9
    # one giant among near-empty docs: extreme by both tails (the
    # giant drives T, the 29 docs far below the mean drive L)
    assert got["giant"]["theil_t"] > 2.0
    assert got["giant"]["theil_l"] > 2.0
    assert got["giant"]["atkinson_1"] > 0.9

    x = np.asarray(sizes, dtype=float)
    S, n = x.sum(), len(x)
    t_want = float((x * np.log(x)).sum() / S - np.log(S / n))
    l_want = float(np.log(S / n) - np.log(x).mean())
    r = got["zipf"]
    assert r["theil_t"] == pytest.approx(t_want, abs=1e-6)
    assert r["theil_l"] == pytest.approx(l_want, abs=1e-6)
    assert r["atkinson_1"] == pytest.approx(1 - np.exp(-l_want), abs=1e-6)
    assert r["n_docs"] == r["n_pos"] == n and r["total_tok"] == int(S)


def test_theil_partition_invariance(spark):
    from eristropy_spark.operators.sampling import theil_inequality

    rng = np.random.default_rng(44)
    rows = [
        (i, f"s{i % 3}", " ".join(["w"] * int(rng.integers(1, 80))))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = theil_inequality(df.repartition(1)).orderBy("source").collect()
    b = theil_inequality(df.repartition(17)).orderBy("source").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
