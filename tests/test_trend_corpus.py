"""Round-5 batch: rolling_quantile, theilsen_trend, holt, ar2_forecast,
pmi_collocations, corpus_divergence — hand-computed goldens, numpy /
local-recomputation parity, degenerate inputs, partition invariance."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from eristropy_spark.operators.acf import ar2_forecast
from eristropy_spark.operators.corpus import corpus_divergence, pmi_collocations
from eristropy_spark.operators.robust import theilsen_trend
from eristropy_spark.operators.rolling import rolling_quantile
from eristropy_spark.operators.smoothing import holt


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def _r6(v: float) -> float:
    return math.floor(v * 1e6 + 0.5) / 1e6


# ------------------------------------------------------ rolling_quantile


@pytest.fixture(scope="module")
def events_df(spark):
    rows = []
    rng = np.random.default_rng(11)
    for k in ("a", "b"):
        for i in range(40):
            rows.append((len(rows), k, _ts(7.0 * i), float(rng.normal())))
    rows.append((len(rows), "solo", _ts(0.0), 3.5))
    return spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp, value double"
    )


def test_rolling_quantile_matches_local(events_df):
    out = rolling_quantile(
        events_df, "k", window_sec=30.0, probs=(0.5, 0.95)
    ).collect()
    src = events_df.collect()
    by_key = {}
    for r in src:
        by_key.setdefault(r["k"], []).append((r["ts"], r["value"]))
    for row in out:
        vals = sorted(
            v
            for t, v in by_key[row["k"]]
            if row["ts"] - dt.timedelta(seconds=30) <= t <= row["ts"]
        )
        for p, col in ((0.5, "roll_p50"), (0.95, "roll_p95")):
            h = (len(vals) - 1) * p
            lo = int(h)
            want = vals[lo]
            if h > lo:
                want = want + (vals[lo + 1] - want) * (h - lo)
            assert row[col] == pytest.approx(want, abs=1e-12)


def test_rolling_quantile_validation(events_df):
    with pytest.raises(ValueError, match="probs"):
        rolling_quantile(events_df, "k", probs=(1.5,))
    with pytest.raises(ValueError, match="duplicate"):
        rolling_quantile(events_df, "k", probs=(0.5, 0.5))


# -------------------------------------------------------- theilsen_trend


def _tokens_df(spark, seqs):
    return spark.createDataFrame(
        [(k, v) for k, v in seqs.items()], "doc_id string, tokens array<double>"
    )


def test_theilsen_outlier_immunity(spark):
    # clean slope-2 line with one wrecked point: Theil-Sen recovers 2.0,
    # least squares would not
    x = [2.0 * i for i in range(21)]
    x[10] = 1000.0
    out = theilsen_trend(_tokens_df(spark, {"d": x})).collect()[0]
    assert out["slope"] == pytest.approx(2.0)
    assert out["intercept"] == pytest.approx(0.0)
    assert out["n"] == 21


def test_theilsen_matches_numpy_median_pairs(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(size=37).cumsum() + 0.3 * np.arange(37)
    out = theilsen_trend(_tokens_df(spark, {"d": [float(v) for v in x]})).collect()[0]
    i, j = np.triu_indices(37, k=1)
    slopes = np.sort((x[j] - x[i]) / (j - i))
    h = (slopes.size - 1) * 0.5
    lo = int(h)
    want = slopes[lo] + (slopes[lo + 1] - slopes[lo]) * (h - lo)
    assert out["slope"] == pytest.approx(float(want), abs=1e-12)
    resid = np.sort(x - want * np.arange(37))
    h = (resid.size - 1) * 0.5
    lo = int(h)
    want_i = resid[lo] + (resid[lo + 1] - resid[lo]) * (h - lo)
    assert out["intercept"] == pytest.approx(float(want_i), abs=1e-12)


def test_theilsen_degenerate_and_guard(spark):
    out = {
        r["doc_id"]: r
        for r in theilsen_trend(
            _tokens_df(spark, {"one": [5.0], "flat": [2.0, 2.0, 2.0]})
        ).collect()
    }
    assert out["one"]["slope"] is None and out["one"]["intercept"] is None
    assert out["flat"]["slope"] == 0.0 and out["flat"]["intercept"] == 2.0
    big = _tokens_df(spark, {"big": [float(i) for i in range(60)]})
    with pytest.raises(Exception, match="max_points"):
        theilsen_trend(big, max_points=50).collect()


def test_theilsen_partition_invariance(spark):
    rng = np.random.default_rng(9)
    seqs = {f"d{i}": [float(v) for v in rng.normal(size=30)] for i in range(12)}
    a = theilsen_trend(_tokens_df(spark, seqs).repartition(1)).collect()
    b = theilsen_trend(_tokens_df(spark, seqs).repartition(7)).collect()
    ka = {r["doc_id"]: (r["slope"], r["intercept"]) for r in a}
    kb = {r["doc_id"]: (r["slope"], r["intercept"]) for r in b}
    assert ka == kb


# ------------------------------------------------------------------ holt


def test_holt_matches_literal_recursion(spark):
    rng = np.random.default_rng(3)
    rows = []
    series = {}
    for k in ("a", "b"):
        x = list(np.cumsum(rng.normal(size=25)) + np.arange(25) * 0.5)
        series[k] = [float(v) for v in x]
        for i, v in enumerate(series[k]):
            rows.append((len(rows), k, _ts(float(i)), v))
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp, value double"
    )
    got = holt(df, "k", alpha=0.5, beta=0.25, tiebreak_col="event_id").collect()
    by_key = {}
    for r in sorted(got, key=lambda r: r["event_id"]):
        by_key.setdefault(r["k"], []).append(r)
    for k, x in series.items():
        lp, bp = x[0], x[1] - x[0]
        want = [(lp, bp, None)]
        for t in range(1, len(x)):
            f = lp + bp
            lvl = 0.5 * x[t] + 0.5 * f
            bp = 0.25 * (lvl - lp) + 0.75 * bp
            lp = lvl
            want.append((lvl, bp, f))
        for row, (wl, wb, wf) in zip(by_key[k], want):
            # bit-exact: the operator evaluates the same doubles in the
            # same order as this literal recursion
            assert row["level"] == wl
            assert row["trend"] == wb
            assert row["fitted"] == wf


def test_holt_singleton_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "s", _ts(0.0), 4.0)], "event_id long, k string, ts timestamp, value double"
    )
    r = holt(df, "k").collect()[0]
    assert r["level"] == 4.0 and r["trend"] is None and r["fitted"] is None
    with pytest.raises(ValueError, match="alpha"):
        holt(df, "k", alpha=0.0)
    with pytest.raises(ValueError, match="beta"):
        holt(df, "k", beta=1.5)


# ------------------------------------------------------------------ ar2


def test_ar2_recovers_planted_process(spark):
    # strong AR(2): x_t = 1.2 x_{t-1} - 0.4 x_{t-2} + eps
    rng = np.random.default_rng(2)
    n = 4000
    x = np.zeros(n)
    for t in range(2, n):
        x[t] = 1.2 * x[t - 1] - 0.4 * x[t - 2] + rng.normal()
    out = ar2_forecast(
        _tokens_df(spark, {"d": [float(round(v * 100)) for v in x]})
    ).collect()[0]
    assert out["phi1"] == pytest.approx(1.2, abs=0.1)
    assert out["phi2"] == pytest.approx(-0.4, abs=0.1)
    assert out["n"] == n


def test_ar2_matches_closed_form(spark):
    rng = np.random.default_rng(7)
    x = np.round(rng.normal(size=50) * 100)
    out = ar2_forecast(_tokens_df(spark, {"d": [float(v) for v in x]})).collect()[0]
    mu = float(x.sum()) / x.size
    d = x - mu
    den = float(d @ d)
    r1 = _r6(float(d[:-1] @ d[1:]) / den)
    r2 = _r6(float(d[:-2] @ d[2:]) / den)
    denom = 1.0 - r1 * r1
    phi1 = r1 * (1.0 - r2) / denom
    phi2 = (r2 - r1 * r1) / denom
    fc = mu + phi1 * (float(x[-1]) - mu) + phi2 * (float(x[-2]) - mu)
    assert out["r1"] == r1 and out["r2"] == r2
    assert out["phi1"] == phi1 and out["phi2"] == phi2
    assert out["forecast"] == fc


def test_ar2_degenerate(spark):
    out = {
        r["doc_id"]: r
        for r in ar2_forecast(
            _tokens_df(spark, {"short": [1.0, 2.0], "flat": [3.0] * 10})
        ).collect()
    }
    for k in ("short", "flat"):
        assert out[k]["phi1"] is None and out[k]["forecast"] is None


# ------------------------------------------------- pmi / corpus divergence


@pytest.fixture(scope="module")
def tiny_docs(spark):
    texts = [
        "new york is a big city",
        "new york has a park",
        "the dog runs in the park",
        "a dog and a cat",
        "new york new york",
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pmi_golden(tiny_docs):
    out = pmi_collocations(tiny_docs, min_count=2, top_k=10).collect()
    got = {(r["x"], r["y"]): (r["cnt"], r["pmi"]) for r in out}
    # local recomputation
    texts = [r["text"] for r in tiny_docs.collect()]
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    for t in texts:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    nu = float(sum(uni.values()))
    nbi = float(sum(v for v in bi.values() if v >= 2))
    for (x, y), (cnt, pmi) in got.items():
        want = math.log((bi[(x, y)] * nu * nu) / (nbi * uni[x] * uni[y]))
        assert cnt == bi[(x, y)]
        assert pmi == pytest.approx(_r6(want), abs=2e-6)
    assert ("new", "york") in got and got[("new", "york")][0] == 4


def test_pmi_ranking_deterministic(tiny_docs):
    a = [tuple(r) for r in pmi_collocations(tiny_docs, min_count=1, top_k=5).collect()]
    b = [
        tuple(r)
        for r in pmi_collocations(
            tiny_docs.repartition(7), min_count=1, top_k=5
        ).collect()
    ]
    assert a == b and len(a) == 5


def test_corpus_divergence_golden(spark, tiny_docs):
    other = spark.createDataFrame(
        [(10, "the cat sleeps"), (11, "a cat and a dog")],
        "doc_id long, text string",
    )
    out = corpus_divergence(tiny_docs, other, alpha=0.5).collect()
    texts_a = [r["text"] for r in tiny_docs.collect()]
    texts_b = ["the cat sleeps", "a cat and a dog"]
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for t in texts_a:
        for w in t.split(" "):
            ca[w] = ca.get(w, 0) + 1
    for t in texts_b:
        for w in t.split(" "):
            cb[w] = cb.get(w, 0) + 1
    vocab = set(ca) | set(cb)
    na, nb, v = float(sum(ca.values())), float(sum(cb.values())), float(len(vocab))
    kl_sum = 0.0
    for r in out:
        tok = r["token"]
        p = (ca.get(tok, 0) + 0.5) / (na + 0.5 * v)
        q = (cb.get(tok, 0) + 0.5) / (nb + 0.5 * v)
        m = 0.5 * (p + q)
        assert r["cnt_a"] == ca.get(tok, 0) and r["cnt_b"] == cb.get(tok, 0)
        assert r["p_a"] == pytest.approx(_r6(p), abs=2e-6)
        assert r["kl_ab"] == pytest.approx(_r6(p * math.log(p / q)), abs=2e-6)
        assert r["js"] == pytest.approx(
            _r6(0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)), abs=2e-6
        )
        kl_sum += p * math.log(p / q)
    assert len(out) == len(vocab)
    assert kl_sum > 0  # distributions differ
    # JS is symmetric and bounded by ln 2
    js_total = sum(r["js"] for r in out)
    assert 0 < js_total < math.log(2.0)


def test_corpus_divergence_validation(tiny_docs):
    with pytest.raises(ValueError, match="alpha"):
        corpus_divergence(tiny_docs, tiny_docs, alpha=0.0)
