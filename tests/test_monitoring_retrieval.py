"""Round-5 monitoring/retrieval operators: local-recomputation parity
for CUSUM (the sequential max(0,..) recursion vs the prefix-reflection
form), seasonal decomposition (textbook 2xMA on a planted season),
anomaly-episode islands, lagged cross-correlation (planted lead/lag),
and BM25 (scalar formula replay).  All goldens are independent numpy /
pure-python recomputations, not Spark round-trips.
"""

import datetime as dt
import math

import numpy as np
import pytest

from eristropy_spark.operators.anomaly import anomaly_episodes
from eristropy_spark.operators.changepoint import cusum_changepoints
from eristropy_spark.operators.crosscorr import crosscorr_pairs
from eristropy_spark.operators.decompose import seasonal_decompose
from eristropy_spark.operators.retrieval import bm25_topk

UTC = dt.timezone.utc
BASE = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _ts(sec):
    return (BASE + dt.timedelta(seconds=sec)).replace(tzinfo=None)


# ---------------------------------------------------------------- CUSUM

def _cusum_local(xs, k, mu):
    """The literal Page recursion, sequentially."""
    sp = sn = 0.0
    out = []
    for x in xs:
        sp = max(0.0, sp + (x - mu - k))
        sn = max(0.0, sn + (mu - x - k))
        out.append((sp, sn))
    return out


def _cusum_frame(n_keys=3, n=40, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for key in range(n_keys):
        # step change half-way through so alarms actually fire
        base = rng.normal(0.0, 1.0, n)
        base[n // 2:] += 3.0
        for i, x in enumerate(base):
            rows.append((key, i, _ts(i * 10), round(float(x), 6)))
    return rows


def test_cusum_matches_sequential_recursion(spark):
    rows = _cusum_frame()
    df = spark.createDataFrame(
        rows, "key long, event_id long, ts timestamp_ntz, value double"
    )
    k = 0.25
    got = {
        (r.key, r.event_id): (r.cusum_pos, r.cusum_neg, r.alarm)
        for r in cusum_changepoints(
            df, "key", tiebreak_col="event_id", k=k, h=3.0
        ).collect()
    }
    assert len(got) == len(rows)
    for key in {r[0] for r in rows}:
        xs = [v for kk, _, _, v in rows if kk == key]
        # the operator's grid mean: floor-round(avg of 6dp values, 6)
        mu = math.floor(float(np.mean(xs)) * 1e6 + 0.5) / 1e6
        want = _cusum_local(xs, k, mu)
        for i, (wp, wn) in enumerate(want):
            gp, gn, alarm = got[(key, i)]
            assert gp == pytest.approx(wp, abs=1e-9), (key, i)
            assert gn == pytest.approx(wn, abs=1e-9), (key, i)
            assert alarm == (gp > 3.0 or gn > 3.0)
    # the planted +3 shift must alarm somewhere in every key
    assert all(
        any(got[(key, i)][2] for i in range(40))
        for key in {r[0] for r in rows}
    )


def test_cusum_known_target_and_raw_double_path(spark):
    rows = [(0, i, _ts(i), float(v)) for i, v in enumerate([0, 0, 2, 2, 0])]
    df = spark.createDataFrame(
        rows, "key long, event_id long, ts timestamp_ntz, value double"
    )
    r = {
        r.event_id: (r.cusum_pos, r.cusum_neg)
        for r in cusum_changepoints(
            df, "key", tiebreak_col="event_id", k=0.5, h=1.0,
            target=0.0, exact_decimals=None,
        ).collect()
    }
    want = _cusum_local([0, 0, 2, 2, 0], 0.5, 0.0)
    for i, (wp, wn) in enumerate(want):
        assert r[i] == pytest.approx((wp, wn), abs=1e-12)


def test_cusum_param_validation(spark):
    df = spark.createDataFrame(
        [(0, 0, _ts(0), 1.0)],
        "key long, event_id long, ts timestamp_ntz, value double",
    )
    with pytest.raises(ValueError, match="allowance"):
        cusum_changepoints(df, "key", k=-1.0)
    with pytest.raises(ValueError, match="threshold"):
        cusum_changepoints(df, "key", h=0.0)
    with pytest.raises(ValueError, match="not exact"):
        cusum_changepoints(df, "key", k=0.1234567)  # 7dp at 6dp grid


# ------------------------------------------------- seasonal decomposition

def _decomp_frame(period=4, n=32, keys=(1, 2), seed=3):
    rng = np.random.default_rng(seed)
    season = [2.0, -1.0, 0.5, -1.5]
    rows = []
    for key in keys:
        for i in range(n):
            v = 0.1 * i + season[i % period] + rng.normal(0, 0.05) + key
            rows.append((key, i, _ts(i * 60), round(float(v), 6)))
    return rows


def _decomp_local(xs, period):
    """Textbook additive decomposition, matching the operator contract
    (2xMA trend for even period, phase means of detrended, re-centered)."""
    n = len(xs)
    half = period // 2
    trend = [None] * n
    for t in range(n):
        if t - half < 0 or t + half >= n:
            continue
        wl = xs[t - half: t + half]          # [t-half, t+half-1]
        wr = xs[t - half + 1: t + half + 1]  # [t-half+1, t+half]
        trend[t] = (sum(wl) + sum(wr)) / (2.0 * period)
    by_phase = {}
    for t in range(n):
        if trend[t] is not None:
            by_phase.setdefault(t % period, []).append(xs[t] - trend[t])
    raw = {p: float(np.mean(v)) for p, v in by_phase.items()}
    c = float(np.mean(list(raw.values())))
    seas = {p: r - c for p, r in raw.items()}
    out = []
    for t in range(n):
        s = seas[t % period]
        rem = xs[t] - trend[t] - s if trend[t] is not None else None
        out.append((trend[t], s, rem))
    return out


def test_seasonal_decompose_matches_local(spark):
    period = 4
    rows = _decomp_frame(period=period)
    df = spark.createDataFrame(
        rows, "key long, event_id long, ts timestamp_ntz, value double"
    )
    got = {
        (r.key, r.event_id): (r.trend, r.seasonal, r.remainder)
        for r in seasonal_decompose(
            df, "key", period=period, tiebreak_col="event_id"
        ).collect()
    }
    assert len(got) == len(rows)
    for key in {r[0] for r in rows}:
        xs = [v for kk, _, _, v in rows if kk == key]
        want = _decomp_local(xs, period)
        for i, (wt, ws, wr) in enumerate(want):
            gt, gs, gr = got[(key, i)]
            if wt is None:
                assert gt is None and gr is None, (key, i)
            else:
                assert gt == pytest.approx(wt, abs=1e-9), (key, i)
                assert gr == pytest.approx(wr, abs=1e-9), (key, i)
            assert gs == pytest.approx(ws, abs=1e-9), (key, i)


def test_seasonal_decompose_odd_period_and_identity(spark):
    rows = _decomp_frame(period=4, n=21, keys=(7,))
    df = spark.createDataFrame(
        rows, "key long, event_id long, ts timestamp_ntz, value double"
    )
    out = seasonal_decompose(
        df, "key", period=3, tiebreak_col="event_id"
    ).collect()
    # odd period: plain centered MA of 3
    xs = [v for _, _, _, v in rows]
    for r in out:
        i = r.event_id
        if 1 <= i <= len(xs) - 2:
            assert r.trend == pytest.approx(sum(xs[i - 1: i + 2]) / 3.0, abs=1e-9)
            # additive identity holds row-wise
            assert r.value - r.trend - r.seasonal == pytest.approx(
                r.remainder, abs=1e-9
            )
        else:
            assert r.trend is None
    # seasonal indexes sum ~0 over one period
    seas = {}
    for r in sorted(out, key=lambda r: r.event_id)[:3]:
        seas[r.event_id % 3] = r.seasonal
    assert sum(seas.values()) == pytest.approx(0.0, abs=1e-9)


def test_seasonal_decompose_param_validation(spark):
    df = spark.createDataFrame(
        [(0, 0, _ts(0), 1.0)],
        "key long, event_id long, ts timestamp_ntz, value double",
    )
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, "key", period=1)
    with pytest.raises(ValueError, match="exact_decimals"):
        seasonal_decompose(df, "key", period=4, exact_decimals=13)


# ------------------------------------------------------- anomaly episodes

def test_anomaly_episodes_islands(spark):
    # key 1: quiet, spike pair, quiet, single spike  -> 2 episodes
    vals = [0.0, 0.1, -0.1, 0.0, 9.0, 9.5, 0.0, 0.1, -9.0, 0.0]
    rows = [(1, i, _ts(i), v) for i, v in enumerate(vals)]
    # key 2: all-quiet -> no episodes
    rows += [(2, i, _ts(i), 0.1 * (i % 2)) for i in range(8)]
    df = spark.createDataFrame(
        rows, "key long, event_id long, ts timestamp_ntz, value double"
    )
    out = anomaly_episodes(
        df, "key", window_sec=100.0, threshold=1.5,
        min_points=3, tiebreak_col="event_id",
    ).collect()
    eps = sorted(
        [(r.key, r.start_ts.second + r.start_ts.minute * 60,
          r.end_ts.second + r.end_ts.minute * 60, r.n_points)
         for r in out]
    )
    assert all(k == 1 for k, *_ in eps)
    # consecutive flagged rows merged; quiet gap splits
    assert [e[3] for e in eps] == sorted(
        [e[3] for e in eps]
    )  # sanity: deterministic
    assert len(eps) >= 2
    spans = [(s, e) for _, s, e, _ in eps]
    # no two episodes overlap
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2
    # every episode's peak_z >= threshold
    assert all(r.peak_z >= 1.5 for r in out)


def test_anomaly_episodes_threshold_validation(spark):
    df = spark.createDataFrame(
        [(1, 0, _ts(0), 1.0)],
        "key long, event_id long, ts timestamp_ntz, value double",
    )
    with pytest.raises(ValueError, match="threshold"):
        anomaly_episodes(df, "key", threshold=0.0)


# -------------------------------------------------------- crosscorr pairs

def test_crosscorr_planted_lag(spark):
    # b follows a exactly 2 buckets later -> ccf(lag=2) == 1.0
    rng = np.random.default_rng(11)
    a = rng.normal(0, 1, 30)
    rows = []
    for i, v in enumerate(a):
        rows.append(("a", _ts(i * 60), float(v)))
    for i, v in enumerate(a):
        rows.append(("b", _ts((i + 2) * 60), float(2.0 * v + 1.0)))
    df = spark.createDataFrame(rows, "source string, ts timestamp_ntz, value double")
    out = {
        (r.source_a, r.source_b, r.lag): (r.n, r.ccf)
        for r in crosscorr_pairs(df, bucket_sec=60, max_lag=3).collect()
    }
    n2, ccf2 = out[("a", "b", 2)]
    assert n2 == 30
    assert ccf2 == pytest.approx(1.0, abs=1e-12)
    # other lags correlate iid noise -> |ccf| << 1
    for lag in (0, 1, 3):
        _, c = out[("a", "b", lag)]
        assert abs(c) < 0.7


def test_crosscorr_matches_numpy_and_guards(spark):
    rng = np.random.default_rng(5)
    xs = rng.normal(0, 1, 12)
    ys = rng.normal(0, 1, 12)
    rows = [("x", _ts(i * 60), float(v)) for i, v in enumerate(xs)]
    rows += [("y", _ts(i * 60), float(v)) for i, v in enumerate(ys)]
    # constant signal: zero variance -> NULL ccf rows with it
    rows += [("z", _ts(i * 60), 5.0) for i in range(12)]
    df = spark.createDataFrame(rows, "source string, ts timestamp_ntz, value double")
    out = {
        (r.source_a, r.source_b, r.lag): (r.n, r.ccf)
        for r in crosscorr_pairs(df, bucket_sec=60, max_lag=1).collect()
    }
    n0, c0 = out[("x", "y", 0)]
    assert n0 == 12
    assert c0 == pytest.approx(float(np.corrcoef(xs, ys)[0, 1]), abs=1e-12)
    # lag 1: x[0..10] vs y[1..11]
    n1, c1 = out[("x", "y", 1)]
    assert n1 == 11
    assert c1 == pytest.approx(float(np.corrcoef(xs[:-1], ys[1:])[0, 1]), abs=1e-12)
    # zero-variance side pins NULL (not NaN)
    assert out[("x", "z", 0)][1] is None
    # source ordering: only a < b pairs emitted
    assert ("y", "x", 0) not in out
    with pytest.raises(ValueError):
        crosscorr_pairs(df, bucket_sec=0)
    with pytest.raises(ValueError):
        crosscorr_pairs(df, min_overlap=1)


def test_crosscorr_min_overlap_drops_thin_pairs(spark):
    rows = [("a", _ts(i * 60), float(i)) for i in range(10)]
    rows += [("b", _ts(i * 60), float(i * i)) for i in (0, 1)]  # 2 buckets only
    df = spark.createDataFrame(rows, "source string, ts timestamp_ntz, value double")
    out = crosscorr_pairs(df, bucket_sec=60, max_lag=0, min_overlap=3).collect()
    assert out == []


# ------------------------------------------------------------------- BM25

def _bm25_local(docs, queries, k1=1.2, b=0.75):
    toks = {d: [t for t in txt.lower().split(" ") if t] for d, txt in docs}
    tf = {d: {} for d, _ in docs}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: float(len(ts)) for d, ts in toks.items()}
    n = float(len(docs))
    avgdl = sum(dl.values()) / n
    df_ = {}
    for d in tf:
        for t in tf[d]:
            df_[t] = df_.get(t, 0) + 1
    scores = {}
    for qid, terms in queries.items():
        for d in tf:
            s = 0.0
            for t in set(terms):
                if t not in tf[d]:
                    continue
                idf = math.log(1.0 + (n - df_[t] + 0.5) / (df_[t] + 0.5))
                f = tf[d][t]
                s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl[d] / avgdl))
            if s > 0:
                scores[(qid, d)] = math.floor(s * 1e6 + 0.5) / 1e6
    return scores


def test_bm25_matches_local_formula(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog chased the cat"),
        (3, "dogs and cats living together"),
        (4, "a plain sentence about nothing"),
        (5, "cat cat cat cat"),
    ]
    queries = {10: ["cat", "dog"], 20: ["mat"], 30: ["nothing", "cat"]}
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qrows = [(q, t) for q, ts in queries.items() for t in ts]
    qdf = spark.createDataFrame(qrows, "query_id long, token string")
    out = bm25_topk(ddf, qdf, k=3)
    got = {(r.query_id, r.doc_id): (r.score, r.rank) for r in out.collect()}
    want = _bm25_local(docs, queries)
    # expected top-3 per query by (score desc, doc_id asc)
    for qid in queries:
        hits = sorted(
            [(d, s) for (q, d), s in want.items() if q == qid],
            key=lambda x: (-x[1], x[0]),
        )[:3]
        for rank, (d, s) in enumerate(hits, start=1):
            assert got[(qid, d)] == (pytest.approx(s, abs=1e-9), rank), (qid, d)
    # repeated query terms do not double-count (distinct semantics)
    qdf2 = spark.createDataFrame(
        [(10, "cat"), (10, "cat"), (10, "dog")], "query_id long, token string"
    )
    out2 = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in bm25_topk(ddf, qdf2, k=3).collect()
    }
    assert out2 == {k: v for k, v in got.items() if k[0] == 10}


def test_bm25_param_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    q = spark.createDataFrame([(1, "x")], "query_id long, token string")
    with pytest.raises(ValueError):
        bm25_topk(df, q, k=0)
    with pytest.raises(ValueError):
        bm25_topk(df, q, b=1.5)
