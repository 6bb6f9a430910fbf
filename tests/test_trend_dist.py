"""Round-5 batch: mann_kendall, pettitt, renyi_entropy, m4_downsample,
max_drawdown, zipf_fit — hand-computed goldens, brute-force /
local-recomputation parity, degenerate inputs, partition invariance."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from eristropy_spark.operators.changepoint import pettitt
from eristropy_spark.operators.corpus import zipf_fit
from eristropy_spark.operators.distribution import renyi_entropy
from eristropy_spark.operators.robust import mann_kendall
from eristropy_spark.operators.rolling import max_drawdown
from eristropy_spark.operators.rollup import m4_downsample


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def _tokens_df(spark, seqs: dict[str, list[int]]):
    return spark.createDataFrame(
        [(k, v) for k, v in seqs.items()], "doc_id string, tokens array<int>"
    )


def _mk_brute(x: list[int]):
    """Literal Mann–Kendall from the textbook definition."""
    n = len(x)
    s = sum(
        (0 if x[j] == x[i] else (1 if x[j] > x[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    _, counts = np.unique(np.asarray(x), return_counts=True)
    tie = int(sum(t * (t - 1) * (2 * t + 5) for t in counts))
    var_s = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    return s, var_s


# ---------------------------------------------------------- mann_kendall


def test_mann_kendall_matches_brute_force(spark):
    rng = np.random.default_rng(5)
    seqs = {
        f"d{i}": [int(v) for v in rng.integers(0, 12, size=rng.integers(5, 40))]
        for i in range(8)
    }
    out = {r["doc_id"]: r for r in mann_kendall(_tokens_df(spark, seqs)).collect()}
    for k, x in seqs.items():
        s, var_s = _mk_brute(x)
        r = out[k]
        assert r["s"] == s and r["n"] == len(x)
        assert r["var_s"] == pytest.approx(var_s, abs=0)
        n = len(x)
        assert r["tau"] == pytest.approx(s / (n * (n - 1) / 2.0), abs=0)
        if var_s > 0:
            want_z = (
                (s - 1) / math.sqrt(var_s)
                if s > 0
                else ((s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
            )
            assert r["z"] == pytest.approx(want_z, abs=0)


def test_mann_kendall_signs_and_degenerates(spark):
    seqs = {
        "up": list(range(10)),       # strictly increasing
        "down": list(range(10, 0, -1)),
        "const": [7] * 9,            # all ties -> var_s = 0, z NULL
        "single": [3],               # n < 2 -> NULL stats
    }
    out = {r["doc_id"]: r for r in mann_kendall(_tokens_df(spark, seqs)).collect()}
    assert out["up"]["s"] == 45 and out["up"]["tau"] == 1.0
    assert out["down"]["s"] == -45 and out["down"]["tau"] == -1.0
    assert out["up"]["z"] > 2.5 and out["down"]["z"] < -2.5
    assert out["const"]["s"] == 0 and out["const"]["var_s"] == 0.0
    assert out["const"]["z"] is None
    assert out["single"]["s"] is None and out["single"]["var_s"] is None


def test_mann_kendall_guard(spark):
    df = _tokens_df(spark, {"big": list(range(50))})
    with pytest.raises(Exception, match="max_points"):
        mann_kendall(df, max_points=10).collect()


# --------------------------------------------------------------- pettitt


def _pettitt_brute(x: list[int]):
    n = len(x)
    best_k, best_t, best_u = -1, None, None
    for t in range(1, n):
        u = sum(
            (0 if x[i] == x[j] else (1 if x[i] > x[j] else -1))
            for i in range(t)
            for j in range(t, n)
        )
        if abs(u) > best_k:
            best_k, best_t, best_u = abs(u), t, u
    return best_k, best_t, best_u


def test_pettitt_matches_brute_force(spark):
    rng = np.random.default_rng(9)
    seqs = {
        f"d{i}": [int(v) for v in rng.integers(0, 10, size=rng.integers(4, 30))]
        for i in range(8)
    }
    out = {r["doc_id"]: r for r in pettitt(_tokens_df(spark, seqs)).collect()}
    for k, x in seqs.items():
        bk, bt, bu = _pettitt_brute(x)
        r = out[k]
        assert (r["k_stat"], r["t_star"], r["u_at_t"]) == (bk, bt, bu)
        n = len(x)
        want_p = min(1.0, 2.0 * math.exp(-6.0 * bk * bk / (n**3 + float(n * n))))
        assert r["p_approx"] == pytest.approx(want_p, abs=0)


def test_pettitt_planted_shift(spark):
    x = [5] * 20 + [50] * 20
    out = pettitt(_tokens_df(spark, {"shift": x})).collect()[0]
    assert out["t_star"] == 20          # the true break position
    assert out["k_stat"] == 20 * 20     # every cross pair disagrees
    assert out["p_approx"] < 0.01


def test_pettitt_degenerate(spark):
    out = {
        r["doc_id"]: r
        for r in pettitt(
            _tokens_df(spark, {"single": [4], "const": [2, 2, 2, 2]})
        ).collect()
    }
    assert out["single"]["k_stat"] is None
    assert out["const"]["k_stat"] == 0 and out["const"]["p_approx"] == 1.0


# --------------------------------------------------------- renyi_entropy


def test_renyi_entropy_golden_uniform_and_skewed(spark):
    df = _tokens_df(
        spark,
        {
            "uniform": [1, 2, 3, 4],           # all entropies = ln 4
            "hot": [7, 7, 7, 9],               # p = (3/4, 1/4)
            "degenerate": [5, 5, 5, 5, 5],     # all entropies = 0
        },
    )
    out = {r["doc_id"]: r for r in renyi_entropy(df).collect()}
    ln4 = math.log(4.0)
    for col in ("h_shannon", "h_renyi2", "h_min"):
        assert out["uniform"][col] == pytest.approx(ln4, abs=1e-9)
        assert out["degenerate"][col] == pytest.approx(0.0, abs=1e-12)
    p = np.array([0.75, 0.25])
    assert out["hot"]["h_shannon"] == pytest.approx(
        -(p * np.log(p)).sum(), abs=1e-9
    )
    assert out["hot"]["h_renyi2"] == pytest.approx(
        -math.log((p**2).sum()), abs=1e-9
    )
    assert out["hot"]["h_min"] == pytest.approx(-math.log(0.75), abs=1e-12)
    assert out["hot"]["ttr"] == 0.5 and out["hot"]["n_tok"] == 4
    assert out["uniform"]["n_distinct"] == 4


def test_renyi_entropy_ordering_property(spark):
    rng = np.random.default_rng(3)
    seqs = {
        f"d{i}": [int(v) for v in rng.integers(0, 8, size=60)] for i in range(6)
    }
    for r in renyi_entropy(_tokens_df(spark, seqs)).collect():
        # H_inf <= H_2 <= H_1 <= ln(n_distinct), small slack for the
        # 12-dp quantized sums
        assert (
            r["h_min"] <= r["h_renyi2"] + 1e-9
            and r["h_renyi2"] <= r["h_shannon"] + 1e-9
        )
        assert r["h_shannon"] <= math.log(r["n_distinct"]) + 1e-9


def test_renyi_entropy_empty_and_partition_invariance(spark):
    df = spark.createDataFrame(
        [("a", [1, 1, 2]), ("empty", []), ("null", None)],
        "doc_id string, tokens array<int>",
    )
    out = {r["doc_id"]: r for r in renyi_entropy(df).collect()}
    assert out["empty"]["n_tok"] == 0 and out["empty"]["h_shannon"] is None
    assert out["null"]["n_tok"] == 0
    rng = np.random.default_rng(4)
    seqs = {
        f"d{i}": [int(v) for v in rng.integers(0, 9, size=40)] for i in range(10)
    }
    base = {
        r["doc_id"]: r.asDict()
        for r in renyi_entropy(_tokens_df(spark, seqs)).collect()
    }
    rep = {
        r["doc_id"]: r.asDict()
        for r in renyi_entropy(_tokens_df(spark, seqs).repartition(13)).collect()
    }
    assert base == rep  # DECIMAL sums make it partition-invariant exactly


# --------------------------------------------------------- m4_downsample


def test_m4_downsample_golden(spark):
    rows = [
        # one bucket, crafted extrema
        (1, "s", _ts(0), 5.0),
        (2, "s", _ts(10), 9.0),   # max
        (3, "s", _ts(20), 1.0),   # min
        (4, "s", _ts(30), 6.0),
        # second bucket: single point
        (5, "s", _ts(3600), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, source string, ts timestamp, value double"
    )
    out = {
        (r["source"], r["bucket"]): r
        for r in m4_downsample(df, "hour", tiebreak_col="event_id").collect()
    }
    b0 = out[("s", dt.datetime(2024, 1, 1, 0))]
    assert (b0["t_first"], b0["v_first"]) == (_ts(0), 5.0)
    assert (b0["t_last"], b0["v_last"]) == (_ts(30), 6.0)
    assert (b0["t_min"], b0["v_min"]) == (_ts(20), 1.0)
    assert (b0["t_max"], b0["v_max"]) == (_ts(10), 9.0)
    assert b0["n"] == 4
    b1 = out[("s", dt.datetime(2024, 1, 1, 1))]
    assert b1["v_first"] == b1["v_last"] == b1["v_min"] == b1["v_max"] == 2.0
    assert b1["n"] == 1


def test_m4_downsample_tiebreaks(spark):
    # equal values: min picks earliest, max picks latest (struct key)
    rows = [
        (1, "s", _ts(0), 3.0),
        (2, "s", _ts(10), 3.0),
        (3, "s", _ts(5), 1.0),
        (4, "s", _ts(6), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, source string, ts timestamp, value double"
    )
    r = m4_downsample(df, "hour", tiebreak_col="event_id").collect()[0]
    assert r["t_min"] == _ts(5)    # earliest of the tied minima
    assert r["t_max"] == _ts(10)   # latest of the tied maxima


def test_m4_single_aggregate_plan(spark):
    rows = [(1, "s", _ts(0), 1.0)]
    df = spark.createDataFrame(
        rows, "event_id long, source string, ts timestamp, value double"
    )
    plan = m4_downsample(df, "hour", tiebreak_col="event_id")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # pure two-phase aggregate, no windows


# ---------------------------------------------------------- max_drawdown


def test_max_drawdown_golden(spark):
    vals = [10.0, 12.0, 7.0, 11.0, 3.0, 8.0]
    rows = [(i, "u", _ts(60.0 * i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    r = max_drawdown(df, "user_id", tiebreak_col="event_id").collect()[0]
    # running max: 10 12 12 12 12 12; drawdowns: 0 0 5 1 9 4
    assert r["max_drawdown"] == 9.0
    assert r["peak_value"] == 12.0 and r["trough_value"] == 3.0
    assert r["trough_ts"] == _ts(240.0) and r["n"] == 6


def test_max_drawdown_monotone_and_ties(spark):
    rows = [(i, "mono", _ts(60.0 * i), float(i)) for i in range(5)]
    # tied drawdown: two equal troughs -> earliest wins
    rows += [
        (10, "tie", _ts(0), 5.0),
        (11, "tie", _ts(60), 2.0),
        (12, "tie", _ts(120), 5.0),
        (13, "tie", _ts(180), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    out = {
        r["user_id"]: r
        for r in max_drawdown(df, "user_id", tiebreak_col="event_id").collect()
    }
    assert out["mono"]["max_drawdown"] == 0.0  # never falls
    assert out["tie"]["max_drawdown"] == 3.0
    assert out["tie"]["trough_ts"] == _ts(60)  # earliest attainment


def test_max_drawdown_matches_local(spark):
    rng = np.random.default_rng(21)
    rows = []
    for u in ("a", "b", "c"):
        for i in range(80):
            rows.append((len(rows), u, _ts(30.0 * i), float(rng.normal())))
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    out = {
        r["user_id"]: r
        for r in max_drawdown(df, "user_id", tiebreak_col="event_id").collect()
    }
    series: dict[str, list[float]] = {}
    for _, u, _, v in rows:
        series.setdefault(u, []).append(v)
    for u, vs in series.items():
        peak, best = -math.inf, 0.0
        for v in vs:
            peak = max(peak, v)
            best = max(best, peak - v)
        assert out[u]["max_drawdown"] == best


# -------------------------------------------------------------- zipf_fit


def test_zipf_fit_matches_local_ols(spark):
    # a synthetic corpus with an exact power-law-ish frequency table
    words = []
    for rank, w in enumerate(
        ["the", "of", "and", "to", "in", "is", "it", "on"], start=1
    ):
        words += [w] * max(1, int(200 / rank))
    docs = spark.createDataFrame(
        [("d1", " ".join(words[: len(words) // 2])),
         ("d2", " ".join(words[len(words) // 2:]))],
        "doc_id string, text string",
    )
    r = zipf_fit(docs, top_k=8).collect()[0]
    # independent OLS over the true counts
    from collections import Counter

    cnt = Counter(words)
    pairs = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(pairs) + 1, dtype=float))
    y = np.log(np.array([c for _, c in pairs], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert r["n_tokens"] == len(pairs)
    assert r["slope"] == pytest.approx(slope, abs=1e-6)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-6)
    assert 0.9 < r["r2"] <= 1.0 + 1e-12
    assert r["slope"] == pytest.approx(-1.0, abs=0.1)  # Zipf regime


def test_zipf_fit_validation(spark):
    docs = spark.createDataFrame([("d", "a b c")], "doc_id string, text string")
    with pytest.raises(ValueError, match="top_k"):
        zipf_fit(docs, top_k=2)
    with pytest.raises(ValueError, match="min_rank"):
        zipf_fit(docs, min_rank=0)


# --------------------------------------------- markov entropy rate


def _markov_ref(tokens):
    """Independent float reference for H(X_t | X_{t-1})."""
    import collections
    import math as _m

    pairs = list(zip(tokens[:-1], tokens[1:]))
    m = len(pairs)
    if m == 0:
        return None
    c2 = collections.Counter(pairs)
    c1 = collections.Counter(x for x, _ in pairs)
    h2 = -sum(c / m * _m.log(c / m) for c in c2.values())
    h1 = -sum(c / m * _m.log(c / m) for c in c1.values())
    return h2 - h1


def test_markov_rate_golden(spark):
    import numpy as np

    from eristropy_spark.operators.distribution import markov_entropy_rate

    rng = np.random.default_rng(7)
    seqs = [
        [int(v) for v in rng.integers(0, 9, size=int(n))]
        for n in rng.integers(2, 120, 10)
    ]
    df = spark.createDataFrame(
        [(f"d{i}", s) for i, s in enumerate(seqs)],
        "doc_id string, tokens array<int>",
    )
    rows = {r.doc_id: r for r in markov_entropy_rate(df).collect()}
    for i, s in enumerate(seqs):
        got = rows[f"d{i}"]
        assert got.n_pairs == len(s) - 1
        assert got.h_rate == pytest.approx(_markov_ref(s), abs=1e-6)


def test_markov_rate_template_vs_random(spark):
    import numpy as np

    from eristropy_spark.operators.distribution import markov_entropy_rate

    rng = np.random.default_rng(13)
    template = [1, 2, 3, 4] * 200  # rigid transitions -> rate 0
    rand = [int(v) for v in rng.integers(0, 50, size=800)]
    df = spark.createDataFrame(
        [("tmpl", template), ("rand", rand), ("short", [5]), ("null", None)],
        "doc_id string, tokens array<int>",
    )
    rows = {r.doc_id: r for r in markov_entropy_rate(df).collect()}
    assert rows["tmpl"].h_rate == pytest.approx(0.0, abs=1e-9)
    # 799 pairs -> context counts 200/200/200/199: ln 4 minus a tiny
    # finite-sample bias
    assert rows["tmpl"].h_context == pytest.approx(math.log(4), abs=1e-4)
    # 799 pairs over 50²=2500 bigram cells is severely undersampled, so
    # the plug-in rate is biased well below ln 50 — the pinned claim is
    # the contrast: random transitions carry real conditional entropy
    assert rows["rand"].h_rate > 2.0
    assert rows["rand"].h_rate == pytest.approx(_markov_ref(rand), abs=1e-6)
    assert rows["short"].n_pairs == 0 and rows["short"].h_rate is None
    assert rows["null"].n_pairs == 0 and rows["null"].h_rate is None


def test_markov_rate_partition_invariance(spark):
    import numpy as np

    from eristropy_spark.operators.distribution import markov_entropy_rate

    rng = np.random.default_rng(29)
    df = spark.createDataFrame(
        [
            (f"d{i}", [int(v) for v in rng.integers(0, 6, size=200)])
            for i in range(8)
        ],
        "doc_id string, tokens array<int>",
    )
    a = markov_entropy_rate(df.repartition(1)).orderBy("doc_id").collect()
    b = markov_entropy_rate(df.repartition(7)).orderBy("doc_id").collect()
    assert a == b
