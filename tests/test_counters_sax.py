"""counter_rate (reset-aware Prometheus-style increase/rate) and
sax_symbols (PAA + SAX, Lin & Keogh 2003) — hand-computed goldens,
degenerate-input semantics, and partition invariance."""

import datetime as dt

import numpy as np
import pytest

from eristropy_spark.operators.counters import counter_rate
from eristropy_spark.operators.sax import SAX_BREAKPOINTS, sax_symbols


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


# --------------------------------------------------------------- counter


@pytest.fixture(scope="module")
def counter_df(spark):
    # key "a": monotone counter with one reset (30 -> 4); key "b": one
    # point only; key "c": duplicate timestamp resolved by event_id.
    rows = [
        (1, "a", _ts(0.0), 10.0),
        (2, "a", _ts(10.0), 30.0),
        (3, "a", _ts(15.0), 4.0),     # reset: increase = 4.0
        (4, "a", _ts(25.0), 9.0),
        (5, "b", _ts(0.0), 7.0),
        (6, "c", _ts(0.0), 1.0),
        (7, "c", _ts(0.0), 5.0),      # same ts, tiebreak on event_id
        (8, "c", _ts(2.0), 6.0),
    ]
    return spark.createDataFrame(rows, "event_id long, k string, ts timestamp, value double")


def test_counter_rate_golden(counter_df):
    out = counter_rate(counter_df, "k", tiebreak_col="event_id")
    got = {r["event_id"]: (r["increase"], r["rate"]) for r in out.collect()}
    assert got[1] == (None, None)                      # first sample: no rate
    assert got[2] == (20.0, 2.0)                       # 20 over 10 s
    assert got[3] == (4.0, pytest.approx(0.8))         # reset: new value / 5 s
    assert got[4] == (5.0, 0.5)
    assert got[5] == (None, None)                      # singleton key
    assert got[6] == (None, None)
    assert got[7] == (4.0, None)                       # dt == 0 -> NULL rate
    assert got[8] == (1.0, 0.5)


def test_counter_rate_no_reset_detection(counter_df):
    out = counter_rate(counter_df, "k", tiebreak_col="event_id",
                       detect_resets=False)
    got = {r["event_id"]: r["increase"] for r in out.collect()}
    assert got[3] == -26.0                             # raw signed delta
    assert got[2] == 20.0


def test_counter_rate_partition_invariant(counter_df):
    a = counter_rate(counter_df, "k", tiebreak_col="event_id")
    b = counter_rate(counter_df.repartition(7), "k", tiebreak_col="event_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_counter_rate_passthrough_rows(counter_df):
    out = counter_rate(counter_df, "k", tiebreak_col="event_id")
    assert out.count() == counter_df.count()
    assert set(counter_df.columns) <= set(out.columns)


# ------------------------------------------------------------------ sax


def _local_sax(values, n_segments, alphabet):
    """Independent numpy recomputation of the operator's semantics."""
    x = np.asarray(values, dtype=float)
    n = len(x)
    sd = x.std(ddof=1) if n > 1 else np.nan
    if not sd > 0:
        return {s: (None, None) for s in set((np.arange(n) * n_segments) // n)}
    z = (x - x.mean()) / sd
    seg = (np.arange(n) * n_segments) // n
    out = {}
    bps = SAX_BREAKPOINTS[alphabet]
    for s in np.unique(seg):
        paa = z[seg == s].mean()
        paa = np.floor(paa * 1e6 + 0.5) / 1e6
        out[int(s)] = (paa, int(sum(paa > b for b in bps)))
    return out


@pytest.fixture(scope="module")
def sax_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    for k, n in [("s1", 100), ("s2", 37), ("s3", 5), ("flat", 20), ("one", 1)]:
        vals = rng.normal(size=n) if k not in ("flat",) else np.zeros(n)
        for i, v in enumerate(vals):
            rows.append((eid, k, _ts(float(i)), float(v)))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp, value double"
    )


def test_sax_matches_local_recomputation(sax_df):
    out = sax_symbols(sax_df, "k", tiebreak_col="event_id",
                      n_segments=8, alphabet=4)
    got = {(r["k"], r["segment"]): (r["paa"], r["symbol"])
           for r in out.collect()}
    pdf = sax_df.orderBy("event_id").toPandas()
    for k, g in pdf.groupby("k"):
        expected = _local_sax(g["value"].tolist(), 8, 4)
        for seg, (paa, sym) in expected.items():
            gpaa, gsym = got[(k, seg)]
            if paa is None:
                assert gpaa is None and gsym is None
            else:
                assert gpaa == pytest.approx(paa, abs=1e-9)
                assert gsym == sym


def test_sax_segment_counts(sax_df):
    out = sax_symbols(sax_df, "k", tiebreak_col="event_id",
                      n_segments=8, alphabet=4)
    counts = {r["k"]: r["cnt"] for r in
              out.groupBy("k").count().withColumnRenamed("count", "cnt").collect()}
    assert counts["s1"] == 8          # n >= w: every segment occupied
    assert counts["s2"] == 8
    assert counts["s3"] == 5          # n < w: one segment per point
    assert counts["one"] == 1


def test_sax_degenerate_series_null(sax_df):
    out = sax_symbols(sax_df, "k", tiebreak_col="event_id",
                      n_segments=8, alphabet=4)
    flat = out.filter("k = 'flat'").collect()
    assert flat and all(r["paa"] is None and r["symbol"] is None for r in flat)


def test_sax_symbol_monotone_in_paa(spark):
    # symbols must be a monotone step function of paa at the published
    # breakpoints for every supported alphabet
    for a, bps in SAX_BREAKPOINTS.items():
        probes = [bps[0] - 1.0] + [b + 1e-3 for b in bps]
        expected = list(range(a))
        got = [sum(p > b for b in bps) for p in probes]
        assert got == expected


def test_sax_validation(sax_df):
    with pytest.raises(ValueError):
        sax_symbols(sax_df, "k", n_segments=0)
    with pytest.raises(ValueError):
        sax_symbols(sax_df, "k", alphabet=99)


def test_sax_partition_invariant(sax_df):
    a = sax_symbols(sax_df, "k", tiebreak_col="event_id",
                    n_segments=8, alphabet=4)
    b = sax_symbols(sax_df.repartition(5), "k", tiebreak_col="event_id",
                    n_segments=8, alphabet=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ----------------------------------------------------------------- ewma


def test_ewma_matches_literal_recursion(spark, sax_df):
    from eristropy_spark.operators.smoothing import ewma

    out = ewma(sax_df, "k", alpha=0.23, tiebreak_col="event_id")
    got = {r["event_id"]: r["ewma"] for r in out.collect()}
    pdf = sax_df.orderBy("event_id").toPandas()
    for _, g in pdf.groupby("k"):
        e = None
        for _, row in g.sort_values(["ts", "event_id"]).iterrows():
            x = row["value"]
            e = x if e is None else (1 - 0.23) * e + 0.23 * x
            # bit-identical, not approx: the DuckDB oracle relies on it
            assert got[row["event_id"]] == e


def test_ewma_partition_invariant(sax_df):
    from eristropy_spark.operators.smoothing import ewma

    a = ewma(sax_df, "k", tiebreak_col="event_id")
    b = ewma(sax_df.repartition(5), "k", tiebreak_col="event_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ewma_passthrough_and_validation(sax_df):
    from eristropy_spark.operators.smoothing import ewma

    out = ewma(sax_df, "k", tiebreak_col="event_id")
    assert out.count() == sax_df.count()
    assert out.columns == sax_df.columns + ["ewma"]
    with pytest.raises(ValueError):
        ewma(sax_df, "k", alpha=0.0)
    with pytest.raises(ValueError):
        ewma(sax_df, "k", alpha=1.5)
