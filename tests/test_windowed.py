"""Windowed entropy — window slicing semantics + per-window kernel parity."""

import math

import numpy as np
from pyspark.sql import Row

from eristropy_spark.kernels.permen import permen
from eristropy_spark.kernels.sampen_batch import sampen_many
from eristropy_spark.operators.windowed import windowed_entropy


def _df(spark, lengths, seed=11):
    rng = np.random.default_rng(seed)
    rows = [
        Row(
            doc_id=f"s{i}",
            tokens=[int(v) for v in rng.integers(0, 200, size=ln)],
            n_tok=ln,
            source="a",
        )
        for i, ln in enumerate(lengths)
    ]
    return spark.createDataFrame(rows)


def test_tumbling_windows_match_manual_slices(spark):
    df = _df(spark, [300, 100, 50, 10])
    out = windowed_entropy(df, window=100, stride=100, min_window=16, m=1, r=0.2)
    rows = {(r["doc_id"], r["window_id"]): r for r in out.collect()}

    docs = {r["doc_id"]: r["tokens"] for r in df.collect()}
    expected = {}
    for d, toks in docs.items():
        n = len(toks)
        if n < 16:
            continue
        n_win = (n - 16) // 100 + 1
        for w in range(n_win):
            seg = np.asarray(toks[w * 100 : w * 100 + 100], dtype=np.float64)
            if seg.size < 16:
                continue
            s = float(sampen_many([seg], 1, 0.2, normalize=True)[0])
            p = permen(seg, 3, 1, normalize=True)
            expected[(d, w)] = (seg.size, s, p)

    assert set(rows) == set(expected)
    for k, (ln, s, p) in expected.items():
        r = rows[k]
        assert r["n_tok"] == ln
        got_s = r["sampen"]
        assert (got_s is None and math.isnan(s)) or abs(got_s - s) < 1e-12
        assert abs(r["permen"] - p) < 1e-12
    # the 300-token doc parallelizes into 3 windows; the 10-token doc drops
    assert ("s0", 2) in rows and all(d != "s3" for d, _ in rows)


def test_sliding_windows_overlap(spark):
    df = _df(spark, [100])
    out = windowed_entropy(df, window=50, stride=25, min_window=25, m=1, r=0.2)
    ids = sorted(r["window_id"] for r in out.collect())
    # starts at 0, 25, 50, 75 -> window sizes 50, 50, 50, 25
    assert ids == [0, 1, 2, 3]


def test_bounded_task_cost_shape(spark):
    """A very long sequence yields many fixed-size rows (scale guard)."""
    df = _df(spark, [5000])
    out = windowed_entropy(df, window=256, stride=256, m=1, r=0.2)
    rows = out.collect()
    assert len(rows) >= 19
    assert max(r["n_tok"] for r in rows) == 256


def test_window_timestamps_spread_across_tiers(spark):
    """A long windowed signal lands in MULTIPLE retention buckets when
    the token table carries real timestamps (round-2 gap: every window
    inherited the sequence start, stacking in one bucket)."""
    import datetime

    from pyspark.sql import functions as F

    from eristropy_spark.operators.rollup import rollup_tier

    start = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rng = np.random.default_rng(5)
    rows = [
        Row(
            doc_id="long0",
            tokens=[int(v) for v in rng.integers(0, 200, size=2000)],
            n_tok=2000,
            source="a",
            first_ts=start,
        )
    ]
    df = spark.createDataFrame(rows)
    # window=100, dt=1 s/token -> one point every 100 s: 20 windows
    # spanning ~33 minutes
    pts = windowed_entropy(
        df, window=100, stride=100, m=1, r=0.2, ts_col="first_ts", dt=1.0
    )
    got = pts.select("window_id", "ts").collect()
    assert len(got) == 20
    by_w = {r["window_id"]: r["ts"] for r in got}
    assert by_w[0] == start
    assert by_w[3] == start + datetime.timedelta(seconds=300)
    # tier parity: minute buckets cover the span, and every window lands
    # in its own minute (100 s stride > 60 s bucket -> >1 bucket, here 20)
    tier = rollup_tier(pts, "minute", from_tier=False)
    buckets = tier.agg(
        F.countDistinct("bucket").alias("nb"), F.sum("n_seq").alias("total")
    ).collect()[0]
    assert buckets["nb"] == 20 > 1
    assert buckets["total"] == 20


def test_window_ts_requires_positive_dt(spark):
    import pytest
    from pyspark.sql import functions as F

    df = _df(spark, [100]).withColumn("first_ts", F.current_timestamp())
    with pytest.raises(ValueError, match="dt"):
        windowed_entropy(df, window=50, ts_col="first_ts", dt=0.0)


def test_window_ts_col_also_in_keep_cols(spark):
    """The round-2 CLI call shape passed first_ts through keep_cols;
    with ts_col set too the column must not be selected twice."""
    import datetime

    df = _df(spark, [100]).withColumn(
        "first_ts",
        __import__("pyspark").sql.functions.lit(
            datetime.datetime(2024, 1, 1)
        ).cast("timestamp"),
    )
    out = windowed_entropy(
        df, window=50, m=1, r=0.2,
        keep_cols=("source", "first_ts"), ts_col="first_ts",
    )
    rows = out.collect()
    assert out.columns.count("ts") == 1 and len(rows) == 2
