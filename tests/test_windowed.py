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
