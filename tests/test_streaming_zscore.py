"""Streaming lifetime z-score ≡ batch expanding_zscore bit-for-bit
across micro-batch boundaries, plus numpy-level sanity of the batch
operator."""

import datetime
import os

import numpy as np
import pytest

from eristropy_spark.operators.rolling import expanding_zscore
from eristropy_spark.streaming.zscore import streaming_zscore


def _t(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_expanding_zscore_matches_numpy(spark):
    rng = np.random.default_rng(20)
    vals = [float(v) for v in rng.normal(50, 10, 40)]
    rows = [("a", _t(i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )
    got = {
        r["event_id"]: r
        for r in expanding_zscore(df, "user_id", tiebreak_col="event_id").collect()
    }
    q = np.floor(np.asarray(vals) * 1e6 + 0.5) / 1e6
    for i in range(len(vals)):
        pre = q[: i + 1]
        assert got[i]["exp_mean"] == pytest.approx(pre.mean(), rel=1e-9)
        if i == 0:
            assert got[i]["exp_std"] is None and got[i]["exp_z"] is None
        else:
            std = float(np.std(pre, ddof=1))
            assert got[i]["exp_std"] == pytest.approx(std, rel=1e-7)
            assert got[i]["exp_z"] == pytest.approx(
                (q[i] - pre.mean()) / std, rel=1e-6
            )


def test_streaming_zscore_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(21)
    rows = [
        ("a", _t(i), i, float(v))
        for i, v in enumerate(rng.normal(10, 3, 18))
    ] + [
        ("b", _t(i), i, float(v))
        for i, v in enumerate(rng.normal(-5, 1, 18))
    ]
    # 3 micro-batches split at ODD boundaries so state must carry
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for chunk in (rows[0:13], rows[13:26], rows[26:36]):
        spark.createDataFrame(
            chunk, "user_id string, ts timestamp, event_id long, value double"
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "user_id string, ts timestamp, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_zscore(stream, "user_id", tiebreak_col="event_id")
        .writeStream.format("memory")
        .queryName("szscore")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_id"]): r
        for r in spark.sql("select * from szscore").collect()
    }
    assert len(got) == 36

    batch_df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )
    want = {
        (r["user_id"], r["event_id"]): r
        for r in expanding_zscore(
            batch_df, "user_id", tiebreak_col="event_id"
        ).collect()
    }
    for key, w in want.items():
        g = got[key]
        # bit-identical: both sides reduce to the same exact integer
        # sums and the same fixed-order float expressions
        assert g["exp_mean"] == w["exp_mean"], key
        assert g["exp_std"] == w["exp_std"], key
        assert g["exp_z"] == w["exp_z"], key
