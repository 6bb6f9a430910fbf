"""Streaming RSI/MACD ≡ batch rsi_macd bit-for-bit across micro-batch
boundaries (state carries EMA + Wilder recursion mid-seed and
mid-smoothing), plus the guard battery on the streaming signature."""

import datetime
import os

import numpy as np
import pytest

from eristropy_spark.operators.momentum import rsi_macd
from eristropy_spark.streaming.momentum import streaming_rsi_macd


def _t(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_streaming_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(29)
    # key 'a' long enough to cross the RSI seed (14 deltas) INSIDE the
    # second micro-batch; key 'b' stays short (RSI all NULL)
    rows = [
        ("a", _t(i), i, float(v))
        for i, v in enumerate(np.round(rng.normal(40, 8, 24), 2))
    ] + [
        ("b", _t(i), 100 + i, float(v))
        for i, v in enumerate(np.round(rng.normal(-3, 1, 8), 2))
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )
    batch = {
        (r["user_id"], r["event_id"]): r
        for r in rsi_macd(df, "user_id", tiebreak_col="event_id").collect()
    }

    # 3 micro-batches split at boundaries that straddle the seed window
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for chunk in (rows[0:9], rows[9:20], rows[20:32]):
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
        streaming_rsi_macd(stream, "user_id", tiebreak_col="event_id")
        .writeStream.format("memory")
        .queryName("smomentum")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_id"]): r
        for r in spark.sql("select * from smomentum").collect()
    }
    assert set(got) == set(batch)
    for k, s in got.items():
        b = batch[k]
        for c in ("macd", "macd_signal", "macd_hist", "rsi"):
            sv, bv = s[c], b[c]
            if bv is None or (isinstance(bv, float) and np.isnan(bv)):
                assert sv is None or (isinstance(sv, float) and np.isnan(sv))
            else:
                # bit-identical: same literal float ops in the same order
                assert sv == bv, (k, c, sv, bv)
    # the long key crossed the seed: streaming must have real RSI tail
    assert any(
        got[("a", e)]["rsi"] is not None
        for e in range(24)
        if ("a", e) in got
    )


def test_streaming_param_guards(spark):
    stream = spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS STRING) AS user_id",
        "timestamp AS ts",
        "CAST(value AS DOUBLE) AS value",
    )
    with pytest.raises(ValueError):
        streaming_rsi_macd(stream, "user_id", rsi_period=0)
    with pytest.raises(ValueError):
        streaming_rsi_macd(stream, "user_id", fast=30, slow=12)
    with pytest.raises(ValueError):
        streaming_rsi_macd(stream, "user_id", signal=0)
