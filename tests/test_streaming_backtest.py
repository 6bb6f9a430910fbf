"""Streaming forecast backtest ≡ batch backtest_baselines bit-for-bit
on the same prefix, across micro-batch boundaries."""

import datetime
import os

import numpy as np

from eristropy_spark.operators.backtest import backtest_baselines
from eristropy_spark.streaming.backtest import streaming_backtest


def _t(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_streaming_matches_batch_prefixes(spark, tmp_path):
    rng = np.random.default_rng(71)
    rows = [
        ("a", _t(i), i, float(v))
        for i, v in enumerate(rng.integers(0, 500, 18))
    ] + [
        ("b", _t(i), i, float(v))
        for i, v in enumerate(np.cumsum(rng.integers(-5, 6, 18)))
    ]
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    # odd micro-batch boundaries so state must carry
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
        streaming_backtest(stream, "user_id", tiebreak_col="event_id")
        .writeStream.format("memory")
        .queryName("sbacktest")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_id"]): r
        for r in spark.sql("select * from sbacktest").collect()
    }
    assert len(got) == 36

    # every emitted row must equal the BATCH operator run on exactly
    # that key's prefix — bit-for-bit (both sides are exact integer
    # sums + the same fixed float expressions)
    by_key = {"a": rows[0:18], "b": rows[18:36]}
    cols = (
        "n", "mae_naive", "rmse_naive", "mae_mean", "mae_drift",
        "mase_mean", "mase_drift",
    )
    for key, krows in by_key.items():
        for cut in (1, 2, 3, 7, 18):
            prefix = krows[:cut]
            df = spark.createDataFrame(
                prefix,
                "user_id string, ts timestamp, event_id long, value double",
            )
            want = backtest_baselines(
                df, key="user_id", ts_col="ts", value_col="value",
                tiebreak_col="event_id",
            ).collect()[0]
            emitted = got[(key, cut - 1)]
            for c in cols:
                assert emitted[c] == want[c], (key, cut, c)
