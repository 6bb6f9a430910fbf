"""Streaming Holt–Winters ≡ batch holt_winters bit-for-bit across
micro-batch boundaries (state carries the init buffer, then the
level/trend/seasonal-ring recursion), the held-back init flush, the
short-key drop rule, plus the guard battery on the signature."""

import datetime
import os

import numpy as np
import pytest

from eristropy_spark.operators.smoothing import holt_winters
from eristropy_spark.streaming.holtwinters import streaming_holt_winters


def _t(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_streaming_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(31)
    m = 3
    # key 'a': 20 points, init (2m=6) completes INSIDE micro-batch 2;
    # key 'b': 4 points < 2m — batch drops it, streaming must emit none
    season = [10.0, -4.0, -6.0]
    rows = [
        ("a", _t(i), i,
         float(round(50 + 0.7 * i + season[i % m] + rng.normal(0, 2), 2)))
        for i in range(20)
    ] + [
        ("b", _t(i), 100 + i, float(round(rng.normal(-3, 1), 2)))
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )
    batch = {
        (r["user_id"], r["event_id"]): r
        for r in holt_winters(
            df, "user_id", period=m, tiebreak_col="event_id"
        ).collect()
    }
    assert all(k[0] == "a" for k in batch)  # b dropped by the init rule

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for chunk in (rows[0:4], rows[4:11], rows[11:24]):
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
        streaming_holt_winters(
            stream, "user_id", period=m, tiebreak_col="event_id"
        )
        .writeStream.format("memory")
        .queryName("shw")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_id"]): r
        for r in spark.sql("select * from shw").collect()
    }
    assert set(got) == set(batch)
    for k, s in got.items():
        b = batch[k]
        assert s["i"] == b["i"], (k, s["i"], b["i"])
        assert s["ts"] == b["ts"], (k, s["ts"], b["ts"])
        for c in ("level", "trend", "seasonal", "fitted"):
            sv, bv = s[c], b[c]
            if bv is None:
                assert sv is None, (k, c, sv)
            else:
                # bit-identical: same literal float ops in the same order
                assert sv == bv, (k, c, sv, bv)
    # init rows flushed late but present, with NULL level and real
    # seasonal; steady-state tail has full state
    assert got[("a", 0)]["level"] is None
    assert got[("a", 0)]["seasonal"] is not None
    assert got[("a", 19)]["fitted"] is not None


def test_streaming_holtwinters_param_guards(spark):
    stream = spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS STRING) AS user_id",
        "timestamp AS ts",
        "CAST(value AS DOUBLE) AS value",
    )
    with pytest.raises(ValueError, match="period"):
        streaming_holt_winters(stream, "user_id", period=1)
    with pytest.raises(ValueError, match="alpha"):
        streaming_holt_winters(stream, "user_id", alpha=0.0)
    with pytest.raises(ValueError, match="beta"):
        streaming_holt_winters(stream, "user_id", beta=1.5)
    with pytest.raises(ValueError, match="gamma"):
        streaming_holt_winters(stream, "user_id", gamma=2.0)
    with pytest.raises(ValueError, match="exact_decimals"):
        streaming_holt_winters(stream, "user_id", exact_decimals=0)
