"""Streaming Croston ≡ batch croston bit-for-bit on closed buckets,
across micro-batch boundaries (a bucket's events split across two
micro-batches must still count once, with the full count), plus the
guard battery on the signature."""

import datetime

import pytest

from eristropy_spark.operators.intermittent import croston
from eristropy_spark.streaming.intermittent import streaming_croston


def _t(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(
        minutes=minute, seconds=second
    )


def test_streaming_matches_batch_on_closed_buckets(spark, tmp_path):
    import os

    # key 'a': buckets 0 (x=3), 5 (x=1), 6 (x=2, SPLIT across
    # micro-batches 1|2), 20 (x=4, final/open — never emitted);
    # key 'b': single bucket (open forever — nothing emitted)
    rows = (
        [("a", _t(0, s)) for s in (1, 2, 3)]
        + [("a", _t(5))]
        + [("a", _t(6, 10))]          # ends micro-batch 1
        + [("a", _t(6, 50))]          # begins micro-batch 2
        + [("a", _t(20, s)) for s in (0, 1, 2, 3)]
        + [("b", _t(2))]
    )
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    batch = {
        (r["user_id"], r["k"]): r
        for r in croston(df, "user_id").collect()
    }

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for chunk in (rows[0:5], rows[5:10], rows[10:11]):
        spark.createDataFrame(chunk, "user_id string, ts timestamp") \
            .coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_croston(stream, "user_id")
        .writeStream.format("memory")
        .queryName("scroston")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["k"]): r
        for r in spark.sql("select * from scroston").collect()
    }
    # closed buckets only: batch minus each key's final bucket; key b
    # (one open bucket) emits nothing
    want_keys = {("a", 1), ("a", 2), ("a", 3)}
    assert set(got) == want_keys
    for key in want_keys:
        s, b = got[key], batch[key]
        assert s["bucket_ts"] == b["bucket_ts"]
        assert (s["x"], s["interval"]) == (b["x"], b["interval"])
        # bit-identical: same literal float ops in the same order
        for c in ("z", "p", "croston", "sba"):
            assert s[c] == b[c], (key, c, s[c], b[c])
    # the split bucket (minute 6) carries its FULL count of 2
    assert got[("a", 3)]["x"] == 2


def test_streaming_croston_param_guards(spark):
    stream = spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS STRING) AS user_id", "timestamp AS ts"
    )
    with pytest.raises(ValueError, match="alpha"):
        streaming_croston(stream, "user_id", alpha=1.5)
    with pytest.raises(ValueError, match="bucket"):
        streaming_croston(stream, "user_id", bucket="week")
