"""Streaming Allan variance ≡ batch allan_variance bit-for-bit on the
closed-bucket prefix across micro-batch boundaries, append-per-close
emission, integral-value and bucket-regression guards."""

import datetime
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from eristropy_spark.operators.rollup import allan_variance
from eristropy_spark.streaming.allan import streaming_allan


def _t(sec):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)


def _mk_rows(rng, key, secs, scale=100):
    return [
        (key, _t(float(s)), int(i), float(int(rng.integers(-scale, scale))))
        for i, s in enumerate(secs)
    ]


def test_streaming_matches_batch_closed_prefix(spark, tmp_path):
    rng = np.random.default_rng(97)
    taus = (60, 240)
    # key a: 300 points over 50 min; key b: sparse with gaps
    rows_a = _mk_rows(rng, "a", np.sort(rng.uniform(0, 3000, 300)))
    rows_b = _mk_rows(rng, "b", np.sort(rng.choice(range(0, 3000, 7), 60,
                                                   replace=False)))
    rows = rows_a + rows_b
    schema = "sid string, ts timestamp, event_id long, value double"
    df = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    n = len(rows)
    for chunk in (rows[: n // 3], rows[n // 3 : 2 * n // 3],
                  rows[2 * n // 3 :]):
        # chunks are time-interleaved across keys but each key's events
        # stay in time order (rows_a/rows_b individually sorted)
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_allan(
            stream, "sid", taus=taus, tiebreak_col="event_id"
        )
        .writeStream.format("memory")
        .queryName("sallan")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sallan").collect()
    assert got, "stream emitted nothing"

    # last emitted row per (key, tau) == batch on the closed-bucket
    # prefix (points strictly before the open bucket)
    last = {}
    for r in got:
        k = (r["sid"], r["tau_s"])
        if k not in last or r["bucket"] > last[k]["bucket"]:
            last[k] = r

    for (sid, tau), s in last.items():
        open_bucket = s["bucket"] + 1  # everything after last close
        closed = df.where(
            (F.col("sid") == sid)
            & (F.floor(F.unix_timestamp("ts") / tau) <= s["bucket"])
        )
        b = (
            allan_variance(closed, "sid", value_col="value", taus=(tau,))
            .collect()[0]
        )
        assert s["n_buckets"] == b["n_buckets"], (sid, tau)
        assert s["m_pairs"] == b["m_pairs"], (sid, tau)
        assert s["avar"] == b["avar"], (sid, tau, s["avar"], b["avar"])
        assert s["adev"] == b["adev"], (sid, tau)

    # every close emits exactly once: buckets strictly increase per key
    for k in last:
        bs = sorted(r["bucket"] for r in got
                    if (r["sid"], r["tau_s"]) == k)
        assert bs == sorted(set(bs))


def test_streaming_allan_rejects_fractional_values(spark, tmp_path):
    rows = [("a", _t(1.0), 0, 1.5), ("a", _t(100.0), 1, 2.0)]
    schema = "sid string, ts timestamp, event_id long, value double"
    src = str(tmp_path / "src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_allan(stream, "sid", taus=(60,), tiebreak_col="event_id")
        .writeStream.format("memory")
        .queryName("sallan_bad")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="integral|StreamingQuery"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise Exception(str(q.exception()))
