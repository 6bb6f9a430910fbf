"""Streaming sessionization ≡ batch sessionize on the same events.

A far-future sentinel drags the watermark past every real session's
close, so append mode emits every session; the emitted rows (minus the
sentinel's own session) must equal the batch operator's per-session
aggregates row for row.
"""

import math
import os

from pyspark.sql import functions as F

from eristropy_spark.operators.temporal import sessionize
from eristropy_spark.streaming.sessions import streaming_sessionize

SF_DIR = "/root/testdata/sf0.001"
SENTINEL_USER = -999999


def _r6(x):
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return None
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_streaming_sessions_match_batch(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "value"
    )

    src = str(tmp_path / "sess_src")
    os.makedirs(src, exist_ok=True)
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    sentinel = (
        ev.limit(1)
        .withColumn("user_id", F.lit(SENTINEL_USER).cast("long"))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 365 DAYS"))
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = streaming_sessionize(spark, src, gap="30 minutes",
                                  watermark="1 hour")
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], _r6(r["sum_value"])
        )
        for r in spark.sql("SELECT * FROM sess_stream").collect()
        if r["user_id"] != SENTINEL_USER
    }

    batch = (
        sessionize(ev, "user_id", ts_col="ts", gap_sec=1800.0,
                   tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .collect()
    )
    want = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], _r6(r["sum_value"])
        )
        for r in batch
    }
    assert len(want) > 50
    assert got == want
