"""Streaming LOCF gap-fill ≡ batch gap-fill for all watermark-final buckets.

The batch 1-min rollup of the sf0.001 events is streamed file-by-file
(plus a far-future sentinel that drags the watermark forward); every
bucket the stream emits must match the batch ``gapfill_locf`` row, and
the stream must emit a dense, hole-free prefix of each source's grid.
"""

import os

from pyspark.sql import functions as F

from eristropy_spark.operators.gapfill import gapfill_locf
from eristropy_spark.streaming.gapfill import streaming_gapfill_locf

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_gapfill_matches_batch(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    minute = ev.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("minute", "ts").alias("bucket"),
    ).agg(F.avg("value").alias("avg_value"))

    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    minute.coalesce(1).write.mode("overwrite").parquet(src)
    sentinel = (
        minute.groupBy()
        .agg(F.max("bucket").alias("bucket"))
        .withColumn("source", F.lit("zz_sentinel"))
        .withColumn("bucket", F.col("bucket") + F.expr("INTERVAL 2 DAYS"))
        .withColumn("avg_value", F.lit(0.0))
        .select("source", "bucket", "avg_value")
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(minute.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_gapfill_locf(stream, interval="1 minute", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_gapfill_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["source"], r["bucket"]): r["avg_value"]
        for r in spark.sql("SELECT * FROM stream_gapfill_test").collect()
        if r["source"] != "zz_sentinel"
    }
    assert got, "stream emitted nothing"

    batch = {
        (r["source"], r["bucket"]): r["avg_value"]
        for r in gapfill_locf(minute, "1 minute", ("avg_value",)).collect()
    }
    # inside each source's batch range [first, last observed bucket] the
    # stream must agree exactly; BEYOND it the stream legitimately keeps
    # filling the open-ended gap (it cannot know a source "ended") with
    # the final carried value
    last_val, max_bucket = {}, {}
    for (s, b), v in sorted(batch.items(), key=lambda kv: kv[0][1]):
        last_val[s] = v
        max_bucket[s] = b
    for (s, b), v in got.items():
        if (s, b) in batch:
            assert v == batch[(s, b)], ((s, b), v, batch[(s, b)])
        else:
            assert b > max_bucket[s], (s, b)
            assert v == last_val[s], ((s, b), v, last_val[s])
    # dense coverage: the whole batch grid is contained in the emission
    for source in {s for s, _ in got}:
        missing = [
            b for (s, b) in batch if s == source and (s, b) not in got
        ]
        assert not missing, (source, missing[:5])


def test_streaming_linear_matches_batch(spark, tmp_path):
    from eristropy_spark.operators.gapfill import gapfill_linear
    from eristropy_spark.streaming.gapfill import streaming_gapfill_linear

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    minute = ev.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("minute", "ts").alias("bucket"),
    ).agg(F.avg("value").alias("avg_value"))

    src = str(tmp_path / "lin_src")
    os.makedirs(src, exist_ok=True)
    minute.coalesce(1).write.mode("overwrite").parquet(src)
    sentinel = (
        minute.groupBy()
        .agg(F.max("bucket").alias("bucket"))
        .withColumn("source", F.lit("zz_sentinel"))
        .withColumn("bucket", F.col("bucket") + F.expr("INTERVAL 2 DAYS"))
        .withColumn("avg_value", F.lit(0.0))
        .select("source", "bucket", "avg_value")
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(minute.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_gapfill_linear(stream, interval="1 minute", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_linfill_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "lin_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["source"], r["bucket"]): r["avg_value"]
        for r in spark.sql("SELECT * FROM stream_linfill_test").collect()
        if r["source"] != "zz_sentinel"
    }
    batch = {
        (r["source"], r["bucket"]): r["avg_value"]
        for r in gapfill_linear(minute, "1 minute", ("avg_value",)).collect()
    }
    # every final anchor was emitted, so the emitted set equals the
    # whole batch grid (which ends at each source's last anchor)
    assert set(got) == set(batch)
    for k, v in got.items():
        # interpolation fractions are computed in ms (stream) vs seconds
        # (batch window exprs) — identical up to float ulp
        assert abs(v - batch[k]) < 1e-9, (k, v, batch[k])
