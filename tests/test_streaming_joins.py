"""Stream-stream event-time interval join ≡ the same join run in batch.

Left = click events, right = view events, key = user_id, window =
[ts - 1 day, ts + 1 day] (the sf0.001 corpus spreads 1000 events over
30 days, so sub-hour windows are vacuous).  The streaming run (file
source, availableNow, append) must emit exactly the batch plan's rows;
further tests pin the inclusive bounds, the validation guards, and —
with day-ordered micro-batches — that join state is actually evicted
by the watermark instead of accumulating the whole corpus.
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from eristropy_spark.streaming.joins import streaming_interval_join

SF_DIR = "/root/testdata/sf0.001"
DAY = 86400


def _key(r):
    return (r["event_id"], r["r_event_id"])


def _sides(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    left = ev.where(F.col("event_type") == "click").drop("event_type")
    right = ev.where(F.col("event_type") == "view").drop("event_type")
    return left, right


def test_streaming_join_matches_batch(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    left_b, right_b = _sides(spark)

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lsrc), os.makedirs(rsrc)
    left_b.coalesce(2).write.mode("overwrite").parquet(lsrc)
    right_b.coalesce(2).write.mode("overwrite").parquet(rsrc)

    ls = spark.readStream.schema(left_b.schema).parquet(lsrc)
    rs = spark.readStream.schema(right_b.schema).parquet(rsrc)
    joined = streaming_interval_join(
        ls, rs, on="user_id", before_sec=DAY, after_sec=DAY,
        left_watermark="1 day", right_watermark="1 day",
    )
    q = (
        joined.select("event_id", "r_event_id", "value", "r_value")
        .writeStream.format("memory")
        .queryName("sj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        _key(r): (r["value"], r["r_value"])
        for r in spark.sql("SELECT * FROM sj").collect()
    }

    batch = streaming_interval_join(
        left_b, right_b, on="user_id", before_sec=DAY, after_sec=DAY
    ).select("event_id", "r_event_id", "value", "r_value").collect()
    want = {_key(r): (r["value"], r["r_value"]) for r in batch}

    assert len(want) > 100  # non-vacuous at sf0.001
    assert got == want


def test_interval_bounds_inclusive_and_validation(spark):
    base = dt.datetime(2024, 1, 1)

    def _df(rows):
        return spark.createDataFrame(
            [(i, 1, base + dt.timedelta(seconds=s)) for i, s in rows],
            "event_id long, user_id long, ts timestamp",
        )

    left = _df([(1, 100)])
    # exactly on both inclusive edges, one just outside each
    right = _df([(10, 40), (11, 39), (12, 160), (13, 161)])
    out = streaming_interval_join(
        left, right, on="user_id", before_sec=60, after_sec=60
    ).select("event_id", "r_event_id").collect()
    assert {r["r_event_id"] for r in out} == {10, 12}

    with pytest.raises(ValueError, match="must be >= 0"):
        streaming_interval_join(left, right, on="user_id", before_sec=-1)
    with pytest.raises(ValueError, match="join key"):
        streaming_interval_join(left, right, on="nope")
    with pytest.raises(ValueError, match="colliding"):
        streaming_interval_join(
            left.withColumn("r_event_id", F.lit(0)), right, on="user_id"
        )


def test_streaming_join_state_is_bounded(spark, tmp_path):
    """With day-ordered micro-batches, the range condition on the raw
    event-time columns must let the planner evict state: total state
    rows at the end must be far below total input rows."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    left_b, right_b = _sides(spark)
    n_in = left_b.count() + right_b.count()

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lsrc), os.makedirs(rsrc)
    # append one file per side per 5-day slice IN TIME ORDER so the
    # file source (which feeds oldest files first) advances the
    # watermark between micro-batches
    dates = sorted(
        r["d"]
        for r in left_b.select(
            F.floor(F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 5).alias("d")
        ).distinct().collect()
    )
    for d in dates:
        sl = F.floor(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 5
        ) == d
        left_b.where(sl).coalesce(1).write.mode("append").parquet(lsrc)
        right_b.where(sl).coalesce(1).write.mode("append").parquet(rsrc)

    ls = spark.readStream.schema(left_b.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(lsrc)
    rs = spark.readStream.schema(right_b.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(rsrc)
    joined = streaming_interval_join(
        ls, rs, on="user_id", before_sec=DAY, after_sec=DAY,
        left_watermark="1 day", right_watermark="1 day",
    )
    q = (
        joined.select("event_id", "r_event_id")
        .writeStream.format("memory")
        .queryName("sj_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = sum(
        op["numRowsTotal"] for op in q.lastProgress["stateOperators"]
    )
    # unbounded state would retain ~all input rows; eviction keeps only
    # ~watermark + join-window (≈ a few days of a 30-day corpus)
    assert 0 < state_rows < n_in / 2
