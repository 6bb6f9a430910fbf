"""Streaming exact dedup ≡ batch first-arrival dedup, plus the
bounded-state horizon semantic (a duplicate beyond the watermark is
re-admitted — state was evicted, by design)."""

import datetime
import os

from pyspark.sql import Row

from eristropy_spark.streaming.dedup import streaming_exact_dedup


def _t(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def _run_stream(spark, src, tmp_path, name, **kwargs):
    docs = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file so
        .parquet(src)                     # the watermark advances between
    )
    out = streaming_exact_dedup(docs, **kwargs)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_streaming_dedup_first_arrival_wins(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "src1")
    os.makedirs(src, exist_ok=True)
    rows = [
        Row(doc_id=0, ts=_t(0), text="alpha beta"),
        Row(doc_id=1, ts=_t(1), text="gamma"),
        Row(doc_id=2, ts=_t(2), text="  Alpha Beta "),  # dup of 0 (normalized)
        Row(doc_id=3, ts=_t(3), text="delta"),
        Row(doc_id=4, ts=_t(4), text="GAMMA"),          # dup of 1
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(src)
    got = {r["doc_id"] for r in _run_stream(
        spark, src, tmp_path, "dedup1", watermark="1 hour"
    )}
    assert got == {0, 1, 3}


def test_streaming_dedup_watermark_evicts_state(spark, tmp_path):
    """A duplicate arriving AFTER the original aged out of the horizon
    is re-admitted: state is bounded by the watermark, and the module
    docstring sells exactly this trade."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "src2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [Row(doc_id=0, ts=_t(0), text="omega")]
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # batch 2: same content 2 min later (inside horizon -> dropped) and
    # an unrelated doc far in the future that drags the watermark
    spark.createDataFrame(
        [
            Row(doc_id=1, ts=_t(2), text="omega"),
            Row(doc_id=2, ts=_t(50), text="filler"),
        ]
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 3: unrelated row; state eviction (end of a batch) runs with
    # the watermark at 45, removing the aged-out "omega" key
    spark.createDataFrame(
        [Row(doc_id=3, ts=_t(51), text="filler two")]
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 4: same content again, long after doc 0 left the horizon
    spark.createDataFrame(
        [Row(doc_id=4, ts=_t(55), text="omega")]
    ).coalesce(1).write.mode("append").parquet(src)

    got = sorted(
        r["doc_id"]
        for r in _run_stream(
            spark, src, tmp_path, "dedup2", watermark="5 minutes"
        )
    )
    # 0 first arrival; 1 dropped (within horizon); 2 and 3 pass; 4
    # re-admitted because the "omega" key was evicted at watermark 45
    assert got == [0, 2, 3, 4]


def test_streaming_dedup_rejects_batch_df(spark):
    import pytest

    df = spark.createDataFrame([Row(doc_id=0, ts=_t(0), text="x")])
    with pytest.raises(ValueError, match="streaming"):
        streaming_exact_dedup(df)
