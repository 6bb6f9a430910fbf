"""Streaming CUSUM ≡ batch known-target CUSUM row-for-row across
micro-batch boundaries (state carries the fold), plus alarm semantics
and validation."""

import datetime
import os

import pytest

from eristropy_spark.operators.changepoint import cusum_changepoints
from eristropy_spark.streaming.cusum import streaming_cusum


def _t(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def _write_batches(spark, tmp_path, batches):
    """One parquet file per micro-batch (maxFilesPerTrigger=1)."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "user_id string, ts timestamp, event_id long, value double"
        ).coalesce(1).write.mode("append").parquet(src)
    return src


def _run(spark, src, tmp_path, name, **kwargs):
    stream = (
        spark.readStream.schema(
            "user_id string, ts timestamp, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_cusum(stream, "user_id", **kwargs)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").collect()


def test_streaming_cusum_matches_batch(spark, tmp_path):
    # a level shift at minute 6 for user a; flat series for user b —
    # split across 3 micro-batches so state must carry the fold
    rows = [("a", _t(i), i, 1.0 + (0.0 if i < 6 else 2.5)) for i in range(12)]
    rows += [("b", _t(i), i, 1.0) for i in range(12)]
    batches = [rows[0:8], rows[8:16], rows[16:24]]
    src = _write_batches(spark, tmp_path, batches)

    got = {
        (r["user_id"], r["event_id"]): r
        for r in _run(
            spark, src, tmp_path, "scusum",
            target=1.0, k=0.25, h=3.0, tiebreak_col="event_id",
        )
    }
    assert len(got) == 24

    batch_df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )
    want = {
        (r["user_id"], r["event_id"]): r
        for r in cusum_changepoints(
            batch_df, "user_id", tiebreak_col="event_id",
            k=0.25, h=3.0, target=1.0,
        ).collect()
    }
    for key, w in want.items():
        g = got[key]
        assert g["cusum_pos"] == float(w["cusum_pos"])
        assert g["cusum_neg"] == float(w["cusum_neg"])
        assert g["alarm"] == (
            float(w["cusum_pos"]) > 3.0 or float(w["cusum_neg"]) > 3.0
        )
    # the shift actually alarms, and before the shift it doesn't
    assert got[("a", 11)]["alarm"]
    assert not got[("a", 5)]["alarm"]
    assert not got[("b", 11)]["alarm"]


def test_streaming_cusum_validation(spark):
    # validation fires before any column is touched, so a rate source
    # (wrong schema, but never selected) is a fine stand-in
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="k must be"):
        streaming_cusum(stream, "user_id", target=0.0, k=-1.0)
    with pytest.raises(ValueError, match="not exact at"):
        streaming_cusum(stream, "user_id", target=0.1234567, k=0.5)
    with pytest.raises(ValueError, match="h="):
        streaming_cusum(stream, "user_id", target=0.0, h=1.23456789)
