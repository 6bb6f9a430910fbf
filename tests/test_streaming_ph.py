"""Streaming Page–Hinkley ≡ batch page_hinkley across micro-batch
boundaries (state carries the exact-integer fold), alarm semantics,
validation."""

import datetime
import os

import pytest

from eristropy_spark.operators.changepoint import page_hinkley
from eristropy_spark.streaming.pagehinkley import streaming_page_hinkley


def _t(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def _write_batches(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for rows in batches:
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
    out = streaming_page_hinkley(stream, "user_id", **kwargs)
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


def test_streaming_ph_matches_batch_summary(spark, tmp_path):
    # upward mean shift at minute 10 for user a; flat for user b —
    # split across 3 micro-batches so state must carry the fold
    rows = [
        ("a", _t(i), i, 10.0 + (0.0 if i < 10 else 20.0)) for i in range(20)
    ]
    rows += [("b", _t(i), i, 10.0 + 0.25 * (i % 2)) for i in range(20)]
    batches = [rows[0:14], rows[14:27], rows[27:40]]
    src = _write_batches(spark, tmp_path, batches)

    got = _run(
        spark, src, tmp_path, "sph",
        delta=0.5, lam=15.0, tiebreak_col="event_id",
    )
    assert len(got) == 40
    # last chart point per key == the batch per-key summary
    last = {}
    for r in got:
        cur = last.get(r["user_id"])
        if cur is None or r["i"] > cur["i"]:
            last[r["user_id"]] = r

    batch_df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )
    want = {
        r["user_id"]: r
        for r in page_hinkley(
            batch_df, key="user_id", tiebreak_col="event_id",
            delta=0.5, lam=15.0,
        ).collect()
    }
    for k, w in want.items():
        g = last[k]
        assert g["i"] == w["n"]
        assert g["ph_max"] == float(w["ph_max"])
        assert g["alarm_i"] == w["alarm_i"]
    # the planted shift alarms shortly after minute 10; flat never does
    assert want["a"]["alarm_i"] is not None and want["a"]["alarm_i"] >= 11
    assert want["b"]["alarm_i"] is None
    assert last["a"]["alarm_i"] == want["a"]["alarm_i"]
    assert last["b"]["alarm_i"] is None


def test_streaming_ph_chart_is_prefix_consistent(spark, tmp_path):
    # the chart at row i must equal the batch summary over the prefix
    rows = [("a", _t(i), i, float((i * 7) % 13)) for i in range(15)]
    src = _write_batches(spark, tmp_path, [rows[:5], rows[5:11], rows[11:]])
    got = sorted(
        _run(
            spark, src, tmp_path, "sph_prefix",
            delta=0.0, lam=100.0, tiebreak_col="event_id",
        ),
        key=lambda r: r["i"],
    )
    for i in (3, 9, 15):
        prefix_df = spark.createDataFrame(
            rows[:i], "user_id string, ts timestamp, event_id long, value double"
        )
        w = page_hinkley(
            prefix_df, key="user_id", tiebreak_col="event_id",
            delta=0.0, lam=100.0,
        ).collect()[0]
        assert got[i - 1]["ph_max"] == float(w["ph_max"])


def test_streaming_ph_validation(spark):
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="lam must be"):
        streaming_page_hinkley(stream, "user_id", lam=0.0)
    with pytest.raises(ValueError, match="not exact at"):
        streaming_page_hinkley(stream, "user_id", delta=1e-9)
    with pytest.raises(ValueError, match="exact_decimals"):
        streaming_page_hinkley(stream, "user_id", exact_decimals=13)
