"""Streaming MinHash-band near-dup: candidate parity with the batch
operator, horizon-bounded state (re-admission past the watermark), and
exact per-batch verdict reduction."""

import datetime
import os

from pyspark.sql import Row

from eristropy_spark.streaming.neardup import (
    near_dup_verdicts,
    streaming_minhash_events,
)

A = "the quick brown fox jumps over the lazy dog in the misty morning light today"
A2 = "the quick brown fox jumps over the lazy dog in the misty morning light now"
B = "completely unrelated content about spark physical plans and shuffle exchanges"


def _t(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def _run(spark, files, tmp_path, name, horizon="1 hour"):
    """One parquet file per micro-batch (maxFilesPerTrigger=1)."""
    src = str(tmp_path / f"src_{name}")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(files):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.mode("append").parquet(src)
    docs = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    events = streaming_minhash_events(docs, horizon=horizon)
    q = (
        events.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_near_dup_flagged_unrelated_passes(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = _run(
        spark,
        [
            [Row(doc_id=0, ts=_t(0), text=A)],
            [Row(doc_id=1, ts=_t(1), text=A2), Row(doc_id=2, ts=_t(2), text=B)],
        ],
        tmp_path,
        "nd1",
    )
    v = {
        r["doc_id"]: (r["is_near_dup"], r["matched_doc_id"], r["n_bands"])
        for r in near_dup_verdicts(events).collect()
    }
    assert v[0] == (False, None, 16)  # first arrival claims its buckets
    assert v[1][0] and v[1][1] == 0  # near-dup of doc 0, candidate points at it
    assert v[2] == (False, None, 16)  # unrelated doc passes
    # near-dup candidate rule == batch banding: doc 1 matches doc 0 on
    # the bands where their sub-signatures collide, and on no band does
    # unrelated doc 2 match anything
    assert v[1][2] == 16


def test_bucket_parity_with_batch_banding(spark, tmp_path):
    """Streaming events reproduce the batch operator's candidate rule:
    (a, b) is a streaming match iff minhash_lsh banding makes them
    bucket-mates (computed locally through the same kernels)."""
    import numpy as np

    from eristropy_spark.operators.dedup import _mix64, _shingle_hashes_batch

    events = _run(
        spark,
        [
            [Row(doc_id=0, ts=_t(0), text=A)],
            [Row(doc_id=1, ts=_t(1), text=A2)],
        ],
        tmp_path,
        "nd2",
    )
    got_matched_bands = {
        int(r["band"])
        for r in events.where("doc_id = 1 AND matched").collect()
    }
    seeds = np.random.RandomState(17).randint(1, 2**31, size=64).astype(np.uint64)
    sigs = []
    for base in _shingle_hashes_batch([A, A2], 3):
        sigs.append(_mix64(base[None, :], seeds[:, None]).min(axis=1))
    want = {
        b
        for b in range(16)
        if (sigs[0][b * 4 : b * 4 + 4] == sigs[1][b * 4 : b * 4 + 4]).all()
    }
    assert got_matched_bands == want
    assert want  # the fixture pair must actually collide somewhere


def test_horizon_evicts_bucket_state(spark, tmp_path):
    """A near-dup arriving after the horizon passed is fresh again —
    bucket state was evicted (bounded state, the ingest-door trade)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = _run(
        spark,
        [
            [Row(doc_id=0, ts=_t(0), text=A)],
            # advance the watermark far past 0:00 + 5 min horizon
            [Row(doc_id=9, ts=_t(30), text=B)],
            [Row(doc_id=1, ts=_t(35), text=A)],  # exact repeat, state gone
        ],
        tmp_path,
        "nd3",
        horizon="5 minutes",
    )
    v = {
        r["doc_id"]: r["is_near_dup"] for r in near_dup_verdicts(events).collect()
    }
    assert v[0] is False
    assert v[1] is False  # re-admitted: its buckets aged out


def test_requires_streaming_frame(spark):
    import pytest

    docs = spark.createDataFrame(
        [Row(doc_id=0, ts=_t(0), text=A)], "doc_id long, ts timestamp, text string"
    )
    with pytest.raises(ValueError, match="streaming"):
        streaming_minhash_events(docs)
