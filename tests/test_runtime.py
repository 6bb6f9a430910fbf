"""Checkpoint/resume + streaming-rollup tests (north-rule runtime)."""

import datetime as dt
import json
import os

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_checkpoint_resume(spark, tmp_path):
    from eristropy_spark.runtime.checkpoint import CheckpointManager

    cm = CheckpointManager(str(tmp_path / "ckpt"))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.range(100).select(
            F.col("id"), (F.col("id") * 2).alias("double_id")
        )

    a = cm.run_stage(spark, "stage1", "fp-v1", compute)
    assert a.count() == 100 and calls["n"] == 1

    # same fingerprint => resume from the published parquet, no recompute
    b = cm.run_stage(spark, "stage1", "fp-v1", compute)
    assert b.count() == 100 and calls["n"] == 1

    # changed fingerprint => recompute
    c = cm.run_stage(spark, "stage1", "fp-v2", compute)
    assert c.count() == 100 and calls["n"] == 2

    m = cm.manifest("stage1")
    assert m["rows"] == 100
    assert m["fingerprint"] == "fp-v2"
    assert m["rows_per_sec"] > 0
    assert sum(p["rows"] for p in m["partitions"]) == 100
    # manifest is valid JSON on disk (atomic publish)
    with open(os.path.join(str(tmp_path / "ckpt"), "stage1.manifest.json")) as f:
        assert json.load(f)["stage"] == "stage1"


def test_streaming_minute_rollup_matches_batch(spark, tmp_path):
    from eristropy_spark.operators.rollup import rollup_tier
    from eristropy_spark.streaming.rollup import (
        run_available_now,
        streaming_minute_rollup,
    )

    rng = np.random.default_rng(3)
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            doc_id=f"d{i}",
            source=f"src{i % 2}",
            ts=base + dt.timedelta(seconds=int(rng.integers(0, 600))),
            sampen=float(rng.uniform(0, 2)),
            permen=float(rng.uniform(0, 1)),
        )
        for i in range(200)
    ]
    pts = spark.createDataFrame(rows)
    in_dir = str(tmp_path / "pts")
    pts.write.parquet(in_dir)

    stream = streaming_minute_rollup(spark, in_dir)
    q = run_available_now(stream, str(tmp_path / "ckpt"), "t_stream_rollup")
    got = {
        (r["source"], r["bucket"]): (r["n_seq"], round(r["sum_sampen"], 9))
        for r in spark.sql("select * from t_stream_rollup").collect()
    }
    want = {
        (r["source"], r["bucket"]): (r["n_seq"], round(r["sum_sampen"], 9))
        for r in rollup_tier(pts, "minute").collect()
    }
    assert got == want
    q.stop()


def test_stateful_running_stats(spark, tmp_path):
    """applyInPandasWithState: running per-source stats accumulate across
    micro-batches (two files -> two triggers via maxFilesPerTrigger)."""
    import numpy as np
    from pyspark.sql import Row

    from eristropy_spark.streaming.stateful import running_source_stats

    rng = np.random.default_rng(5)
    in_dir = tmp_path / "pts_in"
    rows1 = [
        Row(doc_id=f"a{i}", source="s0", sampen=float(rng.uniform(0.5, 1.5)))
        for i in range(50)
    ]
    rows2 = [
        Row(doc_id=f"b{i}", source="s0", sampen=float(rng.uniform(1.5, 2.5)))
        for i in range(30)
    ]
    spark.createDataFrame(rows1).coalesce(1).write.parquet(str(in_dir / "f1"))
    spark.createDataFrame(rows2).coalesce(1).write.parquet(str(in_dir / "f2"))

    stream = (
        spark.readStream.schema("doc_id string, source string, sampen double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/*")
    )
    out = running_source_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_running_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    hist = spark.sql("select * from t_running_stats").collect()
    # final (largest n_seq) row must equal the batch aggregate of ALL data
    final = max(hist, key=lambda r: r["n_seq"])
    all_vals = [r.sampen for r in rows1 + rows2]
    assert final["n_seq"] == 80
    assert abs(final["avg_sampen"] - sum(all_vals) / 80) < 1e-9
    assert final["min_sampen"] == min(all_vals)
    assert final["max_sampen"] == max(all_vals)
    # state really accumulated across more than one trigger
    assert len(hist) >= 2
    q.stop()
