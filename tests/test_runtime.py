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
