"""Structured-Streaming sessionization — native ``session_window``.

The batch ``operators/temporal.sessionize`` (lag + running sum) is the
primary path; this module is the streaming surface for the same
semantics: Spark's native ``session_window`` aggregation merges events
whose gaps are <= the configured inactivity gap (verified equivalent to
the batch operator's strict-greater split rule in
tests/test_temporal_sampling.py), maintains open sessions as streaming
state, and emits a session row once the watermark passes its close.

State size is O(open sessions), eviction is watermark-driven — the
standard production shape for clickstream sessionization at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["streaming_sessionize"]


def streaming_sessionize(
    spark: SparkSession,
    input_path: str,
    schema: str = "event_id long, ts timestamp, user_id long, value double",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value) per
    closed session, from a file-source event stream."""
    ev = (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .withWatermark("ts", watermark)
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "sum_value"
        )
    )
