"""Structured-Streaming variant of the first rollup tier.

The batch cascade (operators/rollup.py) is the primary path per
SURVEY.md §1.3 (the reference has no streaming semantics); this module
covers the engine-level streaming surface: a file-source stream of
entropy points → watermarked tumbling-window aggregation → sink.
Late data beyond the watermark is dropped by Spark; the aggregates are
the same decomposable set as the batch tier, so a streaming 1-min tier
can feed the batch hourly merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["streaming_minute_rollup", "run_available_now"]


def streaming_minute_rollup(
    spark: SparkSession,
    input_path: str,
    schema: str = "doc_id string, source string, ts timestamp, sampen double, permen double",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming (source, 1-min window) rollup over an entropy-points dir."""
    pts = (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .withWatermark("ts", watermark)
    )
    valid = lambda c: F.when(~F.isnan(F.col(c)), F.col(c))  # noqa: E731
    return (
        pts.groupBy("source", F.window("ts", "1 minute").alias("win"))
        .agg(
            F.count("*").alias("n_seq"),
            F.count(valid("sampen")).alias("n_sampen"),
            F.sum(valid("sampen")).alias("sum_sampen"),
            F.min(valid("sampen")).alias("min_sampen"),
            F.max(valid("sampen")).alias("max_sampen"),
            F.count(valid("permen")).alias("n_permen"),
            F.sum(valid("permen")).alias("sum_permen"),
            F.min(valid("permen")).alias("min_permen"),
            F.max(valid("permen")).alias("max_permen"),
        )
        .select(
            "source",
            F.col("win.start").alias("bucket"),
            "n_seq",
            "n_sampen",
            "sum_sampen",
            "min_sampen",
            "max_sampen",
            "n_permen",
            "sum_permen",
            "min_permen",
            "max_permen",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, query_name: str = "rollup_stream"
):
    """Drain everything currently available into an in-memory table and
    stop — the batch-equivalent execution used by tests and backfills."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
