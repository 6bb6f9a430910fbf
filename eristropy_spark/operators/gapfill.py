"""Gap-fill over rollup tiers — LOCF and linear interpolation.

Spark has no native gap-fill (SURVEY.md §4.2); the pattern here is:

1. dense per-source time grid: ``sequence(min_bucket, max_bucket,
   interval)`` + ``explode`` — generated from a tiny per-source
   min/max aggregate, so the grid construction is O(sources) rows in,
   O(buckets) rows out, fully parallel after the explode;
2. left join the real rollup rows onto the grid (broadcast the grid
   side only if small — by default the rollup is the big side and the
   join keys are (source, bucket), co-partitioned by the join);
3. LOCF: ``last(value, ignoreNulls=True)`` over an
   unbounded-preceding window per source;
   linear: previous/next anchors via paired windows + time fraction.

The windows partition by source — bounded partitions (one source's
bucket count), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dense_grid", "gapfill_locf", "gapfill_linear"]


def dense_grid(rollup: DataFrame, interval: str, bucket_col: str = "bucket") -> DataFrame:
    """(source, bucket) grid covering [min, max] per source at ``interval``."""
    bounds = rollup.groupBy("source").agg(
        F.min(bucket_col).alias("lo"), F.max(bucket_col).alias("hi")
    )
    return bounds.select(
        "source",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {interval}"))
        ).alias(bucket_col),
    )


def gapfill_locf(
    rollup: DataFrame,
    interval: str,
    value_cols: tuple[str, ...],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Dense grid with last-observation-carried-forward values."""
    grid = dense_grid(rollup, interval, bucket_col)
    joined = grid.join(rollup, ["source", bucket_col], "left")
    w = (
        Window.partitionBy("source")
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out.select("source", bucket_col, *value_cols)


def gapfill_linear(
    rollup: DataFrame,
    interval: str,
    value_cols: tuple[str, ...],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Dense grid with linear interpolation between real points.

    Leading/trailing gaps (no anchor on one side) stay at the nearest
    real value (i.e. degrade to LOCF / next-observation).
    """
    grid = dense_grid(rollup, interval, bucket_col)
    joined = grid.join(rollup, ["source", bucket_col], "left")
    t = F.unix_timestamp(bucket_col).cast("double")
    back = (
        Window.partitionBy("source")
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # "next anchor" = last non-null over a DESCENDING running frame.
    # An ascending (CURRENT ROW, UNBOUNDED FOLLOWING) frame looks
    # equivalent but Spark's UnboundedFollowing frame re-aggregates the
    # whole tail per row — O(rows²) per source partition (measured: a
    # 43k-row source partition burned minutes of CPU); both running
    # frames here are streaming O(rows).
    fwd = (
        Window.partitionBy("source")
        .orderBy(F.col(bucket_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.withColumn("_t", t)
    for c in value_cols:
        real_t = F.when(F.col(c).isNotNull(), F.col("_t"))
        prev_v = F.last(F.col(c), ignorenulls=True).over(back)
        prev_t = F.last(real_t, ignorenulls=True).over(back)
        next_v = F.last(F.col(c), ignorenulls=True).over(fwd)
        next_t = F.last(real_t, ignorenulls=True).over(fwd)
        frac = (F.col("_t") - prev_t) / (next_t - prev_t)
        interp = F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
            F.when(prev_t.isNull(), next_v)
            .when(next_t.isNull(), prev_v)
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
        out = out.withColumn(f"_fill_{c}", interp)
    keep = [F.col(f"_fill_{c}").alias(c) for c in value_cols]
    return out.select("source", bucket_col, *keep)
