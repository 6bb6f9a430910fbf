"""Anomaly episodes — consecutive rolling-z-score excursions merged
into one row per incident (the alert-dedup step every monitoring
pipeline runs between "point anomaly" and "page a human"): flag rows
with |z| >= threshold from a trailing time-window z-score, then merge
CONSECUTIVE flagged samples per key into episodes via the classic
gaps-and-islands identity (island = row_number - running count of
flagged rows, constant exactly across an unbroken flagged run).

Scale shape: ONE per-key shuffle drives everything — the trailing
RANGE frame (rolling.rolling_zscore), the two running island frames,
and the final (key, island) hash aggregate all share the same
partitioning, so Catalyst plans one Exchange + one sort; the aggregate
is map-side combinable.  No Python.  Output is one row per episode:
start/end timestamps, point count, and the peak |z| — bounded by the
number of incidents, not samples.

The reference engine has no alerting primitives; this composes the
repo's rolling_zscore with the islands merge as engine capability for
the monitoring tier (same family as counter_rate / cusum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eristropy_spark.operators.rolling import rolling_zscore

__all__ = ["anomaly_episodes"]


def anomaly_episodes(
    df: DataFrame,
    key,
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: float = 300.0,
    threshold: float = 3.0,
    min_points: int = 2,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per episode of consecutive |z| >= ``threshold`` samples
    per ``key``: (keys..., start_ts, end_ts, n_points, peak_z).

    ``window_sec``/``min_points`` parameterize the underlying trailing
    z-score (see rolling.rolling_zscore — NULL z never flags).
    Episodes split where a non-flagged sample (or a NULL z) intervenes;
    ``peak_z`` is the maximum |z| inside the episode.
    """
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    keys = [key] if isinstance(key, str) else list(key)
    z = rolling_zscore(
        df, key, ts_col=ts_col, value_col=value_col,
        window_sec=window_sec, min_points=min_points, z_col="_z",
    )
    flag = F.col("_z").isNotNull() & (F.abs(F.col("_z")) >= F.lit(float(threshold)))
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        # the z-score's RANGE frame is tie-insensitive, but island
        # row_number is not — pin tie order so episode boundaries are
        # engine-deterministic when samples share a timestamp
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*keys).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = (
        z.withColumn("_flag", flag)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_rnf", F.sum(F.col("_flag").cast("long")).over(run))
    )
    return (
        marked.where(F.col("_flag"))
        .groupBy(*keys, (F.col("_rn") - F.col("_rnf")).alias("_island"))
        .agg(
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            F.count("*").alias("n_points"),
            F.max(F.abs(F.col("_z"))).alias("peak_z"),
        )
        .drop("_island")
    )
