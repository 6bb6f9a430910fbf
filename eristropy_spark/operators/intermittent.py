"""Croston's method for intermittent event streams, per signal.

``croston`` — Croston 1972 (Oper. Res. Q. 23, "Forecasting and stock
control for intermittent demands"), plus the Syntetos–Boylan
approximation (SBA, 2005) bias correction: THE classical forecaster
for series that are mostly zeros with occasional bursts — exactly the
shape of per-minute event/token counts.  SES over a zero-heavy series
collapses toward zero between bursts and spikes after each one;
Croston instead runs TWO exponential smoothings that update only when
demand occurs —

    z_k = α·x_k + (1−α)·z_{k−1}      (nonzero demand size)
    p_k = α·g_k + (1−α)·p_{k−1}      (inter-demand interval, minutes)

with the classical init z₁ = x₁, p₁ = g₁ = 1 (the grid is anchored at
each key's first demand bucket, so the first interval is 1 by
construction).  The demand-rate forecast is z/p per minute; SBA
multiplies by (1 − α/2), the Syntetos–Boylan inversion-bias fix.

The zero-run algebra (shared with ``count_dispersion``): the minute
grid is NEVER densified.  Croston's state only changes at nonzero
buckets, and the inter-demand interval is just the minute gap between
consecutive observed buckets — so empty minutes cost nothing, at any
sparsity.  One output row per DEMAND bucket (not per minute).

Exactness protocol: demand sizes x_k (bucket counts) and intervals
g_k (minute gaps) are exact integers; α is the same double literal on
both sides and each recursion step is the literal expression above in
that exact order — so an independent recursive-CTE replay reproduces
every state bit-for-bit (the ``holt`` protocol).  Forecast division
z/p and the SBA factor (1.0 − 0.5·α)·(z/p) are single fixed float
expressions, written in the same shape in SQL.

Scale shape: one map-side-combined (key, bucket) count Exchange, then
one small key Exchange into the grouped-Pandas sequential scan (the
documented ewma/holt sequential-scan class; per-key state is two
doubles).  Shuffled rows are demand buckets, not raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eristropy_spark.operators._pandas_par import keyed_parallel
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["croston"]


def croston(
    df: DataFrame,
    key,
    ts_col: str = "ts",
    alpha: float = 0.1,
    bucket: str = "minute",
) -> DataFrame:
    """(keys…, bucket_ts, k, x, interval, z, p, croston, sba) — one
    row per demand bucket (a ``bucket``-grain window of ``ts_col``
    holding >= 1 event), in bucket order.  ``croston`` = z/p is the
    per-bucket demand-rate forecast after that bucket; ``sba`` the
    Syntetos–Boylan corrected rate."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if bucket not in ("minute", "hour", "day"):
        raise ValueError(f"bucket must be minute/hour/day, got {bucket}")
    sec = {"minute": 60, "hour": 3600, "day": 86400}[bucket]
    keys = [key] if isinstance(key, str) else list(key)
    a = float(alpha)
    one_a = 1.0 - a
    sba_f = 1.0 - 0.5 * a

    counts = (
        df.groupBy(
            *[F.col(c) for c in keys],
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(F.count("*").alias("x"))
    )
    schema = StructType(
        [counts.schema[c] for c in keys]
        + [
            StructField("bucket_ts", TimestampType()),
            StructField("k", LongType()),
            StructField("x", LongType()),
            StructField("interval", LongType()),
            StructField("z", DoubleType()),
            StructField("p", DoubleType()),
            StructField("croston", DoubleType()),
            StructField("sba", DoubleType()),
        ]
    )

    def _one_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values("bucket_ts", kind="mergesort")
        mins = (pdf["bucket_ts"].astype("int64") // (sec * 1_000_000_000)).to_list()
        xs = pdf["x"].to_list()
        n = len(xs)
        out = {
            **{c: [pdf[c].iloc[0]] * n for c in keys},
            "bucket_ts": pdf["bucket_ts"].to_list(),
            "k": list(range(1, n + 1)),
            "x": [int(v) for v in xs],
            "interval": [],
            "z": [],
            "p": [],
            "croston": [],
            "sba": [],
        }
        z = p = 0.0
        for j in range(n):
            x = int(xs[j])
            g = 1 if j == 0 else int(mins[j] - mins[j - 1])
            if j == 0:
                z = float(x)
                p = float(g)
            else:
                z = a * x + one_a * z
                p = a * g + one_a * p
            out["interval"].append(g)
            out["z"].append(z)
            out["p"].append(p)
            out["croston"].append(z / p)
            out["sba"].append(sba_f * (z / p))
        return pd.DataFrame(out)

    return keyed_parallel(counts, keys).groupBy(
        *[F.col(c) for c in keys]
    ).applyInPandas(
        _one_group, schema=schema
    )
