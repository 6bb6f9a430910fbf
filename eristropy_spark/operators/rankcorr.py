"""Spearman rank correlation between signal pairs on the bucket grid.

``spearman_pairs`` — the rank-based (monotone-association) complement
of ``crosscorr_pairs``' Pearson CCF (Spearman 1904): for every
unordered source pair, ρ_s = Pearson correlation of the RANKS of the
two bucket-mean series over their shared buckets, with average ranks
for ties.  Robust to outliers and nonlinear-but-monotone coupling —
the pair detector you trust when one spike would own the Pearson
number.

Exactness protocol: bucket means are 6-dp-quantized (engine-identical
grid, as granger), and because average ranks are half-integers the
DOUBLED ranks 2r = 2·minrank + t − 1 are exact int64, so every sum
Pearson needs (Σ2a, Σ2b, Σ(2a)², Σ(2b)², Σ(2a)(2b)) is an exact
integer and ρ_s is ONE fixed float expression — bit-reproducible in
SQL.  NULL when an overlap side is constant (zero rank variance).

Scale shape: ONE hash aggregate builds the grid; the pair match is a
bucket equi-join (quadratic in SOURCES only); ranks are two window
passes over the SAME (pair) partitioning; the final reduce is keyed
by pair.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eristropy_spark.operators.changepoint import _floor_round
from eristropy_spark.operators.rolling import _micros

__all__ = ["spearman_pairs"]


def spearman_pairs(
    df: DataFrame,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_sec: int = 60,
    min_overlap: int = 3,
) -> DataFrame:
    """(source_a, source_b, n, rho) per unordered source pair
    (source_a < source_b) with n >= min_overlap shared buckets."""
    if bucket_sec <= 0:
        raise ValueError("bucket_sec must be > 0")
    if min_overlap < 2:
        raise ValueError("min_overlap must be >= 2")

    span_us = F.lit(int(bucket_sec) * 1_000_000)
    bucket = F.floor(_micros(df, ts_col) / span_us).cast("long")
    grid = df.groupBy(
        F.col(source_col).alias("source"), bucket.alias("bucket")
    ).agg(
        _floor_round(F.avg(F.col(value_col).cast("double")), 6).alias("v")
    )

    a = grid.select(
        F.col("source").alias("source_a"),
        F.col("bucket"),
        F.col("v").alias("_va"),
    )
    b = grid.select(
        F.col("source").alias("source_b"),
        F.col("bucket"),
        F.col("v").alias("_vb"),
    )
    matched = a.join(b, "bucket").where(
        F.col("source_a") < F.col("source_b")
    )

    pair = ["source_a", "source_b"]
    wa_rank = Window.partitionBy(*pair).orderBy("_va")
    wa_tie = Window.partitionBy(*pair, "_va")
    wb_rank = Window.partitionBy(*pair).orderBy("_vb")
    wb_tie = Window.partitionBy(*pair, "_vb")
    # doubled average rank: 2r = 2*minrank + tie_count - 1 (exact int)
    ranked = matched.select(
        *pair,
        (
            2 * F.rank().over(wa_rank) + F.count("*").over(wa_tie) - 1
        ).cast("long").alias("_ra"),
        (
            2 * F.rank().over(wb_rank) + F.count("*").over(wb_tie) - 1
        ).cast("long").alias("_rb"),
    )
    # DECIMAL(38,0) accumulation: Σ(2r)² reaches 4n³, past int64 at
    # ~1.3M overlap buckets (2.5 years of a 60 s grid) — exact either
    # way, headroom to 10¹² buckets
    def _dec(c):
        return c.cast("decimal(38,0)")

    ranked = ranked.select(
        *pair, _dec(F.col("_ra")).alias("_ra"), _dec(F.col("_rb")).alias("_rb")
    )
    agg = ranked.groupBy(*pair).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_ra").alias("_sa"),
        F.sum("_rb").alias("_sb"),
        F.sum(F.col("_ra") * F.col("_ra")).alias("_saa"),
        F.sum(F.col("_rb") * F.col("_rb")).alias("_sbb"),
        F.sum(F.col("_ra") * F.col("_rb")).alias("_sab"),
    )
    nd = F.col("n").cast("double")
    sa = F.col("_sa").cast("double")
    sb = F.col("_sb").cast("double")
    cov = F.col("_sab").cast("double") - sa * sb / nd
    va = F.col("_saa").cast("double") - sa * sa / nd
    vb = F.col("_sbb").cast("double") - sb * sb / nd
    rho = F.when((va > F.lit(0.0)) & (vb > F.lit(0.0)), cov / F.sqrt(va * vb))
    return agg.select(*pair, "n", rho.alias("rho")).where(
        F.col("n") >= int(min_overlap)
    )
