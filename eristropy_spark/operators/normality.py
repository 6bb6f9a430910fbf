"""Normality / outlier diagnostics per key — Jarque–Bera moments and
the Grubbs max-deviation statistic (Jarque & Bera 1980; Grubbs 1950):
the gate in front of every z-score-based monitor in the engine
(rolling_zscore / expanding_zscore / anomaly_episodes assume roughly
normal residuals; a heavy-tailed or skewed key needs robust_scale's
MAD instead — this operator is the classifier that routes between
them).

Per key over 6-dp-quantized values v:

    mean6       = floor-quantized mean (one division of a DECIMAL sum)
    d           = v - mean6                       (identical doubles)
    m2, m3, m4  = mean of d², d³, d⁴ — deviations land on exact
                  6-dp grid integers (du = round(d·1e6)), the power
                  sums run in exact DECIMAL/HUGEINT (order-free,
                  engine-exact), then fixed-order float divisions
    skew        = m3 / m2^1.5
    kurt_excess = m4 / m2² - 3
    jb          = n/6 · (skew² + kurt_excess²/4)
    g_max       = max|d| / sqrt(Σd²-sum/(n-1))    (Grubbs' statistic)

Thresholds: jb ≳ 5.99 rejects normality at α=0.05 (χ²₂); g_max against
the Grubbs critical value flags a single spike.  Keys with n < 3 or
zero variance emit NULL test statistics.

Scale shape: ONE keyed Exchange — a window pass for the mean over the
key partitioning, then a same-key hash aggregate for the moment sums
and max.  No joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eristropy_spark.operators.changepoint import _floor_round

__all__ = ["normality_stats"]


def normality_stats(
    df: DataFrame,
    key,
    value_col: str = "value",
) -> DataFrame:
    """(*key, n, mean, std, skew, kurt_excess, jb, g_max) — one row
    per key."""
    keys = [key] if isinstance(key, str) else list(key)
    w_key = Window.partitionBy(*keys)

    v6 = _floor_round(F.col(value_col).cast("double"), 6)
    vq = v6.cast("decimal(18, 6)")
    pts = df.select(*keys, v6.alias("_v")).withColumn(
        "_mean",
        _floor_round(
            F.sum(F.col("_v").cast("decimal(18, 6)")).over(w_key).cast("double")
            / F.count("*").over(w_key),
            6,
        ),
    )
    d = F.col("_v") - F.col("_mean")
    # exact grid integers: du = round(d * 1e6) — d is the identical
    # double in any engine (difference of two quantized doubles), so
    # round() lands on the same integer; every moment sum is then an
    # exact DECIMAL power sum (HUGEINT in the replay).  du⁴ caps the
    # honest range at |d| ≲ 3.3e3 (1e38 decimal / 1.7e38 hugeint) —
    # far beyond any z-scored or sensor-scale series; overflow is loud
    # (NULL stats), never silent wrap.
    du = F.round(d * F.lit(1000000.0)).cast("decimal(12, 0)")
    du2 = du * du

    agg = pts.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.max("_mean").alias("mean"),
        F.sum(du2).alias("_s2"),
        F.sum(du2 * du).alias("_s3"),
        F.sum(du2 * du2).alias("_s4"),
        F.max(F.abs(d)).alias("_dmax"),
    )
    n = F.col("n").cast("double")
    m2 = (F.col("_s2").cast("double") / F.lit(1.0e12)) / n
    m3 = (F.col("_s3").cast("double") / F.lit(1.0e18)) / n
    m4 = (F.col("_s4").cast("double") / F.lit(1.0e24)) / n
    skew = m3 / F.pow(m2, F.lit(1.5))
    kurt = m4 / (m2 * m2) - F.lit(3.0)
    jb = n / F.lit(6.0) * (skew * skew + kurt * kurt / F.lit(4.0))
    std = F.sqrt(
        (F.col("_s2").cast("double") / F.lit(1.0e12)) / (n - F.lit(1.0))
    )
    ok = (F.col("n") >= 3) & (m2 > F.lit(0.0))
    nulld = F.lit(None).cast("double")
    return agg.select(
        *keys,
        "n",
        "mean",
        F.when(F.col("n") >= 2, std).otherwise(nulld).alias("std"),
        F.when(ok, skew).otherwise(nulld).alias("skew"),
        F.when(ok, kurt).otherwise(nulld).alias("kurt_excess"),
        F.when(ok, jb).otherwise(nulld).alias("jb"),
        F.when(ok, F.col("_dmax") / std).otherwise(nulld).alias("g_max"),
    )
