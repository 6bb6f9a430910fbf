"""Per-signal autocorrelation (ACF) over the array row layout — the
classic timeseries diagnostic (lag structure, seasonality detection,
the input to Box–Jenkins model selection), computed entirely in-row:

    acf(k) = sum_i (x_i - mu)(x_{i+k} - mu) / sum_i (x_i - mu)^2

for k = 1..max_lag (the standard biased estimator: one global mean,
denominator over the full series — what statsmodels' ``acf`` and every
textbook compute).

Scale shape: zero shuffle — each signal is one row carrying its value
array (the engine's tokenize layout), and mean / deviations /
denominator are materialized as row-level columns FIRST (one aggregate
pass each), then every lag is one ``zip_with`` + ``aggregate`` over
slices of the materialized deviation array: O(n · max_lag) work per
signal, all whole-stage codegen, no Python.  (Nesting the mean
aggregate inside the lag lambda instead would re-evaluate it per
element — the Catalyst no-CSE hazard documented in
``functions/arrays.znorm_array``.)

Degenerate series pin: signals with fewer than 2 points emit no lag
rows (Spark's ``sequence(1, 0)`` would count DOWN — the round-2
shingle-guard bug class); constant series emit rows with NULL acf
(0/0 under the session's non-ANSI division, same as the DuckDB
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["acf_long"]


def acf_long(
    df: DataFrame,
    array_col: str = "tokens",
    max_lag: int = 10,
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(``*keep_cols``, lag, acf) — one row per signal per lag in
    [1, min(max_lag, n-1)]."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    arr = F.transform(F.col(array_col), lambda x: x.cast("double"))
    n = F.size(arr)
    staged = (
        df.withColumn("_v", arr)
        .withColumn("_mu", F.aggregate("_v", F.lit(0.0), lambda a, x: a + x) / n)
        .withColumn("_dev", F.transform("_v", lambda x: x - F.col("_mu")))
        .withColumn(
            "_den",
            F.aggregate("_dev", F.lit(0.0), lambda a, x: a + x * x),
        )
    )
    nn = F.size(F.col("_dev"))
    lags = F.when(
        nn >= 2, F.sequence(F.lit(1), F.least(F.lit(max_lag), nn - 1))
    ).otherwise(F.array().cast("array<int>"))

    def _acf_at(k):
        num = F.aggregate(
            F.zip_with(
                F.slice(F.col("_dev"), F.lit(1), nn - k),
                F.slice(F.col("_dev"), k + 1, nn - k),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return num / F.col("_den")

    return (
        staged.withColumn("_acfs", F.transform(lags, _acf_at))
        .select(
            *keep_cols,
            F.posexplode(F.col("_acfs")).alias("_p", "acf"),
        )
        .select(
            *keep_cols,
            (F.col("_p") + 1).cast("int").alias("lag"),
            "acf",
        )
    )
