"""Forecast-baseline backtest per signal — the evaluation leg of the
forecasting family (ewma / holt / ar2 produce forecasts; this scores
forecasters against the scale-free yardstick).

``backtest_baselines`` — Hyndman & Koehler 2006 (IJF 22, "Another
look at measures of forecast accuracy"): in-sample one-step-ahead
errors for the three classical baselines over each key's ordered
series y_1..y_n:

    naive     f_t = y_{t-1}                       (t >= 2)
    mean      f_t = mean(y_1..y_{t-1})            (t >= 2, expanding)
    drift     f_t = y_{t-1} + (y_{t-1}-y_1)/(t-2) (t >= 3)

reporting MAE/RMSE of the naive, MAE of mean and drift, and their
MASE = MAE_method / MAE_naive — the scale-free skill score (MASE < 1
= beats naive).  A signal whose MEAN forecaster beats naive is
mean-reverting; one where NOTHING beats naive is a random walk — the
forecastability triage a retention/rollup engine runs before fitting
anything heavier.

Exactness contract (the repo's exact-state pattern, as in cvm_drift /
expanding_zscore): each per-row error is ONE fixed float expression
(bit-identical across engines for a deterministic input order), then
|e| quantizes to 12 dp and e² to 6 dp as integers summed in
DECIMAL(38,0) — so the aggregates are EXACT and independent of
partial-aggregation order (partition-order-free by construction), and
the SQL oracle hash-matches without tolerance.  Feed integer-quantized
values (e.g. round(value*100)) to make the expanding prefix sum
integer-exact too; |e| must stay < ~9e6 for the 12-dp term to fit
int64 (raise the input quantum otherwise).

Scale shape: pure whole-stage codegen — lag / expanding-prefix
windows and the final reduce all share ONE key Exchange; prefix
frames only (never a FOLLOWING frame, which Spark evaluates O(rows²)
per partition); no joins, no Python.  A key with a billion points
streams through every stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

__all__ = ["backtest_baselines"]


def _q12(c):
    """12-dp magnitude quantizer -> exact DECIMAL term."""
    return F.floor(F.abs(c) * 1e12 + F.lit(0.5)).cast(DecimalType(38, 0))


def _q6sq(c):
    """6-dp squared-error quantizer -> exact DECIMAL term."""
    return F.floor(c * c * 1e6 + F.lit(0.5)).cast(DecimalType(38, 0))


def backtest_baselines(
    df: DataFrame,
    key,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per key: (n, mae_naive, rmse_naive, mae_mean,
    mae_drift, mase_mean, mase_drift).

    Accuracy columns are NULL when the series is too short for the
    method (n < 2 for naive/mean, n < 3 for drift) or when MAE_naive
    is 0 (constant series — MASE undefined, per the paper).
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    prefix = w.rowsBetween(Window.unboundedPreceding, -1)

    v = F.col(value_col).cast("double")
    pts = df.select(
        *keys,
        v.alias("_y"),
        F.lag(v).over(w).alias("_prev"),
        F.sum(v).over(prefix).alias("_s"),
        F.first(v).over(prefix).alias("_y1"),
        F.row_number().over(w).alias("_t"),
    )
    # each error is ONE fixed float expression (mirrored in the oracle)
    e_naive = F.col("_y") - F.col("_prev")
    e_mean = F.col("_y") - F.col("_s") / (F.col("_t") - F.lit(1))
    e_drift = F.when(
        F.col("_t") >= 3,
        F.col("_y")
        - (
            F.col("_prev")
            + (F.col("_prev") - F.col("_y1")) / (F.col("_t") - F.lit(2))
        ),
    )
    errs = pts.select(
        *keys,
        _q12(e_naive).alias("_qn"),
        _q6sq(e_naive).alias("_qn2"),
        _q12(e_mean).alias("_qm"),
        _q12(e_drift).alias("_qd"),
    )
    agg = errs.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum("_qn").alias("_sn"),
        F.count("_qn").alias("_cn"),
        F.sum("_qn2").alias("_sn2"),
        F.sum("_qm").alias("_sm"),
        F.count("_qm").alias("_cm"),
        F.sum("_qd").alias("_sd"),
        F.count("_qd").alias("_cd"),
    )
    # one fixed float expression per output, mirrored in the oracle
    mae_naive = agg["_sn"].cast("double") / 1e12 / agg["_cn"]
    rmse_naive = F.sqrt(agg["_sn2"].cast("double") / 1e6 / agg["_cn"])
    mae_mean = agg["_sm"].cast("double") / 1e12 / agg["_cm"]
    mae_drift = F.when(
        agg["_cd"] > 0, agg["_sd"].cast("double") / 1e12 / agg["_cd"]
    )
    nz = agg["_sn"] > 0
    return agg.select(
        *keys,
        agg["n"].cast("int").alias("n"),
        mae_naive.alias("mae_naive"),
        rmse_naive.alias("rmse_naive"),
        mae_mean.alias("mae_mean"),
        mae_drift.alias("mae_drift"),
        F.when(nz, mae_mean / mae_naive).alias("mase_mean"),
        F.when(nz, mae_drift / mae_naive).alias("mase_drift"),
    )
