"""Classical seasonal decomposition — the textbook additive
trend/seasonal/remainder split (Hyndman & Athanasopoulos,
"Forecasting: Principles and Practice" §3.4, public; the algorithm
behind statsmodels' ``seasonal_decompose``): per key on a regularly
sampled series,

    trend_t    = centered moving average of one season (2x-MA when the
                 period is even), NULL where the full window is not
                 available (the standard edge behavior),
    seasonal_p = mean of (x - trend) grouped by phase p = (t mod
                 period), re-centered so the period sums to zero,
    remainder  = x - trend - seasonal.

Scale shape: ONE per-key shuffle feeds row_number + the sliding MA
frames (Spark buffers exactly one window span per task); the seasonal
indexes are a (key, phase) hash aggregate — at most ``period`` rows
per key, so the join back is a broadcast-sized dimension for any real
key count.  No Python anywhere; everything is whole-stage codegen.
The reference engine has no decomposition operator; this is engine
capability for the timeseries tier (same family as rolling_stats /
sax_symbols).

``exact_decimals`` (default 6) quantizes the input to that decimal
grid and performs every SUM in DECIMAL, leaving each division as one
double operation on identical operands — so trend/seasonal/remainder
are bit-reproducible across engines, partitionings, and retries (the
seasonal index is a big float mean otherwise, whose value shifts with
partial-aggregation order).  Pass ``None`` for raw double arithmetic.

Phase is positional (row index mod period) and the MA frames are
row-based, so the math is defined for any per-key ordering; the
CLASSICAL interpretation assumes a regular sampling grid — run gapfill
first if the series has holes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eristropy_spark.operators.changepoint import _floor_round

__all__ = ["seasonal_decompose", "stl_strength"]


def seasonal_decompose(
    df: DataFrame,
    key,
    period: int,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    exact_decimals: int | None = 6,
) -> DataFrame:
    """Append ``trend``, ``seasonal``, ``remainder`` (additive model)
    per row of ``df``, per ``key`` ordered by (``ts_col``,
    ``tiebreak_col``).  Rows pass through unchanged.

    ``period`` is the season length in samples (>= 2).  Rows whose
    centered window is incomplete get NULL trend and remainder (their
    seasonal index still comes from the complete rows of their phase).
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if exact_decimals is not None and not 0 < int(exact_decimals) <= 12:
        raise ValueError(
            f"exact_decimals must be in 1..12, got {exact_decimals}"
        )
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*keys).orderBy(*order)

    v = F.col(value_col).cast("double")
    if exact_decimals is not None:
        d = int(exact_decimals)
        v = _floor_round(v, d)
        # sums run in DECIMAL (exact under any order); every division
        # is then ONE double op on identical operands in any engine
        acc = v.cast(f"decimal({20 + d}, {d})")
    else:
        acc = v

    half = period // 2
    if period % 2 == 1:
        # odd period: plain centered MA over [t-half, t+half]
        frame = w.rowsBetween(-half, half)
        trend = F.when(
            F.count(acc).over(frame) == period,
            F.sum(acc).over(frame).cast("double") / F.lit(float(period)),
        )
    else:
        # even period: the standard 2xMA — x_{t-half} and x_{t+half}
        # weighted 1/2.  A per-row weight can't know which frame it is
        # an endpoint OF, so build it as the mean of the two adjacent
        # period-length MAs ([t-half, t+half-1] and [t-half+1, t+half]):
        # algebraically identical, and both engines evaluate the same
        # two plain sliding sums.
        wl = w.rowsBetween(-half, half - 1)
        wr = w.rowsBetween(-half + 1, half)
        trend = F.when(
            (F.count(acc).over(wl) == period)
            & (F.count(acc).over(wr) == period),
            (F.sum(acc).over(wl) + F.sum(acc).over(wr)).cast("double")
            / F.lit(2.0 * period),
        )

    phase = (F.row_number().over(w) - F.lit(1)) % F.lit(period)
    base = df.withColumn("_v", v).withColumn("_phase", phase).withColumn(
        "_trend", trend
    )

    # seasonal indexes: mean detrended value by (key, phase), then
    # center each key's indexes to sum to zero.  <= period rows per key.
    detr = F.col("_v") - F.col("_trend")
    if exact_decimals is not None:
        # detrended values are full-mantissa doubles (identical in any
        # engine); floor-quantize them onto a 12-decimal grid in pure
        # double IEEE ops FIRST, then cast — a direct double→decimal
        # cast at fine scale is engine-ambiguous (Spark casts via the
        # shortest decimal string, DuckDB via the binary expansion;
        # at magnitude ~1e2 a double's ulp ~5e-14 exceeds a 1e-16 grid,
        # so scale-16 casts can disagree, while after 12dp quantization
        # the residual eps is far below the 0.5e-12 rounding threshold
        # and both engines recover the same decimal exactly)
        detr = _floor_round(detr, 12).cast("decimal(38, 12)")
    idx = (
        base.where(F.col("_trend").isNotNull())
        .groupBy(*keys, "_phase")
        .agg(
            F.sum(detr).alias("_s"),
            F.count(detr).alias("_n"),
        )
        .withColumn(
            "_raw_idx", F.col("_s").cast("double") / F.col("_n")
        )
        .drop("_s", "_n")
    )
    ridx = F.col("_raw_idx")
    if exact_decimals is not None:
        # same 12dp-quantize-then-cast rule as detr above
        ridx = _floor_round(ridx, 12).cast("decimal(38, 12)")
    wk = Window.partitionBy(*keys)
    centered = idx.withColumn(
        "_seasonal",
        F.col("_raw_idx")
        - F.sum(ridx).over(wk).cast("double") / F.count(ridx).over(wk),
    ).drop("_raw_idx")

    out = base.join(F.broadcast(centered), [*keys, "_phase"], "left")
    return (
        out.withColumn("trend", F.col("_trend"))
        .withColumn("seasonal", F.col("_seasonal"))
        .withColumn(
            "remainder", F.col("_v") - F.col("_trend") - F.col("_seasonal")
        )
        .drop("_v", "_phase", "_trend", "_seasonal")
    )


def stl_strength(
    df: DataFrame,
    key,
    period: int,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(*key, n_used, var_rem, var_detrended, var_deseasonalized,
    trend_strength, seasonal_strength) — the Wang–Smith–Hyndman (2006)
    decomposition-strength features (the ``feat_stl`` pair the M4
    feature space and Hyndman's anomaly pipelines key on):

        F_T = max(0, 1 − Var(R) / Var(T + R))   trend strength
        F_S = max(0, 1 − Var(R) / Var(S + R))   seasonal strength

    computed per key over the rows whose centered MA window is complete
    (``trend`` non-NULL), on top of :func:`seasonal_decompose`.  Both
    land in [0, 1]: ~0 = the component explains nothing, →1 = the
    series is almost entirely that component.  The triage statistic
    for "which of my million signals deserve a seasonal model".

    Exactness: each of R, S+R, T+R is floor-quantized to the 6-dp grid
    and cast to DECIMAL(18,6); sums and sums-of-squares run in exact
    DECIMAL (products are DECIMAL(37,12) — no precision loss), and each
    population variance is then a fixed-order float expression, so the
    SQL replay matches bit-for-bit.  A component with zero variance
    yields NULL strength.

    Scale shape: the decompose plan (one keyed shuffle + a dimension
    join) plus ONE same-key hash aggregate; no extra Exchange, no
    Python.
    """
    keys = [key] if isinstance(key, str) else list(key)
    dec = seasonal_decompose(
        df,
        key,
        period,
        ts_col=ts_col,
        value_col=value_col,
        tiebreak_col=tiebreak_col,
    )
    used = dec.where(F.col("trend").isNotNull())

    def q6d(c):
        return _floor_round(c, 6).cast("decimal(18, 6)")

    r = F.col("remainder")
    w = used.select(
        *keys,
        q6d(r).alias("_r"),
        q6d(r + F.col("seasonal")).alias("_ds"),
        q6d(r + F.col("trend")).alias("_dt"),
    )
    agg = w.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_used"),
        F.sum("_r").alias("_sr"),
        F.sum(F.col("_r") * F.col("_r")).alias("_qr"),
        F.sum("_ds").alias("_ss"),
        F.sum(F.col("_ds") * F.col("_ds")).alias("_qs"),
        F.sum("_dt").alias("_st"),
        F.sum(F.col("_dt") * F.col("_dt")).alias("_qt"),
    )
    n = F.col("n_used").cast("double")

    def var_(s_name: str, q_name: str):
        sd = F.col(s_name).cast("double")
        qd = F.col(q_name).cast("double")
        return (qd - sd * sd / n) / n

    vr = var_("_sr", "_qr")
    vds = var_("_ss", "_qs")
    vdt = var_("_st", "_qt")
    nulld = F.lit(None).cast("double")
    return agg.select(
        *keys,
        "n_used",
        vr.alias("var_rem"),
        vds.alias("var_detrended"),
        vdt.alias("var_deseasonalized"),
        F.when(
            vdt > F.lit(0.0),
            F.greatest(F.lit(0.0), F.lit(1.0) - vr / vdt),
        )
        .otherwise(nulld)
        .alias("trend_strength"),
        F.when(
            vds > F.lit(0.0),
            F.greatest(F.lit(0.0), F.lit(1.0) - vr / vds),
        )
        .otherwise(nulld)
        .alias("seasonal_strength"),
    )
