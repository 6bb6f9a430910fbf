"""Exponentially-weighted moving average — the canonical timeseries
smoothing recursion e_t = (1-alpha)*e_{t-1} + alpha*x_t with e_1 = x_1
(the ``adjust=False`` convention: each output is a true recursive
state, so the operator replays identically over a stream).

The recursion is inherently sequential PER KEY, so this is the one
timeseries operator in the repo that runs as a grouped Pandas stage
(`applyInPandas`): ONE shuffle on the key, then pandas' C-side
``ewm(alpha, adjust=False).mean()`` per group — verified bit-identical
to the literal recursion (tests/test_counters_sax.py), which is what
makes the independent recursive-CTE oracle hash-match without
tolerance.

Scale shape: one Exchange; each task holds one key group in memory
(O(series length) — the same bound as the repo's array layout; a key
with 10^9 points needs windowed pre-aggregation first, as with any
stateful per-key scan).  The Arrow boundary moves (key, ts, tiebreak,
value) only — prune other columns before calling if the table is wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

__all__ = ["ewma", "holt"]


def ewma(
    df: DataFrame,
    key,
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.25,
    tiebreak_col: str | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Append ``out_col`` = the running EWMA of ``value_col`` per
    ``key`` in (``ts_col``, ``tiebreak_col``) order.  All input columns
    pass through; no rows are dropped or reordered beyond the group
    partitioning.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    keys = [key] if isinstance(key, str) else list(key)
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    # never .add() onto df.schema — StructType.add mutates, and df
    # caches the schema object (df.columns would grow a ghost column)
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType(), True)]
    )

    def _one_group(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].astype("float64")
            .ewm(alpha=alpha, adjust=False)
            .mean()
        )
        return pdf

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(
        _one_group, schema=schema
    )


def holt(
    df: DataFrame,
    key,
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.5,
    beta: float = 0.25,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing (the level+trend
    member of the Holt–Winters family) per key, in (``ts_col``,
    ``tiebreak_col``) order.  Appends three columns:

        level_t  = alpha*x_t + (1-alpha)*(level_{t-1} + trend_{t-1})
        trend_t  = beta*(level_t - level_{t-1}) + (1-beta)*trend_{t-1}
        fitted_t = level_{t-1} + trend_{t-1}   (one-step-ahead forecast)

    with the classical heuristic init level_1 = x_1, trend_1 =
    x_2 - x_1, fitted_1 = NULL; singleton keys get trend/fitted NULL.
    An h-step forecast from the series end is level_n + h*trend_n —
    compute it downstream from the last row per key.

    Like ``ewma`` this recursion is inherently sequential per key —
    the same grouped-Pandas stage (ONE key shuffle, O(series) task
    state), but Holt's two-state coupling has no C-side pandas
    equivalent, so the scan is an explicit per-point loop over the
    group (documented sequential-scan class; ~1e6 points/sec/core —
    pre-aggregate dense signals to a coarser grain first, exactly as
    for ``ewma``).  The update uses the literal double expressions
    above in that exact order, so an independent recursive-CTE replay
    reproduces every state bit-for-bit.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not (0.0 <= beta <= 1.0):
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    keys = [key] if isinstance(key, str) else list(key)
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("level", DoubleType(), True),
            StructField("trend", DoubleType(), True),
            StructField("fitted", DoubleType(), True),
        ]
    )
    a, b = float(alpha), float(beta)
    one_a, one_b = 1.0 - a, 1.0 - b

    def _one_group(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf[value_col].astype("float64").to_list()
        n = len(x)
        if n == 0:
            pdf["level"] = pdf["trend"] = pdf["fitted"] = []
            return pdf
        levels = [x[0]]
        trends: list[float | None] = [None]
        fitted: list[float | None] = [None]
        if n >= 2:
            lp, bp = x[0], x[1] - x[0]
            trends[0] = bp
            for t in range(1, n):
                f = lp + bp
                lvl = a * x[t] + one_a * f
                bp = b * (lvl - lp) + one_b * bp
                lp = lvl
                levels.append(lvl)
                trends.append(bp)
                fitted.append(f)
        pdf["level"] = levels
        pdf["trend"] = trends
        pdf["fitted"] = fitted
        return pdf

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(
        _one_group, schema=schema
    )
