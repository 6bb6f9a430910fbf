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

__all__ = ["ewma", "holt", "kalman_level"]


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


def kalman_level(
    df: DataFrame,
    key,
    ts_col: str = "ts",
    value_col: str = "value",
    q: float = 0.1,
    r: float = 1.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Kalman filter for the local-level (random-walk + noise) model
    per key — the optimal-gain generalization of EWMA (Kalman 1960;
    local-level form: Durbin & Koopman, "Time Series Analysis by State
    Space Methods" §2): state x_t = x_{t-1} + w_t (Var w = q),
    observation z_t = x_t + e_t (Var e = r).  Appends four columns in
    (``ts_col``, ``tiebreak_col``) order:

        pp_t    = p_{t-1} + q                    (prior variance)
        kgain_t = pp_t / (pp_t + r)
        xhat_t  = xhat_{t-1} + kgain_t*(z_t - xhat_{t-1})
        pvar_t  = (1 - kgain_t) * pp_t           (posterior variance)
        resid_t = z_t - xhat_{t-1}               (innovation)

    init: xhat_1 = z_1, pvar_1 = r, kgain/resid NULL (the classic
    "first observation seeds the state" start; gains then converge to
    the steady state regardless of init).  Unlike EWMA's fixed alpha,
    the gain is time-varying — large while the state is uncertain,
    shrinking to the steady-state gain — so early observations are
    weighted correctly after gaps or cold starts.

    Same sequential-scan class as ``holt``: ONE key Exchange, an
    explicit per-point loop over each group, and the update uses the
    literal double expressions above in that exact order, so an
    independent recursive-CTE replay reproduces every state
    bit-for-bit.
    """
    if q <= 0:
        raise ValueError(f"q must be > 0, got {q}")
    if r <= 0:
        raise ValueError(f"r must be > 0, got {r}")
    keys = [key] if isinstance(key, str) else list(key)
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("xhat", DoubleType(), True),
            StructField("pvar", DoubleType(), True),
            StructField("kgain", DoubleType(), True),
            StructField("resid", DoubleType(), True),
        ]
    )
    qf, rf = float(q), float(r)

    def _one_group(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        z = pdf[value_col].astype("float64").to_list()
        n = len(z)
        if n == 0:
            pdf["xhat"] = pdf["pvar"] = pdf["kgain"] = pdf["resid"] = []
            return pdf
        xh: list[float] = [z[0]]
        pv: list[float] = [rf]
        kg: list[float | None] = [None]
        rs: list[float | None] = [None]
        x, p = z[0], rf
        for t in range(1, n):
            pp = p + qf
            k = pp / (pp + rf)
            resid = z[t] - x
            x = x + k * (z[t] - x)
            p = (1.0 - k) * pp
            xh.append(x)
            pv.append(p)
            kg.append(k)
            rs.append(resid)
        pdf["xhat"] = xh
        pdf["pvar"] = pv
        pdf["kgain"] = kg
        pdf["resid"] = rs
        return pdf

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(
        _one_group, schema=schema
    )
