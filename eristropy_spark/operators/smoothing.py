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

from eristropy_spark.operators._pandas_par import keyed_parallel
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

__all__ = ["ewma", "holt", "holt_winters", "kalman_level"]


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

    return keyed_parallel(df, keys).groupBy(
        *[F.col(k) for k in keys]
    ).applyInPandas(
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

    return keyed_parallel(df, keys).groupBy(
        *[F.col(k) for k in keys]
    ).applyInPandas(
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

    return keyed_parallel(df, keys).groupBy(
        *[F.col(k) for k in keys]
    ).applyInPandas(
        _one_group, schema=schema
    )


def holt_winters(
    df: DataFrame,
    key,
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    tiebreak_col: str | None = None,
    exact_decimals: int = 6,
) -> DataFrame:
    """Additive Holt–Winters triple exponential smoothing per key
    (Winters 1960, Mgmt. Sci. 6; the fpp2 ch. 7 additive form) —
    the seasonal member completing the smoothing family
    (ewma -> holt -> holt_winters).  One output row per input row of
    every key with n >= 2·period observations (shorter keys are
    DROPPED — the classical init below is undefined for them):

        i <= m:  seasonal_i = x_i − l₀            (init row)
        i >  m:  fitted_t  = l_{t−1} + b_{t−1} + s_{t−m}
                 l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
                 b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
                 s_t = γ·(x_t − l_t) + (1−γ)·s_{t−m}

    with the classical heuristic init over the first two seasons:
    l₀ = mean(x_1..x_m), b₀ = Σ(x_{m+i} − x_i)/m² (i = 1..m).
    Level/trend/fitted are NULL on the m init rows.

    Engine exactness: values snap to the ``exact_decimals`` grid as
    exact integers u_i; the init moments are exact integer sums turned
    into fixed float expressions (l₀ = (S/10^d)/m, b₀ = (D/10^d)/m²),
    and every recursion step is the literal double expression above in
    that exact order — so an independent recursive-CTE replay carrying
    the seasonal ring as a LIST column reproduces every state
    bit-for-bit (the ``holt`` protocol, extended with list state).

    Scale shape: ONE key shuffle, grouped-Pandas sequential scan
    (documented sequential-scan class, like ewma/holt); O(series)
    task state.  The seasonal ring is O(period).
    """
    m = int(period)
    if m < 2:
        raise ValueError(f"period must be >= 2, got {m}")
    for name, val in (("alpha", alpha), ("gamma", gamma)):
        if not (0.0 < val <= 1.0):
            raise ValueError(f"{name} must be in (0, 1], got {val}")
    if not (0.0 <= beta <= 1.0):
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    d = int(exact_decimals)
    if not 0 < d <= 12:
        raise ValueError(f"exact_decimals must be in 1..12, got {d}")
    import math

    keys = [key] if isinstance(key, str) else list(key)
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("i", LongType(), True),
            StructField("level", DoubleType(), True),
            StructField("trend", DoubleType(), True),
            StructField("seasonal", DoubleType(), True),
            StructField("fitted", DoubleType(), True),
        ]
    )
    a, bt, g = float(alpha), float(beta), float(gamma)
    one_a, one_b, one_g = 1.0 - a, 1.0 - bt, 1.0 - g
    scale = float(10**d)

    def _one_group(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        u = [
            int(math.floor(float(v) * scale + 0.5))
            for v in pdf[value_col].to_list()
        ]
        n = len(u)
        if n < 2 * m:
            return pdf.iloc[0:0].assign(
                i=[], level=[], trend=[], seasonal=[], fitted=[]
            )
        x = [ui / scale for ui in u]
        l0 = (sum(u[:m]) / scale) / m
        b0 = ((sum(u[m:2 * m]) - sum(u[:m])) / scale) / (m * m)
        seas = [x[i] - l0 for i in range(m)]
        levels: list = [None] * m
        trends: list = [None] * m
        seasonal: list = list(seas)
        fitted: list = [None] * m
        lvl, trd = l0, b0
        ring = list(seas)
        for t in range(m, n):
            su = ring[0]
            f = lvl + trd + su
            new_l = a * (x[t] - su) + one_a * (lvl + trd)
            new_b = bt * (new_l - lvl) + one_b * trd
            new_s = g * (x[t] - new_l) + one_g * su
            ring = ring[1:] + [new_s]
            lvl, trd = new_l, new_b
            levels.append(new_l)
            trends.append(new_b)
            seasonal.append(new_s)
            fitted.append(f)
        pdf["i"] = range(1, n + 1)
        pdf["level"] = levels
        pdf["trend"] = trends
        pdf["seasonal"] = seasonal
        pdf["fitted"] = fitted
        return pdf

    return keyed_parallel(df, keys).groupBy(
        *[F.col(k) for k in keys]
    ).applyInPandas(
        _one_group, schema=schema
    )
