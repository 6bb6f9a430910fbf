"""Momentum indicators — Wilder RSI (1978) and MACD (Appel) per key.

Reference parity note: zblanks/eristropy has no momentum operators;
this extends the per-signal sequential-recursion family (``ewma`` /
``holt`` / ``holt_winters`` in operators/smoothing.py) that the
timeseries tier's rollup engine needs for monitoring token-rate
signals.  Both indicators are EMA-class recursions:

    MACD_t   = EMA_fast(x)_t - EMA_slow(x)_t
    signal_t = EMA_sig(MACD)_t
    hist_t   = MACD_t - signal_t

with every EMA the ``adjust=False`` convention e_1 = x_1,
e_t = (1-a)*e_{t-1} + a*x_t, a = 2/(span+1); and Wilder RSI with the
classical seed (arithmetic mean of the first ``rsi_period`` gains /
losses) followed by Wilder smoothing

    ag_j = (ag_{j-1}*(n-1) + gain_j) / n        (n = rsi_period)
    RSI  = 100 - 100 / (1 + ag/al)

Pinned semantics (both the operator and any oracle replay must agree):

* deltas are x_i - x_{i-1} in (ts, tiebreak) order; gain = max(d, 0),
  loss = max(-d, 0);
* RSI is NULL for the first ``rsi_period`` points of a key (no seed
  yet); a key shorter than ``rsi_period + 1`` points has RSI NULL
  everywhere;
* when the running average loss is exactly 0: RSI = 100.0 if the
  running average gain > 0 else 50.0 (flat series);
* MACD/signal/hist are defined from the first point (MACD_1 = 0).

The recursions are inherently sequential per key, so this runs as ONE
grouped-Pandas stage (`applyInPandas`): one shuffle on the key, then an
explicit per-point scan per group using the literal double expressions
above in that exact order — feed integer-valued doubles (the repo's
quantize-then-derive rule) and an independent recursive-CTE replay
reproduces every state bit-for-bit.

Scale shape: one Exchange; O(series length) task state — identical to
``holt``.  ~1e6 points/sec/core; pre-aggregate dense signals to a
coarser grain first, exactly as for ``ewma``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eristropy_spark.operators._pandas_par import keyed_parallel
from pyspark.sql.types import DoubleType, StructField, StructType

__all__ = ["rsi_macd"]


def rsi_macd(
    df: DataFrame,
    key,
    ts_col: str = "ts",
    value_col: str = "value",
    rsi_period: int = 14,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Append ``macd``, ``macd_signal``, ``macd_hist``, ``rsi`` per
    ``key`` in (``ts_col``, ``tiebreak_col``) order.  All input columns
    pass through; no rows are dropped.
    """
    if rsi_period < 1:
        raise ValueError(f"rsi_period must be >= 1, got {rsi_period}")
    if not (0 < fast < slow):
        raise ValueError(f"need 0 < fast < slow, got fast={fast} slow={slow}")
    if signal < 1:
        raise ValueError(f"signal must be >= 1, got {signal}")
    keys = [key] if isinstance(key, str) else list(key)
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("macd", DoubleType(), True),
            StructField("macd_signal", DoubleType(), True),
            StructField("macd_hist", DoubleType(), True),
            StructField("rsi", DoubleType(), True),
        ]
    )
    n = int(rsi_period)
    af = 2.0 / (fast + 1.0)
    as_ = 2.0 / (slow + 1.0)
    ag_a = 2.0 / (signal + 1.0)

    def _one_group(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf[value_col].astype("float64").to_list()
        npts = len(x)
        macd = [math.nan] * npts
        sig = [math.nan] * npts
        hist = [math.nan] * npts
        rsi = [math.nan] * npts
        ef = es = sg = 0.0
        ag = al = 0.0
        seed_g = seed_l = 0.0
        for i in range(npts):
            v = x[i]
            if i == 0:
                ef = v
                es = v
                m = ef - es
                sg = m
            else:
                ef = (1.0 - af) * ef + af * v
                es = (1.0 - as_) * es + as_ * v
                m = ef - es
                sg = (1.0 - ag_a) * sg + ag_a * m
                d = v - x[i - 1]
                g = d if d > 0.0 else 0.0
                ls = -d if d < 0.0 else 0.0
                if i < n:
                    # accumulating the classical seed, left-to-right
                    seed_g = seed_g + g
                    seed_l = seed_l + ls
                elif i == n:
                    ag = (seed_g + g) / float(n)
                    al = (seed_l + ls) / float(n)
                else:
                    ag = (ag * (n - 1.0) + g) / float(n)
                    al = (al * (n - 1.0) + ls) / float(n)
                if i >= n:
                    if al == 0.0:
                        rsi[i] = 100.0 if ag > 0.0 else 50.0
                    else:
                        rsi[i] = 100.0 - 100.0 / (1.0 + ag / al)
            macd[i] = m
            sig[i] = sg
            hist[i] = m - sg
        pdf = pdf.copy()
        pdf["macd"] = macd
        pdf["macd_signal"] = sig
        pdf["macd_hist"] = hist
        pdf["rsi"] = rsi
        return pdf

    return keyed_parallel(df, keys).groupBy(
        *[F.col(k) for k in keys]
    ).applyInPandas(
        _one_group, schema=schema
    )
