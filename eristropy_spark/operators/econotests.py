"""Econometric stationarity diagnostics per signal — KPSS and
Durbin–Watson, pure whole-stage-expression work over the array layout.

* ``kpss`` — the KPSS level-stationarity test (Kwiatkowski, Phillips,
  Schmidt & Shin 1992, J. Econometrics 54): η = Σ_t S_t² / (n²·σ̂²)
  with S_t the partial sums of the demeaned series and σ̂² the
  Bartlett-weighted long-run variance at the Schwert bandwidth
  l = ⌊4·(n/100)^{1/4}⌋.  The NULL-of-stationarity complement to the
  ADF test in ``kernels/adf.py`` (ADF's null is a unit root): running
  both is the standard confirmatory protocol — ADF rejects AND KPSS
  fails to reject ⇒ stationary with two-sided evidence.
* ``durbin_watson`` — the Durbin–Watson first-order autocorrelation
  statistic (Durbin & Watson 1950, Biometrika 37) of the demeaned
  series: DW = Σ(e_t − e_{t−1})² / Σe_t², ≈ 2(1 − ρ₁); the classic
  one-pass serial-correlation screen.

Neither exists in the reference (its stationarity battery is ADF-only,
`/root/reference/eristropy/preprocess.py`); both are engine capability
for the stationarity family (W13/W14, `stationarity` contract query).

Exactness protocol (the repo's exact-integer rule): demeaned values
are scaled by n so they stay integral — n·e_t = n·x_t − S with
S = Σx exact int64, and the scaled partial sum n·S_t = n·P_t − t·S
likewise (P_t = prefix sum).  Every quadratic form the statistics
need — Q = Σ(n·S_t)², G0 = Σ(n·e_t)², the Bartlett-weighted
lag-covariance W = Σ_{j≤l}(l+1−j)·Σ_t(n·e_t)(n·e_{t+j}), and
n²·Σ(Δx)² — is accumulated as DECIMAL(38,0) (exact under any
evaluation order), and each statistic is ONE final float ratio of two
exact decimals.  The Schwert bandwidth is evaluated in integers
(l = #{j ≥ 1 : 100·j⁴ ≤ 256·n}, algebraically identical to the ⌊·⌋
form but with no float pow at the boundary), so the DuckDB replay is
bit-deterministic.

Scale shape: zero joins, zero windows, zero Python — in-row
higher-order expressions over the one-row-per-signal array layout, so
the plan carries only tokenize's Exchange.  KPSS is O(n·l) per signal
(l ≤ 16 up to n = 2.56M tokens — longer sequences route through
``operators/windowed`` first, the repo's long-signal rule);
Durbin–Watson is O(n).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kpss", "durbin_watson"]

_DEC = "decimal(38,0)"


def _staged(df: DataFrame, array_col: str, keep_cols: tuple[str, ...], min_n: int):
    return df.select(
        *keep_cols, F.col(array_col).alias("_arr")
    ).filter(F.size("_arr") >= int(min_n))


def _dec(c: Column) -> Column:
    return c.cast(_DEC)


def kpss(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
    min_n: int = 5,
) -> DataFrame:
    """(*keep_cols, n, bandwidth, eta, reject_5pct) — one row per
    signal with n >= min_n.

    ``eta`` is the KPSS level statistic; NULL for a constant series
    (zero long-run variance).  ``reject_5pct`` applies the published
    5% critical value 0.463 (KPSS 1992, Table 1, level case) — true
    means the level-stationarity null is REJECTED.  ``bandwidth`` is
    the integer Schwert lag l (see module docstring for the exact
    integer form).
    """
    if min_n < 2:
        raise ValueError("min_n must be >= 2")
    arr = F.col("_arr")
    n = F.size(arr)
    nL = n.cast("long")
    s_tot = F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))

    base = (
        _staged(df, array_col, keep_cols, min_n)
        .withColumn("_n", n)
        .withColumn("_s", s_tot)
        # l = #{j in 1..16 : 100 j^4 <= 256 n}  ==  floor(4 (n/100)^(1/4))
        .withColumn(
            "_l",
            F.size(
                F.filter(
                    F.sequence(F.lit(1), F.lit(16)),
                    lambda j: F.lit(100).cast("long") * j * j * j * j
                    <= F.lit(256).cast("long") * F.col("_n"),
                )
            ),
        )
        # scaled demeaned series u_t = n*x_t - S (exact int64)
        .withColumn(
            "_u",
            F.transform(
                F.col("_arr"),
                lambda x: F.col("_n").cast("long") * x.cast("long") - F.col("_s"),
            ),
        )
    )

    # Q = sum_t (n*S_t)^2 via one fold carrying (prefix sum, t, Q)
    q_fold = F.aggregate(
        F.col("_arr"),
        F.struct(
            F.lit(0).cast("long").alias("p"),
            F.lit(0).cast("long").alias("t"),
            F.lit(0).cast(_DEC).alias("q"),
        ),
        lambda acc, x: F.struct(
            (acc["p"] + x.cast("long")).alias("p"),
            (acc["t"] + 1).alias("t"),
            (
                acc["q"]
                + _dec(
                    F.col("_n").cast("long") * (acc["p"] + x.cast("long"))
                    - (acc["t"] + 1) * F.col("_s")
                )
                * _dec(
                    F.col("_n").cast("long") * (acc["p"] + x.cast("long"))
                    - (acc["t"] + 1) * F.col("_s")
                )
            ).alias("q"),
        ),
        lambda acc: acc["q"],
    )

    g0 = F.aggregate(
        F.col("_u"), F.lit(0).cast(_DEC), lambda a, u: a + _dec(u) * _dec(u)
    )

    # W = sum_{j=1..l} (l+1-j) * sum_t u_t u_{t+j}   (exact decimal)
    lcol = F.col("_l")
    w_lag = F.when(
        lcol >= 1,
        F.aggregate(
            F.sequence(F.lit(1), lcol),
            F.lit(0).cast(_DEC),
            lambda acc, j: acc
            + _dec(lcol + 1 - j)
            * F.aggregate(
                F.zip_with(
                    F.slice(F.col("_u"), F.lit(1), F.col("_n") - j),
                    F.slice(F.col("_u"), j + 1, F.col("_n") - j),
                    lambda a, b: _dec(a) * _dec(b),
                ),
                F.lit(0).cast(_DEC),
                lambda a, x: a + x,
            ),
        ),
    ).otherwise(F.lit(0).cast(_DEC))

    staged = base.select(
        *keep_cols,
        F.col("_n").alias("n"),
        lcol.alias("bandwidth"),
        q_fold.alias("_q"),
        g0.alias("_g0"),
        w_lag.alias("_w"),
    )
    # M = (l+1) G0 + 2 W ;  eta = Q (l+1) / (n M)
    m = (
        _dec(F.col("bandwidth") + 1) * F.col("_g0")
        + F.lit(2).cast(_DEC) * F.col("_w")
    )
    eta = F.when(
        m > F.lit(0).cast(_DEC),
        F.col("_q").cast("double")
        * (F.col("bandwidth") + 1).cast("double")
        / (F.col("n").cast("double") * m.cast("double")),
    )
    return staged.select(
        *keep_cols,
        "n",
        "bandwidth",
        eta.alias("eta"),
        (eta > F.lit(0.463)).alias("reject_5pct"),
    )


def durbin_watson(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
    min_n: int = 2,
) -> DataFrame:
    """(*keep_cols, n, dw, rho1) — one row per signal with
    n >= max(min_n, 2).

    ``dw`` = n²·Σ(x_t − x_{t−1})² / Σ(n·x_t − S)² — demeaning cancels
    in first differences, so the numerator needs no residual at all;
    NULL for a constant series.  ``rho1`` = 1 − dw/2, the implied
    lag-1 autocorrelation.
    """
    arr = F.col("_arr")
    n = F.size(arr)
    s_tot = F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))
    sd2 = F.aggregate(
        F.zip_with(
            F.slice(arr, F.lit(2), n - 1),
            F.slice(arr, F.lit(1), n - 1),
            lambda a, b: (a.cast("long") - b.cast("long"))
            * (a.cast("long") - b.cast("long")),
        ),
        F.lit(0).cast(_DEC),
        lambda a, x: a + _dec(x),
    )
    base = (
        _staged(df, array_col, keep_cols, max(int(min_n), 2))
        .withColumn("_n", n)
        .withColumn("_s", s_tot)
    )
    g0 = F.aggregate(
        F.col("_arr"),
        F.lit(0).cast(_DEC),
        lambda a, x: a
        + _dec(F.col("_n").cast("long") * x.cast("long") - F.col("_s"))
        * _dec(F.col("_n").cast("long") * x.cast("long") - F.col("_s")),
    )
    staged = base.select(
        *keep_cols,
        F.col("_n").alias("n"),
        sd2.alias("_sd2"),
        g0.alias("_g0"),
    )
    nd = _dec(F.col("n"))
    dw = F.when(
        F.col("_g0") > F.lit(0).cast(_DEC),
        (nd * nd * F.col("_sd2")).cast("double") / F.col("_g0").cast("double"),
    )
    return staged.select(
        *keep_cols,
        "n",
        dw.alias("dw"),
        (F.lit(1.0) - dw / F.lit(2.0)).alias("rho1"),
    )
