"""Dominant-period detection by epoch folding — the phase-dispersion /
periodicity-strength scan of classical variable-star and periodicity
analysis (Stellingwerf 1978 ApJ "Period determination using phase
dispersion minimization"; the ANOVA form in Schwarzenberg-Czerny 1989
MNRAS — public): for each candidate period ``p``, fold the series on
phase ``t mod p`` and measure how much of the variance the phase means
explain,

    strength(p) = SS_between(p) / SS_total  in [0, 1],

where SS_between = sum over phases of k*(mean_phase - mean)^2 with the
series truncated to n' = k*p samples so every phase holds exactly k
points (equal-n folding — the textbook form, and the one whose sums
stay exact below).  A strongly periodic series scores near 1 at its
true period (and its multiples); white noise scores near 1/k.  Unlike
an FFT periodogram this needs NO trigonometry, so the result is
bit-reproducible across engines (libm cos/sin differ in the last ulp
between a JVM and a C engine — a comparison oracle would flake).

Scale shape: ONE key window assigns positions, an in-row explode of
the candidate grid (|grid| ~ tens — the blowup is bounded and
immediately map-side combined), then two hash aggregates: per
(key, period, phase) and per (key, period).  Shuffles carry only
partial sums keyed by (key, period[, phase]); no Python anywhere.

Engine-exactness: values snap to a 6-decimal grid and scale to exact
integers x_i = round(x*1e6); every accumulation (T = sum x_i, U = sum
x_i^2, per-phase S_ph = sum x_i, Q = sum S_ph^2) is a DECIMAL(38,0)
integer sum — exact under any order — and the final

    strength = (Q/k - T^2/n') / (U - T^2/n')

is a fixed handful of IEEE double ops on identical operands in any
engine.  No double->fine-decimal casts anywhere (the engine-ambiguous
operation — see operators/decompose.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eristropy_spark.operators.changepoint import _floor_round

__all__ = ["periodicity_strength", "dominant_period"]


def periodicity_strength(
    df: DataFrame,
    key,
    periods: Sequence[int],
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per (key, period): ``k`` (complete folds used) and
    ``strength`` (fraction of variance explained by the phase means,
    in [0, 1]; NULL for a zero-variance series).

    Candidate ``periods`` are in SAMPLES (positional, like sax/acf —
    resample or bucket first for wall-clock periods).  A (key, period)
    needs at least two complete folds (n >= 2*period) to score;
    thinner combinations are dropped.

    Output columns: ``*key, period, k, strength``.
    """
    periods = sorted({int(p) for p in periods})
    if not periods or periods[0] < 2:
        raise ValueError(f"periods must all be >= 2, got {periods}")
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*keys).orderBy(*order)
    wk = Window.partitionBy(*keys)

    # exact integer samples on the 6dp grid: x_i = floor(x*1e6 + 0.5)
    # (floor on a double is BIGINT — no float round-trip back through
    # /1e6).  DECIMAL(19,0) per element so products widen to
    # DECIMAL(38,0) losslessly (Spark and DuckDB share that rule).
    xi = F.floor(
        F.col(value_col).cast("double") * F.lit(1e6) + F.lit(0.5)
    ).cast("decimal(19, 0)")
    cols = [*keys, ts_col, value_col]
    if tiebreak_col is not None:
        cols.append(tiebreak_col)
    base = (
        df.select(*cols)
        .withColumn("_xi", xi)
        .withColumn("_t", F.row_number().over(w) - F.lit(1))
        .withColumn("_n", F.count("*").over(wk))
        .withColumn(
            "period",
            F.explode(F.array(*[F.lit(p) for p in periods])),
        )
        .withColumn("_k", F.floor(F.col("_n") / F.col("period")))
        # equal-n folding: keep k complete folds, need >= 2
        .where(
            (F.col("_k") >= 2)
            & (F.col("_t") < F.col("_k") * F.col("period"))
        )
        .withColumn("_phase", F.col("_t") % F.col("period"))
    )

    ph = base.groupBy(*keys, "period", "_phase").agg(
        F.sum("_xi").cast("decimal(19, 0)").alias("_s_ph"),
        F.sum(F.col("_xi") * F.col("_xi")).alias("_u_ph"),
        F.max("_k").alias("_k"),
    )
    agg = ph.groupBy(*keys, "period").agg(
        F.sum(F.col("_s_ph") * F.col("_s_ph")).alias("_q"),
        F.sum(F.col("_s_ph").cast("decimal(38, 0)")).alias("_t_sum"),
        F.sum("_u_ph").alias("_u"),
        F.max("_k").alias("k"),
    )

    kd = F.col("k").cast("double")
    np_ = kd * F.col("period").cast("double")
    t2 = F.col("_t_sum").cast("double") * F.col("_t_sum").cast("double")
    num = F.col("_q").cast("double") / kd - t2 / np_
    den = F.col("_u").cast("double") - t2 / np_
    return (
        agg.withColumn(
            "strength", F.when(den > F.lit(0.0), num / den)
        )
        .select(*keys, "period", "k", "strength")
    )


def dominant_period(
    df: DataFrame,
    key,
    periods: Sequence[int],
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    harmonic_tol: float = 0.01,
) -> DataFrame:
    """One row per key: the SMALLEST candidate period whose 6dp-rounded
    strength reaches within ``harmonic_tol`` of the key's maximum.

    Raw folding strength is (statistically) non-decreasing along a true
    period's multiples — every multiple of p folds at least as cleanly
    as p, and under noise a multiple usually edges it out by a hair —
    so a naive argmax reports a HARMONIC, not the fundamental.  The
    tolerance band collapses the harmonic family back to its smallest
    member (the standard practical treatment; Stellingwerf's Θ scan
    resolves the same ambiguity by dof-adjusting).  All comparisons run
    on the 6dp grid, deterministic in any engine.

    Output columns: ``*key, period, k, strength`` (strength 6dp).
    Keys where no candidate scored (all-constant series, or series
    shorter than 2*min(periods)) do not appear.  For unperiodic series
    the winner is arbitrary-but-deterministic — threshold on
    ``strength`` downstream to reject them.
    """
    if not 0 <= harmonic_tol < 1:
        raise ValueError(f"harmonic_tol must be in [0, 1), got {harmonic_tol}")
    keys = [key] if isinstance(key, str) else list(key)
    s = periodicity_strength(
        df, key, periods, ts_col=ts_col,
        value_col=value_col, tiebreak_col=tiebreak_col,
    ).where(F.col("strength").isNotNull())
    s6 = _floor_round(F.col("strength"), 6)
    wk = Window.partitionBy(*keys)
    cand = (
        s.withColumn("_s6", s6)
        .withColumn("_smax", F.max("_s6").over(wk))
        .where(F.col("_s6") >= F.col("_smax") - F.lit(float(harmonic_tol)))
    )
    pick = F.struct(
        F.col("period").alias("period"),
        F.col("k").alias("k"),
        F.col("_s6").alias("s"),
    )
    return (
        cand.groupBy(*keys)
        .agg(F.min(pick).alias("_best"))
        .select(
            *keys,
            F.col("_best.period").alias("period"),
            F.col("_best.k").alias("k"),
            F.col("_best.s").alias("strength"),
        )
    )
