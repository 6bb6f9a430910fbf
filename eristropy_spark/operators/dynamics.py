"""Signal-dynamics descriptors per signal, pure whole-stage codegen.

Three classical nonlinear-dynamics summaries that sit next to the
entropy kernels (SampEn/PermEn/LZ76) in every physiological and
symbolic-dynamics toolbox, none of which the reference engine ships:

* ``irreversibility`` — time-reversal asymmetry of the increment
  distribution: Porta's index P% = N(Δ<0)/N(Δ≠0) (Porta et al. 2008,
  Am. J. Physiol. 295) and Guzik's index GI = Σ(Δ²|Δ>0)/ΣΔ²
  (Guzik et al. 2006, Biomed. Tech. 51), plus the exact sign-test z
  for N(Δ>0) vs N(Δ<0).  A linear Gaussian process is time-reversible
  (both ≈ 0.5); departures flag nonlinearity that variance-based
  statistics cannot see — the standard pre-test before trusting a
  linear model of the sequence.
* ``hjorth`` — Hjorth's activity/mobility/complexity descriptors
  (Hjorth 1970, EEG Clin. Neurophysiol. 29): activity = Var(x),
  mobility = √(Var(Δx)/Var(x)) (a time-domain dominant-frequency
  proxy), complexity = mobility(Δx)/mobility(x) (bandwidth / deviation
  from a pure sine).  THE classic O(n) waveform summary of the EEG
  literature — the cheap screen before the O(n²) entropy kernels.
* ``katz_fd`` — Katz's fractal dimension (Katz 1988, Comput. Biol.
  Med. 18): D = ln(m) / (ln(m) + ln(d/L)) with m = n−1 segments,
  L = Σ|Δ| the curve length and d = max_i |x_i − x_1| the planar
  extent.  Complements Higuchi's FD (operators/fractal.py): Katz is
  single-pass and waveform-normalized where Higuchi fits a scaling
  law over delays.

Exactness protocol (the repo's exact-integer rule, see
operators/randomtests.py): every accumulated quantity — delta counts,
Σ|Δ|, ΣΔ², Σx, Σx², second-difference sums, max extent — is an EXACT
int64 computed in-row over the integer token array, and each statistic
is then ONE fixed IEEE-double expression over those integers written
in the same shape on the Spark and DuckDB sides, so the contract's
value-hash compare is bit-deterministic.

Scale shape: zero Python, zero joins, zero windows — slices +
``zip_with`` + integer-accumulator ``aggregate`` over the array
layout, so each plan carries only tokenize's Exchange and O(n) work
per signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["irreversibility", "hjorth", "katz_fd"]


def _isum(arr: Column) -> Column:
    """Exact int64 sum of a long array."""
    return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)


def _staged(df: DataFrame, array_col: str, keep_cols: tuple[str, ...]):
    """(*keep_cols, _arr) with empty/NULL arrays dropped."""
    return df.select(
        *keep_cols, F.col(array_col).alias("_arr")
    ).filter(F.size("_arr") >= 1)


def _deltas(arr: Column, n: Column) -> Column:
    """First differences as a long array (size n−1; empty when n < 2)."""
    return F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: b.cast("long") - a.cast("long"),
    )


def irreversibility(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, n_plus, n_minus, porta, guzik, z) per signal.

    With increments Δ_i = x_{i+1} − x_i:

        n_plus  = #{Δ > 0},   n_minus = #{Δ < 0}
        porta   = n_minus / (n_plus + n_minus)
        guzik   = Σ(Δ² | Δ>0) / ΣΔ²
        z       = (n_plus − n_minus) / √(n_plus + n_minus)

    ``porta``/``z`` are NULL when every increment is zero (no sign
    information); ``guzik`` is NULL when ΣΔ² = 0.  Zero increments are
    excluded from both indices (the published convention for discrete
    data — ties carry no direction).
    """
    arr = F.col("_arr")
    n = F.size(arr)
    base = (
        _staged(df, array_col, keep_cols)
        .withColumn("_d", F.when(n >= 2, _deltas(arr, n)))
        .select(*keep_cols, n.alias("n"), F.col("_d"))
    )
    d = F.col("_d")
    n_plus = _isum(F.transform(d, lambda x: F.when(x > 0, 1).otherwise(0).cast("long")))
    n_minus = _isum(F.transform(d, lambda x: F.when(x < 0, 1).otherwise(0).cast("long")))
    s_plus = _isum(F.transform(d, lambda x: F.when(x > 0, x * x).otherwise(F.lit(0).cast("long"))))
    s_all = _isum(F.transform(d, lambda x: x * x))
    counted = base.select(
        *keep_cols,
        "n",
        F.coalesce(n_plus, F.lit(0).cast("long")).alias("n_plus"),
        F.coalesce(n_minus, F.lit(0).cast("long")).alias("n_minus"),
        F.coalesce(s_plus, F.lit(0).cast("long")).alias("_sp"),
        F.coalesce(s_all, F.lit(0).cast("long")).alias("_sa"),
    )
    m = (F.col("n_plus") + F.col("n_minus")).cast("double")
    porta = F.when(m > 0, F.col("n_minus").cast("double") / m)
    guzik = F.when(
        F.col("_sa") > 0, F.col("_sp").cast("double") / F.col("_sa").cast("double")
    )
    z = F.when(
        m > 0,
        (F.col("n_plus").cast("double") - F.col("n_minus").cast("double"))
        / F.sqrt(m),
    )
    return counted.select(
        *keep_cols, "n", "n_plus", "n_minus",
        porta.alias("porta"), guzik.alias("guzik"), z.alias("z"),
    )


def hjorth(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, activity, mobility, complexity) per signal.

    Population variances of the signal and its first and second
    differences (the Hjorth 1970 definitions):

        activity   = Var(x)
        mobility   = √(Var(Δx) / Var(x))
        complexity = √(Var(Δ²x) / Var(Δx)) / mobility

    ``mobility`` is NULL when n < 2 or Var(x) = 0; ``complexity``
    additionally when n < 3 or Var(Δx) = 0.  Each Var is computed as
    (ΣQ − S²/k)/k from exact int64 sums S, ΣQ — one fixed float
    expression per output.
    """
    arr = F.col("_arr")
    n = F.size(arr)
    d1 = _deltas(arr, n)
    base = (
        _staged(df, array_col, keep_cols)
        .withColumn("_d1", F.when(n >= 2, d1))
        .withColumn(
            "_d2",
            F.when(
                n >= 3,
                F.zip_with(
                    F.slice(F.col("_d1"), 1, F.size("_d1") - 1),
                    F.slice(F.col("_d1"), 2, F.size("_d1") - 1),
                    lambda a, b: b - a,
                ),
            ),
        )
        .select(
            *keep_cols,
            n.alias("n"),
            _isum(F.transform(arr, lambda x: x.cast("long"))).alias("_s0"),
            _isum(
                F.transform(arr, lambda x: x.cast("long") * x.cast("long"))
            ).alias("_q0"),
            F.coalesce(_isum(F.col("_d1")), F.lit(0).cast("long")).alias("_s1"),
            F.coalesce(
                _isum(F.transform(F.col("_d1"), lambda x: x * x)),
                F.lit(0).cast("long"),
            ).alias("_q1"),
            F.coalesce(_isum(F.col("_d2")), F.lit(0).cast("long")).alias("_s2"),
            F.coalesce(
                _isum(F.transform(F.col("_d2"), lambda x: x * x)),
                F.lit(0).cast("long"),
            ).alias("_q2"),
        )
    )
    k0 = F.col("n").cast("double")
    k1 = (F.col("n") - 1).cast("double")
    k2 = (F.col("n") - 2).cast("double")
    s0, q0 = F.col("_s0").cast("double"), F.col("_q0").cast("double")
    s1, q1 = F.col("_s1").cast("double"), F.col("_q1").cast("double")
    s2, q2 = F.col("_s2").cast("double"), F.col("_q2").cast("double")
    var0 = (q0 - s0 * s0 / k0) / k0
    var1 = (q1 - s1 * s1 / k1) / k1
    var2 = (q2 - s2 * s2 / k2) / k2
    activity = var0
    mobility = F.when((F.col("n") >= 2) & (var0 > 0), F.sqrt(var1 / var0))
    complexity = F.when(
        (F.col("n") >= 3) & (var1 > 0) & (var0 > 0),
        F.sqrt(var2 / var1) / F.sqrt(var1 / var0),
    )
    return base.select(
        *keep_cols, "n",
        activity.alias("activity"),
        mobility.alias("mobility"),
        complexity.alias("complexity"),
    )


def katz_fd(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, curve_len, extent, kfd) per signal.

    Katz 1988 waveform fractal dimension with m = n−1 segments,
    ``curve_len`` L = Σ|Δ| and ``extent`` d = max_i |x_i − x_1|:

        kfd = ln(m) / (ln(m) + ln(d) − ln(L))

    NULL when n < 3, L = 0, d = 0, or the denominator vanishes
    (d/L = 1/m exactly).  L and d are exact int64s; kfd is one fixed
    float expression.
    """
    arr = F.col("_arr")
    n = F.size(arr)
    first = F.element_at(arr, 1).cast("long")
    length = F.coalesce(
        _isum(F.transform(_deltas(arr, n), lambda x: F.abs(x))),
        F.lit(0).cast("long"),
    )
    extent = F.aggregate(
        F.transform(arr, lambda x: F.abs(x.cast("long") - first)),
        F.lit(0).cast("long"),
        lambda a, x: F.greatest(a, x),
    )
    base = _staged(df, array_col, keep_cols).select(
        *keep_cols,
        n.alias("n"),
        F.when(n >= 2, length).otherwise(F.lit(0).cast("long")).alias("curve_len"),
        extent.alias("extent"),
    )
    md = (F.col("n") - 1).cast("double")
    ld = F.col("curve_len").cast("double")
    dd = F.col("extent").cast("double")
    denom = F.log(md) + F.log(dd) - F.log(ld)
    kfd = F.when(
        (F.col("n") >= 3)
        & (F.col("curve_len") > 0)
        & (F.col("extent") > 0)
        & (denom != 0),
        F.log(md) / denom,
    )
    return base.select(*keep_cols, "n", "curve_len", "extent", kfd.alias("kfd"))
