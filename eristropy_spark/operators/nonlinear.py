"""Nonlinear-dynamics census per signal, pure whole-stage codegen.

Three more classical nonlinear summaries that sit beside the entropy
kernels (SampEn / PermEn / LZ76 / Higuchi / DFA already in this repo),
none of which the reference engine ships
(/root/reference/eristropy has only SampEn + stationarity):

* ``poincare`` — Poincaré-plot descriptors SD1/SD2 (Brennan, Palaniswami
  & Kamen 2001, IEEE Trans. Biomed. Eng. 48): SD1² = ½·Var(Δx) is the
  short-term (beat-to-beat) spread perpendicular to the identity line,
  SD2² = 2·Var(x) − SD1² the long-term spread along it; ``ratio`` =
  SD1/SD2 and the ellipse ``area`` = π·SD1·SD2.  THE standard HRV
  scatter-plot geometry, an O(n) exact-moment computation.
* ``ordinal_census`` — the full order-3 ordinal-pattern distribution
  (Bandt & Pompe 2002, PRL 88): exact counts of the six patterns with
  the stable tie rule (equal values ordered by position, matching
  kernels/permen.py), the number of *forbidden/missing* patterns
  (Amigó, Zambrano & Sanjuán 2007, EPL 79 — determinism leaves ordinal
  patterns unvisited where noise fills all six), and the normalized
  m=3 permutation entropy.  Unlike the Arrow-kernel PermEn (arbitrary
  m), this is zero-Python whole-stage codegen.
* ``rqa`` — recurrence quantification (Zbilut & Webber 1992, Phys.
  Lett. A 171; Marwan et al. 2007, Phys. Rep. 438): recurrence rate
  RR = #{i<j : |x_i−x_j| ≤ r} / (n(n−1)/2) and determinism
  DET = the fraction of recurrent pairs lying on a diagonal line of
  length ≥ 2 (i.e. whose (i−1,j−1) or (i+1,j+1) neighbor also
  recurs).  The radius is per-signal and exact:
  r = (max(x) − min(x)) // radius_div — integer division, so the
  whole candidate structure is integer-decidable.

Exactness protocol (the repo's exact-integer rule, see
operators/dynamics.py): every count and accumulated moment — Σx, Σx²,
ΣΔ, ΣΔ², the 6 pattern counts, recurrence/diagonal pair counts — is an
EXACT int64 computed in-row over the integer token array; each
statistic is then ONE fixed IEEE-double expression over those integers
written in the same shape on the Spark and DuckDB sides.  ``sqrt`` is
correctly rounded in IEEE-754, so poincare is bit-deterministic;
ordinal_census's entropy uses ``ln`` in a fixed summation order on
identical rationals (empirically hash-stable at the contract's 6-dp
rounding).

Scale shape: zero Python, zero joins, zero windows — each plan carries
only tokenize's Exchange.  ``poincare``/``ordinal_census`` are O(n)
per signal; ``rqa`` is O(n²) per signal like SampEn, so at 100 TB it
rides the same guard as the entropy kernels: a token-length cap
(events_to_tokens max_tokens) bounds worst-case task time, and longer
series go through the windowed layout (operators/windowed.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["poincare", "ordinal_census", "rqa"]


def _isum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)


def _staged(df: DataFrame, array_col: str, keep_cols: tuple[str, ...], min_n: int):
    return df.select(*keep_cols, F.col(array_col).alias("_arr")).filter(
        F.size("_arr") >= min_n
    )


def poincare(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, sd1, sd2, ratio, area) per signal.

    Sample (ddof=1) variances of the signal and of its first
    difference; signals with n < 3 are dropped (Var(Δx) undefined).
    ``sd2`` clamps 2·Var(x) − SD1² at 0 before the sqrt; ``ratio`` is
    NULL when SD2 = 0, ``area`` = π·SD1·SD2.
    """
    arr = F.col("_arr")
    n = F.size(arr)
    lng = lambda x: x.cast("long")  # noqa: E731
    d = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: lng(b) - lng(a),
    )
    base = _staged(df, array_col, keep_cols, 3).select(
        *keep_cols,
        n.alias("n"),
        _isum(F.transform(arr, lng)).alias("_sx"),
        _isum(F.transform(arr, lambda x: lng(x) * lng(x))).alias("_sxx"),
        _isum(d).alias("_sd"),
        _isum(F.zip_with(d, d, lambda a, b: a * b)).alias("_sdd"),
    )
    nn = F.col("n").cast("double")
    m = nn - 1.0  # number of increments
    var_x = (nn * F.col("_sxx").cast("double") - F.col("_sx").cast("double") * F.col("_sx").cast("double")) / (nn * (nn - 1.0))
    var_d = (m * F.col("_sdd").cast("double") - F.col("_sd").cast("double") * F.col("_sd").cast("double")) / (m * (m - 1.0))
    sd1 = F.sqrt(var_d / 2.0)
    sd2 = F.sqrt(F.greatest(2.0 * var_x - var_d / 2.0, F.lit(0.0)))
    return base.select(
        *keep_cols,
        "n",
        sd1.alias("sd1"),
        sd2.alias("sd2"),
        F.when(sd2 > 0.0, sd1 / sd2).alias("ratio"),
        (F.lit(3.141592653589793) * sd1 * sd2).alias("area"),
    )


def ordinal_census(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, n_windows, n012..n210, n_missing, pe3) per signal.

    Order-3 ordinal patterns over consecutive triples (no embedding
    delay), stable tie rule: for positions i < j, x_j precedes x_i in
    the sorted order iff x_j < x_i (ties keep the earlier index first
    — the same convention as kernels/permen.py's stable argsort).
    Encoding per window (a, b, c): code = 4·[b<a] + 2·[c<a] + [c<b];
    the six transitive codes map to patterns
    0→012, 1→021, 3→201, 4→102, 6→120, 7→210 (codes 2 and 5 are
    intransitive and cannot occur).  ``n_missing`` counts patterns
    with zero windows (forbidden-pattern statistic); ``pe3`` is the
    Shannon entropy of the six relative frequencies normalized by
    ln 6.  Signals with n < 3 are dropped.
    """
    arr = F.col("_arr")
    n = F.size(arr)

    def code(i: Column) -> Column:
        a = F.element_at(arr, i + 1).cast("long")
        b = F.element_at(arr, i + 2).cast("long")
        c = F.element_at(arr, i + 3).cast("long")
        bit = lambda cond: F.when(cond, 1).otherwise(0)  # noqa: E731
        return (bit(b < a) * 4 + bit(c < a) * 2 + bit(c < b)).cast("int")

    base = (
        _staged(df, array_col, keep_cols, 3)
        .withColumn("_codes", F.transform(F.sequence(F.lit(0), n - 3), code))
        .select(*keep_cols, n.alias("n"), F.col("_codes"))
    )
    cnt = lambda k: F.size(  # noqa: E731
        F.filter(F.col("_codes"), lambda c: c == F.lit(k))
    ).cast("long")
    counted = base.select(
        *keep_cols,
        "n",
        F.size("_codes").cast("long").alias("n_windows"),
        cnt(0).alias("n012"),
        cnt(1).alias("n021"),
        cnt(4).alias("n102"),
        cnt(6).alias("n120"),
        cnt(3).alias("n201"),
        cnt(7).alias("n210"),
    )
    names = ("n012", "n021", "n102", "n120", "n201", "n210")
    missing = sum(
        (F.when(F.col(c) == 0, 1).otherwise(0) for c in names), F.lit(0)
    ).cast("int")
    w = F.col("n_windows").cast("double")

    def term(c: str) -> Column:
        p = F.col(c).cast("double") / w
        return F.when(F.col(c) > 0, p * F.log(p)).otherwise(F.lit(0.0))

    # fixed left-to-right summation order — mirrored in the oracle SQL
    h = term("n012") + term("n021") + term("n102") + term("n120") + term("n201") + term("n210")
    pe3 = F.when(
        F.col("n_windows") > 0, -h / F.log(F.lit(6.0))
    )
    return counted.select(
        *keep_cols, "n", "n_windows", *names,
        missing.alias("n_missing"), pe3.alias("pe3"),
    )


def rqa(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
    radius_div: int = 5,
) -> DataFrame:
    """(*keep_cols, n, r, n_pairs, n_rec, n_line, rr, det) per signal.

    Recurrence over the upper triangle i < j of the distance matrix
    with the per-signal integer radius r = (max − min) // radius_div:

        n_pairs = n(n−1)/2
        n_rec   = #{(i,j) : |x_i − x_j| ≤ r}
        n_line  = #{recurrent (i,j) whose (i−1,j−1) or (i+1,j+1)
                    neighbor is also recurrent}           (diagonals ≥ 2)
        rr      = n_rec / n_pairs
        det     = n_line / n_rec            (NULL when n_rec = 0)

    Signals with n < 2 are dropped.  O(n²) comparisons per signal,
    all in-row integer arithmetic (see module docstring for the
    long-sequence guard).
    """
    if radius_div < 1:
        raise ValueError(f"radius_div must be >= 1, got {radius_div}")
    arr = F.col("_arr")
    n = F.size(arr)
    base = (
        _staged(df, array_col, keep_cols, 2)
        .select(
            *keep_cols,
            n.alias("n"),
            F.col("_arr"),
            F.floor(
                (F.array_max(arr).cast("long") - F.array_min(arr).cast("long"))
                / F.lit(radius_div)
            ).cast("long").alias("r"),
        )
    )
    el = lambda p: F.element_at(F.col("_arr"), (p + 1).cast("int")).cast("long")  # noqa: E731
    r = F.col("r")
    nn = F.col("n")

    def rec(i: Column, j: Column) -> Column:
        return F.abs(el(i) - el(j)) <= r

    def pair_sum(body) -> Column:
        inner = lambda i: F.aggregate(  # noqa: E731
            F.sequence(i + 1, nn - 1),
            F.lit(0).cast("long"),
            lambda acc, j: acc + F.when(body(i, j), 1).otherwise(0).cast("long"),
        )
        return F.aggregate(
            F.sequence(F.lit(0), nn - 2),
            F.lit(0).cast("long"),
            lambda acc, i: acc + inner(i),
        )

    on_line = lambda i, j: rec(i, j) & (  # noqa: E731
        ((i > 0) & rec(i - 1, j - 1)) | ((j < nn - 1) & rec(i + 1, j + 1))
    )
    counted = base.select(
        *keep_cols, "n", "r",
        (nn.cast("long") * (nn.cast("long") - 1) / 2).cast("long").alias("n_pairs"),
        pair_sum(rec).alias("n_rec"),
        pair_sum(on_line).alias("n_line"),
    )
    return counted.select(
        *keep_cols, "n", "r", "n_pairs", "n_rec", "n_line",
        (F.col("n_rec").cast("double") / F.col("n_pairs").cast("double")).alias("rr"),
        F.when(
            F.col("n_rec") > 0,
            F.col("n_line").cast("double") / F.col("n_rec").cast("double"),
        ).alias("det"),
    )
