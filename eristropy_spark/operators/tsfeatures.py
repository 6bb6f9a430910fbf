"""tsfresh-style per-signal feature battery, pure whole-stage codegen.

``ts_features`` computes the classic screening features the
time-series feature-extraction literature runs before any modeling
(the tsfresh catalogue, Christ et al. 2018, Neurocomputing 307; each
feature individually much older):

* ``abs_energy``      Σx²  (exact int64)
* ``rng``             max − min  (exact int64)
* ``n_above_mean``    #{x_i > mean}  — compared as x_i·n > S, an
                      EXACT integer cross-multiply (no float mean)
* ``n_crossings``     mean crossings: sign changes of x_i·n − S
                      between consecutive points, ties carry nothing
* ``strike_above``/``strike_below``  longest run strictly above /
                      below the mean (exact integer run-length fold)
* ``mean_abs_change`` Σ|Δ| / (n−1)
* ``cid_ce``          √(ΣΔ²) — the complexity-invariant-distance
                      complexity estimate (Batista et al. 2014, DMKD)

Exactness protocol: every count, sum and run length is an EXACT int64
computed in-row (mean comparisons via the x·n vs S cross-multiply, so
no float enters any counting decision), and the two float outputs are
ONE fixed IEEE-double expression each over exact integers — the
DuckDB replay is bit-identical.

Scale shape: zero Python, zero joins, zero windows — slices +
``zip_with`` + struct-accumulator ``aggregate`` over the array layout;
only tokenize's Exchange, O(n) per signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ts_features"]


def _isum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)


def _longest_run(flags: Column) -> Column:
    """Longest run of true flags (exact int64 fold)."""
    return F.aggregate(
        flags,
        F.struct(
            F.lit(0).cast("long").alias("cur"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            F.when(x, acc["cur"] + 1).otherwise(F.lit(0).cast("long")).alias("cur"),
            F.greatest(
                acc["best"],
                F.when(x, acc["cur"] + 1).otherwise(F.lit(0).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def ts_features(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, sum_x, abs_energy, rng, n_above_mean,
    n_crossings, strike_above, strike_below, mean_abs_change, cid_ce)
    — one row per signal.

    ``mean_abs_change`` and ``cid_ce`` are NULL when n < 2; all counts
    are 0 for degenerate signals rather than NULL.
    """
    arr = F.col("_arr")
    n = F.size(arr)
    base = (
        df.select(*keep_cols, F.col(array_col).alias("_arr"))
        .filter(F.size("_arr") >= 1)
        .select(
            *keep_cols,
            n.alias("n"),
            F.col("_arr"),
            _isum(F.transform(arr, lambda x: x.cast("long"))).alias("sum_x"),
            _isum(
                F.transform(arr, lambda x: x.cast("long") * x.cast("long"))
            ).alias("abs_energy"),
            (
                F.array_max(arr).cast("long") - F.array_min(arr).cast("long")
            ).alias("rng"),
        )
    )
    # centered sign array: sign(x_i*n - S) — exact integer comparisons
    c = F.transform(
        F.col("_arr"),
        lambda x: F.when(
            x.cast("long") * F.col("n").cast("long") > F.col("sum_x"), 1
        )
        .when(x.cast("long") * F.col("n").cast("long") < F.col("sum_x"), -1)
        .otherwise(0),
    )
    d = F.zip_with(
        F.slice(F.col("_arr"), 1, F.col("n") - 1),
        F.slice(F.col("_arr"), 2, F.col("n") - 1),
        lambda a, b: b.cast("long") - a.cast("long"),
    )
    staged = base.withColumn("_c", c).withColumn(
        "_d", F.when(F.col("n") >= 2, d)
    )
    cc = F.col("_c")
    nc = F.size(cc)
    n_above = _isum(
        F.transform(cc, lambda s: F.when(s > 0, 1).otherwise(0).cast("long"))
    )
    crossings = F.coalesce(
        _isum(
            F.zip_with(
                F.slice(cc, 1, nc - 1),
                F.slice(cc, 2, nc - 1),
                lambda a, b: F.when(
                    ((a > 0) & (b < 0)) | ((a < 0) & (b > 0)), 1
                )
                .otherwise(0)
                .cast("long"),
            )
        ),
        F.lit(0).cast("long"),
    )
    strike_above = _longest_run(F.transform(cc, lambda s: s > 0))
    strike_below = _longest_run(F.transform(cc, lambda s: s < 0))
    abs_d_sum = F.coalesce(
        _isum(F.transform(F.col("_d"), lambda x: F.abs(x))),
        F.lit(0).cast("long"),
    )
    sq_d_sum = F.coalesce(
        _isum(F.transform(F.col("_d"), lambda x: x * x)),
        F.lit(0).cast("long"),
    )
    mean_abs_change = F.when(
        F.col("n") >= 2,
        abs_d_sum.cast("double") / (F.col("n") - 1).cast("double"),
    )
    cid_ce = F.when(F.col("n") >= 2, F.sqrt(sq_d_sum.cast("double")))
    return staged.select(
        *keep_cols,
        "n",
        "sum_x",
        "abs_energy",
        "rng",
        n_above.alias("n_above_mean"),
        crossings.alias("n_crossings"),
        strike_above.alias("strike_above"),
        strike_below.alias("strike_below"),
        mean_abs_change.alias("mean_abs_change"),
        cid_ce.alias("cid_ce"),
    )
