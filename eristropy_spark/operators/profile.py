"""Column-profiling census — table observability for the pipeline
tier (the "what actually landed" check before any analytics runs:
null rates, cardinalities, ranges drifting between snapshots are the
first symptom of an upstream schema or join regression).

``profile_columns`` computes, per requested column, the long-form row

    (column, n_rows, n_nonnull, n_distinct, min_str, max_str)

in ONE aggregate pass: every per-column statistic is an expression in
a single ``agg`` over the whole table, and the wide 1-row result is
unpivoted in-row (``stack``) to the long form — no per-column scans,
no joins.

``exact=True`` uses ``count_distinct`` for every column: Spark plans
multi-distinct aggregates with an Expand node (rows x n_cols
pre-aggregation), which is the right trade at verification scale and
the wrong one at 100 TB.  ``exact=False`` (the scale path) swaps in
``approx_count_distinct`` (HyperLogLog++, rsd 1.6 %) — one map-side
combinable pass, no Expand — mirroring the exact/sketch split in
``operators/rollup.cardinality_rollup``.

min/max are computed on the NATIVE column type (so numeric columns
order numerically, timestamps temporally) and cast to string only for
the uniform long-form output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_nonnull, n_distinct, min_str, max_str)."""
    cols = list(df.columns) if cols is None else list(cols)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if not cols:
        raise ValueError("cols must be non-empty")

    ndistinct = F.count_distinct if exact else F.approx_count_distinct
    exprs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        exprs += [
            F.count(col).alias(f"_nn_{c}"),
            ndistinct(col).alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*exprs)

    # in-row unpivot of the 1-row wide result: stack(n, name, nn, nd,
    # min, max, ...) — no join, no extra shuffle
    parts = []
    for c in cols:
        parts += [
            f"'{c}'", f"`_nn_{c}`", f"`_nd_{c}`", f"`_min_{c}`",
            f"`_max_{c}`",
        ]
    stacked = wide.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) AS "
            "(column, n_nonnull, n_distinct, min_str, max_str)"
        ),
    )
    return stacked.select(
        F.col("column"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nonnull").cast("long").alias("n_nonnull"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_str",
        "max_str",
    )
