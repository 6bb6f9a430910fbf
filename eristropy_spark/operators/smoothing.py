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

__all__ = ["ewma"]


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
