"""Windowed entropy — bounded-compute entropy for LONG sequences.

SampEn is O(n²) per sequence, so a single 10⁶-token sequence would pin
one task for minutes (SURVEY.md §7.3 hazard 9).  This operator splits
each sequence into fixed-size windows JVM-side (``slice`` over a
``sequence`` of starts — no Python until the entropy kernel), then the
standard zero-shuffle entropy projection runs per (doc, window) row:

* worst-case task cost is O(window²) regardless of sequence length,
* each window becomes its own entropy point (ts = sequence start; the
  window index is carried for downstream bucketing), so long signals
  contribute a SERIES of points to the retention cascade instead of
  one giant quadratic job,
* windows are rows, so a single long sequence parallelizes ACROSS the
  cluster instead of serializing on one core.

The explode multiplies row count, not bytes: each window row carries
only its own slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eristropy_spark.functions.entropy import entropy_struct_udf

__all__ = ["windowed_entropy"]


def windowed_entropy(
    tokens_df: DataFrame,
    window: int = 512,
    stride: int | None = None,
    min_window: int = 16,
    m: int = 2,
    r: float = 0.2,
    permen_m: int = 3,
    permen_delay: int = 1,
    normalize: bool = True,
    keep_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """(doc_id, window_id, n_tok, [keep_cols...,] sampen, permen).

    ``stride`` defaults to ``window`` (tumbling); pass a smaller stride
    for overlapping (sliding) windows.  Trailing fragments shorter than
    ``min_window`` are dropped (too short for a stable estimate).
    """
    if stride is None:
        stride = window
    if window < 2 or stride < 1:
        raise ValueError("window must be >= 2 and stride >= 1")
    if not (0 < min_window <= window):
        raise ValueError("min_window must be in (0, window]")

    n = F.size("tokens")
    # window start positions (1-based for slice): 1, 1+stride, ...
    n_win = F.when(
        n >= min_window,
        F.floor((n - F.lit(min_window)) / F.lit(stride)).cast("int") + 1,
    ).otherwise(F.lit(0))
    starts = F.when(
        n_win > 0, F.sequence(F.lit(0), n_win - 1)
    ).otherwise(F.array().cast("array<int>"))
    win = tokens_df.select(
        "doc_id",
        *keep_cols,
        F.posexplode(
            F.transform(
                starts,
                lambda i: F.slice("tokens", i * stride + 1, window),
            )
        ).alias("window_id", "wtokens"),
    ).where(F.size("wtokens") >= min_window)

    ent = entropy_struct_udf(
        F.col("wtokens").cast("array<double>"),
        F.lit(m),
        F.lit(float(r)),
        F.lit(bool(normalize)),
        F.lit(permen_m),
        F.lit(permen_delay),
    )
    return win.select(
        "doc_id",
        "window_id",
        F.size("wtokens").cast("int").alias("n_tok"),
        *keep_cols,
        ent["sampen"].alias("sampen"),
        ent["permen"].alias("permen"),
    )
