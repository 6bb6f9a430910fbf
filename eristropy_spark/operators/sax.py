"""PAA + SAX symbolization — the classic timeseries-mining downsample
(Lin, Keogh, Lonardi & Chiu 2003, "A Symbolic Representation of Time
Series, with Implications for Streaming Algorithms", DMKD — public
paper): z-normalize each series, average it into ``w`` equal-width
segments (Piecewise Aggregate Approximation), then map each segment
mean to a small alphabet via the standard-normal quantile breakpoints.
The symbol strings feed motif mining, indexing, and cheap
approximate-distance pruning.

Scale shape: TWO aggregations over the SAME key prefix — per-key
moments via an unordered window (one shuffle, whole-stage codegen),
then a (key, segment) hash aggregate whose partial (map-side) combine
does the heavy reduction.  No Python, no arrays collected per task, so
a key with a billion points never materializes in one place — unlike
array-layout SAX implementations this streams.

Engine-exactness: the segment id is pure int64 arithmetic
``(idx * w) DIV n`` (never float binning); segment means are rounded
to 6 dp with the shared floor-based rounding BEFORE the breakpoint
comparison so both engines symbolize the identical number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sax_symbols", "SAX_BREAKPOINTS"]

# Standard-normal quantile breakpoints for alphabet sizes 2..8 (the
# published SAX lookup table; values are the N(0,1) quantiles at
# i/alphabet, i = 1..alphabet-1).
SAX_BREAKPOINTS: dict[int, tuple[float, ...]] = {
    2: (0.0,),
    3: (-0.43, 0.43),
    4: (-0.67, 0.0, 0.67),
    5: (-0.84, -0.25, 0.25, 0.84),
    6: (-0.97, -0.43, 0.0, 0.43, 0.97),
    7: (-1.07, -0.57, -0.18, 0.18, 0.57, 1.07),
    8: (-1.15, -0.67, -0.32, 0.0, 0.32, 0.67, 1.15),
}


def _r6(c: Column) -> Column:
    """floor-based 6-dp rounding, identical IEEE expression in Spark
    and DuckDB (Spark round() is decimal HALF_UP, DuckDB's is float —
    they disagree on halves; this never does)."""
    d = c.cast("double")
    return F.when(F.isnan(d) | d.isNull(), d).otherwise(
        F.floor(d * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    )


def sax_symbols(
    df: DataFrame,
    key,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    n_segments: int = 16,
    alphabet: int = 4,
) -> DataFrame:
    """Return one row per (key, segment): the PAA mean of the z-normed
    series and its SAX symbol id (0-based; 0 = lowest band).

    Series shorter than ``n_segments`` still produce one segment per
    occupied slot (the standard `(idx*w) DIV n` assignment); a series
    with zero variance z-norms to NULL and symbolizes to NULL rather
    than an arbitrary middle symbol.

    Output columns: ``*key, segment, paa, symbol``.
    """
    if n_segments < 1:
        raise ValueError("n_segments must be >= 1")
    if alphabet not in SAX_BREAKPOINTS:
        raise ValueError(
            f"alphabet must be one of {sorted(SAX_BREAKPOINTS)}, got {alphabet}"
        )
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))

    wk = Window.partitionBy(*keys)
    wo = wk.orderBy(*order)
    v = F.col(value_col).cast("double")

    idx = F.row_number().over(wo) - F.lit(1)
    n = F.count(v).over(wk)
    mu = F.avg(v).over(wk)
    sd = F.stddev_samp(v).over(wk)
    z = F.when(sd > 0, (v - mu) / sd)

    # integer division on longs: Spark `DIV` == DuckDB `//` — exact,
    # never a float-binning boundary
    staged = df.select(
        *[F.col(k) for k in keys],
        (idx.cast("long") * F.lit(n_segments)).alias("_iw"),
        n.cast("long").alias("_n"),
        z.alias("_z"),
    ).withColumn("segment", F.expr("CAST(_iw DIV _n AS INT)"))

    paa = _r6(F.avg("_z"))
    out = staged.groupBy(*keys, "segment").agg(paa.alias("paa"))

    bps = SAX_BREAKPOINTS[alphabet]
    sym: Column = F.lit(0)
    for b in bps:
        sym = sym + F.when(F.col("paa") > F.lit(b), 1).otherwise(0)
    sym = F.when(F.col("paa").isNotNull(), sym.cast("int"))
    return out.withColumn("symbol", sym)
