"""Input-width helpers shared by the CPU-heavy in-row operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["widen_narrow_input"]


def widen_narrow_input(df: DataFrame) -> DataFrame:
    """Spread a too-narrow input across the cluster before CPU-heavy
    per-row work (gram hashing, signature building).

    In-row expressions parallelize exactly as wide as the INPUT
    partitioning.  A small corpus in one parquet row group therefore
    processes on ONE core while the cluster idles (measured 40+ s of
    serial hashing at sf0.1 in ``duplicate_spans``).  When the input
    has fewer than half the session's shuffle partitions, one row-level
    round-robin repartition buys full-width execution; at real scale
    the input already arrives in thousands of splits and this is a
    no-op, so the 100 TB path never pays the extra shuffle.
    """
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df
