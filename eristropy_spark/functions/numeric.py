"""Portable numeric helpers shared by operators and the driver contract."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["round6"]


def round6(c: Column) -> Column:
    """Engine-portable 6-dp rounding: floor(x*1e6 + 0.5)/1e6.

    Spark's ``round()`` rounds the exact decimal expansion (HALF_UP via
    BigDecimal) while DuckDB rounds in float space; they disagree on
    decimal-half boundaries, which makes cross-engine value comparisons
    flaky.  This explicit float expression is bit-deterministic on both
    engines.

    NaN/NULL are passed through explicitly: Spark's ``floor(double)``
    returns BIGINT and maps NaN to 0, which would silently turn NaN into
    0.0 while DuckDB's floor(NaN) stays NaN — the ``when`` guard keeps
    the two engines' NaN behavior identical.
    """
    d = c.cast("double")
    return F.when(F.isnan(d) | d.isNull(), d).otherwise(
        F.floor(d * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    )
