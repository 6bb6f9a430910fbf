"""Shared helper for grouped-Pandas sequential-scan stages.

AQE's size-based shuffle coalescing sees a grouped-Pandas input of a
few MB and folds it to 1-2 partitions — the right call for byte-bound
JVM aggregates, the wrong one for Python-compute-bound per-group
recursions, where wall-clock is group count / cores, not bytes
(measured at sf0.1: the croston stage ran 2 tasks on 32 cores — 10x
the wall of the same work spread across the cluster).

``keyed_parallel`` hash-partitions on the grouping key with an
EXPLICIT numPartitions: a user-specified REPARTITION_BY_NUM is exempt
from AQE coalescing, and because it already satisfies the downstream
``groupBy(...).applyInPandas`` clustering requirement the plan keeps
exactly ONE Exchange (plan-audited).  Per-group results are
independent of partitioning, so outputs are bit-identical (the
partition-invariance tests pin this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["keyed_parallel"]


def keyed_parallel(df: DataFrame, keys) -> DataFrame:
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(k) for k in keys])
