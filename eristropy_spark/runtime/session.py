"""SparkSession factory with engine defaults tuned for the workload.

Settings rationale (100 TB target, tested on local[N]):

* AQE on — runtime coalescing + skew-join splitting for the rollup
  shuffles.
* Arrow enabled with a bounded batch size — token arrays make rows
  wide, so cap records per batch to keep Python-worker memory flat
  (SURVEY.md §7.3 hazard 9).
* shuffle.partitions default 32 locally; on a real cluster this is
  overridden by AQE coalescing from a higher initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "default_parallelism"]


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "eristropy-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        # non-ANSI: double/0 yields NULL (like the DuckDB 1.0 oracle and
        # the reference's NumPy NaN semantics) instead of throwing
        # DIVIDE_BY_ZERO on degenerate-but-valid groups (constant signal →
        # stddev 0, single-event signal → var_pop 0, zero embedding → norm 0)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # split input files so a scan task's rows (plus its Arrow batch
        # and Python-worker copies) stay well inside executor memory even
        # for token-array rows; at 100 TB this also sets the scan-stage
        # task count to data/64MB, independent of file layout
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
