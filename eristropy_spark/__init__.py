"""eristropy_spark — a from-scratch PySpark-native entropy-rollup engine.

Re-expresses the query/data-processing capabilities of the reference
library ``zblanks/eristropy`` (single-machine pandas + Numba; see
/root/reference) as an idiomatic Spark engine:

* pure-NumPy kernels (``eristropy_spark.kernels``) — Spark-free, unit
  testable against the reference's pytest suite semantics,
* Arrow-vectorized pandas UDFs (``eristropy_spark.functions``) — the
  only Python/JVM boundary, batched via Arrow,
* DataFrame-level operators (``eristropy_spark.operators``) —
  stationarity pipeline, SampEn/PermEn analytics, retention-cascade
  rollups, gap-fill, dedup/similarity/text ops,
* sources/sinks (``eristropy_spark.sources``) — token-table loaders &
  deterministic synthesizer, Iceberg-or-parquet catalog adapter,
* driver-side planning (``eristropy_spark.plans``) — parameter search,
  skew salting policy, checkpoint manifest, metrics.
"""

__version__ = "0.1.0"
