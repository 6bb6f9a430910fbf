"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check (sf0.001).
``queries()`` / ``oracle_sql()`` — operator inventory checked against a
DuckDB oracle at sf0.01 (row count + schema + order-insensitive value
hash).  Column names/aliases are kept identical on both sides; computed
doubles are rounded to 6 dp on both sides to make the value hash stable
across independently-derived float pipelines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eristropy_spark.operators.entropy import compute_entropy
from eristropy_spark.sources.tokens import events_to_tokens


def _nan_avg(col: str):
    """avg skipping NaN (Spark's avg skips NULL but propagates NaN)."""
    c = F.col(col)
    return F.avg(F.when(~F.isnan(c), c))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokenize events → z-norm → SampEn+PermEn → per-source rollup."""
    tokens = events_to_tokens(spark, "/root/testdata/sf0.001")
    ent = compute_entropy(tokens, m=1, r=0.2, normalize=True)
    return (
        ent.groupBy("source")
        .agg(
            F.count("*").alias("n_seq"),
            F.round(_nan_avg("sampen"), 6).alias("avg_sampen"),
            F.round(_nan_avg("permen"), 6).alias("avg_permen"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# queries + oracles — one entry per implemented operator (SURVEY.md §2)
# --------------------------------------------------------------------------


def _q_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S5 + O1/O2: token-table construction summary (arrays checksummed)."""
    t = events_to_tokens(spark, sf_dir)
    return t.select(
        "doc_id",
        "source",
        "n_tok",
        F.aggregate("tokens", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "tok_sum"
        ),
        F.element_at("tokens", 1).cast("long").alias("tok_first"),
        F.element_at("tokens", -1).cast("long").alias("tok_last"),
    )


_ORACLE_TOKENIZE = """
SELECT user_id || ':' || event_type AS doc_id,
       event_type AS source,
       CAST(count(*) AS INT) AS n_tok,
       CAST(sum(CAST(round(value * 100) AS INT)) AS BIGINT) AS tok_sum,
       CAST(first(CAST(round(value * 100) AS INT) ORDER BY ts, event_id) AS BIGINT) AS tok_first,
       CAST(last(CAST(round(value * 100) AS INT) ORDER BY ts, event_id) AS BIGINT) AS tok_last
FROM events
GROUP BY user_id, event_type
"""


def _q_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: per-signal first difference (exploded long layout, lag window)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev", F.lag("value").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            F.concat_ws(":", "user_id", "event_type").alias("doc_id"),
            F.col("event_id").cast("long").alias("event_id"),
            F.round(F.col("value") - F.col("prev"), 6).alias("dvalue"),
        )
    )


_ORACLE_DIFFERENCE = """
SELECT user_id || ':' || event_type AS doc_id,
       event_id,
       round(value - prev, 6) AS dvalue
FROM (
  SELECT user_id, event_type, event_id, value,
         lag(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev
  FROM events
)
WHERE prev IS NOT NULL
"""


def _q_rollup_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule rollup tier: per (source, 1-min bucket) aggregates."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.col("event_type").alias("source"),
            F.date_trunc("minute", "ts").alias("bucket"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


_ORACLE_ROLLUP_MINUTE = """
SELECT event_type AS source,
       date_trunc('minute', ts) AS bucket,
       count(*) AS n,
       round(sum(value), 6) AS sum_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events
GROUP BY 1, 2
"""


def _q_sampen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E16: per-sequence SampEn + PermEn (no SQL oracle — rows-only check;
    numeric parity is pinned by tests/test_kernels.py golden tests)."""
    tokens = events_to_tokens(spark, sf_dir)
    ent = compute_entropy(tokens, m=1, r=0.2, normalize=True)
    return ent.select(
        "doc_id",
        "source",
        F.round("sampen", 6).alias("sampen"),
        F.round("permen", 6).alias("permen"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tokenize": _q_tokenize,
        "difference": _q_difference,
        "rollup_minute": _q_rollup_minute,
        "sampen_permen": _q_sampen,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tokenize": _ORACLE_TOKENIZE,
        "difference": _ORACLE_DIFFERENCE,
        "rollup_minute": _ORACLE_ROLLUP_MINUTE,
    }
