"""Input validation for token tables and long signal tables.

Re-expresses ``_validate_dataframe`` (reference: eristropy/validation.py:5-55)
for both layouts:

* ``validate_long_df`` — the reference's exact contract on an exploded
  (signal_id, timestamp, value) DataFrame: required columns present,
  no datetime/boolean/complex dtypes, timestamp+value castable to
  numeric, no NaN/inf/null, >= 1 signal.  Schema checks are metadata
  only; the data checks run as ONE aggregate action (no collect of
  rows).
* ``validate_tokens_df`` — the engine's canonical array layout:
  required columns, array element type, no null/empty/NaN-bearing
  token arrays, n_tok consistency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, TimestampType

__all__ = ["validate_long_df", "validate_tokens_df"]


def _field(df: DataFrame, name: str):
    try:
        return df.schema[name]
    except KeyError:
        return None


def validate_long_df(
    df: DataFrame,
    signal_id: str = "signal_id",
    timestamp: str = "timestamp",
    value_col: str = "value",
) -> None:
    required = [signal_id, timestamp, value_col]
    missing = [c for c in required if _field(df, c) is None]
    if missing:
        raise ValueError(f"Missing required columns: {set(missing)}")

    for c in required:
        dtype = df.schema[c].dataType
        if isinstance(dtype, (TimestampType, BooleanType)):
            # the reference rejects datetime/boolean payloads outright
            # (validation.py:28-37); complex types don't exist in Spark
            raise ValueError(
                "Input DataFrame contains timestamp or boolean data in "
                f"column '{c}'"
            )

    ts = F.col(timestamp).cast("double")
    val = F.col(value_col).cast("double")
    bad = (
        ts.isNull()
        | val.isNull()
        | F.isnan(ts)
        | F.isnan(val)
        | (F.abs(ts) == float("inf"))
        | (F.abs(val) == float("inf"))
    )
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(bad.cast("long")).alias("n_bad"),
        F.countDistinct(signal_id).alias("n_signals"),
    ).collect()[0]
    if row["n"] == 0:
        raise ValueError("Input DataFrame is empty")
    if row["n_bad"]:
        raise ValueError(
            "Input DataFrame contains NaN or inf values or non-numeric data "
            f"({row['n_bad']} offending rows)."
        )
    if row["n_signals"] == 0:
        raise ValueError("No unique signal IDs")


def validate_tokens_df(df: DataFrame, min_len: int = 1) -> None:
    for c in ("doc_id", "tokens", "n_tok", "source"):
        if _field(df, c) is None:
            raise ValueError(f"Missing required column: {c}")
    if not isinstance(df.schema["tokens"].dataType, ArrayType):
        raise ValueError("'tokens' must be an array column")

    bad_len = F.col("tokens").isNull() | (F.size("tokens") < min_len)
    bad_n = F.size("tokens") != F.col("n_tok")
    has_nan = F.exists(
        F.col("tokens").cast("array<double>"),
        lambda x: x.isNull() | F.isnan(x),
    )
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(bad_len.cast("long")).alias("n_bad_len"),
        F.sum(bad_n.cast("long")).alias("n_bad_ntok"),
        F.sum(has_nan.cast("long")).alias("n_nan"),
    ).collect()[0]
    if row["n"] == 0:
        raise ValueError("Token table is empty")
    if row["n_bad_len"]:
        raise ValueError(f"{row['n_bad_len']} sequences shorter than {min_len} or null")
    if row["n_bad_ntok"]:
        raise ValueError(f"{row['n_bad_ntok']} rows where n_tok != size(tokens)")
    if row["n_nan"]:
        raise ValueError(f"{row['n_nan']} sequences contain null/NaN tokens")
