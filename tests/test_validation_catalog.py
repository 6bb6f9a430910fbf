"""Validation operator + catalog adapter tests (S2 + hazard 10)."""

import numpy as np
import pytest
from pyspark.sql import Row

from eristropy_spark.operators.validation import validate_long_df, validate_tokens_df
from eristropy_spark.sources.catalog import TableCatalog, iceberg_available


def _long_df(spark, **overrides):
    rows = [
        Row(signal_id="a", timestamp=float(i), value=float(i) * 0.5) for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    return df


def test_validate_long_ok(spark):
    validate_long_df(_long_df(spark))  # no raise


def test_validate_long_missing_column(spark):
    df = _long_df(spark).drop("value")
    with pytest.raises(ValueError, match="Missing required columns"):
        validate_long_df(df)


def test_validate_long_rejects_nan(spark):
    df = spark.createDataFrame(
        [Row(signal_id="a", timestamp=0.0, value=float("nan"))]
    )
    with pytest.raises(ValueError, match="NaN or inf"):
        validate_long_df(df)


def test_validate_long_rejects_inf(spark):
    df = spark.createDataFrame(
        [Row(signal_id="a", timestamp=0.0, value=float("inf"))]
    )
    with pytest.raises(ValueError, match="NaN or inf"):
        validate_long_df(df)


def test_validate_long_rejects_datetime(spark):
    # validation.py:28-37 — datetime timestamps are rejected, not coerced
    import datetime as dt

    df = spark.createDataFrame(
        [Row(signal_id="a", timestamp=dt.datetime(2024, 1, 1), value=1.0)]
    )
    with pytest.raises(ValueError, match="timestamp or boolean"):
        validate_long_df(df)


def test_validate_long_rejects_boolean(spark):
    df = spark.createDataFrame([Row(signal_id="a", timestamp=1.0, value=True)])
    with pytest.raises(ValueError, match="timestamp or boolean"):
        validate_long_df(df)


def test_validate_long_empty(spark):
    df = _long_df(spark).where("timestamp < -1")
    with pytest.raises(ValueError, match="empty"):
        validate_long_df(df)


def test_validate_tokens_ok(spark):
    df = spark.createDataFrame(
        [Row(doc_id="d", tokens=[1.0, 2.0, 3.0], n_tok=3, source="s")]
    )
    validate_tokens_df(df)


def test_validate_tokens_ntok_mismatch(spark):
    df = spark.createDataFrame(
        [Row(doc_id="d", tokens=[1.0, 2.0], n_tok=5, source="s")]
    )
    with pytest.raises(ValueError, match="n_tok"):
        validate_tokens_df(df)


def test_validate_tokens_nan(spark):
    df = spark.createDataFrame(
        [Row(doc_id="d", tokens=[1.0, float("nan")], n_tok=2, source="s")]
    )
    with pytest.raises(ValueError, match="NaN"):
        validate_tokens_df(df)


# ------------------------------------------------------------- catalog


def test_catalog_parquet_fallback(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    # no Iceberg runtime in this sandbox — adapter must fall back
    assert cat.use_iceberg == iceberg_available(spark)

    df = spark.range(50).withColumnRenamed("id", "x")
    v1 = cat.write_table(df, "db.tbl")
    assert cat.read_table("db.tbl").count() == 50
    assert cat.snapshot_id("db.tbl") == v1

    v2 = cat.write_table(df.where("x < 10"), "db.tbl")
    assert v2 > v1  # snapshot/version advanced
    assert cat.read_table("db.tbl").count() == 10
