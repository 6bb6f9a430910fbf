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


def test_iceberg_probe_result_documented(spark):
    """The sandbox probe: no Iceberg Spark runtime jar is on the
    classpath (none under the pyspark jars dir, no network to fetch
    one), so iceberg_available must be False here and the adapter must
    run the parquet+manifest fallback.  On a cluster with the runtime
    jar this same probe flips the adapter to the Iceberg branch, which
    the recording-stub test below exercises."""
    import glob
    import os

    import pyspark

    jars = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*")
    )
    assert jars == []
    assert iceberg_available(spark) is False


class _RecordingWriter:
    def __init__(self, log, table):
        self.log, self.table = log, table

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", self.table, len(cols)))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.table))

    def append(self):
        self.log.append(("append", self.table))


class _RecordingDF:
    def __init__(self, log):
        self.log = log

    def writeTo(self, table):
        self.log.append(("writeTo", table))
        return _RecordingWriter(self.log, table)


class _SnapshotRow(list):
    pass


class _RecordingSpark:
    def __init__(self, log):
        self.log = log

    def sql(self, q):
        self.log.append(("sql", q))

        class _Res:
            @staticmethod
            def collect():
                return [[4242]]

        return _Res()

    def read(self):  # pragma: no cover - not used by the branch
        raise AssertionError


def test_catalog_iceberg_branch_via_stub(spark, tmp_path):
    """Exercise the Iceberg write/snapshot branch without the jar: a
    recording stub stands in for the Spark/DataFrame objects and the
    calls the branch would make (writeTo → createOrReplace/append,
    snapshots query, bucket partition transform) are asserted."""
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    log = []
    cat.use_iceberg = True
    cat.spark = _RecordingSpark(log)

    snap = cat.write_table(_RecordingDF(log), "ice.db.t", mode="overwrite")
    assert snap == 4242
    assert ("writeTo", "ice.db.t") in log
    assert ("createOrReplace", "ice.db.t") in log
    assert any(op == "sql" and "ice.db.t.snapshots" in q for op, q in log
               if op == "sql")

    log.clear()
    cat.write_table(_RecordingDF(log), "ice.db.t", mode="append")
    assert ("append", "ice.db.t") in log
    assert ("createOrReplace", "ice.db.t") not in log

    assert cat.snapshot_id("ice.db.t") == 4242

    log.clear()
    name = cat.write_bucketed(_RecordingDF(log), "ice.db.b", key="k", buckets=8)
    assert name == "ice.db.b"
    assert ("writeTo", "ice.db.b") in log
    assert ("partitionedBy", "ice.db.b", 1) in log  # bucket transform
    assert ("createOrReplace", "ice.db.b") in log
