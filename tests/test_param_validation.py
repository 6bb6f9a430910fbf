"""Parameter-validation battery for SampleEntropyOp, ported from the
reference's tests/test_sample_entropy.py:27-195 (S4 coverage)."""

import warnings

import numpy as np
import pytest
from pyspark.sql import Row

from eristropy_spark.operators.sample_entropy import (
    SampEnSettingWarning,
    SampleEntropyOp,
)


@pytest.fixture(scope="module")
def tokens_df(spark):
    rng = np.random.default_rng(17)
    rows = [
        Row(doc_id=f"s{i}", tokens=[float(v) for v in rng.normal(size=50)],
            n_tok=50, source="a")
        for i in range(2)
    ]
    return spark.createDataFrame(rows)


def test_check_ranges(spark, tokens_df):
    # reference tests/test_sample_entropy.py:27-49
    for kwargs in (
        {"r_range": (0.50, 0.10)},
        {"r_range": (-0.10, 0.50)},
        {"m_range": (3, 1)},
        {"m_range": (1.5, 3)},
        {"m_range": (1, 3.5)},
        {"p_range": (0.99, 0.01)},
        {"p_range": (-0.01, 0.99)},
        {"p_range": (0.01, 1.1)},
    ):
        with pytest.raises(ValueError):
            SampleEntropyOp(tokens_df, **kwargs)


def test_check_fixed_values(spark, tokens_df):
    # reference :52-79
    for kwargs in (
        {"m": -1}, {"m": 0}, {"m": 1.5},
        {"r": -0.1}, {"r": 0},
        {"p": -0.1}, {"p": 1.1}, {"p": 1}, {"p": 0},
        {"lam": -0.1},
    ):
        with pytest.raises(ValueError):
            SampleEntropyOp(tokens_df, **kwargs)


def test_check_positive_integer(spark, tokens_df):
    # reference :82-103
    for kwargs in (
        {"n_boot": -1}, {"n_boot": 0}, {"n_boot": 1.5},
        {"n_trials": -1}, {"n_trials": 0}, {"n_trials": 1.5},
        {"random_seed": -1}, {"random_seed": 1.5},
    ):
        with pytest.raises(ValueError):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                SampleEntropyOp(tokens_df, **kwargs)


def test_boundary_warnings(spark, tokens_df):
    # reference :178-195 — boundary r/p and low n_boot/n_trials warn
    with pytest.warns(SampEnSettingWarning):
        SampleEntropyOp(tokens_df, r=0.10)  # at r_range boundary
    with pytest.warns(SampEnSettingWarning):
        SampleEntropyOp(tokens_df, p=0.01)  # at p_range boundary
    with pytest.warns(SampEnSettingWarning):
        SampleEntropyOp(tokens_df, n_boot=10)
    with pytest.warns(SampEnSettingWarning):
        SampleEntropyOp(tokens_df, n_boot=100, n_trials=5)


def test_default_values(spark, tokens_df):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        op = SampleEntropyOp(tokens_df)
    assert op.objective == "mse"
    assert op.n_boot == 100 and op.n_trials == 100
    assert op.r_range == (0.10, 0.50)
    assert op.m_range == (1, 3)
    assert op.p_range == (0.01, 0.99)
    assert op.lam == 0.33
    assert op.m_star_ is None and op.r_star_ is None and op.p_star_ is None
