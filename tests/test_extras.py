"""SampEnEfficiency (Lake et al. r-selection) tests.

The reference ships no tests for extras.py, so these pin our own
contract: CP cross-checks against the SampEn kernel, objective
properties, and the grid/interp/argmin selection logic.
"""

import math

import numpy as np
import pytest
from pyspark.sql import Row

from eristropy_spark.functions.efficiency import bootstrap_obj, counting_obj
from eristropy_spark.kernels.lake import cp_mean_sd
from eristropy_spark.kernels.rng import sequence_rng
from eristropy_spark.kernels.sampen import sampen
from eristropy_spark.operators.extras import SampEnEfficiencyOp


def test_cp_matches_sampen():
    # -log(CP) must equal SampEn exactly (same A/B counts)
    rng = np.random.default_rng(17)
    for n in (80, 150):
        for m in (1, 2):
            x = rng.normal(size=n)
            cp, sd = cp_mean_sd(x, m, 0.25)
            s = sampen(x, m, 0.25)
            assert sd > 0
            np.testing.assert_allclose(-math.log(cp), s, rtol=0, atol=1e-12)


def test_counting_obj_properties():
    rng = np.random.default_rng(3)
    x = rng.normal(size=150)
    # objective finite and positive for reasonable r
    v = counting_obj(x, 1, 0.2)
    assert v > 0 and np.isfinite(v)
    # no matches at tiny r for spread-out data => nan (ZeroDivision path)
    assert math.isnan(counting_obj(np.arange(50.0), 1, 1e-12))


def test_bootstrap_obj_positive():
    rng_data = np.random.default_rng(3)
    x = rng_data.normal(size=120)
    v = bootstrap_obj(x, 1, 0.25, 0.5, 30, sequence_rng(7, "d"))
    assert v > 0


def test_efficiency_op_end_to_end(spark):
    rng = np.random.default_rng(17)
    rows = [
        Row(
            doc_id=f"s{i}",
            tokens=[float(v) for v in rng.normal(size=100)],
            n_tok=100,
            source="a",
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(rows)
    op = SampEnEfficiencyOp(df, m=1, r_range=(0.1, 0.5), random_seed=11)
    rstar = op.find_rstar()
    assert 0.1 <= rstar <= 0.5
    out = op.compute_all_sampen().collect()
    assert len(out) == 4
    for r in out:
        assert r["sampen"] > 0 and r["se_sampen"] > 0


class _FakeDF:  # minimal stand-in: the constructor never touches df
    pass


def test_efficiency_op_grid_matches_reference_shape():
    # grid construction parity with extras.py:35-42
    op = SampEnEfficiencyOp(_FakeDF(), m=1, r_range=(0.1, 0.5))
    np.testing.assert_allclose(op.rs, np.arange(0.1, 0.5 + 0.01, 0.05))
    np.testing.assert_allclose(op._pts, np.arange(0.1, 0.5 + 0.01, 0.01))


def test_efficiency_op_validates_objective():
    with pytest.raises(ValueError):
        SampEnEfficiencyOp(_FakeDF(), m=1, r_range=(0.1, 0.5), objective="zzz")


def test_release_leaves_no_cached_rdds(spark):
    """Full pipeline consumption + release() -> empty block manager
    (round-2 hygiene gap: the internal persists were never released)."""
    from pyspark.sql import functions as F

    from eristropy_spark.operators.stationarity import make_stationary
    from eristropy_spark.sources.tokens import synthesize_tokens

    from eristropy_spark.functions.arrays import znormed

    spark.catalog.clearCache()
    tokens = znormed(
        synthesize_tokens(spark, 40, seed=3, min_len=32, max_len=64), "tokens"
    )

    op = SampEnEfficiencyOp(tokens, m=1, r_range=(0.1, 0.5), r_step_size=0.1)
    out = op.compute_all_sampen()
    out.select(F.count("*")).collect()  # consume

    res = make_stationary(tokens, method="difference")
    res.df.select(F.count("*")).collect()  # consume
    _ = res.stationary_frac

    # delta-based: other tests in the session may hold localCheckpoint
    # blocks (released by GC, not clearCache), so assert THESE two ops'
    # caches appear and then disappear
    jsc = spark.sparkContext._jsc
    import gc

    gc.collect()
    live = jsc.getPersistentRDDs().size()
    assert live >= 2  # both internal caches among the live blocks

    op.release()
    res.release()
    assert jsc.getPersistentRDDs().size() == live - 2
    # results stay consumable (lineage recompute), release is idempotent
    assert out.count() > 0
    op.release()
    res.release()
