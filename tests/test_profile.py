"""Column-profiling census (operators/profile.profile_columns).

Pins the per-column statistics against independent local
recomputation, the null-handling contract (n_nonnull/n_distinct
ignore nulls; min/max skip them), the exact-vs-approx dispatch, and
the single-pass plan shape (exactly one aggregate over the input, no
join in the unpivot).
"""

import pytest
from pyspark.sql import functions as F

from eristropy_spark.operators.profile import profile_columns


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "alpha", 10.0),
        (2, "beta", None),
        (3, None, 30.0),
        (4, "beta", 30.0),
        (5, "gamma", -1.5),
    ]
    return spark.createDataFrame(rows, "id long, name string, score double")


def _as_map(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_profile_values_exact(tiny):
    out = _as_map(profile_columns(tiny, ["id", "name", "score"]))
    assert set(out) == {"id", "name", "score"}
    for c in out.values():
        assert c["n_rows"] == 5

    assert out["id"] == {
        "column": "id", "n_rows": 5, "n_nonnull": 5, "n_distinct": 5,
        "min_str": "1", "max_str": "5",
    }
    # nulls excluded from n_nonnull / n_distinct / min / max
    assert out["name"]["n_nonnull"] == 4
    assert out["name"]["n_distinct"] == 3
    assert out["name"]["min_str"] == "alpha"
    assert out["name"]["max_str"] == "gamma"
    # numeric min/max computed on the native type, not the string cast:
    # -1.5 < 10.0 numerically but "-1.5" > "10.0" lexicographically
    assert out["score"]["min_str"] == "-1.5"
    assert out["score"]["max_str"] == "30.0"
    assert out["score"]["n_distinct"] == 3


def test_profile_default_all_columns(tiny):
    out = profile_columns(tiny)
    assert sorted(r["column"] for r in out.collect()) == [
        "id", "name", "score",
    ]


def test_profile_approx_matches_exact_at_small_cardinality(tiny):
    # HLL++ at rsd 1.6% is exact for tiny cardinalities, so the approx
    # path must agree with the exact one here (value-level dispatch pin)
    exact = _as_map(profile_columns(tiny, ["id", "name"], exact=True))
    approx = _as_map(profile_columns(tiny, ["id", "name"], exact=False))
    assert exact == approx


def test_profile_errors(tiny):
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_columns(tiny, ["nope"])
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(tiny, [])


def test_profile_single_pass_plan(tiny):
    # one aggregate pass: the physical plan must contain no Join and
    # (on the approx path) no Expand from multi-distinct rewriting
    plan = profile_columns(
        tiny, ["id", "name"], exact=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Expand" not in plan


def test_profile_partition_invariance(tiny):
    one = _as_map(profile_columns(tiny.coalesce(1)))
    many = _as_map(profile_columns(tiny.repartition(7)))
    assert one == many
