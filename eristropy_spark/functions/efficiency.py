"""Arrow UDFs for the SampEn-efficiency r-selection (reference extras.py).

One UDF evaluates the per-(sequence, r) efficiency objective so the
r-grid can be exploded into rows and aggregated with a median — the
Spark plan is ``tokens × explode(r_grid) → eff_udf → groupBy(r).median``
(SURVEY.md §3.3) instead of the reference's quadratic re-filtering loop
(extras.py:232-236, hazard 8).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

_SAMPEN_SE_STRUCT = StructType(
    [StructField("sampen", DoubleType()), StructField("se_sampen", DoubleType())]
)

from eristropy_spark.kernels.lake import cp_mean_sd
from eristropy_spark.kernels.rng import sequence_rng
from eristropy_spark.kernels.sampen import sampen, sampen_se

__all__ = ["counting_obj", "bootstrap_obj", "efficiency_udf", "cp_sampen_se_udf"]


def counting_obj(x: np.ndarray, m: int, r: float) -> float:
    """max(s/cp, (s/cp)/SampEn) from the Lake analytic CP (extras.py:193-208)."""
    try:
        cp, s_cp = cp_mean_sd(x, m, r)
        a = s_cp / cp
    except (ZeroDivisionError, ValueError):
        return float("nan")
    if cp == 1.0:
        return max(a, 0.0)
    return max(a, a / (-math.log(cp)))


def bootstrap_obj(
    x: np.ndarray, m: int, r: float, p: float, n_boot: int, rng
) -> float:
    """max(se, se/sampen) from the stationary bootstrap (extras.py:210-219)."""
    se = sampen_se(x, m, r, p, n_boot, rng)
    s = sampen(x, m, r)
    return max(se, se / s)


@F.pandas_udf(DoubleType())
def efficiency_udf(
    doc_id: pd.Series,
    tokens: pd.Series,
    r: pd.Series,
    m: pd.Series,
    use_bootstrap: pd.Series,
    p: pd.Series,
    n_boot: pd.Series,
    seed: pd.Series,
) -> pd.Series:
    out = np.full(len(tokens), np.nan, dtype=np.float64)
    for i in range(len(tokens)):
        seq = tokens.iloc[i]
        if seq is None:
            continue
        x = np.asarray(seq, dtype=np.float64)
        ri, mi = float(r.iloc[i]), int(m.iloc[i])
        if bool(use_bootstrap.iloc[i]):
            # RNG keyed by (seed, doc_id, r) so every grid cell draws an
            # independent, partition-order-free stream
            rng = sequence_rng(int(seed.iloc[i]), f"{doc_id.iloc[i]}|r={ri}")
            out[i] = bootstrap_obj(
                x, mi, ri, float(p.iloc[i]), int(n_boot.iloc[i]), rng
            )
        else:
            out[i] = counting_obj(x, mi, ri)
    return pd.Series(out)


@F.pandas_udf(_SAMPEN_SE_STRUCT)
def cp_sampen_se_udf(tokens: pd.Series, r: pd.Series, m: pd.Series) -> pd.DataFrame:
    """(-log cp, s/cp) at the selected r (extras.py:244-248)."""
    s_out = np.full(len(tokens), np.nan, dtype=np.float64)
    se_out = np.full(len(tokens), np.nan, dtype=np.float64)
    for i in range(len(tokens)):
        seq = tokens.iloc[i]
        if seq is None:
            continue
        x = np.asarray(seq, dtype=np.float64)
        try:
            cp, s_cp = cp_mean_sd(x, int(m.iloc[i]), float(r.iloc[i]))
            s_out[i] = -math.log(cp)
            se_out[i] = s_cp / cp
        except (ZeroDivisionError, ValueError):
            pass
    return pd.DataFrame({"sampen": s_out, "se_sampen": se_out})
