"""Arrow UDFs for per-sequence stationarity transforms over token arrays.

JVM-side equivalents exist for difference/z-norm
(``eristropy_spark.functions.arrays``) and are preferred at scale; the
UDF variants here exist for bit-parity with the reference kernels
(np.diff / np.linalg.lstsq residuals / GP posterior residuals) and are
equivalence-tested against the JVM path in tests/test_spark_pipeline.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from eristropy_spark.kernels.gp import detrend_gp
from eristropy_spark.kernels.transforms import detrend_linreg, difference, znorm

__all__ = ["difference_udf", "detrend_linreg_udf", "make_detrend_gp_udf", "znorm_udf"]

_ARR = ArrayType(DoubleType())


def _map_arrays(tokens: pd.Series, fn) -> pd.Series:
    out = []
    for seq in tokens:
        if seq is None:
            out.append(None)
            continue
        x = np.asarray(seq, dtype=np.float64)
        try:
            out.append(fn(x))
        except ValueError:
            out.append(None)
    return pd.Series(out)


@F.pandas_udf(_ARR)
def difference_udf(tokens: pd.Series) -> pd.Series:
    """np.diff per sequence (difference.py:5-26); None for n < 2."""
    return _map_arrays(tokens, difference)


@F.pandas_udf(_ARR)
def detrend_linreg_udf(tokens: pd.Series) -> pd.Series:
    """OLS residuals on positions 0..n-1 (linreg.py:6-35).

    The reference regresses on actual timestamps; in the array layout
    position == timestamp (BASELINE.json input_hint, SURVEY.md §1.3).
    """
    return _map_arrays(
        tokens, lambda x: detrend_linreg(np.arange(x.size, dtype=np.float64), x)
    )


@F.pandas_udf(_ARR)
def znorm_udf(tokens: pd.Series) -> pd.Series:
    """Per-sequence z-normalization, ddof=1 (stationarity.py:279-281)."""
    return _map_arrays(tokens, znorm)


def make_detrend_gp_udf(ls_vals: np.ndarray, n_splits: int = 5, eps: float = 1e-6):
    """GP-detrend UDF with the candidate length-scales baked in.

    Mirrors the reference's topology: ls candidates are drawn ONCE on
    the driver (gp.py:526) and shared by every sequence; here they are
    closure-captured, so they ship to executors in the serialized UDF
    (the Spark analogue of a broadcast for this tiny array).
    """
    ls_vals = np.asarray(ls_vals, dtype=np.float64)

    @F.pandas_udf(_ARR)
    def detrend_gp_udf(tokens: pd.Series) -> pd.Series:
        return _map_arrays(
            tokens, lambda x: detrend_gp(x, ls_vals, n_splits=n_splits, eps=eps)
        )

    return detrend_gp_udf
