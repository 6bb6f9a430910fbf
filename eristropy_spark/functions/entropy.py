"""Arrow-vectorized entropy UDFs over `tokens: array<int32>` columns.

This is the engine's single JVM→Python boundary for entropy analytics.
Each UDF is a scalar ``pandas_udf``: one input row = one whole sequence
(the array layout means a "group" is already colocated in a row —
**zero shuffle**, unlike a groupBy+applyInPandas formulation of the
reference's ``df.groupby(signal_id)`` loops, e.g.
sample_entropy.py:120, stationarity.py:150).

Parameters (m, r, p, …) are passed as literal columns so one compiled
UDF body serves every (m, r) trial of the optimizer — the plan stays
cacheable and the Python workers stay warm.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from eristropy_spark.kernels import adf as adf_kernel
from eristropy_spark.kernels.permen import permen as permen_kernel
from eristropy_spark.kernels.rng import sequence_rng
from eristropy_spark.kernels.sampen import bootstrap_mse, sampen, sampen_se
from eristropy_spark.kernels.transforms import znorm

__all__ = [
    "sampen_udf",
    "permen_udf",
    "sampen_se_udf",
    "bootstrap_mse_udf",
    "adf_pvalue_udf",
]


def _as_f8(arr) -> np.ndarray:
    return np.asarray(arr, dtype=np.float64)


@F.pandas_udf(DoubleType())
def sampen_udf(
    tokens: pd.Series, m: pd.Series, r: pd.Series, normalize: pd.Series
) -> pd.Series:
    """SampEn(tokens; m, r) per row (kernel parity: utils.py:144-193).

    ``normalize=True`` z-normalizes (ddof=1) inside the kernel — in
    NumPy this is ~1000x cheaper than doing it with Catalyst
    higher-order array expressions, and bit-identical to the
    reference's normalize-then-SampEn pipeline.
    """
    out = np.empty(len(tokens), dtype=np.float64)
    m_v, r_v, nz = m.to_numpy(), r.to_numpy(), normalize.to_numpy()
    for i, seq in enumerate(tokens):
        if seq is None:
            out[i] = np.nan
            continue
        x = _as_f8(seq)
        if nz[i]:
            x = znorm(x)
        out[i] = sampen(x, int(m_v[i]), float(r_v[i]))
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def permen_udf(tokens: pd.Series, m: pd.Series, delay: pd.Series) -> pd.Series:
    """Bandt–Pompe permutation entropy per row (normalized to [0,1])."""
    out = np.empty(len(tokens), dtype=np.float64)
    m_v, d_v = m.to_numpy(), delay.to_numpy()
    for i, seq in enumerate(tokens):
        out[i] = (
            np.nan
            if seq is None
            else permen_kernel(_as_f8(seq), int(m_v[i]), int(d_v[i]), normalize=True)
        )
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def sampen_se_udf(
    doc_id: pd.Series,
    tokens: pd.Series,
    m: pd.Series,
    r: pd.Series,
    p: pd.Series,
    n_boot: pd.Series,
    seed: pd.Series,
) -> pd.Series:
    """Bootstrap SE(SampEn) per row (sample_entropy.py:232-248).

    RNG is derived from (seed, doc_id) so the result is independent of
    partitioning (SURVEY.md §7.3 hazard 6).
    """
    out = np.empty(len(tokens), dtype=np.float64)
    for i in range(len(tokens)):
        seq = tokens.iloc[i]
        if seq is None:
            out[i] = np.nan
            continue
        rng = sequence_rng(int(seed.iloc[i]), str(doc_id.iloc[i]))
        out[i] = sampen_se(
            _as_f8(seq),
            int(m.iloc[i]),
            float(r.iloc[i]),
            float(p.iloc[i]),
            int(n_boot.iloc[i]),
            rng,
        )
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def bootstrap_mse_udf(
    doc_id: pd.Series,
    tokens: pd.Series,
    m: pd.Series,
    r: pd.Series,
    p: pd.Series,
    n_boot: pd.Series,
    seed: pd.Series,
) -> pd.Series:
    """Bootstrap SampEn MSE per row (sample_entropy.py:205-230)."""
    out = np.empty(len(tokens), dtype=np.float64)
    for i in range(len(tokens)):
        seq = tokens.iloc[i]
        if seq is None:
            out[i] = np.nan
            continue
        rng = sequence_rng(int(seed.iloc[i]), str(doc_id.iloc[i]))
        out[i] = bootstrap_mse(
            _as_f8(seq),
            int(m.iloc[i]),
            float(r.iloc[i]),
            float(p.iloc[i]),
            int(n_boot.iloc[i]),
            rng,
        )
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def adf_pvalue_udf(tokens: pd.Series) -> pd.Series:
    """ADF p-value per sequence; estimation failure maps to p=1.0
    exactly like the reference (stationarity.py:158-163)."""
    out = np.empty(len(tokens), dtype=np.float64)
    for i, seq in enumerate(tokens):
        if seq is None:
            out[i] = 1.0
            continue
        try:
            out[i] = adf_kernel.adfuller(_as_f8(seq))[1]
        except (ValueError, np.linalg.LinAlgError):
            out[i] = 1.0
    return pd.Series(out)
