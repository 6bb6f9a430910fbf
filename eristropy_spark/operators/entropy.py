"""Per-sequence entropy operator — the engine's flagship analytic.

Reference parity: the final pass of
``SampleEntropy.compute_all_sampen`` (sample_entropy.py:346-402) —
one output row per signal with ``sampen`` (and optionally
``se_sampen``) — plus PermEn, which the reference advertises but never
shipped (SURVEY.md §2.6 E16).

Plan shape: a single narrow projection over the token table — each
sequence is one row, so there is **no shuffle**; the only boundary is
one Arrow batch hop into the Python worker per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eristropy_spark.functions.entropy import (
    entropy_struct_udf,
    sampen_se_udf,
)

__all__ = ["compute_entropy"]


def compute_entropy(
    tokens_df: DataFrame,
    m: int = 2,
    r: float = 0.2,
    permen_m: int = 3,
    permen_delay: int = 1,
    estimate_uncertainty: bool = False,
    p: float = 0.5,
    n_boot: int = 100,
    seed: int = 0,
    keep_cols: tuple[str, ...] = ("source",),
    normalize: bool = False,
) -> DataFrame:
    """(doc_id, [keep_cols...,] sampen, permen[, se_sampen]) per sequence.

    ``r`` is an absolute tolerance on the (float64-cast) token scale,
    matching the reference's convention of applying r to the signal's
    own units.  With ``normalize=True`` each sequence is z-normalized
    (ddof=1) inside the SampEn kernel — NumPy-side, mirroring the
    reference's ``normalize_signals=True`` default
    (stationarity.py:278-281).  PermEn is invariant under the affine
    z-norm (ordinal patterns are order statistics), so it always runs
    on the raw sequence.
    """
    toks = F.col("tokens").cast("array<double>")
    ent = entropy_struct_udf(
        toks,
        F.lit(m),
        F.lit(float(r)),
        F.lit(bool(normalize)),
        F.lit(permen_m),
        F.lit(permen_delay),
    )
    cols = [F.col("doc_id"), *[F.col(c) for c in keep_cols]]
    cols.append(ent["sampen"].alias("sampen"))
    cols.append(ent["permen"].alias("permen"))
    if estimate_uncertainty:
        cols.append(
            sampen_se_udf(
                F.col("doc_id"),
                toks,
                F.lit(m),
                F.lit(float(r)),
                F.lit(float(p)),
                F.lit(n_boot),
                F.lit(seed),
            ).alias("se_sampen")
        )
    return tokens_df.select(*cols)
