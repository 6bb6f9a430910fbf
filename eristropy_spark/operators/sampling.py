"""Deterministic, engine-portable sampling for training-data pipelines.

``df.sample()`` is seed-dependent on the PARTITIONING (each partition
draws its own stream), so the same seed over the same data yields a
different sample after a repartition — useless for reproducible corpus
cuts, and impossible to oracle.  ``md5_sample`` instead keeps a row iff
a prefix of ``md5(key)`` falls below a threshold:

* deterministic in the KEY alone — stable across partitionings,
  engines, cluster sizes and re-runs (md5 is bit-identical everywhere),
* a pure filter: pushes down next to the scan, no shuffle, no RNG
  state, trivially composable with further lineage,
* stratified variants fall out for free (key on (source, doc_id) to
  sample per-source, or on a user id to sample by USER with all their
  rows kept together — the standard leakage-safe split).

The rate is expressed as ``num/256`` via the first two hex digits, so
the Spark filter and the DuckDB oracle compare the same substring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["md5_sample", "md5_bucket", "md5_split"]


def md5_bucket(key: Column) -> Column:
    """First md5 hex byte of the key as an int in [0, 255]."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 2), 16, 10).cast(
        "int"
    )


def md5_sample(
    df: DataFrame, key_col: str, rate_num: int, rate_den: int = 256
) -> DataFrame:
    """Keep rows whose md5-bucket < ``rate_num`` (rate = num/den).

    ``rate_den`` must be 256 (one hex byte) — the single-byte bucket
    keeps the oracle a plain substring compare; finer rates would take
    more hex digits.
    """
    if rate_den != 256:
        raise ValueError("rate_den must be 256 (single md5 hex byte)")
    if not (0 <= rate_num <= 255):
        # 256/256 would need a 3-char threshold, breaking the 2-char
        # lexicographic compare — a full keep needs no sampling anyway
        raise ValueError("rate_num must be in [0, 255]")
    threshold = format(rate_num, "02x")
    return df.where(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
        < F.lit(threshold)
    )


def md5_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test split assignment — adds a ``split``
    column from the row's md5 bucket (0-255) against cumulative weight
    ranges.

    Same portability story as ``md5_sample``: the assignment is a pure
    function of (salt, key), so it is stable across partitionings,
    engines, cluster sizes and re-runs, and pushes down as a plain
    expression.  Key on a GROUP id (user, document family) and every
    row of the group lands in the same split — the standard
    leakage-safe construction.  ``weights`` maps split name -> bucket
    count out of 256 (default 230/13/13 ≈ 90/5/5); names are assigned
    in the given order, so the mapping is reproducible from the config
    alone.  ``salt`` re-deals the split without touching the keys.
    """
    if weights is None:
        weights = {"train": 230, "val": 13, "test": 13}
    if sum(weights.values()) != 256:
        raise ValueError("weights must sum to 256 (md5 bucket space)")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("every split weight must be positive")
    bucket = md5_bucket(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    expr = None
    hi = 0
    for name, w in weights.items():
        hi += w
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)
