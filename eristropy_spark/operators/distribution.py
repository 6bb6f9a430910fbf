"""Per-document token-distribution statistics — the entropy *of the
unigram distribution* (as opposed to the sequence-dynamics entropies
SampEn/PermEn/ApEn, which measure temporal structure):

* ``renyi_entropy`` — the Rényi spectrum of each document's token
  histogram: Shannon H₁, collision entropy H₂ (Rényi α=2, the
  quantity LSH/dedup collision rates are governed by), min-entropy
  H∞ (worst-case predictability — the repetition-detector extreme),
  plus the type-token ratio.  A doc whose H₂ collapses while H₁ stays
  moderate is dominated by a few hot tokens — boilerplate/template
  text that n-gram repetition filters catch late; H∞ names the
  degenerate "one token owns the doc" case outright.

Everything is pure DataFrame composition: one in-row explode, a
(doc, token) two-phase hash-aggregate count, then ONE per-doc reduce —
no joins, no windows, no Python; shuffles carry (id, count) pairs
only.  The per-group identities

    Σ p ln p = (Σ c·ln c)/n − ln n        (p = c/n, n = Σ c)
    Σ p²     = (Σ c²)/n²

turn both entropy sums into aggregates of per-COUNT terms, so the
only order-sensitive accumulation (Σ c·ln c) runs in DECIMAL on a
12-dp-quantized grid (associative-exact; quantize-then-cast rule, see
changepoint._floor_round) and Σ c² is an exact integer — results are
partition-invariant bit-for-bit and independently replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eristropy_spark.operators.changepoint import _floor_round

__all__ = ["renyi_entropy"]


def renyi_entropy(
    df: DataFrame,
    array_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tok, n_distinct, ttr, h_shannon, h_renyi2, h_min) —
    one row per document; entropies in nats over the document's own
    unigram distribution p_v = count(v)/n:

        h_shannon = -Σ p_v ln p_v  =  ln n − (Σ c_v ln c_v)/n
        h_renyi2  = -ln Σ p_v²     =  -ln( (Σ c_v²) / n² )
        h_min     = -ln max_v p_v
        ttr       = n_distinct / n        (type-token ratio)

    Ordering: H∞ ≤ H₂ ≤ H₁ ≤ ln(n_distinct), with equality iff
    uniform.  Empty/NULL token arrays emit the row with n_tok = 0 and
    NULL entropies, carried through the SAME single pass (explode_outer
    emits one sentinel row for a missing/empty array; a per-doc
    ``_empty`` flag — constant within the doc, so it rides the grouping
    key for free — marks those rows so the final projection can null
    them out).  No union, no second scan of the input.

    Scale shape: explode_outer is in-row; the (id, token) count is a
    two-phase hash aggregate with map-side combine (the explode's
    row-blowup collapses back to distinct-token cardinality before the
    exchange); the per-doc reduce is a second two-phase aggregate over
    (id, count) pairs.  No joins, no windows, no Python, no arrays
    crossing a shuffle.  Σ c² is an exact BIGINT and Σ c·ln c is
    12-dp-quantized DECIMAL(38, 12) — exact under any partitioning /
    merge order, so results are partition-invariant AND independently
    replayable by another engine.
    """
    arr = F.col(array_col)
    cnt = (
        df.select(
            F.col(id_col).alias("_id"),
            (arr.isNull() | (F.size(arr) == 0)).alias("_empty"),
            F.explode_outer(arr).alias("_tok"),
        )
        .groupBy("_id", "_empty", "_tok")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    c = F.col("_c")
    cd = c.cast("double")
    t_clogc = _floor_round(cd * F.log(cd), 12).cast("decimal(38, 12)")
    red = cnt.groupBy("_id").agg(
        F.max("_empty").alias("_e"),
        F.sum(c).alias("_n"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max(c).alias("_cmax"),
        F.sum(c * c).alias("_s2"),
        F.sum(t_clogc).cast("double").alias("_slog"),
    )
    e = F.col("_e")
    nd = F.col("_n").cast("double")
    nulld = F.lit(None).cast("double")
    zero = F.lit(0).cast("long")
    return red.select(
        F.col("_id").alias(id_col),
        F.when(e, zero).otherwise(F.col("_n")).alias("n_tok"),
        F.when(e, zero).otherwise(F.col("n_distinct")).alias("n_distinct"),
        F.when(e, nulld)
        .otherwise(F.col("n_distinct").cast("double") / nd)
        .alias("ttr"),
        F.when(e, nulld)
        .otherwise(F.log(nd) - F.col("_slog") / nd)
        .alias("h_shannon"),
        F.when(e, nulld)
        .otherwise(-F.log(F.col("_s2").cast("double") / (nd * nd)))
        .alias("h_renyi2"),
        F.when(e, nulld)
        .otherwise(-F.log(F.col("_cmax").cast("double") / nd))
        .alias("h_min"),
    )
