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

Everything is pure DataFrame composition (two two-phase hash
aggregates: (doc, token) counts, then per-doc reduce — shuffles carry
(id, count) pairs only, never the token arrays), and every sum runs in
DECIMAL on a 12-dp-quantized grid so the result is associative-exact:
an independent SQL engine replays each double bit-for-bit
(quantize-then-cast rule, see changepoint._floor_round).
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

        h_shannon = -Σ p_v ln p_v
        h_renyi2  = -ln Σ p_v²
        h_min     = -ln max_v p_v
        ttr       = n_distinct / n        (type-token ratio)

    Ordering: H∞ ≤ H₂ ≤ H₁ ≤ ln(n_distinct), with equality iff
    uniform.  Empty/NULL token arrays emit NULL entropies.

    Scale shape: explode is in-row; the (id, token) count is a
    two-phase hash aggregate with map-side combine (the explode's
    row-blowup collapses back to distinct-token cardinality before the
    exchange); the per-doc reduce is a second two-phase aggregate over
    (id, count) pairs.  No windows, no Python, no arrays crossing a
    shuffle.  The Σ terms are 12-dp-quantized and summed as
    DECIMAL(38, 12) — exact under any partitioning / merge order, so
    results are partition-invariant AND independently replayable.
    """
    cnt = (
        df.select(F.col(id_col).alias("_id"), F.explode(F.col(array_col)).alias("_tok"))
        .groupBy("_id", "_tok")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    # n is re-derived from the counts (exact), so a NULL/empty array
    # simply yields no rows here; re-attach those ids at the end.
    per_tok = cnt.select(
        "_id",
        "_c",
        F.col("_c").cast("double").alias("_cd"),
    )
    n_w = per_tok.groupBy("_id").agg(
        F.sum("_c").alias("_n"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("_c").alias("_cmax"),
    )
    j = per_tok.join(n_w, "_id")
    p = F.col("_cd") / F.col("_n").cast("double")
    t_sh = _floor_round(p * F.log(p), 12).cast("decimal(38, 12)")
    t_r2 = _floor_round(p * p, 12).cast("decimal(38, 12)")
    red = j.groupBy("_id").agg(
        F.first("_n").alias("n_tok"),
        F.first("n_distinct").alias("n_distinct"),
        F.first("_cmax").alias("_cmax"),
        (-F.sum(t_sh).cast("double")).alias("h_shannon"),
        (-F.log(F.sum(t_r2).cast("double"))).alias("h_renyi2"),
    )
    out = red.select(
        F.col("_id").alias(id_col),
        "n_tok",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_tok").cast("double")).alias("ttr"),
        "h_shannon",
        "h_renyi2",
        (-F.log(F.col("_cmax").cast("double") / F.col("n_tok").cast("double"))).alias(
            "h_min"
        ),
    )
    # docs whose array is NULL/empty: emit the row with NULLs so the
    # operator is total over its input (left anti → union)
    empties = (
        df.select(F.col(id_col), F.col(array_col))
        .where(F.col(array_col).isNull() | (F.size(array_col) == 0))
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tok"),
            F.lit(0).cast("long").alias("n_distinct"),
            F.lit(None).cast("double").alias("ttr"),
            F.lit(None).cast("double").alias("h_shannon"),
            F.lit(None).cast("double").alias("h_renyi2"),
            F.lit(None).cast("double").alias("h_min"),
        )
    )
    return out.unionByName(empties)
