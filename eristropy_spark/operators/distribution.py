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

__all__ = ["renyi_entropy", "markov_entropy_rate"]


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


def markov_entropy_rate(
    df: DataFrame,
    array_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """First-order Markov (conditional) entropy rate per document:

        h_rate = H(X_t | X_{t−1}) = H₂(bigrams) − H₁(contexts)

    over the document's M = n−1 adjacent token pairs, with the context
    marginal taken over the pairs' FIRST elements (so both entropies
    share the denominator M and the standard chain rule holds exactly).
    Shannon's original "series of approximations to English" (1948
    §3) — the sequence-aware complement to ``renyi_entropy``'s bag-of-
    tokens H₁: templated text with diverse vocabulary but rigid
    transitions shows high H₁ yet h_rate ≈ 0.

    Emits (id, n_pairs, n_bigrams, n_contexts, h_bigram, h_context,
    h_rate); documents with fewer than 2 tokens emit the row with
    n_pairs = 0 and NULL entropies, carried through the same pass (the
    renyi ``_empty``-flag trick).

    Scale shape: pure DataFrame composition — the bigram zip is
    IN-ROW (two slices + arrays_zip + explode_outer), then a
    three-level aggregate chain (id, x, y) → (id, x) → (id), each a
    two-phase hash aggregate whose shuffle carries ids and counts
    only.  No joins, no windows, no Python.  The order-sensitive sums
    (Σ c·ln c) run on the 12-dp DECIMAL grid (partition-invariant
    bit-for-bit, independently replayable); everything else is exact
    integers.
    """
    arr = F.col(array_col)
    n = F.size(arr)
    pairs = F.when(
        arr.isNotNull() & (n >= 2),
        F.arrays_zip(
            F.slice(arr, 1, n - 1).alias("x"),
            F.slice(arr, 2, n - 1).alias("y"),
        ),
    )
    cnt2 = (
        df.select(
            F.col(id_col).alias("_id"),
            (arr.isNull() | (n < 2)).alias("_empty"),
            F.explode_outer(pairs).alias("_p"),
        )
        .groupBy("_id", "_empty", F.col("_p.x").alias("_x"), F.col("_p.y").alias("_y"))
        .agg(F.count("*").cast("long").alias("_c"))
    )
    c = F.col("_c")
    cd = c.cast("double")
    t2 = _floor_round(cd * F.log(cd), 12).cast("decimal(38, 12)")
    ctx = cnt2.groupBy("_id", "_empty", "_x").agg(
        F.sum(c).alias("_ca"),
        F.count("*").cast("long").alias("_nb"),
        F.sum(t2).alias("_s2"),
    )
    ca = F.col("_ca")
    cad = ca.cast("double")
    t1 = _floor_round(cad * F.log(cad), 12).cast("decimal(38, 12)")
    red = ctx.groupBy("_id").agg(
        F.max("_empty").alias("_e"),
        F.sum(ca).alias("_m"),
        F.sum("_nb").alias("n_bigrams"),
        F.count("*").cast("long").alias("n_contexts"),
        F.sum("_s2").cast("double").alias("_slog2"),
        F.sum(t1).cast("double").alias("_slog1"),
    )
    e = F.col("_e")
    md = F.col("_m").cast("double")
    h2 = F.log(md) - F.col("_slog2") / md
    h1 = F.log(md) - F.col("_slog1") / md
    nulld = F.lit(None).cast("double")
    zero = F.lit(0).cast("long")
    return red.select(
        F.col("_id").alias(id_col),
        F.when(e, zero).otherwise(F.col("_m")).alias("n_pairs"),
        F.when(e, zero).otherwise(F.col("n_bigrams")).alias("n_bigrams"),
        F.when(e, zero).otherwise(F.col("n_contexts")).alias("n_contexts"),
        F.when(e, nulld).otherwise(h2).alias("h_bigram"),
        F.when(e, nulld).otherwise(h1).alias("h_context"),
        F.when(e, nulld).otherwise(h2 - h1).alias("h_rate"),
    )
