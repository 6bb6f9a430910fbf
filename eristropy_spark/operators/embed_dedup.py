"""Embedding-cosine near-duplicate detection over the embeddings table.

Completes the dedup suite (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine): pairs of vectors whose cosine similarity
clears a threshold.

* ``embedding_dup_pairs_exact`` — all-pairs cosine via a broadcast
  block join.  Exact and DuckDB-oracle-checkable; O(n²) scoring, so it
  is the SMALL-SCALE / verification path only (same role
  ``ngram_jaccard_pairs`` plays for text).
* ``embedding_dup_pairs_lsh`` — the 100 TB path: random-hyperplane LSH
  tables (same family as ``similarity.cosine_topk_lsh``) generate
  candidate pairs ONLY within (table, bucket); candidates dedup on ids
  alone, vectors re-attach via two joins, and the exact cosine filter
  runs per candidate.  Per-vector cost O(n_tables · bucket); recall is
  probabilistic in the hyperplane draw (golden-tested against the
  exact path at sf0.01).

Cosine arithmetic matches the similarity operators: elementwise
double-cast products, sequential ``aggregate`` fold, 6-dp portable
rounding — so results hash-compare across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eristropy_spark.functions.numeric import round6
from eristropy_spark.operators.similarity import (
    _dot,
    _norm,
    make_hyperplane_udf,
    probe_dim,
)

__all__ = ["embedding_dup_pairs_exact", "embedding_dup_pairs_lsh"]


def embedding_dup_pairs_exact(
    emb: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """(id_a, id_b, cos_sim) for ALL pairs with cosine >= threshold (a < b)."""
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    ).withColumn("na", _norm(F.col("va")))
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    ).withColumn("nb", _norm(F.col("vb")))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            round6(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))),
        )
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 17,
    dim: int | None = None,
    max_bucket_size: int | str | None = "auto",
) -> DataFrame:
    """LSH-bucketed near-dup pairs: candidates share a bucket in any table.

    High-cosine pairs collide with probability
    ``1 - (1 - (1 - θ/π)^n_bits)^n_tables`` — at θ small (cos ≥ 0.95)
    recall is near-total for the default 8×8 configuration.

    ``max_bucket_size`` is the hot-bucket stop-list (see
    ``dedup.minhash_lsh_pairs``): a degenerate bucket — e.g. every
    zero/duplicate-boilerplate embedding hashing identically —
    contributes O(members²) candidates to the self-join; drop it and
    its members still collide via the other tables.  The default
    ``"auto"`` caps RELATIVE to uniform occupancy (8× the per-table
    mean of n_rows/2^n_bits, floored at 10k): sign buckets have only
    2^n_bits keys per table, so a fixed absolute cap would silently
    drop EVERY bucket — recall → 0 — once the corpus exceeds
    cap·2^n_bits rows, while the relative cap scales with the corpus
    and can only shed buckets that are genuinely degenerate.
    ``None`` disables.
    """
    from eristropy_spark.operators.dedup import _drop_hot_buckets

    if dim is None:
        dim = probe_dim(emb)
    from eristropy_spark.functions.partitioning import widen_narrow_input

    bucket_udf = make_hyperplane_udf(dim, n_bits, n_tables, seed)
    tabled = widen_narrow_input(emb).select(
        "vec_id", bucket_udf(F.col("embedding")).alias("codes")
    ).select("vec_id", F.posexplode("codes").alias("table_id", "bucket"))
    tabled = _drop_hot_buckets(
        tabled, ["table_id", "bucket"], max_bucket_size, n_buckets=2**n_bits
    )
    cand_ids = (
        tabled.alias("x")
        .join(tabled.alias("y"), ["table_id", "bucket"])
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
        )
        .distinct()
    )
    # norms are per-VECTOR, so evaluate them on the n-row sides before
    # the join instead of per candidate PAIR: the interpreted aggregate
    # fold runs 2n times, not 2|candidates| times (same double — the
    # fold over the same array is deterministic), like the exact path
    va = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    ).withColumn("na", _norm(F.col("va")))
    vb = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    ).withColumn("nb", _norm(F.col("vb")))
    return (
        cand_ids.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos_sim",
            round6(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            ),
        )
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
