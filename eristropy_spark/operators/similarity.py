"""Similarity search over embedding columns (array<float>).

* ``cosine_topk_bruteforce`` — exact baseline: broadcast the (small)
  query set against the corpus, dot products via ``zip_with`` +
  ``aggregate`` (JVM-side), rank per query.  Exact and
  oracle-checkable; O(|Q|·|corpus|) — fine when |Q| is small or as the
  per-bucket reranker below.
* ``cosine_topk_lsh`` — the scale path: random-hyperplane LSH.  A
  seeded projection matrix (driver NumPy, closure-shipped) maps each
  vector to a sign-bit bucket; queries only score candidates sharing a
  bucket across any of ``n_tables`` independent tables.  Recall is
  probabilistic (tested against brute force on the fixture); cost is
  O(|Q|·bucket_size·n_tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eristropy_spark.functions.numeric import round6
from pyspark.sql.types import ArrayType, LongType

__all__ = ["cosine_topk_bruteforce", "cosine_topk_lsh", "probe_dim"]


def probe_dim(emb: DataFrame) -> int:
    """Embedding width from a one-row probe, with a clear error on an
    empty table (``first()`` returns None there, which would otherwise
    surface as an opaque ``TypeError: 'NoneType' is not subscriptable``)."""
    row = emb.select("embedding").first()
    if row is None or row[0] is None:
        raise ValueError(
            "cannot infer embedding dim: embeddings table is empty "
            "(pass dim= explicitly if the schema is known)"
        )
    return len(row[0])


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk_bruteforce(
    emb: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_sim) — exact top-k by cosine.

    Norms are precomputed per side as row columns (one aggregate pass
    each) so the cross join scores with a single dot product.
    Ties break by neighbor_id ascending (deterministic).
    """
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("v"),
    ).withColumn("nv", _norm(F.col("v")))
    queries = (
        emb.where(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"))
        .withColumn("nq", _norm(F.col("q")))
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            round6(_dot(F.col("q"), F.col("v")) / (F.col("nq") * F.col("nv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def make_hyperplane_udf(dim: int, n_bits: int, n_tables: int, seed: int = 17):
    """pandas_udf: embedding -> array of n_tables sign-bucket codes."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_bits, dim)).astype(np.float64)
    weights = (2 ** np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def bucket_udf(embedding: pd.Series) -> pd.Series:
        out = []
        for v in embedding:
            if v is None:
                out.append([0] * n_tables)
                continue
            x = np.asarray(v, dtype=np.float64)
            signs = (np.einsum("tbd,d->tb", planes, x) > 0).astype(np.int64)
            out.append([int(s @ weights) for s in signs])
        return pd.Series(out)

    return bucket_udf


def cosine_topk_lsh(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 17,
    dim: int | None = None,
    max_bucket_size: int | str | None = "auto",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH candidates, exact rerank within.

    Pass ``dim`` when known (schema metadata / config) to avoid the
    one-row probe job.  The bucket join and the candidate ``distinct``
    carry ONLY ids — embedding vectors are re-attached afterwards, one
    join per side, so no wide payload rides the exploded table stream
    or the dedup shuffle.

    ``max_bucket_size`` stop-lists degenerate corpus-side buckets
    before the candidate join (default ``"auto"``: 8× uniform
    occupancy n_rows/2^n_bits, floored at 10k — scales with the corpus,
    so it can never uniformly cap out the whole small sign-bucket
    keyspace the way an absolute cap would; see
    ``dedup._drop_hot_buckets``).  The join side here is a broadcast
    query set, so a fat bucket costs O(bucket·queries), not bucket² —
    linear, but at 100 TB a single all-zeros region bucket still
    dominates the scan; queries keep their other ``n_tables-1`` probes.
    ``None`` disables.
    """
    from eristropy_spark.operators.dedup import _drop_hot_buckets

    if dim is None:
        dim = probe_dim(emb)
    from eristropy_spark.functions.partitioning import widen_narrow_input

    bucket_udf = make_hyperplane_udf(dim, n_bits, n_tables, seed)
    with_b = widen_narrow_input(emb).select(
        "vec_id", bucket_udf(F.col("embedding")).alias("codes")
    )
    tabled = with_b.select(
        "vec_id", F.posexplode("codes").alias("table_id", "bucket")
    )
    corpus_ids = _drop_hot_buckets(
        tabled, ["table_id", "bucket"], max_bucket_size, n_buckets=2**n_bits
    ).select(F.col("vec_id").alias("neighbor_id"), "table_id", "bucket")
    query_ids_t = tabled.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "table_id", "bucket"
    )
    cand_ids = (
        corpus_ids.join(F.broadcast(query_ids_t), ["table_id", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # per-vector norms evaluated on the sides, not per candidate pair
    # (identical doubles — same fold over the same array)
    corpus_vecs = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("v")
    ).withColumn("nv", _norm(F.col("v")))
    query_vecs = emb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    ).withColumn("nq", _norm(F.col("q")))
    scored = (
        cand_ids.join(corpus_vecs, "neighbor_id")
        .join(F.broadcast(query_vecs), "query_id")
        .withColumn(
            "cos_sim",
            round6(_dot(F.col("q"), F.col("v")) / (F.col("nq") * F.col("nv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
