"""IVF (inverted-file) approximate nearest neighbour — the coarse-
quantizer scale path for embedding similarity search.

Complements the hyperplane-LSH variant (operators/similarity.py) with
the other classic ANN layout (Jégou et al., "Product Quantization for
Nearest Neighbor Search", PAMI 2011 — the IVF coarse stage, without
the PQ residual codes):

1. TRAIN — k centroids from a deterministic seeded sample, refined by
   a fixed number of Lloyd iterations.  Each iteration is one Spark
   aggregation: assign every vector to its nearest centroid (broadcast
   centroid matrix inside a pandas UDF) and average per cell — the
   classic map-side-combinable k-means step, no driver-side data.
2. INDEX — one pass assigns every vector its cell id; at scale this is
   the partition/bucket key for the stored table.
3. QUERY — each query probes its ``nprobe`` nearest cells only;
   candidates are exact-reranked by cosine.  Cost is
   O(|Q| · nprobe · cell_size) instead of O(|Q| · corpus).

Determinism: the sample, the iteration count and all arithmetic are
fixed by ``seed``, so the index is reproducible across runs and
partitionings (centroid averages are computed in Spark aggregations —
float sums over a fixed partitioning are stable under AQE-off local
runs; tests pin recall vs brute force, not centroid bits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from eristropy_spark.functions.numeric import round6
from eristropy_spark.operators.similarity import _dot, _norm

__all__ = ["train_ivf_centroids", "ivf_assign", "cosine_topk_ivf"]


def _make_assign_udf(centroids: np.ndarray):
    """pandas_udf: embedding -> nearest-centroid id (L2 on normalized
    vectors ≈ cosine order).

    The whole Arrow batch is stacked into one (n, dim) matrix and scored
    with a single (n, dim) @ (dim, k) matmul — no per-row Python loop
    (a null embedding becomes the zero vector, whose argmax ties break
    to cell 0, matching the old per-row default)."""
    cn = (centroids / np.linalg.norm(centroids, axis=1, keepdims=True)).T  # (dim, k)
    dim = cn.shape[0]

    @F.pandas_udf(IntegerType())
    def assign_udf(embedding: pd.Series) -> pd.Series:
        if len(embedding) == 0:
            return pd.Series(np.empty(0, dtype=np.int32))
        vals = [
            np.zeros(dim, dtype=np.float64)
            if v is None
            else np.asarray(v, dtype=np.float64)
            for v in embedding
        ]
        X = np.stack(vals)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        np.divide(X, norms, out=X, where=norms > 0)
        return pd.Series(np.argmax(X @ cn, axis=1).astype(np.int32))

    return assign_udf


def train_ivf_centroids(
    emb: DataFrame,
    k: int = 16,
    n_iter: int = 2,
    seed: int = 17,
    sample_per_cell: int = 8,
) -> np.ndarray:
    """(k, dim) centroid matrix: seeded sample init + Lloyd refinement.

    Each Lloyd step is ONE distributed aggregation over the corpus;
    only the (k, dim) centroid matrix ever reaches the driver.
    """
    init = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id") + F.lit(seed)))
        .limit(k * sample_per_cell)
        .collect()
    )
    if not init:
        raise ValueError("cannot train IVF centroids: embeddings table is empty")
    rng = np.random.RandomState(seed)
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in init])
    if len(X) < k:
        # corpus smaller than the requested cell count: every vector can
        # be its own cell; clamping beats rng.choice's opaque ValueError
        k = len(X)
    centroids = X[rng.choice(len(X), size=k, replace=False)]
    dim = centroids.shape[1]

    for _ in range(n_iter):
        assign = _make_assign_udf(centroids)
        # per-cell vector sums WITHOUT a dim-wide aggregate row: explode
        # (cell, embedding) to (cell, pos, x) and group by (cell, pos) —
        # map-side partial aggregation still applies, the shuffle carries
        # k*dim groups, and the collect is k*dim rows regardless of dim
        # (a 768-dim table needs no 768-column agg)
        sums = (
            emb.select(assign(F.col("embedding")).alias("cell"), "embedding")
            .select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.col("x").cast("double")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = centroids.copy()
        acc = np.zeros((k, dim), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        for row in sums:
            acc[int(row["cell"]), int(row["pos"])] = float(row["s"])
            cnt[int(row["cell"])] = int(row["n"])
        nonempty = cnt > 0
        new[nonempty] = acc[nonempty] / cnt[nonempty, None]
        # quantize: float sums across shuffle partitions are combined in
        # nondeterministic fetch order (~1e-12 relative jitter); rounding
        # to 6 dp makes the trained index bit-stable across partitionings
        # and re-runs, so assignments (argmax over exact dots) are too
        centroids = np.round(new, 6)
    return centroids


def ivf_assign(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cell, embedding) — the stored/partitioned index layout."""
    assign = _make_assign_udf(centroids)
    return emb.select(
        "vec_id", assign(F.col("embedding")).alias("cell"), "embedding"
    )


def cosine_topk_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    n_iter: int = 2,
    seed: int = 17,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_sim) via IVF probing.

    Queries probe their ``nprobe`` nearest cells; candidates rerank by
    exact cosine.  Recall rises with nprobe (nprobe = n_cells ≡ brute
    force); tests pin recall vs the brute-force oracle.
    """
    centroids = train_ivf_centroids(emb, k=n_cells, n_iter=n_iter, seed=seed)
    indexed = ivf_assign(emb, centroids)

    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    qrows = emb.where(F.col("vec_id").isin(query_ids)).select(
        "vec_id", "embedding"
    ).collect()
    probe_pairs = []
    for r in qrows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(x)
        if n > 0:
            x = x / n
        order = np.argsort(-(cn @ x))[:nprobe]
        probe_pairs.extend((int(r["vec_id"]), int(c)) for c in order)
    spark = emb.sparkSession
    probes = spark.createDataFrame(probe_pairs, "query_id long, cell int")

    cands = (
        indexed.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
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
        cands.join(corpus_vecs, "neighbor_id")
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
