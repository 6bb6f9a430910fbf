"""IVF coarse-quantizer ANN tests — recall vs brute force, determinism."""

import numpy as np

from eristropy_spark.operators.ivf import (
    cosine_topk_ivf,
    ivf_assign,
    train_ivf_centroids,
)
from eristropy_spark.operators.similarity import cosine_topk_bruteforce


def _emb_df(spark, n=120, dim=16, clusters=6):
    """Clustered corpus — IVF's design case (cells capture clusters)."""
    from pyspark.sql import Row

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(clusters, dim)) * 3.0
    rows = [
        Row(
            vec_id=i,
            embedding=[
                float(v) for v in centers[i % clusters] + rng.normal(size=dim) * 0.4
            ],
            label=i % clusters,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_ivf_assign_covers_all_cells_used(spark):
    emb = _emb_df(spark)
    centroids = train_ivf_centroids(emb, k=6, n_iter=2, seed=17)
    assert centroids.shape == (6, 16)
    cells = ivf_assign(emb, centroids)
    rows = cells.collect()
    assert len(rows) == 120
    assert all(0 <= r["cell"] < 6 for r in rows)


def test_ivf_recall_vs_bruteforce(spark):
    emb = _emb_df(spark)
    qids = [0, 1, 2, 3]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, qids, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_ivf(
            emb, qids, k=5, n_cells=6, nprobe=2, seed=17
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # clustered data: the true neighbours share the query's cell, so
    # even nprobe=2 of 6 cells should recover nearly everything
    assert recall >= 0.8, recall


def test_ivf_full_probe_equals_bruteforce(spark):
    """nprobe == n_cells degrades IVF to exact search — outputs equal."""
    emb = _emb_df(spark, n=60)
    qids = [0, 5]
    exact = {
        (r["query_id"], r["neighbor_id"]): (r["rank"], r["cos_sim"])
        for r in cosine_topk_bruteforce(emb, qids, k=4).collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"]): (r["rank"], r["cos_sim"])
        for r in cosine_topk_ivf(
            emb, qids, k=4, n_cells=4, nprobe=4, seed=17
        ).collect()
    }
    assert full == exact


def test_ivf_deterministic(spark):
    emb = _emb_df(spark, n=80)
    a = sorted(
        map(tuple, cosine_topk_ivf(emb, [0, 1], k=3, n_cells=4, seed=7).collect())
    )
    b = sorted(
        map(tuple, cosine_topk_ivf(emb.repartition(5), [0, 1], k=3, n_cells=4, seed=7).collect())
    )
    assert a == b


def test_ivf_empty_table_raises_clear_error(spark):
    import pytest

    empty = _emb_df(spark).where("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        train_ivf_centroids(empty, k=4, n_iter=1, seed=17)


def test_ivf_k_clamped_to_corpus_size(spark):
    tiny = _emb_df(spark, n=3)
    centroids = train_ivf_centroids(tiny, k=16, n_iter=1, seed=17)
    assert centroids.shape == (3, 16)  # clamped, not rng.choice ValueError
    cells = ivf_assign(tiny, centroids).collect()
    assert all(0 <= r["cell"] < 3 for r in cells)


def test_probe_dim_empty_table_raises(spark):
    import pytest

    from eristropy_spark.operators.similarity import probe_dim

    empty = _emb_df(spark).where("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        probe_dim(empty)
