"""Connected components / duplicate-cluster resolution tests."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from eristropy_spark.operators.cluster import connected_components, dedup_clusters


def _cc(spark, n, edge_list):
    verts = spark.range(n).select(F.col("id"))
    edges = spark.createDataFrame(
        [Row(a=a, b=b) for a, b in edge_list], "a long, b long"
    )
    return {
        r["id"]: r["comp"]
        for r in connected_components(verts, edges).collect()
    }


def test_cc_basic_components(spark):
    # {0,1,2} via chain, {3,4} pair, {5} isolated
    got = _cc(spark, 6, [(0, 1), (1, 2), (3, 4)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_cc_transitive_chain(spark):
    """A long chain needs multiple propagation rounds."""
    got = _cc(spark, 12, [(i, i + 1) for i in range(11)])
    assert got == {i: 0 for i in range(12)}


def test_cc_result_reusable_after_return(spark):
    """The returned frame must be consumable repeatedly (checkpointed
    lineage — no exponential recompute of the iteration cascade)."""
    verts = spark.range(50).select(F.col("id"))
    edges = spark.createDataFrame(
        [Row(a=i, b=i + 1) for i in range(0, 48, 2)], "a long, b long"
    )
    out = connected_components(verts, edges)
    assert out.count() == 50
    assert out.where(F.col("comp") == F.col("id") - 1).count() == 24


def test_cc_nonconvergence_guard(spark):
    verts = spark.range(8).select(F.col("id"))
    edges = spark.createDataFrame(
        [Row(a=i, b=i + 1) for i in range(7)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(verts, edges, max_iter=2)


def test_dedup_clusters_shapes(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i) for i in range(10)]
    )
    pairs = spark.createDataFrame(
        [Row(doc_a=0, doc_b=3, j=1.0), Row(doc_a=3, doc_b=7, j=1.0),
         Row(doc_a=5, doc_b=6, j=1.0)]
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert out[0] == (0, 3) and out[3] == (0, 3) and out[7] == (0, 3)
    assert out[5] == (5, 2) and out[6] == (5, 2)
    assert out[1] == (1, 1)  # singleton
    assert len(out) == 10


def test_clusters_lsh_path_equals_exact_path(spark):
    """At sf0.01 the LSH edge set equals the exact Jaccard edge set
    (each pair golden-verified separately), so the two clustering
    contract queries must produce identical clusters."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.01"
    exact = sorted(map(tuple, entry._q_dedup_clusters(spark, sf).collect()))
    lsh = sorted(map(tuple, entry._q_dedup_clusters_lsh(spark, sf).collect()))
    assert exact == lsh and len(exact) == 500


def test_cc_frees_intermediate_checkpoint_blocks(spark):
    """Only the FINAL round's label blocks survive the call — per-round
    checkpoints and the edge checkpoint are freed eagerly, not left for
    GC (a long chain would otherwise stack O(rounds) block sets)."""
    import gc

    gc.collect()
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    verts = spark.range(40).select(F.col("id"))
    edges = spark.createDataFrame(
        [Row(a=i, b=i + 1) for i in range(0, 19)], "a long, b long"
    )
    out = connected_components(verts, edges)  # 20-chain: ~19 rounds
    assert out.count() == 40
    assert jsc.getPersistentRDDs().size() <= before + 1  # final labels only


def test_twophase_matches_propagation_on_random_graphs(spark):
    import numpy as np

    from eristropy_spark.operators.cluster import connected_components_twophase

    rng = np.random.default_rng(23)
    verts = spark.range(120).select(F.col("id"))
    edge_rows = [
        Row(a=int(a), b=int(b))
        for a, b in rng.integers(0, 120, size=(90, 2))
        if a != b
    ]
    edges = spark.createDataFrame(edge_rows, "a long, b long")
    prop = sorted(map(tuple, connected_components(verts, edges).collect()))
    two = sorted(
        map(tuple, connected_components_twophase(verts, edges).collect())
    )
    assert prop == two


def test_twophase_handles_long_chain(spark):
    """The O(diameter) weakness of min propagation: a 151-node chain
    defeats max_iter=25 propagation (guard raises) but the alternating
    algorithm contracts it in O(log^2 n) rounds."""
    from eristropy_spark.operators.cluster import connected_components_twophase

    verts = spark.range(160).select(F.col("id"))
    edges = spark.createDataFrame(
        [Row(a=i, b=i + 1) for i in range(150)], "a long, b long"
    )
    out = {
        r["id"]: r["comp"]
        for r in connected_components_twophase(verts, edges).collect()
    }
    assert all(out[i] == 0 for i in range(151))
    assert all(out[i] == i for i in range(151, 160))


def test_dedup_clusters_twophase_equivalent(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(10)])
    pairs = spark.createDataFrame(
        [Row(doc_a=0, doc_b=3, j=1.0), Row(doc_a=3, doc_b=7, j=1.0)]
    )
    a = sorted(map(tuple, dedup_clusters(docs, pairs).collect()))
    b = sorted(
        map(tuple, dedup_clusters(docs, pairs, algorithm="twophase").collect())
    )
    assert a == b
    import pytest

    with pytest.raises(ValueError, match="algorithm"):
        dedup_clusters(docs, pairs, algorithm="bogus")


def test_unionfind_fast_path_equals_propagation(spark):
    """auto (driver union-find) ≡ forced distributed propagation on
    random graphs, including singleton handling and cluster sizes."""
    import numpy as np

    from eristropy_spark.operators.cluster import dedup_clusters

    rng = np.random.default_rng(41)
    docs = spark.range(150).select(F.col("id").alias("doc_id"))
    pair_rows = [
        Row(doc_a=int(a), doc_b=int(b))
        for a, b in rng.integers(0, 150, size=(120, 2))
        if a != b
    ]
    pairs = spark.createDataFrame(pair_rows, "doc_a long, doc_b long")
    fast = sorted(map(tuple, dedup_clusters(docs, pairs).collect()))
    dist = sorted(
        map(tuple, dedup_clusters(docs, pairs, algorithm="propagation").collect())
    )
    assert fast == dist and len(fast) == 150


def test_auto_falls_back_to_distributed_above_threshold(spark):
    from eristropy_spark.operators.cluster import dedup_clusters

    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(5)], "doc_a long, doc_b long"
    )
    out = sorted(
        map(
            tuple,
            dedup_clusters(docs, pairs, driver_edge_threshold=2).collect(),
        )
    )
    want = sorted(
        map(tuple, dedup_clusters(docs, pairs, algorithm="propagation").collect())
    )
    assert out == want


def test_auto_distributed_path_releases_edge_checkpoint(spark):
    """Round-4 advice: the over-threshold auto path left its eager edge
    checkpoint cached until driver GC (only the union-find fast path
    released it).  Both CC algorithms checkpoint their OWN edge copy,
    so after dedup_clusters returns, the only surviving checkpoint must
    be the final labels frame the result reads — same bound the
    propagation-path block test pins."""
    import gc

    from eristropy_spark.operators.cluster import dedup_clusters

    gc.collect()
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    out = dedup_clusters(docs, pairs, driver_edge_threshold=0)
    assert out.count() == 30
    assert jsc.getPersistentRDDs().size() <= before + 1  # final labels only
