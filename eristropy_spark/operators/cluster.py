"""Duplicate-cluster resolution — connected components over a pair graph.

Near-dup detection (MinHash / SimHash / embedding LSH) emits PAIRS, but
a training-data pipeline needs CLUSTERS: "these 17 documents are all
the same article; keep one".  Pairs are edges; the canonical document
of a duplicate group is the component minimum — so the missing step is
connected components at 10⁹+ vertices.

``connected_components`` is iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint.  Each round is one join + one aggregation
(map-side combined) — all distributed, labels only ever decrease, and
convergence takes O(graph diameter) rounds.  Near-dup graphs are the
friendly case: duplicate clusters are dense (diameter 2-3 in practice),
so a handful of rounds suffices; ``max_iter`` bounds the worst case and
the implementation raises if a pathological chain fails to converge
(at extreme scale swap in the large-star/small-star variant, which
contracts chains in O(log n) rounds — same interface).

Deterministic: min-id labels are partition- and order-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint's blocks NOW.

    ``DataFrame.unpersist`` only touches CacheManager entries, not the
    checkpoint RDD's blocks (verified: getPersistentRDDs keeps the
    entry after it) — blocks otherwise live until driver GC +
    ContextCleaner.  The checkpointed plan is a LogicalRDD whose
    ``rdd()`` IS the persisted RDD; unpersisting that frees the blocks
    immediately (and makes the frame unreadable — only call on frames
    that are done).  Best-effort: falls back to GC-release on any
    internal-API mismatch."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — GC will release eventually
        pass


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vid: str = "id",
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) — component = min vertex id reachable from id.

    ``vertices`` must contain every id (isolated vertices become their
    own singleton component); ``edges`` are undirected (symmetrized
    internally, so (a,b) with a<b once is enough).
    """
    # the symmetrized edge set joins into EVERY propagation round — left
    # lazy it would re-execute the whole upstream edge pipeline (e.g. a
    # full MinHash-LSH pass) once per round; checkpoint it once
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=True)
    )
    # eager localCheckpoint per round: truncates the iterative lineage
    # (without it, consuming round k re-executes every earlier round —
    # an exponentially-branching recompute tree) and materializes the
    # round so the previous round's blocks can be dropped immediately
    ckpt = vertices.select(
        F.col(vid).alias("u"), F.col(vid).alias("comp")
    ).localCheckpoint(eager=True)
    labels = ckpt

    for _ in range(max_iter):
        nb_min = (
            sym.join(
                labels.select(
                    F.col("u").alias("v"), F.col("comp").alias("vcomp")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("nb_min"))
        )
        new = labels.join(nb_min, "u", "left").select(
            "u",
            F.least(
                F.col("comp"), F.coalesce(F.col("nb_min"), F.col("comp"))
            ).alias("comp"),
            (F.coalesce(F.col("nb_min"), F.col("comp")) < F.col("comp"))
            .cast("long")
            .alias("_chg"),
        ).localCheckpoint(eager=True)
        changed = new.agg(F.sum("_chg")).collect()[0][0] or 0
        # previous round's blocks freed NOW (next round is already
        # materialized) — at most two rounds of label blocks ever live
        _release_local_checkpoint(ckpt)
        ckpt = new
        labels = new.select("u", "comp")
        if changed == 0:
            # the FINAL checkpoint's blocks stay (the returned frame
            # reads them); released when the frame is GC'd
            _release_local_checkpoint(sym)
            return labels.select(F.col("u").alias(vid), "comp")
    _release_local_checkpoint(ckpt)
    _release_local_checkpoint(sym)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(pathological chain graph? use a larger max_iter or the "
        "large-star/small-star variant)"
    )


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) over near-dup ``pairs``
    (columns doc_a/doc_b).  cluster_id = min doc_id of the component;
    every document appears (singletons cluster with themselves)."""
    comp = connected_components(
        docs.select(id_col),
        pairs.select("doc_a", "doc_b"),
        vid=id_col,
        src="doc_a",
        dst="doc_b",
    ).withColumnRenamed("comp", "cluster_id")
    sizes = comp.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return comp.join(sizes, "cluster_id").select(
        id_col, "cluster_id", "cluster_size"
    )
