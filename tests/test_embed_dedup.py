"""Embedding-cosine near-dup tests — planted duplicates, exact vs LSH.

The driver testdata has no true near-dups (max pairwise cosine ≈ 0.51),
so value correctness for the scale path lives here: a corpus with
PLANTED near-duplicates (perturbed copies) where exact and LSH outputs
must agree pair-for-pair at the production threshold.
"""

import numpy as np
from pyspark.sql import Row

from eristropy_spark.operators.embed_dedup import (
    embedding_dup_pairs_exact,
    embedding_dup_pairs_lsh,
)


def _planted_corpus(spark, n_base=60, n_dups=25, dim=32):
    rng = np.random.default_rng(29)
    base = rng.normal(size=(n_base, dim))
    rows = [
        Row(vec_id=i, embedding=[float(v) for v in base[i]], label=0)
        for i in range(n_base)
    ]
    for j in range(n_dups):
        src = j % n_base
        noisy = base[src] + rng.normal(size=dim) * 0.03  # cosine ≈ 0.995
        rows.append(
            Row(vec_id=1000 + j, embedding=[float(v) for v in noisy], label=1)
        )
    return spark.createDataFrame(rows)


def _numpy_exact(rows, threshold):
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    import math

    out = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = vecs[a], vecs[b]
            # sequential fold to match the JVM aggregate order
            dot = 0.0
            for x, y in zip(va, vb):
                dot += float(x) * float(y)
            na = 0.0
            for x in va:
                na += float(x) * float(x)
            nb = 0.0
            for x in vb:
                nb += float(x) * float(x)
            cs = math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
            if cs >= threshold:
                out[(a, b)] = cs
    return out


def test_exact_matches_numpy(spark):
    emb = _planted_corpus(spark)
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_dup_pairs_exact(emb, threshold=0.9).collect()
    }
    want = _numpy_exact(emb.collect(), 0.9)
    assert got == want
    assert len(got) >= 25  # every planted dup found


def test_lsh_equals_exact_on_planted_dups(spark):
    emb = _planted_corpus(spark)
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_dup_pairs_exact(emb, threshold=0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_dup_pairs_lsh(
            emb, threshold=0.9, n_bits=8, n_tables=8
        ).collect()
    }
    # LSH ⊆ exact always; at cosine ≈0.995 the 8x8 configuration's miss
    # probability is ~(1-(1-θ/π)^8)^8 ≈ 1e-5 per pair — recall is total here
    assert set(lsh) <= set(exact)
    recall = len(lsh) / len(exact)
    assert recall >= 0.95, (recall, len(lsh), len(exact))
    for k in lsh:
        assert lsh[k] == exact[k]


def test_empty_when_no_dups(spark):
    rng = np.random.default_rng(31)
    rows = [
        Row(vec_id=i, embedding=[float(v) for v in rng.normal(size=16)], label=0)
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows)
    assert embedding_dup_pairs_lsh(emb, threshold=0.95).count() == 0


def test_auto_cap_does_not_collapse_recall(spark):
    """Regression for the fixed-cap blind spot: sign buckets have only
    2^n_bits keys per table, so once the corpus exceeds cap·2^n_bits an
    ABSOLUTE cap puts every bucket over the limit in every table and
    silently drops all candidates (recall → 0).  Miniature replica:
    n_bits=2 → 4 buckets/table, 85 vectors, absolute cap 8 → every pair
    gone; the default "auto" (relative) cap keeps the output identical
    to the uncapped run."""
    emb = _planted_corpus(spark)  # 85 rows
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs_lsh(
            emb, threshold=0.9, n_bits=2, n_tables=8, max_bucket_size=None
        ).collect()
    }
    assert len(uncapped) >= 25
    absolute = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs_lsh(
            emb, threshold=0.9, n_bits=2, n_tables=8, max_bucket_size=8
        ).collect()
    }
    assert absolute == set()  # the documented failure mode, pinned
    auto = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs_lsh(
            emb, threshold=0.9, n_bits=2, n_tables=8, max_bucket_size="auto"
        ).collect()
    }
    assert auto == uncapped


def test_drop_hot_buckets_relative_semantics(spark):
    """Direct pin of the "auto" cap arithmetic: with 256 buckets/table,
    hot_factor=8, min_cap=1 — a bucket holding ~90% of the table's rows
    (>8× uniform share) is dropped; normal-occupancy buckets are kept;
    and totals are PER TABLE (a small table alongside doesn't dilute
    the hot table's uniform share)."""
    from pyspark.sql import functions as F

    from eristropy_spark.operators.dedup import _drop_hot_buckets

    rows = [Row(vec_id=i, table_id=0, bucket=7) for i in range(1000)]
    rows += [
        Row(vec_id=1000 + i, table_id=0, bucket=10 + (i % 50)) for i in range(100)
    ]
    rows += [Row(vec_id=i, table_id=1, bucket=i % 200) for i in range(1100)]
    tabled = spark.createDataFrame(rows)
    kept = _drop_hot_buckets(
        tabled,
        ["table_id", "bucket"],
        "auto",
        n_buckets=256,
        hot_factor=8,
        min_cap=1,
    )
    per_table = {
        (r["table_id"], r["bucket"]): r["n"]
        for r in kept.groupBy("table_id", "bucket").agg(F.count("*").alias("n")).collect()
    }
    # table 0: uniform = 1100/256 ≈ 4.3, cap ≈ 34.4 → the 1000-row bucket
    # goes, the 2-row buckets stay
    assert (0, 7) not in per_table
    assert sum(n for (t, b), n in per_table.items() if t == 0) == 100
    # table 1: uniform = 1100/256 ≈ 4.3, buckets hold ≤ 6 rows → all kept
    assert sum(n for (t, b), n in per_table.items() if t == 1) == 1100

    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        _drop_hot_buckets(tabled, ["table_id", "bucket"], "auto").collect()
