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
