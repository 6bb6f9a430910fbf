"""Matrix profile: golden vs a scalar brute-force reference, edge
cases, the exact-integer guard, and partition invariance."""

import numpy as np
import pytest

from eristropy_spark.operators.matrixprofile import matrix_profile


def _mp_brute(x, w, sep):
    """Scalar z-norm nearest-neighbor profile, straight from Yeh et al.
    2016 — float path, independent of the operator's integer algebra."""
    x = np.asarray(x, float)
    P = len(x) - w + 1
    out = []
    for i in range(P):
        a = x[i : i + w]
        best, bj = np.inf, None
        if a.std() > 0:
            az = (a - a.mean()) / a.std()
            for j in range(P):
                if abs(i - j) < sep:
                    continue
                b = x[j : j + w]
                if b.std() == 0:
                    continue
                bz = (b - b.mean()) / b.std()
                d = float(np.sqrt(((az - bz) ** 2).sum()))
                d6 = np.floor(d * 1e6 + 0.5) / 1e6
                if d6 < best:
                    best, bj = d6, j
        out.append((i, bj, None if bj is None else best))
    return out


def _df(spark, seqs):
    return spark.createDataFrame(
        [(f"d{i}", [int(t) for t in s]) for i, s in enumerate(seqs)],
        "doc_id string, tokens array<int>",
    )


def test_matches_bruteforce_golden(spark):
    rng = np.random.default_rng(11)
    seqs = [rng.integers(-400, 400, size=int(n)) for n in rng.integers(20, 90, 8)]
    seqs[2][5:14] = 3  # planted flat span
    w, sep = 8, 2
    rows = (
        matrix_profile(_df(spark, seqs), w=w, min_sep=sep)
        .orderBy("doc_id", "pos")
        .collect()
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, s in enumerate(seqs):
        ref = _mp_brute(s, w, sep)
        got = by_doc[f"d{i}"]
        assert len(got) == len(ref) == len(s) - w + 1
        for (pi, pj, pd), r in zip(ref, got):
            assert r.pos == pi
            assert r.nn_idx == pj
            if pd is None:
                assert r.dist is None
            else:
                assert r.dist == pytest.approx(pd, abs=2e-6)


def test_edges_short_and_flat(spark):
    # shorter than w -> no rows; all-flat -> all-NULL rows
    df = _df(spark, [[1, 2, 3], [5] * 12])
    rows = matrix_profile(df, w=4, min_sep=1).orderBy("doc_id", "pos").collect()
    assert all(r.doc_id == "d1" for r in rows)
    assert len(rows) == 9
    assert all(r.nn_idx is None and r.dist is None for r in rows)


def test_exact_integer_guard(spark):
    big = [0, 2**30, -(2**30), 17] * 4
    with pytest.raises(Exception, match="2\\^52"):
        matrix_profile(_df(spark, [big]), w=4).collect()


def test_partition_invariance(spark):
    rng = np.random.default_rng(23)
    seqs = [rng.integers(0, 1000, size=60) for _ in range(6)]
    df = _df(spark, seqs)
    a = matrix_profile(df.repartition(1), w=8).orderBy("doc_id", "pos").collect()
    b = matrix_profile(df.repartition(7), w=8).orderBy("doc_id", "pos").collect()
    assert a == b


def test_planted_motif(spark):
    rng = np.random.default_rng(5)
    x = rng.integers(-300, 300, size=80)
    motif = rng.integers(-300, 300, size=10)
    x[10:20] = motif
    x[55:65] = motif
    rows = {
        r.pos: r
        for r in matrix_profile(_df(spark, [x]), w=10, min_sep=3).collect()
    }
    assert rows[10].nn_idx == 55 and rows[10].dist == 0.0
    assert rows[55].nn_idx == 10 and rows[55].dist == 0.0
