"""LTTB downsample: kernel vs an independent exact-Fraction reference,
structural invariants, passthrough, partition invariance."""

from fractions import Fraction

import numpy as np
import pytest

from eristropy_spark.operators.lttb import lttb_downsample, lttb_select


def _lttb_ref(v, nb):
    """Straight-from-the-thesis LTTB with exact Fraction centroid
    averages — independent of the kernel's cleared-denominator
    integer algebra.  Ties break toward the smaller index."""
    n = len(v)
    if n <= nb:
        return list(range(n))
    nbi = nb - 2
    ni = n - 2
    buckets = [[] for _ in range(nbi)]
    for p in range(ni):
        buckets[(p * nbi) // ni].append(p + 1)
    sel = [0]
    a = 0
    for j in range(nbi):
        if j < nbi - 1:
            nxt = buckets[j + 1]
            ct = Fraction(sum(i + 1 for i in nxt), len(nxt))
            cv = Fraction(sum(int(v[i]) for i in nxt), len(nxt))
        else:
            ct, cv = Fraction(n), Fraction(int(v[n - 1]))
        best, besti = None, None
        ta, va = Fraction(a + 1), Fraction(int(v[a]))
        for i in buckets[j]:
            tb, vb = Fraction(i + 1), Fraction(int(v[i]))
            area = abs((ta - ct) * (vb - va) - (ta - tb) * (cv - va))
            if best is None or area > best:
                best, besti = area, i
        sel.append(besti)
        a = besti
    sel.append(n - 1)
    return sel


def test_select_matches_fraction_reference():
    rng = np.random.default_rng(19)
    for trial in range(200):
        n = int(rng.integers(3, 150))
        nb = int(rng.integers(3, 12))
        v = rng.integers(-2000, 2000, size=n)
        assert lttb_select(v, nb) == _lttb_ref(v, nb), (trial, n, nb)


def test_structural_invariants():
    rng = np.random.default_rng(3)
    v = rng.integers(-500, 500, size=300)
    sel = lttb_select(v, 20)
    assert len(sel) == 20
    assert sel[0] == 0 and sel[-1] == 299
    assert sel == sorted(sel) and len(set(sel)) == 20


def test_spike_is_kept():
    # a lone extreme spike must survive any shape-preserving downsample
    v = np.zeros(200, dtype=np.int64)
    v[137] = 100000
    sel = lttb_select(v, 10)
    assert 137 in sel


def test_operator_passthrough_and_partition_invariance(spark):
    rng = np.random.default_rng(7)
    seqs = [
        [int(x) for x in rng.integers(-100, 100, size=int(n))]
        for n in rng.integers(2, 40, 10)
    ]
    df = spark.createDataFrame(
        [(f"d{i}", s) for i, s in enumerate(seqs)],
        "doc_id string, tokens array<int>",
    )
    a = lttb_downsample(df.repartition(1), n_out=8).orderBy("doc_id", "t").collect()
    b = lttb_downsample(df.repartition(5), n_out=8).orderBy("doc_id", "t").collect()
    assert a == b
    by_doc = {}
    for r in a:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, s in enumerate(seqs):
        got = by_doc[f"d{i}"]
        if len(s) <= 8:
            assert [r.v for r in got] == s  # passthrough keeps everything
        else:
            assert len(got) == 8
            assert got[0].t == 1 and got[-1].t == len(s)
