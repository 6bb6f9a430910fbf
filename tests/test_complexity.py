"""LZ76 complexity: kernel vs the independent Kaspar–Schuster pointer
algorithm, closed-form anchors, operator edges, partition invariance."""

import numpy as np
import pytest

from eristropy_spark.operators.complexity import lz76_phrases, lz_complexity


def _ks_phrases(s):
    """Kaspar & Schuster 1987 pointer algorithm (Phys. Rev. A 36,
    Fig. 1) — the standard production form of the LZ76 exhaustive
    history, implemented independently of the kernel's
    definition-direct parse."""
    s = list(s)
    n = len(s)
    if n == 0:
        return 0
    if n == 1:
        return 1
    c = 1
    l = 1
    i = 0
    k = 1
    kmax = 1
    while True:
        if s[i + k - 1] == s[l + k - 1]:
            k += 1
            if l + k > n:
                c += 1
                break
        else:
            kmax = max(kmax, k)
            i += 1
            if i == l:
                c += 1
                l += kmax
                if l + 1 > n:
                    break
                i = 0
                k = 1
                kmax = 1
            else:
                k = 1
    return c


def test_kernel_matches_kaspar_schuster():
    rng = np.random.default_rng(2)
    for trial in range(300):
        alpha = int(rng.integers(2, 6))
        n = int(rng.integers(1, 60))
        x = rng.integers(0, alpha, size=n)
        assert lz76_phrases(x) == _ks_phrases(x), (trial, x.tolist())


def test_closed_form_anchors():
    # constant: one symbol phrase + one terminal reproducible phrase
    assert lz76_phrases(np.array([7] * 50)) == 2
    # single symbol
    assert lz76_phrases(np.array([3])) == 1
    # strict alternation: 0 | 1 | 00? no — 0,1,01...: c grows ~3
    assert lz76_phrases(np.array([0, 1] * 30)) == 3
    # i.i.d. uniform over a big alphabet: phrases stay short, c ~ n/2
    rng = np.random.default_rng(5)
    x = rng.integers(0, 10**6, size=200)
    assert lz76_phrases(x) > 80


def test_operator_edges_and_partition_invariance(spark):
    rng = np.random.default_rng(11)
    seqs = [
        [int(v) for v in rng.integers(0, 5, size=int(n))]
        for n in rng.integers(1, 40, 8)
    ]
    rows_df = spark.createDataFrame(
        [(f"d{i}", s) for i, s in enumerate(seqs)]
        + [("flat", [9] * 20), ("null", None)],
        "doc_id string, tokens array<int>",
    )
    a = lz_complexity(rows_df.repartition(1)).orderBy("doc_id").collect()
    b = lz_complexity(rows_df.repartition(5)).orderBy("doc_id").collect()
    assert a == b
    rows = {r.doc_id: r for r in a}
    for i, s in enumerate(seqs):
        r = rows[f"d{i}"]
        assert r.c == lz76_phrases(np.array(s))
        assert r.alpha == len(set(s))
        if r.n >= 2 and r.alpha >= 2:
            want = (r.c * np.log(r.n)) / (r.n * np.log(r.alpha))
            assert r.c_norm == pytest.approx(want, abs=1e-6)
    assert rows["flat"].c == 2 and rows["flat"].c_norm is None
    assert rows["null"].c == 0 and rows["null"].n == 0


def test_fast_kernel_equivalent_to_definition():
    import numpy as np

    from eristropy_spark.operators.complexity import (
        lz76_phrases,
        lz76_phrases_fast,
    )

    rng = np.random.default_rng(77)
    for _ in range(200):
        n = int(rng.integers(0, 50))
        x = rng.integers(
            -int(rng.integers(1, 5)), int(rng.integers(2, 9)), size=n
        ).astype(np.int64)
        assert lz76_phrases_fast(x) == lz76_phrases(x)


def test_match_lengths_brute():
    import numpy as np

    from eristropy_spark.operators.complexity import match_lengths

    def brute(x):
        out = []
        for p in range(len(x)):
            lmax = 0
            while p + lmax < len(x):
                sub = list(x[p : p + lmax + 1])
                pre = list(x[:p])
                found = any(
                    pre[i : i + len(sub)] == sub
                    for i in range(len(pre) - len(sub) + 1)
                )
                if not found:
                    break
                lmax += 1
            out.append(lmax)
        return out

    rng = np.random.default_rng(78)
    for _ in range(100):
        x = rng.integers(0, 5, size=int(rng.integers(0, 30))).astype(np.int64)
        assert match_lengths(x).tolist() == brute(x)


def test_entropy_rate_discriminates(spark):
    import numpy as np

    from eristropy_spark.operators.complexity import lz_entropy_rate

    rng = np.random.default_rng(79)
    seqs = {
        "const": [3] * 200,
        "period": [1, 2, 3, 4] * 50,
        "noise": [int(v) for v in rng.integers(0, 8, size=200)],
        "tiny": [1, 2],
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in seqs.items()], "doc_id string, tokens array<int>"
    )
    out = {r["doc_id"]: r for r in lz_entropy_rate(df).collect()}
    # deterministic sequences -> rate near 0; iid over 8 symbols -> near 3 bits
    assert out["const"]["h_bits"] < 0.2
    assert out["period"]["h_bits"] < 0.5
    assert out["noise"]["h_bits"] > 1.5
    assert out["const"]["h_bits"] < out["period"]["h_bits"] < out["noise"]["h_bits"]
    assert out["tiny"]["h_bits"] is None and out["tiny"]["m"] == 0
    # nats = ln2 * bits (both rounded at 6dp)
    import math
    for k in ("const", "period", "noise"):
        assert out[k]["h_nats"] == pytest.approx(
            math.log(2) * out[k]["h_bits"], abs=2e-6
        )
