"""Corpus mixing (deterministic up/down-sampling) and vocabulary
building: local-recompute parity, determinism, tie-break pinning."""

import hashlib
from collections import Counter

import pytest

from eristropy_spark.operators.sampling import mix_corpus
from eristropy_spark.operators.text import build_vocab

RATES = {"a": 640, "b": 256, "c": 128, "d": 64}  # 2.5x, 1x, 0.5x, 0.25x


def _mk(spark, n=200):
    rows = [(i, "abcdx"[i % 5], f"t{i}") for i in range(n)]
    return rows, spark.createDataFrame(rows, "doc_id long, source string, text string")


def _bucket(salt, key):
    return int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:2], 16)


def _local(rows, rates, default=0, salt="mix"):
    out = []
    for doc_id, source, text in rows:
        r = rates.get(source, default)
        n = r // 256 + (1 if _bucket(salt, doc_id) < r % 256 else 0)
        for e in range(n):
            out.append((doc_id, source, text, e))
    return sorted(out)


def test_mix_matches_local_recomputation(spark):
    rows, df = _mk(spark)
    got = sorted(tuple(r) for r in mix_corpus(df, RATES).collect())
    assert got == _local(rows, RATES)
    # source 'x' (unlisted) dropped entirely; 'b' kept exactly once
    assert all(s != "x" for _, s, _, _ in got)
    b = [r for r in got if r[1] == "b"]
    assert len(b) == len([r for r in rows if r[1] == "b"])
    assert all(e == 0 for *_, e in b)
    # 'a' rows appear 2 or 3 times each (rate 640 = 2 + 128/256)
    a_counts = Counter(d for d, s, _, _ in got if s == "a")
    assert set(a_counts.values()) <= {2, 3} and len(set(a_counts.values())) == 2


def test_mix_partition_invariant_and_salted(spark):
    rows, df = _mk(spark, n=300)
    one = sorted(tuple(r) for r in mix_corpus(df, RATES).collect())
    two = sorted(tuple(r) for r in mix_corpus(df.repartition(7), RATES).collect())
    assert one == two
    other = sorted(tuple(r) for r in mix_corpus(df, RATES, salt="v2").collect())
    assert other == _local(rows, RATES, salt="v2")
    assert other != one  # re-deal without touching keys


def test_mix_default_keeps_unlisted(spark):
    rows, df = _mk(spark, n=100)
    got = sorted(tuple(r) for r in mix_corpus(df, {"a": 512}, default=256).collect())
    assert got == _local(rows, {"a": 512}, default=256)
    assert any(s == "x" for _, s, _, _ in got)


def test_mix_validation(spark):
    _, df = _mk(spark, n=5)
    with pytest.raises(ValueError):
        mix_corpus(df, {})
    with pytest.raises(ValueError):
        mix_corpus(df, {"a": -1})
    with pytest.raises(ValueError):
        mix_corpus(df, {"a": 1}, default=-2)


def test_vocab_matches_counter(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat",
        "a cat and a dog",
        "mat mat mat",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    counts = Counter(w for t in texts for w in t.split(" "))
    got = [(r.token, r.cnt) for r in build_vocab(df, top_k=100).collect()]
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want
    # min_count prunes singletons
    got2 = {r.token for r in build_vocab(df, top_k=100, min_count=2).collect()}
    assert got2 == {w for w, c in counts.items() if c >= 2}


def test_vocab_topk_cut_deterministic(spark):
    # 6 tokens all with count 2 — the k=3 cut must take the 3
    # lexicographically smallest, on any partitioning
    df = spark.createDataFrame(
        [(i, "zz yy xx ww vv uu") for i in range(2)],
        "doc_id long, text string",
    )
    got = [r.token for r in build_vocab(df, top_k=3).collect()]
    assert got == ["uu", "vv", "ww"]
    got7 = [r.token for r in build_vocab(df.repartition(5), top_k=3).collect()]
    assert got7 == got


def test_vocab_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        build_vocab(df, top_k=0)
    with pytest.raises(ValueError):
        build_vocab(df, min_count=0)


# ---------------------------------------------------------- unigram_logprob

def _lp_docs():
    return [
        (0, "the cat sat on the mat"),
        (1, "the dog ate the cat food"),
        (2, "zx qq vv totally novel tokens"),
        (3, "the the the"),
    ]


def _local_logprob(rows, vocab_counts, alpha=1.0):
    import math

    N = sum(vocab_counts.values())
    V = len(vocab_counts)
    out = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        lps = [
            math.log((vocab_counts.get(t, 0) + alpha) / (N + alpha * (V + 1)))
            for t in toks
        ]
        out[doc_id] = (len(toks), sum(lps) / len(lps))
    return out


def test_unigram_logprob_matches_local(spark):
    import math

    rows = _lp_docs()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = build_vocab(docs, top_k=1000, min_count=1)
    counts = {r.token: r.cnt for r in vocab.collect()}
    from eristropy_spark.operators.text import unigram_logprob

    got = {
        r.doc_id: (r.n_tok, r.logprob)
        for r in unigram_logprob(docs, vocab).collect()
    }
    want = _local_logprob(rows, counts)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert math.isclose(got[d][1], want[d][1], rel_tol=1e-12)
    # the all-common-words doc is the most "typical" of this corpus,
    # the all-novel doc the least
    assert got[3][1] > got[2][1]


def test_unigram_logprob_oov_floor_and_alpha(spark):
    import math

    rows = _lp_docs()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # reference vocabulary from ANOTHER corpus: doc 2 is fully OOV
    ref = spark.createDataFrame(
        [("the", 10), ("cat", 5)], "token string, cnt long"
    )
    from eristropy_spark.operators.text import unigram_logprob

    got = {
        r.doc_id: r.logprob
        for r in unigram_logprob(docs, ref, alpha=0.5).collect()
    }
    # every doc-2 token has cnt 0 -> identical smoothed floor
    floor = math.log(0.5 / (15 + 0.5 * 3))
    assert math.isclose(got[2], floor, rel_tol=1e-12)
    with pytest.raises(ValueError):
        unigram_logprob(docs, ref, alpha=0.0)
