"""Winnowing fingerprints and exact duplicate-span detection: parity
with local recomputation, the winnowing guarantee, span merging, and
span removal."""

import hashlib

import pytest

from eristropy_spark.operators.fingerprint import (
    FNV_PRIME,
    drop_duplicate_spans,
    duplicate_spans,
    fingerprint_overlap,
    fingerprint_winnow,
)

K, W = 3, 4


def _wh(word):
    return int(hashlib.md5(word.encode()).hexdigest()[:15], 16)


def _gram(words):
    acc = 0
    for w in words:
        acc = (acc * FNV_PRIME + _wh(w)) % (1 << 64)
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def _local_winnow(text, k=K, w=W):
    ws = text.split(" ")
    m = len(ws) - k + 1
    if m < 1:
        return set()
    g = [_gram(ws[i:i + k]) for i in range(m)]
    out = set()
    for t in range(max(m - w + 1, 1)):
        win = g[t:t + w]
        mn = min(win)
        # rightmost minimum
        j = max(i for i, v in enumerate(win) if v == mn)
        out.add((t + j + 1, mn))
    return out


def _mk_docs():
    shared = "alpha beta gamma delta epsilon zeta"  # 6 >= k+w-1 tokens
    return [
        (0, f"one two three {shared} four five six"),
        (1, f"seven eight {shared} nine ten eleven twelve"),
        (2, "unique words only here nothing repeats at all today"),
        (3, "xx yy"),  # shorter than k: no grams
    ]


def test_winnow_matches_local(spark):
    rows = _mk_docs()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in fingerprint_winnow(df, k=K, w=W).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {i: _local_winnow(t) for i, t in rows if _local_winnow(t)}
    assert got == want


def test_winnow_guarantee_shared_substring(spark):
    rows = _mk_docs()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in fingerprint_winnow(df, k=K, w=W).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    # docs 0 and 1 share a 6-token substring >= k+w-1 = 6
    assert fps[0] & fps[1]
    assert not (fps.get(2, set()) & fps[0])
    assert 3 not in fps  # too short


def test_winnow_partition_invariant(spark):
    rows = _mk_docs()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(tuple(r) for r in fingerprint_winnow(df, k=K, w=W).collect())
    b = sorted(
        tuple(r)
        for r in fingerprint_winnow(df.repartition(5), k=K, w=W).collect()
    )
    assert a == b and a


def _local_overlap(rows, k=K, w=W, min_shared=1):
    fps = {i: {fp for _, fp in _local_winnow(t, k, w)} for i, t in rows}
    out = {}
    for a in sorted(fps):
        for b in sorted(fps):
            if a < b and len(fps[a] & fps[b]) >= min_shared:
                out[(a, b)] = len(fps[a] & fps[b])
    return out


def test_overlap_matches_local(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"one two three {shared} four five six"),
        (1, f"seven eight {shared} nine ten eleven"),
        (2, f"{shared} lead text with more shared tail words here"),
        (3, "unique words only here nothing repeats at all today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in fingerprint_overlap(df, k=K, w=W, min_shared=1).collect()
    }
    want = _local_overlap(rows)
    assert got == want
    assert (0, 1) in got  # the planted pair is actually detected


def test_overlap_min_shared_filters(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"one two three {shared} four five six"),
        (1, f"seven eight {shared} nine ten eleven"),
        (2, "unique words only here nothing repeats at all today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = _local_overlap(rows)
    t = max(base.values())  # raise the bar above the weakest pair
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in fingerprint_overlap(df, k=K, w=W, min_shared=t).collect()
    }
    assert got == {p: n for p, n in base.items() if n >= t}
    with pytest.raises(ValueError):
        fingerprint_overlap(df, min_shared=0)


def test_overlap_hot_bucket_stoplist(spark):
    # one boilerplate sentence shared by MANY docs: with the cap off all
    # pairs appear; a cap of 1 keeps only single-doc buckets, which by
    # construction cannot produce a pair
    boiler = "click here to accept all cookies and continue"
    rows = [(i, f"doc {i} body {boiler}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = fingerprint_overlap(
        df, k=K, w=W, min_shared=1, max_bucket_size=None
    ).count()
    assert full == 12 * 11 // 2
    capped = fingerprint_overlap(
        df, k=K, w=W, min_shared=1, max_bucket_size=1
    ).count()
    assert capped == 0


def test_duplicate_spans_planted(spark):
    dup = "red orange yellow green blue"
    rows = [
        (0, f"{dup} one two three four five"),
        (1, f"six seven eight {dup} nine ten"),
        (2, "no duplicated content in this document whatsoever right"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in duplicate_spans(df, k=3, min_count=2).collect()
    )
    # k=3 grams of dup occur twice; spans cover the full 5-token phrase:
    # doc 0 tokens 1-5, doc 1 tokens 4-8
    assert got == [(0, 1, 5), (1, 4, 5)]


def test_duplicate_spans_merge_and_within_doc(spark):
    # within-document repetition also counts; overlapping grams merge
    # into ONE maximal span per region
    rows = [(0, "p q r s p q r s tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in duplicate_spans(df, k=3, min_count=2).collect()
    )
    # grams (p q r), (q r s) appear twice -> positions 1,2 and 5,6;
    # [1,5) and [2,6) merge; [5,9) and [6,10) merge; 2-5 gap <= k merges
    # everything into one span 1..8
    assert got == [(0, 1, 8)]


def test_drop_duplicate_spans(spark):
    dup = "red orange yellow green blue"
    rows = [
        (0, f"{dup} one two three four five"),
        (1, f"six seven eight {dup} nine ten"),
        (2, "untouched document stays put"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, k=3, min_count=2)
    got = {r.doc_id: (r.clean_text, r.n_dropped_tokens)
           for r in drop_duplicate_spans(df, spans).collect()}
    assert got[0] == ("one two three four five", 5)
    assert got[1] == ("six seven eight nine ten", 5)
    assert got[2] == ("untouched document stays put", 0)


def test_validation(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        fingerprint_winnow(df, k=0)
    with pytest.raises(ValueError):
        fingerprint_winnow(df, w=0)
    with pytest.raises(ValueError):
        duplicate_spans(df, k=0)
    with pytest.raises(ValueError):
        duplicate_spans(df, min_count=1)
