"""Sequence packing: manifest correctness vs a local recomputation,
partition invariance, tail handling, and pack materialization."""

import hashlib

import pytest

from eristropy_spark.operators.packing import materialize_packs, pack_sequences

SEQ_LEN = 16
N_SHARDS = 4
SEP = 1


def _mk_docs(spark, n_docs=37, seed=7):
    rows = []
    for i in range(n_docs):
        # deterministic ragged lengths 1..40: some docs span several
        # packs, some packs hold several docs
        ln = (i * 13 + seed) % 40 + 1
        rows.append((i, " ".join(f"w{i}_{j}" for j in range(ln))))
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def _local_manifest(rows, seq_len=SEQ_LEN, n_shards=N_SHARDS, sep=SEP,
                    drop_last=True):
    shards = {}
    for doc_id, text in rows:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16)
        shards.setdefault(b % n_shards, []).append((doc_id, text))
    expect = set()
    for shard, docs in shards.items():
        off = 0
        segs = []
        for doc_id, text in sorted(docs):
            n = len(text.split(" "))
            for p in range(off // seq_len, (off + n - 1) // seq_len + 1):
                g0, g1 = max(off, p * seq_len), min(off + n, (p + 1) * seq_len)
                segs.append((shard, p, doc_id, g0 - off + 1, g1 - g0,
                             g0 - p * seq_len))
            off += n + sep
        n_full = off // seq_len
        for row in segs:
            if not drop_last or row[1] < n_full:
                expect.add(row)
    return expect


def test_manifest_matches_local_recomputation(spark):
    rows, docs = _mk_docs(spark)
    got = {tuple(r) for r in pack_sequences(
        docs, seq_len=SEQ_LEN, n_shards=N_SHARDS, sep=SEP).collect()}
    assert got == _local_manifest(rows)


def test_manifest_partition_invariant(spark):
    rows, docs = _mk_docs(spark, n_docs=53)
    a = {tuple(r) for r in pack_sequences(docs, seq_len=SEQ_LEN).collect()}
    b = {tuple(r) for r in
         pack_sequences(docs.repartition(7), seq_len=SEQ_LEN).collect()}
    assert a == b and a


def test_drop_last_false_keeps_tail(spark):
    rows, docs = _mk_docs(spark)
    full = _local_manifest(rows, drop_last=False)
    got = {tuple(r) for r in pack_sequences(
        docs, seq_len=SEQ_LEN, n_shards=N_SHARDS, sep=SEP,
        drop_last=False).collect()}
    assert got == full
    assert full > _local_manifest(rows)  # tail packs really exist


def test_full_packs_exactly_covered(spark):
    """Each kept pack's segments + implied separators tile [0, seq_len)
    with no overlap — reconstructing the stream per shard proves it."""
    rows, docs = _mk_docs(spark, n_docs=41)
    man = pack_sequences(docs, seq_len=SEQ_LEN, n_shards=N_SHARDS,
                         sep=SEP).collect()
    packs = {}
    for r in man:
        packs.setdefault((r.shard, r.pack), []).append(r)
    assert packs
    for (shard, pack), segs in packs.items():
        covered = []
        for s in segs:
            assert 1 <= s.seg_start
            assert s.seg_len >= 1
            covered.extend(range(s.pack_pos, s.pack_pos + s.seg_len))
        assert len(covered) == len(set(covered))  # no overlap
        assert all(0 <= c < SEQ_LEN for c in covered)
        # gaps are separators: sep tokens per pack == docs ending here
        # (plus stream-start alignment) — at most n_docs gaps of size 1
        gaps = SEQ_LEN - len(covered)
        assert 0 <= gaps <= len(segs) + 1


def test_materialize_packs_exact(spark):
    rows, docs = _mk_docs(spark, n_docs=29)
    man = pack_sequences(docs, seq_len=SEQ_LEN, n_shards=N_SHARDS, sep=SEP)
    out = materialize_packs(docs, man, seq_len=SEQ_LEN).collect()
    words = {doc_id: text.split(" ") for doc_id, text in rows}
    # local stream build per shard
    shards = {}
    for doc_id, _ in rows:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16)
        shards.setdefault(b % N_SHARDS, []).append(doc_id)
    streams = {}
    for shard, ids in shards.items():
        toks = []
        for doc_id in sorted(ids):
            toks.extend(words[doc_id])
            toks.extend(["<|sep|>"] * SEP)
        streams[shard] = toks
    assert out
    for r in out:
        toks = r.pack_text.split(" ")
        assert len(toks) == SEQ_LEN
        lo = r.pack * SEQ_LEN
        assert toks == streams[r.shard][lo:lo + SEQ_LEN]
        assert r.n_docs >= 1


def test_validation():
    with pytest.raises(ValueError):
        pack_sequences(None, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(None, n_shards=0)
    with pytest.raises(ValueError):
        pack_sequences(None, n_shards=257)
    with pytest.raises(ValueError):
        pack_sequences(None, sep=-1)
