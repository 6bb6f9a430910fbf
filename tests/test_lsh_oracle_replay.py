"""DuckDB text-LSH oracle replay vs local kernel replication (round 5).

The contract driver compares Spark vs the DuckDB oracle; this test
closes the triangle by comparing the DuckDB replay against a THIRD
implementation — a plain-numpy replication through the same public
kernels the golden tests use (_shingle_hashes_batch / _mix64).  All
three agreeing pins both the engine and the oracle.  No Spark session
needed: pure DuckDB + numpy.
"""

import math

import numpy as np
import pytest

duckdb = pytest.importorskip("duckdb")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return c


@pytest.fixture(scope="module")
def docs(con):
    return con.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()


def _local_minhash_pairs(docs, threshold=0.2, k=64, bands=16, n=3, seed=17):
    from eristropy_spark.operators.dedup import _mix64, _shingle_hashes_batch

    rows = k // bands
    ids = [d[0] for d in docs]
    texts = [d[1] for d in docs]
    bases = _shingle_hashes_batch(texts, n)
    seeds = np.random.RandomState(seed).randint(1, 2**31, size=k).astype(np.uint64)
    sigs = {
        i: (
            _mix64(base[None, :], seeds[:, None]).min(axis=1)
            if base.size
            else np.zeros(k, dtype=np.uint64)
        )
        for i, base in zip(ids, bases)
    }
    buckets: dict = {}
    for i in ids:
        for b in range(bands):
            key = (b, tuple(sigs[i][b * rows : (b + 1) * rows].tolist()))
            buckets.setdefault(key, []).append(i)
    cands = {
        (a, b)
        for mem in buckets.values()
        for ai, a in enumerate(sorted(mem))
        for b in sorted(mem)[ai + 1 :]
    }
    shs = {}
    for i, t in zip(ids, texts):
        ws = t.lower().split(" ")
        shs[i] = (
            {" ".join(ws[p : p + n]) for p in range(len(ws) - n + 1)}
            if len(ws) >= n
            else set()
        )
    out = {}
    for a, b in cands:
        inter = len(shs[a] & shs[b])
        denom = len(shs[a]) + len(shs[b]) - inter
        if denom == 0:
            continue
        j = math.floor(inter / denom * 1e6 + 0.5) / 1e6
        if j >= threshold:
            out[(a, b)] = j
    return out


def _local_simhash_pairs(docs, max_hamming=8, seed=17, n=2):
    from eristropy_spark.operators.dedup import _mix64, _shingle_hashes_batch

    ids = [d[0] for d in docs]
    bases = _shingle_hashes_batch([d[1] for d in docs], n)
    shifts = np.arange(64, dtype=np.uint64)
    sims = {}
    for i, base in zip(ids, bases):
        if base.size == 0:
            sims[i] = 0
            continue
        hashes = _mix64(base, seed)
        ones = ((hashes[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
        vote = 2 * ones.astype(np.int64) - base.size
        sims[i] = int(((vote > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
    n_bands = max_hamming + 1
    base_w = 64 // n_bands
    extra = 64 - base_w * n_bands
    offsets, widths, off = [], [], 0
    for b in range(n_bands):
        w = base_w + (1 if b < extra else 0)
        offsets.append(off)
        widths.append(w)
        off += w
    buckets: dict = {}
    for i in ids:
        for b in range(n_bands):
            key = (b, (sims[i] >> offsets[b]) & ((1 << widths[b]) - 1))
            buckets.setdefault(key, []).append(i)
    cands = {
        (a, b)
        for mem in buckets.values()
        for ai, a in enumerate(sorted(mem))
        for b in sorted(mem)[ai + 1 :]
    }
    return {
        (a, b): bin(sims[a] ^ sims[b]).count("1")
        for a, b in cands
        if bin(sims[a] ^ sims[b]).count("1") <= max_hamming
    }


def test_minhash_oracle_sql_equals_local_replication(con, docs):
    import __spark_entry__ as entry

    got = {
        (r[0], r[1]): r[2]
        for r in con.sql(entry._oracle_minhash_lsh()).fetchall()
    }
    want = _local_minhash_pairs(docs)
    assert got == want
    assert len(want) > 0  # the fixture corpus must actually exercise it


def test_simhash_oracle_sql_equals_local_replication(con, docs):
    import __spark_entry__ as entry

    got = {
        (r[0], r[1]): r[2] for r in con.sql(entry._oracle_simhash()).fetchall()
    }
    want = _local_simhash_pairs(docs)
    assert got == want
    assert len(want) > 0


def test_word_hash_sql_scheme_matches_kernel(con):
    """The codepoint-polynomial word hash replays exactly in SQL across
    edge shapes: >16-char words (truncation + length salt), words
    sharing a 16-char prefix, unicode, empty string."""
    from eristropy_spark.operators.dedup import (
        _WORD_LEN_SALT,
        _WORD_POWS,
        _WORD_SEED,
        _mix64,
    )
    import __spark_entry__ as entry

    words = ["a" * 16, "a" * 17, "a" * 30, "héllo", "wörd", "", "x", "Ωmega"]
    cps = (
        np.array(words, dtype="<U16").view(np.uint32).reshape(len(words), 16)
        .astype(np.uint64)
    )
    lens = np.fromiter((len(w) for w in words), dtype=np.uint64, count=len(words))
    poly = (cps * _WORD_POWS).sum(axis=1, dtype=np.uint64)
    want = _mix64(poly ^ (lens * _WORD_LEN_SALT), _WORD_SEED)

    poly_sql = " + ".join(
        f"(CAST(CASE WHEN wl >= {j + 1} THEN unicode(substr(wd, {j + 1}, 1)) "
        f"ELSE 0 END AS HUGEINT) * {int(_WORD_POWS[j])})"
        for j in range(16)
    )
    base = (
        f"SELECT k, xor(h0, (wl * {int(_WORD_LEN_SALT)}) % {entry._M64}) AS hx "
        f"FROM (SELECT k, ({poly_sql}) % {entry._M64} AS h0, wl "
        f"FROM (SELECT k, wd, CAST(length(wd) AS HUGEINT) AS wl FROM words))"
    )
    q = entry._chain_sql(
        base, ["k"], entry._mix64_sql_steps("hx", "wh", int(_WORD_SEED))
    )
    con.sql("CREATE OR REPLACE TABLE words(k INT, wd VARCHAR)")
    con.executemany("INSERT INTO words VALUES (?, ?)", list(enumerate(words)))
    got = dict(con.sql(f"SELECT k, wh FROM ({q})").fetchall())
    for k, w in enumerate(words):
        assert int(got[k]) == int(want[k]), (w, got[k], int(want[k]))
