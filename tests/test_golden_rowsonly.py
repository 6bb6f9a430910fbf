"""Value-level golden checks for the contract queries with no SQL oracle.

CORRECTNESS_r01 left seven queries rows-only (``err: "no_oracle"``).
Each test here recomputes the query's expected VALUES through an
independent local path — DuckDB for tokenization, plain pandas/NumPy +
the kernel layer for the math, sequential-fold float arithmetic where
the Spark plan folds (so doubles match bit-for-bit) — and compares the
full result set against the Spark contract query at sf0.01.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry
from eristropy_spark.kernels import adf as adf_kernel
from eristropy_spark.kernels.lake import cp_mean_sd
from eristropy_spark.kernels.permen import permen
from eristropy_spark.kernels.sampen_batch import sampen_many

SF_DIR = "/root/testdata/sf0.01"


def _r6(x):
    """floor(x*1e6+0.5)/1e6 with NaN/None passthrough (matches _r6/round6)."""
    if x is None:
        return None
    if isinstance(x, float) and math.isnan(x):
        return float("nan")
    return math.floor(x * 1e6 + 0.5) / 1e6


def _nullable(x):
    """Spark NULL and NaN compare equal to local NaN/None."""
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return None
    return x


def _tokens_local():
    """doc_id -> (tokens float64, source) via DuckDB (independent engine;
    the tokenize query itself is oracle-verified)."""
    con = duckdb.connect()
    df = con.sql(
        f"""
        SELECT user_id || ':' || event_type AS doc_id,
               event_type AS source,
               list(CAST(round(value * 100) AS INT) ORDER BY ts, event_id) AS tokens
        FROM read_parquet('{SF_DIR}/events.parquet')
        GROUP BY user_id, event_type
        """
    ).df()
    return {
        r.doc_id: (np.asarray(r.tokens, dtype=np.float64), r.source)
        for r in df.itertuples()
    }


def _fold_sum(values):
    """Sequential left-fold sum — the evaluation order of Spark's
    F.aggregate, so doubles match the JVM bit-for-bit."""
    acc = 0.0
    for v in values:
        acc += float(v)
    return acc


def _znorm_fold(x):
    """Replicates functions.arrays.znormed: fold mean, fold ssq, ddof=1."""
    n = x.size
    mu = _fold_sum(x) / n
    sd = math.sqrt(_fold_sum((float(v) - mu) * (float(v) - mu) for v in x) / (n - 1))
    return (x - mu) / sd


def test_golden_sampen_permen(spark):
    got = {
        r["doc_id"]: (_nullable(r["sampen"]), _nullable(r["permen"]))
        for r in entry._q_sampen(spark, SF_DIR).collect()
    }
    toks = _tokens_local()
    assert set(got) == set(toks)
    for doc_id, (x, _src) in toks.items():
        s = float(sampen_many([x], 1, 0.2, normalize=True)[0])
        p = permen(x, 3, 1, normalize=True)
        want = (_nullable(_r6(s)), _nullable(_r6(p)))
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_golden_stationarity(spark):
    got = {
        r["doc_id"]: (_nullable(r["pvalue"]), r["is_stationary"])
        for r in entry._q_stationarity(spark, SF_DIR).collect()
    }
    toks = _tokens_local()
    assert set(got) == set(toks)
    doc_ids = sorted(toks)
    pvals = []
    for d in doc_ids:
        x = toks[d][0]
        if x.size < 2:
            pvals.append(1.0)
            continue
        try:
            pvals.append(adf_kernel.adfuller(np.diff(x))[1])
        except (ValueError, np.linalg.LinAlgError):
            pvals.append(1.0)
    reject = adf_kernel.holm_sidak_reject(np.asarray(pvals), alpha=0.05)
    for d, p, rej in zip(doc_ids, pvals, reject):
        want = (_nullable(_r6(p)), bool(rej))
        assert got[d] == want, (d, got[d], want)


def test_golden_sampen_eff(spark):
    got = {
        r["doc_id"]: (r["sampen"], r["se_sampen"])
        for r in entry._q_sampen_eff(spark, SF_DIR).collect()
    }
    toks = _tokens_local()
    assert set(got) == set(toks)
    rs = np.arange(0.1, 0.51, 0.05)
    pts = np.arange(0.1, 0.51, 0.01)
    z = {d: _znorm_fold(x) for d, (x, _s) in toks.items()}
    objs = []
    from eristropy_spark.functions.efficiency import counting_obj

    for r in rs:
        vals = np.array([counting_obj(z[d], 1, float(r)) for d in sorted(z)])
        ok = vals[~np.isnan(vals)]
        objs.append(float(np.median(ok)) if ok.size else np.nan)
    fine = np.interp(pts, rs, np.asarray(objs))
    r_star = float(pts[np.nanargmin(fine)])
    for d in sorted(z):
        try:
            cp, s_cp = cp_mean_sd(z[d], 1, r_star)
            want = (_nullable(_r6(-math.log(cp))), _nullable(_r6(s_cp / cp)))
        except (ZeroDivisionError, ValueError):
            want = (None, None)
        have = (_nullable(got[d][0]), _nullable(got[d][1]))
        assert have == want, (d, have, want, r_star)


def _docs_local():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def _shingle_set(text, n=3):
    words = text.lower().split(" ")
    if len(words) < n:
        return set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def test_golden_minhash_lsh(spark):
    from eristropy_spark.operators.dedup import _mix64, _shingle_hashes

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in entry._q_minhash_lsh(spark, SF_DIR).collect()
    }
    docs = _docs_local()
    k, bands, n, thr, seed = 64, 16, 3, 0.2, 17
    rows_per_band = k // bands
    seeds = np.random.RandomState(seed).randint(1, 2**31, size=k).astype(np.uint64)
    sigs, shingles = {}, {}
    for r in docs.itertuples():
        text = r.text
        base = _shingle_hashes(text, n) if text else None
        sigs[r.doc_id] = (
            [0] * k
            if not text
            else [int(_mix64(base, int(s)).min().astype(np.int64)) for s in seeds]
        )
        shingles[r.doc_id] = _shingle_set(text, n)
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sigs[a], sigs[b]
            if not any(
                sa[t * rows_per_band : (t + 1) * rows_per_band]
                == sb[t * rows_per_band : (t + 1) * rows_per_band]
                for t in range(bands)
            ):
                continue
            A, B = shingles[a], shingles[b]
            if not A or not B:
                continue
            j = len(A & B) / (len(A) + len(B) - len(A & B))
            if _r6(j) >= thr:
                lo, hi = (a, b) if a < b else (b, a)
                want[(lo, hi)] = _r6(j)
    assert got == want


def test_golden_simhash_vs_bruteforce(spark):
    from eristropy_spark.operators.dedup import _mix64, _shingle_hashes

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in entry._q_simhash(spark, SF_DIR).collect()
    }
    docs = _docs_local()
    sims = {}
    for r in docs.itertuples():
        if not r.text:
            sims[r.doc_id] = 0
            continue
        hashes = _mix64(_shingle_hashes(r.text, 2), 17)
        bits = (
            (hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int64)
        vote = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in range(64):
            if vote[b] > 0:
                sim |= np.uint64(1) << np.uint64(b)
        sims[r.doc_id] = int(sim)
    ids = sorted(sims)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= 8:
                lo, hi = (a, b) if a < b else (b, a)
                want[(lo, hi)] = h
    # banding guarantees recall at <= max_hamming and popcount verifies,
    # so the LSH output must EQUAL brute force
    assert got == want


def test_golden_similarity_lsh(spark):
    got = {
        (r["query_id"], r["neighbor_id"]): (r["rank"], r["cos_sim"])
        for r in entry._q_similarity_lsh(spark, SF_DIR).collect()
    }
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    dim = len(next(iter(vecs.values())))
    n_bits, n_tables, seed, k = 8, 8, 17, 5
    planes = np.random.RandomState(seed).normal(size=(n_tables, n_bits, dim))
    weights = (2 ** np.arange(n_bits)).astype(np.int64)
    codes = {
        vid: [int(s @ weights) for s in (np.einsum("tbd,d->tb", planes, v) > 0).astype(np.int64)]
        for vid, v in vecs.items()
    }
    queries = [q for q in range(10) if q in vecs]
    want = {}
    for q in queries:
        cands = {
            vid
            for vid, c in codes.items()
            if vid != q and any(c[t] == codes[q][t] for t in range(n_tables))
        }
        scored = []
        for nid in cands:
            dot = _fold_sum(
                float(a) * float(b) for a, b in zip(vecs[q], vecs[nid])
            )
            nq = math.sqrt(_fold_sum(float(a) * float(a) for a in vecs[q]))
            nv = math.sqrt(_fold_sum(float(a) * float(a) for a in vecs[nid]))
            scored.append((nid, _r6(dot / (nq * nv))))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (nid, cs) in enumerate(scored[:k], start=1):
            want[(q, nid)] = (rank, cs)
    assert got == want


def test_golden_multimodal(spark):
    from eristropy_spark.operators.multimodal import decode_payload, documents_to_assets

    got = {
        r["asset_id"]: (r["kind"], r["n_bytes"], r["width"], r["height"], r["n_frames"])
        for r in entry._q_multimodal(spark, SF_DIR).collect()
    }
    assets = documents_to_assets(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ).collect()
    assert len(got) == len(assets)
    for a in assets:
        d = decode_payload(bytes(a["payload"]), a["kind"], fake_decode=True)
        want = (a["kind"], d["n_bytes"], d["width"], d["height"], d["n_frames"])
        assert got[a["asset_id"]] == want, (a["asset_id"], got[a["asset_id"]], want)


def test_golden_embed_dedup_lsh(spark):
    """The contract configuration itself (threshold 0.35, 8x8 tables,
    seed 17) value-checked: the seeded LSH pair set equals a local
    replication, and is a subset of the exact all-pairs set."""
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in entry._q_embed_dedup_lsh(spark, SF_DIR).collect()
    }
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    dim = len(next(iter(vecs.values())))
    n_bits, n_tables, seed, thr = 8, 8, 17, 0.35
    planes = np.random.RandomState(seed).normal(size=(n_tables, n_bits, dim))
    weights = (2 ** np.arange(n_bits)).astype(np.int64)
    codes = {
        vid: [
            int(s @ weights)
            for s in (np.einsum("tbd,d->tb", planes, v) > 0).astype(np.int64)
        ]
        for vid, v in vecs.items()
    }

    def _cos(a, b):
        dot = _fold_sum(float(x) * float(y) for x, y in zip(vecs[a], vecs[b]))
        na = math.sqrt(_fold_sum(float(x) * float(x) for x in vecs[a]))
        nb = math.sqrt(_fold_sum(float(x) * float(x) for x in vecs[b]))
        return _r6(dot / (na * nb))

    ids = sorted(vecs)
    want, exact = {}, set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = _cos(a, b)
            if c >= thr:
                exact.add((a, b))
                if any(codes[a][t] == codes[b][t] for t in range(n_tables)):
                    want[(a, b)] = c
    assert len(got) > 0  # non-vacuous: the threshold sits in occupied tail
    assert got == want
    assert set(got) <= exact  # LSH never invents a pair the exact path lacks


def test_golden_windowed_entropy(spark):
    """The windowed_entropy contract configuration (window=8, stride=8,
    min_window=4, m=1, r=0.2, ts=first_ts + w*8s) value-checked against
    a local slice-by-slice recomputation."""
    import datetime

    got = {
        (r["doc_id"], r["window_id"]): (
            r["ts"], r["n_tok"], _nullable(r["sampen"]), _nullable(r["permen"])
        )
        for r in entry._q_windowed_entropy(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    seqs = con.sql(
        f"""
        SELECT user_id || ':' || event_type AS doc_id,
               list(CAST(round(value * 100) AS INT) ORDER BY ts, event_id)
                 AS tokens,
               min(ts) AS first_ts
        FROM read_parquet('{SF_DIR}/events.parquet')
        GROUP BY user_id, event_type
        """
    ).df()
    want = {}
    for r in seqs.itertuples():
        toks = np.asarray(r.tokens, dtype=np.float64)
        n = toks.size
        if n < 4:
            continue
        n_win = (n - 4) // 8 + 1
        for w in range(n_win):
            seg = toks[w * 8 : w * 8 + 8]
            if seg.size < 4:
                continue
            s = float(sampen_many([seg], 1, 0.2, normalize=True)[0])
            p = permen(seg, 3, 1, normalize=True)
            ts = r.first_ts.to_pydatetime() + datetime.timedelta(seconds=8 * w)
            want[(r.doc_id, w)] = (
                ts, seg.size, _nullable(_r6(s)), _nullable(_r6(p))
            )
    assert got == want and len(got) > 1000
