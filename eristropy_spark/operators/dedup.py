"""Deduplication operators for the documents table.

Four strategies, cheapest to richest (training-data pipeline core):

* ``exact_dedup`` — group by normalized text, keep min doc_id.  One
  shuffle on the normalized text (hash aggregated map-side first).
* ``ngram_jaccard_pairs`` — exact n-gram Jaccard over word shingles:
  explode distinct shingles → self-join on shingle → |A∩B| per pair →
  Jaccard via |A|+|B|−|A∩B|.  Exact but O(pairs-sharing-a-shingle);
  the scale path prunes with ``minhash_lsh_pairs`` first.
* ``minhash_lsh_pairs`` — MinHash signatures (k permutations via
  seeded 64-bit hash mixing, NumPy) banded into LSH buckets; candidate
  pairs are generated ONLY within buckets (self-join per band-bucket),
  then exact-verified per PAIR via ``array_intersect`` on the two docs'
  distinct-shingle arrays.  This is the 100 TB design end to end:
  candidate generation touches each doc b times, verification is
  O(candidates) — no shingle self-join anywhere after banding.
* ``simhash_pairs`` — 64-bit SimHash; candidates = equal band among
  ``max_hamming + 1`` bands (pigeonhole: exact recall at the requested
  distance), verified by exact Hamming popcount.

Word shingling is done with built-in expressions; only the signature
computations (minhash/simhash) use an Arrow UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eristropy_spark.functions.numeric import round6
from pyspark.sql.types import ArrayType, LongType

__all__ = [
    "exact_dedup",
    "word_shingles",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
]


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(keep_id, n_dups) — canonical doc per exact normalized text."""
    norm = F.lower(F.trim(F.col("text")))
    return (
        docs.groupBy(norm.alias("_norm"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
        .drop("_norm")
        .select("keep_id", "n_dups")
    )


def word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams, built-in exprs only."""
    # materialize the split ONCE per row before the lambda: referencing
    # split(lower(text)) inside transform() re-evaluates it per sequence
    # element (O(words²) per doc — measured 4.4 s vs 0.5 s at sf0.1)
    words = F.col("_ws")
    count = F.size(words) - (n - 1)
    # guard: sequence(1, 0) in Spark is the DESCENDING [1, 0] (step -1),
    # whose transform evaluates slice(words, 0, n) and throws
    # INVALID_PARAMETER_VALUE.START — docs with < n words must yield zero
    # shingles (matching DuckDB's empty generate_series(1, 0)).  Short-doc
    # near-dup detection is exact_dedup's job, not the shingle path's.
    shingles = F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from eristropy_spark.functions.partitioning import widen_narrow_input

    # spread the scan before the explode: the shingle Generate and the
    # downstream shared-shingle join/aggregate otherwise run as wide as
    # the (often single-split) input scan
    return (
        widen_narrow_input(docs)
        .select("doc_id", F.split(F.lower(F.col("text")), " ").alias("_ws"))
        .select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with Jaccard >= threshold (a < b)."""
    sh = word_shingles(docs, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            round6(F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def ngram_containment_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_a, n_b, cont_a, cont_b) for pairs
    where max(cont_a, cont_b) >= threshold (a < b), with
    cont_x = |shingles(a) ∩ shingles(b)| / |shingles(x)| — the
    ASYMMETRIC companion of ``ngram_jaccard_pairs`` (Broder 1997's
    "containment"): a short document quoted inside a long one has low
    Jaccard but containment ≈ 1 from the short side, which is exactly
    the sub-document / quotation / partial-copy case symmetric near-dup
    misses.  Same quarantine as the Jaccard path: exact all-pairs via
    the shared-shingle join — the small-scale/verify oracle; banded
    LSH (minhash_lsh_pairs) is the candidate generator at scale.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = word_shingles(docs, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    out = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("n_sh", "n_a"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("n_sh", "n_b"),
            "doc_b",
        )
        .withColumn(
            "cont_a", round6(F.col("n_inter") / F.col("n_a"))
        )
        .withColumn(
            "cont_b", round6(F.col("n_inter") / F.col("n_b"))
        )
        .where(F.greatest("cont_a", "cont_b") >= threshold)
        .select(
            "doc_a", "doc_b", "n_inter",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "cont_a", "cont_b",
        )
    )
    return out


def _mix64(h: np.ndarray, seed) -> np.ndarray:
    """Cheap xorshift-multiply mixer — k permutations from one base hash.

    ``seed`` may be a scalar or an array (broadcasts: (k,1) seeds against
    (1,n) hashes give the whole (k, n) permutation matrix in one shot).
    """
    x = h ^ np.asarray(seed, dtype=np.uint64)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


# per-position salts make the n-gram combiner order-sensitive
# ("a b c" != "c b a"); fixed constants so signatures are stable
_GRAM_SALTS = _mix64(
    np.arange(1, 65, dtype=np.uint64), np.uint64(0x9E3779B97F4A7C15)
)

# Word-hash constants (codepoint-polynomial + splitmix finalizer).
# P is the FNV-1a 64-bit prime; _WORD_POWS[j] = P^(15-j) mod 2^64 so the
# first codepoint carries the highest power (plain polynomial hashing).
_WORD_PRIME = 1099511628211
_WORD_POWS = np.array(
    [pow(_WORD_PRIME, 15 - j, 1 << 64) for j in range(16)], dtype=np.uint64
)
_WORD_LEN_SALT = np.uint64(0x9E3779B97F4A7C15)
_WORD_SEED = np.uint64(0x3C79AC492BA7B653)


def _word_hashes(flat: np.ndarray) -> np.ndarray:
    """uint64 hash per word, vectorized AND SQL-expressible.

    Scheme: the first 16 UTF-32 codepoints enter a base-P polynomial
    (mod 2^64), the true character length is salted in (so words
    sharing a 16-char prefix still separate), and a splitmix64-style
    finalizer avalanches the result.  Every step is plain 64-bit
    wraparound arithmetic, which is why the DuckDB oracles can replay
    it exactly in HUGEINT SQL (``__spark_entry__._word_hash_sql``) —
    the property pandas' C SipHash (used through round 4) could never
    give the contract.  Vectorization: one ``np.array(..., '<U16')``
    codepoint matrix and one (n, 16) multiply-accumulate per batch —
    no per-word Python beyond ``len``.
    """
    n = flat.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    cps = (
        np.array(flat, dtype="<U16")
        .view(np.uint32)
        .reshape(n, 16)
        .astype(np.uint64)
    )
    lens = np.fromiter((len(w) for w in flat), dtype=np.uint64, count=n)
    poly = (cps * _WORD_POWS).sum(axis=1, dtype=np.uint64)
    return _mix64(poly ^ (lens * _WORD_LEN_SALT), _WORD_SEED)


def _combine_grams(word_hashes: np.ndarray, n: int) -> np.ndarray:
    """Distinct n-gram hashes from per-word hashes, fully vectorized:
    the j-th word of each sliding window is mixed with a per-position
    salt and XOR-combined, so each window costs n vector ops total.
    Docs shorter than n words yield one gram over all their words
    (mirroring the round-2 whole-text fallback)."""
    if not 1 <= n <= _GRAM_SALTS.size:
        raise ValueError(
            f"shingle width n must be in [1, {_GRAM_SALTS.size}] (got {n})"
        )
    L = word_hashes.size
    if L == 0:
        return word_hashes
    g = min(n, L)
    n_win = L - g + 1
    acc = np.zeros(n_win, dtype=np.uint64)
    for j in range(g):
        acc ^= _mix64(word_hashes[j : j + n_win], _GRAM_SALTS[j])
    return np.unique(acc)


def _shingle_hashes_batch(texts, n: int) -> list[np.ndarray]:
    """Distinct shingle hashes for a whole Arrow batch of docs.

    Round 2 called ``hashlib.blake2b`` once per shingle per doc inside
    the UDF loop — the dominant per-doc cost of the 100 TB dedup path.
    Now EVERY word of EVERY doc in the batch is hashed by one
    vectorized :func:`_word_hashes` pass (codepoint-polynomial +
    splitmix64 — deterministic across processes/platforms, independent
    of PYTHONHASHSEED, and exactly replayable in DuckDB SQL, which is
    what makes the minhash/simhash contract rows oracle-checkable),
    and shingle hashes are order-sensitive numpy combinations of the
    word hashes: zero per-shingle Python.
    """
    words_lists = [t.lower().split(" ") if t else [] for t in texts]
    lens = np.fromiter(
        (len(w) for w in words_lists), dtype=np.int64, count=len(words_lists)
    )
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in words_lists:
        flat[pos : pos + len(w)] = w
        pos += len(w)
    word_h = _word_hashes(flat)
    out, pos = [], 0
    for L in lens:
        out.append(_combine_grams(word_h[pos : pos + int(L)], n))
        pos += int(L)
    return out


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Distinct shingle hashes of one doc — the batch path's unit case
    (golden tests replicate the LSH pipelines locally through this)."""
    return _shingle_hashes_batch([text], n)[0]


def _drop_hot_buckets(
    tabled: DataFrame,
    keys: list[str],
    max_bucket_size: int | str | None,
    *,
    n_buckets: int | None = None,
    table_key: str = "table_id",
    hot_factor: int = 8,
    min_cap: int = 10_000,
) -> DataFrame:
    """Remove LSH buckets with more members than the cap before a bucket
    self-join (each contributes O(members²) candidate rows).  One extra
    aggregation on the SAME keys as the downstream join — AQE coalesces
    the two shuffles onto one partitioning.

    ``max_bucket_size`` is either an absolute row count, or ``"auto"``:
    drop buckets exceeding ``hot_factor ×`` the uniform expected
    occupancy (per-table row count / ``n_buckets``), floored at
    ``min_cap``.  ``"auto"`` is the right mode for SMALL keyspaces such
    as hyperplane sign buckets (2^n_bits per table): there a fixed
    absolute cap silently zeroes recall once the corpus grows past
    cap·n_buckets rows — every bucket is uniformly over-cap in every
    table — whereas the relative cap scales with the corpus and only
    ever removes genuinely degenerate buckets (>hot_factor× uniform
    share).  Per-table totals are computed lazily inside the same job
    (no driver count).  Minhash band-buckets keep absolute caps: their
    64-bit keyspace makes uniform occupancy ~1, so any fat bucket is
    degenerate regardless of corpus size.
    """
    if max_bucket_size is None:
        return tabled
    from pyspark.sql import Window

    # Bucket sizes come from ONE window count over the join keys
    # instead of a sizes aggregate + join-back: the join-back
    # re-executed the whole upstream (signature UDF included) for the
    # sizes branch, while the window's exchange is exactly the
    # partitioning the downstream bucket self-join needs, so Spark
    # reuses it (1 upstream execution, plan-audited).
    w = Window.partitionBy(*keys)
    wide = tabled.withColumn("_bsz", F.count("*").over(w))
    if max_bucket_size == "auto":
        if n_buckets is None or n_buckets < 1:
            raise ValueError('max_bucket_size="auto" requires n_buckets >= 1')
        # per-table totals branch off the SAME window exchange (tiny
        # aggregate, broadcast back); total rows per table == Σ bucket
        # sizes per table
        totals = wide.groupBy(table_key).agg(F.count("*").alias("_tot"))
        cap = F.greatest(
            F.lit(float(min_cap)),
            F.lit(float(hot_factor)) * F.col("_tot") / F.lit(float(n_buckets)),
        )
        return (
            wide.join(F.broadcast(totals), table_key)
            .where(F.col("_bsz") <= cap)
            .select(*tabled.columns)
        )
    if not isinstance(max_bucket_size, int) or max_bucket_size < 1:
        raise ValueError('max_bucket_size must be >= 1, "auto", or None')
    return wide.where(F.col("_bsz") <= max_bucket_size).drop("_bsz")


def make_minhash_udf(k: int = 64, n: int = 3, seed: int = 17):
    """pandas_udf: text -> array<long> of k minhash values."""
    if not 1 <= n <= _GRAM_SALTS.size:
        raise ValueError(
            f"shingle width n must be in [1, {_GRAM_SALTS.size}] (got {n})"
        )
    seeds = np.random.RandomState(seed).randint(1, 2**31, size=k).astype(np.uint64)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(text: pd.Series) -> pd.Series:
        bases = _shingle_hashes_batch(text.tolist(), n)  # one C hash pass
        out = []
        for base in bases:
            if base.size == 0:
                out.append([0] * k)
                continue
            # all k permutations at once: (k, n_shingles) mix -> row min
            out.append(
                _mix64(base[None, :], seeds[:, None])
                .min(axis=1)
                .astype(np.int64)
                .tolist()
            )
        return pd.Series(out)

    return minhash_udf


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.8,
    seed: int = 17,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """LSH candidate generation + exact Jaccard verification.

    k/bands rows per band; a pair collides if any band's sub-signature
    matches.  With k=64, bands=16 (4 rows/band) the collision curve
    crosses ~50% near J≈0.5 — generous recall for threshold 0.8.

    ``max_bucket_size`` drops band-buckets with more members than the
    cap before the self-join — the standard LSH hot-bucket stop-list.
    A degenerate bucket (every empty/boilerplate doc shares one
    signature) contributes O(members²) candidate rows; at 100 TB one
    such bucket is the whole job's cost.  NEAR-dup pairs caught only by
    a hot bucket still collide through their other ``bands-1`` buckets;
    what a full cap-out removes is the pairs among >cap IDENTICAL
    documents (same signature in every band) — and exact duplicates are
    the upstream ``exact_dedup`` pass's job, quadratic pair output for
    them being exactly the blowup to avoid (test pins this semantic).
    Pass ``None`` to disable.
    """
    from eristropy_spark.functions.partitioning import widen_narrow_input

    rows = k // bands
    # signature building is the CPU-heavy Arrow-batched stage — its
    # parallelism is the INPUT partition count (functions/partitioning)
    sig = widen_narrow_input(docs).select(
        "doc_id", make_minhash_udf(k, n, seed)(F.col("text")).alias("sig")
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(F.slice("sig", b * rows + 1, rows)).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    banded = _drop_hot_buckets(banded, ["band", "bucket"], max_bucket_size)
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verification is O(candidates), NOT a shingle self-join: a hot
    # shingle shared by every candidate doc would re-create the quadratic
    # all-pairs blowup the banding just avoided.  Instead each candidate
    # pair joins to the two docs' distinct-shingle ARRAYS and the
    # intersection is a JVM-side array_intersect per pair.
    sh_sets = word_shingles(docs, n).groupBy("doc_id").agg(
        F.collect_set("shingle").alias("sh")
    )
    a_side = sh_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    b_side = sh_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    return (
        cands.join(a_side, "doc_a")
        .join(b_side, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            round6(
                F.col("n_inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter"))
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def make_simhash_udf(n: int = 2, seed: int = 17):
    """pandas_udf: text -> 64-bit SimHash (as signed long)."""
    if not 1 <= n <= _GRAM_SALTS.size:
        raise ValueError(
            f"shingle width n must be in [1, {_GRAM_SALTS.size}] (got {n})"
        )

    @F.pandas_udf(LongType())
    def simhash_udf(text: pd.Series) -> pd.Series:
        bases = _shingle_hashes_batch(text.tolist(), n)  # one C hash pass
        shifts = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(bases), dtype=np.int64)
        for i, base in enumerate(bases):
            if base.size == 0:
                continue
            hashes = _mix64(base, seed)
            # per-bit votes and the winning bitmask are pure vector ops
            # (round 2 assembled the hash with a 64-iteration Python loop)
            ones = ((hashes[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
            vote = 2 * ones.astype(np.int64) - base.size
            sim = ((vote > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            out[i] = sim.astype(np.int64)
        return pd.Series(out)

    return simhash_udf


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    seed: int = 17,
    allow_large_h: bool = False,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with SimHash Hamming <= max_hamming.

    Candidate pruning: split the 64-bit hash into ``max_hamming + 1``
    bands — ``h`` differing bits can touch at most ``h`` bands, so every
    pair within Hamming ``h`` shares at least one identical band
    (pigeonhole, exact recall; round-1 used a fixed 4 bands, which only
    guarantees h <= 3 and silently dropped distance-4..8 pairs).
    Verification is an exact popcount on the candidate pairs only.

    Scale note: band width is ``64 // (h+1)`` bits, so large ``h``
    shrinks the bucket keyspace (h=8 → ~7-bit bands) and fattens
    buckets; at extreme corpus sizes keep h <= 4 or pre-partition by a
    cheap content key before banding.  h > 31 would make bands
    degenerate (< 2 bits) and is rejected.
    """
    if not (0 <= max_hamming <= 31):
        raise ValueError("max_hamming must be in [0, 31]")
    if max_hamming > 4 and not allow_large_h:
        # allow_large_h=True is the explicit opt-in for small corpora
        # (e.g. the sf0.01 contract demo) where fat buckets are harmless
        import warnings

        warnings.warn(
            f"simhash_pairs(max_hamming={max_hamming}) bands the 64-bit "
            f"hash into {max_hamming + 1} pieces of ~"
            f"{64 // (max_hamming + 1)} bits — a small bucket keyspace "
            "that fattens candidate buckets at large corpus sizes; keep "
            "max_hamming <= 4 at scale or pre-partition by a cheap "
            "content key before banding",
            RuntimeWarning,
            stacklevel=2,
        )
    n_bands = max_hamming + 1
    base_w = 64 // n_bands
    extra = 64 - base_w * n_bands  # first `extra` bands get one more bit
    offsets, widths, off = [], [], 0
    for b in range(n_bands):
        w = base_w + (1 if b < extra else 0)
        offsets.append(off)
        widths.append(w)
        off += w
    from eristropy_spark.functions.partitioning import widen_narrow_input

    sig = widen_narrow_input(docs).select(
        "doc_id", make_simhash_udf(2, seed)(F.col("text")).alias("sim")
    )
    banded = sig.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.col("sim")
                            if widths[b] >= 64
                            else F.shiftright("sim", offsets[b]).bitwiseAND(
                                F.lit((1 << widths[b]) - 1)
                            )
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sim", "bb.band", "bb.bucket")
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.sim").alias("sim_a"),
            F.col("y.sim").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
