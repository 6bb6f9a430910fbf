"""Document fingerprinting (winnowing) and exact duplicate-span
detection — the rolling-hash text primitives of a training-data
pipeline, pure JVM codegen end to end.

* ``fingerprint_winnow`` — the winnowing algorithm of Schleimer,
  Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
  Fingerprinting" (SIGMOD 2003; the MOSS fingerprinter): hash every
  k-token gram, slide a window of ``w`` gram hashes, keep the
  RIGHTMOST MINIMUM of each window.  Guarantees every shared substring
  of at least k+w-1 tokens is caught by at least one shared
  fingerprint, with an expected density of 2/(w+1) — a tunable
  sublinear sketch that pushes overlap detection from O(tokens) to
  O(tokens/w) join rows.
* ``duplicate_spans`` — the exact-substring layer of corpus dedup
  (the operation of Lee et al. 2021, "Deduplicating Training Data
  Makes Language Models Better", realized with gram hashes instead of
  a suffix array): every k-gram occurring more than once in the corpus
  marks its positions; overlapping/adjacent marks merge into maximal
  duplicated spans per document.
* ``drop_duplicate_spans`` — rewrite documents with those spans
  removed (keeps the first occurrence is NOT attempted — like the
  paper, every occurrence of a duplicated substring is cut; keep-one
  semantics needs a global tie-break that serializes the corpus).

Hashing is exactly portable: word hash = first 15 hex digits of
md5(word) (60 bits, `conv`-parsed), gram hash = FNV-prime polynomial
fold over the k word hashes in WRAPPING signed-64 arithmetic (the
session pins non-ANSI, so Spark long arithmetic wraps like Java; the
DuckDB oracles replay the same fold in HUGEINT mod 2^64).  Collisions:
2^-60 per word pair, ~2^-64 per gram pair — the standard fingerprinting
trade documented by both papers.

Scale shape: gram hashing and winnow selection are in-row expressions
(no Python, no shuffle) — each document is fingerprinted where it
lives.  ``duplicate_spans`` is the one inherently corpus-global op:
its single gram-keyed shuffle (count + semi-join back) carries 16-byte
(hash, pos) pairs, never text, and the span merge runs under a
per-document window.  At 100 TB that shuffle is the cost of EXACT
substring dedup in any engine (suffix-array builds pay the same sort);
the winnowed fingerprint table is the cheap alternative when
approximate overlap is enough.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "FNV_PRIME",
    "fingerprint_winnow",
    "fingerprint_overlap",
    "duplicate_spans",
    "drop_duplicate_spans",
]

# FNV-1a 64-bit prime — the polynomial base of the gram fold
FNV_PRIME = 1099511628211

_LONG_MAX = (1 << 63) - 1


from eristropy_spark.functions.partitioning import (  # noqa: E402
    widen_narrow_input as _widen_narrow_input,
)


def _word_hashes(text: Column) -> Column:
    """array<long> of 60-bit md5 word hashes (exactly replayable:
    DuckDB parses the same 15 hex digits via CAST('0x…' AS BIGINT))."""
    return F.transform(
        F.split(text, " "),
        lambda wd: F.conv(F.substring(F.md5(wd), 1, 15), 16, 10).cast(
            "long"
        ),
    )


def _gram_hashes(whs: Column, m: Column, k: int) -> Column:
    """array<long> of polynomial k-gram hashes, wrapping signed-64."""
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.aggregate(
            F.slice(whs, i, k),
            F.lit(0).cast("long"),
            lambda acc, x: acc * F.lit(FNV_PRIME).cast("long") + x,
        ),
    )


def fingerprint_winnow(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprints: (doc_id, pos, fp) — ``pos`` the 1-based
    first token of the selected k-gram, ``fp`` its hash.

    Each window of ``w`` consecutive gram hashes contributes its
    rightmost minimum; duplicates collapse, so expected output density
    is 2/(w+1) fingerprints per token.  Documents shorter than k
    tokens emit nothing.  Any substring of >= k+w-1 tokens shared by
    two documents yields at least one shared (fp) value — the
    guarantee the overlap join builds on.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if w < 1:
        raise ValueError("w must be >= 1")
    m = (F.size(F.split(F.col(text_col), " ")) - k + 1).cast("int")
    staged = _widen_narrow_input(docs).select(
        F.col(id_col).alias("doc_id"),
        m.alias("_m"),
        _word_hashes(F.col(text_col)).alias("_whs"),
    ).select(
        "doc_id",
        "_m",
        _gram_hashes(F.col("_whs"), F.col("_m"), k).alias("_g"),
    )
    n_t = F.greatest(F.col("_m") - w + 1, F.lit(1))
    starts = F.when(F.col("_m") >= 1, F.sequence(F.lit(1), n_t)).otherwise(
        F.array().cast("array<int>")
    )
    init = F.struct(
        F.lit(0).cast("long").alias("pos"),
        F.lit(_LONG_MAX).cast("long").alias("val"),
    )

    def _pick(t):
        return F.aggregate(
            F.sequence(t, F.least(t + w - 1, F.col("_m"))),
            init,
            lambda acc, j: F.when(
                (F.element_at(F.col("_g"), j) < acc["val"])
                | (
                    (F.element_at(F.col("_g"), j) == acc["val"])
                    & (j.cast("long") > acc["pos"])
                ),
                F.struct(
                    j.cast("long").alias("pos"),
                    F.element_at(F.col("_g"), j).alias("val"),
                ),
            ).otherwise(acc),
        )

    sel = F.array_distinct(F.transform(starts, _pick))
    # explode_outer + null filter for the same InferFiltersFromGenerate
    # reason documented in _grams_long
    return (
        staged.select("doc_id", F.explode_outer(sel).alias("s"))
        .where(F.col("s").isNotNull())
        .select(
            "doc_id",
            F.col("s.pos").alias("pos"),
            F.col("s.val").alias("fp"),
        )
    )


def fingerprint_overlap(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket_size: int | str | None = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing at least ``min_shared`` winnowing
    fingerprints: (doc_a, doc_b, n_shared) with doc_a < doc_b — the
    MOSS overlap detector, i.e. near-dup/containment candidates at
    fingerprint density 2/(w+1) instead of full n-gram density (what
    makes it affordable where ``ngram_jaccard``'s exact path is
    quarantined to small scale).

    Self-join on the fp value with the same hot-bucket stop-list as
    the MinHash/SimHash candidate joins (a fingerprint shared by a
    boilerplate phrase across millions of docs would otherwise
    contribute O(members²) pairs); ``n_shared`` counts DISTINCT shared
    fingerprints.
    """
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    from eristropy_spark.operators.dedup import _drop_hot_buckets

    fps = (
        fingerprint_winnow(docs, k=k, w=w, id_col=id_col, text_col=text_col)
        .select("doc_id", "fp")
        .dropDuplicates()
    )
    fps = _drop_hot_buckets(fps, ["fp"], max_bucket_size)
    return (
        fps.alias("a")
        .join(fps.alias("b"), "fp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def _grams_long(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, i, g): one row per gram position (1-based)."""
    m = (F.size(F.split(F.col(text_col), " ")) - k + 1).cast("int")
    staged = _widen_narrow_input(docs).select(
        F.col(id_col).alias("doc_id"),
        m.alias("_m"),
        _word_hashes(F.col(text_col)).alias("_whs"),
    ).select(
        "doc_id",
        _gram_hashes(F.col("_whs"), F.col("_m"), k).alias("_g"),
    )
    # posexplode_OUTER, not posexplode: the inner Generate makes
    # Spark's InferFiltersFromGenerate rule synthesize a
    # ``size(_g) > 0`` filter and push it below the widening Exchange —
    # inlining the ENTIRE gram-hash expression into a Filter that runs
    # serially on the (often single-partition) scan side.  Measured
    # 20+ s of duplicated single-core hashing at sf0.1; the outer
    # variant infers nothing, and the null row an empty array emits is
    # dropped by a cheap post-explode filter instead.
    return staged.select(
        "doc_id", F.posexplode_outer(F.col("_g")).alias("i0", "g")
    ).where(F.col("g").isNotNull()).select(
        "doc_id", (F.col("i0") + 1).cast("long").alias("i"), "g"
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated spans: (doc_id, span_start, n_tokens) for
    every run of k-token grams whose hash occurs at least
    ``min_count`` times in the whole corpus (within-document repeats
    count).  Overlapping or adjacent duplicated grams merge — spans
    are the gaps-and-islands closure of the marked positions, so a
    span is a maximal region covered by duplicated k-grams.

    Two shuffles, both on 64-bit gram keys (never text): the
    occurrence count (map-side combined) and the left-semi join
    marking positions; the merge itself is a per-document window.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    grams = _grams_long(docs, k, id_col, text_col)
    dup = (
        grams.groupBy("g")
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("g")
    )
    hits = grams.join(dup, "g", "left_semi")
    wd = Window.partitionBy("doc_id").orderBy("i")
    isl = (
        hits.withColumn("_prev", F.lag("i").over(wd))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("i") - F.col("_prev") > k),
                1,
            ).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(wd))
    )
    return isl.groupBy("doc_id", "_isl").agg(
        F.min("i").alias("span_start"),
        (F.max("i") + k - F.min("i")).alias("n_tokens"),
    ).select("doc_id", "span_start", "n_tokens")


def drop_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite each document with its duplicated spans removed:
    (doc_id, clean_text, n_dropped_tokens).  Documents without spans
    pass through unchanged (n_dropped_tokens = 0).

    The span list per document is tiny (bounded by doc length / k), so
    it aggregates to an array and the cut is an in-row positional
    filter — the text itself never shuffles beyond the one doc_id join.
    """
    sp = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(F.col("span_start"), F.col("n_tokens"))
        ).alias("_spans")
    )
    joined = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).join(sp, "doc_id", "left")
    words = F.split(F.col("text"), " ")
    covered = lambda p: F.exists(  # noqa: E731
        F.col("_spans"),
        lambda s: (p >= s["span_start"])
        & (p < s["span_start"] + s["n_tokens"]),
    )
    kept = F.when(
        F.col("_spans").isNull(), words
    ).otherwise(
        F.filter(words, lambda _, i: ~covered(i.cast("long") + 1))
    )
    return joined.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size(words) - F.size(kept)).cast("long").alias("n_dropped_tokens"),
    )
