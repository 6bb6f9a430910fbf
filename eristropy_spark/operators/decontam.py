"""Benchmark decontamination — n-gram overlap against an eval set.

Training corpora must be scrubbed of evaluation data before a model is
trained on them; the published practice (Brown et al. 2020, GPT-3
App. C; Chowdhery et al. 2022, PaLM §8; Soldaini et al. 2024, Dolma)
flags a training document if it shares any word ``n``-gram (n = 13 in
GPT-3/PaLM) with any benchmark document.  The reference engine has no
counterpart; this is a training-data-pipeline operator in the same
family as the dedup/quality ops.

Distributed shape (the part that matters at 100 TB):

* grams are built IN-ROW (``split`` → ``sequence`` → ``slice`` →
  ``concat_ws`` → ``xxhash64`` → ``array_distinct``), whole-stage
  codegen, zero Python — the corpus text itself never enters a
  shuffle;
* the benchmark side (eval sets are MBs, not TBs) reduces to distinct
  64-bit gram hashes and **broadcasts**, so the corpus-side probe is a
  map-side hash-join: no shuffle of corpus grams at all;
* the only aggregation is the per-doc hit count over the (tiny) join
  output — partial map-side combine on ``doc_id``.

So the whole operator costs one corpus scan + one broadcast.  For
benchmark suites too large to broadcast (>~1 GB of distinct grams),
pass ``broadcast_benchmark=False`` to fall back to a shuffled
semi-join keyed on the 8-byte gram hash (still never the text).

Grams join on ``xxhash64`` of the gram string: 64-bit collisions at
10^12 corpus grams add a ~1e-2 *expected count* of falsely-flagged
grams corpus-wide — noise for a flagging operator (and the DuckDB
oracle, which joins the gram STRINGS themselves, doubles as the
collision check at contract scale).  Docs shorter than ``n`` words
contribute one whole-text gram, mirroring ``dedup._combine_grams``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_overlap_decontaminate"]


def _gram_hashes(words, n: int):
    """array<bigint> of distinct n-gram hashes from a pre-split word
    array column, in-row.  Callers must project the split FIRST (one
    ``F.split`` per row): referencing a split expression inside the
    transform lambda re-evaluates it per gram position (O(words²))."""
    count = F.size(words) - (n - 1)
    grams = F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, n))),
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", words))))
    return F.array_distinct(grams)


def ngram_overlap_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_hits: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag corpus docs sharing any word ``n``-gram with the benchmark.

    Returns one row per corpus document:
    ``(id_col, n_grams, n_contaminated, contaminated)`` where
    ``n_grams`` counts the doc's distinct grams, ``n_contaminated``
    counts those also present anywhere in the benchmark, and
    ``contaminated = n_contaminated >= min_hits``.  Downstream keeps
    ``~contaminated`` (or audits by hit count first — the counts are
    what GPT-3's "dirtiness" analysis is built from).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if min_hits < 1:
        raise ValueError("min_hits must be >= 1")

    from eristropy_spark.functions.partitioning import widen_narrow_input

    bench_grams = (
        benchmark.select(
            F.split(F.lower(F.col(text_col)), " ").alias("_ws")
        )
        .select(F.explode_outer(_gram_hashes(F.col("_ws"), n)).alias("g"))
        .where(F.col("g").isNotNull())
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)

    # ONE corpus scan: grams built once, the per-doc size rides along
    # the explode, and the benchmark probe is a broadcast LEFT join
    # whose marks the per-doc aggregate counts.  (The previous shape —
    # separate hits + size branches re-joined on doc_id — hashed the
    # corpus twice and let InferFiltersFromGenerate push the whole gram
    # expression into a serial scan-side Filter; explode_outer infers
    # nothing, and _grams is never empty by construction.)
    doc_grams = (
        widen_narrow_input(corpus)
        .select(
            F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("_ws")
        )
        .select(F.col(id_col), _gram_hashes(F.col("_ws"), n).alias("_grams"))
    )
    exploded = doc_grams.select(
        id_col,
        F.size("_grams").alias("_ng"),
        F.explode_outer("_grams").alias("g"),
    )
    return (
        exploded.join(bench_grams, "g", "left")
        .groupBy(id_col)
        .agg(
            F.max("_ng").cast("long").alias("n_grams"),
            F.count("_hit").cast("long").alias("n_contaminated"),
            (F.count("_hit") >= F.lit(min_hits)).alias("contaminated"),
        )
    )
