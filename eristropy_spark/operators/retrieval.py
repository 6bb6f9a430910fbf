"""BM25 ranked retrieval — the Okapi BM25 scoring function (Robertson
& Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
Beyond", FnTIR — public; the Lucene-default variant with the
log(1 + ...) idf that can never go negative):

    score(q, d) = sum over t in q of
        ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        * tf_td * (k1 + 1) / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

The retrieval half of a training-data pipeline: nearest-neighbor
search over TEXT (quality-by-example, eval-set leakage hunting, RAG
indexing) the way similarity.cosine_topk is over embeddings.

Scale shape: the corpus tokenizes in-row (explode) and aggregates
twice — tf per (doc, token) and df per token, both map-side-combined
hash aggregates; dl/avgdl ride the same tf pass.  The QUERY side is
small by construction and broadcasts, so corpus text never shuffles
for it; scoring is one (query, doc) hash aggregate whose shuffle
carries ids and partial scores only.  Top-k per query is a bounded
window — fine for query batches; a single query matching the whole
corpus makes that window one partition, so batch-score offline with
generous k rather than one mega-query.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eristropy_spark.functions.numeric import round6

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    token_col: str = "token",
) -> DataFrame:
    """(query_id, doc_id, score, rank): top-``k`` documents per query
    by BM25.  ``queries`` holds one row per (query_id, token) —
    duplicate query terms are deduplicated (standard boolean-bag BM25;
    repeat a term upstream by weighting if needed).

    Scores are rounded to 6 dp BEFORE ranking and ties break on doc_id
    ascending, so the cut is deterministic across engines.  Documents
    sharing no term with a query never appear (score would be 0).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if k1 < 0 or not (0 <= b <= 1):
        raise ValueError(f"need k1 >= 0 and 0 <= b <= 1, got k1={k1} b={b}")

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n_df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    corpus = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(token_col).alias("token")
    ).distinct()
    hits = (
        tf.join(F.broadcast(q), "token")
        .join(n_df, "token")
        .join(dl, "doc_id")
        .join(F.broadcast(corpus))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    sat = (
        F.col("tf")
        * F.lit(float(k1) + 1.0)
        / (
            F.col("tf")
            + F.lit(float(k1))
            * (F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = hits.groupBy("query_id", "doc_id").agg(
        round6(F.sum(idf * sat)).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
