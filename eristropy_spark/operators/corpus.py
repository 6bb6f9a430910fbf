"""Corpus-level token statistics for training-data curation:

* ``pmi_collocations`` — top-k bigram collocations by pointwise mutual
  information (Church & Hanks 1990): the classic phrase/ entity-mining
  signal ("new york" scores high because its joint count dwarfs what
  its parts predict).
* ``corpus_divergence`` — per-token KL / Jensen–Shannon divergence
  terms between the unigram distributions of two corpora (train vs
  val, old crawl vs new crawl): THE drift/shift detector for training
  mixes, and the per-token form names the tokens responsible.

Both are pure DataFrame compositions: in-row tokenization (split /
slice / explode — no Python), two-phase hash aggregates for the count
tables, token-keyed shuffle joins for vocab-sized sides (a corpus
vocabulary is NOT broadcast-sized at 100 TB), and one-row totals that
cross-join as broadcasts.  Document text itself never shuffles —
everything past the explode carries (token, count) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eristropy_spark.functions.numeric import round6

__all__ = [
    "pmi_collocations",
    "corpus_divergence",
    "zipf_fit",
    "kn_bigram_score",
    "vocab_coverage",
    "token_novelty",
    "heaps_law",
]


def _unigrams(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` adjacent-bigram collocations by PMI:

        pmi(x, y) = ln( (c_xy * N_u * N_u) / (N_bi * c_x * c_y) )

    with c_xy the bigram count, c_x/c_y unigram counts, N_bi/N_u the
    bigram/unigram totals.  Bigrams below ``min_count`` are dropped
    first (hapax pairs otherwise own the ranking — the standard PMI
    failure mode).  Returns (x, y, cnt, pmi) with pmi quantized to the
    engine's 6-dp grid and the ranking cut on (pmi desc, x, y) so the
    top-k is deterministic across engines and partitionings.

    Scale shape: bigram enumeration is in-row (slice + zip_with +
    explode); both count tables are two-phase aggregates; the
    bigram↔unigram joins are token-keyed equi-joins (vocab-sized
    sides, NOT broadcast); totals are one-row broadcast cross-joins;
    the final top-k plans as TakeOrderedAndProject (bounded heap, no
    full sort).
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    # split once per row (staged projection at the explode below): the
    # size/slice references would otherwise each re-split the text
    words = F.col("_ws")
    n = F.size(words)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, 2, n - 1),
            lambda x, y: F.struct(x.alias("x"), y.alias("y")),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    # both count tables PERSIST (vocab-sized): the bigram table feeds
    # its own total and the ranked rows, the unigram table feeds the
    # total and BOTH join probes — uncached, Spark would re-scan and
    # re-explode the corpus for every reference (5 scans instead of 2)
    bi = (
        docs.select(F.split(F.col(text_col), " ").alias("_ws"))
        .select(F.explode_outer(pairs).alias("p"))
        .where(F.col("p").isNotNull())
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .persist()
    )
    uni = _unigrams(docs, text_col).persist()
    totals = uni.agg(
        F.sum("cnt").cast("double").alias("_nu"),
    ).crossJoin(
        bi.agg(F.sum("cnt").cast("double").alias("_nbi"))
    )
    cx = uni.select(F.col("token").alias("x"), F.col("cnt").alias("_cx"))
    cy = uni.select(F.col("token").alias("y"), F.col("cnt").alias("_cy"))
    joined = (
        bi.join(cx, "x")
        .join(cy, "y")
        .join(F.broadcast(totals))
    )
    pmi = F.log(
        (F.col("cnt").cast("double") * F.col("_nu") * F.col("_nu"))
        / (F.col("_nbi") * F.col("_cx").cast("double") * F.col("_cy").cast("double"))
    )
    return (
        joined.select("x", "y", "cnt", round6(pmi).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "x", "y")
        .limit(top_k)
    )


def corpus_divergence(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-token divergence terms between two corpora's unigram
    distributions, over the UNION vocabulary with additive smoothing:

        p = (c_a + alpha) / (N_a + alpha*V)    (q likewise for b)
        kl_ab = p * ln(p / q)                  (sums to KL(P||Q))
        js    = 0.5*p*ln(p/m) + 0.5*q*ln(q/m), m = 0.5*(p + q)
                                               (sums to JS(P, Q))

    Returns (token, cnt_a, cnt_b, p_a, p_b, kl_ab, js), one row per
    union-vocab token.  Sum kl_ab / js downstream for the corpus-level
    number; sort by js for the tokens that drive the shift.  Smoothing
    keeps every term finite (both p and q > 0 on the union vocab).

    Scale shape: two two-phase count aggregates, one full-outer
    token-keyed join (vocab-sized — NOT broadcast), one-row totals
    broadcast back.  Text never shuffles.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (zero divides on disjoint vocab)")
    # ONE tagged union-count pass instead of two counts + a full-outer
    # join: each corpus explodes once, one token-keyed two-phase
    # aggregate builds both columns.  The vocab-sized count table
    # PERSISTS (memory-and-disk) because both the one-row totals and
    # the per-token rows read it — uncached, the totals' broadcast
    # subtree would re-scan and re-explode both corpora a second time.
    tagged = docs_a.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
        F.lit(1).alias("_a"),
        F.lit(0).alias("_b"),
    ).unionByName(
        docs_b.select(
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
            F.lit(0).alias("_a"),
            F.lit(1).alias("_b"),
        )
    )
    both = (
        tagged.groupBy("token")
        .agg(
            F.sum("_a").cast("long").alias("cnt_a"),
            F.sum("_b").cast("long").alias("cnt_b"),
        )
        .persist()
    )
    totals = both.agg(
        F.sum("cnt_a").cast("double").alias("_na"),
        F.sum("cnt_b").cast("double").alias("_nb"),
        F.count("*").cast("double").alias("_v"),
    )
    al = F.lit(float(alpha))
    j = both.join(F.broadcast(totals))
    p = (F.col("cnt_a").cast("double") + al) / (F.col("_na") + al * F.col("_v"))
    q = (F.col("cnt_b").cast("double") + al) / (F.col("_nb") + al * F.col("_v"))
    m = F.lit(0.5) * (p + q)
    kl_ab = p * F.log(p / q)
    js = F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q * F.log(q / m)
    return j.select(
        "token",
        "cnt_a",
        "cnt_b",
        round6(p).alias("p_a"),
        round6(q).alias("p_b"),
        round6(kl_ab).alias("kl_ab"),
        round6(js).alias("js"),
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 500,
    min_rank: int = 1,
) -> DataFrame:
    """Zipf's-law fit over the corpus unigram frequency table: OLS of
    ln(count) on ln(rank) across the ``top_k`` most frequent tokens —
    the classic corpus-health diagnostic (natural text shows slope
    ≈ -1; a shallow slope flags boilerplate-heavy or deduplicated-flat
    corpora, a steep one template spam; Zipf 1949, and Piantadosi 2014
    for the modern two-regime reading, which ``min_rank`` lets you
    probe by excluding the function-word head).

    Returns ONE row: (n_tokens, slope, intercept, r2) with
    intercept = mean(y) - slope * mean(x) in ln space.

    Exactness: ranks are dense integers (count desc, token asc — total
    order, so the ranking is deterministic); each ln(rank)/ln(count)
    term and each product is 12-dp-quantized and summed as
    DECIMAL(38, 12) (associative-exact under any partitioning), and
    the closed-form slope/intercept/r² are then a fixed sequence of
    double ops — an independent SQL engine reproduces every double.

    Scale shape: the unigram count is the standard two-phase hash
    aggregate (text never shuffles past the in-row explode); the
    top-k selection is a global TakeOrdered over (count, token) —
    K rows to the driver-side stage, never the vocabulary; the fit
    itself is one tiny aggregate over K rows.
    """
    if top_k < 3:
        raise ValueError("top_k must be >= 3 (a 2-point fit is exact noise)")
    if min_rank < 1:
        raise ValueError("min_rank must be >= 1")
    from pyspark.sql import Window

    from eristropy_spark.operators.changepoint import _floor_round

    vocab = _unigrams(docs, text_col)
    top = vocab.orderBy(F.col("cnt").desc(), "token").limit(top_k + min_rank - 1)
    # K + min_rank - 1 rows: the window below is a single tiny task
    ranked = top.select(
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "token"))
        .alias("rank"),
        "cnt",
    ).where(F.col("rank") >= min_rank)
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))

    def _d(c):
        return _floor_round(c, 12).cast("decimal(38, 12)")

    agg = ranked.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(_d(x)).cast("double").alias("sx"),
        F.sum(_d(y)).cast("double").alias("sy"),
        F.sum(_d(x * x)).cast("double").alias("sxx"),
        F.sum(_d(y * y)).cast("double").alias("syy"),
        F.sum(_d(x * y)).cast("double").alias("sxy"),
    )
    kd = F.col("k").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / kd
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / kd
    vary = F.col("syy") - F.col("sy") * F.col("sy") / kd
    slope = cov / varx
    return agg.select(
        F.col("k").alias("n_tokens"),
        slope.alias("slope"),
        (F.col("sy") / kd - slope * (F.col("sx") / kd)).alias("intercept"),
        ((cov * cov) / (varx * vary)).alias("r2"),
    )


def kn_bigram_score(
    docs: DataFrame,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document interpolated Kneser–Ney bigram score — the
    LM-quality proxy one rung above ``text.unigram_logprob``
    (Kneser & Ney 1995, ICASSP; Chen & Goodman 1999, CSL 13 — the
    interpolated variant with a single absolute discount D):

        P(w2|w1) = (c(w1,w2) − D)/c(w1)
                   + D · N1+(w1·)/c(w1) · N1+(·w2)/B

    where c(·) are bigram-based counts over the SCORING corpus itself
    (so c(w1,w2) ≥ 1 for every scored bigram and the max(·−D, 0) clip
    is never active), N1+(w1·)/N1+(·w2) the left/right continuation
    type counts, and B the total number of distinct bigram types (the
    denominator of the continuation distribution).  Self-scoring a
    corpus against its own counts is the deterministic member of the
    CCNet perplexity-filter family: documents whose transitions are
    typical of the corpus score high, boilerplate with rare-but-
    repeated transitions scores low.  Returns
    (doc_id, n_bigrams, n_types, logp, ppl) with logp the
    count-weighted mean ln P over the document's bigrams and
    ppl = exp(−logp); docs with < 2 tokens emit 0/0/NULL/NULL.

    Scale shape: bigram enumeration is in-row (slice + zip_with);
    shuffles carry (doc_id|token, count) pairs only — the count
    tables are vocab²-/vocab-sized and join token-keyed (NOT assumed
    broadcastable, same rule as ``pmi_collocations``); the one-row
    type total broadcasts.  Document text never shuffles.
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    # split once per row (staged projection at the explode below)
    arr = F.col("_ws")
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("_ws"),
        )
        .select(
            F.col("doc_id"),
            F.explode(F.when(n >= 2, pairs)).alias("_p"),
        )
        .select("doc_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    dbc = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("long").alias("k")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
    lft = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1r"),
    )
    rgt = c12.groupBy("w2").agg(F.count("*").cast("long").alias("n1l"))
    btot = c12.agg(F.count("*").cast("double").alias("_B"))
    d = F.lit(float(discount))
    p = (
        F.col("c12").cast("double")
        - d
        + d * F.col("n1r").cast("double") * F.col("n1l").cast("double") / F.col("_B")
    ) / F.col("c1").cast("double")
    per = (
        dbc.join(c12, ["w1", "w2"])
        .join(lft, "w1")
        .join(rgt, "w2")
        .join(F.broadcast(btot))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("k").cast("double") * F.log(p)).alias("_slp"),
            F.sum("k").cast("long").alias("n_bigrams"),
            F.count("*").cast("long").alias("n_types"),
        )
    )
    logp = F.col("_slp") / F.col("n_bigrams").cast("double")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("n_types", F.lit(0).cast("long")).alias("n_types"),
            logp.alias("logp"),
            F.exp(-logp).alias("ppl"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_tokens, n_types, f1, f2, p_unseen, chao1) — how much
    vocabulary has this corpus slice NOT seen yet?  Two classical
    estimators from the frequency-of-frequencies profile:

    * ``p_unseen`` — the Good–Turing missing-mass estimate f1/N (Good
      1953): the probability the NEXT token drawn is a type never seen
      in this slice — the saturation signal data-mixing decisions key
      on (a source whose missing mass is still high keeps paying).
    * ``chao1`` — the bias-corrected Chao1 richness floor
      V + f1·(f1−1)/(2·(f2+1)) (Chao 1984), a lower bound on the TRUE
      vocabulary size including unseen types; defined even when f2=0.

    All inputs are exact integers (N, V, f1 = singleton types, f2 =
    doubleton types); the two estimates are single fixed-order float
    expressions, so the DuckDB replay matches bit-for-bit.

    Scale shape: explode + two chained two-phase hash aggregates —
    (group, word) counts, then a group-keyed reduce over the count
    profile.  Text crosses the wire once, as words; no windows, no
    joins, no Python.
    """
    wc = (
        docs.select(
            F.col(group_col).alias("source"),
            F.explode(F.split(F.col(text_col), " ")).alias("_w"),
        )
        .groupBy("source", "_w")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    agg = wc.groupBy("source").agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("_c") == 2, 1).otherwise(0)).cast("long").alias("f2"),
    )
    n = F.col("n_tokens").cast("double")
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        "f1",
        "f2",
        (f1 / n).alias("p_unseen"),
        (
            F.col("n_types").cast("double")
            + f1 * (f1 - F.lit(1.0)) / (F.lit(2.0) * (f2 + F.lit(1.0)))
        ).alias("chao1"),
    )


def token_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_types, n_novel, novelty_frac) — per document in
    ingest order (ascending ``doc_id``), how many of its distinct
    words appear for the FIRST time in the whole corpus here?  The
    vocabulary-freshness curve of a data pipeline: novelty decaying
    toward zero means new shards are re-treading seen vocabulary
    (time to diversify sources); a spike flags a domain shift at the
    ingest door.

    A word is novel in the document with the minimum doc_id containing
    it (exact, deterministic — no sampling).  Counts are exact
    integers; the fraction is one fixed float expression.

    Scale shape: distinct (doc, word) pairs, a word-keyed min window
    (ONE shuffle on the word key — equivalently a self-join-free
    first-occurrence pass), then a doc-keyed reduce (second shuffle).
    Text crosses the wire once, as words; no joins, no Python.
    """
    from pyspark.sql import Window

    dw = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("_w"),
        )
        .groupBy("doc_id", "_w")
        .agg(F.count("*").alias("_c"))
        .drop("_c")
    )
    first = dw.withColumn(
        "_first", F.min("doc_id").over(Window.partitionBy("_w"))
    )
    agg = first.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("_first") == F.col("doc_id"), 1).otherwise(0))
        .cast("long")
        .alias("n_novel"),
    )
    return agg.select(
        "doc_id",
        "n_types",
        "n_novel",
        (F.col("n_novel").cast("double") / F.col("n_types").cast("double")).alias(
            "novelty_frac"
        ),
    )


def heaps_law(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, n_tokens, n_types, beta, k) — Heaps'-law fit
    V(N) ≈ K·N^β per corpus slice (Heaps 1978; Herdan 1960): the
    vocabulary-growth exponent from a log-log least-squares fit over
    the per-document cumulative (tokens-seen N_d, types-seen V_d)
    curve in ingest (``doc_id``) order.  Natural language sits at
    β ≈ 0.4–0.6 — β near 1 flags synthetic/ID-like text (vocabulary
    never saturates), β near 0 flags template spam (no new words);
    the slice-level complement of ``vocab_coverage``'s point
    estimates.

    Exactness: N_d and V_d are exact integers (cumulative sums of
    per-doc token and first-occurrence counts); ln N_d / ln V_d are
    floor-quantized to the 12-dp grid and all fit sums (Σx, Σy, Σxy,
    Σx²) run in DECIMAL(38,12), so β and K are fixed-order float
    expressions an independent SQL replay reproduces bit-for-bit.
    Slices where the fit is degenerate (one document, or zero x
    variance) emit NULL beta/k.

    Scale shape: explode + (group, doc) token counts; distinct
    (group, word) first-occurrence via ONE word-keyed window; two
    cumulative windows + a group reduce, all on group-prefixed keys.
    Text crosses the wire once, as words; no Python.
    """
    from pyspark.sql import Window

    src = F.col(group_col).alias("source")
    tok = docs.select(
        src, F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("_w"),
    )
    per_doc_tok = tok.groupBy("source", "doc_id").agg(
        F.count("*").cast("long").alias("_ntok")
    )
    dw = tok.groupBy("source", "doc_id", "_w").agg(
        F.count("*").alias("_c")
    ).drop("_c")
    first = dw.withColumn(
        "_first", F.min("doc_id").over(Window.partitionBy("source", "_w"))
    )
    per_doc_new = first.groupBy("source", "doc_id").agg(
        F.sum(F.when(F.col("_first") == F.col("doc_id"), 1).otherwise(0))
        .cast("long")
        .alias("_nnew")
    )
    per_doc = per_doc_tok.join(per_doc_new, ["source", "doc_id"])
    w_cum = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_doc.select(
        "source",
        F.sum("_ntok").over(w_cum).alias("_nd"),
        F.sum("_nnew").over(w_cum).alias("_vd"),
    )
    from eristropy_spark.operators.changepoint import _floor_round

    # decimal(14,12): ln of a count is < 100, and a narrow operand type
    # keeps the x*y / x*x products inside exact decimal (wide operands
    # would trip Spark's 38-digit precision cap and silently truncate)
    x = _floor_round(F.log(F.col("_nd").cast("double")), 12).cast(
        "decimal(14, 12)"
    )
    y = _floor_round(F.log(F.col("_vd").cast("double")), 12).cast(
        "decimal(14, 12)"
    )
    pts = cum.select("source", "_nd", "_vd", x.alias("_x"), y.alias("_y"))
    agg = pts.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.max("_nd").alias("n_tokens"),
        F.max("_vd").alias("n_types"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    m = F.col("n_docs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    den = m * sxx - sx * sx
    beta = (m * sxy - sx * sy) / den
    lnk = (sy - beta * sx) / m
    ok = (F.col("n_docs") >= 2) & (den > F.lit(0.0))
    nulld = F.lit(None).cast("double")
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_types",
        F.when(ok, beta).otherwise(nulld).alias("beta"),
        F.when(ok, F.exp(lnk)).otherwise(nulld).alias("k"),
    )
