"""Text-analysis operators for the documents table — all JVM-side.

Large-scale training-data pipeline primitives over
``documents(doc_id, text, lang, source, n_chars)``:

* ``text_stats`` — token counting (whitespace + BPE-ish regex),
  length/punctuation/uppercase ratios;
* ``quality_score`` — deterministic arithmetic quality heuristic
  (length, word-length, punctuation, stopword density);
* ``lang_id`` — marker-word n-gram heuristic (a real lang-id model is
  out of scope; the *shape* — per-language marker dictionaries scored
  per document, argmax — is the production pattern).

Everything is built-in expressions (regexp_count / split / size), so
the whole stage is whole-stage-codegen with no Python workers, and
every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from eristropy_spark.functions.numeric import round6

__all__ = [
    "text_stats",
    "quality_score",
    "gopher_filters",
    "c4_line_clean",
    "top_ngram_repetition",
    "chunk_text",
    "lang_id",
    "tfidf_topk",
    "scrub_pii",
    "build_vocab",
    "unigram_logprob",
    "lexical_richness",
    "ccnet_buckets",
    "STOPWORDS",
    "BPE_ISH_PATTERN",
    "PII_PATTERNS",
]

# tiny English stopword set — deterministic, shared with the SQL oracle
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "for", "on", "with")

# "BPE-ish" pre-tokenizer: alnum runs or single non-space symbols
# (ASCII classes only, so Java and RE2/DuckDB dialects agree)
BPE_ISH_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def _ws_word_count(text: Column) -> Column:
    # length-difference trick: portable to any SQL dialect
    return (
        F.length(text) - F.length(F.regexp_replace(text, " ", "")) + F.lit(1)
    ).cast("long")


def text_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_words, n_bpe_tokens, avg_word_len,
    punct_ratio, stopword_ratio) per document."""
    t = F.col("text")
    n_words = _ws_word_count(t)
    stop_hits = sum(
        (F.regexp_count(t, F.lit(rf"\b{w}\b")) for w in STOPWORDS),
        start=F.lit(0),
    ).cast("long")
    return docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        n_words.alias("n_words"),
        F.regexp_count(t, F.lit(BPE_ISH_PATTERN)).cast("long").alias("n_bpe_tokens"),
        round6((F.length(t) - (n_words - 1)).cast("double") / n_words).alias("avg_word_len"),
        round6(F.regexp_count(t, F.lit("[^A-Za-z0-9 ]")).cast("double")
            / F.greatest(F.length(t), F.lit(1))).alias("punct_ratio"),
        round6(stop_hits.cast("double") / n_words).alias("stopword_ratio"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Deterministic quality heuristic in [0, 1] per document.

    score = 0.4·len_score + 0.3·word_len_score + 0.3·stopword_score,
    where each component is a clamped ratio — the classic cheap
    pre-filter shape for pretraining corpora.  Components are computed
    UNROUNDED (rounding only the final score) so the result is
    bit-stable against the SQL oracle.
    """
    t = F.col("text")
    n_words = _ws_word_count(t)
    stop_hits = sum(
        (F.regexp_count(t, F.lit(rf"\b{w}\b")) for w in STOPWORDS),
        start=F.lit(0),
    )
    avg_word_len = (F.length(t) - (n_words - 1)).cast("double") / n_words
    stopword_ratio = stop_hits.cast("double") / n_words
    len_score = F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0))
    word_len_score = F.when(
        (avg_word_len >= 3.0) & (avg_word_len <= 8.0), 1.0
    ).otherwise(0.5)
    stop_score = F.least(stopword_ratio * 5.0, F.lit(1.0))
    return docs.select(
        "doc_id",
        round6(0.4 * len_score + 0.3 * word_len_score + 0.3 * stop_score).alias("quality"),
    )


def gopher_filters(docs: DataFrame) -> DataFrame:
    """Gopher-rule quality signals + verdict per document (Rae et al.
    2021, "Scaling Language Models: ... Gopher", App. A1.1 — the
    published heuristic document filters used for the MassiveText
    pretraining corpus; same family as C4's line filters).

    All signals are built-in expressions (split / filter / regexp_count
    — whole-stage codegen, no Python), each reported as a column so the
    verdict is auditable, with ``passes_gopher`` the published
    conjunction:

    * 50 ≤ word count ≤ 100 000
    * 3 ≤ mean word length ≤ 10
    * symbol-to-word ratio ('#' or '...') ≤ 0.1
    * ≥ 80 % of words contain an alphabetic character
    * ≥ 2 stopword hits (STOPWORDS; the paper's "stop word" rule)
    * duplicate-line fraction ≤ 0.3 (the simplest of the paper's
      repetition rules; single-line documents score 0)

    Ratios are rounded to 6 dp BEFORE the verdict on BOTH engine and
    oracle sides, so the boolean hash-compares exactly."""
    t = F.col("text")
    words = F.split(t, " ")
    n_words = F.size(words).cast("long")
    mean_wl = round6(
        (F.length(t) - (n_words - 1)).cast("double") / n_words
    )
    alpha_frac = round6(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        .cast("double") / n_words
    )
    sym_ratio = round6(
        (F.regexp_count(t, F.lit("#")) + F.regexp_count(t, F.lit(r"\.\.\.")))
        .cast("double") / n_words
    )
    stop_hits = sum(
        (F.regexp_count(t, F.lit(rf"\b{w}\b")) for w in STOPWORDS),
        start=F.lit(0),
    ).cast("long")
    lines = F.split(t, "\n")
    dup_line_frac = round6(
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / F.size(lines)
    )
    passes = (
        (n_words >= 50) & (n_words <= 100_000)
        & (mean_wl >= 3.0) & (mean_wl <= 10.0)
        & (sym_ratio <= 0.1)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
        & (dup_line_frac <= 0.3)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        sym_ratio.alias("symbol_word_ratio"),
        stop_hits.alias("stop_hits"),
        dup_line_frac.alias("dup_line_frac"),
        passes.alias("passes_gopher"),
    )


def c4_line_clean(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style line cleaning (Raffel et al. 2020, §2.2 — the published
    Common-Crawl cleaning used for the C4 pretraining corpus), all
    whole-stage-codegen, emitting the CLEANED TEXT so the transform
    itself is oracle-hashable:

    * keep only lines ending in terminal punctuation (``. ! ? "``),
    * with at least 5 words,
    * not containing "javascript" (case-insensitive);
    * document verdict ``passes_c4``: ≥ 3 kept lines, no "lorem ipsum",
      no curly brace.

    Output: (doc_id, n_lines, n_kept_lines, kept_frac, has_lorem,
    has_brace, passes_c4, clean_text) — kept lines re-joined with
    newlines (empty string when nothing survives)."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"][ ]*$')
        & (F.size(F.split(F.trim(l), " +")) >= 5)
        & ~F.lower(l).contains("javascript"),
    )
    n_lines = F.size(lines).cast("long")
    n_kept = F.size(kept).cast("long")
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    return docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        round6(n_kept.cast("double") / n_lines).alias("kept_frac"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        ((n_kept >= 3) & ~has_lorem & ~has_brace).alias("passes_c4"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def top_ngram_repetition(docs: DataFrame, n: int = 2) -> DataFrame:
    """Gopher repetition rule: the fraction of a document's characters
    covered by its most frequent word ``n``-gram (Rae et al. 2021,
    App. A1.1 — docs above ~0.2 for 2-grams are boilerplate/spam).

    Distributed shape: word n-grams explode into (doc, gram) rows and a
    two-phase count + per-doc top-1 (``row_number`` with deterministic
    (count desc, gram asc) tie-break) finds the winner — the shuffle
    carries only (doc_id, gram) pairs, never documents.  Output:
    (doc_id, top_gram, top_count, rep_frac) with
    ``rep_frac = top_count·len(top_gram)/len(text)`` (characters inside
    the occurrences themselves), 0 / '' for docs shorter than ``n``
    words."""
    if n < 1:
        raise ValueError("n must be >= 1")
    # split ONCE per row via a staged projection: referencing the split
    # inside the transform lambda re-evaluates it per gram (O(words²))
    words = F.col("_ws")
    count = F.size(words) - (n - 1)
    grams = F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from eristropy_spark.functions.partitioning import widen_narrow_input

    exploded = (
        widen_narrow_input(docs)
        .select("doc_id", F.split(F.col("text"), " ").alias("_ws"))
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    counts = exploded.groupBy("doc_id", "gram").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    top = (
        counts.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("doc_id", "gram", "cnt")
    )
    return (
        docs.select("doc_id", F.length("text").alias("_len"))
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("gram", F.lit("")).alias("top_gram"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("top_count"),
            round6(
                F.coalesce(
                    F.col("cnt") * F.length("gram") / F.col("_len"),
                    F.lit(0.0),
                )
            ).alias("rep_frac"),
        )
    )


def chunk_text(
    docs: DataFrame,
    window: int = 128,
    stride: int | None = None,
    min_tokens: int = 1,
) -> DataFrame:
    """Fixed-token-window chunking — the training-window prep step: each
    document becomes overlapping (or disjoint) word-token windows of
    ``window`` tokens, advancing by ``stride`` (default = window, i.e.
    disjoint).  Output (doc_id, chunk_id, n_tokens, chunk_text); the
    final partial window is kept when it has ≥ ``min_tokens`` tokens
    UNLESS it is fully covered by the previous window (stride <
    window): emitting it would duplicate pure suffix content.

    All in-row whole-stage-codegen (split → sequence → slice →
    posexplode): no shuffle, no Python — a document's chunks are
    produced where the document lives, which is the only shape that
    works when the corpus is 100 TB.  Tokens = whitespace words; a real
    BPE tokenizer slots into the same plumbing as a pandas_udf (the
    windowing/explode stays identical)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    stride = window if stride is None else stride
    if not 1 <= stride <= window:
        raise ValueError("stride must be in [1, window]")
    if min_tokens < 1:
        raise ValueError("min_tokens must be >= 1")
    # split once per row (staged projection below) — the chunk slices
    # would otherwise re-split the text per window start
    words = F.col("_ws")
    n = F.size(words)
    # window start indices (1-based): 1, 1+stride, ... while a NEW
    # token is covered and the tail clears min_tokens
    n_starts = F.greatest(
        F.ceil((n - F.lit(window)) / F.lit(stride)).cast("long") + 1, F.lit(1)
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_starts - 1),
        lambda k: k * stride + 1,
    )
    kept = F.filter(
        starts,
        lambda s: (F.least(n - s + 1, F.lit(window)) >= min_tokens)
        | (s == 1),
    )
    chunks = F.transform(
        kept, lambda s: F.concat_ws(" ", F.slice(words, s, window))
    )
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("_ws"))
        .select("doc_id", n.alias("_n"), F.posexplode(chunks))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("chunk_id"),
            F.least(
                F.col("_n") - (F.col("pos") * stride + 1) + 1, F.lit(window)
            ).cast("long").alias("n_tokens"),
            F.col("col").alias("chunk_text"),
        )
    )


# marker words per language — deterministic toy dictionaries; the
# documents fixture uses random word salads, so agreement with the
# `lang` column is not expected — the operator contract is the argmax
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "with"),
    "es": ("el", "la", "que"),
    "de": ("der", "und", "das"),
    "fr": ("le", "et", "les"),
    "zh": ("的", "是", "了"),
}


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, score) — argmax of marker-word hit counts.

    Ties break by language code order (deterministic).
    """
    t = F.col("text")
    scores = F.array(
        *[
            F.struct(
                sum(
                    (F.regexp_count(t, F.lit(rf"\b{w}\b")) for w in words),
                    start=F.lit(0),
                ).cast("long").alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(scores)  # struct compare: score first, then lang
    return docs.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["score"].alias("score"),
    )


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, word, tf, score, rank) — top-k words per doc by TF-IDF.

    Smooth-idf variant (sklearn's formula): ``idf = ln((1+N)/(1+df))+1``,
    ``score = tf * idf`` rounded to 6 dp (engine-portable); ranking
    orders by (rounded score desc, word asc) so ties are deterministic
    across engines.

    Plan shape at scale: tf is a (doc, word) groupBy (map-side
    combined); df is a groupBy over tf's output (already one row per
    (doc, word), so count(*) IS the document frequency); the idf
    re-attach joins on word — the dictionary side is orders of magnitude
    smaller than the corpus and AQE broadcasts it when it fits.  No
    Python anywhere.
    """
    n_docs = docs.count()  # one tiny scalar action; the corpus row count
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
    ).where(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    idf = tf.groupBy("word").agg(
        (
            F.log(
                (F.lit(1.0) + F.lit(float(n_docs)))
                / (F.lit(1.0) + F.count("*"))
            )
            + F.lit(1.0)
        ).alias("idf")
    )
    scored = tf.join(idf, "word").withColumn(
        "score", round6(F.col("tf") * F.col("idf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "word", "tf", "score", "rank")
    )


# PII patterns — ASCII-only constructs supported identically by Java
# regex (Spark) and RE2 (DuckDB), so the scrub oracle-replays exactly.
# Replacement ORDER matters (a match consumed by an earlier category
# can't double-count): email first (may contain digits/dots), then SSN
# (3-2-4 digits — disjoint from the 3-3-4 phone shape), phone, IPv4.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "|||EMAIL|||"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "|||SSN|||"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "|||PHONE|||"),
    (
        "ip",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "|||IP|||",
    ),
)


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII spans with typed sentinels (the Dolma/C4 ingest rule:
    Soldaini et al. 2024 §4.1 scrub emails/phones/IPs before training;
    Raffel et al. 2020 drop pages on a blocklist — redaction keeps the
    document).  Emits per-category counts (counted BEFORE redaction,
    in the same order the redactions apply, so a span consumed by an
    earlier category is never double-counted) plus the cleaned text.

    Pure ``regexp_count``/``regexp_replace`` chains — whole-stage
    codegen, zero shuffle, zero Python; scales as a map-only pass and
    pushes column pruning to the scan like the other text operators.
    """
    t = F.col(text_col)
    counts = []
    cleaned = t
    for name, pat, _repl in PII_PATTERNS:
        # count on the partially-cleaned text so categories are
        # mutually exclusive in application order
        counts.append(
            F.regexp_count(cleaned, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        cleaned = F.regexp_replace(cleaned, pat, _repl)
    out = docs.select("doc_id", *counts, cleaned.alias("clean_text"))
    total = None
    for name, _p, _r in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.select(
        "doc_id",
        *[f"n_{name}" for name, _p, _r in PII_PATTERNS],
        total.cast("long").alias("n_pii"),
        "clean_text",
    )


def build_vocab(
    docs: DataFrame,
    top_k: int = 1000,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Global top-k vocabulary over the corpus: (token, cnt) for the
    ``top_k`` most frequent whitespace tokens with count >=
    ``min_count``; ties broken by token ascending so the cut is
    deterministic.

    The tokenizer-training / frequency-table step of a data pipeline.
    Scale shape: explode + two-phase hash aggregate (map-side partial
    count per token, then one shuffle keyed by token) and a global
    top-k that Spark plans as TakeOrderedAndProject — a per-partition
    bounded heap merged on the driver, NEVER a full sort of the
    distinct-token table.  Peak state per task is the heap (top_k
    rows); the shuffle carries (token, partial_count) pairs only.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(top_k)
    )


def unigram_logprob(
    docs: DataFrame,
    vocab: DataFrame,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "token",
    count_col: str = "cnt",
) -> DataFrame:
    """Per-document mean unigram log-probability against a reference
    frequency table — the language-model quality proxy of CCNet-style
    pipelines (Wenzek et al. 2020 score with a real LM; the unigram
    model is the degenerate-but-deterministic member of that family):
    (doc_id, n_tok, logprob) with

        logprob = mean over tokens of ln (cnt(token) + alpha)
                                        / (N + alpha * (V + 1))

    additive (Laplace) smoothing: ``N`` = total reference count, ``V``
    = reference vocabulary size, the ``+1`` reserving one smoothed
    bucket for out-of-vocabulary tokens (cnt 0).  Higher = more typical
    of the reference corpus; downstreams threshold or take quantiles.

    Scale shape: the reference table is the SMALL side by construction
    (``build_vocab`` caps it at top_k) — it broadcasts, as does the
    one-row (N, V) total, so the corpus text never shuffles: explode is
    in-row, the vocab lookup is a broadcast hash join, and the only
    exchange is the final per-doc aggregation carrying (doc_id,
    partial-sum) pairs with map-side combine.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (zero breaks OOV smoothing)")
    totals = vocab.agg(
        F.sum(count_col).cast("double").alias("_N"),
        F.count("*").cast("double").alias("_V"),
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    )
    ref = vocab.select(
        F.col(token_col).alias("_tok"), F.col(count_col).alias("_cnt")
    )
    joined = (
        toks.join(F.broadcast(ref), "_tok", "left")
        .join(F.broadcast(totals))
    )
    logp = F.log(
        (F.coalesce(F.col("_cnt"), F.lit(0)).cast("double") + F.lit(float(alpha)))
        / (F.col("_N") + F.lit(float(alpha)) * (F.col("_V") + F.lit(1.0)))
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tok"),
            F.avg(logp).alias("logprob"),
        )
    )


def lexical_richness(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_types, n_hapax, ttr, hapax_frac, yule_k) —
    per-document lexical-richness profile over whitespace tokens:
    type-token ratio, hapax-legomenon fraction, and Yule's
    characteristic K (Yule 1944),

        K = 10^4 · (Σ_w c_w² − N) / N²,

    the repeat-rate statistic that, unlike TTR, is length-insensitive —
    the classic template-detection / generated-text screen next to
    ``top_ngram_repetition`` (high K = a few tokens dominate).

    All aggregates are exact integers (counts, Σc², hapax count); the
    three ratios are single fixed-order float expressions, so the
    DuckDB replay matches bit-for-bit.  A one-token document yields
    ttr = 1 and K = 0.

    Scale shape: explode + two two-phase hash aggregates — (doc, word)
    counts, then a doc-keyed reduce.  The second aggregate reuses the
    first's hash partitioning on the doc_id prefix; document text
    crosses the wire once, as words.  No windows, no joins, no Python.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("_w"),
    )
    wc = tok.groupBy("doc_id", "_w").agg(
        F.count("*").cast("long").alias("_c")
    )
    agg = wc.groupBy("doc_id").agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_m2"),
    )
    n = F.col("n_tokens").cast("double")
    v = F.col("n_types").cast("double")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "n_hapax",
        (v / n).alias("ttr"),
        (F.col("n_hapax").cast("double") / v).alias("hapax_frac"),
        (
            F.lit(10000.0)
            * (F.col("_m2").cast("double") - n)
            / (n * n)
        ).alias("yule_k"),
    )


def ccnet_buckets(
    docs: DataFrame,
    vocab: DataFrame,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, source, n_tok, score, bucket) — CCNet-style quality
    bucketing (Wenzek et al. 2020 §4.3): per source, documents split
    into ``head`` / ``middle`` / ``tail`` terciles of their
    language-model score (here the deterministic unigram proxy of
    :func:`unigram_logprob`; CCNet uses a real LM's perplexity).  The
    standard training-mix lever: keep head, sample middle, drop tail —
    per SOURCE, so a clean-but-small source isn't judged against the
    crawl's distribution.

    Determinism: the score is floor-quantized to the 6-dp grid BEFORE
    the tercile thresholds (exact interpolated ``percentile`` ≡
    DuckDB's ``quantile_cont``) and the >= comparisons, so boundary
    assignments are engine- and partitioning-stable even though the
    raw per-doc mean is a float reduction.

    Scale shape: the unigram score plan (broadcast vocab, text never
    shuffles, one doc-keyed aggregate), a doc-keyed equi join to
    re-attach source, then a source-keyed THRESHOLD aggregate whose
    result (one row per source) broadcasts back — NOT a window
    partitioned by source, which would funnel every row into
    n_sources partitions (a skew cliff at corpus scale) and buffer
    whole sources per task.  The threshold aggregate's exact
    ``percentile`` still buffers one source's scores on one task (the
    documented exact-path bound; swap in approx_percentile for
    unbounded sources) but only (source, score) pairs travel, never
    the full rows.  No Python.
    """
    from eristropy_spark.operators.changepoint import _floor_round

    scores = unigram_logprob(
        docs, vocab, alpha=alpha, id_col=id_col, text_col=text_col
    )
    dims = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    j = scores.join(dims, "doc_id")
    s6 = _floor_round(F.col("logprob"), 6)
    scored = j.select("doc_id", "source", "n_tok", s6.alias("score"))
    thresholds = scored.groupBy("source").agg(
        F.percentile(F.col("score"), F.lit(1.0 / 3.0)).alias("_q13"),
        F.percentile(F.col("score"), F.lit(2.0 / 3.0)).alias("_q23"),
    )
    withq = scored.join(F.broadcast(thresholds), "source")
    bucket = (
        F.when(F.col("score") >= F.col("_q23"), F.lit("head"))
        .when(F.col("score") >= F.col("_q13"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return withq.select("doc_id", "source", "n_tok", "score", bucket.alias("bucket"))
