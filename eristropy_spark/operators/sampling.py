"""Deterministic, engine-portable sampling for training-data pipelines.

``df.sample()`` is seed-dependent on the PARTITIONING (each partition
draws its own stream), so the same seed over the same data yields a
different sample after a repartition — useless for reproducible corpus
cuts, and impossible to oracle.  ``md5_sample`` instead keeps a row iff
a prefix of ``md5(key)`` falls below a threshold:

* deterministic in the KEY alone — stable across partitionings,
  engines, cluster sizes and re-runs (md5 is bit-identical everywhere),
* a pure filter: pushes down next to the scan, no shuffle, no RNG
  state, trivially composable with further lineage,
* stratified variants fall out for free (key on (source, doc_id) to
  sample per-source, or on a user id to sample by USER with all their
  rows kept together — the standard leakage-safe split).

The rate is expressed as ``num/256`` via the first two hex digits, so
the Spark filter and the DuckDB oracle compare the same substring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["md5_sample", "md5_bucket", "md5_split", "mix_corpus", "shuffle_corpus", "stratified_sample", "gini_balance", "theil_inequality"]


def md5_bucket(key: Column) -> Column:
    """First md5 hex byte of the key as an int in [0, 255]."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 2), 16, 10).cast(
        "int"
    )


def md5_sample(
    df: DataFrame, key_col: str, rate_num: int, rate_den: int = 256
) -> DataFrame:
    """Keep rows whose md5-bucket < ``rate_num`` (rate = num/den).

    ``rate_den`` must be 256 (one hex byte) — the single-byte bucket
    keeps the oracle a plain substring compare; finer rates would take
    more hex digits.
    """
    if rate_den != 256:
        raise ValueError("rate_den must be 256 (single md5 hex byte)")
    if not (0 <= rate_num <= 255):
        # 256/256 would need a 3-char threshold, breaking the 2-char
        # lexicographic compare — a full keep needs no sampling anyway
        raise ValueError("rate_num must be in [0, 255]")
    threshold = format(rate_num, "02x")
    return df.where(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
        < F.lit(threshold)
    )


def md5_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test split assignment — adds a ``split``
    column from the row's md5 bucket (0-255) against cumulative weight
    ranges.

    Same portability story as ``md5_sample``: the assignment is a pure
    function of (salt, key), so it is stable across partitionings,
    engines, cluster sizes and re-runs, and pushes down as a plain
    expression.  Key on a GROUP id (user, document family) and every
    row of the group lands in the same split — the standard
    leakage-safe construction.  ``weights`` maps split name -> bucket
    count out of 256 (default 230/13/13 ≈ 90/5/5); names are assigned
    in the given order, so the mapping is reproducible from the config
    alone.  ``salt`` re-deals the split without touching the keys.
    """
    if weights is None:
        weights = {"train": 230, "val": 13, "test": 13}
    if sum(weights.values()) != 256:
        raise ValueError("weights must sum to 256 (md5 bucket space)")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("every split weight must be positive")
    bucket = md5_bucket(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    expr = None
    hi = 0
    for name, w in weights.items():
        hi += w
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def mix_corpus(
    df: DataFrame,
    rates: dict[str, int],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    default: int = 0,
) -> DataFrame:
    """Deterministic corpus mixing — per-source sampling rates in
    1/256ths that both DOWN-sample (rate < 256) and UP-sample
    (rate > 256, i.e. repeat: the "N epochs of Wikipedia" move) in one
    pass.

    A row's copy count is ``rate DIV 256`` plus one more iff its
    md5-bucket (salted, so mixing never correlates with ``md5_split``
    or ``md5_sample`` cuts on the same keys) falls below
    ``rate % 256`` — so a rate of 640 yields exactly 2.5x the source
    in expectation, deterministically in the key alone.  Copies are
    emitted in-row via ``explode(sequence(0, n_copies-1))`` as an
    ``epoch`` column (0-based), so downstream shuffles can still
    de-correlate repeats by (key, epoch).  Unlisted sources get
    ``default`` (drop by default).

    Scale: a pure map-side expression + bounded explode — no shuffle,
    no RNG state, stable under repartitioning; the filter on
    n_copies > 0 prunes dropped sources right at the scan.
    """
    if not rates:
        raise ValueError("rates must be non-empty")
    for s, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for {s!r} must be >= 0")
    if default < 0:
        raise ValueError("default rate must be >= 0")
    bucket = md5_bucket(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    rate = None
    for name, r in rates.items():
        cond = F.col(source_col) == name
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = rate.otherwise(default)
    n_copies = (
        F.floor(rate / 256).cast("long")
        + F.when(bucket < rate % 256, 1).otherwise(0)
    )
    return (
        df.withColumn("_n_copies", n_copies)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
        .withColumn("epoch", F.col("epoch").cast("long"))
    )


def shuffle_corpus(
    df: DataFrame,
    key_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global training-order shuffle: append ``shard``
    (int in [0, n_shards)) and ``pos`` (0-based rank within the shard)
    so that reading shards in order, each sorted by ``pos``, visits the
    corpus in a fixed pseudo-random permutation — the "shuffle the
    corpus once before packing/training" step every pipeline needs.

    The permutation is a function of the KEY alone (salted md5), so it
    is stable across partitionings, engines, cluster sizes and re-runs,
    and salted so it never correlates with ``md5_sample`` /
    ``md5_split`` / ``mix_corpus`` decisions on the same keys.  Ties in
    the 32-hex order key are broken by the key itself, making ``pos``
    total even under hash collisions.

    Scale shape: this is how you shuffle 100 TB without a global sort —
    ONE hash-partition exchange on ``shard`` and a per-shard local sort
    for the rank window; no SinglePartition stage, no driver
    involvement.  ``n_shards`` bounds task state (shard = corpus /
    n_shards rows); at petabyte scale raise it so a shard fits an
    executor's spill budget, exactly like choosing output-file counts.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    shard = F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % n_shards
    out = df.withColumn("_h", h).withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_h"), F.col(key_col).cast("string"))
    )
    return (
        out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_h")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic exactly-min(k, |stratum|)-per-stratum sample: rank
    rows within each stratum by md5(salt || key) (ties broken by the
    key itself) and keep the first ``k`` — the balanced-mix counterpart
    of ``md5_sample``'s global rate (equalize sources for a training
    mix, cap a dominant crawl, build per-domain eval slices).

    Hash-rank selection is a uniform random sample per stratum that is
    simultaneously (a) partition-invariant, (b) engine-portable (the
    oracle replays md5 + row_number verbatim), and (c) stable under
    corpus growth ONLY for the rows that keep their rank — use a fresh
    ``salt`` per epoch to re-deal, the same lever as ``mix_corpus``.

    Scale shape: one keyed Exchange + a rank window per stratum; the
    k-row cut happens inside the window scan (no global sort, no
    collect).  A stratum with 10⁹ rows still streams — the window
    carries only (stratum, hash) ordering state.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h, F.col(key_col).cast("string"))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def gini_balance(
    docs,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(source, n_docs, total_tok, gini) — Gini coefficient of the
    per-document token-count distribution within each source (Gini
    1912, rank formulation):

        G = (2·Σ_i i·x_(i) − (n+1)·Σx) / (n·Σx)

    over counts sorted ascending.  The shard-balance / packing-planner
    statistic: G ≈ 0 means uniform doc sizes (any chunking works),
    G → 1 means a few giant documents dominate the source (pack or
    split before sharding, or the long tail of tasks stalls the
    stage).  Every term is an exact integer — ties contribute x·Σi
    independent of their order, so the (count, doc_id) rank tiebreak
    is purely cosmetic and the single final division is the only float
    op (bit-identical in any engine).

    Scale shape: an in-row token count (no explode — ``size(split())``
    is pure codegen), ONE source-keyed Exchange for the rank window +
    same-key reduce.  No joins, no Python.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    per_doc = docs.select(
        F.col(group_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("_x"),
    )
    w = Window.partitionBy("source").orderBy("_x", "doc_id")
    ranked = per_doc.withColumn("_i", F.row_number().over(w))
    agg = ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_x").cast("long").alias("total_tok"),
        F.sum(F.col("_i") * F.col("_x")).cast("long").alias("_ix"),
    )
    n = F.col("n_docs")
    tot = F.col("total_tok")
    gini = (
        (F.lit(2) * F.col("_ix") - (n + F.lit(1)) * tot).cast("double")
        / (n * tot).cast("double")
    )
    nulld = F.lit(None).cast("double")
    return agg.select(
        "source",
        "n_docs",
        "total_tok",
        F.when(tot > 0, gini).otherwise(nulld).alias("gini"),
    )


def theil_inequality(
    docs,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(source, n_docs, n_pos, total_tok, theil_t, theil_l,
    atkinson_1) — the entropy-based inequality indices of the
    per-document token-count distribution within each source, the
    DECOMPOSABLE complements of ``gini_balance`` (Gini compares all
    pairs; Theil's indices are the only inequality measures that
    split exactly into within-source + between-source components —
    Theil 1967, Shorrocks 1980 — which is what a corpus-mixing
    planner actually wants):

        T  = Σ x·ln(x)/S − ln(S/n)          (Theil T, top-sensitive)
        L  = ln(S/n) − Σ ln(x)/n            (Theil L / MLD,
                                             bottom-sensitive)
        A1 = 1 − exp(−L)                    (Atkinson ε=1: the share
                                             of total tokens you
                                             could discard under
                                             equal doc sizes)

    over the n_pos documents with x > 0 tokens (ln needs x > 0;
    zero-token docs are counted in n_docs but excluded from the
    indices, the standard convention).  T ≈ 0 ⇒ uniform doc sizes;
    T grows when giants dominate (top-heavy), L when near-empty docs
    dominate (bottom-heavy) — the two tails gini folds into one
    number.

    Exactness protocol: x and S are exact integers; the only
    order-dependent pieces are the two log sums, so each per-doc term
    (x·ln x and ln x) is floor-quantized to the 12-dp grid and
    accumulated as DECIMAL(38,12) (order- and partition-free); each
    index is then ONE fixed float expression — bit-identical in the
    DuckDB replay (both engines' ln agree at the 6-dp output grid,
    the corpus_divergence precedent).

    Scale shape: in-row token count (no explode), ONE source-keyed
    hash aggregate (map-side combined — no window, unlike gini's
    rank form).  No joins, no Python.
    """
    per_doc = docs.select(
        F.col(group_col).alias("source"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("_x"),
    )
    d12 = "decimal(38,12)"
    xd = F.col("_x").cast("double")
    q12 = lambda c: F.floor(c * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)  # noqa: E731
    agg = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("_x") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum("_x").cast("long").alias("total_tok"),
        F.sum(
            F.when(F.col("_x") > 0, q12(xd * F.log(xd)).cast(d12)).otherwise(
                F.lit(0).cast(d12)
            )
        ).alias("_xlx"),
        F.sum(
            F.when(F.col("_x") > 0, q12(F.log(xd)).cast(d12)).otherwise(
                F.lit(0).cast(d12)
            )
        ).alias("_lx"),
    )

    s = F.col("total_tok").cast("double")
    n = F.col("n_pos").cast("double")
    mu_log = F.log(s / n)
    theil_t = F.col("_xlx").cast("double") / s - mu_log
    theil_l = mu_log - F.col("_lx").cast("double") / n
    ok = (F.col("n_pos") > 0) & (F.col("total_tok") > 0)
    nulld = F.lit(None).cast("double")
    return agg.select(
        "source",
        "n_docs",
        "n_pos",
        "total_tok",
        F.when(ok, theil_t).otherwise(nulld).alias("theil_t"),
        F.when(ok, theil_l).otherwise(nulld).alias("theil_l"),
        F.when(ok, F.lit(1.0) - F.exp(-theil_l)).otherwise(nulld).alias(
            "atkinson_1"
        ),
    )
