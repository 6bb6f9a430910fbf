"""Sequence packing — the concat-and-split step that turns variable-
length documents into fixed-length training windows.

Training pipelines do not feed raggedly-sized documents to the model:
they concatenate the token streams of many documents (with a separator
token between them) and cut the concatenation into windows of exactly
``seq_len`` tokens, so every batch row is full and no compute is spent
on padding.  The operator here produces the *packing manifest*: one row
per (document, pack) segment saying which slice of which document lands
where in which pack.  The manifest is pure integers — exactly
reproducible, oracle-checkable, and the only thing a downstream
tokenizer/loader needs (it can stream the text itself; the manifest is
the shuffle-free index).

Scale design (the part that has to survive 100 TB):

* **No global order.**  A single global concatenation would need one
  total-ordered prefix sum — a 1-partition window, the classic scale
  killer.  Real pipelines pack per SHARD: documents are dealt into
  ``n_shards`` deterministic shards (md5 of the doc id, same
  partition-invariant construction as ``md5_split``) and each shard is
  packed independently.  ``pack`` ids are local to a shard, so the
  output key is (shard, pack).  Each shard's prefix sum runs under
  ``Window.partitionBy(shard)`` — ``n_shards`` independent sorted
  streams, embarrassingly parallel; at 100 TB you raise ``n_shards``
  (100k shards of ~1 GB) and nothing else changes.
* **In-row segment fan-out.**  A document spanning several packs emits
  its segments via ``explode(sequence(first_pack, last_pack))`` — pure
  whole-stage codegen next to the document row; the explode factor is
  ceil(n/seq_len)+1, never data-dependent blow-up.
* **Exact integer arithmetic** (`DIV`, no doubles), so the manifest is
  bit-identical across engines, partitionings and cluster sizes.

Separator convention: each document is followed by ``sep`` separator
token(s) in the stream (``<eos>``-style).  Separator positions are the
pack positions NOT covered by any segment — the loader inserts the sep
token there; the manifest only carries document content.

No reference counterpart (zblanks/eristropy has no text pipeline);
this composes with ``chunk_text`` (operators/text.py) which windows
WITHIN a document, while packing windows ACROSS documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eristropy_spark.operators.sampling import md5_bucket

__all__ = ["pack_sequences", "materialize_packs"]


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 128,
    n_shards: int = 8,
    sep: int = 1,
    drop_last: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Packing manifest for ``docs``: one row per (document, pack)
    segment.

    Output columns (all exact integers apart from the id):

    * ``shard``     — md5 shard of the doc id, in [0, n_shards)
    * ``pack``      — pack index within the shard (0-based)
    * ``doc_id``    — the document
    * ``seg_start`` — 1-based first token of the segment within the doc
    * ``seg_len``   — tokens of the doc in this pack (>= 1)
    * ``pack_pos``  — 0-based position of the segment inside the pack

    Documents are ordered by ``doc_id`` within a shard (deterministic:
    the stream layout is a pure function of the data, never of the
    partitioning).  Tokens are whitespace words, the same convention as
    ``chunk_text``; a real BPE tokenizer changes only the token-count
    expression.  With ``drop_last`` (default) the trailing partial pack
    of each shard is dropped — the standard training convention; pass
    ``False`` to keep it.  ``n_shards`` must be in [1, 256] (one md5
    byte deals the shards; raise the byte count before raising this
    bound).
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if not 1 <= n_shards <= 256:
        raise ValueError("n_shards must be in [1, 256]")
    if sep < 0:
        raise ValueError("sep must be >= 0")
    n = F.size(F.split(F.col(text_col), " ")).cast("long")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n"),
        (md5_bucket(F.col(id_col)) % n_shards).cast("int").alias("shard"),
    )
    w_run = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("shard")
    stride = F.col("n") + F.lit(sep)
    d = d.withColumn(
        "off", F.coalesce(F.sum(stride).over(w_run), F.lit(0).cast("long"))
    ).withColumn("tot", F.sum(stride).over(w_all))
    seg = d.select(
        "shard",
        "doc_id",
        "n",
        "off",
        "tot",
        F.explode(
            F.sequence(
                F.expr(f"off DIV {seq_len}"),
                F.expr(f"(off + n - 1) DIV {seq_len}"),
            )
        ).alias("pack"),
    )
    g0 = F.greatest(F.col("off"), F.col("pack") * seq_len)
    g1 = F.least(F.col("off") + F.col("n"), (F.col("pack") + 1) * seq_len)
    out = seg.select(
        "shard",
        F.col("pack").cast("long").alias("pack"),
        "doc_id",
        (g0 - F.col("off") + 1).cast("long").alias("seg_start"),
        (g1 - g0).cast("long").alias("seg_len"),
        (g0 - F.col("pack") * seq_len).cast("long").alias("pack_pos"),
        "tot",
    )
    if drop_last:
        out = out.where(F.col("pack") < F.expr(f"tot DIV {seq_len}"))
    return out.drop("tot")


def materialize_packs(
    docs: DataFrame,
    manifest: DataFrame,
    seq_len: int,
    sep_token: str = "<|sep|>",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Render the manifest into actual packed token sequences:
    (shard, pack, pack_text, n_docs) with every pack exactly
    ``seq_len`` tokens, separator positions filled with ``sep_token``.

    One equi-join manifest↔docs on doc_id (broadcastable manifests
    broadcast; both sides otherwise shuffle on the id once) and one
    groupBy (shard, pack).  Inside the aggregation everything is
    in-row array code: slice the document's words to the segment,
    pad the gap to the NEXT segment (or the pack end) with separator
    tokens — gaps are exactly the separator positions by construction.
    Peak per-task state is one pack (seq_len tokens), independent of
    corpus size.
    """
    words = F.split(F.col(text_col), " ")
    joined = manifest.join(
        docs.select(F.col(id_col).alias("doc_id"), words.alias("_ws")),
        "doc_id",
    )
    seg_tok = F.slice(F.col("_ws"), F.col("seg_start"), F.col("seg_len"))
    segs = joined.select(
        "shard",
        "pack",
        F.struct(F.col("pack_pos"), seg_tok.alias("toks")).alias("seg"),
    )
    agg = segs.groupBy("shard", "pack").agg(
        F.sort_array(F.collect_list("seg")).alias("segs"),
        F.count("*").cast("long").alias("n_docs"),
    )
    # walk the ordered segments, padding the gap before each with sep
    # tokens; then pad the tail to seq_len
    filled = F.aggregate(
        F.col("segs"),
        F.struct(
            F.lit(0).cast("long").alias("at"),
            F.array().cast("array<string>").alias("acc"),
        ),
        lambda acc, s: F.struct(
            (s["pack_pos"] + F.size(s["toks"])).cast("long").alias("at"),
            F.concat(
                acc["acc"],
                F.array_repeat(
                    F.lit(sep_token), (s["pack_pos"] - acc["at"]).cast("int")
                ),
                s["toks"],
            ).alias("acc"),
        ),
        lambda acc: F.concat(
            acc["acc"],
            F.array_repeat(
                F.lit(sep_token), (F.lit(seq_len) - acc["at"]).cast("int")
            ),
        ),
    )
    return agg.select(
        "shard",
        "pack",
        F.concat_ws(" ", filled).alias("pack_text"),
        "n_docs",
    )
