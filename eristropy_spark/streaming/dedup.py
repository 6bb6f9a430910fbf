"""Streaming exact dedup — watermarked, bounded-state duplicate drop.

Batch ``exact_dedup`` (operators/dedup.py) groups the whole corpus; a
stream cannot hold unbounded history.  The streaming surface is
``dropDuplicatesWithinWatermark`` keyed on the normalized-content hash:
each content key's FIRST arrival passes through, repeats inside the
watermark horizon are dropped, and Spark evicts key state older than
the horizon — state is O(distinct keys per horizon), not O(corpus).

This is the standard ingest-door dedup for a training-data pipeline:
exact-duplicate suppression as documents arrive, with the batch
MinHash-LSH / clustering passes downstream for near-dups.  The horizon
is a real semantic: a duplicate arriving AFTER its original has aged
out of the watermark is re-admitted (the test pins this), which is the
price of bounded state — size the watermark to the dedup window the
pipeline needs, and let the periodic batch pass catch the stragglers.

``exact=True`` (``dropDuplicates``) keeps state forever — unbounded,
only for bounded backfills replayed through the streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_exact_dedup"]


def streaming_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
    exact: bool = False,
) -> DataFrame:
    """First arrival per normalized content passes; repeats within the
    watermark horizon are dropped.  ``docs`` is a streaming DataFrame
    with an event-time column; output keeps the input columns.

    The key is ``sha2(lower(trim(text)), 256)`` — the same
    normalization as the batch ``exact_dedup`` — so the streaming and
    batch passes agree on what "exact duplicate" means.
    """
    if not docs.isStreaming:
        raise ValueError("streaming_exact_dedup expects a streaming DataFrame")
    key = F.sha2(F.lower(F.trim(F.col(text_col))), 256).alias("_content_key")
    with_key = docs.select("*", key).withWatermark(ts_col, watermark)
    if exact:
        deduped = with_key.dropDuplicates(["_content_key"])
    else:
        deduped = with_key.dropDuplicatesWithinWatermark(["_content_key"])
    return deduped.drop("_content_key")
