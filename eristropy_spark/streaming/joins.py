"""Stream-stream event-time interval join — the ingest-door enrichment
shape (clicks joined to the impressions that preceded them, spans
joined to the points they cover) as a native Structured Streaming
inner join.

Semantics: left row L matches right row R when the keys are equal and

    R.ts in [L.ts - before_sec, L.ts + after_sec]   (inclusive)

— the same inclusive-bounds contract as the batch
``operators/temporal.interval_join`` (point-in-expanded-interval
form).  Inner matches emit as soon as both rows have arrived; the
watermarks exist to BOUND STATE, not to gate output.

Scale shape: Spark keeps each side's rows in the join state store
only while they can still match — the range condition is written
directly against the two raw event-time columns (never a derived
expression), which is what lets the planner compute state-eviction
predicates from the watermarks (see Spark's stream-stream join docs:
a condition on transformed timestamps silently degrades to
unbounded state).  State per key ≈ (watermark horizon + join window)
× arrival rate, the same O(horizon) bound as the repo's other
streaming operators, and the join itself is the standard keyed
exchange — no broadcast, both sides genuinely unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_interval_join"]


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    before_sec: int = 0,
    after_sec: int = 600,
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join two (streaming or batch) DataFrames on ``on`` equality
    plus the inclusive event-time window above.  Right-side columns are
    emitted under ``right_prefix`` so the result schema is unambiguous.

    Works identically on batch inputs (the parity tests run the same
    plan both ways); on streaming inputs both sides MUST carry event
    time in ``left_ts``/``right_ts`` and get the given watermarks.
    """
    if before_sec < 0 or after_sec < 0:
        raise ValueError("before_sec/after_sec must be >= 0 (use 'before' "
                         "for how far the right may precede the left)")
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"join key {on!r} must exist on both sides")
    l = left
    r = right
    if l.isStreaming:
        # watermarks require TIMESTAMP; the corpus stores TIMESTAMP_NTZ
        # (the engine pins sessions to UTC, so the cast is lossless —
        # same convention as streaming/entropy.py)
        l = l.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
        l = l.withWatermark(left_ts, left_watermark)
    if r.isStreaming:
        r = r.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
        r = r.withWatermark(right_ts, right_watermark)
    renames = {c: right_prefix + c for c in r.columns}
    clash = set(renames.values()) & set(l.columns)
    if clash:
        raise ValueError(f"right_prefix produces colliding columns: {sorted(clash)}")
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    # the range condition references the two RAW event-time columns so
    # the streaming planner can derive state-eviction bounds
    cond = F.expr(
        f"`{on}` = `{right_prefix}{on}` AND "
        f"`{right_prefix}{right_ts}` >= `{left_ts}` "
        f"- INTERVAL {int(before_sec)} SECONDS AND "
        f"`{right_prefix}{right_ts}` <= `{left_ts}` "
        f"+ INTERVAL {int(after_sec)} SECONDS"
    )
    return l.join(r, cond, "inner")
