"""Temporal relational operators — as-of join and sessionization.

Spark has no native AS OF join (the classic timeseries "attach the most
recent reading" operator).  The naive formulations do not survive scale:
a range self-join explodes (every left row × every earlier right row
before aggregation), and a per-row probe is a driver loop.  The
scalable shape used here is the UNION + RUNNING-WINDOW plan:

1. tag left rows side=1 and right rows side=0 into ONE frame on the
   shared key + timestamp,
2. one window partitioned by key, ordered by (ts, side) — right rows
   sort before left rows at equal timestamps, giving the inclusive
   ``left.ts >= right.ts`` match,
3. ``last(value, ignorenulls=True)`` over a running frame carries each
   right value forward to every later left row,
4. filter back to side=1.

Cost: ONE shuffle (the window partitioning), zero joins, O(rows) per
partition — at 10¹² rows this is a single sort-based exchange, the same
plan a native ASOF operator would pick.  DuckDB's native ``ASOF JOIN``
is the independent oracle.

``sessionize`` is the standard gap-based session assignment (lag +
running sum of new-session flags) — one window over the same
partitioning, also one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "sessionize", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    greatest ``right_ts <= left_ts`` for its key (inclusive), or nulls.

    ``value_cols`` are the right columns to carry (default: all
    non-key, non-ts).  ``tolerance_sec`` drops matches older than the
    given age.  Output = all left columns + ``<right_ts><suffix>`` (the
    matched timestamp) + ``<v><suffix>`` per value column.

    Right rows that tie on (key, ts) are carried in an unspecified
    order — pre-aggregate the right side to one row per (key, ts) when
    that matters (DuckDB's ASOF JOIN has the same ambiguity).

    The matched row is carried ATOMICALLY: the right-side (ts, values)
    ride inside ONE struct and a single ``last(ignorenulls=True)``
    carries the struct forward.  A matched row whose value column is
    legitimately NULL therefore yields NULL (like DuckDB's ASOF JOIN) —
    per-column carries would instead backfill a stale value from an
    older right row and could even mix columns from different rows.
    """
    from pyspark.sql.types import StructField, StructType

    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in set(keys) | {right_ts}
        ]
    carried = [f"{v}{suffix}" for v in value_cols]
    ts_out = f"{right_ts}{suffix}"
    left_payload = [c for c in left.columns if c not in set(keys) | {left_ts}]

    carry_type = StructType(
        [StructField("__ts", right.schema[right_ts].dataType)]
        + [StructField(a, right.schema[v].dataType)
           for v, a in zip(value_cols, carried)]
    )
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(carry_type).alias("_carry"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType.simpleString()).alias(c)
          for c in left_payload],
        F.struct(
            F.col(right_ts).alias("__ts"),
            *[F.col(v).alias(a) for v, a in zip(value_cols, carried)],
        ).alias("_carry"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        *keys,
        "_ts",
        "_side",
        *left_payload,
        F.last("_carry", ignorenulls=True).over(w).alias("_m"),
    )
    out = filled.where(F.col("_side") == 1)
    match = F.col("_m")
    if tolerance_sec is not None:
        fresh = (
            F.col("_ts").cast("timestamp").cast("double")
            - F.col("_m.__ts").cast("timestamp").cast("double")
        ) <= F.lit(float(tolerance_sec))
        match = F.when(fresh, F.col("_m"))
        out = out.select(*keys, "_ts", *left_payload, match.alias("_m"))
    return out.select(
        *keys,
        F.col("_ts").alias(left_ts),
        *left_payload,
        F.col("_m.__ts").alias(ts_out),
        *[F.col(f"_m.{a}").alias(a) for a in carried],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_sec: float = 3600.0,
    max_buckets_per_interval: int = 10_000,
    invalid_intervals: str = "error",
) -> DataFrame:
    """Range join: each point row × every interval (same key) with
    ``start <= ts <= end`` (inclusive both ends).

    The naive formulation is a cartesian-per-key range predicate —
    Spark executes it as BroadcastNestedLoopJoin or a per-key cross
    product, both fatal at scale.  This is the BUCKETED range join
    instead: intervals explode into the ``bucket_sec``-wide time buckets
    they cover (explode factor = interval length / bucket width), each
    point maps to exactly ONE bucket, and the join becomes an equi-join
    on (key, bucket) + a residual range filter.  Because a point has a
    single bucket, no dedup step is needed — each qualifying
    (point, interval) pair is produced exactly once.  Pick ``bucket_sec``
    near the typical interval length: wider buckets fatten the residual
    filter, narrower ones fatten the interval explode.

    Guards (executor-side, so one bad row fails loudly instead of
    exploding the job):

    - a reversed interval (``end < start``) raises by default
      (``invalid_intervals="error"``) or is silently dropped
      (``"drop"``) — unguarded it would produce a descending
      ``sequence`` and zero matches with no diagnostic;
    - an interval covering more than ``max_buckets_per_interval``
      buckets (a degenerate open-ended sentinel like year 9999, or a
      months-long interval against a tiny ``bucket_sec``) raises with
      the offending bounds — a clamp would silently miss matches.
      Raise the limit (or widen ``bucket_sec``) deliberately if your
      intervals really are that long.
    """
    keys = [on] if isinstance(on, str) else list(on)
    b = float(bucket_sec)
    if b <= 0:
        raise ValueError("bucket_sec must be > 0")
    if max_buckets_per_interval < 1:
        raise ValueError("max_buckets_per_interval must be >= 1")
    if invalid_intervals not in ("error", "drop"):
        raise ValueError("invalid_intervals must be 'error' or 'drop'")

    def _epoch(c):
        return F.col(c).cast("timestamp").cast("double")

    s_b = F.floor(_epoch(start_col) / b).cast("long")
    e_b = F.floor(_epoch(end_col) / b).cast("long")
    reversed_ival = _epoch(end_col) < _epoch(start_col)
    if invalid_intervals == "drop":
        intervals = intervals.where(~reversed_ival)
        bad = F.lit(False)
    else:
        bad = reversed_ival
    too_wide = (e_b - s_b + 1) > F.lit(int(max_buckets_per_interval))
    # the guard rides inside the sequence's start bound so Catalyst
    # can't prune it away; raise_error fires on the executor with the
    # offending interval's bounds in the message
    guard_msg = F.format_string(
        "interval_join: bad interval [start=%s, end=%s]: reversed "
        "(end < start) or covering more than %d buckets of "
        + f"{b:g}s — fix the interval, widen bucket_sec, or raise "
        "max_buckets_per_interval",
        F.col(start_col).cast("string"),
        F.col(end_col).cast("string"),
        F.lit(int(max_buckets_per_interval)),
    )
    guarded_start = F.when(bad | too_wide, F.raise_error(guard_msg)).otherwise(s_b)
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(guarded_start.cast("long"), e_b)),
    )
    pts = points.withColumn(
        "_bucket", F.floor(_epoch(point_ts) / b).cast("long")
    )
    return (
        pts.join(ivals, [*keys, "_bucket"])
        .where(
            (_epoch(point_ts) >= _epoch(start_col))
            & (_epoch(point_ts) <= _epoch(end_col))
        )
        .drop("_bucket")
    )


def sessionize(
    events: DataFrame,
    key_cols: str | list[str],
    ts_col: str = "ts",
    gap_sec: float = 1800.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the gap
    to the previous event of the same key exceeds ``gap_sec`` (strict).

    Adds ``session_id`` (0-based per key, ordered by time).  One window
    over one shuffle; ``tiebreak`` breaks timestamp ties deterministically
    (session ids are tie-order-invariant — equal timestamps have gap 0 —
    but downstream per-row consumers may care).
    """
    if gap_sec <= 0:
        raise ValueError("gap_sec must be > 0")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_d = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(ts_d).over(w)
    new_sess = (
        prev.isNull() | ((ts_d - prev) > F.lit(float(gap_sec)))
    ).cast("long")
    return events.withColumn(
        "session_id", (F.sum(new_sess).over(run) - F.lit(1)).cast("long")
    )
