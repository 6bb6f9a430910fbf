"""Streaming additive Holt–Winters — the ingest-door twin of
``operators/smoothing.holt_winters`` as a custom stateful operator
(``applyInPandasWithState``), same batch-parity protocol as
``streaming_rsi_macd`` / ``streaming_zscore``.

State per key is the full recursion state plus the classical-init
buffer: a point counter, the level/trend doubles, the seasonal ring
(m doubles, carried as an array — the state codec stores doubles
bit-exact), and — only until 2·period points have arrived — the
buffered (ts, tiebreak, quantized value) triples the two-season init
needs.  The batch operator's first m output rows (the seasonal init
rows) depend on l₀, which is unknowable before point 2m arrives, so
the twin HOLDS BACK all emission until the 2m-th point, then flushes
the whole init prefix in one micro-batch and streams append-per-event
from there.  Keys that never reach 2m points emit nothing — exactly
the batch operator's drop rule, read as "not enough data yet".

Every quantity folds through the LITERAL batch expressions in the
same order over the same exact-integer grid values (u sums in Python
ints, l₀ = (S/10^d)/m, b₀ = (D/10^d)/m², then the α/β/γ recursion),
so emitted rows are bit-identical to the batch operator on the same
prefix (pinned by test_streaming_holtwinters).

Ordering contract: identical to streaming_cusum — rows fold in
(ts, tiebreak) order within each micro-batch, state carries across
batches in arrival order; equals batch whenever each key's event time
is non-decreasing across micro-batches.

Emission is append-per-event after init; state is O(keys) rows of
(m + 2) doubles and a long once initialized (the init buffer is
cleared on flush) — the continuous-aggregate shape.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["streaming_holt_winters"]

_STATE_SCHEMA = StructType(
    [
        StructField("i", LongType()),
        StructField("lvl", DoubleType()),
        StructField("trd", DoubleType()),
        StructField("ring", ArrayType(DoubleType())),
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_tb", ArrayType(LongType())),
        StructField("buf_u", ArrayType(LongType())),
    ]
)


def streaming_holt_winters(
    events_stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    tiebreak_col: str | None = None,
    exact_decimals: int = 6,
) -> DataFrame:
    """(key, ts, [tiebreak], i, level, trend, seasonal, fitted) per
    input row once the key has seen >= 2·period points — the streaming
    triple-smoothing chart, bit-identical to the batch operator."""
    m = int(period)
    if m < 2:
        raise ValueError(f"period must be >= 2, got {m}")
    for name, val in (("alpha", alpha), ("gamma", gamma)):
        if not (0.0 < val <= 1.0):
            raise ValueError(f"{name} must be in (0, 1], got {val}")
    if not (0.0 <= beta <= 1.0):
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    d = int(exact_decimals)
    if not 0 < d <= 12:
        raise ValueError(f"exact_decimals must be in 1..12, got {d}")
    a, bt, g = float(alpha), float(beta), float(gamma)
    one_a, one_b, one_g = 1.0 - a, 1.0 - bt, 1.0 - g
    scale = float(10**d)

    out_fields = [
        StructField(key_col, StringType()),
        StructField(ts_col, TimestampType()),
    ]
    sort_cols = [ts_col]
    if tiebreak_col is not None:
        out_fields.append(StructField(tiebreak_col, LongType()))
        sort_cols.append(tiebreak_col)
    out_fields += [
        StructField("i", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("seasonal", DoubleType()),
        StructField("fitted", DoubleType()),
    ]
    out_schema = StructType(out_fields)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            i, lvl, trd, ring, buf_ts, buf_tb, buf_u = state.get
            ring = list(ring)
            buf_ts, buf_tb, buf_u = list(buf_ts), list(buf_tb), list(buf_u)
        else:
            i, lvl, trd = 0, 0.0, 0.0
            ring, buf_ts, buf_tb, buf_u = [], [], [], []

        def _emit_row(rows, ts_us, tb, idx, level, trend, seasonal, fitted):
            rows[key_col].append(key[0])
            rows[ts_col].append(pd.Timestamp(int(ts_us), unit="us"))
            if tiebreak_col is not None:
                rows[tiebreak_col].append(None if tb is None else int(tb))
            rows["i"].append(idx)
            rows["level"].append(level)
            rows["trend"].append(trend)
            rows["seasonal"].append(seasonal)
            rows["fitted"].append(fitted)

        for pdf in pdfs:
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
            rows: dict[str, list] = {c.name: [] for c in out_fields}
            ts_us_col = (pdf[ts_col].astype("int64") // 1000).tolist()
            tb_col = (
                pdf[tiebreak_col].tolist()
                if tiebreak_col is not None
                else [None] * len(pdf)
            )
            vals = pdf[value_col].tolist()
            for ts_us, tb, v in zip(ts_us_col, tb_col, vals):
                u = int(math.floor(float(v) * scale + 0.5))
                i += 1
                if i < 2 * m:
                    buf_ts.append(int(ts_us))
                    buf_tb.append(0 if tb is None else int(tb))
                    buf_u.append(u)
                    continue
                if i == 2 * m:
                    buf_ts.append(int(ts_us))
                    buf_tb.append(0 if tb is None else int(tb))
                    buf_u.append(u)
                    # the literal batch init over the exact-int grid
                    l0 = (sum(buf_u[:m]) / scale) / m
                    b0 = ((sum(buf_u[m:2 * m]) - sum(buf_u[:m])) / scale) / (
                        m * m
                    )
                    x = [ui / scale for ui in buf_u]
                    ring = [x[j] - l0 for j in range(m)]
                    lvl, trd = l0, b0
                    for j in range(m):  # init rows: seasonal only
                        _emit_row(
                            rows, buf_ts[j], buf_tb[j], j + 1,
                            None, None, ring[j], None,
                        )
                    for t in range(m, 2 * m):  # replay the buffered tail
                        su = ring[0]
                        f = lvl + trd + su
                        new_l = a * (x[t] - su) + one_a * (lvl + trd)
                        new_b = bt * (new_l - lvl) + one_b * trd
                        new_s = g * (x[t] - new_l) + one_g * su
                        ring = ring[1:] + [new_s]
                        lvl, trd = new_l, new_b
                        _emit_row(
                            rows, buf_ts[t], buf_tb[t], t + 1,
                            new_l, new_b, new_s, f,
                        )
                    buf_ts, buf_tb, buf_u = [], [], []
                    continue
                # steady state: one literal recursion step per point
                xt = u / scale
                su = ring[0]
                f = lvl + trd + su
                new_l = a * (xt - su) + one_a * (lvl + trd)
                new_b = bt * (new_l - lvl) + one_b * trd
                new_s = g * (xt - new_l) + one_g * su
                ring = ring[1:] + [new_s]
                lvl, trd = new_l, new_b
                _emit_row(rows, ts_us, tb, i, new_l, new_b, new_s, f)
            if rows[key_col]:
                yield pd.DataFrame(rows)
        state.update((i, lvl, trd, ring, buf_ts, buf_tb, buf_u))

    cols = [key_col, ts_col, value_col] + (
        [tiebreak_col] if tiebreak_col is not None else []
    )
    return (
        events_stream.select(*cols)
        .groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
