"""Streaming Page–Hinkley drift alarm — the ingest-door twin of
``operators/changepoint.page_hinkley`` (Page 1954; the streaming-drift
form of Mouss et al. 2004) as a custom stateful operator
(``applyInPandasWithState``).

Unlike the known-target streaming CUSUM (``streaming/cusum.py``),
Page–Hinkley self-centers on the RUNNING mean — which IS a streaming
quantity — so this twin needs no upstream calibration at all: the
per-key state is five integers on the ``exact_decimals`` grid plus
the first-alarm index,

    i      observation count
    S     += u_i                     (grid units of the value)
    M     += floor((u_i/g − (S/g)/i − δ)·g + 0.5)   g = 10^d
    minM   = min(minM, M)
    ph     = M − minM,   ph_max = max(ph_max, ph)
    alarm  = first i with ph > λ·g   (sticky)

— the EXACT integer fold of the batch operator's DECIMAL windows
(u/g and S/g are correctly-rounded doubles of the same rationals the
batch CASTs from DECIMAL, and the per-term floor quantization matches
``_floor_round``), so the emitted chart is bit-identical to the batch
operator on the same prefix (parity-pinned in
tests/test_streaming_ph.py).

Ordering contract: rows fold in (ts, tiebreak) order within each
micro-batch and state carries across batches in arrival order — equal
to the batch chart whenever per-key event time is non-decreasing
across micro-batches (the ingest-door case).

State is O(keys); every input row emits its chart point exactly once
(append mode).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["streaming_page_hinkley"]

_STATE_SCHEMA = StructType(
    [
        StructField("i", LongType()),
        StructField("s_units", LongType()),
        StructField("m_units", LongType()),
        StructField("min_m", LongType()),
        StructField("ph_max", LongType()),
        StructField("alarm_i", LongType()),  # -1 = no alarm yet
    ]
)


def streaming_page_hinkley(
    events_stream: DataFrame,
    key_col: str,
    delta: float = 0.0,
    lam: float = 50.0,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    exact_decimals: int = 6,
) -> DataFrame:
    """(key, ts, [tiebreak], i, ph, ph_max, alarm_i, alarm) per input
    row — the streaming Page–Hinkley chart.  ``delta``/``lam`` follow
    the batch operator's semantics and must be exact on the
    ``exact_decimals`` grid."""
    if lam <= 0:
        raise ValueError(f"threshold lam must be > 0, got {lam}")
    d = int(exact_decimals)
    if not 0 < d <= 12:
        raise ValueError(f"exact_decimals must be in 1..12, got {d}")
    for name, val in (("delta", delta), ("lam", lam)):
        if round(val, d) != val:
            raise ValueError(
                f"{name}={val} is not exact at {d} decimals; quantize it"
            )
    scale = 10**d
    lam_units = int(round(lam * scale))
    delta_f = float(delta)

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
        StructField("ph", DoubleType()),
        StructField("ph_max", DoubleType()),
        StructField("alarm_i", LongType()),
        StructField("alarm", BooleanType()),
    ]
    out_schema = StructType(out_fields)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        i, s_units, m_units, min_m, ph_max, alarm_i = (
            state.get if state.exists else (0, 0, 0, 0, 0, -1)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
            rows: dict[str, list] = {c.name: [] for c in out_fields}
            for _, row in pdf.iterrows():
                v = float(row[value_col])
                u = int(math.floor(v * scale + 0.5))
                i += 1
                s_units += u
                # the batch operator's exact float shape:
                # CAST(vq AS DOUBLE) - CAST(S AS DOUBLE)/i - delta
                term = u / scale - (s_units / scale) / i - delta_f
                m_units += int(math.floor(term * scale + 0.5))
                min_m = m_units if i == 1 else min(min_m, m_units)
                ph = m_units - min_m
                ph_max = max(ph_max, ph)
                if alarm_i < 0 and ph > lam_units:
                    alarm_i = i
                rows[key_col].append(key[0])
                rows[ts_col].append(row[ts_col])
                if tiebreak_col is not None:
                    rows[tiebreak_col].append(int(row[tiebreak_col]))
                rows["i"].append(i)
                rows["ph"].append(float(ph) / scale)
                rows["ph_max"].append(float(ph_max) / scale)
                rows["alarm_i"].append(alarm_i if alarm_i > 0 else None)
                rows["alarm"].append(bool(ph > lam_units))
            if rows[key_col]:
                yield pd.DataFrame(rows)
        state.update((i, s_units, m_units, min_m, ph_max, alarm_i))

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
