"""Lempel–Ziv sequence complexity per signal.

``lz_complexity`` — the LZ76 exhaustive-history phrase count (Lempel &
Ziv 1976, IEEE IT-22; production algorithm: Kaspar & Schuster 1987,
Phys. Rev. A 36): scan the sequence left to right, and end the current
phrase at the first position q where the phrase x[p..q] does NOT occur
as a substring of x[..q−1] (reproduction with self-overlap — the match
may extend into the growing phrase, just never reach q).  The phrase
count c, with the normalization c·ln(n)/(n·ln(α)) over alphabet size
α, is the classic randomness/compressibility score of the EEG and
symbolic-dynamics literature — deterministic or templated sequences
give c ≪ n/log n, i.i.d. sequences approach 1 after normalization.
Complements the statistical entropies (SampEn/PermEn/renyi/markov):
LZ76 sees ALGORITHMIC structure (e.g. a de Bruijn sequence has maximal
unigram/bigram entropy but low LZ76).

Exactness: the phrase count is a pure integer computed by integer
comparisons — no floats anywhere until the final normalization, which
is one fixed expression (c·ln n)/(n·ln α) quantized to 6 dp.  The SQL
replay encodes tokens fixed-width (',' + 10-digit offset decimal, so
every substring match is token-aligned), marks each candidate phrase
(p, q) novel via ``contains`` over the length-(q−1) prefix, and walks
the greedy parse with a recursive CTE over the per-position jump
table — phrase-for-phrase identical to the kernel.

Scale shape: ONE ``mapInArrow`` boundary over the array layout; the
kernel is O(n²·L̄) integer comparisons per signal (same task-bound
class as SampEn's O(n²); long sequences go through
``operators.windowed`` slicing, exactly like the entropy kernels).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

__all__ = ["lz_complexity", "lz76_phrases", "lz76_phrases_fast"]


def lz76_phrases(x: np.ndarray) -> int:
    """Exhaustive-history LZ76 phrase count of a 1-D integer array.

    Definition-direct form: phrase x[p..q] ends at the smallest q such
    that x[p..q] does not occur in x[0..q−1] (occurrence start may be
    any i < p; the match may overlap the phrase, never reaching q).
    A final phrase whose every extension still reproduces counts as
    one phrase.  Agreement with the Kaspar–Schuster pointer algorithm
    is pinned by test.
    """
    n = int(x.size)
    p = 0
    c = 0
    while p < n:
        q = p
        advanced = False
        while q < n:
            L = q - p + 1
            # does x[p:q+1] occur in x[0:q] (starts i = 0..p−1)?
            occurs = False
            for i in range(p):
                if i + L <= q and np.array_equal(x[i : i + L], x[p : q + 1]):
                    occurs = True
                    break
            if not occurs:
                c += 1
                p = q + 1
                advanced = True
                break
            q += 1
        if not advanced:
            c += 1  # suffix fully reproducible — terminal phrase
            break
    return c


def lz76_phrases_fast(x: np.ndarray) -> int:
    """Same parse as ``lz76_phrases`` via C-speed substring search:
    tokens encode fixed-width (',' + 10-digit offset decimal — the
    SAME encoding the SQL oracle uses), so ``str.find`` over the
    length-(q−1) prefix answers "does x[p..q] occur earlier?" with
    comma-anchored alignment (a match starting with ',' can only sit
    on an 11-char boundary).  O(n²·L̄) like the reference loop but in
    memchr-accelerated C instead of per-window Python; equivalence is
    fuzz-pinned in tests."""
    n = int(x.size)
    s = "".join(f",{int(t) + 2147483648:010d}" for t in x)
    w = 11
    p = 0
    c = 0
    while p < n:
        q = p
        advanced = False
        while q < n:
            if s[: q * w].find(s[p * w : (q + 1) * w]) == -1:
                c += 1
                p = q + 1
                advanced = True
                break
            q += 1
        if not advanced:
            c += 1
            break
    return c


def lz_complexity(
    df: DataFrame,
    array_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep_cols, n, alpha, c, c_norm) — one row per signal.  ``c``
    is the LZ76 phrase count (0 for empty signals), ``alpha`` the
    alphabet size (distinct tokens), and

        c_norm = (c · ln n) / (n · ln α)

    the Kaspar–Schuster normalized complexity (NULL when n < 2 or
    α < 2, where the normalizer is degenerate).
    """
    from eristropy_spark.functions.entropy_arrow import _token_views

    in_cols = list(keep_cols) + [array_col]
    src = df.select(*in_cols)
    schema = StructType(
        [src.schema[c] for c in keep_cols]
        + [
            StructField("n", IntegerType()),
            StructField("alpha", IntegerType()),
            StructField("c", IntegerType()),
            StructField("c_norm", DoubleType()),
        ]
    )

    def _compute(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            views = _token_views(batch.column(array_col))
            ns: list[int] = []
            alphas: list[int] = []
            cs: list[int] = []
            norms: list[float | None] = []
            for v in views:
                if v is None or v.size == 0:
                    ns.append(0)
                    alphas.append(0)
                    cs.append(0)
                    norms.append(None)
                    continue
                x = np.ascontiguousarray(v, dtype=np.int64)
                n = int(x.size)
                alpha = int(np.unique(x).size)
                c = lz76_phrases_fast(x)
                ns.append(n)
                alphas.append(alpha)
                cs.append(c)
                if n < 2 or alpha < 2:
                    norms.append(None)
                else:
                    norms.append(
                        math.floor(
                            (c * math.log(n)) / (n * math.log(alpha)) * 1e6
                            + 0.5
                        )
                        / 1e6
                    )
            arrays = [batch.column(col) for col in keep_cols]
            arrays.append(pa.array(ns, type=pa.int32()))
            arrays.append(pa.array(alphas, type=pa.int32()))
            arrays.append(pa.array(cs, type=pa.int32()))
            arrays.append(pa.array(norms, type=pa.float64()))
            yield pa.RecordBatch.from_arrays(
                arrays, [*keep_cols, "n", "alpha", "c", "c_norm"]
            )

    return src.mapInArrow(_compute, schema)
