"""Deterministic distributed RNG derivation.

The reference seeds one global Numba RNG (eristropy/utils.py:38-40), so
bootstrap draws depend on pandas group iteration order.  A distributed
engine must instead derive an independent, *stable* stream per sequence
so results are identical across partitionings, task schedules, and
parallelism levels.  We hash ``(global_seed, doc_id)`` with BLAKE2b
(stable across processes — unlike Python's ``hash``, which is
PYTHONHASHSEED-salted) into a PCG64 seed.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["sequence_seed", "sequence_rng", "content_seed"]


def content_seed(global_seed: int | None, x: "np.ndarray") -> int:
    """Stable 32-bit seed derived from a sequence's VALUES (for kernels
    reached through fused UDFs that see only the token array, not the
    id).  Same invariance argument as :func:`sequence_seed`: the draw
    depends on (global seed, content) only — never on partition order,
    task schedule, or parallelism."""
    h = hashlib.blake2b(f"{global_seed}|".encode("utf-8"), digest_size=4)
    h.update(np.ascontiguousarray(x, dtype=np.float64).tobytes())
    return int.from_bytes(h.digest(), "big")


def sequence_seed(global_seed: int | None, doc_id: str) -> int:
    """Stable 64-bit seed for one sequence's RNG stream."""
    key = f"{global_seed}|{doc_id}".encode("utf-8")
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")


def sequence_rng(global_seed: int | None, doc_id: str) -> np.random.Generator:
    """Per-sequence PCG64 generator, reproducible on any executor."""
    return np.random.Generator(np.random.PCG64(sequence_seed(global_seed, doc_id)))
