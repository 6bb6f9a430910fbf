"""Gorilla-style compression codec, from scratch in NumPy.

Public design: Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
Time Series Database", VLDB 2015 (§4.1).  Two codecs:

* ``encode_floats`` / ``decode_floats`` — XOR compression of float64
  streams: each value XORed with its predecessor; control bit 0 for a
  zero XOR, '10' reuses the previous leading/trailing-zero window, '11'
  writes 5 bits of leading-zero count + 6 bits of significant length +
  the significant bits.
* ``encode_ints`` / ``decode_ints`` — delta-of-delta compression of
  int64 streams (timestamps or token ids): buckets
  {0} / [-63,64] / [-255,256] / [-2047,2048] / 32-bit, with prefixes
  0 / 10 / 110 / 1110 / 1111 per the paper.

Bit IO is done on a growable uint8 buffer; the per-array loops run
inside Arrow-batched UDF workers where arrays are short (one sequence),
so Python-loop overhead is bounded by sequence length, not table size.
Round-trip equality is property-tested (token-array-equality invariant,
BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_floats", "decode_floats", "encode_ints", "decode_ints"]


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        arr = np.array(self.bits, dtype=np.uint8)
        return np.packbits(arr).tobytes()


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, nbits: int) -> int:
        out = 0
        for _ in range(nbits):
            out = (out << 1) | int(self.bits[self.pos])
            self.pos += 1
        return out


def encode_floats(x: np.ndarray) -> bytes:
    """Gorilla XOR-encode a float64 vector; header = 32-bit count + first value."""
    x = np.asarray(x, dtype=np.float64)
    bits = x.view(np.uint64)
    w = _BitWriter()
    w.write(x.size, 32)
    if x.size == 0:
        return w.tobytes()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lead, prev_sig = -1, 0  # no reusable window yet
    for i in range(1, x.size):
        cur = int(bits[i])
        xor = prev ^ cur
        if xor == 0:
            w.write(0, 1)
        else:
            lead = 64 - xor.bit_length()
            trail = (xor & -xor).bit_length() - 1
            lead = min(lead, 31)  # 5-bit field
            sig = 64 - lead - trail
            if (
                prev_lead >= 0
                and lead >= prev_lead
                and trail >= 64 - prev_lead - prev_sig
            ):
                # fits the previous window: control '10'
                w.write(0b10, 2)
                w.write(xor >> (64 - prev_lead - prev_sig), prev_sig)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(sig - 1, 6)  # sig in 1..64 stored as 0..63
                w.write(xor >> trail, sig)
                prev_lead, prev_sig = lead, sig
        prev = cur
    return w.tobytes()


def decode_floats(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    prev_lead, prev_sig = -1, 0
    for i in range(1, n):
        c0 = r.read(1)
        if c0 == 0:
            out[i] = prev
            continue
        c1 = r.read(1)
        if c1 == 0:
            sigbits = r.read(prev_sig)
            xor = sigbits << (64 - prev_lead - prev_sig)
        else:
            prev_lead = r.read(5)
            prev_sig = r.read(6) + 1
            sigbits = r.read(prev_sig)
            trail = 64 - prev_lead - prev_sig
            xor = sigbits << trail
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)


def _to_u64(v: int) -> int:
    return v & ((1 << 64) - 1)


def _from_u64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def encode_ints(x: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 vector (Gorilla §4.1.1 buckets)."""
    x = np.asarray(x, dtype=np.int64)
    w = _BitWriter()
    w.write(x.size, 32)
    if x.size == 0:
        return w.tobytes()
    w.write(_to_u64(int(x[0])), 64)
    if x.size == 1:
        return w.tobytes()
    first_delta = int(x[1]) - int(x[0])
    w.write(_to_u64(first_delta), 64)
    prev_delta = first_delta
    for i in range(2, x.size):
        delta = int(x[i]) - int(x[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod + 63, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod + 255, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod + 2047, 12)
        else:
            # the paper uses a 32-bit escape (timestamps); we widen to 64
            # bits so arbitrary int64 payloads (token streams) round-trip
            w.write(0b1111, 4)
            w.write(_to_u64(dod), 64)
    return w.tobytes()


def decode_ints(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = _from_u64(r.read(64))
    if n == 1:
        return out
    prev_delta = _from_u64(r.read(64))
    out[1] = out[0] + prev_delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _from_u64(r.read(64))
        prev_delta += dod
        out[i] = out[i - 1] + prev_delta
    return out
