"""SmallFloat: Lucene's lossy small-int-to-byte encodings.

Semantics match the reference implementation
(``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167``):
``longToInt4`` keeps the 4 most-significant bits (float-like, order
preserving); ``intToByte4`` shifts the encoding up by ``NUM_FREE_VALUES``
so that values ``0..NUM_FREE_VALUES-1`` round-trip exactly.

All functions have scalar and vectorized (numpy) forms; the vectorized
forms are used in the norm-encoding hot path of the segment writer.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    """Order-preserving 4-significant-bit float-like encoding of i >= 0."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # clear the implicit MSB
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)  # == longToInt4(Integer.MAX_VALUE)
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24 in the reference


def int_to_byte4(i: int) -> int:
    """Encode int -> unsigned byte (0..255). Exact for i < NUM_FREE_VALUES."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode unsigned byte (0..255) back to the quantized int."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


# 256-entry decode table (mirrors BM25Similarity.LENGTH_TABLE).
LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.float32)
_DECODE_TABLE_I64 = np.array([byte4_to_int(i) for i in range(256)], dtype=np.int64)


def int_to_byte4_np(values: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over a non-negative int array -> uint8."""
    v = np.asarray(values, dtype=np.int64)
    if v.size and v.min() < 0:
        raise ValueError("Only supports positive values")
    out = np.empty(v.shape, dtype=np.int64)
    small = v < NUM_FREE_VALUES
    out[small] = v[small]
    big = ~small
    if big.any():
        x = v[big] - NUM_FREE_VALUES
        # bit_length via log2 on float64 is unsafe near powers of two; use
        # the exact integer formulation instead.
        num_bits = np.zeros(x.shape, dtype=np.int64)
        nz = x > 0
        # int64 values here are < 2**62; frexp gives exact exponent for
        # exactly-representable ints, but lengths can exceed 2**53 in
        # theory — use a loop-free exact method: count bits by comparing
        # against powers of two.
        xs = x[nz]
        bits = np.zeros(xs.shape, dtype=np.int64)
        for p in range(63, -1, -1):
            mask = (xs >> p) > 0
            bits = np.where((bits == 0) & mask, p + 1, bits)
        num_bits[nz] = bits
        shift = np.maximum(num_bits - 4, 0)
        sub = num_bits < 4
        enc = np.where(
            sub, x, ((x >> shift) & 0x07) | ((shift + 1) << 3)
        )
        out[big] = NUM_FREE_VALUES + enc
    return out.astype(np.uint8)


def byte4_to_int_np(values: np.ndarray) -> np.ndarray:
    """Vectorized byte4_to_int over a uint8 array -> int64."""
    return _DECODE_TABLE_I64[np.asarray(values, dtype=np.uint8)]
