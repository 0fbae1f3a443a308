"""FOR (Frame-of-Reference) fixed-width bit packing, vectorized with numpy.

Same computation as the reference's generated ``ForUtil``
(``lucene/core/src/java/org/apache/lucene/codecs/lucene104/ForUtil.java:26-80``,
BLOCK_SIZE=256): a block of non-negative ints is packed at the minimal
fixed bit width. The reference interleaves lanes for SIMD; we use a
bit-matrix layout (``np.packbits``) because numpy IS our vector ISA —
the byte layout differs, the computation and compression ratio match.

Format of one packed block:
    byte 0:   bit width b (0..32); 0 means "all values identical"
    width 0:  4-byte little-endian value, 2-byte count
    width>0:  2-byte count n, then ceil(n*b/8) bytes of bit-matrix data
              (np.packbits of the (n, b) LSB-first bit matrix)
"""

from __future__ import annotations

import struct

import numpy as np

BLOCK_SIZE = 256  # reference ForUtil.java:34


def bit_width(values: np.ndarray) -> int:
    """Minimal bits needed for max(values) (0 if all zero)."""
    if values.size == 0:
        return 0
    m = int(values.max())
    return int(m).bit_length()


def pack(values: np.ndarray, width: int | None = None) -> bytes:
    """Pack a non-negative uint32 array at fixed bit width."""
    v = np.asarray(values, dtype=np.uint32)
    n = v.size
    if n == 0:
        return struct.pack("<BII", 0, 0, 0)
    if width is None:
        # all-equal block -> single value (PForUtil.java:51-60 analog)
        if (v == v[0]).all():
            return struct.pack("<BII", 0, int(v[0]), n)
        width = max(1, bit_width(v))
    if width == 0:
        return struct.pack("<BII", 0, int(v[0]), n)
    # (n, width) bit matrix, LSB first, packed row-major
    bits = (v[:, None] >> np.arange(width, dtype=np.uint32)[None, :]) & 1
    packed = np.packbits(bits.astype(np.uint8), axis=None)
    return struct.pack("<BI", width, n) + packed.tobytes()


def unpack(data: bytes) -> np.ndarray:
    """Inverse of :func:`pack` -> uint32 array."""
    if not data:
        return np.empty(0, dtype=np.uint32)
    width = data[0]
    if width == 0:
        value, n = struct.unpack_from("<II", data, 1)
        return np.full(n, value, dtype=np.uint32)
    (n,) = struct.unpack_from("<I", data, 1)
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8, offset=5), count=n * width
    ).reshape(n, width)
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64)).astype(np.uint64)
    return (bits.astype(np.uint64) @ weights).astype(np.uint32)
