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


def _bit_widths(mx: np.ndarray) -> np.ndarray:
    """Vector bit_length of non-negative int64 values (exact: float
    log2 estimate corrected by shifts)."""
    mx = np.asarray(mx, dtype=np.int64)
    w = np.zeros(mx.size, dtype=np.int64)
    pos = mx > 0
    est = np.floor(np.log2(np.maximum(mx, 1).astype(np.float64))).astype(np.int64) + 1
    # exact correction for float rounding at power-of-two boundaries
    est = np.where((mx >> np.minimum(est, 63)) > 0, est + 1, est)
    est = np.where((est > 1) & ((mx >> np.maximum(est - 1, 0)) == 0), est - 1, est)
    w[pos] = est[pos]
    return w


def pack_many(values: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> list:
    """FOR-pack many blocks at once: block i is ``values[starts[i]:
    ends[i]]`` (blocks may be arbitrary, possibly non-contiguous,
    slices), output bytes are identical to ``pack(block)`` (width
    auto). ONE np.packbits scatter per distinct bit width replaces a
    Python pack() call per block — the batch path of the segment
    encoder (the invert hot loop of SURVEY §3.1)."""
    values = np.asarray(values, dtype=np.uint32)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    nb = starts.size
    out: list = [None] * nb
    n_i = ends - starts
    ne_idx = np.flatnonzero(n_i > 0)
    empty = struct.pack("<BII", 0, 0, 0)
    for i in np.flatnonzero(n_i <= 0):
        out[i] = empty
    if ne_idx.size == 0:
        return out
    # gather all nonempty blocks' values into one compact array
    ns = n_i[ne_idx]
    gidx = np.concatenate([np.arange(starts[i], ends[i]) for i in ne_idx])
    gv = values[gidx]
    off = np.concatenate(([0], np.cumsum(ns)))
    gv64 = gv.astype(np.int64)
    mx = np.maximum.reduceat(gv64, off[:-1])
    mn = np.minimum.reduceat(gv64, off[:-1])
    first = gv64[off[:-1]]
    alleq = mx == mn
    for j in np.flatnonzero(alleq):
        out[ne_idx[j]] = struct.pack("<BII", 0, int(first[j]), int(ns[j]))
    todo = np.flatnonzero(~alleq)  # compact indices
    if todo.size == 0:
        return out
    widths = np.maximum(_bit_widths(mx[todo]), 1)
    for w in np.unique(widths):
        selc = todo[widths == w]  # compact block indices of this width
        w = int(w)
        nsw = ns[selc]
        nbytes = (nsw * w + 7) // 8
        byte_off = np.concatenate(([0], np.cumsum(nbytes)))
        total_bytes = int(byte_off[-1])
        gwidx = np.concatenate(
            [np.arange(off[j], off[j + 1]) for j in selc]
        )
        gwv = gv[gwidx].astype(np.uint64)
        gb = np.repeat(np.arange(selc.size), nsw)
        gr = np.arange(gwv.size) - np.repeat(
            np.concatenate(([0], np.cumsum(nsw)))[:-1], nsw
        )
        bits = np.zeros(total_bytes * 8, dtype=np.uint8)
        base = byte_off[gb] * 8 + gr * w
        posk = base[:, None] + np.arange(w, dtype=np.int64)[None, :]
        valk = (gwv[:, None] >> np.arange(w, dtype=np.uint64)[None, :]) & 1
        bits[posk.ravel()] = valk.ravel().astype(np.uint8)
        packed = np.packbits(bits).tobytes()
        for jj, j in enumerate(selc):
            hdr = struct.pack("<BI", w, int(nsw[jj]))
            out[ne_idx[j]] = hdr + packed[int(byte_off[jj]) : int(byte_off[jj + 1])]
    return out
