"""PFor (patched frame-of-reference) encoding — PForDelta-equivalent.

Same computation as the reference ``PForUtil``
(``lucene/core/src/java/org/apache/lucene/codecs/lucene104/PForUtil.java:51-135``):
up to MAX_EXCEPTIONS=7 outliers are "patched" out of the block so the rest
packs at a narrower width; each exception stores (position, high bits).
The reference limits patch width to 8 bits; we store exception high bits
as a uint32 so any value fits (layout differs, computation matches).

Format:
    byte 0: number of exceptions e (0..7)
    then:   FOR-packed payload of the low-bits block (forutil.pack)
    then:   e * (4-byte index, 4-byte high bits) patches

Used for term-frequency blocks; doc-delta blocks use plain FOR
(reference: Lucene104PostingsFormat.java:172-173).
"""

from __future__ import annotations

import struct

import numpy as np

from lucene_spark.codec import forutil

MAX_EXCEPTIONS = 7  # PForUtil.java:29


def pack(values: np.ndarray) -> bytes:
    v = np.asarray(values, dtype=np.uint32)
    n = v.size
    if n == 0 or (n and (v == v[0]).all()):
        return b"\x00" + forutil.pack(v)
    # choose the patch: take out up to 7 largest values if that lowers width
    order = np.argsort(v, kind="stable")
    max_w = int(v[order[-1]]).bit_length()
    best_e, best_w = 0, max_w
    for e in range(1, min(MAX_EXCEPTIONS, n - 1) + 1):
        w = int(v[order[-e - 1]]).bit_length()
        # cost model: width*n bits vs exceptions at 8 bytes each
        if w * n + e * 64 < best_w * n + best_e * 64:
            best_e, best_w = e, w
    if best_e == 0:
        return b"\x00" + forutil.pack(v, width=max(1, max_w))
    exc_idx = np.sort(order[-best_e:])
    low = v.copy()
    w = max(1, best_w)
    mask = np.uint32((1 << w) - 1)
    high = (v[exc_idx] >> np.uint32(w)).astype(np.uint32)
    low[exc_idx] &= mask
    out = [bytes([best_e]), forutil.pack(low, width=w)]
    for i, h in zip(exc_idx, high):
        out.append(struct.pack("<II", int(i), int(h)))
    return b"".join(out)


def unpack(data: bytes) -> np.ndarray:
    e = data[0]
    if e == 0:
        return forutil.unpack(data[1:])
    patch_bytes = e * 8
    payload = data[1:-patch_bytes]
    v = forutil.unpack(payload)
    w = payload[0]
    for k in range(e):
        i, h = struct.unpack_from("<II", data, len(data) - patch_bytes + k * 8)
        v[i] |= np.uint32(h << w)
    return v
