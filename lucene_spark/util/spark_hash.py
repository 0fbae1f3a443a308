"""Murmur3_x86_32 identical to Spark's ``F.hash()`` on string columns.

Spark hashes a string column as Murmur3_x86_32 over its UTF-8 bytes with
seed 42 (public Spark source:
sql/catalyst/.../expressions/hash.scala + catalyst Murmur3HashFunction).
We re-implement it so the pure-Python oracle and the engine agree on
``pid = pmod(hash(url), num_segments)`` — the doc->segment assignment —
without running Spark. Verified against ``F.hash`` in tests.
"""

from __future__ import annotations

import struct

import numpy as np

_MASK = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK
    h ^= h >> 16
    return h


def murmur3_bytes(data: bytes, seed: int = 42) -> int:
    """Signed int32 Murmur3_x86_32, Spark variant.

    NOTE: Spark's Murmur3 processes tail bytes one-at-a-time as *signed*
    ints through the k1 mixing (unlike the reference C++ which composes
    the tail into one word) — this matters for non-ASCII input.
    """
    h1 = seed & _MASK
    c1, c2 = 0xCC9E2D51, 0x1B873593
    n = len(data) & ~3
    for i in range(0, n, 4):
        (k1,) = struct.unpack_from("<i", data, i)
        k1 &= _MASK
        k1 = (k1 * c1) & _MASK
        k1 = _rotl(k1, 15)
        k1 = (k1 * c2) & _MASK
        h1 ^= k1
        h1 = _rotl(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _MASK
    # Spark/Guava style tail: each remaining byte mixed individually (signed)
    for i in range(n, len(data)):
        b = data[i]
        if b >= 128:
            b -= 256  # signed byte, sign-extended
        k1 = b & _MASK
        k1 = (k1 * c1) & _MASK
        k1 = _rotl(k1, 15)
        k1 = (k1 * c2) & _MASK
        h1 ^= k1
        h1 = _rotl(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _MASK
    h1 ^= len(data)
    h1 = _fmix(h1)
    if h1 >= 1 << 31:
        h1 -= 1 << 32
    return h1


def spark_hash_str(s: str, seed: int = 42) -> int:
    return murmur3_bytes(s.encode("utf-8"), seed)


def pmod_partition(s: str, num_partitions: int) -> int:
    """pmod(hash(url), P) — the engine's doc->segment assignment rule."""
    return spark_hash_str(s) % num_partitions


def pmod_partition_batch(urls, num_partitions: int) -> np.ndarray:
    return np.fromiter(
        (pmod_partition(u, num_partitions) for u in urls),
        dtype=np.int32,
        count=len(urls),
    )
