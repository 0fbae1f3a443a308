"""BM25 similarity with Lucene's exact float semantics.

Reproduces the computation of the reference
(``lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java``):

- idf:        ``(float) ln(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5))``
              (double math, cast to float32)                      [:101-104]
- phrase idf: sum of per-term float idfs accumulated in double    [:161-170]
- avgdl:      ``(float)(sumTotalTermFreq / (double) docCount)``   [:106-109]
- norm cache: ``cache[i] = 1f/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl))``
              256 float32 entries                                 [:181-184]
- score:      ``weight - weight / (1f + freq * cache[norm])``
              all float32, weight = boost * idf (f32 multiply)    [:218-238]

numpy float32 arithmetic is IEEE-754 single precision with
round-to-nearest-even, identical to the JVM, so scores match the
reference bit-for-bit. A float64 mode is provided for differential
testing against SQL oracles (DuckDB computes in double).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from lucene_spark.util.smallfloat import LENGTH_TABLE

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf(doc_freq: int, doc_count: int) -> float:
    """Per-term idf; double math then float32 cast (BM25Similarity.java:101-104)."""
    v = math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
    return float(np.float32(v))


def idf_phrase(doc_freqs: list[int], doc_count: int) -> float:
    """Phrase idf = sum of per-term float idfs, accumulated in double
    (BM25Similarity.java:161-170)."""
    acc = 0.0
    for df in doc_freqs:
        acc += idf(df, doc_count)
    return float(np.float32(acc))


def avgdl(sum_total_term_freq: int, doc_count: int) -> float:
    """(float)(sumTotalTermFreq / (double) docCount) (BM25Similarity.java:106-109)."""
    return float(np.float32(sum_total_term_freq / float(doc_count)))


@dataclass(frozen=True)
class BM25Scorer:
    """Frozen per-(term-or-phrase, field) scorer: weight + 256-entry norm cache.

    ``dtype='f32'`` matches Lucene bit-for-bit. ``dtype='f64'`` performs the
    same operations in double precision with *exact* doc lengths (no
    SmallFloat quantization unless ``quantize``), for SQL-oracle parity.
    """

    weight: float
    cache: np.ndarray  # float32[256] of 1/norm values

    @staticmethod
    def build(
        idf_value: float,
        avgdl_value: float,
        boost: float = 1.0,
        k1: float = K1_DEFAULT,
        b: float = B_DEFAULT,
    ) -> "BM25Scorer":
        k1f = np.float32(k1)
        bf = np.float32(b)
        av = np.float32(avgdl_value)
        # cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))
        cache = np.float32(1.0) / (
            k1f * ((np.float32(1.0) - bf) + bf * LENGTH_TABLE / av)
        )
        weight = float(np.float32(boost) * np.float32(idf_value))
        return BM25Scorer(weight=weight, cache=cache.astype(np.float32))

    def score(self, freq: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        """Vectorized ``weight - weight / (1 + freq * cache[norm])`` in f32.

        freq: int/float array of term (or phrase) frequencies.
        norm_bytes: uint8 array of encoded norms.
        """
        w = np.float32(self.weight)
        norm_inv = self.cache[np.asarray(norm_bytes, dtype=np.uint8)]
        f = np.asarray(freq, dtype=np.float32)
        return (w - w / (np.float32(1.0) + f * norm_inv)).astype(np.float32)

    def max_score(self, freq: float | np.ndarray, norm_bytes: int | np.ndarray):
        """Score upper bound for an impact (freq, norm) pair — same formula."""
        return self.score(np.atleast_1d(freq), np.atleast_1d(norm_bytes))


def score_f64(
    freq: np.ndarray,
    doc_len: np.ndarray,
    doc_freq: int,
    doc_count: int,
    sum_total_tf: int,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """Double-precision BM25 on *quantized* doc lengths, for DuckDB-oracle
    differential queries. Mirrors the SQL in ``__spark_entry__.oracle_sql``:

        idf   = ln(1 + (N - df + 0.5) / (df + 0.5))
        norm  = k1 * (1 - b + b * qlen / (sum_tf / N))
        score = idf - idf / (1 + tf / norm)

    where qlen = smallfloat-quantized token count (see quantize_len_f64).
    """
    idfv = math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
    avg = sum_total_tf / float(doc_count)
    norm = k1 * (1.0 - b + b * np.asarray(doc_len, dtype=np.float64) / avg)
    f = np.asarray(freq, dtype=np.float64)
    return idfv - idfv / (1.0 + f / norm)


def quantize_len_f64(lengths: np.ndarray) -> np.ndarray:
    """byte4ToInt(intToByte4(len)) as int64 — the norm quantization both the
    engine (via uint8 norms) and the SQL oracle apply to doc lengths."""
    from lucene_spark.util.smallfloat import byte4_to_int_np, int_to_byte4_np

    return byte4_to_int_np(int_to_byte4_np(np.asarray(lengths, dtype=np.int64)))
