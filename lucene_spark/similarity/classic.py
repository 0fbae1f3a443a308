"""ClassicSimilarity (TF-IDF) — the pluggable-Similarity extension
point (SURVEY.md §2.11; reference
``search/similarities/ClassicSimilarity.java`` /
``TFIDFSimilarity.java``):

    tf(freq)  = sqrt(freq)
    idf(df)   = 1 + ln((docCount + 1) / (df + 1))
    norm      = 1 / sqrt(quantized_doc_len)
    score     = tf * idf^2 * norm          (per term)

Satisfies the Similarity monotonicity contract (``Similarity.java:
139-146``): non-decreasing in freq, non-increasing in doc length —
which is what makes the block-max impact bounds rank-safe for ANY
plugged similarity (the impacts store (tf, norm) pairs, not scores).

Both dtypes provided; f64 mirrors a DuckDB oracle op-for-op
(idf2 = idf*idf; score = sqrt(tf) * idf2 * (1/sqrt(qlen)))."""

from __future__ import annotations

import math

import numpy as np

from lucene_spark.util.smallfloat import LENGTH_TABLE


def idf_classic(doc_freq: int, doc_count: int) -> float:
    return 1.0 + math.log((doc_count + 1) / (doc_freq + 1.0))


class ClassicScorerF64:
    """Double-precision TF-IDF on SmallFloat-quantized lengths."""

    def __init__(self, idf_value: float):
        self.idf2 = float(idf_value) * float(idf_value)
        # norm lookup per encoded byte: 1/sqrt(quantized length)
        lt = LENGTH_TABLE.astype(np.float64)
        with np.errstate(divide="ignore"):
            self.norm = 1.0 / np.sqrt(lt)
        self.norm[lt == 0.0] = 0.0

    def score(self, freq, norm_bytes) -> np.ndarray:
        f = np.asarray(freq, dtype=np.float64)
        nb = self.norm[np.asarray(norm_bytes, dtype=np.uint8)]
        return np.sqrt(f) * self.idf2 * nb


class ClassicScorerF32:
    """float32 operation order mirroring TFIDFSimilarity's float math."""

    def __init__(self, idf_value: float):
        i32 = np.float32(idf_value)
        self.idf2 = np.float32(i32 * i32)
        lt = LENGTH_TABLE.astype(np.float32)
        with np.errstate(divide="ignore"):
            self.norm = (np.float32(1.0) / np.sqrt(lt)).astype(np.float32)
        self.norm[lt == np.float32(0.0)] = np.float32(0.0)

    def score(self, freq, norm_bytes) -> np.ndarray:
        f = np.asarray(freq, dtype=np.float32)
        nb = self.norm[np.asarray(norm_bytes, dtype=np.uint8)]
        return (np.sqrt(f) * self.idf2 * nb).astype(np.float32)
