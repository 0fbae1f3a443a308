"""Query-time scorer construction from frozen global stats.

The Weight-creation stage of SURVEY.md §3.2 step 3: global collection
stats (docCount, sumTotalTermFreq) + per-term docFreq are resolved ONCE
across all segments, so scores are comparable across segments
(``search/TermQuery.java:51-87``).

Two dtypes:
- 'f32': Lucene's exact float32 semantics (the rank-identity contract).
- 'f64': the same formula in double precision on SmallFloat-quantized
  lengths — mirrors the DuckDB oracle SQL op-for-op, used only by the
  driver-correctness queries.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from lucene_spark.search import ast
from lucene_spark.similarity import bm25
from lucene_spark.util.smallfloat import LENGTH_TABLE


@dataclass(frozen=True)
class GlobalStats:
    doc_count: int
    sum_total_tf: int
    doc_freq: dict  # term -> global docFreq

    def df(self, term: str) -> int:
        return int(self.doc_freq.get(term, 0))


class ScorerF64:
    """Double-precision BM25 on quantized lengths (oracle-SQL parity).

    score = idf - idf / (1 + tf / (k1*(1-b+b*qlen/avg)))  — all float64.
    """

    def __init__(self, idf_value: float, avg: float, k1=1.2, b=0.75):
        self.weight = float(idf_value)
        self.norm_factor = k1 * (1.0 - b + b * LENGTH_TABLE.astype(np.float64) / avg)

    def score(self, freq, norm_bytes):
        nf = self.norm_factor[np.asarray(norm_bytes, dtype=np.uint8)]
        f = np.asarray(freq, dtype=np.float64)
        return self.weight - self.weight / (1.0 + f / nf)


def idf_f64(doc_freq: int, doc_count: int) -> float:
    return math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))


def build_scorers(q: ast.Query, stats: GlobalStats, dtype: str = "f32") -> dict:
    """scorer per scoring leaf: term -> scorer, phrase term-tuple -> scorer."""
    out: dict = {}
    av32 = bm25.avgdl(stats.sum_total_tf, stats.doc_count)
    av64 = stats.sum_total_tf / float(stats.doc_count)

    def add_term(t: str):
        if ("t", t) in out:
            return
        if dtype == "f32":
            out[("t", t)] = bm25.BM25Scorer.build(
                bm25.idf(stats.df(t), stats.doc_count), av32
            )
        else:
            out[("t", t)] = ScorerF64(idf_f64(stats.df(t), stats.doc_count), av64)

    def add_phrase(terms: tuple):
        if ("p", terms) in out:
            return
        if dtype == "f32":
            idf_sum = bm25.idf_phrase(
                [stats.df(t) for t in terms], stats.doc_count
            )
            out[("p", terms)] = bm25.BM25Scorer.build(idf_sum, av32)
        else:
            idf_sum = sum(idf_f64(stats.df(t), stats.doc_count) for t in terms)
            out[("p", terms)] = ScorerF64(idf_sum, av64)

    def walk(node: ast.Query):
        if isinstance(node, ast.TermQuery):
            add_term(node.term)
        elif isinstance(node, ast.PhraseQuery):
            add_phrase(node.terms)
            for t in node.terms:
                add_term(t)
        elif isinstance(node, ast.BooleanQuery):
            for c in node.must + node.should + node.must_not + node.filter:
                walk(c)

    walk(q)
    return out
