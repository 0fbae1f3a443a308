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
    doc_freq: dict  # term (fielded key) -> global docFreq
    # per-field CollectionStatistics (docCount = docs with >=1 token of
    # the field, sumTotalTermFreq per field — Terms.getDocCount /
    # getSumTotalTermFreq semantics). None = single-field legacy index:
    # the top-level doc_count/sum_total_tf apply to every term.
    field_stats: "dict | None" = None  # field -> (doc_count, sum_total_tf)

    def df(self, term: str) -> int:
        return int(self.doc_freq.get(term, 0))

    def collection(self, field: str) -> tuple:
        """(docCount, sumTotalTermFreq) for one field."""
        if self.field_stats and field in self.field_stats:
            dc, stf = self.field_stats[field]
            return int(dc), int(stf)
        return self.doc_count, self.sum_total_tf


class ScorerF64:
    """Double-precision BM25 on quantized lengths (oracle-SQL parity).

    score = w - w / (1 + tf / (k1*(1-b+b*qlen/avg))), w = boost*idf —
    all float64.
    """

    def __init__(self, idf_value: float, avg: float, boost: float = 1.0, k1=1.2, b=0.75):
        self.weight = float(boost) * float(idf_value)
        self.norm_factor = k1 * (1.0 - b + b * LENGTH_TABLE.astype(np.float64) / avg)

    def score(self, freq, norm_bytes):
        nf = self.norm_factor[np.asarray(norm_bytes, dtype=np.uint8)]
        f = np.asarray(freq, dtype=np.float64)
        return self.weight - self.weight / (1.0 + f / nf)


def idf_f64(doc_freq: int, doc_count: int) -> float:
    return math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))


def build_scorers(q: ast.Query, stats: GlobalStats, dtype: str = "f32") -> dict:
    """One BM25 scorer per scoring leaf, keyed BOTH by the AST node
    itself (frozen dataclasses hash by value; BoostQuery leaves get
    their boost folded into the float32 weight, ``BoostQuery.java`` +
    ``BM25Similarity.java:218``) and by the legacy tuple keys
    (("t", term) / ("p", terms)) the kernels use for unboosted leaves."""
    out: dict = {}
    _field_avg: dict = {}

    def field_env(field: str):
        """(docCount, av32, av64) of one field, cached. A field with
        doc_count == 0 (every value empty -> no norms, no postings) gets
        avgdl 1: its terms have df == 0 and no postings, so they score
        as no-match like the reference's absent terms — the avgdl value
        is never observable, it just must not divide by zero."""
        hit = _field_avg.get(field)
        if hit is None:
            dc, stf = stats.collection(field)
            if dc == 0:
                hit = (0, np.float32(1.0), 1.0)
            else:
                hit = (dc, bm25.avgdl(stf, dc), stf / float(dc))
            _field_avg[field] = hit
        return hit

    def leaf_scorer(field: str, idf32: float, idf64: float, boost: float):
        _, av32, av64 = field_env(field)
        if dtype == "f32":
            return bm25.BM25Scorer.build(idf32, av32, boost=boost)
        return ScorerF64(idf64, av64, boost=boost)

    def term_scorer(t: str, boost: float):
        field = ast.field_of(t)
        dc, _, _ = field_env(field)
        return leaf_scorer(field, bm25.idf(stats.df(t), dc), idf_f64(stats.df(t), dc), boost)

    def phrase_scorer(terms: tuple, boost: float):
        field = ast.field_of(terms[0])
        dc, _, _ = field_env(field)
        return leaf_scorer(
            field,
            bm25.idf_phrase([stats.df(t) for t in terms], dc),
            sum(idf_f64(stats.df(t), dc) for t in terms),
            boost,
        )

    def walk(node: ast.Query, boost: float = 1.0):
        if isinstance(node, ast.TermQuery):
            out.setdefault(("t", node.term, boost), term_scorer(node.term, boost))
            if boost == 1.0:
                out.setdefault(("t", node.term), out[("t", node.term, 1.0)])
        elif isinstance(node, ast.PhraseQuery):
            out.setdefault(("p", node.terms, boost), phrase_scorer(node.terms, boost))
            if boost == 1.0:
                out.setdefault(("p", node.terms), out[("p", node.terms, 1.0)])
            for t in node.terms:
                walk(ast.TermQuery(t))
        elif isinstance(node, ast.MultiPhraseQuery):
            all_terms = tuple(t for slot in node.slots for t in slot)
            out.setdefault(("mp", node.slots, boost), phrase_scorer(all_terms, boost))
            for t in all_terms:
                walk(ast.TermQuery(t))
        elif isinstance(node, ast.BoostQuery):
            walk(node.query, boost * node.boost)
        elif isinstance(node, ast.ConstantScoreQuery):
            # child needs no scorer of its own, but phrase leaves still
            # need member-term scorers for block-max bounds
            walk(node.query, 1.0)
        elif isinstance(node, ast.BooleanQuery):
            # must_not/filter are NON-scoring clauses: the kernels (and
            # the reference's BooleanWeight) evaluate them with boost 1
            # regardless of the path boost (BooleanWeight.java scorerSupplier
            # passes ScoreMode.COMPLETE_NO_SCORES for prohibited/filter)
            for c in node.must + node.should:
                walk(c, boost)
            for c in node.must_not + node.filter:
                walk(c, 1.0)

    walk(q)
    return out
