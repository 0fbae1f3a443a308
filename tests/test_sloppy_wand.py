"""Pruned-path differentials for sloppy phrases and multi-phrases
(round-4 _SloppyLeaf / _MultiPhraseLeaf adapters).

The reference leaves these shapes UNPRUNED (SloppyPhraseMatcher feeds
dummy impacts, ``SloppyPhraseMatcher.java:119-127``); this engine
prunes them with concavity-derived upper bounds (sloppyFreq <= sum of
member tfs; BM25 concave in freq -> score <= sum of member block-max
phrase scores). Pruning must be invisible: pruned == exhaustive ==
oracle bit-identically, including at threshold=1 (pruning forced from
the first hit), with STRICTLY FEWER decoded blocks on dense shapes."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import ast
from lucene_spark.search import kernels
from lucene_spark.search import segment as seg_mod
from lucene_spark.search.local import LocalIndex
from lucene_spark.search.scoring import build_scorers

N_DOCS = 600
NUM_SEGMENTS = 4


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(corpus, num_segments=NUM_SEGMENTS, analyzer=ENGLISH)


@pytest.fixture(scope="module")
def engine(corpus):
    return LocalIndex.build(corpus, num_segments=NUM_SEGMENTS, analyzer=ENGLISH)


def T(t):
    return ast.TermQuery(t)


def SP(terms, slop, positions=None):
    return ast.PhraseQuery(
        terms=tuple(terms),
        positions=tuple(positions if positions is not None else range(len(terms))),
        slop=slop,
    )


def MP(slots, slop=0, positions=None):
    return ast.MultiPhraseQuery(
        slots=tuple(tuple(s) for s in slots),
        positions=tuple(positions if positions is not None else range(len(slots))),
        slop=slop,
    )


def _shapes():
    return [
        # dense sloppy pair (w0000/w0001 are the Zipf head)
        SP(["w0000", "w0001"], slop=2),
        # reversed order needs slop 2 (transposition)
        SP(["w0001", "w0000"], slop=2),
        # stopword-hole positions + slop
        SP(["w0000", "w0002"], slop=1, positions=(0, 2)),
        # repeated-term sloppy phrase (repeat-group machinery)
        SP(["w0000", "w0000"], slop=3),
        SP(["w0000", "w0001", "w0000"], slop=2),
        # three-term sloppy
        SP(["w0000", "w0001", "w0002"], slop=4),
        # exact multi-phrase: one slot with alternatives
        MP([("w0000", "w0001"), ("w0002",)], slop=0),
        MP([("w0000",), ("w0001", "w0002")], slop=0),
        # sloppy multi-phrase (no repeats across slots)
        MP([("w0000", "w0003"), ("w0001",)], slop=2),
        MP([("w0000",), ("w0001", "w0004"), ("w0002",)], slop=3),
        # sloppy multi-phrase WITH repeats across slots
        # (hasMultiTermRpts: bipartite repeat groups + dynamic init)
        MP([("w0000", "w0001"), ("w0001",)], slop=2),
        MP([("w0000", "w0001"), ("w0001", "w0002")], slop=2),
        MP([("w0000",), ("w0000", "w0002")], slop=3),
        # boolean trees with sloppy/multi-phrase CLAUSES: the clause
        # must become a _SloppyLeaf/_MultiPhraseLeaf inside _BoolLeaf
        ast.BooleanQuery(
            should=(T("w0042"), SP(["w0000", "w0001"], slop=2)),
            min_should_match=1,
        ),
        ast.BooleanQuery(
            must=(T("w0002"), SP(["w0000", "w0001"], slop=3)),
        ),
        ast.BooleanQuery(
            should=(T("w0042"), MP([("w0000", "w0003"), ("w0001",)], slop=1)),
            min_should_match=1,
        ),
    ]


def test_sloppy_leaf_path_actually_taken(engine):
    """Every shape must build leaves (no exhaustive fallback)."""
    seg = engine.segments[0]
    for q in _shapes():
        qq = ast.rewrite(q)
        terms = ast.query_terms(qq)
        scorers = build_scorers(qq, engine.global_stats(terms), dtype="f32")
        if isinstance(qq, ast.BooleanQuery):
            heap = kernels._wand_topk(seg, qq, scorers, 10, 1000, "f32")
            assert heap is not None, f"fell back to exhaustive: {q}"
        else:
            leaf = kernels._make_leaf(seg, qq, scorers, "f32")
            assert leaf is not None, f"no leaf adapter: {q}"


@pytest.mark.parametrize("k", [3, 10])
def test_sloppy_wand_matches_oracle(engine, oracle, k):
    for q in _shapes():
        expected = oracle.top_k(q, k=k)
        got = engine.search(q, k=k, pruned=True)
        assert len(got) == len(expected), (q, got, expected)
        for (gd, gs, gu), (ed, es, eu) in zip(got, expected):
            assert gd == ed and gu == eu, (q, got, expected)
            assert np.float32(gs) == np.float32(es), (q, gs, es)


def test_sloppy_wand_pruned_equals_exhaustive_threshold1(engine):
    for q in _shapes():
        a = engine.search(q, k=10, pruned=True, total_hits_threshold=1)
        b = engine.search(q, k=10, pruned=False)
        assert a == b, q


def test_sloppy_wand_f64_mirror(engine):
    for q in _shapes():
        a = engine.search(q, k=10, pruned=True, dtype="f64")
        b = engine.search(q, k=10, pruned=False, dtype="f64")
        assert a == b, q


def test_multi_term_rpts_pruned_equals_exhaustive(engine, oracle):
    """Sloppy multi-phrase with a term shared across slots
    (hasMultiTermRpts, previously rejected) must agree across
    pruned / exhaustive / oracle and actually produce hits on this
    corpus (the shapes are not vacuous)."""
    shapes = [
        MP([("w0000", "w0001"), ("w0000",)], slop=2),
        MP([("w0000", "w0001"), ("w0001",)], slop=1),
        MP([("w0001", "w0000"), ("w0000", "w0002")], slop=2),
    ]
    for q in shapes:
        a = engine.search(q, k=10, pruned=True)
        b = engine.search(q, k=10, pruned=False)
        assert a == b, q
        assert len(a) > 0, q
        expected = oracle.top_k(q, k=10)
        assert [(d, u) for d, _, u in a] == [(d, u) for d, _, u in expected]
        for (gd, gs, gu), (ed, es, eu) in zip(a, expected):
            assert np.float32(gs) == np.float32(es), (q, gs, es)


def test_sloppy_wand_decodes_fewer_blocks():
    """With pruning forced (threshold=1), the sloppy/multi-phrase leaf
    must decode strictly fewer blocks than the exhaustive path on a
    corpus where the members span many blocks — bit-identically.
    20000 docs: w0000 covers ~78 blocks while the rare lead w4400 has
    ~58 docs — the leaf's window enumeration (lead = rarest member)
    visits only the rare member's windows, so the dense member's
    blocks outside them are never decoded (the exhaustive path decodes
    every block of every member via decode_all)."""
    engine = LocalIndex.build(make_pages(20000), num_segments=1, analyzer=ENGLISH)
    shapes = [
        SP(["w4400", "w0000"], slop=2),
        MP([("w4400", "w4401"), ("w0000",)], slop=1),
        MP([("w4400", "w4401"), ("w0000",)], slop=0),
    ]

    def _clear_caches():
        for seg in engine.segments:
            for tb in seg.terms.values():
                tb._cache.clear()

    for q in shapes:
        _clear_caches()
        seg_mod.reset_decode_count()
        a = engine.search(q, k=3, pruned=True, total_hits_threshold=1)
        pruned_blocks = seg_mod.decode_count()
        _clear_caches()
        seg_mod.reset_decode_count()
        b = engine.search(q, k=3, pruned=False)
        exhaustive_blocks = seg_mod.decode_count()
        assert a == b, q
        assert pruned_blocks < exhaustive_blocks, (
            q, pruned_blocks, exhaustive_blocks,
        )
