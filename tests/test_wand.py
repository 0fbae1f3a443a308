"""General-WAND differentials (the round-2 pruning extension): mixed
MUST+SHOULD, minShouldMatch>1, boosted clauses, filters, exclusions and
phrase-in-boolean shapes must take the pruned window kernel and stay
bit-identical to both the exhaustive kernel and the Python oracle —
the TestWANDScorer / TestBooleanMinShouldMatch differential, plus a
threshold=1 run (pruning forced from the first hit)."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import ast
from lucene_spark.search import kernels
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


def _shapes():
    """Boolean shapes that previously fell back to decode-everything."""
    return [
        # MUST + SHOULD (ReqOptSumScorer shape)
        ast.BooleanQuery(must=(T("w0000"),), should=(T("w0042"), T("w0007"))),
        # scored OR with minShouldMatch > 1 (WANDScorer minShouldMatch)
        ast.BooleanQuery(
            should=(T("w0000"), T("w0001"), T("w0002"), T("w0005")),
            min_should_match=2,
        ),
        ast.BooleanQuery(
            should=(T("w0020"), T("w0045"), T("w0080")), min_should_match=3
        ),
        # boosted clauses in a scored OR (WANDScorer with boosts)
        ast.BooleanQuery(
            should=(ast.BoostQuery(T("w0000"), 2.5), ast.BoostQuery(T("w0042"), 0.5)),
            min_should_match=1,
        ),
        # MUST + SHOULD + NOT + msm, mixed boosts
        ast.BooleanQuery(
            must=(ast.BoostQuery(T("w0001"), 1.5),),
            should=(T("w0042"), T("w0100"), T("w0200")),
            must_not=(T("w4500"),),
            min_should_match=1,
        ),
        # FILTER clause (scores must ignore it; membership must not)
        ast.BooleanQuery(
            must=(T("w0000"),),
            filter=(T("w0002"),),
            should=(T("w0042"),),
        ),
        # phrase as a boolean clause (two-phase inside the window kernel)
        ast.BooleanQuery(
            must=(ast.PhraseQuery(terms=("w0007", "w0042"), positions=(0, 1)),),
            should=(T("w0100"),),
        ),
        # constant-score clause mixed with scored clauses
        ast.BooleanQuery(
            should=(
                ast.ConstantScoreQuery(T("w0000"), boost=2.0),
                T("w0042"),
            ),
            min_should_match=1,
        ),
        # boosted boolean root
        ast.BoostQuery(
            ast.BooleanQuery(
                must=(T("w0000"),), should=(T("w0042"),), must_not=(T("w0999"),)
            ),
            2.0,
        ),
        # boosted term root (single-leaf WAND path)
        ast.BoostQuery(T("w0042"), 3.0),
        # constant-score root over a term
        ast.ConstantScoreQuery(T("w0000"), boost=4.0),
    ]


def test_wand_path_actually_taken(engine):
    """The pruned path must be the WAND kernel (not the exhaustive
    fallback) for the mixed shapes: _wand_topk returns a heap."""
    seg = engine.segments[0]
    for q in _shapes():
        qq = ast.rewrite(q)
        if not isinstance(qq, ast.BooleanQuery):
            continue
        terms = ast.query_terms(qq)
        scorers = build_scorers(qq, engine.global_stats(terms), dtype="f32")
        heap = kernels._wand_topk(seg, qq, scorers, 10, 1000, "f32")
        assert heap is not None, f"shape fell back to exhaustive: {q}"


@pytest.mark.parametrize("k", [3, 10])
def test_wand_matches_oracle(engine, oracle, k):
    for q in _shapes():
        expected = oracle.top_k(q, k=k)
        got = engine.search(q, k=k, pruned=True)
        assert len(got) == len(expected), (q, got, expected)
        for (gd, gs, gu), (ed, es, eu) in zip(got, expected):
            assert gd == ed and gu == eu, (q, got, expected)
            assert np.float32(gs) == np.float32(es), (q, gs, es)


def test_wand_pruned_equals_exhaustive_threshold1(engine):
    """Force pruning from the first hit: results must be identical
    (rank-safety of the window bounds for every clause type)."""
    for q in _shapes():
        a = engine.search(q, k=10, pruned=True, total_hits_threshold=1)
        b = engine.search(q, k=10, pruned=False)
        assert a == b, q


def test_wand_f64_mirror(engine, oracle):
    """The f64 scorer path through the WAND kernel matches exhaustive
    f64 (driver-gate dtype)."""
    for q in _shapes():
        a = engine.search(q, k=10, pruned=True, dtype="f64")
        b = engine.search(q, k=10, pruned=False, dtype="f64")
        assert a == b, q
