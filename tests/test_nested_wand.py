"""Nested-boolean WAND differentials (the round-3 pruning extension):
boolean trees with boolean CLAUSES — ``a OR (b AND c)``,
``a AND (b OR c)``, inner msm, inner must_not, double nesting, nested
filters — must take the pruned window kernel via the _BoolLeaf adapter
(the reference nests WANDScorer/BooleanScorer inside trees,
``search/WANDScorer.java:30-55``) and stay bit-identical to the
exhaustive kernel and the Python oracle, including at threshold=1
(pruning forced from the first hit) and with STRICTLY FEWER decoded
blocks on at least one shape (the pruned path is actually taken)."""

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


def _nested_shapes():
    """Trees with boolean CLAUSES that survive ast.rewrite un-flattened
    (an OR inside should flattens; an AND inside should does not)."""
    return [
        # a OR (b AND c) — disjunction with a conjunctive clause
        ast.BooleanQuery(
            should=(
                T("w0042"),
                ast.BooleanQuery(must=(T("w0000"), T("w0002"))),
            ),
            min_should_match=1,
        ),
        # a AND (b OR c) — conjunction with a disjunctive clause
        ast.BooleanQuery(
            must=(
                T("w0001"),
                ast.BooleanQuery(
                    should=(T("w0042"), T("w0100")), min_should_match=1
                ),
            ),
        ),
        # boosted nested clause: (a OR (b AND c))^2-class query
        ast.BoostQuery(
            ast.BooleanQuery(
                should=(
                    T("w0042"),
                    ast.BooleanQuery(must=(T("w0000"), T("w0002"))),
                ),
                min_should_match=1,
            ),
            2.0,
        ),
        # boost on the INNER clause
        ast.BooleanQuery(
            should=(
                T("w0042"),
                ast.BoostQuery(
                    ast.BooleanQuery(must=(T("w0000"), T("w0002"))), 2.5
                ),
            ),
            min_should_match=1,
        ),
        # inner msm: a AND (2-of b,c,d)
        ast.BooleanQuery(
            must=(
                T("w0000"),
                ast.BooleanQuery(
                    should=(T("w0001"), T("w0002"), T("w0005")),
                    min_should_match=2,
                ),
            ),
        ),
        # inner must_not: a OR (b NOT c)
        ast.BooleanQuery(
            should=(
                T("w0100"),
                ast.BooleanQuery(must=(T("w0001"),), must_not=(T("w0000"),)),
            ),
            min_should_match=1,
        ),
        # double nesting: a OR (b AND (c OR d))
        ast.BooleanQuery(
            should=(
                T("w0200"),
                ast.BooleanQuery(
                    must=(
                        T("w0001"),
                        ast.BooleanQuery(
                            should=(T("w0042"), T("w0100")),
                            min_should_match=1,
                        ),
                    ),
                ),
            ),
            min_should_match=1,
        ),
        # nested boolean as a FILTER (membership only, no score)
        ast.BooleanQuery(
            must=(T("w0000"),),
            filter=(
                ast.BooleanQuery(
                    should=(T("w0001"), T("w0002")), min_should_match=1
                ),
            ),
        ),
        # nested boolean under must_not (exclusion by a tree)
        ast.BooleanQuery(
            must=(T("w0000"),),
            must_not=(
                ast.BooleanQuery(must=(T("w0001"), T("w0002"))),
            ),
        ),
        # phrase inside the nested clause
        ast.BooleanQuery(
            should=(
                T("w0100"),
                ast.BooleanQuery(
                    must=(
                        ast.PhraseQuery(terms=("w0007", "w0042"), positions=(0, 1)),
                    ),
                    should=(T("w0000"),),
                ),
            ),
            min_should_match=1,
        ),
        # absent term inside the nested clause (per-segment _EMPTY_LEAF)
        ast.BooleanQuery(
            should=(
                T("w0042"),
                ast.BooleanQuery(must=(T("w0000"), T("zzzz_absent"))),
            ),
            min_should_match=1,
        ),
    ]


def test_nested_wand_path_actually_taken(engine):
    """Every nested shape must build leaves (no exhaustive fallback)."""
    seg = engine.segments[0]
    for q in _nested_shapes():
        qq = ast.rewrite(q)
        boost = 1.0
        while isinstance(qq, ast.BoostQuery):
            boost *= qq.boost
            qq = qq.query
        if not isinstance(qq, ast.BooleanQuery):
            continue
        terms = ast.query_terms(qq)
        scorers = build_scorers(ast.rewrite(q), engine.global_stats(terms), dtype="f32")
        heap = kernels._wand_topk(seg, qq, scorers, 10, 1000, "f32", boost=boost)
        assert heap is not None, f"nested shape fell back to exhaustive: {q}"


@pytest.mark.parametrize("k", [3, 10])
def test_nested_wand_matches_oracle(engine, oracle, k):
    for q in _nested_shapes():
        expected = oracle.top_k(q, k=k)
        got = engine.search(q, k=k, pruned=True)
        assert len(got) == len(expected), (q, got, expected)
        for (gd, gs, gu), (ed, es, eu) in zip(got, expected):
            assert gd == ed and gu == eu, (q, got, expected)
            assert np.float32(gs) == np.float32(es), (q, gs, es)


def test_nested_wand_pruned_equals_exhaustive_threshold1(engine):
    for q in _nested_shapes():
        a = engine.search(q, k=10, pruned=True, total_hits_threshold=1)
        b = engine.search(q, k=10, pruned=False)
        assert a == b, q


def test_nested_wand_f64_mirror(engine):
    for q in _nested_shapes():
        a = engine.search(q, k=10, pruned=True, dtype="f64")
        b = engine.search(q, k=10, pruned=False, dtype="f64")
        assert a == b, q


def test_wand_decodes_fewer_blocks():
    """With pruning forced (threshold=1) the window kernel must decode
    strictly fewer blocks than the exhaustive path, bit-identically:
    (a) conjunction-driven probe - a rare MUST plus a nested frequent
        OR decodes only follower blocks containing candidates
        (ConjunctionDISI leapfrog);
    (b) pure OR - the MAXSCORE essential/non-essential split probes the
        low-bound frequent terms at candidates from the rare term
        (MaxScoreBulkScorer.java:28-51).
    Needs multi-block postings: one segment over 20000 docs so frequent
    terms span ~78 blocks while the rare lead has ~58 docs."""
    engine = LocalIndex.build(make_pages(20000), num_segments=1, analyzer=ENGLISH)

    shapes = [
        ast.BooleanQuery(
            must=(
                T("w4400"),
                ast.BooleanQuery(
                    should=(T("w0000"), T("w0001")), min_should_match=1
                ),
            ),
        ),
        ast.BooleanQuery(
            should=(T("w4400"), T("w0000"), T("w0001")), min_should_match=1
        ),
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
            q,
            pruned_blocks,
            exhaustive_blocks,
        )


def test_parser_nested_round_trip():
    """The classic-parser parenthesis syntax produces the nested trees
    the _BoolLeaf adapter prunes (QueryParser.jj Clause production)."""
    from lucene_spark.search.parser import parse
    from lucene_spark.analysis.analyzer import Analyzer

    an = Analyzer()
    q = parse("alpha OR (beta AND gamma)", an)
    assert isinstance(q, ast.BooleanQuery)
    assert q.min_should_match == 1
    assert q.should[0] == T("alpha")
    inner = q.should[1]
    assert isinstance(inner, ast.BooleanQuery)
    assert inner.must == (T("beta"), T("gamma"))

    q2 = parse("(alpha OR (beta AND gamma))^2", an)
    assert isinstance(q2, ast.BoostQuery) and q2.boost == 2.0
    assert q2.query == q

    q3 = parse("alpha AND (beta OR gamma)", an)
    assert isinstance(q3, ast.BooleanQuery)
    assert q3.must[0] == T("alpha")
    inner3 = q3.must[1]
    assert isinstance(inner3, ast.BooleanQuery)
    assert inner3.should == (T("beta"), T("gamma"))


def test_parsed_nested_matches_oracle(engine, oracle):
    """String-syntax nested trees end-to-end: parse -> pruned kernel ->
    bit-identical to the brute-force oracle."""
    from lucene_spark.search.parser import parse

    for s in [
        "w0042 OR (w0000 AND w0002)",
        "w0001 AND (w0042 OR w0100)",
        "(w0042 OR (w0000 AND w0002))^2",
    ]:
        q = parse(s, ENGLISH)
        expected = oracle.top_k(q, k=10)
        got = engine.search(s, k=10, pruned=True)
        assert [(d, u) for d, _, u in got] == [(d, u) for d, _, u in expected], s
        for (gd, gs, gu), (ed, es, eu) in zip(got, expected):
            assert np.float32(gs) == np.float32(es), (s, gs, es)
