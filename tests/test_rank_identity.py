"""The rank-identity gate (FIXTURES.md §5): engine kernels vs the
pure-Python oracle on the full fixture query set — score- AND
rank-identical (float32 bit-exact), pruned == exhaustive (the
TestWANDScorer/TestBoolean2-style differential), across multiple
segment counts."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages, make_queries
from lucene_spark.oracle import OracleIndex
from lucene_spark.search.local import LocalIndex
from lucene_spark.search.parser import parse

N_DOCS = 800
NUM_SEGMENTS = 5


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(corpus, num_segments=NUM_SEGMENTS, analyzer=ENGLISH)


@pytest.fixture(scope="module")
def engine(corpus):
    return LocalIndex.build(corpus, num_segments=NUM_SEGMENTS, analyzer=ENGLISH)


@pytest.fixture(scope="module")
def queries():
    return make_queries()


def test_stats_agree(oracle, engine):
    assert engine.doc_count == oracle.doc_count == N_DOCS
    assert engine.sum_total_tf == oracle.sum_total_tf
    for t in ("w0000", "w0007", "w0042", "w3000"):
        st = engine.global_stats({t})
        assert st.df(t) == oracle.doc_freq(t)


def test_rank_and_score_identical_to_oracle(oracle, engine, queries):
    """Every fixture query: engine (pruned) == oracle, bit-exact f32."""
    checked = 0
    for q in queries:
        expected = oracle.top_k(parse(q["query"], ENGLISH), k=q["k"])
        got = engine.search(q["query"], k=q["k"], pruned=True)
        assert len(got) == len(expected), (q, got, expected)
        for (gd, gs, gu), (ed, es, eu) in zip(got, expected):
            assert gd == ed, (q["query"], got, expected)
            assert gu == eu
            assert np.float32(gs) == np.float32(es), (q["query"], gs, es)
        checked += 1
    assert checked == len(queries)


def test_pruned_equals_exhaustive(engine, queries):
    for q in queries:
        a = engine.search(q["query"], k=q["k"], pruned=True)
        b = engine.search(q["query"], k=q["k"], pruned=False)
        assert a == b, q["query"]


def test_pruning_engages_and_stays_exact(engine, queries):
    """Force pruning from the first hit (threshold=1) — results must STILL
    be identical (rank-safety of the block-max bounds)."""
    for q in queries[:40]:
        a = engine.search(q["query"], k=q["k"], pruned=True, total_hits_threshold=1)
        b = engine.search(q["query"], k=q["k"], pruned=False)
        assert a == b, q["query"]


def test_count_matches_oracle(oracle, engine):
    for qs in ("w0000", "w0042 AND w0000", "w0042 OR w0999", '"w0007 w0042"'):
        docs, _ = oracle.score_query(parse(qs, ENGLISH))
        assert engine.count(qs) == docs.size


def test_segment_count_invariance(corpus, queries):
    """Global stats make scores comparable across segment layouts: the
    top-k (url, score) sets must not depend on the number of segments."""
    e1 = LocalIndex.build(corpus, num_segments=1, analyzer=ENGLISH)
    e8 = LocalIndex.build(corpus, num_segments=8, analyzer=ENGLISH)
    for q in queries[:25]:
        a = [(u, np.float32(s)) for _, s, u in e1.search(q["query"], k=q["k"])]
        b = [(u, np.float32(s)) for _, s, u in e8.search(q["query"], k=q["k"])]
        # doc_id (and hence tie-break among EQUAL scores) depends on the
        # segment layout — same as Lucene, where ties depend on index
        # order. Scores must match positionally; url sets must match for
        # every fully-included score group (the kth-score group may be
        # truncated differently).
        assert [s for _, s in a] == [s for _, s in b], q["query"]
        if a:
            last = a[-1][1]
            assert {u for u, s in a if s != last} == {u for u, s in b if s != last}, q["query"]
