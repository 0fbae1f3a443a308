"""Extended query operators (MultiPhrase / Boost / ConstantScore /
synonym / dismax / multi-term expansion) — engine vs the pure-Python
float32 oracle, plus local-kernel differentials."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import ast
from lucene_spark.search.searcher import Searcher

N_DOCS = 250
SEGS = 3


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS)


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, spark, corpus):
    d = str(tmp_path_factory.mktemp("qops_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=SEGS, analyzer=ENGLISH))
    return Searcher(spark, d)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(corpus, num_segments=SEGS, analyzer=ENGLISH)


def _check(searcher, oracle, q, k=10):
    expected = oracle.top_k(q, k=k)
    got = searcher.search(q, k=k).collect()
    assert len(got) == len(expected), q
    for row, (ed, es, eu) in zip(got, expected):
        assert row["doc_id"] == ed, (q, got, expected)
        assert row["url"] == eu
        assert np.float32(row["score"]) == np.float32(es), q


QUERIES = [
    ast.MultiPhraseQuery(slots=(("w0007", "w0000"), ("w0042", "w0001")),
                         positions=(0, 1)),
    ast.MultiPhraseQuery(slots=(("w0100",), ("w0200", "w0000")),
                         positions=(0, 2)),
    ast.BoostQuery(ast.TermQuery("w0042"), 2.5),
    ast.BooleanQuery(
        should=(
            ast.BoostQuery(ast.TermQuery("w0042"), 2.5),
            ast.BoostQuery(ast.TermQuery("w0007"), 0.5),
        ),
        min_should_match=1,
    ),
    ast.BoostQuery(
        ast.BooleanQuery(
            must=(ast.TermQuery("w0000"), ast.TermQuery("w0001"))
        ),
        1.5,
    ),
    ast.ConstantScoreQuery(ast.TermQuery("w0042"), 3.0),
    ast.ConstantScoreQuery(
        ast.BooleanQuery(
            must=(ast.TermQuery("w0000"),),
            must_not=(ast.TermQuery("w0042"),),
        )
    ),
    ast.BoostQuery(
        ast.PhraseQuery(terms=("w0007", "w0042"), positions=(0, 1)), 2.0
    ),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)), ids=lambda i: f"q{i}")
def test_extended_ops_vs_oracle(searcher, oracle, qi):
    _check(searcher, oracle, QUERIES[qi])


def test_boost_identity_rewrite():
    q = ast.rewrite(ast.BoostQuery(ast.TermQuery("x"), 1.0))
    assert q == ast.TermQuery("x")
    q = ast.rewrite(ast.BoostQuery(ast.MatchNoDocsQuery(), 2.0))
    assert q == ast.MatchNoDocsQuery()


def test_multi_phrase_match_counts(searcher, oracle):
    q = ast.MultiPhraseQuery(slots=(("w0007", "w0100"), ("w0042", "w0000")),
                             positions=(0, 1))
    rows = searcher.phrase_freqs_df(q).collect()
    docs, _ = oracle.score_query(q)
    assert sorted(r["doc_id"] for r in rows) == sorted(int(d) for d in docs)


def test_expand_and_synonym_surfaces(searcher, oracle):
    terms = searcher.expand_terms("prefix", "w00")
    assert terms and all(t.startswith("w00") for t in terms)
    rows = searcher.synonym_scores_df(["w0000", "w0001"]).collect()
    # synonym must match the union of both terms' postings
    d0, _ = oracle.score_query(ast.TermQuery("w0000"))
    d1, _ = oracle.score_query(ast.TermQuery("w0001"))
    assert sorted(r["doc_id"] for r in rows) == sorted(
        int(x) for x in np.union1d(d0, d1)
    )
