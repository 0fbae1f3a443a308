"""MoreLikeThis (queries/mlt/MoreLikeThis.java): interesting-term
selection + the boolean SHOULD rewrite."""

import math

import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search import ast
from lucene_spark.search.searcher import Searcher

N_DOCS = 250
SEGS = 3


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS)


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, spark, corpus):
    d = str(tmp_path_factory.mktemp("mlt_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=SEGS, analyzer=ENGLISH))
    return Searcher(spark, d)


def _py_selection(corpus, text, max_terms=25, min_tf=2, min_df=5):
    """Independent recompute of retrieveTerms over the raw corpus."""
    dfm: dict = {}
    for r in corpus:
        toks, _ = ENGLISH.tokenize_one(r["text"])
        for t in set(toks):
            dfm[t] = dfm.get(t, 0) + 1
    n = len(corpus)
    toks, _ = ENGLISH.tokenize_one(text)
    tf: dict = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    sel = [
        (t, float(f) * (math.log((n + 1) / (dfm.get(t, 0) + 1.0)) + 1.0))
        for t, f in tf.items()
        if f >= min_tf and dfm.get(t, 0) >= min_df
    ]
    sel.sort(key=lambda x: (-x[1], x[0]))
    return sel[:max_terms]


def test_selection_matches_python(searcher, corpus):
    text = corpus[7]["text"]
    got = searcher.more_like_this_terms(text)
    want = _py_selection(corpus, text)
    assert got == want
    assert got, "fixture doc must yield interesting terms"


def test_selection_floors(searcher, corpus):
    text = corpus[7]["text"]
    # raising the floors can only shrink the UNCAPPED selection
    # (with the top-25 cap, looser floors can crowd out tight terms)
    loose = dict(searcher.more_like_this_terms(
        text, max_query_terms=10_000, min_term_freq=1, min_doc_freq=1))
    tight = dict(searcher.more_like_this_terms(
        text, max_query_terms=10_000, min_term_freq=3, min_doc_freq=10))
    assert set(tight) <= set(loose)
    assert len(tight) < len(loose)


def test_mlt_query_equals_manual_boolean(searcher, corpus):
    """more_like_this == search over the explicit SHOULD tree built
    from the same selection (clause order preserved)."""
    text = corpus[7]["text"]
    sel = searcher.more_like_this_terms(text)
    q = ast.BooleanQuery(
        should=tuple(ast.TermQuery(t) for t, _ in sel), min_should_match=1
    )
    want = searcher.search(q, k=10, dtype="f64").collect()
    got = searcher.more_like_this(text, k=10, dtype="f64").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    # the source doc itself ranks (its own terms dominate)
    assert corpus[7]["url"] in {r["url"] for r in got}


def test_mlt_boost_mode(searcher, corpus):
    text = corpus[7]["text"]
    sel = searcher.more_like_this_terms(text)
    best = sel[0][1]
    q = ast.BooleanQuery(
        should=tuple(
            ast.BoostQuery(ast.TermQuery(t), s / best) for t, s in sel
        ),
        min_should_match=1,
    )
    want = searcher.search(q, k=10, dtype="f64").collect()
    got = searcher.more_like_this(text, k=10, boost=True, dtype="f64").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_mlt_empty_selection(searcher):
    # text with no term passing the floors -> empty result, not error
    out = searcher.more_like_this("zzzzz qqqqq", k=10).collect()
    assert out == []
