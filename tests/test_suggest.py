"""Prefix suggest over the term dictionary (suggest-module
dictionary role: weight = docFreq, ties (doc_freq desc, term asc))."""

import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search.searcher import Searcher

N_DOCS = 200
SEGS = 3


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS)


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, spark, corpus):
    d = str(tmp_path_factory.mktemp("sug_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=SEGS, analyzer=ENGLISH))
    return Searcher(spark, d)


def _py_suggest(corpus, prefix, k=10):
    dfm: dict = {}
    for r in corpus:
        toks, _ = ENGLISH.tokenize_one(r["text"])
        for t in set(toks):
            if t.startswith(prefix):
                dfm[t] = dfm.get(t, 0) + 1
    rows = sorted(dfm.items(), key=lambda x: (-x[1], x[0]))
    return rows[:k]


def test_suggest_matches_python(searcher, corpus):
    for prefix in ("w00", "w004", "q"):
        got = [
            (r["term"], r["doc_freq"])
            for r in searcher.suggest(prefix, k=10).collect()
        ]
        assert got == _py_suggest(corpus, prefix)


def test_suggest_normalizes_prefix(searcher, corpus):
    got = [(r["term"], r["doc_freq"]) for r in searcher.suggest("W00", k=5).collect()]
    assert got == _py_suggest(corpus, "w00", 5)


def test_suggest_no_match(searcher):
    assert searcher.suggest("zzzzzz", k=5).collect() == []


def test_suggest_plan_pushes_range(searcher):
    plan = searcher.suggest("w00", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(term,w00" in plan
