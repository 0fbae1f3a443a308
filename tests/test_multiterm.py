"""Distributed MultiTermQuery rewrite (round-2): the term predicate is
applied directly to the postings scan (no driver term collect), with
TopTermsRewrite-style expansion caps and WildcardQuery translation —
``search/MultiTermQuery.java`` / ``TopTermsRewrite.java:38-66`` /
``WildcardQuery.java:30-63``."""

import os

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search.searcher import Searcher

N_DOCS = 400


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS)


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory, corpus):
    d = str(tmp_path_factory.mktemp("mtq_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=3, analyzer=ENGLISH))
    return Searcher(spark, d)


def _brute_docs(corpus, pred):
    out = set()
    for r in corpus:
        toks, _ = ENGLISH.tokenize_one(r["text"])
        if any(pred(t) for t in toks):
            out.add(r["url"])
    return out


def test_wildcard_matches_brute_force(searcher, corpus):
    import re

    got = {r["url"] for r in searcher.multi_term_docs("wildcard", "w00?2").collect()}
    rx = re.compile(r"^w00.2$")
    assert got == _brute_docs(corpus, lambda t: rx.match(t) is not None)
    got2 = {r["url"] for r in searcher.multi_term_docs("wildcard", "w0*7").collect()}
    rx2 = re.compile(r"^w0.*7$")
    assert got2 == _brute_docs(corpus, lambda t: rx2.match(t) is not None)


def test_wide_prefix_no_driver_collect(searcher, corpus):
    """Single-letter prefix — runs entirely through the postings-scan
    predicate; result equals brute force."""
    got = {r["url"] for r in searcher.multi_term_docs("prefix", "w").collect()}
    assert got == _brute_docs(corpus, lambda t: t.startswith("w"))


def test_prefix_pushdown_in_plan(searcher):
    """The sargable prefix predicate must reach the parquet scan
    (PushedFilters shows StringStartsWith on term)."""
    df = searcher.multi_term_docs("prefix", "w00")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "StringStartsWith(term,w00)" in plan, plan[:2000]


def test_expansion_cap_top_df(searcher, corpus):
    """max_expansions keeps the highest-docFreq terms (TopTermsRewrite
    priority queue order)."""
    all_terms = searcher.expand_terms("prefix", "w0")
    capped = searcher.expand_terms("prefix", "w0", max_expansions=5)
    assert len(capped) == 5 and set(capped) <= set(all_terms)
    # the capped set must be the 5 highest-df terms
    td = {r["term"]: r["doc_freq"] for r in searcher.term_dictionary().collect()}
    expected = sorted(
        (t for t in all_terms), key=lambda t: (-td[t], t)
    )[:5]
    assert sorted(capped) == sorted(expected)


def test_multi_term_topk_scored(searcher):
    """Scored rewrite: equals searching the expanded boolean directly."""
    from lucene_spark.search import ast

    terms = searcher.expand_terms("prefix", "w000", max_expansions=1024)
    q = ast.BooleanQuery(
        should=tuple(ast.TermQuery(t) for t in terms), min_should_match=1
    )
    a = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.multi_term_topk("prefix", "w000", k=10).collect()
    ]
    b = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.search(q, k=10).collect()
    ]
    assert a == b and len(a) == 10
