"""Regression tests for the round-2 ADVICE findings:

1. FieldExistsQuery through the generic Spark ``Searcher.search`` /
   ``count`` / ``match_docs`` (term-less queries must still visit every
   live segment — previously the term-pruned scan produced zero groups
   and the kernels never ran, returning 0 rows while LocalIndex /
   field_exists_docs returned the right answer);
2. ``build_scorers`` on a term of a field whose per-field doc_count is
   0 (all values empty) must score as no-match instead of raising
   ZeroDivisionError;
3. fielded clauses in the string query syntax are analyzed with the
   FIELD's analyzer (``parse('title:the', ...)`` must survive when the
   title field was indexed stop-free), and the per-field analyzer
   config is persisted in the commit so Searcher / LocalSearcher
   reconstruct it.
"""

import os

import pytest

from lucene_spark.analysis.analyzer import ENGLISH, Analyzer
from lucene_spark.fixtures import make_pages
from lucene_spark.search import ast
from lucene_spark.search.local import LocalIndex
from lucene_spark.search.parser import parse

N_DOCS = 200
FIELDS = (("", "text"), ("title", "title"))


def _with_title(rows):
    out = []
    for r in rows:
        r = dict(r)
        r["title"] = " ".join((r["text"] or "").split(" ")[:8])
        out.append(r)
    return out


@pytest.fixture(scope="module")
def spark_index(spark, tmp_path_factory):
    """Two-field Spark index with a stop-free title analyzer."""
    import pyspark.sql.functions as F

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.searcher import Searcher

    index_dir = str(tmp_path_factory.mktemp("advice_r2") / "idx")
    rows = _with_title(make_pages(N_DOCS))
    df = spark.createDataFrame(
        [(r["url"], r["text"], r["title"]) for r in rows],
        "url string, text string, title string",
    )
    cfg = IndexConfig(
        num_segments=3,
        analyzer=ENGLISH,
        fields=FIELDS,
        field_analyzers=(("title", Analyzer()),),
    )
    build_index(spark, df, index_dir, cfg)
    return Searcher(spark, index_dir), rows, index_dir


def test_field_exists_through_spark_search(spark_index):
    s, rows, _ = spark_index
    q = ast.FieldExistsQuery("title")
    want = sum(1 for r in rows if ENGLISH.tokenize_one(r["title"])[0])
    assert want > 0
    # the dedicated surface and the generic search/count/match must agree
    assert s.field_exists_docs("title").count() == want
    assert s.count(q) == want
    assert s.match_docs(q).count() == want
    hits = s.search(q, k=5, pruned=True, dtype="f32").collect()
    assert len(hits) == 5
    assert all(abs(h["score"] - 1.0) < 1e-9 for h in hits)
    # tie-break on constant scores: ascending doc_id
    assert [h["doc_id"] for h in hits] == sorted(h["doc_id"] for h in hits)


def test_match_all_docs_through_spark_search(spark_index):
    s, rows, _ = spark_index
    q = ast.MatchAllDocsQuery()
    assert s.count(q) == len(rows)
    assert s.match_docs(q).count() == len(rows)


def test_empty_field_scores_as_no_match():
    rows = [
        {"url": f"{i:04d}", "text": f"hello world w{i % 7}", "empty": ""}
        for i in range(60)
    ]
    idx = LocalIndex.build(
        rows, num_segments=2, analyzer=ENGLISH,
        fields=(("", "text"), ("empty", "empty")),
    )
    q = ast.TermQuery(ast.fielded("empty", "hello"))
    assert idx.search(q, k=10, pruned=True) == []
    assert idx.count(q) == 0


def test_parser_uses_field_analyzer():
    fa = {"title": Analyzer()}  # stop-free
    q = parse("title:the", ENGLISH, fa)
    assert q == ast.TermQuery(ast.fielded("title", "the"))
    # default field still drops the stopword
    assert parse("the", ENGLISH, fa) == ast.MatchNoDocsQuery()
    # unfielded clauses in the same query keep the default analyzer
    q2 = parse("title:the AND merge", ENGLISH, fa)
    assert q2 == ast.BooleanQuery(
        must=(
            ast.TermQuery(ast.fielded("title", "the")),
            ast.TermQuery("merge"),
        )
    )


def test_field_analyzers_persisted_and_searchable(spark_index):
    s, rows, index_dir = spark_index
    # commit carries the per-field stopword config
    assert s.commit.get("field_stopwords") == {"title": []}
    # string syntax reaches the stop-free title postings via Searcher...
    got = s.search("title:the", k=5, pruned=True, dtype="f32").collect()
    want = s.search(
        ast.TermQuery(ast.fielded("title", "the")), k=5, pruned=True,
        dtype="f32",
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    assert len(got) == 5
    # ...and via the serving plane (LocalSearcher reconstructs config)
    from lucene_spark.search.serve import LocalSearcher

    ls = LocalSearcher(index_dir, workers=1)
    srv = ls.search("title:the", k=5, pruned=True, dtype="f32")
    assert [(d, sc) for d, sc, _u in srv] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_local_searcher_termless_count_matches_spark(spark, tmp_path_factory):
    """Cross-plane parity for term-less queries: LocalSearcher.count
    must route MatchAllDocs/FieldExists through the segment kernels
    (has_termless_match), not short-circuit to 0."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.searcher import Searcher
    from lucene_spark.search.serve import LocalSearcher

    corpus = make_pages(60)
    d = str(tmp_path_factory.mktemp("tl_idx"))
    build_index(
        spark, spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ), d, IndexConfig(num_segments=2, analyzer=ENGLISH),
    )
    s = Searcher(spark, d)
    l = LocalSearcher(d)
    for q in (ast.MatchAllDocsQuery(), ast.FieldExistsQuery("")):
        assert l.count(q) == s.count(q) == 60, type(q).__name__
    # a field that was never indexed matches nothing on either plane
    missing = ast.FieldExistsQuery("nope")
    assert l.count(missing) == s.count(missing) == 0
