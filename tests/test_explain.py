"""Explanation API (IndexSearcher.explain / BM25Similarity.explain
analog): the root value must be BIT-IDENTICAL to the score search
returns for the same doc, across query shapes and planes, and the BM25
leaf breakdown must reconstruct the score from its components."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search import ast
from lucene_spark.search.searcher import Searcher
from lucene_spark.search.serve import LocalSearcher

QUERIES = [
    "w0000",
    "w0000 AND w0001",
    "w0000 OR w0042 OR w0007",
    '"w0007 w0042"',
    '"w0007 w0042"~2',
    "w0042^2.5 OR w0000",
    "w004*",
    "w0000 OR w004*",
    "w0000 NOT w0042",
]


@pytest.fixture(scope="module")
def planes(spark, tmp_path_factory):
    corpus = make_pages(250)
    d = str(tmp_path_factory.mktemp("explain_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=3, analyzer=ENGLISH))
    return Searcher(spark, d), LocalSearcher(d, workers=1)


@pytest.mark.parametrize("query", QUERIES)
def test_explain_value_equals_search_score(planes, query):
    _, ls = planes
    hits = ls.search(query, k=5)
    assert hits, query
    for doc, score, _url in hits:
        ex = ls.explain(query, doc)
        assert ex["match"] is True, (query, doc)
        assert np.float32(ex["value"]) == np.float32(score), (query, doc)


def test_explain_non_matching_doc(planes):
    _, ls = planes
    matched = {d for d, _, _ in ls.search("w0042", k=10**6)}
    outside = next(d for d in range(ls.commit["doc_count"]) if d not in matched)
    ex = ls.explain("w0042", outside)
    assert ex["match"] is False and ex["value"] == 0.0


def test_explain_spark_plane_matches(planes):
    searcher, ls = planes
    rows = searcher.search("w0000 OR w0042", k=3).collect()
    for r in rows:
        ex = searcher.explain("w0000 OR w0042", r["doc_id"])
        assert np.float32(ex["value"]) == np.float32(r["score"])
        assert ex == ls.explain("w0000 OR w0042", r["doc_id"])


def test_explain_bm25_components_reconstruct_score(planes):
    """boost * idf * tf from the detail nodes == the leaf value (the
    BM25Similarity.explain contract), within f32 rounding of the
    differently-associated engine formula."""
    _, ls = planes
    doc, score, _ = ls.search("w0000", k=1)[0]
    ex = ls.explain("w0000", doc)
    det = {d["description"].split(",")[0]: d["value"] for d in ex["details"]}
    boost = det["boost"]
    idf = next(v for k, v in det.items() if k.startswith("idf"))
    tf = next(v for k, v in det.items() if k.startswith("tf"))
    assert ex["value"] == pytest.approx(boost * idf * tf, rel=1e-5)
    assert np.float32(ex["value"]) == np.float32(score)


def test_explain_boolean_details(planes):
    _, ls = planes
    doc, _, _ = ls.search("w0000 OR w0042", k=1)[0]
    ex = ls.explain("w0000 OR w0042", doc)
    labels = [d["description"][:8] for d in ex["details"]]
    assert all(l.startswith("[should]") for l in labels)
    # matching clause values sum to the root (f32 accumulation)
    acc = np.float32(0.0)
    for d in ex["details"]:
        if d["match"]:
            acc = np.float32(acc + np.float32(d["value"]))
    assert np.float32(ex["value"]) == acc


def test_explain_must_not_exclusion(planes):
    _, ls = planes
    both = {d for d, _, _ in ls.search("w0000 AND w0042", k=10**6)}
    assert both
    doc = sorted(both)[0]
    ex = ls.explain("w0000 NOT w0042", doc)
    assert ex["match"] is False
    assert any("[must_not] excluded" in d["description"] for d in ex["details"])


def test_explain_pins_the_searcher_generation(spark, tmp_path_factory):
    """A writer advancing the index must not skew explain() off the
    Searcher's snapshot: the value stays bit-identical to THIS
    searcher's search() until refresh()."""
    from lucene_spark.streaming.nrt import append_batch

    corpus = make_pages(120)
    d = str(tmp_path_factory.mktemp("explain_gen"))
    cfg = IndexConfig(num_segments=2, analyzer=ENGLISH)
    build_index(
        spark,
        spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus[:80]], ["url", "text"]
        ),
        d, cfg,
    )
    s = Searcher(spark, d)
    row = s.search("w0000", k=1).collect()[0]
    append_batch(
        spark,
        spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus[80:]], ["url", "text"]
        ),
        d, IndexConfig(num_segments=1, analyzer=ENGLISH),
    )
    # searcher still pinned at gen 1; explain must match ITS scores
    row2 = s.search("w0000", k=1).collect()[0]
    assert row2 == row
    ex = s.explain("w0000", row["doc_id"])
    assert np.float32(ex["value"]) == np.float32(row["score"])


def test_explain_multi_term_leaf(planes):
    _, ls = planes
    doc, score, _ = ls.search("w004*", k=1)[0]
    ex = ls.explain("w004*", doc)
    assert ex["match"] and ex["value"] == score == 1.0
    assert "matching dictionary term" in ex["description"]
