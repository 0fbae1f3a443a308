"""searchAfter pagination (IndexSearcher.searchAfter /
PagingTopScoreDocCollector): keyset cursor over the total
(score desc, doc asc) rank; pages compose exactly."""

import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search import ast
from lucene_spark.search.searcher import Searcher

N_DOCS = 200
SEGS = 3


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("sa_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in make_pages(N_DOCS)], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=SEGS, analyzer=ENGLISH))
    return Searcher(spark, d)


QUERIES = [
    "w0042",
    "w0000 OR w0007",
    ast.BooleanQuery(must=(ast.TermQuery("w0000"), ast.TermQuery("w0001"))),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_pages_compose(searcher, qi):
    q = QUERIES[qi]
    k = 7
    full = searcher.search(q, k=3 * k, pruned=False, dtype="f64").collect()
    pages = [full[:k]]
    while len(pages) < 3 and pages[-1]:
        cur = (pages[-1][-1]["score"], pages[-1][-1]["doc_id"])
        pages.append(searcher.search_after(q, cur, k=k, dtype="f64").collect())
    flat = [r for p in pages for r in p]
    assert [(r["doc_id"], r["score"]) for r in flat] == [
        (r["doc_id"], r["score"]) for r in full[: len(flat)]
    ]


def test_past_the_end(searcher):
    q = "w0042"
    n = len(searcher.search(q, k=10_000, pruned=False).collect())
    full = searcher.search(q, k=n, pruned=False, dtype="f64").collect()
    cur = (full[-1]["score"], full[-1]["doc_id"])
    assert searcher.search_after(q, cur, k=10, dtype="f64").collect() == []


def test_tie_cursor(searcher):
    """Cursor sitting inside a tie band advances by doc_id."""
    q = ast.ConstantScoreQuery(ast.TermQuery("w0042"), boost=1.0)
    full = searcher.search(q, k=10_000, pruned=False, dtype="f64").collect()
    assert len({r["score"] for r in full}) == 1  # all-tied scores
    mid = full[4]
    got = searcher.search_after(q, (mid["score"], mid["doc_id"]), k=5,
                                dtype="f64").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in full[5:10]
    ]
