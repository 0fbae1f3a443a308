"""FunctionScoreQuery (queries/function/FunctionScoreQuery.java):
boostByValue (score = inner * value) and the base constructor
(score = value over the inner match set)."""

import pyspark.sql.functions as F
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search import ast
from lucene_spark.search.searcher import Searcher

N_DOCS = 250
SEGS = 3


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("fs_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in make_pages(N_DOCS)], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=SEGS, analyzer=ENGLISH))
    return Searcher(spark, d)


@pytest.fixture(scope="module")
def values(searcher):
    # deterministic doc-value column keyed on internal doc_id
    return searcher.docmap.select(
        "doc_id", ((F.col("doc_id") % 7 + 1).cast("double")).alias("value")
    )


def _expected_boost(searcher, values, q, k):
    """Independent recompute: exhaustive f64 scores * value, re-ranked
    in python."""
    full = searcher.search(q, k=N_DOCS, pruned=False, dtype="f64").collect()
    vals = {r["doc_id"]: r["value"] for r in values.collect()}
    rows = [(r["doc_id"], r["score"] * vals[r["doc_id"]]) for r in full]
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


QUERIES = [
    ast.TermQuery("w0042"),
    ast.BooleanQuery(
        should=(ast.TermQuery("w0042"), ast.TermQuery("w0007")),
        min_should_match=1,
    ),
    ast.BooleanQuery(must=(ast.TermQuery("w0000"), ast.TermQuery("w0001"))),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_boost_by_value(searcher, values, qi):
    q = QUERIES[qi]
    got = searcher.function_score_df(q, values, k=10, mode="boost").collect()
    want = _expected_boost(searcher, values, q, 10)
    assert [(r["doc_id"], r["score"]) for r in got] == want


def test_replace_mode(searcher, values):
    q = QUERIES[1]
    got = searcher.function_score_df(q, values, k=10, mode="replace").collect()
    matches = {
        r["doc_id"]
        for r in searcher.search(q, k=N_DOCS, pruned=False).collect()
    }
    vals = {r["doc_id"]: r["value"] for r in values.collect()}
    want = sorted(
        ((d, vals[d]) for d in matches), key=lambda t: (-t[1], t[0])
    )[:10]
    assert [(r["doc_id"], r["score"]) for r in got] == want
    # value ties break by ascending doc_id (HitQueue contract)
    scores = [r["score"] for r in got]
    ids = [r["doc_id"] for r in got]
    for i in range(len(got) - 1):
        if scores[i] == scores[i + 1]:
            assert ids[i] < ids[i + 1]


def test_missing_value_drops_doc(searcher, values):
    """Docs absent from the values table drop from the ranking (inner
    join) — the DoubleValuesSource advanceExact=false contract."""
    q = ast.TermQuery("w0042")
    half = values.where(F.col("doc_id") % 2 == 0)
    got = searcher.function_score_df(q, half, k=50, mode="boost").collect()
    assert got and all(r["doc_id"] % 2 == 0 for r in got)
