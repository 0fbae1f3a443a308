"""Batched query evaluation (search_many) and strided doc-base builds:
both must answer identically to the per-query / counted baselines."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages, make_queries
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search.searcher import Searcher

QUERIES = [q["query"] for q in make_queries()[::9]]


@pytest.fixture(scope="module")
def corpus():
    return make_pages(250)


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, spark, corpus):
    d = str(tmp_path_factory.mktemp("many_idx"))
    df = spark.createDataFrame([(r["url"], r["text"]) for r in corpus], ["url", "text"])
    build_index(spark, df, d, IndexConfig(num_segments=3, analyzer=ENGLISH))
    return Searcher(spark, d)


def test_search_many_matches_search(searcher):
    batch = searcher.search_many({q: q for q in QUERIES}, k=10)
    got: dict = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], np.float32(r["score"]), r["url"])
        )
    for q in QUERIES:
        single = [
            (r["doc_id"], np.float32(r["score"]), r["url"])
            for r in searcher.search(q, k=10).collect()
        ]
        assert got.get(q, []) == single, q


HARD_QUERIES = [
    "w0042",
    "w004*",            # prefix (sargable arrow filter)
    "w0042~1",          # fuzzy (Damerau; dictionary post-filter)
    "w0001 AND w0002",
    '"w0001 w0002"~2',  # sloppy phrase
    "*",                # MatchAll/FieldExists — termless, norms-only
    "w0000 OR w99999",  # one zero-hit arm
]


def test_direct_matches_legacy_batch(searcher):
    """direct=True (one stage, task-side pyarrow reads) must be
    bit-identical to the round-3 scan->shuffle->join shape, including
    MultiTermQuery rewrites and termless leaves."""
    a = searcher.search_many(
        {q: q for q in HARD_QUERIES}, k=10, direct=True
    ).collect()
    b = searcher.search_many(
        {q: q for q in HARD_QUERIES}, k=10, direct=False
    ).collect()
    norm = lambda rows: [
        (r["query_id"], r["doc_id"], r["score"], r["url"]) for r in rows
    ]
    assert norm(a) == norm(b)
    assert {r["query_id"] for r in a} >= {"w0042", "*", "w004*"}


def test_direct_respects_deletes(spark, tmp_path, corpus):
    from lucene_spark.index.deletes import delete_docs

    d = str(tmp_path / "del_idx")
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=3, analyzer=ENGLISH))
    s = Searcher(spark, d)
    victims = [r["url"] for r in s.search("w0042", k=3).collect()]
    delete_docs(spark, d, keys=victims)
    s = Searcher(spark, d)
    hits = s.search_many(["w0042"], k=10, direct=True).collect()
    assert victims and not ({r["url"] for r in hits} & set(victims))


def test_strided_build_same_answers(spark, tmp_path, corpus):
    df = spark.createDataFrame([(r["url"], r["text"]) for r in corpus], ["url", "text"])
    d1, d2 = str(tmp_path / "counted"), str(tmp_path / "strided")
    build_index(spark, df, d1, IndexConfig(num_segments=3, analyzer=ENGLISH))
    c2 = build_index(
        spark, df, d2,
        IndexConfig(num_segments=3, analyzer=ENGLISH, doc_base_mode="strided"),
    )
    assert c2["doc_count"] == len(corpus)
    s1, s2 = Searcher(spark, d1), Searcher(spark, d2)
    for q in QUERIES[:4]:
        a = [(r["url"], np.float32(r["score"])) for r in s1.search(q, k=10).collect()]
        b = [(r["url"], np.float32(r["score"])) for r in s2.search(q, k=10).collect()]
        assert a == b, q


def test_single_query_direct_matches_default(searcher):
    for q in HARD_QUERIES:
        a = searcher.search(q, k=10, direct=True).collect()
        b = searcher.search(q, k=10, direct=False).collect()
        norm = lambda rows: [
            (r["doc_id"], r["score"], r["url"]) for r in rows
        ]
        assert norm(a) == norm(b), q
