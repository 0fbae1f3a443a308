"""Grouping-module analog (lucene/grouping two-pass search): top-N
groups by best doc score, then top-k docs per group — checked against
an independent Python recomputation from the oracle's full score set."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.oracle import OracleIndex
from lucene_spark.search.parser import parse
from lucene_spark.search.searcher import Searcher

N_GROUPS, K = 4, 3


@pytest.fixture(scope="module")
def grouped(spark, tmp_path_factory):
    corpus = make_pages(300)
    d = str(tmp_path_factory.mktemp("grp_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=3, analyzer=ENGLISH))
    groups = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(len(corpus))], "doc_id long, group string"
    )
    return (
        Searcher(spark, d),
        OracleIndex.build(corpus, num_segments=3, analyzer=ENGLISH),
        groups,
    )


def _expected(oracle, query, n_groups, k):
    full = oracle.top_k(parse(query, ENGLISH), k=10**6)  # whole match set
    by_group: dict = {}
    for doc, score, url in full:  # already (score desc, doc asc)
        by_group.setdefault(f"g{doc % 7}", []).append((doc, score, url))
    heads = sorted(
        by_group.items(), key=lambda kv: (-kv[1][0][1], kv[1][0][0], kv[0])
    )[:n_groups]
    out = []
    for grank, (g, rows) in enumerate(heads, 1):
        for rank, (doc, score, url) in enumerate(rows[:k], 1):
            out.append((g, grank, rank, doc, np.float32(score)))
    return out


@pytest.mark.parametrize(
    "query", ["w0000", "w0000 OR w0042 OR w0007", '"w0007 w0042"~3']
)
def test_group_topk_matches_oracle(grouped, query):
    searcher, oracle, groups = grouped
    got = [
        (
            r["group"],
            r["group_rank"],
            r["rank"],
            r["doc_id"],
            np.float32(r["score"]),
        )
        for r in searcher.group_topk(
            query, groups, group_col="group", n_groups=N_GROUPS, k=K,
            dtype="f32",
        ).collect()
    ]
    assert got == _expected(oracle, query, N_GROUPS, K), query


def test_facet_ranges_overlapping(grouped):
    """LongRangeFacetCounts semantics: overlapping ranges each count
    every matched doc whose value falls inside them."""
    searcher, oracle, groups = grouped
    spark = groups.sparkSession
    values = spark.createDataFrame(
        [(i, i * 3 % 100) for i in range(300)], "doc_id long, v long"
    )
    matched = [d for d, _, _ in oracle.top_k(parse("w0000", ENGLISH), k=10**6)]
    vals = {i: i * 3 % 100 for i in range(300)}
    ranges = [
        ("low", 0, 50),                  # [0, 50)
        ("mid", 25, 75, True, True),     # [25, 75] — overlaps "low"
        ("hi_open", 50, None),           # [50, inf)
    ]
    got = {
        r["label"]: r["count"]
        for r in searcher.facet_ranges("w0000", values, "v", ranges).collect()
    }
    assert got["low"] == sum(1 for d in matched if 0 <= vals[d] < 50)
    assert got["mid"] == sum(1 for d in matched if 25 <= vals[d] <= 75)
    assert got["hi_open"] == sum(1 for d in matched if vals[d] >= 50)


def test_group_topk_null_group_for_unmapped_docs(grouped):
    """Matching docs with no group_df row form ONE null group (the
    reference's null-group behavior) instead of silently vanishing."""
    searcher, oracle, groups = grouped
    spark = groups.sparkSession
    partial = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(0, 300, 2)],  # even ids only
        "doc_id long, group string",
    )
    full = oracle.top_k(parse("w0000", ENGLISH), k=10**6)
    odd_matched = [d for d, _, _ in full if d % 2 == 1]
    assert odd_matched  # fixture sanity
    rows = searcher.group_topk(
        "w0000", partial, group_col="group", n_groups=50, k=10**6,
        dtype="f32",
    ).collect()
    null_docs = sorted(r["doc_id"] for r in rows if r["group"] is None)
    assert null_docs == sorted(odd_matched)
    # every matched doc appears exactly once across groups
    assert sorted(r["doc_id"] for r in rows) == sorted(d for d, _, _ in full)


def test_facet_ranges_empty_list(grouped):
    searcher, _, groups = grouped
    spark = groups.sparkSession
    values = spark.createDataFrame([(0, 1)], "doc_id long, v long")
    assert searcher.facet_ranges("w0000", values, "v", []).collect() == []


def test_group_topk_fewer_groups_than_requested(grouped):
    searcher, oracle, groups = grouped
    got = searcher.group_topk(
        "w0042", groups, group_col="group", n_groups=50, k=2
    ).collect()
    want = _expected(oracle, "w0042", 50, 2)
    assert len(got) == len(want)
    assert [r["doc_id"] for r in got] == [w[3] for w in want]
