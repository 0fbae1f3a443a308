"""Spill guard for the direct batched executor.

A constant-score MultiTermQuery expansion (`a*` on a huge segment)
must never materialize all matching postings in one task-side frame:
``searcher._mt_union_docs_chunked`` accumulates the leaf's doc union
in term-chunks bounded by ``DIRECT_MT_CHUNK_POSTINGS`` postings,
reading docs_bin ONLY (a constant-score union needs no tfs/pos/
impacts). Results must be bit-identical to the unguarded scan shape
at any budget, including budget=1 (one term per chunk).
"""

import numpy as np
import pytest

import pyarrow.parquet

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search import searcher as searcher_mod
from lucene_spark.search.searcher import Searcher, _mt_union_docs_chunked

WIDE_QUERIES = [
    "w0*",              # wide prefix: most of the vocabulary
    "w004*",            # narrow prefix
    "w0042~1",          # fuzzy expansion
    "w0* AND w0042",    # expansion under a conjunction
    '"w0001 w0002"~1',  # non-MT control
]


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("spill_idx"))
    corpus = make_pages(400)
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=3, analyzer=ENGLISH))
    return Searcher(spark, d)


def _seg_ids(s):
    return sorted(s.live_segments)


def test_chunked_union_budget_invariant(searcher):
    """The union is the same at budget=1 (one term per chunk),
    a mid budget, and budget=inf (single chunk)."""
    sid = _seg_ids(searcher)[0]
    key = ("prefix", ("w0",), "")
    ref = _mt_union_docs_chunked(searcher.index_dir, sid, *key, 10**12)
    assert ref.size > 0
    assert np.array_equal(np.unique(ref), ref)  # sorted unique contract
    for budget in (1, 7, 64):
        got = _mt_union_docs_chunked(searcher.index_dir, sid, *key, budget)
        assert np.array_equal(got, ref), budget


def test_chunk_reads_are_bounded(searcher, monkeypatch):
    """Every postings read under the guard covers <= budget postings
    (singleton chunks excepted for a term whose docFreq alone exceeds
    it) and touches ONLY first_doc/docs_bin — never tfs/pos/impacts."""
    sid = _seg_ids(searcher)[0]
    budget = 40
    # docFreq per matching term, from the segment dictionary
    t = pyarrow.parquet.read_table(
        f"{searcher.index_dir}/term_stats/segment_id={sid}",
        columns=["term", "doc_freq"],
    )
    dfs = {
        x: int(d)
        for x, d in zip(t["term"].to_pylist(), t["doc_freq"].to_pylist())
    }
    max_single = max(d for x, d in dfs.items() if x.startswith("w0"))

    real = pyarrow.parquet.read_table
    reads = []

    def spy(path, columns=None, filters=None, **kw):
        if "postings" in str(path):
            reads.append((columns, filters))
        return real(path, columns=columns, filters=filters, **kw)

    monkeypatch.setattr(pyarrow.parquet, "read_table", spy)
    _mt_union_docs_chunked(
        searcher.index_dir, sid, "prefix", ("w0",), "", budget
    )
    assert len(reads) > 1  # the guard actually chunked
    for columns, filters in reads:
        assert set(columns) == {"first_doc", "docs_bin"}
        (_, _, chunk_terms), = filters
        load = sum(dfs[x] for x in chunk_terms)
        assert load <= max(budget, max_single), (load, len(chunk_terms))


def test_direct_wide_prefix_parity_tiny_budget(searcher, monkeypatch):
    """search_many(direct=True) under a tiny chunk budget (forcing
    many chunks per task) is bit-identical to the unguarded scan
    shape for wide expansions, conjunctions, and non-MT controls."""
    monkeypatch.setattr(searcher_mod, "DIRECT_MT_CHUNK_POSTINGS", 5)
    a = searcher.search_many(
        {q: q for q in WIDE_QUERIES}, k=10, direct=True
    ).collect()
    b = searcher.search_many(
        {q: q for q in WIDE_QUERIES}, k=10, direct=False
    ).collect()
    norm = lambda rows: [
        (r["query_id"], r["doc_id"], r["score"], r["url"]) for r in rows
    ]
    assert norm(a) == norm(b)
    assert {r["query_id"] for r in a} >= {"w0*", "w0* AND w0042"}


def test_direct_single_query_parity_tiny_budget(searcher, monkeypatch):
    monkeypatch.setattr(searcher_mod, "DIRECT_MT_CHUNK_POSTINGS", 3)
    a = [
        (r["doc_id"], r["score"], r["url"])
        for r in searcher.search("w0*", k=10, direct=True).collect()
    ]
    b = [
        (r["doc_id"], r["score"], r["url"])
        for r in searcher.search("w0*", k=10, direct=False).collect()
    ]
    assert a == b and len(a) == 10


def test_interval_mt_sources_keep_full_postings(searcher):
    """Interval multi-term sources need POSITIONS (iterator-build
    expansion) — the split must route them to the full-postings path,
    not the docs-only union, at any budget."""
    from lucene_spark.search import ast

    q = 'fn:ordered(fn:wildcard(w000*) w0042)'
    cs, iv = ast.multi_term_leaves_split(searcher.parse(q))
    assert not cs and len(iv) == 1
    a = [
        (r["doc_id"], r["score"])
        for r in searcher.search(q, k=10, direct=True).collect()
    ]
    b = [
        (r["doc_id"], r["score"])
        for r in searcher.search(q, k=10, direct=False).collect()
    ]
    assert a == b
