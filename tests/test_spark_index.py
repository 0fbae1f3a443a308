"""End-to-end Spark integration: distributed build -> committed segments
-> distributed search, rank/score-identical to the oracle; resume from
per-partition checkpoints (FIXTURES.md §5 resume fixture)."""

import glob
import json
import os

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages, make_queries
from lucene_spark.index.builder import IndexConfig, build_index, read_latest_commit
from lucene_spark.oracle import OracleIndex
from lucene_spark.search.parser import parse
from lucene_spark.search.searcher import Searcher

N_DOCS = 400
NUM_SEGMENTS = 4


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS)


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, spark, corpus):
    d = str(tmp_path_factory.mktemp("index"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    commit = build_index(
        spark, df, d, IndexConfig(num_segments=NUM_SEGMENTS, analyzer=ENGLISH)
    )
    assert commit["doc_count"] == N_DOCS
    return d


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(corpus, num_segments=NUM_SEGMENTS, analyzer=ENGLISH)


def test_commit_and_manifests(index_dir):
    commit = read_latest_commit(index_dir)
    assert commit["num_segments"] == NUM_SEGMENTS
    manifests = glob.glob(os.path.join(index_dir, "manifest", "segment_*.json"))
    assert len(manifests) == NUM_SEGMENTS
    for mpath in manifests:
        with open(mpath) as f:
            m = json.load(f)
        # lineage + metrics (north rule)
        assert m["input_hash"] and m["num_docs"] > 0
        assert m["num_terms"] > 0 and m["postings_bytes"] > 0
    # doc bases partition the doc-id space densely
    segs = sorted(commit["segments"], key=lambda s: s["doc_base"])
    base = 0
    for s in segs:
        assert s["doc_base"] == base
        base += s["num_docs"]
    assert base == commit["doc_count"]


def test_search_matches_oracle(spark, index_dir, oracle):
    searcher = Searcher(spark, index_dir)
    queries = [q for q in make_queries()[::4]]  # every 4th query (speed)
    for q in queries:
        expected = oracle.top_k(parse(q["query"], ENGLISH), k=q["k"])
        got = searcher.search(q["query"], k=q["k"]).collect()
        assert len(got) == len(expected), q["query"]
        for row, (ed, es, eu) in zip(got, expected):
            assert row["doc_id"] == ed, (q["query"], got, expected)
            assert row["url"] == eu
            assert np.float32(row["score"]) == np.float32(es), q["query"]


def test_count(spark, index_dir, oracle):
    searcher = Searcher(spark, index_dir)
    for qs in ("w0000", "w0042 AND w0000", '"w0007 w0042"', "zzznothing"):
        docs, _ = oracle.score_query(parse(qs, ENGLISH))
        assert searcher.count(qs) == docs.size, qs


def test_term_pushdown_in_plan(spark, index_dir):
    """The postings scan must push the term predicate into Parquet."""
    import pyspark.sql.functions as F

    searcher = Searcher(spark, index_dir)
    df = searcher.postings.where(F.col("term").isin(["w0042"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "term" in plan


def test_resume_skips_built_segments(spark, index_dir, corpus, oracle):
    """Re-running build on the same input must resume every segment (no
    rebuild), keep manifests byte-identical, and answer identically."""
    before = {}
    for mpath in glob.glob(os.path.join(index_dir, "manifest", "segment_*.json")):
        with open(mpath) as f:
            before[mpath] = json.load(f)
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    commit2 = build_index(
        spark, df, index_dir, IndexConfig(num_segments=NUM_SEGMENTS, analyzer=ENGLISH)
    )
    assert all(s["status"] == "resumed" for s in commit2["segments"])
    for mpath, m in before.items():
        with open(mpath) as f:
            m2 = json.load(f)
        assert m2 == m
    searcher = Searcher(spark, index_dir)
    got = searcher.search("w0042 OR w0100", k=10).collect()
    expected = oracle.top_k(parse("w0042 OR w0100", ENGLISH), k=10)
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (d, np.float32(s)) for d, s, _ in expected
    ]


def test_partial_build_resume(spark, tmp_path, corpus, oracle):
    """Kill-after-partial-build simulation: pre-build only a subset of
    segments, then run the full build — only missing segments build, and
    the final index answers identically (FIXTURES.md §5)."""
    d = str(tmp_path / "partial_index")
    from lucene_spark.util.spark_hash import pmod_partition

    subset = [r for r in corpus if pmod_partition(r["url"], NUM_SEGMENTS) in (0, 1)]
    full_df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    # IMPORTANT: doc_base depends on all partitions' counts, so the partial
    # run must see the full input (a real resume re-runs the same job).
    # Simulate a mid-job crash instead: build full, delete two segments'
    # manifests, rebuild.
    build_index(spark, full_df, d, IndexConfig(num_segments=NUM_SEGMENTS, analyzer=ENGLISH))
    removed = 0
    for pid in (2, 3):
        mp = os.path.join(d, "manifest", f"segment_g0001p{pid:05d}.json")
        if os.path.exists(mp):
            os.remove(mp)
            removed += 1
    assert removed == 2
    commit = build_index(
        spark, full_df, d, IndexConfig(num_segments=NUM_SEGMENTS, analyzer=ENGLISH)
    )
    statuses = {s["pid"]: s["status"] for s in commit["segments"]}
    assert statuses[0] == "resumed" and statuses[1] == "resumed"
    assert statuses[2] == "built" and statuses[3] == "built"
    searcher = Searcher(spark, d)
    got = searcher.search('"w0007 w0042"', k=10).collect()
    expected = oracle.top_k(parse('"w0007 w0042"', ENGLISH), k=10)
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (dd, np.float32(s)) for dd, s, _ in expected
    ]
