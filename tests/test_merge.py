"""Merge/compaction equivalence: merged segments answer every query
bit-identically to the pre-merge index (SURVEY.md §5 adoption of
``TestTieredMergePolicy`` / merge equivalence), plus tier-geometry unit
tests and merge idempotency."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages, make_queries
from lucene_spark.index.builder import IndexConfig, build_index, read_latest_commit
from lucene_spark.index.merge import compact, find_merge, force_merge, merge_segments
from lucene_spark.search.searcher import Searcher

N_DOCS = 400
NUM_SEGMENTS = 8


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("merge_index"))
    corpus = make_pages(N_DOCS)
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=NUM_SEGMENTS, analyzer=ENGLISH))
    return d


def _snapshot(spark, index_dir, queries):
    s = Searcher(spark, index_dir)
    out = {}
    for q in queries:
        rows = s.search(q, k=10).collect()
        out[q] = [(r["doc_id"], np.float32(r["score"]), r["url"]) for r in rows]
        out[("count", q)] = s.count(q)
    out["dict"] = sorted(
        (r["term"], r["doc_freq"], r["total_tf"])
        for r in s.term_dictionary().collect()
    )
    return out


QUERIES = [q["query"] for q in make_queries()[::6]]


def test_force_merge_equivalence(spark, index_dir):
    before = _snapshot(spark, index_dir, QUERIES)
    commit = force_merge(spark, index_dir)
    assert commit["num_segments"] == 1
    assert commit["doc_count"] == N_DOCS if "doc_count" in commit else True
    after = _snapshot(spark, index_dir, QUERIES)
    assert before == after


def test_merged_segment_invariants(spark, index_dir):
    commit = read_latest_commit(index_dir)
    seg = commit["segments"][0]
    assert seg["status"] == "merged"
    assert seg["doc_base"] == 0
    assert seg["num_docs"] == N_DOCS
    # doc ids preserved: every doc still reachable with its url
    s = Searcher(spark, index_dir)
    dm = s.docmap.orderBy("doc_id").collect()
    assert len(dm) == N_DOCS
    assert [r["doc_id"] for r in dm] == list(range(N_DOCS))


def test_merge_idempotent(spark, index_dir):
    commit = read_latest_commit(index_dir)
    gen = commit["generation"]
    c2 = force_merge(spark, index_dir)  # single segment: no-op
    assert c2["generation"] == gen


def test_partial_merge_contiguous(spark, tmp_path):
    d = str(tmp_path / "idx")
    corpus = make_pages(200)
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=6, analyzer=ENGLISH))
    before = _snapshot(spark, d, QUERIES[:3])
    commit = read_latest_commit(d)
    segs = sorted(commit["segments"], key=lambda s: s["doc_base"])
    # merge the middle run [2, 3, 4]
    merge_segments(
        spark, d, [s["segment_id"] for s in segs[2:5]], generation=2, num_salts=3
    )
    after_commit = read_latest_commit(d)
    assert after_commit["num_segments"] == 4
    after = _snapshot(spark, d, QUERIES[:3])
    assert before == after
    # non-contiguous group must be rejected
    segs2 = sorted(after_commit["segments"], key=lambda s: s["doc_base"])
    with pytest.raises(ValueError):
        merge_segments(
            spark, d,
            [segs2[0]["segment_id"], segs2[-1]["segment_id"]],
            generation=9,
        )


def test_compact_tier_geometry(spark, tmp_path):
    d = str(tmp_path / "idx")
    corpus = make_pages(300)
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=8, analyzer=ENGLISH))
    before = _snapshot(spark, d, QUERIES[:3])
    # tiny floor so the tier math sees real sizes; segsPerTier=2 forces
    # aggressive merging
    commit = compact(spark, d, segs_per_tier=2, floor_bytes=64 * 1024, num_salts=2)
    assert commit["num_segments"] < 8
    after = _snapshot(spark, d, QUERIES[:3])
    assert before == after


def test_find_merge_policy_unit():
    def seg(i, base, bytes_):
        return {
            "segment_id": f"s{i}", "doc_base": base, "num_docs": 10,
            "postings_bytes": bytes_,
        }

    # few segments under budget: no merge
    segs = [seg(0, 0, 10 << 20), seg(1, 10, 10 << 20)]
    assert find_merge(segs) is None
    # many equal small segments: a merge is proposed, contiguous
    segs = [seg(i, i * 10, 1 << 20) for i in range(20)]
    grp = find_merge(segs, segs_per_tier=4, floor_bytes=1 << 20)
    assert grp is not None and len(grp) >= 2
    bases = [s["doc_base"] for s in grp]
    assert bases == sorted(bases)
    idx = [b // 10 for b in bases]
    assert idx == list(range(idx[0], idx[0] + len(idx)))
    # oversized result is rejected
    segs = [seg(i, i * 10, 4 << 30) for i in range(4)]
    assert find_merge(segs, max_merged_bytes=5 << 30, floor_bytes=1 << 20, segs_per_tier=2) is None or sum(
        s["postings_bytes"] for s in find_merge(segs, max_merged_bytes=5 << 30, floor_bytes=1 << 20, segs_per_tier=2)
    ) <= 5 << 30


def test_vacuum_removes_dead_segments(spark, tmp_path):
    import glob
    import os

    from lucene_spark.index.merge import vacuum

    d = str(tmp_path / "idx")
    corpus = make_pages(120)
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=4, analyzer=ENGLISH))
    before = _snapshot(spark, d, QUERIES[:2])
    force_merge(spark, d)
    removed = vacuum(d)
    assert len(removed) == 4  # the four pre-merge segments
    assert len(glob.glob(f"{d}/postings/segment_id=*")) == 1
    assert len(os.listdir(os.path.join(d, "commits"))) == 1
    # the survivor still answers identically
    after = _snapshot(spark, d, QUERIES[:2])
    assert before == after
