"""Serving mode: LocalSearcher must return bit-identical answers to the
Spark Searcher over the same index directory (same parser, scorers,
kernels — only the I/O plane differs), at per-query latencies without
a Spark job."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages, make_queries
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.index.deletes import delete_docs
from lucene_spark.search.searcher import Searcher
from lucene_spark.search.serve import LocalSearcher

QUERIES = [q["query"] for q in make_queries()[::4]]


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    corpus = make_pages(220)
    d = str(tmp_path_factory.mktemp("srv_idx"))
    build_index(
        spark, spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ), d, IndexConfig(num_segments=3, analyzer=ENGLISH),
    )
    delete_docs(spark, d, keys=[corpus[11]["url"], corpus[42]["url"]])
    return spark, d


def test_local_searcher_matches_spark_searcher(served):
    spark, d = served
    s = Searcher(spark, d)
    l = LocalSearcher(d)
    for q in QUERIES:
        a = [
            (r["doc_id"], np.float32(r["score"]), r["url"])
            for r in s.search(q, k=10).collect()
        ]
        b = [(doc, np.float32(sc), u) for doc, sc, u in l.search(q, k=10)]
        assert a == b, (q, a, b)
        assert s.count(q) == l.count(q), q


def test_sharded_search_many_matches_per_query(served):
    """The batched serving API (one IPC round per pool) must return
    exactly what per-query scatter-gather returns, including a
    multi-term query in the batch."""
    from lucene_spark.search.serve import ShardedSearcher

    spark, d = served
    ss = ShardedSearcher(d, shards=2)
    try:
        batch = QUERIES[:4] + ["w004*"]
        got = ss.search_many(batch, k=10)
        for i, q in enumerate(batch):
            assert got[str(i)] == ss.search(q, k=10), q
    finally:
        ss.close()


def test_local_searcher_warm_cache_consistent(served):
    spark, d = served
    l = LocalSearcher(d)
    q = QUERIES[0]
    first = l.search(q, k=10)
    again = l.search(q, k=10)  # cached term blocks path
    assert first == again


def test_local_searcher_refresh(served):
    spark, d = served
    l = LocalSearcher(d)
    assert l.refresh() is False


def test_sharded_searcher_matches_local(served):
    from lucene_spark.search.serve import ShardedSearcher

    spark, d = served
    l = LocalSearcher(d, workers=1)
    ss = ShardedSearcher(d, shards=2)
    try:
        for q in QUERIES[:6]:
            assert ss.search(q, k=10) == l.search(q, k=10), q
            assert ss.count(q) == l.count(q), q
    finally:
        ss.close()


def test_sharded_refresh_picks_up_new_generation(served, tmp_path_factory):
    """ShardedSearcher.refresh rebuilds worker shards on a new commit
    (merges change the segment list, so pools are reopened)."""
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search.serve import ShardedSearcher

    spark, d = served
    ss = ShardedSearcher(d, shards=2)
    try:
        assert ss.refresh() is False
        before = ss.search(QUERIES[0], k=10)
        force_merge(spark, d)
        assert ss.refresh() is True
        after = ss.search(QUERIES[0], k=10)
        assert before == after  # concatenation merge preserves answers
    finally:
        ss.close()


def test_sharded_refresh_reuses_workers_on_append(spark, tmp_path_factory):
    """NRT-append refresh must NOT respawn worker processes (warm
    caches survive); answers after refresh match a fresh LocalSearcher
    on the new commit."""
    from lucene_spark.search.serve import ShardedSearcher
    from lucene_spark.streaming.nrt import append_batch

    corpus = make_pages(140)
    d = str(tmp_path_factory.mktemp("srv_nrt"))
    cfg = IndexConfig(num_segments=2, analyzer=ENGLISH)
    build_index(
        spark, spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus[:100]], ["url", "text"]
        ), d, cfg,
    )
    ss = ShardedSearcher(d, shards=2)
    try:
        pids = ss.worker_pids()
        ss.search(QUERIES[0], k=10)  # warm the pools
        append_batch(
            spark, spark.createDataFrame(
                [(r["url"], r["text"]) for r in corpus[100:]],
                ["url", "text"],
            ), d, IndexConfig(num_segments=1, analyzer=ENGLISH),
        )
        assert ss.refresh() is True
        assert ss.worker_pids() == pids  # same processes, re-pointed
        fresh = LocalSearcher(d, workers=1)
        for q in QUERIES[:5]:
            assert ss.search(q, k=10) == fresh.search(q, k=10), q
            assert ss.count(q) == fresh.count(q), q
    finally:
        ss.close()


def test_sharded_refresh_rescales_pools_on_merge_and_append(
    spark, tmp_path_factory
):
    """A force-merge down to ONE segment shrinks the pool count to 1
    (the kept pool is one of the original processes — no full respawn);
    a later append that raises the segment count back grows the pools
    again, with the fresh segment landing on the new pool. Answers
    match a fresh LocalSearcher at every step."""
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search.serve import ShardedSearcher
    from lucene_spark.streaming.nrt import append_batch

    corpus = make_pages(160)
    d = str(tmp_path_factory.mktemp("srv_mrg"))
    build_index(
        spark, spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus[:120]], ["url", "text"]
        ), d, IndexConfig(num_segments=3, analyzer=ENGLISH),
    )
    ss = ShardedSearcher(d, shards=2)
    try:
        pids = ss.worker_pids()
        assert len(pids) == 2
        before = ss.search(QUERIES[0], k=10)
        force_merge(spark, d)
        assert ss.refresh() is True
        pids2 = ss.worker_pids()
        assert len(pids2) == 1 and pids2[0] in pids  # shrank, kept warm
        assert ss.search(QUERIES[0], k=10) == before
        assert sorted(
            sid for ids in ss._assign for sid in ids
        ) == sorted(s["segment_id"] for s in ss.commit["segments"])
        append_batch(
            spark, spark.createDataFrame(
                [(r["url"], r["text"]) for r in corpus[120:]],
                ["url", "text"],
            ), d, IndexConfig(num_segments=1, analyzer=ENGLISH),
        )
        assert ss.refresh() is True
        pids3 = ss.worker_pids()
        assert len(pids3) == 2 and pids3[0] == pids2[0]  # grew back
        fresh = LocalSearcher(d, workers=1)
        for q in QUERIES[:5]:
            assert ss.search(q, k=10) == fresh.search(q, k=10), q
            assert ss.count(q) == fresh.count(q), q
    finally:
        ss.close()


def test_local_refresh_retains_unchanged_views(spark, tmp_path_factory):
    """LocalSearcher keeps warm term-block views across refresh for
    segments whose (segment_id, del_count) is unchanged, and drops the
    view of a segment that took new deletes."""
    from lucene_spark.streaming.nrt import append_batch

    corpus = make_pages(130)
    d = str(tmp_path_factory.mktemp("srv_ret"))
    build_index(
        spark, spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus[:100]], ["url", "text"]
        ), d, IndexConfig(num_segments=2, analyzer=ENGLISH),
    )
    l = LocalSearcher(d)
    l.search(QUERIES[0], k=10)
    warm = set(l._views)
    assert warm  # views were populated
    append_batch(
        spark, spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus[100:]], ["url", "text"]
        ), d, IndexConfig(num_segments=1, analyzer=ENGLISH),
    )
    assert l.refresh() is True
    assert warm <= set(l._views)  # append: old views retained
    fresh = LocalSearcher(d)
    for q in QUERIES[:5]:
        assert l.search(q, k=10) == fresh.search(q, k=10), q
    # a delete invalidates ONLY the touched segment's cached view
    victim = l.search(QUERIES[0], k=1)[0][0]
    hit_seg = next(
        s["segment_id"]
        for s in l.segments
        if s["doc_base"] <= victim < s["doc_base"] + s["num_docs"]
    )
    delete_docs(spark, d, doc_ids=[victim])
    warm = set(l._views)
    assert l.refresh() is True
    assert hit_seg not in l._views
    assert warm - {hit_seg} <= set(l._views)
    fresh = LocalSearcher(d)
    for q in QUERIES[:5]:
        assert l.search(q, k=10) == fresh.search(q, k=10), q


def _rss_kb(pid: int) -> int:
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return 0


def test_sharded_soak_sustained_appends(spark, tmp_path_factory):
    """Serving soak (VERDICT r3 #8): 32 NRT append generations against
    a live ShardedSearcher. The pool must not drift (same worker
    processes re-pointed every refresh), worker memory must stay
    bounded (caches grow with the segment count, not with the refresh
    count), counts must track the appended docs exactly, and the final
    answers must match a fresh LocalSearcher on the final commit."""
    from lucene_spark.search.serve import ShardedSearcher
    from lucene_spark.streaming.nrt import append_batch

    corpus = make_pages(320)
    base, feed = corpus[:128], corpus[128:]
    d = str(tmp_path_factory.mktemp("srv_soak"))
    build_index(
        spark, spark.createDataFrame(
            [(r["url"], r["text"]) for r in base], ["url", "text"]
        ), d, IndexConfig(num_segments=2, analyzer=ENGLISH),
    )
    gens = 32
    batch = len(feed) // gens
    ss = ShardedSearcher(d, shards=2)
    try:
        ss.search(QUERIES[0], k=10)  # warm
        pids0 = ss.worker_pids()
        rss0 = sum(_rss_kb(p) for p in pids0)
        n_docs = len(base)
        lat = []
        import time as _t

        for g in range(gens):
            rows = feed[g * batch : (g + 1) * batch]
            append_batch(
                spark, spark.createDataFrame(
                    [(r["url"], r["text"]) for r in rows], ["url", "text"]
                ), d, IndexConfig(num_segments=1, analyzer=ENGLISH),
            )
            n_docs += len(rows)
            assert ss.refresh() is True
            assert ss.worker_pids() == pids0, f"worker drift at gen {g}"
            t0 = _t.time()
            ss.search(QUERIES[g % len(QUERIES)], k=10)
            lat.append(_t.time() - t0)
            assert ss.count("w0000 OR *") >= 0  # termless stays routable
        # exact doc accounting across all generations
        assert ss.commit["doc_count"] == n_docs
        assert len(ss.commit["segments"]) == 2 + gens
        # memory bounded: growth is segment metadata + block caches for
        # the queried terms, far below one leaked corpus per refresh
        rss1 = sum(_rss_kb(p) for p in ss.worker_pids())
        assert rss1 - rss0 < 200_000, (rss0, rss1)  # < 200 MB growth
        # latency stable: the last generations are not systematically
        # slower than the first (loose 10x bound — noisy-box safe)
        early = sorted(lat[:8])[4]
        late = sorted(lat[-8:])[4]
        assert late < early * 10 + 0.05, (early, late)
        # final answers == a fresh searcher over the final commit
        fresh = LocalSearcher(d, workers=1)
        for q in QUERIES[:6]:
            assert ss.search(q, k=10) == fresh.search(q, k=10), q
            assert ss.count(q) == fresh.count(q), q
    finally:
        ss.close()
