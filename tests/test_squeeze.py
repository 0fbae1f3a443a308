"""Dead-doc squeezing merge (round-2, the DocIDMerger analog,
``index/DocIDMerger.java:30-40``): a squeeze merge drops tombstoned
docs from postings, renumbers live docs densely, and recomputes
docFreq/norms/collection stats — after it, every answer must equal a
FRESH index built over only the surviving docs (url + float32 score
sets; internal doc ids legitimately differ)."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages, make_queries
from lucene_spark.index.builder import IndexConfig, build_index, read_latest_commit
from lucene_spark.index.check import check_index
from lucene_spark.index.deletes import delete_docs
from lucene_spark.index.merge import force_merge
from lucene_spark.search.searcher import Searcher

N_DOCS = 260
QUERIES = [q["query"] for q in make_queries()[::6]]


def _df(spark, rows):
    return spark.createDataFrame(
        [(r["url"], r["text"]) for r in rows], ["url", "text"]
    )


def _answers(spark, index_dir, queries=QUERIES):
    s = Searcher(spark, index_dir)
    out = {}
    for q in queries:
        rows = s.search(q, k=10).collect()
        out[q] = [(r["url"], np.float32(r["score"])) for r in rows]
    return out


@pytest.fixture(scope="module")
def squeezed(spark, tmp_path_factory):
    corpus = make_pages(N_DOCS)
    d = str(tmp_path_factory.mktemp("sq_idx"))
    build_index(spark, _df(spark, corpus), d, IndexConfig(num_segments=3, analyzer=ENGLISH))
    dead_keys = [r["url"] for r in corpus[::5]]  # delete every 5th doc
    delete_docs(spark, d, keys=dead_keys)
    commit = force_merge(spark, d, squeeze=True)
    live = [r for r in corpus if r["url"] not in set(dead_keys)]
    return spark, d, commit, live, dead_keys


def test_squeeze_reclaims_docs(squeezed):
    spark, d, commit, live, dead = squeezed
    assert commit["num_segments"] == 1
    assert commit["doc_count"] == len(live) == N_DOCS - len(dead)
    assert commit["deleted_docs"] == 0
    check_index(spark, d)  # all postings/norms/stats invariants hold


def test_squeeze_matches_fresh_rebuild(squeezed, tmp_path_factory):
    """Query answers after squeeze == a fresh single-segment build over
    only the live docs. Score MULTISETS must match exactly (float32);
    url sets must match per fully-included score group (tie-break order
    among equal scores depends on doc ids, same as Lucene)."""
    spark, d, commit, live, dead = squeezed
    ref = str(tmp_path_factory.mktemp("sq_ref"))
    build_index(spark, _df(spark, live), ref, IndexConfig(num_segments=1, analyzer=ENGLISH))
    a = _answers(spark, d)
    b = _answers(spark, ref)
    for q in QUERIES:
        sa = [s for _, s in a[q]]
        sb = [s for _, s in b[q]]
        assert sa == sb, (q, a[q], b[q])
        if sa:
            last = sa[-1]
            assert {u for u, s in a[q] if s != last} == {
                u for u, s in b[q] if s != last
            }, q


def test_squeeze_docfreq_excludes_deleted(squeezed):
    """Global stats shrink: docFreq after squeeze counts live docs only
    (frozen-stats semantics END at the reclaiming merge, like Lucene)."""
    spark, d, commit, live, dead = squeezed
    s = Searcher(spark, d)
    # recompute expected df over live docs
    for term in ("w0000", "w0042"):
        expect = sum(
            1 for r in live if term in ENGLISH.tokenize_one(r["text"])[0]
        )
        got = s.global_term_stats({term}).get(term, (0, 0))[0]
        assert got == expect, term
    # count() excludes nothing anymore (no tombstones left)
    n = s.count("w0000")
    assert n == s.global_term_stats({"w0000"})["w0000"][0]


def test_squeeze_docmap_renumbered(squeezed):
    spark, d, commit, live, dead = squeezed
    import os

    import pyspark.sql.functions as F

    sid = commit["segments"][0]["segment_id"]
    dm = (
        spark.read.parquet(os.path.join(d, "docmap"))
        .where(F.col("segment_id") == sid)
        .orderBy("doc_id")
        .collect()
    )
    ids = [r["doc_id"] for r in dm]
    base = commit["segments"][0]["doc_base"]
    assert ids == list(range(base, base + len(live)))  # dense, gap-free
    assert {r["url"] for r in dm} == {r["url"] for r in live}


def test_compact_squeezes_when_deletes_exceed_threshold(spark, tmp_path_factory):
    """compact() applies the deletesPctAllowed trigger: a merge group
    carrying >20% tombstones is rewritten (deleted docs reclaimed),
    below-threshold groups keep the cheap concatenation merge."""
    from lucene_spark.index.merge import compact

    corpus = make_pages(150)
    d = str(tmp_path_factory.mktemp("cmp_idx"))
    build_index(
        spark, _df(spark, corpus), d,
        IndexConfig(num_segments=6, analyzer=ENGLISH),
    )
    dead = [r["url"] for r in corpus[::3]]  # ~33% > 20% threshold
    delete_docs(spark, d, keys=dead)
    before = read_latest_commit(d)
    assert before["deleted_docs"] == len(dead)
    commit = compact(spark, d, segs_per_tier=2)
    assert commit["num_segments"] < 6
    assert commit["deleted_docs"] < len(dead)  # some tombstones reclaimed
    check_index(spark, d)
    # answers still correct vs a fresh build over survivors
    live = [r for r in corpus if r["url"] not in set(dead)]
    ref = str(tmp_path_factory.mktemp("cmp_ref"))
    build_index(spark, _df(spark, live), ref, IndexConfig(num_segments=1, analyzer=ENGLISH))
    a = _answers(spark, d, QUERIES[:4])
    b = _answers(spark, ref, QUERIES[:4])
    for q in QUERIES[:4]:
        assert {u for u, _ in a[q]} == {u for u, _ in b[q]}, q


def test_concat_merge_carries_del_count(spark, tmp_path_factory):
    """A concatenation merge keeps tombstones AND their commit-row
    del_count, so compact()'s deletesPctAllowed trigger sees the true
    group delete ratio on later iterations."""
    from lucene_spark.index.merge import merge_segments

    corpus = make_pages(120)
    d = str(tmp_path_factory.mktemp("dc_idx"))
    build_index(
        spark, _df(spark, corpus), d,
        IndexConfig(num_segments=4, analyzer=ENGLISH),
    )
    dead = [r["url"] for r in corpus[::6]]
    delete_docs(spark, d, keys=dead)
    before = read_latest_commit(d)
    sids = [s["segment_id"] for s in before["segments"][:2]]
    expect = sum(
        int(s.get("del_count") or 0)
        for s in before["segments"]
        if s["segment_id"] in sids
    )
    commit = merge_segments(spark, d, sids, generation=before["generation"] + 1)
    merged = [s for s in commit["segments"] if s["segment_id"] not in
              {x["segment_id"] for x in before["segments"]}]
    assert len(merged) == 1
    assert int(merged[0]["del_count"]) == expect > 0
    assert commit["deleted_docs"] == len(dead)
