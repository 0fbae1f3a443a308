"""Document deletes: tombstone semantics — deleted docs vanish from
every query path, surviving docs keep their EXACT scores (stats frozen
until merge, like the reference), deletes survive merges, and
delete+re-add implements update."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index, read_latest_commit
from lucene_spark.index.deletes import delete_docs
from lucene_spark.index.merge import force_merge
from lucene_spark.search.searcher import Searcher
from lucene_spark.streaming.nrt import append_batch

N = 220


@pytest.fixture()
def idx(tmp_path, spark):
    corpus = make_pages(N)
    d = str(tmp_path / "idx")
    df = spark.createDataFrame([(r["url"], r["text"]) for r in corpus], ["url", "text"])
    build_index(spark, df, d, IndexConfig(num_segments=3, analyzer=ENGLISH))
    return d, corpus


def test_delete_masks_all_query_paths(spark, idx):
    d, corpus = idx
    s = Searcher(spark, d)
    before = s.search("w0000 OR w0001", k=500).collect()
    assert before
    victims = [r["url"] for r in before[:3]]
    victim_ids = {r["doc_id"] for r in before[:3]}
    survivors = {
        r["doc_id"]: np.float32(r["score"]) for r in before if r["url"] not in victims
    }
    commit = delete_docs(spark, d, keys=victims)
    assert commit["deleted_docs"] == 3
    s.refresh()

    for q in ["w0000", "w0000 OR w0001", "w0000 AND w0001",
              '"w0007 w0042"', "w0000 OR w0042"]:
        rows = s.search(q, k=500).collect()
        got_ids = {r["doc_id"] for r in rows}
        assert not (got_ids & victim_ids), q
    # surviving docs score EXACTLY as before (stats frozen by design)
    after = {r["doc_id"]: np.float32(r["score"])
             for r in s.search("w0000 OR w0001", k=500).collect()}
    for doc, score in after.items():
        assert survivors[doc] == score
    # counts shrink accordingly
    assert s.count("w0000 OR w0001") == len(before) - 3
    # match surfaces mask too
    md = {r["doc_id"] for r in s.match_docs("w0000").collect()}
    assert not (md & victim_ids)
    tp = {r["doc_id"] for r in s.term_postings_df("w0000").collect()}
    assert not (tp & victim_ids)


def test_deletes_survive_merge(spark, idx):
    d, corpus = idx
    s = Searcher(spark, d)
    rows = s.search("w0001", k=50).collect()
    victims = [r["url"] for r in rows[:2]]
    victim_ids = {r["doc_id"] for r in rows[:2]}
    delete_docs(spark, d, keys=victims)
    force_merge(spark, d)
    s2 = Searcher(spark, d)
    got = {r["doc_id"] for r in s2.search("w0001", k=500).collect()}
    assert not (got & victim_ids)
    commit = read_latest_commit(d)
    assert commit["num_segments"] == 1


def test_update_is_delete_plus_append(spark, idx):
    d, corpus = idx
    s = Searcher(spark, d)
    url = s.search("w0002", k=1).collect()[0]["url"]
    delete_docs(spark, d, keys=[url])
    new_text = "w9998 w9998 updated document content w0002"
    append_batch(
        spark,
        spark.createDataFrame([(url, new_text)], ["url", "text"]),
        d,
        IndexConfig(num_segments=1, analyzer=ENGLISH),
    )
    s2 = Searcher(spark, d)
    hits = s2.search("w9998", k=10).collect()
    assert len(hits) == 1 and hits[0]["url"] == url
    # the old version no longer matches under its old doc id
    w2 = s2.search("w0002", k=500).collect()
    assert sum(1 for r in w2 if r["url"] == url) == 1  # only the new doc


def test_delete_idempotent_and_by_id(spark, idx):
    d, corpus = idx
    s = Searcher(spark, d)
    doc = s.search("w0003", k=1).collect()[0]["doc_id"]
    c1 = delete_docs(spark, d, doc_ids=[doc])
    c2 = delete_docs(spark, d, doc_ids=[doc])
    assert c1["deleted_docs"] == c2["deleted_docs"] == 1


def test_delete_by_predicate_matches_delete_by_keys(spark, tmp_path):
    """The distributed delete-by-query path (predicate over the docmap,
    task-side tombstone unions, no id materialization on the driver)
    produces commits and search results identical to key deletes."""
    from lucene_spark.analysis.analyzer import ENGLISH
    from lucene_spark.fixtures import make_pages
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.deletes import delete_docs
    from lucene_spark.search.searcher import Searcher

    corpus = make_pages(120)

    def build(sub):
        d = str(tmp_path / sub)
        build_index(
            spark,
            spark.createDataFrame(
                [(r["url"], r["text"]) for r in corpus], ["url", "text"]
            ),
            d,
            IndexConfig(num_segments=3, analyzer=ENGLISH),
        )
        return d
    d_pred = build("pred")
    d_keys = build("keys")
    victims = sorted(
        r["url"]
        for r in spark.read.parquet(d_pred + "/docmap")
        .where("url like '%7'")
        .collect()
    )
    assert victims
    c1 = delete_docs(spark, d_pred, predicate="url LIKE '%7'")
    c2 = delete_docs(spark, d_keys, keys=victims)
    assert c1["deleted_docs"] == c2["deleted_docs"] > 0
    assert (
        {s["segment_id"]: s["del_count"] for s in c1["segments"]}
        == {s["segment_id"]: s["del_count"] for s in c2["segments"]}
    )
    for q in ("w0042", "w0007 OR w0100", '"w0007 w0042"'):
        a = [(r["url"], r["score"]) for r in Searcher(spark, d_pred).search(q, k=20).collect()]
        b = [(r["url"], r["score"]) for r in Searcher(spark, d_keys).search(q, k=20).collect()]
        assert a == b
        assert not any(u in set(victims) for u, _ in a)
    # idempotent re-delete; no-match predicate is a no-op commit
    c3 = delete_docs(spark, d_pred, predicate="url LIKE '%7'")
    assert c3["deleted_docs"] == c1["deleted_docs"]
    c4 = delete_docs(spark, d_pred, predicate="url = 'zzz-no-such'")
    assert c4["generation"] == c3["generation"]
