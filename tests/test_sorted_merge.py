"""Index sorting through merge (IndexWriterConfig.setIndexSort +
DocIDMerger sorted mode, ``index/DocIDMerger.java:109-158``): a
``sort_by_key=True`` force-merge renumbers the merged live docs in url
order — producing EXACTLY the internal ids, postings, norms and scores
a fresh single-segment build over the surviving docs would, which is
the strongest possible equivalence (the plain squeeze test can only
compare score multisets)."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages, make_queries
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.index.check import check_index
from lucene_spark.index.deletes import delete_docs
from lucene_spark.index.merge import force_merge
from lucene_spark.search.searcher import Searcher

N_DOCS = 240
QUERIES = [q["query"] for q in make_queries()[::5]]


def _df(spark, rows):
    return spark.createDataFrame(
        [(r["url"], r["text"]) for r in rows], ["url", "text"]
    )


@pytest.fixture(scope="module")
def sorted_merged(spark, tmp_path_factory):
    corpus = make_pages(N_DOCS)
    d = str(tmp_path_factory.mktemp("srt_idx"))
    build_index(
        spark, _df(spark, corpus), d, IndexConfig(num_segments=4, analyzer=ENGLISH)
    )
    dead = [r["url"] for r in corpus[::7]]
    delete_docs(spark, d, keys=dead)
    commit = force_merge(spark, d, squeeze=True, sort_by_key=True)
    live = [r for r in corpus if r["url"] not in set(dead)]
    ref = str(tmp_path_factory.mktemp("srt_ref"))
    build_index(
        spark, _df(spark, live), ref, IndexConfig(num_segments=1, analyzer=ENGLISH)
    )
    return spark, d, ref, commit, live


def test_sorted_merge_docmap_is_url_sorted(sorted_merged):
    spark, d, ref, commit, live = sorted_merged
    import os

    import pyspark.sql.functions as F

    assert commit["num_segments"] == 1 and commit["doc_count"] == len(live)
    sid = commit["segments"][0]["segment_id"]
    dm = (
        spark.read.parquet(os.path.join(d, "docmap"))
        .where(F.col("segment_id") == sid)
        .orderBy("doc_id")
        .collect()
    )
    urls = [r["url"] for r in dm]
    assert urls == sorted(urls)
    assert [r["doc_id"] for r in dm] == list(range(len(live)))
    check_index(spark, d)


def test_sorted_merge_equals_fresh_rebuild_exactly(sorted_merged):
    """Same internal doc ids AND float32 scores as a fresh build —
    including tie-break order."""
    spark, d, ref, commit, live = sorted_merged
    a, b = Searcher(spark, d), Searcher(spark, ref)
    for q in QUERIES:
        ra = [(r["doc_id"], np.float32(r["score"]), r["url"]) for r in a.search(q, k=10).collect()]
        rb = [(r["doc_id"], np.float32(r["score"]), r["url"]) for r in b.search(q, k=10).collect()]
        assert ra == rb, (q, ra, rb)
