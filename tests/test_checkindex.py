"""CheckIndex-analog integrity verification over built, appended, and
merged indexes, plus corruption detection."""

import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.index.check import check_index
from lucene_spark.index.merge import force_merge
from lucene_spark.streaming.nrt import append_batch


@pytest.fixture(scope="module")
def corpus():
    return make_pages(240)


def _df(spark, rows):
    return spark.createDataFrame([(r["url"], r["text"]) for r in rows], ["url", "text"])


def test_check_fresh_and_merged(spark, tmp_path, corpus):
    d = str(tmp_path / "idx")
    build_index(spark, _df(spark, corpus), d, IndexConfig(num_segments=5, analyzer=ENGLISH))
    t1 = check_index(spark, d)
    assert t1["segments"] == 5 and t1["postings"] > 0
    force_merge(spark, d)
    t2 = check_index(spark, d)
    assert t2["segments"] == 1
    # merging preserves the corpus-level invariants
    assert t2["postings"] == t1["postings"]
    assert t2["terms"] <= t1["terms"]  # per-segment term rows collapse


def test_check_after_append(spark, tmp_path, corpus):
    d = str(tmp_path / "idx")
    cfg = IndexConfig(num_segments=2, analyzer=ENGLISH)
    append_batch(spark, _df(spark, corpus[:120]), d, cfg)
    append_batch(spark, _df(spark, corpus[120:]), d, cfg)
    t = check_index(spark, d)
    assert t["segments"] == 4


def test_check_stored_fields(spark, tmp_path, corpus):
    """testStoredFields analog: one stored row per doc covering the
    segment's exact id range, verified through a merge; a dropped
    stored row is detected."""
    import glob
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path / "idx")
    build_index(
        spark, _df(spark, corpus), d,
        IndexConfig(num_segments=3, analyzer=ENGLISH, stored_cols=("text",)),
    )
    t = check_index(spark, d)
    assert t["stored_docs"] == len(corpus)
    force_merge(spark, d)
    t2 = check_index(spark, d)
    assert t2["stored_docs"] == len(corpus)
    # drop one stored row from the LIVE segment (old merged-away dirs
    # remain on disk but are pruned by the live filter) -> violation
    from lucene_spark.index.builder import read_latest_commit

    live = read_latest_commit(d)["segments"][0]["segment_id"]
    path = sorted(glob.glob(f"{d}/stored/segment_id={live}/*.parquet"))[0]
    tbl = pq.read_table(path)
    pq.write_table(tbl.slice(1), path)
    with pytest.raises(Exception):
        check_index(spark, d)


def test_check_detects_corruption(spark, tmp_path, corpus):
    import glob

    import pyarrow.parquet as pq
    import pyarrow as pa

    d = str(tmp_path / "idx")
    build_index(spark, _df(spark, corpus[:80]), d, IndexConfig(num_segments=2, analyzer=ENGLISH))
    # corrupt one segment's term_stats (doc_freq off by one)
    path = sorted(glob.glob(f"{d}/term_stats/segment_id=*/data.parquet"))[0]
    t = pq.read_table(path)
    df_col = t["doc_freq"].to_pylist()
    df_col[0] += 1
    pq.write_table(
        pa.table({"term": t["term"], "doc_freq": pa.array(df_col, pa.int64()),
                  "total_tf": t["total_tf"]}),
        path,
    )
    with pytest.raises(Exception):
        check_index(spark, d)
