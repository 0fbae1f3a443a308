"""NRT / streaming indexing: micro-batch appends build the same index
(same answers) as one bulk build; a real Structured Streaming file
source drives foreachBatch; Searcher.refresh picks up new generations."""

import os

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages, make_queries
from lucene_spark.index.builder import IndexConfig, build_index, read_latest_commit
from lucene_spark.search.searcher import Searcher
from lucene_spark.streaming.nrt import append_batch, index_stream

N_DOCS = 300
QUERIES = [q["query"] for q in make_queries()[::8]]


def _snapshot(spark, index_dir, queries=QUERIES):
    s = Searcher(spark, index_dir)
    out = {}
    for q in queries:
        rows = s.search(q, k=10).collect()
        out[q] = [(r["doc_id"], np.float32(r["score"]), r["url"]) for r in rows]
    return out


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS)


def _df(spark, rows):
    return spark.createDataFrame([(r["url"], r["text"]) for r in rows], ["url", "text"])


def test_incremental_append_matches_bulk(spark, tmp_path_factory, corpus):
    """Appending in 3 batches answers every query identically to one
    bulk build over the same docs in the same order (identical doc-id
    assignment => identical scores and tie-breaks)."""
    bulk_dir = str(tmp_path_factory.mktemp("bulk"))
    inc_dir = str(tmp_path_factory.mktemp("inc"))
    cfg = IndexConfig(num_segments=2, analyzer=ENGLISH)

    # bulk: 3 contiguous batches' docs, each batch hashed over 2 segments.
    # incremental must match => bulk is built batch-wise too (generation
    # ordering is part of the id assignment contract).
    thirds = [corpus[:100], corpus[100:200], corpus[200:]]
    for part in thirds:
        append_batch(spark, _df(spark, part), bulk_dir, cfg)
    for part in thirds:
        append_batch(spark, _df(spark, part), inc_dir, cfg)

    assert _snapshot(spark, bulk_dir) == _snapshot(spark, inc_dir)
    commit = read_latest_commit(inc_dir)
    assert commit["doc_count"] == N_DOCS
    assert commit["num_segments"] == 6
    assert commit["generation"] == 3


def test_append_then_refresh(spark, tmp_path_factory, corpus):
    d = str(tmp_path_factory.mktemp("nrt"))
    cfg = IndexConfig(num_segments=2, analyzer=ENGLISH)
    append_batch(spark, _df(spark, corpus[:150]), d, cfg)
    s = Searcher(spark, d)
    n1 = s.count(QUERIES[0])
    assert not s.refresh()  # same generation
    append_batch(spark, _df(spark, corpus[150:]), d, cfg)
    assert s.refresh()
    n2 = s.count(QUERIES[0])
    assert s.commit["doc_count"] == N_DOCS
    assert n2 >= n1


def test_structured_streaming_file_source(spark, tmp_path_factory, corpus):
    """Real readStream->foreachBatch: drop parquet files into a source
    dir, run with availableNow, verify the committed index answers like
    a batch build over the same rows."""
    src = str(tmp_path_factory.mktemp("stream_src"))
    d = str(tmp_path_factory.mktemp("stream_idx"))
    ref = str(tmp_path_factory.mktemp("stream_ref"))
    cfg = IndexConfig(num_segments=2, analyzer=ENGLISH)

    half = [corpus[:150], corpus[150:]]
    for i, part in enumerate(half):
        _df(spark, part).coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = index_stream(spark, stream, d, cfg, trigger={"availableNow": True})
    q.awaitTermination(300)

    commit = read_latest_commit(d)
    assert commit["doc_count"] == N_DOCS

    # reference: batch-wise build in stream order over the same rows.
    # File-source batch ordering is deterministic with maxFilesPerTrigger=1
    # (lexicographic path order) => identical ids => identical answers.
    for part in half:
        append_batch(spark, _df(spark, part), ref, cfg)
    assert _snapshot(spark, d) == _snapshot(spark, ref)
