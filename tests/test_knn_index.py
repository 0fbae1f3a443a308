"""Index-integrated KNN vectors (KnnFloatVectorField role): per-segment
HNSW graphs built at flush, deletes as acceptOrds, graph rebuild
through both merge modes."""

import math
import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.ops import hnsw
from lucene_spark.ops.ann import py_sq_norm
from lucene_spark.search.searcher import Searcher

N_DOCS = 120
SEGS = 3
DIM = 16


def _vec_of(i: int) -> list:
    rng = np.random.default_rng(1000 + i)
    return [float(x) for x in rng.normal(size=DIM)]


@pytest.fixture(scope="module")
def corpus():
    rows = make_pages(N_DOCS)
    for i, r in enumerate(rows):
        r["emb"] = _vec_of(i)
    return rows


def _build(spark, corpus, d):
    df = spark.createDataFrame(
        [(r["url"], r["text"], r["emb"]) for r in corpus],
        "url string, text string, emb array<double>",
    )
    build_index(
        spark, df, d,
        IndexConfig(num_segments=SEGS, analyzer=ENGLISH, knn_vector_col="emb"),
    )
    return Searcher(spark, d)


def _brute(searcher, corpus, q, k=10, exclude=()):
    url_vec = {r["url"]: r["emb"] for r in corpus}
    qn = math.sqrt(py_sq_norm(q))
    rows = []
    for r in searcher.docmap.collect():
        if r["url"] in exclude or r["url"] not in url_vec:
            continue
        v = url_vec[r["url"]]
        cos = hnsw.py_dot(v, q) / (math.sqrt(py_sq_norm(v)) * qn)
        rows.append((r["doc_id"], cos, r["url"]))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


def test_knn_exact_at_full_ef(spark, corpus, tmp_path):
    s = _build(spark, corpus, str(tmp_path / "idx"))
    q = _vec_of(3)
    got = s.knn(q, k=10, ef_search=N_DOCS).collect()
    want = _brute(s, corpus, q)
    assert [(r["doc_id"], r["score"], r["url"]) for r in got] == want
    # quantized navigation: same result (re-scored from raw floats)
    gotq = s.knn(q, k=10, ef_search=N_DOCS, quantized=True).collect()
    assert [(r["doc_id"], r["score"], r["url"]) for r in gotq] == want


def test_knn_respects_deletes(spark, corpus, tmp_path):
    from lucene_spark.index.deletes import delete_docs

    d = str(tmp_path / "idx")
    s = _build(spark, corpus, d)
    q = _vec_of(3)
    top = s.knn(q, k=3, ef_search=N_DOCS).collect()
    dead_urls = [r["url"] for r in top]
    delete_docs(spark, d, keys=dead_urls)
    s.refresh()
    got = s.knn(q, k=10, ef_search=N_DOCS).collect()
    want = _brute(s, corpus, q, exclude=set(dead_urls))
    assert [(r["doc_id"], r["score"], r["url"]) for r in got] == want


def test_knn_survives_merges(spark, corpus, tmp_path):
    from lucene_spark.index.deletes import delete_docs
    from lucene_spark.index.merge import force_merge

    d = str(tmp_path / "idx")
    s = _build(spark, corpus, d)
    q = _vec_of(5)
    # concat merge: ids unchanged, graph rebuilt over all docs
    force_merge(spark, d)
    s.refresh()
    assert len(s.live_segments) == 1
    got = s.knn(q, k=10, ef_search=N_DOCS).collect()
    assert [(r["doc_id"], r["score"], r["url"]) for r in got] == _brute(
        s, corpus, q
    )
    # squeeze merge: tombstoned docs drop out of the rebuilt graph
    dead_urls = [r["url"] for r in got[:2]]
    delete_docs(spark, d, keys=dead_urls)
    force_merge(spark, d, squeeze=True)
    s.refresh()
    knn_dirs = os.listdir(os.path.join(d, "knn"))
    live = {f"segment_id={sid}" for sid in s.live_segments}
    assert live <= set(knn_dirs)
    got2 = s.knn(q, k=10, ef_search=N_DOCS).collect()
    want2 = _brute(s, corpus, q, exclude=set(dead_urls))
    assert [(r["score"], r["url"]) for r in got2] == [
        (sc, u) for _, sc, u in want2
    ]
    # CheckIndex knn invariants hold through both merge generations
    from lucene_spark.index.check import check_index

    totals = check_index(spark, d)
    assert totals["knn_nodes"] == N_DOCS - len(dead_urls)


def test_local_searcher_knn_parity(spark, corpus, tmp_path):
    """Serving plane (no Spark job) == Spark plane, incl. deletes."""
    from lucene_spark.index.deletes import delete_docs
    from lucene_spark.search.serve import LocalSearcher

    d = str(tmp_path / "idx")
    s = _build(spark, corpus, d)
    ls = LocalSearcher(d, preload_stats=False)
    q = _vec_of(9)
    want = [
        (r["doc_id"], r["score"], r["url"])
        for r in s.knn(q, k=10, ef_search=N_DOCS).collect()
    ]
    assert ls.knn(q, k=10, ef_search=N_DOCS) == want
    # cached-graph second query + quantized variant
    assert ls.knn(q, k=10, ef_search=N_DOCS) == want
    assert ls.knn(q, k=10, ef_search=N_DOCS, quantized=True) == want
    delete_docs(spark, d, keys=[want[0][2]])
    s.refresh()
    ls.refresh()
    want2 = [
        (r["doc_id"], r["score"], r["url"])
        for r in s.knn(q, k=10, ef_search=N_DOCS).collect()
    ]
    assert want2[0][2] != want[0][2]
    assert ls.knn(q, k=10, ef_search=N_DOCS) == want2


def test_knn_requires_config(spark, corpus, tmp_path):
    d = str(tmp_path / "plain")
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=SEGS, analyzer=ENGLISH))
    s = Searcher(spark, d)
    with pytest.raises(ValueError):
        s.knn(_vec_of(0), k=5)
