"""HNSW per-shard graph build + fan-out search (ops/hnsw.py).

Reference parity targets: Lucene's per-segment HNSW
(``Lucene99HnswVectorsFormat.java``, ``HnswGraphBuilder.java``,
``KnnFloatVectorQuery``) — graph per shard, k-sized per-shard merge.
"""

import math
import os

import numpy as np
import pytest

from lucene_spark.ops import hnsw
from lucene_spark.ops.ann import py_sq_norm

SF = "/root/testdata/sf0.001"


def _emb(path=SF):
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(path, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], vecs[order]


def _brute_topk(ids, vecs, q, k):
    """The oracle contract: sequential-fold cosine, (cos desc, vec_id
    asc) rank — ``ann.cosine_topk_sql``'s Python mirror."""
    qn = math.sqrt(py_sq_norm(list(q)))
    rows = []
    for i in range(len(ids)):
        cos = hnsw.py_dot(vecs[i], q) / (
            math.sqrt(py_sq_norm(list(vecs[i]))) * qn
        )
        rows.append((int(ids[i]), cos))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_deterministic_build_and_caps():
    ids, vecs = _emb()
    g1 = hnsw.build_np(ids, vecs, m=8, ef_construction=60)
    g2 = hnsw.build_np(ids, vecs, m=8, ef_construction=60)
    assert g1.entry == g2.entry
    assert np.array_equal(g1.levels, g2.levels)
    for a, b in zip(g1.nbrs, g2.nbrs):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)
    for i, lst in enumerate(g1.nbrs):
        assert len(lst) == g1.levels[i] + 1
        for lc, arr in enumerate(lst):
            assert arr.size <= (16 if lc == 0 else 8)


def test_levels_geometric():
    # hashed levels follow the geometric law: most nodes at level 0,
    # counts decay roughly by 1/M per level
    lv = [hnsw.assign_level(i, 16) for i in range(100_000)]
    lv = np.bincount(lv)
    assert lv[0] / 100_000 > 0.9
    assert lv[1] < lv[0] / 8


def test_exact_at_full_ef():
    """ef >= shard size => the beam covers the whole connected graph
    and the re-scored result IS the brute-force top-k, bitwise."""
    ids, vecs = _emb()
    g = hnsw.build_np(ids, vecs, m=16, ef_construction=100)
    for qidx in (0, 3, 7):
        q = vecs[qidx]
        slots = hnsw.search_np(g, q, ef=len(ids))
        assert slots.size == len(ids)  # connected at this scale
        got = _brute_topk(g.ids[slots], g.vecs[slots], q, 10)
        want = _brute_topk(ids, vecs, q, 10)
        assert got == want


def test_recall_moderate_ef():
    ids, vecs = _emb()
    g = hnsw.build_np(ids, vecs, m=16, ef_construction=100)
    rng = np.random.default_rng(3)
    hits = total = 0
    for _ in range(20):
        q = rng.normal(size=vecs.shape[1])
        true = {v for v, _ in _brute_topk(ids, vecs, q, 10)}
        slots = hnsw.search_np(g, q, ef=64)
        got = {v for v, _ in _brute_topk(g.ids[slots], g.vecs[slots], q, 10)}
        hits += len(true & got)
        total += 10
    assert hits / total >= 0.9


def test_spark_build_search_bitwise(spark, tmp_path):
    """Spark plane: distributed shard build + fan-out search ==
    brute force bitwise at high ef (sf0.001 and the gate's sf0.01)."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        out = str(tmp_path / ("g" + os.path.basename(sf)))
        df = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        hnsw.build_df(spark, df, out, shards=4, m=16, ef_construction=100)
        ids, vecs = _emb(sf)
        q = list(vecs[2])
        got = hnsw.topk_df(spark, out, q, k=10, ef_search=400).collect()
        want = _brute_topk(ids, vecs, np.asarray(q), 10)
        assert [(r.vec_id, r.cos) for r in got] == want


def test_graph_roundtrip(spark, tmp_path):
    """Parquet round-trip reproduces the task-built graph exactly
    (slots are re-derived from vec_ids)."""
    out = str(tmp_path / "g")
    df = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    hnsw.build_df(spark, df, out, shards=2, m=8, ef_construction=60)
    ids, vecs = _emb()
    for sh in (0, 1):
        mask = ids % 2 == sh
        g_ref = hnsw.build_np(ids[mask], vecs[mask], m=8, ef_construction=60)
        g_rt = hnsw._load_graph(os.path.join(out, f"shard={sh}"))
        assert np.array_equal(g_rt.ids, g_ref.ids)
        assert np.array_equal(g_rt.levels, g_ref.levels)
        assert g_rt.entry == g_ref.entry
        for a, b in zip(g_rt.nbrs, g_ref.nbrs):
            for x, y in zip(a, b):
                assert np.array_equal(x, y)


def _emb_labels(path):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(path, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    return (
        ids[order],
        np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[order],
        np.asarray(t["label"].to_pylist(), dtype=np.int64)[order],
    )


def test_filtered_search_np():
    """KnnFloatVectorQuery filter parity: acceptOrds gates results
    only (traversal routes through non-accepted nodes); a filter no
    wider than ef falls back to the exact accepted scan
    (AbstractKnnVectorQuery exact-search fallback)."""
    sf = "/root/testdata/sf0.01"
    ids, vecs, labels = _emb_labels(sf)
    q = vecs[2]
    for lab, ef, exact_path in ((3, 400, True), (9, 64, True)):
        want = _brute_topk(ids[labels == lab], vecs[labels == lab], q, 10)
        merged = []
        for sh in range(4):
            m = ids % 4 == sh
            g = hnsw.build_np(ids[m], vecs[m], m=16, ef_construction=100)
            slots = hnsw.search_np(g, q, ef=ef, allowed=labels[m] == lab)
            merged += _brute_topk(g.ids[slots], g.vecs[slots], q, 10)
        merged.sort(key=lambda r: (-r[1], r[0]))
        assert merged[:10] == want
    # wide filter + full ef: the GRAPH path (accepted > ef per shard)
    # must cover every reachable accepted node -> bitwise again
    want = _brute_topk(ids[labels != 9], vecs[labels != 9], q, 10)
    merged = []
    for sh in range(4):
        m = ids % 4 == sh
        g = hnsw.build_np(ids[m], vecs[m], m=16, ef_construction=100)
        allowed = labels[m] != 9
        slots = hnsw.search_np(g, q, ef=400, allowed=allowed)
        assert int(allowed.sum()) > 64  # really the graph path
        assert slots.size == int(allowed.sum())
        merged += _brute_topk(g.ids[slots], g.vecs[slots], q, 10)
    merged.sort(key=lambda r: (-r[1], r[0]))
    assert merged[:10] == want


def test_filtered_spark_plane(spark, tmp_path):
    """Shard-local accept predicate over ride-along metadata =="""
    sf = "/root/testdata/sf0.01"
    out = str(tmp_path / "gf")
    df = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    hnsw.build_df(
        spark, df, out, shards=4, m=16, ef_construction=100,
        meta_cols=("label",),
    )
    ids, vecs, labels = _emb_labels(sf)
    q = list(vecs[2])
    got = hnsw.topk_df(
        spark, out, q, k=10, ef_search=400, accept=("label", [3])
    ).collect()
    want = _brute_topk(
        ids[labels == 3], vecs[labels == 3], np.asarray(q), 10
    )
    assert [(r.vec_id, r.cos) for r in got] == want
    # unfiltered search over the same meta-carrying index unchanged
    got = hnsw.topk_df(spark, out, q, k=10, ef_search=400).collect()
    want = _brute_topk(ids, vecs, np.asarray(q), 10)
    assert [(r.vec_id, r.cos) for r in got] == want


def test_quantized_navigation():
    """Scalar-quantized navigation (Lucene99ScalarQuantizedVectorsFormat
    role): int8 plane is 1/8 the float64 working set, nav error is
    small, full-ef coverage stays exact (re-score reads raw floats),
    and moderate-ef recall holds."""
    sf = "/root/testdata/sf0.01"
    ids, vecs = _emb(sf)
    q = vecs[2]
    want = _brute_topk(ids, vecs, q, 10)
    merged, hits = [], 0
    for sh in range(4):
        m = ids % 4 == sh
        g = hnsw.build_np(ids[m], vecs[m], m=16, ef_construction=100)
        g.quantize()
        assert g.qvecs.dtype == np.uint8
        assert g.qvecs.nbytes * 8 == g.unit.nbytes
        qn = q / math.sqrt(float(q @ q))
        err = np.abs(
            g.nav_dots(np.arange(len(g.ids)), g.nav_prep(qn))
            - g.unit @ qn
        ).max()
        assert err < 0.05
        slots = hnsw.search_np(g, q, ef=400)
        assert slots.size == int(m.sum())  # coverage unaffected
        merged += _brute_topk(g.ids[slots], g.vecs[slots], q, 10)
        s32 = hnsw.search_np(g, q, ef=32)
        hits += len(
            {v for v, _ in _brute_topk(g.ids[s32], g.vecs[s32], q, 10)}
            & {v for v, _ in want}
        )
    merged.sort(key=lambda r: (-r[1], r[0]))
    assert merged[:10] == want  # re-scored from floats -> bitwise
    assert hits / 10 >= 0.9


def test_quantized_spark_plane(spark, tmp_path):
    sf = "/root/testdata/sf0.01"
    out = str(tmp_path / "gq")
    df = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    hnsw.build_df(spark, df, out, shards=4, m=16, ef_construction=100)
    ids, vecs = _emb(sf)
    q = list(vecs[2])
    got = hnsw.topk_df(
        spark, out, q, k=10, ef_search=400, quantized=True
    ).collect()
    want = _brute_topk(ids, vecs, np.asarray(q), 10)
    assert [(r.vec_id, r.cos) for r in got] == want


def test_batched_matches_sequential(spark, tmp_path):
    """topk_many_df (one per-shard stage for the whole query set) is
    row-identical to per-query topk_df."""
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "gb")
    df = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    hnsw.build_df(spark, df, out, shards=4, m=16, ef_construction=100)
    ids, vecs = _emb(sf)
    qs = {"a": list(vecs[0]), "b": list(vecs[5]), "c": list(vecs[9])}
    batched = hnsw.topk_many_df(spark, out, qs, k=10, ef_search=64).collect()
    for qid, q in qs.items():
        seq = hnsw.topk_df(spark, out, q, k=10, ef_search=64).collect()
        got = [(r.vec_id, r.cos) for r in batched if r.query_id == qid]
        assert got == [(r.vec_id, r.cos) for r in seq]


def test_empty_and_single(spark, tmp_path):
    g = hnsw.build_np(np.asarray([42]), np.ones((1, 4)))
    assert hnsw.search_np(g, np.ones(4), ef=10).tolist() == [0]
    g0 = hnsw.Graph(np.empty(0, dtype=np.int64), np.empty((0, 4)))
    assert hnsw.search_np(g0, np.ones(4), ef=10).size == 0
