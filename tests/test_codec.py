"""Codec round-trip property tests — style of the reference's
TestForUtil / TestPForUtil (random widths, outliers, all-equal blocks)."""

import numpy as np

from lucene_spark.codec import blocks, forutil, pforutil
from lucene_spark.util.smallfloat import int_to_byte4_np


def test_for_round_trip_random_widths():
    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(1, 513))
        w = int(rng.integers(1, 33))
        v = rng.integers(0, 2**w, n, dtype=np.uint64).astype(np.uint32)
        assert (forutil.unpack(forutil.pack(v)) == v).all()


def test_for_all_equal_and_empty():
    assert forutil.unpack(forutil.pack(np.array([], dtype=np.uint32))).size == 0
    v = np.full(256, 77, dtype=np.uint32)
    packed = forutil.pack(v)
    assert len(packed) == 9  # width-0 escape: 1 + 4 + 4 bytes
    assert (forutil.unpack(packed) == v).all()


def test_pfor_round_trip_with_outliers():
    rng = np.random.default_rng(11)
    for _ in range(100):
        n = int(rng.integers(2, 300))
        v = rng.integers(0, 16, n, dtype=np.uint64).astype(np.uint32)
        n_exc = int(rng.integers(0, 8))
        idx = rng.choice(n, size=min(n_exc, n), replace=False)
        v[idx] = rng.integers(0, 2**31, idx.size, dtype=np.uint64).astype(np.uint32)
        assert (pforutil.unpack(pforutil.pack(v)) == v).all()


def test_pfor_patching_saves_space():
    v = np.ones(256, dtype=np.uint32)
    v[100] = 2**20  # single outlier
    patched = pforutil.pack(v)
    plain = forutil.pack(v)
    assert len(patched) < len(plain)


def test_block_encode_decode_round_trip():
    rng = np.random.default_rng(3)
    norms = int_to_byte4_np(rng.integers(1, 5000, 10000))
    for _ in range(25):
        nd = int(rng.integers(1, 900))
        docs = np.unique(rng.integers(0, 10000, nd)).astype(np.int64)
        tfs = rng.integers(1, 30, docs.size).astype(np.int64)
        pos = np.concatenate(
            [np.sort(rng.choice(5000, size=t, replace=False)) for t in tfs]
        ).astype(np.int64)
        rows = blocks.encode_term_postings(docs, tfs, pos, norms)
        assert rows[0]["first_doc"] == docs[0]
        assert rows[-1]["last_doc"] == docs[-1]
        dd, tt, pp = [], [], []
        for r in rows:
            d = blocks.decode_docs(r["first_doc"], r["docs_bin"])
            t = blocks.decode_tfs(r["tfs_bin"])
            pp.append(blocks.decode_positions(r["pos_bin"], t))
            assert r["num_docs"] == d.size == t.size
            assert r["last_doc"] == d[-1]
            dd.append(d)
            tt.append(t)
        assert (np.concatenate(dd) == docs).all()
        assert (np.concatenate(tt) == tfs).all()
        assert (np.concatenate(pp) == pos).all()


def test_impacts_are_pareto_and_sound():
    """block_max via impacts must upper-bound every true doc score
    (the rank-safety property behind WAND — FIXTURES.md §5)."""
    from lucene_spark.similarity.bm25 import BM25Scorer, idf

    rng = np.random.default_rng(5)
    norms_all = int_to_byte4_np(rng.integers(1, 3000, 5000))
    docs = np.unique(rng.integers(0, 5000, 400)).astype(np.int64)
    tfs = rng.integers(1, 50, docs.size).astype(np.int64)
    pos = np.concatenate([np.arange(t) for t in tfs]).astype(np.int64)
    rows = blocks.encode_term_postings(docs, tfs, pos, norms_all)
    sc = BM25Scorer.build(idf(docs.size, 5000), 300.0)
    for r in rows:
        d = blocks.decode_docs(r["first_doc"], r["docs_bin"])
        t = blocks.decode_tfs(r["tfs_bin"])
        true_scores = sc.score(t, norms_all[d])
        bound = max(
            float(sc.score(np.array([tf]), np.array([nb]))[0])
            for tf, nb in zip(r["impact_tfs"], r["impact_norms"])
        )
        assert (true_scores <= bound + 0).all()


def test_dense_block_round_trip_and_engagement():
    """Blocks denser than their FOR encoding switch to the bit-set doc
    encoding (Lucene104PostingsWriter.java:444-460 analog): round-trips
    exactly, beats FOR on size, and the batch encoder emits identical
    bytes to the scalar path."""
    import numpy as np

    from lucene_spark.codec import blocks as blk

    rng = np.random.default_rng(7)
    norms = np.full(4096, 124, dtype=np.uint8)
    # ~60% density: bitset wins over 2-bit FOR deltas
    docs = np.sort(rng.choice(700, size=420, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 4, size=docs.size).astype(np.int64)
    rows = blk.encode_term_postings(docs, tfs, np.empty(0, np.int64), norms, with_positions=False)
    assert any(r["docs_bin"][0] == blk.DENSE_MARKER for r in rows)
    got = np.concatenate(
        [blk.decode_docs(r["first_doc"], r["docs_bin"]) for r in rows]
    )
    np.testing.assert_array_equal(got, docs)
    # sparse lists stay FOR-packed
    sparse = np.sort(rng.choice(100000, size=300, replace=False)).astype(np.int64)
    srows = blk.encode_term_postings(sparse, tfs[:300], np.empty(0, np.int64), norms[:1].repeat(100000), with_positions=False)
    assert all(r["docs_bin"][0] != blk.DENSE_MARKER for r in srows)
    # batch == scalar bytes, mixed dense + sparse terms
    p_codes = np.concatenate((np.zeros(docs.size, np.int64), np.ones(sparse.size, np.int64)))
    p_docs = np.concatenate((docs, sparse % 4096))
    # re-sort the sparse term's docs (mod may break order)
    s2 = np.sort(np.unique(sparse % 4096))
    p_codes = np.concatenate((np.zeros(docs.size, np.int64), np.ones(s2.size, np.int64)))
    p_docs = np.concatenate((docs, s2))
    p_tfs = np.concatenate((tfs, np.ones(s2.size, np.int64)))
    brows = blk.encode_partition(
        p_codes, p_docs, p_tfs, np.empty(0, np.int64), norms,
        np.array(["t0", "t1"], object), with_positions=False,
    )
    scalar = blk.encode_term_postings(docs, tfs, np.empty(0, np.int64), norms, with_positions=False)
    scalar += blk.encode_term_postings(s2, np.ones(s2.size, np.int64), np.empty(0, np.int64), norms, with_positions=False)
    assert len(brows) == len(scalar)
    for b, s in zip(brows, scalar):
        assert b["docs_bin"] == s["docs_bin"]
        assert b["tfs_bin"] == s["tfs_bin"]
