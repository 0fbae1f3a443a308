"""Property-based randomized tests (hypothesis) — the adoption of the
reference's randomized test framework (``RandomPostingsTester``,
``BaseSimilarityTestCase``, ``BaseTokenStreamTestCase``; SURVEY.md §5):

- codec round-trip over random posting lists,
- impact bounds dominate every true block score,
- BM25 similarity axioms (finite, non-negative, monotone in tf,
  anti-monotone in doc length),
- batch tokenizer == reference per-doc tokenizer on random text.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_spark.analysis.analyzer import ENGLISH, STANDARD
from lucene_spark.codec import blocks as blk
from lucene_spark.similarity import bm25
from lucene_spark.util.smallfloat import int_to_byte4_np

settings.register_profile("ci", max_examples=60, deadline=None)
settings.load_profile("ci")


posting_lists = st.lists(
    st.tuples(st.integers(0, 5000), st.integers(1, 40)), min_size=1, max_size=600
).map(lambda pairs: sorted({d: t for d, t in pairs}.items()))


@given(posting_lists, st.booleans())
def test_codec_roundtrip(pairs, with_pos):
    docs = np.array([d for d, _ in pairs], dtype=np.int64)
    tfs = np.array([t for _, t in pairs], dtype=np.int64)
    rng = np.random.default_rng(docs.sum() % (2**32))
    pos_flat = np.sort(
        rng.choice(np.arange(100000), size=int(tfs.sum()), replace=False)
    )
    # per-posting positions must be sorted within each posting
    bounds = np.concatenate(([0], np.cumsum(tfs)))
    norms = int_to_byte4_np(rng.integers(1, 3000, size=5001))
    rows = blk.encode_term_postings(docs, tfs, pos_flat, norms, with_positions=with_pos)
    got_docs, got_tfs, got_pos = [], [], []
    for r in rows:
        d = blk.decode_docs(r["first_doc"], r["docs_bin"])
        t = blk.decode_tfs(r["tfs_bin"])
        got_docs.append(d)
        got_tfs.append(t)
        if with_pos:
            got_pos.append(blk.decode_positions(r["pos_bin"], t))
    assert np.array_equal(np.concatenate(got_docs), docs)
    assert np.array_equal(np.concatenate(got_tfs), tfs)
    if with_pos:
        assert np.array_equal(np.concatenate(got_pos), pos_flat)


@given(posting_lists)
def test_impact_bounds_dominate(pairs):
    docs = np.array([d for d, _ in pairs], dtype=np.int64)
    tfs = np.array([t for _, t in pairs], dtype=np.int64)
    rng = np.random.default_rng(int(tfs.sum()) % (2**32))
    norms = int_to_byte4_np(rng.integers(1, 3000, size=5001))
    pos_flat = np.arange(int(tfs.sum()))
    rows = blk.encode_term_postings(docs, tfs, pos_flat, norms)
    scorer = bm25.BM25Scorer.build(2.37, 118.4)
    for r in rows:
        d = blk.decode_docs(r["first_doc"], r["docs_bin"])
        t = blk.decode_tfs(r["tfs_bin"])
        true_max = float(scorer.score(t, norms[d]).max())
        bound = float(
            scorer.score(
                np.asarray(r["impact_tfs"], dtype=np.int64),
                np.asarray(r["impact_norms"], dtype=np.uint8),
            ).max()
        )
        assert bound >= true_max


@given(
    st.integers(1, 10**6),
    st.integers(1, 10**6),
    st.integers(1, 255),
    st.integers(1, 1000),
)
def test_bm25_axioms(doc_count, sum_tf, norm_byte, freq):
    doc_freq = max(1, doc_count // 3)
    sc = bm25.BM25Scorer.build(
        bm25.idf(doc_freq, doc_count), bm25.avgdl(sum_tf, doc_count)
    )
    s = float(sc.score(np.array([freq]), np.array([norm_byte]))[0])
    assert np.isfinite(s) and s >= 0.0
    s2 = float(sc.score(np.array([freq + 1]), np.array([norm_byte]))[0])
    assert s2 >= s  # monotone in freq
    # anti-monotone in doc length: a longer (higher-decode) norm never
    # scores higher at equal tf
    from lucene_spark.util.smallfloat import LENGTH_TABLE

    longer = [b for b in range(256) if LENGTH_TABLE[b] > LENGTH_TABLE[norm_byte]]
    if longer:
        s3 = float(sc.score(np.array([freq]), np.array([longer[0]]))[0])
        assert s3 <= s


text_alphabet = st.sampled_from(
    list("abcdefghij XYZ0123 .,'!?\n_-") + ["the ", "of ", "don't ", "x" * 300 + " "]
)


@given(st.lists(st.lists(text_alphabet, max_size=40).map("".join), max_size=8))
def test_batch_tokenizer_matches_reference(texts):
    for an in (ENGLISH, STANDARD):
        doc_idx, terms, positions, counts = an.tokenize_batch(texts)
        for d, text in enumerate(texts):
            want_t, want_p = an.tokenize_one(text)
            sel = doc_idx == d
            assert list(terms[sel]) == want_t, (text,)
            assert list(positions[sel]) == want_p
            assert counts[d] == len(want_t)
