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


def test_batch_encoder_matches_scalar():
    """encode_partition (the vectorized invert path) must emit block
    rows BYTE-identical to the per-term encode_term_postings loop."""
    import numpy as np

    from lucene_spark.codec.blocks import encode_partition, encode_term_postings
    from lucene_spark.fixtures import make_pages
    from lucene_spark.util.smallfloat import int_to_byte4_np

    rows = make_pages(300)
    texts = [r["text"] for r in rows]
    doc_idx, codes, uniq, positions, counts = ENGLISH.tokenize_batch_coded(texts)
    norms = int_to_byte4_np(counts)
    order = np.lexsort((positions, doc_idx, codes))
    codes_s = codes[order]
    docs_s = doc_idx[order].astype(np.int64)
    pos_s = positions[order].astype(np.int64)
    p_change = np.concatenate(
        ([True], (codes_s[1:] != codes_s[:-1]) | (docs_s[1:] != docs_s[:-1]))
    )
    p_start = np.flatnonzero(p_change)
    p_codes, p_docs = codes_s[p_start], docs_s[p_start]
    p_tfs = np.diff(np.concatenate((p_start, [codes_s.size])))
    batch = encode_partition(p_codes, p_docs, p_tfs, pos_s, norms, uniq, True)

    term_bounds = np.concatenate(
        ([0], np.flatnonzero(np.diff(codes_s)) + 1, [codes_s.size])
    )
    scalar = []
    for ti in range(uniq.size):
        s, e = term_bounds[ti], term_bounds[ti + 1]
        d, p = docs_s[s:e], pos_s[s:e]
        dc = np.concatenate(([True], d[1:] != d[:-1]))
        doc_ids = d[dc]
        tf = np.diff(np.concatenate((np.flatnonzero(dc), [d.size])))
        rws = encode_term_postings(doc_ids, tf, p, norms, with_positions=True)
        for r in rws:
            r["term"] = str(uniq[ti])
        scalar.extend(rws)
    assert len(batch) == len(scalar)
    for a, b in zip(batch, scalar):
        for k in (
            "term", "block_id", "num_docs", "first_doc", "last_doc",
            "docs_bin", "tfs_bin", "pos_bin",
        ):
            assert a[k] == b[k], (a["term"], k)
        assert list(a["impact_tfs"]) == list(b["impact_tfs"]), a["term"]
        assert list(a["impact_norms"]) == list(b["impact_norms"]), a["term"]


@given(
    st.lists(st.integers(0, 2**31 - 1), min_size=0, max_size=600),
    st.integers(1, 50),
)
def test_pack_many_matches_pack(values, nblocks):
    """Batch FOR packing == scalar pack, any block partition."""
    import numpy as np

    from lucene_spark.codec import forutil

    v = np.asarray(values, dtype=np.uint32)
    cuts = np.linspace(0, v.size, nblocks + 1).astype(np.int64)
    got = forutil.pack_many(v, cuts[:-1], cuts[1:])
    for k in range(nblocks):
        assert got[k] == forutil.pack(v[cuts[k] : cuts[k + 1]])


def test_level1_group_bounds_dominate():
    """Every 32-block group's level-1 bound >= each member block's
    block-max bound (rank-safety of group skipping)."""
    import numpy as np

    from lucene_spark.fixtures import make_pages
    from lucene_spark.search.local import LocalIndex
    from lucene_spark.similarity import bm25

    rows = make_pages(400)
    idx = LocalIndex.build(rows, num_segments=1, analyzer=ENGLISH)
    seg = idx.segments[0]
    scorer = bm25.BM25Scorer.build(1.5, 20.0)
    checked = 0
    for term, tb in list(seg.terms.items())[:200]:
        bm = tb.block_max_scores(scorer)
        _, _, g_ndocs, g_bmax, g_starts, g_ends = tb.level1(scorer)
        assert int(g_ndocs.sum()) == int(tb.num_docs.sum())
        for g in range(g_starts.size):
            assert g_bmax[g] >= bm[g_starts[g] : g_ends[g]].max() - 1e-12
            checked += 1
    assert checked > 0


@given(
    st.lists(
        st.text(alphabet="ab1_'.:,; Z9é", min_size=0, max_size=18),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=300, deadline=None)
def test_ascii_fast_regex_matches_wordrule(texts):
    """The lookaround-shaped ASCII tokenizer regex must match the full
    UAX#29 _WORDRULE grammar token-for-token on ASCII input (the é
    samples exercise the isascii() gate, not the regex)."""
    from lucene_spark.analysis.analyzer import (
        _ASCII_TOKEN_RE,
        _ONLY_UNDERSCORE,
        _TOKEN_RE,
    )

    for s in texts:
        if not s.isascii():
            continue
        full = [
            t for t in _TOKEN_RE.findall(s) if not _ONLY_UNDERSCORE.fullmatch(t)
        ]
        fast = _ASCII_TOKEN_RE.findall(s)
        assert full == fast, s
