"""Sloppy phrase semantics: hand-traced SloppyPhraseMatcher cases,
slop monotonicity, parser syntax, and engine-vs-oracle rank identity."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import ast
from lucene_spark.search.parser import parse
from lucene_spark.search.searcher import Searcher
from lucene_spark.search.sloppy import sloppy_freq


def f(pos_lists, offsets, slop):
    return sloppy_freq([np.array(p) for p in pos_lists], offsets, slop)


def test_hand_traced_cases():
    # adjacent pair: matchLength 0 -> weight 1
    assert f([[0], [1]], (0, 1), 0) == 1.0
    # one-gap: matchLength 1; no match at slop 0, 1/2 at slop >= 1
    assert f([[0], [2]], (0, 1), 0) == 0.0
    assert f([[0], [2]], (0, 1), 1) == 0.5
    # transposition ("a b" matching text "b a"): matchLength 2
    assert f([[1], [0]], (0, 1), 1) == 0.0
    assert f([[1], [0]], (0, 1), 2) == pytest.approx(1.0 / 3.0, abs=1e-7)
    # greedy minimization picks the adjacent occurrence of the lead term
    assert f([[0, 10], [11]], (0, 1), 0) == 1.0
    # two independent adjacent matches accumulate (float32 sum)
    got = f([[0, 100], [1, 101]], (0, 1), 0)
    assert got == float(np.float32(np.float32(1.0) + np.float32(1.0)))
    # stopword-hole phrase (offsets 0,2) at exact distance
    assert f([[5], [7]], (0, 2), 0) == 1.0


def test_slop_match_set_monotone():
    rng = np.random.default_rng(3)
    for _ in range(200):
        p1 = np.unique(rng.integers(0, 30, size=rng.integers(1, 5)))
        p2 = np.unique(rng.integers(0, 30, size=rng.integers(1, 5)))
        prev_matched = False
        prev_freq = 0.0
        for slop in range(0, 8):
            freq = f([p1, p2], (0, 1), slop)
            matched = freq > 0
            assert matched or not prev_matched  # match set grows with slop
            prev_matched = matched or prev_matched
        # huge slop always matches (both terms present)
        assert f([p1, p2], (0, 1), 100) > 0


def fr(pos_lists, offsets, slop, groups):
    from lucene_spark.search.sloppy import sloppy_freq_repeats

    return sloppy_freq_repeats(
        [np.array(p) for p in pos_lists], offsets, slop, groups
    )


def _brute_injective_match(pos_lists, offsets, groups, slop):
    """Exists an INJECTIVE (per repeat group) selection of one raw
    position per slot with window <= slop?"""
    import itertools

    group_of = {}
    for gi, g in enumerate(groups or []):
        for i in g:
            group_of[i] = gi
    for sel in itertools.product(*[list(p) for p in pos_lists]):
        ok = True
        for gi, g in enumerate(groups or []):
            picks = [sel[i] for i in g]
            if len(set(picks)) != len(picks):
                ok = False
                break
        if not ok:
            continue
        shifted = [s - o for s, o in zip(sel, offsets)]
        if max(shifted) - min(shifted) <= slop:
            return True
    return False


def test_repeated_terms_supported():
    """Repeat groups (SloppyPhraseMatcher repeat machinery): the same
    term at two slots must match two DIFFERENT document positions."""
    q = parse('"w0000 w0000"~2', ENGLISH)
    assert isinstance(q, ast.PhraseQuery) and q.slop == 2
    g = [[0, 1]]
    # doc has only ONE occurrence -> injective matching impossible
    assert fr([[5], [5]], (0, 1), 5, g) == 0.0
    # two adjacent occurrences -> exact repeat phrase matches
    assert fr([[5, 6], [5, 6]], (0, 1), 0, g) == 1.0
    # "a x a": positions 0,2 -> matchLength 1 under offsets (0,1)
    assert fr([[0, 2], [0, 2]], (0, 1), 0, g) == 0.0
    assert fr([[0, 2], [0, 2]], (0, 1), 1, g) == 0.5


def test_repeat_match_set_equals_brute_force():
    rng = np.random.default_rng(7)
    groups = [[0, 2]]  # slots 0 and 2 share a term ("a b a")
    for _ in range(300):
        pa = np.unique(rng.integers(0, 12, size=rng.integers(1, 5)))
        pb = np.unique(rng.integers(0, 12, size=rng.integers(1, 5)))
        pls = [pa, pb, pa]
        offs = (0, 1, 2)
        for slop in (0, 1, 2, 4):
            got = fr(pls, offs, slop, groups) > 0
            want = _brute_injective_match(pls, offs, groups, slop)
            assert got == want, (list(pa), list(pb), slop)


def test_repeat_match_set_triple_and_two_groups():
    rng = np.random.default_rng(11)
    for _ in range(200):
        pa = np.unique(rng.integers(0, 14, size=rng.integers(1, 6)))
        pb = np.unique(rng.integers(0, 14, size=rng.integers(1, 6)))
        # "a a a": one group of three slots
        pls3, offs3, g3 = [pa, pa, pa], (0, 1, 2), [[0, 1, 2]]
        # "a b a b": two interleaved groups
        pls4, offs4 = [pa, pb, pa, pb], (0, 1, 2, 3)
        g4 = [[0, 2], [1, 3]]
        for slop in (0, 1, 3):
            got3 = fr(pls3, offs3, slop, g3) > 0
            assert got3 == _brute_injective_match(pls3, offs3, g3, slop), (
                list(pa),
                slop,
            )
            got4 = fr(pls4, offs4, slop, g4) > 0
            assert got4 == _brute_injective_match(pls4, offs4, g4, slop), (
                list(pa),
                list(pb),
                slop,
            )


def test_repeat_freq_hand_traced():
    """Faithful-port freq magnitudes, hand-traced through the reference
    nextMatch/advanceRpts control flow (SloppyPhraseMatcher.java):

    doc "a a b a", query "a b a"~3 (a@{0,1,3}, b@{2}): per-doc init
    places slot0@0/slot2@1(rank-1 advance); first nextMatch pops slot2
    (shifted -1), advances past the top and emits matchLength=2; the
    second pops slot0, shrinks to matchLength=0, then slot0's advance
    to raw 3 collides with slot2 whose advance exhausts -> emit
    matchLength=0. freq = 1/3 + 1 (float32). The pre-port greedy
    re-derivation produced 1/3 + 1/2 + 1 here."""
    one = np.float32(1.0)
    want = float(np.float32(one / np.float32(3.0) + one))
    assert fr([[0, 1, 3], [2], [0, 1, 3]], (0, 1, 2), 3, [[0, 2]]) == want
    # doc "a b a": exactly one match, exhaustion during collision
    assert fr([[0, 2], [1], [0, 2]], (0, 1, 2), 2, [[0, 2]]) == 1.0
    # doc "a x x a b", query "a b a"~4: single match at matchLength 3
    got = fr([[0, 3], [4], [0, 3]], (0, 1, 2), 4, [[0, 2]])
    assert got == float(one / (one + np.float32(3.0)))
    assert fr([[0, 3], [4], [0, 3]], (0, 1, 2), 2, [[0, 2]]) == 0.0


def test_repeat_phrase_engine_matches_oracle(pair):
    searcher, oracle = pair
    for query in ('"w0000 w0000"~3', '"w0000 w0001 w0000"~2'):
        q = parse(query, ENGLISH)
        expected = oracle.top_k(q, k=10)
        got = searcher.search(query, k=10).collect()
        assert len(got) == len(expected), query
        for row, (ed, es, eu) in zip(got, expected):
            assert row["doc_id"] == ed and row["url"] == eu
            assert np.float32(row["score"]) == np.float32(es), query


def test_parser_slop_syntax():
    q = parse('"w0007 w0042"~2', ENGLISH)
    assert isinstance(q, ast.PhraseQuery) and q.slop == 2
    q2 = parse('"w0100 of w0200"~1^2.5', ENGLISH)
    assert isinstance(q2, ast.BoostQuery) and q2.query.slop == 1


@pytest.fixture(scope="module")
def pair(tmp_path_factory, spark):
    corpus = make_pages(250)
    d = str(tmp_path_factory.mktemp("sloppy_idx"))
    df = spark.createDataFrame([(r["url"], r["text"]) for r in corpus], ["url", "text"])
    build_index(spark, df, d, IndexConfig(num_segments=3, analyzer=ENGLISH))
    return Searcher(spark, d), OracleIndex.build(corpus, num_segments=3, analyzer=ENGLISH)


@pytest.mark.parametrize(
    "query",
    ['"w0007 w0042"~1', '"w0042 w0007"~2', '"w0100 of w0200"~2', '"w0000 w0001"~3'],
)
def test_sloppy_rank_identity(pair, query):
    searcher, oracle = pair
    expected = oracle.top_k(parse(query, ENGLISH), k=10)
    got = searcher.search(query, k=10).collect()
    assert len(got) == len(expected), query
    for row, (ed, es, eu) in zip(got, expected):
        assert row["doc_id"] == ed and row["url"] == eu
        assert np.float32(row["score"]) == np.float32(es), query
    # sloppy must match at least as many docs as exact
    n_sloppy = searcher.count(query)
    n_exact = searcher.count(query.rsplit("~", 1)[0])
    assert n_sloppy >= n_exact


# --------------------------- sloppy MultiPhraseQuery (union postings)


def _brute_union_sloppy_match(slot_pos_lists, offsets, slop):
    """Exists one position per SLOT (from its union list) with
    max(shifted) - min(shifted) <= slop?"""
    import itertools

    for sel in itertools.product(*[list(p) for p in slot_pos_lists]):
        shifted = [s - o for s, o in zip(sel, offsets)]
        if max(shifted) - min(shifted) <= slop:
            return True
    return False


def test_multi_phrase_sloppy_hand_traced():
    from lucene_spark.search.sloppy import sloppy_freq

    # doc "a c b", slots ((a|b), c) rels (0,1): slot0 union {0,2},
    # slot1 {1}; exact (a then c) matches once
    assert sloppy_freq([np.array([0, 2]), np.array([1])], (0, 1), 0) == 1.0


def test_multi_phrase_sloppy_engine_matches_oracle():
    from lucene_spark.search.local import LocalIndex
    from lucene_spark.oracle import OracleIndex as OI

    corpus = make_pages(300)
    engine = LocalIndex.build(corpus, num_segments=3, analyzer=ENGLISH)
    oracle = OI.build(corpus, num_segments=3, analyzer=ENGLISH)
    shapes = [
        ast.MultiPhraseQuery(
            slots=(("w0007", "w0042"), ("w0000", "w0001")),
            positions=(0, 1),
            slop=2,
        ),
        ast.MultiPhraseQuery(
            slots=(("w0000",), ("w0011", "w0005")), positions=(0, 1), slop=4
        ),
        ast.MultiPhraseQuery(
            slots=(("w0002", "w0003"), ("w0004",), ("w0001",)),
            positions=(0, 1, 2),
            slop=3,
        ),
    ]
    for q in shapes:
        expected = oracle.top_k(q, k=300)  # full match set
        got = engine.search(q, k=300)
        assert len(got) == len(expected), q
        for (gd, gs, gu), (ed, es, eu) in zip(got, expected):
            assert gd == ed and gu == eu, q
            assert np.float32(gs) == np.float32(es), q
        # sloppy must match at least as many docs as exact
        exact = ast.MultiPhraseQuery(
            slots=q.slots, positions=q.positions, slop=0
        )
        assert engine.count(q) >= engine.count(exact), q


def test_multi_phrase_sloppy_match_set_vs_brute():
    """Kernel-level match set == brute-force union selection, via the
    oracle's per-doc union lists on random synthetic positions."""
    from lucene_spark.search.sloppy import sloppy_freq

    rng = np.random.default_rng(5)
    for _ in range(200):
        s0 = np.unique(rng.integers(0, 15, size=rng.integers(1, 6)))
        s1 = np.unique(rng.integers(0, 15, size=rng.integers(1, 6)))
        for slop in (0, 1, 3):
            got = sloppy_freq([s0, s1], (0, 1), slop) > 0
            want = _brute_union_sloppy_match([s0, s1], (0, 1), slop)
            assert got == want, (list(s0), list(s1), slop)


def test_multi_phrase_sloppy_spark_plane(pair):
    searcher, oracle = pair
    q = ast.MultiPhraseQuery(
        slots=(("w0007", "w0042"), ("w0000", "w0001")),
        positions=(0, 1),
        slop=3,
    )
    expected = oracle.top_k(q, k=10)
    got = searcher.search(q, k=10).collect()
    assert len(got) == len(expected)
    for row, (ed, es, eu) in zip(got, expected):
        assert row["doc_id"] == ed and row["url"] == eu
        assert np.float32(row["score"]) == np.float32(es)


def test_multi_phrase_sloppy_shared_terms_supported():
    # hasMultiTermRpts shapes (previously rejected) now run the repeat
    # machinery end-to-end; count agrees with the exhaustive search
    from lucene_spark.search.local import LocalIndex

    corpus = make_pages(50)
    engine = LocalIndex.build(corpus, num_segments=1, analyzer=ENGLISH)
    q = ast.MultiPhraseQuery(
        slots=(("w0000", "w0001"), ("w0001",)), positions=(0, 1), slop=2
    )
    assert ast.rewrite(q) == q
    hits = engine.search(q, k=1000, pruned=False)
    assert engine.count(q) == len(hits) > 0


def test_degenerate_phrase_shapes_rewrite():
    """PhraseQuery.rewrite / MultiPhraseQuery.rewrite analogs: one term
    -> TermQuery; one slot -> SHOULD boolean; empty -> MatchNoDocs —
    the sloppy matcher then never sees < 2 position lists (was an
    IndexError on single-slot sloppy multi-phrase)."""
    from lucene_spark.search.local import LocalIndex

    assert ast.rewrite(
        ast.PhraseQuery(terms=("w0000",), positions=(0,), slop=3)
    ) == ast.TermQuery("w0000")
    assert isinstance(
        ast.rewrite(ast.PhraseQuery(terms=(), positions=())),
        ast.MatchNoDocsQuery,
    )
    got = ast.rewrite(
        ast.MultiPhraseQuery(
            slots=(("w0000", "w0001"),), positions=(0,), slop=1
        )
    )
    assert got == ast.BooleanQuery(
        should=(ast.TermQuery("w0000"), ast.TermQuery("w0001")),
        min_should_match=1,
    )
    assert isinstance(
        ast.rewrite(ast.MultiPhraseQuery(slots=(), positions=())),
        ast.MatchNoDocsQuery,
    )
    # end-to-end: a single-slot sloppy multi-phrase searches fine now
    corpus = make_pages(60)
    engine = LocalIndex.build(corpus, num_segments=2, analyzer=ENGLISH)
    q = ast.MultiPhraseQuery(
        slots=(("w0000", "w0001"),), positions=(0,), slop=2
    )
    assert engine.count(q) > 0
    assert engine.search(q, k=5)


@pytest.mark.parametrize(
    "query",
    [
        '"w0000 w0001"~2',
        '"w0007 w0042"~4',
        '"w0100 of w0200"~3',
        '"w0000 w0000"~3',
        '"w0000 w0001 w0000"~2',
    ],
)
def test_prefilter_full_match_set(pair, query):
    """The vectorized sloppy pre-filter (kernels._sloppy_prefilter) is a
    necessary-condition screen; k >= corpus size makes top_k the FULL
    match set, so any true match the filter dropped would show up here
    as a missing row (rank-only checks could hide low-scoring drops)."""
    searcher, oracle = pair
    expected = oracle.top_k(parse(query, ENGLISH), k=400)
    got = searcher.search(query, k=400).collect()
    assert len(got) == len(expected), query
    for row, (ed, es, eu) in zip(got, expected):
        assert row["doc_id"] == ed and row["url"] == eu
        assert np.float32(row["score"]) == np.float32(es), query


def test_sloppy_freq_2_matches_generic_hypothesis():
    """The 2-term specialization must equal the generic greedy BITWISE
    on random position lists (same candidate sequence, same f32
    accumulation order)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_spark.search.sloppy import sloppy_freq, sloppy_freq_2

    poslist = st.lists(
        st.integers(0, 40), min_size=1, max_size=10, unique=True
    ).map(sorted)

    @settings(max_examples=500, deadline=None)
    @given(
        a=poslist, b=poslist,
        offs=st.sampled_from([(0, 1), (0, 2), (1, 0), (2, 5), (3, 1)]),
        slop=st.integers(0, 8),
    )
    def run(a, b, offs, slop):
        pa, pb = np.asarray(a, np.int64), np.asarray(b, np.int64)
        want = sloppy_freq([pa, pb], offs, slop)
        got = sloppy_freq_2(pa, pb, offs[0], offs[1], slop)
        assert got == want, (a, b, offs, slop, got, want)

    run()
