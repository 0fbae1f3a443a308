"""Tree-sweep vectorization of nested interval combinators (round-5
VERDICT item #3 — the round-4 "remaining slow shape").

``intervals.tree_shape`` compiles combinator TREES of Ordered/Unordered
(each optionally MaxGaps-wrapped) over Term / disjoint Or-of-Terms /
Block-of-Terms leaves; ``kernels._tree_stream`` composes each node's
enumerated minimal-interval stream bottom-up with packed-key sweeps.
The unordered stream sweep replicates ``_UnorderedIt``'s queue physics
exactly — including the lazy-minimization emission rule (skip a window
when the next candidate keeps the right extreme and the popped top does
not define it) — because the freq contract sums over the ITERATOR's
emissions (``IntervalScorer.ensureFreq``).  Differentials below pin the
stream against ``iv.enumerate_intervals`` (the faithful per-doc
iterator port) and the engine path against the generic iterators via
the ``_INTERVAL_FAST_OFF`` hook."""

import random

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.search import ast
from lucene_spark.search import intervals as iv
from lucene_spark.search import kernels as K
from lucene_spark.search.local import LocalIndex


def _rand_leaf(avail, rng):
    kind = rng.random()
    if kind < 0.5 or len(avail) < 2:
        return iv.term(avail.pop())
    if kind < 0.75:
        k = min(rng.randint(2, 3), len(avail))
        return iv.or_(*[iv.term(avail.pop()) for _ in range(k)])
    return iv.phrase(avail.pop(), avail.pop())


def _rand_node(avail, rng, depth):
    if depth == 0 or len(avail) < 2 or rng.random() < 0.35:
        return _rand_leaf(avail, rng)
    subs = []
    for _ in range(rng.randint(2, 3)):
        if not avail:
            break
        subs.append(_rand_node(avail, rng, depth - 1))
    if len(subs) < 2:
        return subs[0]
    node = rng.choice([iv.ordered, iv.unordered])(*subs)
    if rng.random() < 0.5:
        node = iv.maxgaps(rng.randint(0, 10), node)
    return node


def _rand_pos(names, rng, span=80, per=7):
    universe = list(range(span))
    rng.shuffle(universe)
    pos_of, lo = {}, 0
    for nm in names:
        n = rng.randint(1, per)
        pos_of[nm] = sorted(universe[lo : lo + n])
        lo += n
    return pos_of


def _stream_pairs(spec, pos_of_by_doc):
    """(start, end) pairs of the tree stream over packed multi-doc
    occurrence lists."""

    def sub_plist(ts):
        dd, pp = [], []
        for doc in sorted(pos_of_by_doc):
            ps = sorted(
                p for t in ts for p in pos_of_by_doc[doc].get(t, [])
            )
            dd.extend([doc] * len(ps))
            pp.extend(ps)
        return np.asarray(dd, np.int64), np.asarray(pp, np.int64)

    s_pk, e_pk = K._tree_stream(spec, sub_plist)
    return [
        (int(s >> 32), int(s & 0xFFFFFFFF), int(e & 0xFFFFFFFF))
        for s, e in zip(s_pk, e_pk)
    ]


def test_tree_stream_matches_iterator_300_trials():
    """Random nested trees (depth <= 3, mixed leaves): the composed
    stream must equal the faithful iterator's enumeration exactly."""
    rng = random.Random(99)
    names = list("abcdefgh")
    trials = 0
    t = 0
    while trials < 300:
        t += 1
        pos_of = _rand_pos(names, rng)
        avail = names[:]
        rng.shuffle(avail)
        src = _rand_node(avail, rng, 3)
        spec = iv.tree_shape(src)
        if spec is None:
            continue
        trials += 1
        ref = [(0, s, e) for s, e, _ in iv.enumerate_intervals(src, pos_of)]
        got = _stream_pairs(spec, {0: pos_of})
        assert got == ref, (t, src, pos_of, got, ref)


def test_tree_stream_multi_doc_packing():
    """Doc boundaries in the packed keys: per-doc enumerations must
    concatenate exactly (no cross-doc chains or windows)."""
    rng = random.Random(41)
    names = list("abcdef")
    trials = 0
    t = 0
    while trials < 60:
        t += 1
        avail = names[:]
        rng.shuffle(avail)
        src = _rand_node(avail, rng, 2)
        spec = iv.tree_shape(src)
        if spec is None:
            continue
        trials += 1
        docs = {d: _rand_pos(names, rng, span=60, per=5) for d in range(4)}
        ref = []
        for d in sorted(docs):
            ref.extend(
                (d, s, e) for s, e, _ in iv.enumerate_intervals(src, docs[d])
            )
        got = _stream_pairs(spec, docs)
        assert got == ref, (t, src, got, ref)


NESTED_ZOO = [
    # the VERDICT item-3 headline shape
    iv.maxgaps(4, iv.ordered(iv.unordered(iv.term("w0007"), iv.term("w0042")), iv.term("w0012"))),
    iv.ordered(iv.unordered(iv.term("w0007"), iv.term("w0042")), iv.term("w0012")),
    iv.unordered(iv.ordered(iv.term("w0007"), iv.term("w0042")), iv.term("w0012")),
    iv.maxgaps(
        8,
        iv.unordered(
            iv.maxgaps(3, iv.ordered(iv.term("w0007"), iv.term("w0042"))),
            iv.term("w0012"),
        ),
    ),
    iv.ordered(
        iv.unordered(iv.term("w0007"), iv.term("w0042")),
        iv.unordered(iv.term("w0012"), iv.term("w0100")),
    ),
    iv.unordered(
        iv.or_(iv.term("w0007"), iv.term("w0100")),
        iv.ordered(iv.term("w0012"), iv.term("w0042")),
    ),
    iv.maxgaps(
        6,
        iv.ordered(
            iv.phrase("w0007", "w0042"),
            iv.unordered(iv.term("w0012"), iv.term("w0100")),
        ),
    ),
]


@pytest.fixture(scope="module")
def engine():
    from lucene_spark.fixtures import make_pages

    return LocalIndex.build(make_pages(1200), num_segments=2, analyzer=ENGLISH)


def test_tree_path_actually_taken():
    for src in NESTED_ZOO:
        assert iv.tree_shape(src) is not None, src
        # and the flat shapes decline them (tree path is reachable)
        assert iv.unordered_subs_shape(src) is None, src
        assert iv.ordered_subs_shape(src) is None, src
        assert iv.block_terms_shape(src) is None, src


def test_engine_tree_vs_generic(engine, monkeypatch):
    """Engine-level differential: tree sweep vs the generic per-doc
    iterators (_INTERVAL_FAST_OFF), pruned and exhaustive, both
    dtypes."""
    for src in NESTED_ZOO:
        q = ast.IntervalQuery("", src)
        for dt in ("f32", "f64"):
            monkeypatch.setattr(K, "_INTERVAL_FAST_OFF", True)
            ref = engine.search(q, k=20, pruned=False, dtype=dt)
            monkeypatch.setattr(K, "_INTERVAL_FAST_OFF", False)
            fast = engine.search(q, k=20, pruned=False, dtype=dt)
            assert fast == ref, (src, dt)
            pruned = engine.search(q, k=20, pruned=True, dtype=dt)
            assert pruned == ref, (src, dt)
            pruned1 = engine.search(
                q, k=20, pruned=True, dtype=dt, total_hits_threshold=1
            )
            assert pruned1 == ref, (src, dt)


def test_engine_tree_random_differential(engine, monkeypatch):
    """Random nested shapes against the engine corpus — catches shape
    families the zoo misses (vocabulary terms w0000..w0199 are dense
    enough to produce matches)."""
    rng = random.Random(7)
    vocab = [f"w{i:04d}" for i in range(40)]
    done = 0
    while done < 25:
        avail = vocab[:]
        rng.shuffle(avail)
        avail = avail[:8]
        src = _rand_node(avail, rng, 2)
        if iv.tree_shape(src) is None:
            continue
        done += 1
        q = ast.IntervalQuery("", src)
        monkeypatch.setattr(K, "_INTERVAL_FAST_OFF", True)
        ref = engine.search(q, k=10, pruned=False)
        monkeypatch.setattr(K, "_INTERVAL_FAST_OFF", False)
        fast = engine.search(q, k=10, pruned=False)
        assert fast == ref, src
        assert engine.search(q, k=10, pruned=True) == ref, src
