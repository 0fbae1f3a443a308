"""hasMultiTermRpts sloppy matching — hand-traced goldens.

The engine and the Python OracleIndex share ``sloppy_freq_repeats``
(the faithful SloppyPhraseMatcher port), so engine==oracle parity in
test_sloppy_wand.py validates plumbing, not the matcher itself. These
cases pin the matcher against traces of the reference algorithm
(``SloppyPhraseMatcher.java``: advanceRepeatGroups case 2 at :453-472,
gatherRptGroups multi-term branch at :575-600, advanceRpts :305-342)
executed by hand on the Javadoc's own examples.
"""

import numpy as np

from lucene_spark.analysis.analyzer import Analyzer
from lucene_spark.search import ast
from lucene_spark.search.local import LocalIndex
from lucene_spark.search.sloppy import (
    multi_repeat_groups,
    sloppy_freq_repeats,
)

NOSTOP = Analyzer(stopwords=frozenset())


def MP(slots, slop=0, positions=None):
    return ast.MultiPhraseQuery(
        slots=tuple(tuple(s) for s in slots),
        positions=tuple(
            positions if positions is not None else range(len(slots))
        ),
        slop=slop,
    )


# ------------------------------------------------ group identification


def test_group_detection_shapes():
    # no repeats
    assert multi_repeat_groups([("a", "b"), ("c",)]) == (None, False)
    # single-term repeats only -> non-MTR per-term groups
    groups, mtr = multi_repeat_groups([("a",), ("b",), ("a",)])
    assert not mtr and groups == [[0, 2]]
    # the Javadoc example: P1={A,B}, P2={B,C} share B -> one MTR group
    groups, mtr = multi_repeat_groups([("a", "b"), ("b", "c")])
    assert mtr and groups == [[0, 1]]
    # transitive union: B links 0-1, C links 1-2 -> one component
    groups, mtr = multi_repeat_groups(
        [("a", "b"), ("b", "c"), ("c", "e"), ("f",)]
    )
    assert mtr and groups == [[0, 1, 2]]
    # two independent components
    groups, mtr = multi_repeat_groups(
        [("a", "b"), ("b",), ("x", "y"), ("y",)]
    )
    assert mtr and sorted(map(sorted, groups)) == [[0, 1], [2, 3]]
    # a multi-term slot with NO repeating term does not force MTR
    groups, mtr = multi_repeat_groups([("a",), ("x", "y"), ("a",)])
    assert not mtr and groups == [[0, 2]]


# ------------------------------------------------ hand-traced matcher


def test_hidden_collision_doc_a_c_b():
    """Javadoc example: P1={A,B}, P2={B,C}, doc = "A C B".

    Union lists (shifted by offsets 0,1): P1 -> [0,2], P2 -> [0,1].
    Trace: first match is P1=A@0 / P2=C@1 (matchLength 0) at any slop;
    the second lead (P2@C) advances to B@2, collides with P1's B@2,
    resolution exhausts P2 -> final matchLength 2 counts only at
    slop>=2. f32 accumulation: 1 + 1/3."""
    pls = [np.array([0, 2]), np.array([1, 2])]
    groups, mtr = multi_repeat_groups([("a", "b"), ("b", "c")])
    assert mtr
    f = lambda slop: sloppy_freq_repeats(pls, (0, 1), slop, groups, mtr)
    assert f(0) == 1.0
    assert f(1) == 1.0
    expected2 = float(
        np.float32(1.0) + np.float32(1.0) / (np.float32(1.0) + np.float32(2.0))
    )
    assert f(2) == expected2  # 1.3333334


def test_same_term_both_slots_doc_b_b():
    """P1={A,B}, P2={B,C}, doc = "B B": both pps land on B@0 at init
    (tpPos 0 each) — the dynamic advanceRepeatGroups resolves the
    collision by advancing the lesser (P2, shifted -1) to B@1; the
    match P1=B@0 / P2=B@1 has matchLength 0."""
    pls = [np.array([0, 1]), np.array([0, 1])]
    groups, mtr = multi_repeat_groups([("a", "b"), ("b", "c")])
    f = lambda slop: sloppy_freq_repeats(pls, (0, 1), slop, groups, mtr)
    assert f(0) == 1.0
    assert f(3) == 1.0


def test_collision_unresolvable_single_occurrence():
    """Both slots can only sit on the SAME single position: init
    collision resolution exhausts a pp -> no match."""
    pls = [np.array([5]), np.array([5])]
    groups, mtr = multi_repeat_groups([("b",), ("b", "c")])
    assert mtr
    assert sloppy_freq_repeats(pls, (0, 0), 4, groups, mtr) == 0.0


# ------------------------------------------------ engine end-to-end


def test_engine_crafted_docs():
    """End-to-end on crafted documents (no-stopword analyzer keeps
    positions literal): the A-C-B / B-B traces through the full
    pruned and exhaustive kernels."""
    pages = [
        {"url": "u0", "text": "aa cc bb"},    # A C B
        {"url": "u1", "text": "bb bb"},       # B B
        {"url": "u2", "text": "cc aa"},       # transposed: slop>=2 only
        {"url": "u3", "text": "aa zz zz cc"},  # A..C span 2
    ]
    engine = LocalIndex.build(pages, num_segments=1, analyzer=NOSTOP)
    q = MP([("aa", "bb"), ("bb", "cc")], slop=0)
    hits0 = engine.search(q, k=10, pruned=False)
    assert {u for _, _, u in hits0} == {"u0", "u1"}
    q2 = MP([("aa", "bb"), ("bb", "cc")], slop=2)
    hits2 = engine.search(q2, k=10, pruned=False)
    assert {u for _, _, u in hits2} == {"u0", "u1", "u2", "u3"}
    assert engine.search(q2, k=10, pruned=True) == hits2
