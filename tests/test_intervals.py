"""Minimal-interval algebra vs the reference's own golden expectations.

Every expected-interval table below is ported from
``lucene/queries/src/test/org/apache/lucene/queries/intervals/TestIntervals.java``
(same two document fields, same sources, same per-doc (start, end)
pairs in enumeration order — using the reference's tests as the oracle
is the assignment's test model, SURVEY §5)."""

import pytest

from lucene_spark.analysis.analyzer import Analyzer
from lucene_spark.search import intervals as iv

# TestIntervals.java field1_docs / field2_docs
FIELD1 = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine"
    " days old.  Some like it hot, some like it cold, some like it in the"
    " pot nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot"
    " twelve days old.  Some like it cold, some like it hot, some like it"
    " in the fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine"
    " years old.  Some like it hot, some like it twelve",
    "Porridge is great",
    "",
]
FIELD2 = [
    "In Xanadu did Kubla Khan a stately pleasure dome decree",
    "Where Alph the sacred river ran through caverns measureless to man",
    "a b a c b a b c",
    "So thrice five miles of fertile ground",
    "Pease hot porridge porridge",
    "w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6",
    "the quick brown fox jumps over the lazy dog",
]

_AN = Analyzer(stopwords=frozenset())  # StandardAnalyzer(EMPTY_SET)


def _pos_of(text: str) -> dict:
    terms, positions = _AN.tokenize_one(text)
    d: dict = {}
    for t, p in zip(terms, positions):
        d.setdefault(t, []).append(p)
    return d


_F1 = [_pos_of(t) for t in FIELD1]
_F2 = [_pos_of(t) for t in FIELD2]


def check(source, docs, expected, match_count=None):
    """checkIntervals analog: flattened (start, end) pairs per doc; docs
    past the end of ``expected`` must produce no intervals."""
    matched = 0
    for i, pos_of in enumerate(docs):
        got = iv.enumerate_intervals(source, pos_of)
        pairs: list = []
        for s, e, _ in got:
            pairs.extend((s, e))
        exp = list(expected[i]) if i < len(expected) else []
        assert pairs == exp, f"doc {i}: got {pairs}, want {exp}"
        if pairs:
            matched += 1
    if match_count is not None:
        assert matched == match_count


def gaps_of(source, pos_of) -> list:
    return [g for _, _, g in iv.enumerate_intervals(source, pos_of)]


def test_term_intervals():
    src = iv.term("porridge")
    check(
        src, _F1,
        [[], [1, 1, 4, 4, 7, 7], [1, 1, 4, 4, 7, 7], [], [1, 1, 4, 4, 7, 7],
         [0, 0]],
        match_count=4,
    )
    assert src.min_extent() == 1


def test_ordered_near():
    src = iv.ordered(iv.term("pease"), iv.term("hot"))
    check(
        src, _F1,
        [[], [0, 2, 6, 17], [3, 5, 6, 21], [], [0, 2, 6, 17], []],
        match_count=3,
    )
    assert src.min_extent() == 2


def test_ordered_with_duplicates():
    src = iv.ordered(iv.term("pease"), iv.term("pease"), iv.term("porridge"))
    check(
        src, _F1,
        [[], [0, 4, 3, 7], [0, 4, 3, 7], [], [0, 4, 3, 7], []],
        match_count=3,
    )
    assert gaps_of(src, _F1[1]) == [2, 2]


def test_phrase_intervals():
    src = iv.phrase("pease", "porridge")
    check(
        src, _F1,
        [[], [0, 1, 3, 4, 6, 7], [0, 1, 3, 4, 6, 7], [], [0, 1, 3, 4, 6, 7],
         []],
        match_count=3,
    )
    assert src.min_extent() == 2


def test_unordered_near():
    src = iv.unordered(iv.term("pease"), iv.term("hot"))
    check(
        src, _F1,
        [[], [0, 2, 2, 3, 6, 17], [3, 5, 5, 6, 6, 21], [3, 7],
         [0, 2, 2, 3, 6, 17], []],
        match_count=4,
    )
    assert gaps_of(src, _F1[1]) == [1, 0, 10]
    assert src.min_extent() == 2


def test_unordered_with_repeats():
    src = iv.unordered(iv.term("pease"), iv.term("pease"), iv.term("hot"))
    check(
        src, _F1,
        [[], [0, 3, 2, 6, 3, 17], [0, 5, 3, 6], [], [0, 3, 2, 6, 3, 17], []],
        match_count=3,
    )


def test_unordered_with_repeats_and_maxgaps():
    src = iv.maxgaps(
        2, iv.unordered(iv.term("pease"), iv.term("pease"), iv.term("hot"))
    )
    check(
        src, _F1,
        [[], [0, 3, 2, 6], [3, 6], [], [0, 3, 2, 6], []],
        match_count=3,
    )


def test_interval_disjunction():
    src = iv.or_(iv.term("pease"), iv.term("hot"), iv.term("notmatching"))
    check(
        src, _F1,
        [[], [0, 0, 2, 2, 3, 3, 6, 6, 17, 17],
         [0, 0, 3, 3, 5, 5, 6, 6, 21, 21], [3, 3, 7, 7],
         [0, 0, 2, 2, 3, 3, 6, 6, 17, 17], []],
        match_count=4,
    )
    assert src.min_extent() == 1


def test_combination_disjunction():
    src = iv.ordered(
        iv.or_(iv.term("alph"), iv.term("sacred")), iv.term("measureless")
    )
    check(src, _F2, [[], [3, 8], [], [], [], []], match_count=1)
    assert src.min_extent() == 2


def test_nesting():
    src = iv.unordered(
        iv.term("pease"),
        iv.term("porridge"),
        iv.or_(iv.term("hot"), iv.term("cold")),
    )
    check(
        src, _F1,
        [[], [0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 17],
         [0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 17], [],
         [0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 17], []],
        match_count=3,
    )
    assert src.min_extent() == 3
    assert gaps_of(src, _F1[1]) == [0, 0, 0, 0, 0, 0, 9]


def test_nesting2():
    src = iv.unordered(
        iv.ordered(iv.term("like"), iv.term("it"), iv.term("cold")),
        iv.term("pease"),
    )
    check(src, _F1, [[], [6, 21], [6, 17], [], [], []], match_count=2)
    assert src.min_extent() == 4


def test_interleaved_ordered():
    src = iv.ordered(iv.term("a"), iv.term("b"), iv.term("c"))
    check(src, _F2, [[], [], [0, 3, 5, 7], [], [], []], match_count=1)
    assert gaps_of(src, _F2[2]) == [1, 0]


def test_unordered_distinct():
    check(
        iv.unordered_no_overlaps(iv.term("pease"), iv.term("pease")),
        _F1,
        [[], [0, 3, 3, 6], [0, 3, 3, 6], [], [0, 3, 3, 6], []],
        match_count=3,
    )
    src = iv.unordered_no_overlaps(
        iv.unordered(iv.term("pease"), iv.term("porridge"), iv.term("hot")),
        iv.term("porridge"),
    )
    check(
        src, _F1,
        [[], [1, 4, 2, 7, 4, 17], [1, 5, 4, 7], [], [1, 4, 2, 7, 4, 17], []],
        match_count=3,
    )
    check(src, _F2, [[], [], [], [], [0, 3], []], match_count=1)
    src2 = iv.unordered_no_overlaps(
        iv.term("porridge"),
        iv.unordered(iv.term("pease"), iv.term("porridge")),
    )
    check(
        src2, _F1,
        [[], [1, 4, 4, 7], [1, 4, 4, 7], [], [1, 4, 4, 7], []],
        match_count=3,
    )


def test_contained_by():
    src = iv.contained_by(
        iv.term("porridge"), iv.ordered(iv.term("pease"), iv.term("cold"))
    )
    check(
        src, _F1,
        [[], [4, 4, 7, 7], [1, 1, 7, 7], [], [4, 4], []],
        match_count=3,
    )
    assert src.min_extent() == 1


def test_containing():
    src = iv.containing(
        iv.ordered(iv.term("pease"), iv.term("cold")), iv.term("porridge")
    )
    check(
        src, _F1,
        [[], [3, 5, 6, 21], [0, 2, 6, 17], [], [3, 5], []],
        match_count=3,
    )
    assert src.min_extent() == 2


def test_not_containing():
    src = iv.not_containing(
        iv.ordered(iv.term("porridge"), iv.term("pease")), iv.term("hot")
    )
    check(src, _F1, [[], [4, 6], [1, 3], [], [4, 6], []], match_count=3)
    assert src.min_extent() == 2


def test_maxgaps():
    src = iv.maxgaps(
        1, iv.unordered(iv.term("w1"), iv.term("w3"), iv.term("w4"))
    )
    check(
        src, _F2, [[], [], [], [], [], [0, 3, 2, 4, 3, 6]], match_count=1
    )
    assert src.min_extent() == 3


def test_maxgaps_with_repeats():
    src = iv.maxgaps(
        11, iv.ordered(iv.term("pease"), iv.term("pease"), iv.term("hot"))
    )
    check(src, _F1, [[], [], [0, 5], [], [], []], match_count=1)
    assert gaps_of(src, _F1[2]) == [3]


def test_maxgaps_with_only_repeats():
    src = iv.maxgaps(
        1,
        iv.ordered(
            iv.or_(iv.term("pease"), iv.term("hot")),
            iv.or_(iv.term("pease"), iv.term("hot")),
        ),
    )
    check(
        src, _F1,
        [[], [0, 2, 2, 3], [3, 5, 5, 6], [], [0, 2, 2, 3], []],
        match_count=3,
    )
    assert gaps_of(src, _F1[1]) == [1, 0]


def test_nested_maxgaps():
    src = iv.maxgaps(
        1,
        iv.unordered(
            iv.ordered(iv.term("w1"), iv.term("w3")), iv.term("w4")
        ),
    )
    check(
        src, _F2, [[], [], [], [], [], [0, 3, 3, 6, 4, 8]], match_count=1
    )
    assert gaps_of(src, _F2[5]) == [0, 0, 1]
    assert src.min_extent() == 3


def test_defined_gaps():
    src = iv.phrase(
        iv.term("pease"),
        iv.extend(iv.term("cold"), 1, 1),
        iv.term("porridge"),
    )
    check(src, _F1, [[], [3, 7], [0, 4], [], [3, 7], []], match_count=3)
    assert src.min_extent() == 5

    src2 = iv.extend(iv.term("w1"), 5, iv.MAX_INT)
    check(
        src2, _F2,
        [[], [], [], [], [],
         [0, iv.MAX_INT - 1, 0, iv.MAX_INT - 1, 5, iv.MAX_INT - 1]],
        match_count=1,
    )
    assert src2.min_extent() == iv.MAX_INT


def test_extends():
    src = iv.extend(iv.term("fox"), 1, 2)
    check(src, _F2, [[], [], [], [], [], [], [2, 5]], match_count=1)


def test_after():
    src = iv.after(
        iv.term("porridge"), iv.ordered(iv.term("pease"), iv.term("cold"))
    )
    check(
        src, _F1, [[], [7, 7], [4, 4, 7, 7], [], [7, 7], []], match_count=3
    )
    assert src.min_extent() == 1


def test_before():
    src = iv.before(iv.term("cold"), iv.term("twelve"))
    check(src, _F1, [[], [], [2, 2], [], [5, 5], []], match_count=2)
    assert src.min_extent() == 1


def test_within():
    src = iv.within(
        iv.term("hot"), 6, iv.or_(iv.term("porridge"), iv.term("fraggle"))
    )
    check(
        src, _F1, [[], [2, 2], [5, 5, 21, 21], [], [2, 2], []], match_count=3
    )
    assert src.min_extent() == 1


def test_overlapping():
    src = iv.overlapping(
        iv.unordered(iv.term("hot"), iv.term("porridge")),
        iv.unordered(iv.term("cold"), iv.term("pease")),
    )
    check(
        src, _F1,
        [[], [2, 4, 7, 17], [5, 7, 7, 21], [], [2, 4], []],
        match_count=3,
    )
    assert gaps_of(src, _F1[2]) == [1, 13]
    assert src.min_extent() == 2


def test_offset_intervals():
    src = iv.unordered(
        iv.term("pease"),
        iv.term("porridge"),
        iv.or_(iv.term("hot"), iv.term("cold")),
    )
    exp_before = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    exp_after = [3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 18, 18]
    check(
        iv.Offset(src, preceding=True), _F1,
        [[], exp_before, exp_before, [], exp_before, []],
        match_count=3,
    )
    check(
        iv.Offset(src, preceding=False), _F1,
        [[], exp_after, exp_after, [], exp_after, []],
        match_count=3,
    )


def test_no_intervals_and_scoring():
    assert iv.enumerate_intervals(iv.no_intervals("x"), _F1[1]) == []
    # doc 1 'porridge': three length-1 intervals, minExtent 1 -> freq 3
    assert iv.interval_freq(iv.term("porridge"), _F1[1]) == 3.0
    s = iv.saturation_score(3.0, boost=1.0, pivot=1.0)
    assert s == pytest.approx(0.75)
    # saturation is monotone in freq and bounded by boost
    assert iv.saturation_score(0.5, 2.0, 1.0) < iv.saturation_score(
        5.0, 2.0, 1.0
    ) < 2.0


def test_brute_force_match_parity():
    """Match-set sanity vs a brute-force oracle: ordered(a, b) matches a
    doc iff some a-position precedes some b-position; unordered iff both
    terms occur. (The enumeration goldens above pin the exact interval
    lists; this pins the DOC-level semantics on every fixture doc.)"""
    for docs in (_F1, _F2):
        for a in ("pease", "porridge", "hot", "w1"):
            for b in ("cold", "hot", "w3"):
                if a == b:
                    continue
                src_o = iv.ordered(iv.term(a), iv.term(b))
                src_u = iv.unordered(iv.term(a), iv.term(b))
                for pos_of in docs:
                    pa, pb = pos_of.get(a, []), pos_of.get(b, [])
                    want_o = bool(pa and pb and min(pa) < max(pb))
                    want_u = bool(pa and pb)
                    got_o = bool(iv.enumerate_intervals(src_o, pos_of))
                    got_u = bool(iv.enumerate_intervals(src_u, pos_of))
                    assert got_o == want_o
                    assert got_u == want_u


def test_two_term_fast_path_bit_identical():
    """The vectorized two-term fast path (cross-adjacent merged pairs)
    must be BIT-identical to the ported iterator enumeration on random
    position lists, for ordered/unordered with and without maxgaps,
    in both dtypes."""
    import random

    rng = random.Random(42)
    for trial in range(300):
        n1 = rng.randint(1, 12)
        n2 = rng.randint(1, 12)
        universe = list(range(40))
        rng.shuffle(universe)
        p1 = sorted(universe[:n1])
        p2 = sorted(universe[n1 : n1 + n2])
        pos_of = {"a": p1, "b": p2}
        for base in (
            iv.ordered(iv.term("a"), iv.term("b")),
            iv.unordered(iv.term("a"), iv.term("b")),
        ):
            for src in (base, iv.maxgaps(rng.randint(0, 6), base)):
                for dtype, ref in (
                    ("f32", iv.interval_freq),
                    ("f64", iv.interval_freq64),
                ):
                    fast = iv.fast_freq_fn(src, dtype)
                    assert fast is not None
                    assert fast(pos_of) == ref(src, pos_of), (
                        trial, src, dtype, p1, p2
                    )


def test_fast_path_shape_detection():
    assert iv.two_term_shape(iv.ordered(iv.term("a"), iv.term("b"))) == (
        "ordered", "a", "b", None
    )
    assert iv.two_term_shape(
        iv.maxgaps(2, iv.unordered(iv.term("a"), iv.term("b")))
    ) == ("unordered", "a", "b", 2)
    # repeats, 3 terms, nested sources: no fast path
    assert iv.two_term_shape(iv.ordered(iv.term("a"), iv.term("a"))) is None
    assert (
        iv.two_term_shape(
            iv.ordered(iv.term("a"), iv.term("b"), iv.term("c"))
        )
        is None
    )
    assert (
        iv.two_term_shape(
            iv.ordered(iv.phrase("a", "b"), iv.term("c"))
        )
        is None
    )


# ------------------------- multi-term sources (dictionary expansion)


def _vocab(docs):
    v: set = set()
    for pos_of in docs:
        v |= set(pos_of)
    return sorted(v)  # bare == fielded for the default field


def _expand(src, docs, field=""):
    from lucene_spark.search.kernels import expand_interval_source

    return expand_interval_source(_vocab(docs), src, field)


def test_multiterm_prefix():
    src = _expand(iv.prefix("p"), _F1)
    check(
        src, _F1,
        [[], [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7, 10, 10, 27, 27],
         [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7, 10, 10], [7, 7],
         [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7, 10, 10], [0, 0]],
        match_count=5,
    )
    assert iv.enumerate_intervals(_expand(iv.prefix("qqq"), _F1), _F1[1]) == []


def test_multiterm_wildcard_and_regexp():
    exp = [[], [2, 2, 10, 10, 17, 17, 27, 27], [5, 5, 10, 10, 21, 21],
           [3, 3], [2, 2, 10, 10, 17, 17], []]
    check(_expand(iv.wildcard("?ot"), _F1), _F1, exp, match_count=4)
    # Intervals.regexp is the ANCHORED reference dialect
    check(_expand(iv.regexp(".ot"), _F1), _F1, exp, match_count=4)


def test_multiterm_fuzzy():
    src = _expand(iv.fuzzy_term("kot", 1), _F1)
    check(
        src, _F1,
        [[], [2, 2, 10, 10, 17, 17, 27, 27], [5, 5, 10, 10, 21, 21],
         [3, 3], [2, 2, 10, 10, 17, 17], []],
        match_count=4,
    )


def test_multiterm_range():
    src = _expand(iv.term_range("cold", "hot", True, True), _F1)
    check(
        src, _F1,
        [[5, 5], [2, 2, 5, 5, 12, 12, 17, 17, 21, 21, 29, 29],
         [2, 2, 5, 5, 12, 12, 17, 17, 21, 21, 27, 27], [1, 1, 3, 3, 4, 4],
         [2, 2, 5, 5, 17, 17], [2, 2]],
        match_count=6,
    )


def test_multiterm_expansion_cap_and_usage_errors():
    with pytest.raises(ValueError, match="too many terms"):
        _expand(iv.prefix("p", max_expansions=1), _F1)
    with pytest.raises(RuntimeError, match="expanded against a term"):
        iv.enumerate_intervals(iv.prefix("p"), _F1[1])
    # nested under combinators: expansion rebuilds the tree
    src = _expand(
        iv.maxgaps(2, iv.unordered(iv.prefix("peas"), iv.term("hot"))), _F1
    )
    assert not iv.multi_terms(src)
    assert iv.enumerate_intervals(src, _F1[1])


def test_at_least():
    src = iv.at_least(
        3, iv.term("porridge"), iv.term("hot"), iv.term("twelve"),
        iv.term("nine"), iv.term("pease"),
    )
    check(
        src, _F1,
        [[], [0, 2, 1, 3, 2, 4, 6, 11, 7, 17],
         [3, 5, 4, 6, 5, 7, 6, 11, 7, 21], [],
         [0, 2, 1, 3, 2, 4, 6, 11, 7, 17, 11, 21], []],
        match_count=3,
    )
    assert gaps_of(src, _F1[1]) == [0, 0, 0, 3, 8]
    assert src.min_extent() == 3


def test_at_least_degenerate_and_no_match():
    # msm == len -> unordered; over a single source -> the source
    src = iv.ordered(
        iv.at_least(1, iv.term("interest")), iv.at_least(1, iv.term("anyone"))
    )
    assert [
        (s, e) for s, e, _ in iv.enumerate_intervals(src, _F1[0])
    ] == [(2, 4)]
    # msm > len -> never matches
    nm = iv.at_least(4, iv.term("a"), iv.term("b"))
    for pos_of in _F1 + _F2:
        assert iv.enumerate_intervals(nm, pos_of) == []


def test_open_ended_ranges():
    src = _expand(iv.term_range("porridge", None, False, False), _F1)
    check(
        src, _F1,
        [[3, 3], [9, 9, 10, 10, 14, 14, 18, 18, 22, 22, 26, 26, 27, 27],
         [9, 9, 10, 10, 11, 11, 14, 14, 18, 18, 22, 22, 26, 26], [8, 8],
         [9, 9, 10, 10, 12, 12, 14, 14, 18, 18, 21, 21], []],
        match_count=5,
    )
    src2 = _expand(iv.term_range(None, "anyone", False, True), _F1)
    check(src2, _F1, [[4, 4], [], [], [], [], []], match_count=1)


def test_wrapped_filters():
    src = iv.or_(
        iv.term("nine"),
        iv.maxgaps(
            1,
            iv.or_(
                iv.ordered(iv.term("pease"), iv.term("hot")),
                iv.ordered(iv.term("pease"), iv.term("cold")),
            ),
        ),
    )
    check(
        src, _F1,
        [[], [0, 2, 3, 5, 11, 11, 28, 28], [0, 2, 3, 5], [],
         [0, 2, 3, 5, 11, 11], []],
        match_count=3,
    )


def test_multiterm_lregexp_automaton():
    # Intervals.multiterm over the dialect automaton p.*e
    src = _expand(iv.regexp("p.*e"), _F1)
    check(
        src, _F1,
        [[], [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7],
         [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7], [7, 7],
         [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7], [0, 0]],
        match_count=5,
    )


def test_unordered_sweep_enumeration_equivalence():
    """The across-docs sweep's window rule (first window per distinct
    left extreme = min over terms of latest occurrence) must enumerate
    exactly the queue iterator's intervals for k distinct terms —
    random differential over k in 2..4."""
    import random

    rng = random.Random(11)
    for trial in range(300):
        k = rng.randint(2, 4)
        names = [chr(97 + i) for i in range(k)]
        universe = list(range(50))
        rng.shuffle(universe)
        pos_of = {}
        lo = 0
        for nm in names:
            n = rng.randint(1, 10)
            pos_of[nm] = sorted(universe[lo : lo + n])
            lo += n
        src = iv.unordered(*[iv.term(nm) for nm in names])
        ref = [(s, e) for s, e, _ in iv.enumerate_intervals(src, pos_of)]
        # sweep rule
        events = sorted(
            (p, nm) for nm in names for p in pos_of[nm]
        )
        last = {nm: None for nm in names}
        got = []
        prev_l = None
        for p, nm in events:
            last[nm] = p
            if any(v is None for v in last.values()):
                continue
            l = min(last.values())
            if l != prev_l:
                got.append((l, p))
                prev_l = l
        assert got == ref, (trial, pos_of, got, ref)


def test_ordered_sweep_enumeration_equivalence():
    """The ordered sweep rule (END(a) via composed next-occurrence,
    minimality = last start per distinct end) must enumerate exactly
    the lazy-minimizing iterator's intervals for k distinct terms."""
    import bisect
    import random

    rng = random.Random(23)
    for trial in range(300):
        k = rng.randint(2, 4)
        names = [chr(97 + i) for i in range(k)]
        universe = list(range(50))
        rng.shuffle(universe)
        pos_of = {}
        lo = 0
        for nm in names:
            n = rng.randint(1, 10)
            pos_of[nm] = sorted(universe[lo : lo + n])
            lo += n
        src = iv.ordered(*[iv.term(nm) for nm in names])
        ref = [(s, e) for s, e, _ in iv.enumerate_intervals(src, pos_of)]
        chains = []
        for a in pos_of[names[0]]:
            end = a
            ok = True
            for nm in names[1:]:
                i = bisect.bisect_right(pos_of[nm], end)
                if i >= len(pos_of[nm]):
                    ok = False
                    break
                end = pos_of[nm][i]
            if ok:
                chains.append((a, end))
        got = [
            c for i, c in enumerate(chains)
            if i + 1 == len(chains) or chains[i + 1][1] != c[1]
        ]
        assert got == ref, (trial, pos_of, got, ref)


def test_block_sweep_enumeration_equivalence():
    """Block (exact adjacency) enumeration = every occurrence
    ascending; random differential for the batch rule."""
    import random

    rng = random.Random(31)
    for trial in range(200):
        k = rng.randint(2, 4)
        names = [chr(97 + i) for i in range(k)]
        # synthesize docs with planted adjacencies and noise
        universe = list(range(60))
        rng.shuffle(universe)
        pos_of = {}
        lo = 0
        for nm in names:
            n = rng.randint(1, 8)
            pos_of[nm] = sorted(universe[lo : lo + n])
            lo += n
        src = iv.phrase(*[iv.term(nm) for nm in names])
        ref = [(s, e) for s, e, _ in iv.enumerate_intervals(src, pos_of)]
        got = [
            (a, a + k - 1)
            for a in pos_of[names[0]]
            if all(a + i in pos_of[names[i]] for i in range(1, k))
        ]
        assert got == ref, (trial, pos_of, got, ref)


def test_or_of_terms_subs_sweep_equivalence():
    """Or-of-Terms subs behave as single pseudo-terms with merged
    positions — random differential of the sweep rules (ordered,
    unordered, block) against the iterator enumeration with disjoint
    synonym sets."""
    import bisect
    import random

    rng = random.Random(47)
    for trial in range(200):
        k = rng.randint(2, 3)
        universe = list(range(60))
        rng.shuffle(universe)
        subs = []
        merged = []
        lo = 0
        ci = 0
        for _ in range(k):
            n_syn = rng.randint(1, 3)
            group = []
            gpos: list = []
            for _ in range(n_syn):
                nm = f"t{ci}"
                ci += 1
                n = rng.randint(1, 5)
                group.append((nm, sorted(universe[lo : lo + n])))
                gpos += universe[lo : lo + n]
                lo += n
            subs.append(group)
            merged.append(sorted(gpos))
        pos_of = {nm: ps for group in subs for nm, ps in group}

        def mk(group):
            return (
                iv.term(group[0][0])
                if len(group) == 1
                else iv.or_(*[iv.term(nm) for nm, _ in group])
            )

        for ctor in (iv.ordered, iv.unordered):
            src = ctor(*[mk(g) for g in subs])
            ref = [(s, e) for s, e, _ in iv.enumerate_intervals(src, pos_of)]
            if ctor is iv.unordered:
                events = sorted(
                    (p, i) for i, ps in enumerate(merged) for p in ps
                )
                last = [None] * k
                got = []
                prev_l = None
                for p, i in events:
                    last[i] = p
                    if any(v is None for v in last):
                        continue
                    l = min(last)
                    if l != prev_l:
                        got.append((l, p))
                        prev_l = l
            else:
                chains = []
                for a in merged[0]:
                    end = a
                    ok = True
                    for ps in merged[1:]:
                        j = bisect.bisect_right(ps, end)
                        if j >= len(ps):
                            ok = False
                            break
                        end = ps[j]
                    if ok:
                        chains.append((a, end))
                got = [
                    c for i, c in enumerate(chains)
                    if i + 1 == len(chains) or chains[i + 1][1] != c[1]
                ]
            assert got == ref, (trial, ctor, pos_of, got, ref)


def test_enumeration_is_the_minimal_interval_set():
    """Mathematically independent oracle: for ordered/unordered over
    distinct terms, the enumerated intervals must equal the set of
    MINIMAL satisfying windows (no satisfying window nested inside),
    brute-forced over all O(n^2) windows of small random docs. This
    pins the semantics without reference to either the ported iterator
    control flow or the sweep rules."""
    import random

    rng = random.Random(61)

    def satisfies(window, merged_pos, kind):
        s, e = window
        if kind == "unordered":
            return all(any(s <= p <= e for p in ps) for ps in merged_pos)
        # ordered: an increasing chain inside [s, e] starting at s?
        # (any chain inside the window suffices for satisfaction)
        def chain(i, lo):
            if i == len(merged_pos):
                return True
            return any(
                lo < p <= e and chain(i + 1, p) for p in merged_pos[i]
            )
        return chain(0, s - 1)

    for trial in range(120):
        k = rng.randint(2, 3)
        universe = list(range(24))
        rng.shuffle(universe)
        pos, lo = [], 0
        for _ in range(k):
            n = rng.randint(1, 5)
            pos.append(sorted(universe[lo : lo + n]))
            lo += n
        pos_of = {f"t{i}": ps for i, ps in enumerate(pos)}
        allp = sorted(p for ps in pos for p in ps)
        for kind, ctor in (("ordered", iv.ordered), ("unordered", iv.unordered)):
            src = ctor(*[iv.term(f"t{i}") for i in range(k)])
            got = {(s, e) for s, e, _ in iv.enumerate_intervals(src, pos_of)}
            sat = {
                (s, e)
                for s in allp
                for e in allp
                if s <= e and satisfies((s, e), pos, kind)
            }
            minimal = {
                (s, e)
                for (s, e) in sat
                if not any(
                    (s2, e2) != (s, e) and s <= s2 and e2 <= e
                    for (s2, e2) in sat
                )
            }
            assert got == minimal, (trial, kind, pos, got, minimal)


def test_fix_field():
    """fixField: the wrapped source reads another field's positions
    (``FixedFieldIntervalsSource``; golden from testFixedField: phrase
    over field2 whose second slot reads field1). Implemented as the
    field-qualified-key rewrite."""
    from lucene_spark.search.ast import fielded

    src = iv.phrase(iv.term("alph"), iv.fix_field("field1", iv.term("hot")))
    # per-doc positions: field2 tokens bare + field1 tokens qualified
    for i, exp in enumerate([[], [1, 2], [], [], [], [], []]):
        pos_of = dict(_F2[i])
        for t, ps in _F1[i].items():
            pos_of[fielded("field1", t)] = ps
        got = [
            x for s, e, _ in iv.enumerate_intervals(src, pos_of)
            for x in (s, e)
        ]
        assert got == exp, (i, got, exp)
    # multi-term subtrees are an explicit error
    with pytest.raises(NotImplementedError):
        iv.fix_field("field1", iv.prefix("ho"))


def test_fix_field_through_engine(spark, tmp_path):
    from lucene_spark.analysis.analyzer import ENGLISH
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search import ast as ast_mod
    from lucene_spark.search.searcher import Searcher
    from lucene_spark.search.serve import LocalSearcher

    rows = [
        ("u0", "alpha beta", "hot stuff"),
        ("u1", "alpha gamma", "cold stuff"),
        ("u2", "beta alpha", "hot hot"),
    ]
    d = str(tmp_path / "ff_idx")
    build_index(
        spark,
        spark.createDataFrame(rows, ["url", "text", "title"]),
        d,
        IndexConfig(
            num_segments=1, analyzer=ENGLISH,
            fields=(("", "text"), ("title", "title")),
        ),
    )
    # body-field unordered pair whose second leg reads the TITLE field:
    # matches docs where 'alpha' (body) and 'hot' (title) both occur
    q = ast_mod.IntervalQuery(
        "",
        iv.unordered(iv.term("alpha"), iv.fix_field("title", iv.term("hot"))),
    )
    s = Searcher(spark, d)
    got = sorted(r["url"] for r in s.match_docs(q).collect())
    assert got == ["u0", "u2"]
    ls = LocalSearcher(d)
    a = [(doc, sc) for doc, sc, _ in ls.search(q, k=10)]
    b = [
        (r["doc_id"], r["score"])
        for r in s.search(q, k=10, pruned=True).collect()
    ]
    c = [
        (r["doc_id"], r["score"])
        for r in s.search(q, k=10, pruned=False).collect()
    ]
    assert a == b == c and a


def test_ordered_with_phrase_subs_sweep_equivalence():
    """Phrase (block) subs inside ordered: the fixed-width chain sweep
    must match the iterator enumeration — random differential mixing
    Term and 2-3-term Block subs."""
    import bisect
    import random

    rng = random.Random(83)
    for trial in range(250):
        k = rng.randint(2, 3)
        universe = list(range(40))
        rng.shuffle(universe)
        subs = []
        lo = 0
        ci = 0
        for _ in range(k):
            if rng.random() < 0.5:
                # phrase sub: plant adjacencies
                blk = rng.randint(2, 3)
                names = []
                base_positions = sorted(
                    rng.sample(range(0, 40 - blk, 1), rng.randint(1, 3))
                )
                pos_lists = [[] for _ in range(blk)]
                for b in base_positions:
                    for j in range(blk):
                        pos_lists[j].append(b + j)
                for j in range(blk):
                    names.append((f"t{ci}", sorted(set(pos_lists[j]))))
                    ci += 1
                subs.append(("block", names))
            else:
                n = rng.randint(1, 6)
                subs.append((
                    "term", [(f"t{ci}", sorted(rng.sample(range(40), n)))]
                ))
                ci += 1
        # positions may overlap across subs/terms — the engine shape
        # requires one token per position, so rebuild without collisions
        used: set = set()
        ok = True
        for _, names in subs:
            for _, ps in names:
                for p in ps:
                    if p in used:
                        ok = False
                    used.add(p)
        if not ok:
            continue
        pos_of = {nm: ps for _, names in subs for nm, ps in names}

        def mk(sub):
            kind, names = sub
            if kind == "block":
                return iv.phrase(*[iv.term(nm) for nm, _ in names])
            return iv.term(names[0][0])

        src = iv.ordered(*[mk(s) for s in subs])
        ref = [(s, e) for s, e, _ in iv.enumerate_intervals(src, pos_of)]

        # sweep rule over per-sub (start, width) occurrence lists
        def occurrences(sub):
            kind, names = sub
            if kind == "term":
                return [(p, 1) for p in names[0][1]]
            blk = len(names)
            return [
                (a, blk)
                for a in names[0][1]
                if all(a + j in set(names[j][1]) for j in range(1, blk))
            ]

        occs = [occurrences(s) for s in subs]
        chains = []
        for a, w0 in occs[0]:
            end = a + w0 - 1
            alive = True
            for lst in occs[1:]:
                starts = [st for st, _ in lst]
                j = bisect.bisect_right(starts, end)
                if j >= len(lst):
                    alive = False
                    break
                end = lst[j][0] + lst[j][1] - 1
            if alive:
                chains.append((a, end))
        got = [
            c for i, c in enumerate(chains)
            if i + 1 == len(chains) or chains[i + 1][1] != c[1]
        ]
        assert got == ref, (trial, pos_of, got, ref)


def test_unordered_with_phrase_subs_sweep_equivalence():
    """Phrase (block) subs inside UNORDERED: left extreme = min latest
    start, right extreme = max latest end, first window per distinct
    left extreme — random differential mixing term and phrase subs."""
    import random

    rng = random.Random(97)
    for trial in range(250):
        k = rng.randint(2, 3)
        subs = []
        used: set = set()
        ci = 0
        ok_build = True
        for _ in range(k):
            if rng.random() < 0.5:
                blk = rng.randint(2, 3)
                bases = sorted(rng.sample(range(0, 37), rng.randint(1, 3)))
                names = [
                    (f"t{ci + j}", sorted({b + j for b in bases}))
                    for j in range(blk)
                ]
                ci += blk
                subs.append(("block", names))
            else:
                subs.append((
                    "term",
                    [(f"t{ci}", sorted(rng.sample(range(40), rng.randint(1, 6))))],
                ))
                ci += 1
        for _, names in subs:
            for _, ps in names:
                for p in ps:
                    if p in used:
                        ok_build = False
                    used.add(p)
        if not ok_build:
            continue
        pos_of = {nm: ps for _, names in subs for nm, ps in names}

        def mk(sub):
            kind, names = sub
            if kind == "block":
                return iv.phrase(*[iv.term(nm) for nm, _ in names])
            return iv.term(names[0][0])

        src = iv.unordered(*[mk(s) for s in subs])
        ref = [(s, e) for s, e, _ in iv.enumerate_intervals(src, pos_of)]

        def occ(sub):
            kind, names = sub
            if kind == "term":
                return [(p, p) for p in names[0][1]]
            blk = len(names)
            sets = [set(ps) for _, ps in names]
            return [
                (a, a + blk - 1)
                for a in names[0][1]
                if all(a + j in sets[j] for j in range(1, blk))
            ]

        occs = [occ(s) for s in subs]
        events = sorted(
            (st, en, i) for i, lst in enumerate(occs) for st, en in lst
        )
        last = [None] * k
        got = []
        prev_l = None
        for st, en, i in events:
            last[i] = (st, en)
            if any(v is None for v in last):
                continue
            left = min(v[0] for v in last)
            right = max(v[1] for v in last)
            if left != prev_l:
                got.append((left, right))
                prev_l = left
        assert got == ref, (trial, pos_of, got, ref)
