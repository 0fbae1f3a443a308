"""Property tests for the multi-term matcher primitives and the
reference priority-queue port — the invariants the planes rely on."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.search import multiterm

TERM_ALPHA = "abcxyz019"
terms_st = st.text(alphabet=TERM_ALPHA, min_size=0, max_size=8)
pattern_st = st.text(alphabet=TERM_ALPHA + "*?", min_size=0, max_size=8)


def _wildcard_brute(pat: str, t: str) -> bool:
    """Backtracking wildcard match — independent of the regex
    translation under test."""
    if not pat:
        return not t
    if pat[0] == "*":
        return any(_wildcard_brute(pat[1:], t[i:]) for i in range(len(t) + 1))
    if not t:
        return False
    if pat[0] == "?" or pat[0] == t[0]:
        return _wildcard_brute(pat[1:], t[1:])
    return False


@settings(max_examples=300, deadline=None)
@given(pattern_st, terms_st)
def test_wildcard_regex_equals_backtracking(pat, t):
    rx = re.compile(multiterm.wildcard_regex(pat))
    assert (rx.match(t) is not None) == _wildcard_brute(pat, t), (pat, t)


@settings(max_examples=200, deadline=None)
@given(terms_st, terms_st, terms_st)
def test_levenshtein_metric_properties(a, b, c):
    lev = multiterm.levenshtein
    assert lev(a, b) == lev(b, a)
    assert lev(a, b) <= lev(a, c) + lev(c, b)  # triangle inequality
    assert (lev(a, b) == 0) == (a == b)
    assert lev(a, b) <= max(len(a), len(b))
    assert lev(a, b) >= abs(len(a) - len(b))


@settings(max_examples=200, deadline=None)
@given(st.lists(terms_st, max_size=12), terms_st, terms_st)
def test_range_matcher_interval_algebra(vocab, lo, hi):
    if lo > hi:
        lo, hi = hi, lo
    inc = multiterm.bare_matcher("range", (lo, hi, True, True))
    exc = multiterm.bare_matcher("range", (lo, hi, False, False))
    half = multiterm.bare_matcher("range", (lo, hi))  # [lo, hi)
    for t in vocab:
        assert inc(t) == (lo <= t <= hi)
        assert exc(t) == (lo < t < hi)
        assert half(t) == (lo <= t < hi)
        # exclusive implies inclusive; half-open sandwiched between
        assert not exc(t) or inc(t)
        assert not half(t) or inc(t)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 5)),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_ref_pq_pops_in_comparator_order(entries):
    """Without mid-queue mutation, the ported array heap must pop in
    exactly (position, offset, ord) order — the total order the sloppy
    matcher's control flow assumes."""
    from lucene_spark.search.sloppy import _RefPQ

    pos = [p for p, _ in entries]
    offs = [o for _, o in entries]
    pq = _RefPQ(len(entries), pos, offs)
    for i in range(len(entries)):
        pq.add(i)
    got = [pq.pop() for _ in range(len(entries))]
    want = sorted(range(len(entries)), key=lambda i: (pos[i], offs[i], i))
    assert got == want
