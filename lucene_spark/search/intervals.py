"""Minimal-interval position algebra — the reference's intervals module
(``lucene/queries/src/java/org/apache/lucene/queries/intervals/``).

An IntervalsSource is a combinator tree over term-position streams; per
document it enumerates a sequence of (start, end, gaps) intervals under
lazy minimal-interval semantics (Clarke/Cormack/Burkowski; the
reference's specific enumeration order is part of the contract because
``IntervalScorer.ensureFreq`` sums 1/max(length - minExtent + 1, 1)
over EXACTLY the enumerated intervals — ``IntervalScorer.java:43-52``).

This is a faithful per-document re-expression of the reference
iterators (same control flow, cited per class) with one structural
change for the batch engine: the reference interleaves doc iteration
(approximations over postings) with interval iteration; here the doc
set is produced by the engine's existing DISI/scan machinery and each
candidate doc is evaluated EAGERLY over its decoded position arrays
(``positions_of``: term -> sorted int array). ``matches_approx``
mirrors each source's DocIdSetIterator approximation (conjunction /
disjunction / minuend-only), so iterator control flow sees exactly the
sub-iterator states the reference would.

Public factory surface mirrors ``Intervals.java``: term, phrase,
ordered, unordered, unordered_no_overlaps, or_, at_least, maxgaps,
maxwidth, extend, before, after, within, not_within, overlapping,
non_overlapping, containing, contained_by, not_containing,
not_contained_by, no_intervals, plus the multi-term factories
(prefix/wildcard/regexp/fuzzy_term/term_range), which the engine
expands per segment against the term dictionary (the
``MultiTermIntervalsSource`` role, capped at its max_expansions). The
string parser accepts the ``fn:NAME(...)`` grammar
(``StandardSyntaxParser.jj``). ``fix_field`` supports cross-field
intervals over concrete-term subtrees (field-qualified-key rewrite).
``payload_filtered_term`` filters a term's positions by a payload
predicate (``PayloadFilteredTermIntervalsSource.java``) over indexes
built with a payload-producing analyzer
(``lucene_spark/analysis/payloads.py``); per-doc payload arrays ride
``pos_of`` under the ``("pay", term)`` key.
Deliberate scope cut (documented, not hidden): fix_field over
multi-term sources raises.
"""

from __future__ import annotations

from dataclasses import dataclass

NO_MORE = (1 << 31) - 1  # IntervalIterator.NO_MORE_INTERVALS
MAX_INT = (1 << 31) - 1
# IndexSearcher.getMaxClauseCount() default — caps disjunction pull-up
MAX_CLAUSES = 1024
DEFAULT_MAX_EXPANSIONS = 128  # Intervals.DEFAULT_MAX_EXPANSIONS


# --------------------------------------------------------------- iterators


class _Heap:
    """``util/PriorityQueue.java`` as a 1-based array heap with a LIVE
    comparator (same physics as sloppy.py's _RefPQ): when the
    comparator ties, pop order is determined by the physical layout,
    which identical add/pop sequences reproduce exactly."""

    __slots__ = ("heap", "size", "less")

    def __init__(self, max_size: int, less):
        self.heap = [None] * (max_size + 1)
        self.size = 0
        self.less = less

    def add(self, element) -> None:
        i = self.size + 1
        self.heap[i] = element
        self.size = i
        self._up_heap(i)

    def top(self):
        return self.heap[1]

    def pop(self):
        if self.size == 0:
            return None  # PriorityQueue.pop null contract
        heap = self.heap
        result = heap[1]
        heap[1] = heap[self.size]
        heap[self.size] = None
        self.size -= 1
        self._down_heap(1)
        return result

    def members(self):
        """Heap-array iteration order (Java PriorityQueue.iterator())."""
        return self.heap[1 : self.size + 1]

    def _up_heap(self, orig: int) -> None:
        heap, less = self.heap, self.less
        i = orig
        node = heap[i]
        j = i >> 1
        while j > 0 and less(node, heap[j]):
            heap[i] = heap[j]
            i = j
            j >>= 1
        heap[i] = node

    def _down_heap(self, i: int) -> None:
        heap, size, less = self.heap, self.size, self.less
        node = heap[i]
        j = i << 1
        k = j + 1
        if k <= size and less(heap[k], heap[j]):
            j = k
        while j <= size and less(heap[j], node):
            heap[i] = heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= size and less(heap[k], heap[j]):
                j = k
        heap[i] = node


class _It:
    """Per-document interval iterator protocol (IntervalIterator.java):
    start()/end() are -1 before the first nextInterval, NO_MORE after
    exhaustion; width() = end - start + 1."""

    def start(self) -> int:
        raise NotImplementedError

    def end(self) -> int:
        raise NotImplementedError

    def gaps(self) -> int:
        raise NotImplementedError

    def width(self) -> int:
        return self.end() - self.start() + 1

    def next_interval(self) -> int:
        raise NotImplementedError


class _TermIt(_It):
    """TermIntervalsSource iterator: one [p, p] interval per position."""

    __slots__ = ("pos", "i", "n")

    def __init__(self, positions):
        self.pos = positions
        self.n = len(positions)
        self.i = -1

    def start(self) -> int:
        if self.i < 0:
            return -1
        return NO_MORE if self.i >= self.n else int(self.pos[self.i])

    def end(self) -> int:
        return self.start()

    def gaps(self) -> int:
        return 0

    def next_interval(self) -> int:
        if self.i < self.n:
            self.i += 1
        return NO_MORE if self.i >= self.n else int(self.pos[self.i])


class _BlockIt(_It):
    """BlockIntervalsSource.BlockIntervalIterator (exact adjacency)."""

    def __init__(self, subs):
        self.subs = subs
        self._start = self._end = -1

    def start(self) -> int:
        return self._start

    def end(self) -> int:
        return self._end

    def gaps(self) -> int:
        return 0

    def next_interval(self) -> int:
        subs = self.subs
        if subs[0].next_interval() == NO_MORE:
            self._start = self._end = NO_MORE
            return NO_MORE
        i = 1
        while i < len(subs):
            while subs[i].start() <= subs[i - 1].end():
                if subs[i].next_interval() == NO_MORE:
                    self._start = self._end = NO_MORE
                    return NO_MORE
            if subs[i].start() == subs[i - 1].end() + 1:
                i += 1
            else:
                if subs[0].next_interval() == NO_MORE:
                    self._start = self._end = NO_MORE
                    return NO_MORE
                i = 1
        self._start = subs[0].start()
        self._end = subs[-1].end()
        return self._start


class _OrderedIt(_It):
    """OrderedIntervalsSource.OrderedIntervalIterator — lazy-minimizing
    in-order conjunction (``OrderedIntervalsSource.java:101-181``)."""

    def __init__(self, subs):
        self.subs = subs
        self._start = self._end = self._slop = -1
        self.i = 1
        # reset(): prime the first sub
        subs[0].next_interval()

    def start(self) -> int:
        return self._start

    def end(self) -> int:
        return self._end

    def gaps(self) -> int:
        return self._slop

    def next_interval(self) -> int:
        self._start = self._end = self._slop = NO_MORE
        last_start = MAX_INT
        minimizing = False
        subs = self.subs
        current_index = self.i
        while True:
            prev_end = subs[current_index - 1].end()
            while True:
                if prev_end >= last_start:
                    self.i = current_index
                    return self._start
                if current_index == len(subs):
                    break
                current = subs[current_index]
                if minimizing and current.start() > prev_end:
                    break
                while True:
                    if current.end() >= last_start:
                        self.i = current_index
                        return self._start
                    current_start = current.next_interval()
                    if current_start == NO_MORE:
                        self.i = current_index
                        return self._start
                    if current_start > prev_end:
                        break
                current_index += 1
                prev_end = current.end()
            first = subs[0]
            start = first.start()
            self._start = start
            if start == NO_MORE:
                self.i = current_index
                self._end = NO_MORE
                return NO_MORE
            last = subs[-1]
            end = last.end()
            self._end = end
            slop = end - start + 1
            for s in subs:
                slop -= s.width()
            self._slop = slop
            current_index = 1
            if first.next_interval() == NO_MORE:
                self.i = current_index
                return start
            last_start = last.start()
            minimizing = True


class _UnorderedIt(_It):
    """UnorderedIntervalsSource.UnorderedIntervalIterator — priority
    queue keyed (start asc, end desc), queueEnd right extreme
    (``UnorderedIntervalsSource.java:86-170``)."""

    @staticmethod
    def _less(a, b) -> bool:
        # Comparator.comparingInt(start).thenComparing(end reversed)
        sa, sb = a.start(), b.start()
        return sa < sb or (sa == sb and a.end() > b.end())

    def __init__(self, subs):
        self.subs = subs
        self._start = self._end = -1
        self._slop = 0
        self.queue = _Heap(len(subs), self._less)
        self.queue_end = -1
        # reset()
        for it in subs:
            if it.next_interval() == NO_MORE:
                break
            self.queue.add(it)
            self._update_right_extreme(it)

    def _update_right_extreme(self, it) -> None:
        e = it.end()
        if e > self.queue_end:
            self.queue_end = e

    def start(self) -> int:
        return self._start

    def end(self) -> int:
        return self._end

    def gaps(self) -> int:
        return self._slop

    def next_interval(self) -> int:
        n = len(self.subs)
        q = self.queue
        # first, find a matching interval
        while q.size == n and q.top().start() == self._start:
            it = q.pop()
            if it.next_interval() != NO_MORE:
                q.add(it)
                self._update_right_extreme(it)
        if q.size < n:
            self._start = self._end = NO_MORE
            return NO_MORE
        # then, minimize it
        while True:
            self._start = q.top().start()
            self._end = self.queue_end
            slop = self.width()
            for it in self.subs:
                slop -= it.width()
            self._slop = slop
            if q.top().end() == self._end:
                return self._start
            it = q.pop()
            if it.next_interval() != NO_MORE:
                q.add(it)
                self._update_right_extreme(it)
            if not (q.size == n and self._end == self.queue_end):
                return self._start


class _SentinelIt(_It):
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def start(self) -> int:
        return self.v

    def end(self) -> int:
        return self.v

    def gaps(self) -> int:
        return 0

    def next_interval(self) -> int:
        return NO_MORE


_EMPTY = _SentinelIt(-1)
_EXHAUSTED = _SentinelIt(NO_MORE)


class _DisjunctionIt(_It):
    """DisjunctionIntervalsSource.DisjunctionIntervalIterator — queue
    keyed (end asc, start desc); suppresses intervals containing the
    current one (``DisjunctionIntervalsSource.java:154-272``).

    ``subs``: only the sub-iterators whose source MATCHES this doc (the
    reference's DisiPriorityQueue topList at the current doc)."""

    @staticmethod
    def _less(a, b) -> bool:
        # Comparator.comparingInt(end).thenComparing(start reversed)
        ea, eb = a.end(), b.end()
        return ea < eb or (ea == eb and a.start() > b.start())

    def __init__(self, subs):
        self.queue = _Heap(len(subs), self._less)
        self.current = _EMPTY
        for it in subs:
            it.next_interval()
            self.queue.add(it)

    def start(self) -> int:
        return self.current.start()

    def end(self) -> int:
        return self.current.end()

    def gaps(self) -> int:
        return self.current.gaps()

    def next_interval(self) -> int:
        q = self.queue
        if self.current is _EMPTY or self.current is _EXHAUSTED:
            if q.size > 0:
                self.current = q.top()
            return self.current.start()
        start, end = self.current.start(), self.current.end()
        while q.size > 0 and self._contains(q.top(), start, end):
            it = q.pop()
            if it.next_interval() != NO_MORE:
                q.add(it)
        if q.size == 0:
            self.current = _EXHAUSTED
            return NO_MORE
        self.current = q.top()
        return self.current.start()

    @staticmethod
    def _contains(it, start: int, end: int) -> bool:
        return (
            start >= it.start()
            and start <= it.end()
            and end >= it.start()
            and end <= it.end()
        )


class _AtLeastIt(_It):
    """MinimumShouldMatchIntervalsSource.MinimumShouldMatchIntervalIterator
    — unordered-AND over the best ``msm`` of the subs, with a background
    (end asc, start desc) queue feeding the proximity (start asc, end
    desc) queue (``MinimumShouldMatchIntervalsSource.java:160-290``)."""

    def __init__(self, subs, msm: int):
        self.msm = msm
        self._start = self._end = -1
        self._slop = 0
        self.queue_end = -1
        self.proximity = _Heap(msm, _UnorderedIt._less)
        self.background = _Heap(len(subs), _DisjunctionIt._less)
        # reset(): background <- positioned subs, then pop msm into
        # proximity
        for it in subs:
            if it.next_interval() != NO_MORE:
                self.background.add(it)
        for _ in range(msm):
            it = self.background.pop()
            if it is None:
                break
            self.proximity.add(it)
            self._update_right_extreme(it)

    def _update_right_extreme(self, it) -> None:
        e = it.end()
        if e > self.queue_end:
            self.queue_end = e

    def start(self) -> int:
        return self._start

    def end(self) -> int:
        return self._end

    def gaps(self) -> int:
        return self._slop

    def next_interval(self) -> int:
        pq, bq, msm = self.proximity, self.background, self.msm
        # first, find a matching interval beyond the current start
        while pq.size == msm and pq.top().start() == self._start:
            it = pq.pop()
            if it is not None and it.next_interval() != NO_MORE:
                bq.add(it)
                nxt = bq.pop()
                pq.add(nxt)
                self._update_right_extreme(nxt)
        if pq.size < msm:
            self._start = self._end = NO_MORE
            return NO_MORE
        # then, minimize it
        while True:
            self._start = pq.top().start()
            self._end = self.queue_end
            slop = self.width()
            for it in pq.members():
                slop -= it.width()
            self._slop = slop
            if pq.top().end() == self._end:
                return self._start
            lead = pq.pop()
            if lead is not None:
                if lead.next_interval() != NO_MORE:
                    bq.add(lead)
                nxt = bq.pop()
                if nxt is not None:
                    pq.add(nxt)
                    self._update_right_extreme(nxt)
            if not (pq.size == msm and self._end == self.queue_end):
                return self._start


class _FilterIt(_It):
    """IntervalFilter: skip intervals failing ``accept``
    (``IntervalFilter.java`` / FilteredIntervalsSource.accept)."""

    def __init__(self, inner, accept):
        self.inner = inner
        self.accept = accept

    def start(self) -> int:
        return self.inner.start()

    def end(self) -> int:
        return self.inner.end()

    def gaps(self) -> int:
        return self.inner.gaps()

    def width(self) -> int:
        return self.inner.width()

    def next_interval(self) -> int:
        while True:
            nxt = self.inner.next_interval()
            if nxt == NO_MORE or self.accept(self.inner):
                return nxt


class _ExtendedIt(_It):
    """ExtendedIntervalIterator (``ExtendedIntervalIterator.java``)."""

    def __init__(self, inner, before: int, after: int):
        self.inner = inner
        self.before = before
        self.after = after
        self.positioned = False

    def start(self) -> int:
        if not self.positioned:
            return -1
        s = self.inner.start()
        if s == NO_MORE:
            return NO_MORE
        return max(0, s - self.before)

    def end(self) -> int:
        if not self.positioned:
            return -1
        e = self.inner.end()
        if e == NO_MORE:
            return NO_MORE
        e += self.after
        if e >= NO_MORE:  # int overflow clamp
            e = NO_MORE - 1
        return e

    def gaps(self) -> int:
        return self.inner.gaps()

    def next_interval(self) -> int:
        self.positioned = True
        self.inner.next_interval()
        return self.start()


class _OffsetIt(_It):
    """OffsetIntervalsSource iterator: a length-1 pseudo-interval one
    position before/after each inner interval
    (``OffsetIntervalsSource.java:51-86``)."""

    def __init__(self, inner, before: bool):
        self.inner = inner
        self.before = before

    def start(self) -> int:
        if self.before:
            pos = self.inner.start()
            if pos == -1:
                return -1
            if pos == NO_MORE:
                return NO_MORE
            return max(0, pos - 1)
        pos = self.inner.end() + 1
        if pos == 0:
            return -1
        if pos >= NO_MORE:
            return NO_MORE if pos == NO_MORE + 1 else NO_MORE - 1
        return pos

    def end(self) -> int:
        return self.start()

    def gaps(self) -> int:
        return 0

    def next_interval(self) -> int:
        self.inner.next_interval()
        return self.start()


class _ContainingIt(_It):
    """ContainingIntervalsSource combine (FilteringIntervalIterator:
    big intervals containing at least one small interval)."""

    def __init__(self, a, b, b_matches: bool):
        self.a = a
        self.b = b
        # reset(): bpos = b.nextInterval() != NO_MORE
        self.bpos = b_matches and b.next_interval() != NO_MORE

    def start(self) -> int:
        return NO_MORE if not self.bpos else self.a.start()

    def end(self) -> int:
        return NO_MORE if not self.bpos else self.a.end()

    def gaps(self) -> int:
        return self.a.gaps()

    def next_interval(self) -> int:
        if not self.bpos:
            return NO_MORE
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.start() < a.start() and b.end() < a.end():
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    return NO_MORE
            if a.start() <= b.start() and a.end() >= b.end():
                return a.start()
        return NO_MORE


class _ContainedByIt(_It):
    """ContainedByIntervalsSource combine (small intervals inside at
    least one big interval)."""

    def __init__(self, a, b, b_matches: bool):
        self.a = a
        self.b = b
        self.bpos = b_matches and b.next_interval() != NO_MORE

    def start(self) -> int:
        return NO_MORE if not self.bpos else self.a.start()

    def end(self) -> int:
        return NO_MORE if not self.bpos else self.a.end()

    def gaps(self) -> int:
        return self.a.gaps()

    def next_interval(self) -> int:
        if not self.bpos:
            return NO_MORE
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.end() < a.end():
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    return NO_MORE
            if b.start() <= a.start():
                return a.start()
        self.bpos = False
        return NO_MORE


class _NotContainingIt(_It):
    """NotContainingIntervalsSource.NotContainingIterator
    (RelativeIterator: start/end/gaps delegate to the minuend)."""

    def __init__(self, a, b, b_matches: bool):
        self.a = a
        self.b = b
        # RelativeIterator.reset(): bpos = subtrahend is on this doc
        self.bpos = b_matches

    def start(self) -> int:
        return self.a.start()

    def end(self) -> int:
        return self.a.end()

    def gaps(self) -> int:
        return self.a.gaps()

    def next_interval(self) -> int:
        a, b = self.a, self.b
        if not self.bpos:
            return a.next_interval()
        while a.next_interval() != NO_MORE:
            while b.start() < a.start() and b.end() < a.end():
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    return a.start()
            if b.start() > a.end():
                return a.start()
        return NO_MORE


class _NotContainedByIt(_It):
    """NotContainedByIntervalsSource.NotContainedByIterator."""

    def __init__(self, a, b, b_matches: bool):
        self.a = a
        self.b = b
        self.bpos = b_matches

    def start(self) -> int:
        return self.a.start()

    def end(self) -> int:
        return self.a.end()

    def gaps(self) -> int:
        return self.a.gaps()

    def next_interval(self) -> int:
        a, b = self.a, self.b
        if not self.bpos:
            return a.next_interval()
        while a.next_interval() != NO_MORE:
            while b.end() < a.end():
                if b.next_interval() == NO_MORE:
                    return a.start()
            if a.start() < b.start():
                return a.start()
        return NO_MORE


class _OverlappingIt(_It):
    """OverlappingIntervalsSource combine (FilteringIntervalIterator)."""

    def __init__(self, a, b, b_matches: bool):
        self.a = a
        self.b = b
        self.bpos = b_matches and b.next_interval() != NO_MORE

    def start(self) -> int:
        return NO_MORE if not self.bpos else self.a.start()

    def end(self) -> int:
        return NO_MORE if not self.bpos else self.a.end()

    def gaps(self) -> int:
        return self.a.gaps()

    def next_interval(self) -> int:
        if not self.bpos:
            return NO_MORE
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.end() < a.start():
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    return NO_MORE
            if b.start() <= a.end():
                return a.start()
        self.bpos = False
        return NO_MORE


class _NonOverlappingIt(_It):
    """NonOverlappingIntervalsSource.NonOverlappingIterator
    (RelativeIterator)."""

    def __init__(self, a, b, b_matches: bool):
        self.a = a
        self.b = b
        self.bpos = b_matches

    def start(self) -> int:
        return self.a.start()

    def end(self) -> int:
        return self.a.end()

    def gaps(self) -> int:
        return self.a.gaps()

    def next_interval(self) -> int:
        a, b = self.a, self.b
        if not self.bpos:
            return a.next_interval()
        while a.next_interval() != NO_MORE:
            while b.end() < a.start():
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    return a.start()
            if b.start() > a.end():
                return a.start()
        return NO_MORE


class _RepeatingIt(_It):
    """RepeatingIntervalsSource.DuplicateIntervalIterator: n copies of
    one source stacked into a sliding cache of the last n intervals
    (``RepeatingIntervalsSource.java:128-232``, bug-compatible width)."""

    def __init__(self, inner, n: int):
        self.inner = inner
        self.n = n
        self.cache = [-1] * (2 * n)
        self.cache_base = 0
        self.started = False
        self.exhausted = False

    def start(self) -> int:
        if self.exhausted:
            return NO_MORE
        return self.cache[(self.cache_base % self.n) * 2]

    def end(self) -> int:
        if self.exhausted:
            return NO_MORE
        return self.cache[((self.cache_base + self.n - 1) % self.n) * 2 + 1]

    def width(self) -> int:
        # NOTE: reference computes start - end + 1 per child
        # (RepeatingIntervalsSource.java width()) — kept bit-for-bit
        w = 0
        for i in range(self.n):
            p = (self.cache_base + i) % self.n
            w += self.cache[p * 2] - self.cache[p * 2 + 1] + 1
        return w

    def gaps(self) -> int:
        return (self.end() - self.start() + 1) - self.width()

    def _cache_next(self, line: int) -> int:
        if self.inner.next_interval() == NO_MORE:
            self.exhausted = True
            return NO_MORE
        self.cache[line * 2] = self.inner.start()
        self.cache[line * 2 + 1] = self.inner.end()
        return self.start()

    def next_interval(self) -> int:
        if self.exhausted:
            return NO_MORE
        if not self.started:
            for i in range(self.n):
                if self._cache_next(i) == NO_MORE:
                    return NO_MORE
            self.cache_base = 0
            self.started = True
            return self.start()
        insert = (self.cache_base + self.n) % self.n
        self.cache_base = (self.cache_base + 1) % self.n
        return self._cache_next(insert)


# ----------------------------------------------------------------- sources


class IntervalsSource:
    def min_extent(self) -> int:
        raise NotImplementedError

    def terms(self) -> set:
        """All concrete terms this source reads (QueryVisitor role)."""
        raise NotImplementedError

    def matches_approx(self, pos_of: dict) -> bool:
        """The source's DocIdSetIterator approximation at one doc."""
        raise NotImplementedError

    def iterator(self, pos_of: dict) -> _It:
        """Fresh per-doc iterator; only called when matches_approx."""
        raise NotImplementedError

    def pull_up_disjunctions(self) -> list:
        return [self]


@dataclass(frozen=True)
class Term(IntervalsSource):
    term: str

    def min_extent(self) -> int:
        return 1

    def terms(self) -> set:
        return {self.term}

    def matches_approx(self, pos_of: dict) -> bool:
        return len(pos_of.get(self.term, ())) > 0

    def iterator(self, pos_of: dict) -> _It:
        return _TermIt(pos_of.get(self.term, ()))


@dataclass(frozen=True, eq=False)
class PayloadFilteredTerm(IntervalsSource):
    """``PayloadFilteredTermIntervalsSource.java:36-148``: a term leaf
    whose positions are filtered by a payload predicate — the iterator
    skips positions failing ``filter.test(getPayload())`` (the
    ``nextInterval`` do/while at :118-126).  ``filter`` receives the
    position's payload bytes, or ``None`` where no payload was indexed
    (the reference's null ``getPayload()``).

    Deliberately NOT a ``Term`` subclass: the across-docs fast sweeps
    pattern-match concrete ``Term`` leaves and know nothing about
    payloads, so this leaf must fall through to the generic per-doc
    iterator path.  Like the reference (equals/hashCode at :232-244),
    identity compares the term only — predicates are opaque."""

    term: str
    filter: object  # callable bytes|None -> bool

    def min_extent(self) -> int:
        return 1  # :229

    def terms(self) -> set:
        return {self.term}

    def __eq__(self, other):
        return isinstance(other, PayloadFilteredTerm) and other.term == self.term

    def __hash__(self):
        return hash(("payload_filtered", self.term))

    def matches_approx(self, pos_of: dict) -> bool:
        # doc-level approximation is the unfiltered term (the reference
        # approximates with the raw PostingsEnum; the filter only runs
        # in nextInterval) — an all-filtered doc enumerates zero
        # intervals and scores 0 like a two-phase non-match
        return len(pos_of.get(self.term, ())) > 0

    def iterator(self, pos_of: dict) -> _It:
        pos = pos_of.get(self.term, ())
        pays = pos_of.get(("pay", self.term))
        f = self.filter
        if pays is None:
            kept = [p for p in pos if f(None)]
        else:
            kept = [p for p, b in zip(pos, pays) if f(b)]
        return _TermIt(kept)

    def pull_up_disjunctions(self) -> list:
        return [self]  # :234


@dataclass(frozen=True)
class NoMatch(IntervalsSource):
    reason: str = ""

    def min_extent(self) -> int:
        return 0

    def terms(self) -> set:
        return set()

    def matches_approx(self, pos_of: dict) -> bool:
        return False

    def iterator(self, pos_of: dict) -> _It:
        return _EXHAUSTED


@dataclass(frozen=True)
class MultiTerm(IntervalsSource):
    """``MultiTermIntervalsSource``: a term-predicate leaf (prefix /
    wildcard / regexp / fuzzy / range — one matcher source with the
    MultiTermQuery family, ``search/multiterm.py``) that the ENGINE
    expands per segment against the term dictionary into a raw
    disjunction over the matching terms, erroring past
    ``max_expansions`` exactly like the reference's TermsEnum loop
    (``MultiTermIntervalsSource.java:18-43``). Evaluating it without
    expansion is a usage error."""

    mode: str
    args: tuple
    max_expansions: int = DEFAULT_MAX_EXPANSIONS
    pattern: str = ""

    def min_extent(self) -> int:
        return 1

    def terms(self) -> set:
        return set()

    def matches_approx(self, pos_of: dict) -> bool:
        raise RuntimeError(
            "MultiTerm interval source must be expanded against a term "
            "dictionary first (kernels.expand_interval_source)"
        )

    def iterator(self, pos_of: dict) -> _It:
        raise RuntimeError(
            "MultiTerm interval source must be expanded against a term "
            "dictionary first (kernels.expand_interval_source)"
        )


def multi_terms(source: IntervalsSource) -> list:
    """All MultiTerm leaves of a source tree, in walk order."""
    if isinstance(source, MultiTerm):
        return [source]
    if isinstance(source, (_Conjunction, Or, AtLeast)):
        out: list = []
        for s in source.subs:
            out.extend(multi_terms(s))
        return out
    if isinstance(source, _Difference):
        return multi_terms(source.minuend) + multi_terms(source.subtrahend)
    if isinstance(source, (MaxGaps, MaxWidth, Extended, Offset, Repeating)):
        return multi_terms(source.sub)
    return []


def map_multi_terms(source: IntervalsSource, fn) -> IntervalsSource:
    """Rebuild a source tree with ``fn`` applied to every MultiTerm
    leaf (the per-segment dictionary-expansion walk)."""
    if isinstance(source, MultiTerm):
        return fn(source)
    if isinstance(source, (Block, Ordered, Unordered, Containing,
                           ContainedBy, Overlapping)):
        return type(source)(
            tuple(map_multi_terms(s, fn) for s in source.subs)
        )
    if isinstance(source, Or):
        return Or(
            tuple(map_multi_terms(s, fn) for s in source.subs),
            source.rewrite,
        )
    if isinstance(source, AtLeast):
        return AtLeast(
            tuple(map_multi_terms(s, fn) for s in source.subs), source.msm
        )
    if isinstance(source, (NotContaining, NotContainedBy, NonOverlapping)):
        return type(source)(
            map_multi_terms(source.minuend, fn),
            map_multi_terms(source.subtrahend, fn),
        )
    if isinstance(source, MaxGaps):
        return MaxGaps(map_multi_terms(source.sub, fn), source.max_gaps)
    if isinstance(source, MaxWidth):
        return MaxWidth(map_multi_terms(source.sub, fn), source.max_width)
    if isinstance(source, Extended):
        return Extended(
            map_multi_terms(source.sub, fn), source.before, source.after
        )
    if isinstance(source, Offset):
        return Offset(map_multi_terms(source.sub, fn), source.preceding)
    if isinstance(source, Repeating):
        return Repeating(map_multi_terms(source.sub, fn), source.count)
    return source


class _Conjunction(IntervalsSource):
    """Shared doc approximation for conjunction-combined sources
    (ConjunctionIntervalsSource: ConjunctionUtils.intersectIterators)."""

    subs: tuple

    def terms(self) -> set:
        out: set = set()
        for s in self.subs:
            out |= s.terms()
        return out

    def matches_approx(self, pos_of: dict) -> bool:
        return all(s.matches_approx(pos_of) for s in self.subs)


@dataclass(frozen=True)
class Block(_Conjunction):
    subs: tuple

    def min_extent(self) -> int:
        return sum(s.min_extent() for s in self.subs)

    def iterator(self, pos_of: dict) -> _It:
        return _BlockIt([s.iterator(pos_of) for s in self.subs])


@dataclass(frozen=True)
class Ordered(_Conjunction):
    subs: tuple

    def min_extent(self) -> int:
        return sum(s.min_extent() for s in self.subs)

    def iterator(self, pos_of: dict) -> _It:
        return _OrderedIt([s.iterator(pos_of) for s in self.subs])

    def pull_up_disjunctions(self) -> list:
        return _pull_up_list(list(self.subs), lambda l: Ordered(tuple(l)))


@dataclass(frozen=True)
class Unordered(_Conjunction):
    subs: tuple

    def min_extent(self) -> int:
        return sum(s.min_extent() for s in self.subs)

    def iterator(self, pos_of: dict) -> _It:
        return _UnorderedIt([s.iterator(pos_of) for s in self.subs])

    def pull_up_disjunctions(self) -> list:
        return _pull_up_list(list(self.subs), lambda l: Unordered(tuple(l)))


@dataclass(frozen=True)
class Repeating(IntervalsSource):
    sub: IntervalsSource
    count: int

    def min_extent(self) -> int:
        return self.sub.min_extent()

    def terms(self) -> set:
        return self.sub.terms()

    def matches_approx(self, pos_of: dict) -> bool:
        return self.sub.matches_approx(pos_of)

    def iterator(self, pos_of: dict) -> _It:
        return _RepeatingIt(self.sub.iterator(pos_of), self.count)


@dataclass(frozen=True)
class Or(IntervalsSource):
    subs: tuple
    rewrite: bool = True  # pullUpDisjunctions flag

    def min_extent(self) -> int:
        return min(s.min_extent() for s in self.subs)

    def terms(self) -> set:
        out: set = set()
        for s in self.subs:
            out |= s.terms()
        return out

    def matches_approx(self, pos_of: dict) -> bool:
        return any(s.matches_approx(pos_of) for s in self.subs)

    def iterator(self, pos_of: dict) -> _It:
        return _DisjunctionIt(
            [s.iterator(pos_of) for s in self.subs if s.matches_approx(pos_of)]
        )

    def pull_up_disjunctions(self) -> list:
        if self.rewrite:
            return list(self.subs)
        return [self]


@dataclass(frozen=True)
class MaxGaps(IntervalsSource):
    sub: IntervalsSource
    max_gaps: int

    def min_extent(self) -> int:
        return self.sub.min_extent()

    def terms(self) -> set:
        return self.sub.terms()

    def matches_approx(self, pos_of: dict) -> bool:
        return self.sub.matches_approx(pos_of)

    def iterator(self, pos_of: dict) -> _It:
        mg = self.max_gaps
        return _FilterIt(self.sub.iterator(pos_of), lambda it: it.gaps() <= mg)


@dataclass(frozen=True)
class MaxWidth(IntervalsSource):
    sub: IntervalsSource
    max_width: int

    def min_extent(self) -> int:
        return self.sub.min_extent()

    def terms(self) -> set:
        return self.sub.terms()

    def matches_approx(self, pos_of: dict) -> bool:
        return self.sub.matches_approx(pos_of)

    def iterator(self, pos_of: dict) -> _It:
        mw = self.max_width
        return _FilterIt(
            self.sub.iterator(pos_of),
            lambda it: (it.end() - it.start()) + 1 <= mw,
        )

    def pull_up_disjunctions(self) -> list:
        return _pull_up_one(self.sub, lambda s: MaxWidth(s, self.max_width))


@dataclass(frozen=True)
class Extended(IntervalsSource):
    sub: IntervalsSource
    before: int
    after: int

    def min_extent(self) -> int:
        me = self.before + self.sub.min_extent() + self.after
        return MAX_INT if me < 0 or me > MAX_INT else me

    def terms(self) -> set:
        return self.sub.terms()

    def matches_approx(self, pos_of: dict) -> bool:
        return self.sub.matches_approx(pos_of)

    def iterator(self, pos_of: dict) -> _It:
        return _ExtendedIt(self.sub.iterator(pos_of), self.before, self.after)

    def pull_up_disjunctions(self) -> list:
        return _pull_up_one(
            self.sub, lambda s: Extended(s, self.before, self.after)
        )


@dataclass(frozen=True)
class Offset(IntervalsSource):
    """OffsetIntervalsSource: the length-1 position just before/after
    each inner interval (used by before()/after())."""

    sub: IntervalsSource
    preceding: bool

    def min_extent(self) -> int:
        return 1

    def terms(self) -> set:
        return self.sub.terms()

    def matches_approx(self, pos_of: dict) -> bool:
        return self.sub.matches_approx(pos_of)

    def iterator(self, pos_of: dict) -> _It:
        return _OffsetIt(self.sub.iterator(pos_of), self.preceding)


@dataclass(frozen=True)
class Containing(_Conjunction):
    subs: tuple  # (big, small)

    def min_extent(self) -> int:
        return self.subs[0].min_extent()

    def iterator(self, pos_of: dict) -> _It:
        big, small = self.subs
        return _ContainingIt(
            big.iterator(pos_of), small.iterator(pos_of), True
        )

    def pull_up_disjunctions(self) -> list:
        return _pull_up_one(
            self.subs[0], lambda s: Containing((s, self.subs[1]))
        )


@dataclass(frozen=True)
class ContainedBy(_Conjunction):
    subs: tuple  # (small, big)

    def min_extent(self) -> int:
        return self.subs[0].min_extent()

    def iterator(self, pos_of: dict) -> _It:
        small, big = self.subs
        return _ContainedByIt(
            small.iterator(pos_of), big.iterator(pos_of), True
        )

    def pull_up_disjunctions(self) -> list:
        return _pull_up_one(
            self.subs[1], lambda s: ContainedBy((self.subs[0], s))
        )


class _Difference(IntervalsSource):
    """DifferenceIntervalsSource doc shape: docs come from the minuend
    only; the subtrahend may or may not be present on a doc."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def min_extent(self) -> int:
        return self.minuend.min_extent()

    def terms(self) -> set:
        return self.minuend.terms() | self.subtrahend.terms()

    def matches_approx(self, pos_of: dict) -> bool:
        return self.minuend.matches_approx(pos_of)


@dataclass(frozen=True)
class NotContaining(_Difference):
    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def iterator(self, pos_of: dict) -> _It:
        bm = self.subtrahend.matches_approx(pos_of)
        return _NotContainingIt(
            self.minuend.iterator(pos_of),
            self.subtrahend.iterator(pos_of) if bm else _EXHAUSTED,
            bm,
        )


@dataclass(frozen=True)
class AtLeast(IntervalsSource):
    """MinimumShouldMatchIntervalsSource: spans covering intervals from
    at least ``msm`` of the subs (disjunctive doc approximation)."""

    subs: tuple
    msm: int

    def min_extent(self) -> int:
        extents = sorted(s.min_extent() for s in self.subs)
        return sum(extents[: self.msm])

    def terms(self) -> set:
        out: set = set()
        for s in self.subs:
            out |= s.terms()
        return out

    def matches_approx(self, pos_of: dict) -> bool:
        return any(s.matches_approx(pos_of) for s in self.subs)

    def iterator(self, pos_of: dict) -> _It:
        return _AtLeastIt(
            [s.iterator(pos_of) for s in self.subs if s.matches_approx(pos_of)],
            self.msm,
        )


@dataclass(frozen=True)
class Overlapping(_Conjunction):
    """OverlappingIntervalsSource: source intervals overlapping at
    least one reference interval."""

    subs: tuple  # (source, reference)

    def min_extent(self) -> int:
        return self.subs[0].min_extent()

    def iterator(self, pos_of: dict) -> _It:
        a, b = self.subs
        return _OverlappingIt(a.iterator(pos_of), b.iterator(pos_of), True)

    def pull_up_disjunctions(self) -> list:
        return _pull_up_list(
            list(self.subs), lambda l: Overlapping((l[0], l[1]))
        )


@dataclass(frozen=True)
class NonOverlapping(_Difference):
    """NonOverlappingIntervalsSource: minuend intervals not overlapping
    any subtrahend interval."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def iterator(self, pos_of: dict) -> _It:
        bm = self.subtrahend.matches_approx(pos_of)
        return _NonOverlappingIt(
            self.minuend.iterator(pos_of),
            self.subtrahend.iterator(pos_of) if bm else _EXHAUSTED,
            bm,
        )


@dataclass(frozen=True)
class NotContainedBy(_Difference):
    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def iterator(self, pos_of: dict) -> _It:
        bm = self.subtrahend.matches_approx(pos_of)
        return _NotContainedByIt(
            self.minuend.iterator(pos_of),
            self.subtrahend.iterator(pos_of) if bm else _EXHAUSTED,
            bm,
        )


# -------------------------------------------------- disjunction pull-up


def _split_disjunctions(source: IntervalsSource) -> list:
    """Disjunctions.splitDisjunctions: group min_extent==1 disjuncts
    back into one ``or`` (overlapping length-1 intervals are
    indistinguishable), keep wider disjuncts separate."""
    singles: list = []
    non_singles: list = []
    for d in source.pull_up_disjunctions():
        (singles if d.min_extent() == 1 else non_singles).append(d)
    out: list = []
    if singles:
        out.append(or_(*singles))
    out.extend(non_singles)
    return out


def _pull_up_list(sources: list, ctor) -> list:
    """Disjunctions.pullUp(List, Function): cartesian-expand each
    source's disjuncts, capped at MAX_CLAUSES combinations."""
    rewritten: list = [[]]
    for source in sources:
        disjuncts = _split_disjunctions(source)
        if len(disjuncts) == 1:
            for l in rewritten:
                l.append(disjuncts[0])
        else:
            if len(rewritten) * len(disjuncts) > MAX_CLAUSES:
                raise ValueError("Too many disjunctions to expand")
            rewritten = [l + [d] for d in disjuncts for l in rewritten]
    return [ctor(l) for l in rewritten]


def _pull_up_one(source: IntervalsSource, fn) -> list:
    disjuncts = _split_disjunctions(source)
    return [fn(d) for d in disjuncts]


# ---------------------------------------------------------- factories


def term(t: str) -> IntervalsSource:
    return Term(str(t))


def payload_filtered_term(t: str, filter) -> IntervalsSource:
    """Intervals.payloadFilteredTerm (``Intervals.java``): a term leaf
    keeping only positions whose indexed payload passes ``filter``
    (a callable over payload bytes; receives ``None`` at positions
    without a payload).  Requires an index built with payloads —
    querying a payload-free index raises, mirroring the reference's
    "no indexed payloads" IllegalArgumentException."""
    return PayloadFilteredTerm(str(t), filter)


def payload_terms(source: IntervalsSource) -> set:
    """Terms under PayloadFilteredTerm leaves of a source tree — the
    engine decodes these terms' per-position payload streams alongside
    positions when building the per-doc evaluation context."""
    if isinstance(source, PayloadFilteredTerm):
        return {source.term}
    if isinstance(source, (_Conjunction, Or, AtLeast)):
        out: set = set()
        for s in source.subs:
            out |= payload_terms(s)
        return out
    if isinstance(source, _Difference):
        return payload_terms(source.minuend) | payload_terms(source.subtrahend)
    if isinstance(source, (MaxGaps, MaxWidth, Extended, Offset, Repeating)):
        return payload_terms(source.sub)
    return set()


def _dedupe_ordered(sources: list) -> list:
    """OrderedIntervalsSource.deduplicate: consecutive equal sources
    collapse into a Repeating source."""
    out: list = []
    current: list = []
    for s in sources:
        if not current or current[0] == s:
            current.append(s)
        else:
            out.append(_repeating(current[0], len(current)))
            current = [s]
    out.append(_repeating(current[0], len(current)))
    return out


def _repeating(s: IntervalsSource, n: int) -> IntervalsSource:
    return s if n == 1 else Repeating(s, n)


def _dedupe_unordered(sources: list) -> list:
    """UnorderedIntervalsSource.deduplicate: count multiplicity per
    distinct source (insertion order preserved)."""
    counts: dict = {}
    for s in sources:
        counts[s] = counts.get(s, 0) + 1
    return [_repeating(s, n) for s, n in counts.items()]


def ordered(*subs) -> IntervalsSource:
    subs = [_as_source(s) for s in subs]
    if len(subs) == 1:
        return subs[0]
    rewritten = _dedupe_ordered(subs)
    if len(rewritten) == 1:
        return rewritten[0]
    return Ordered(tuple(rewritten))


def unordered(*subs) -> IntervalsSource:
    subs = [_as_source(s) for s in subs]
    if len(subs) == 1:
        return subs[0]
    rewritten = _dedupe_unordered(subs)
    if len(rewritten) == 1:
        return rewritten[0]
    return Unordered(tuple(rewritten))


def phrase(*subs) -> IntervalsSource:
    """Intervals.phrase / BlockIntervalsSource.build: disjunctions are
    pulled to the top so BLOCK only ever sees flat conjuncts."""
    subs = [_as_source(s) for s in subs]
    if len(subs) == 1:
        return subs[0]
    blocks = _pull_up_list(subs, lambda l: Block(tuple(_flatten_blocks(l))))
    return or_(*blocks)


def _flatten_blocks(sources: list) -> list:
    out: list = []
    for s in sources:
        if isinstance(s, Block):
            out.extend(s.subs)
        else:
            out.append(s)
    return out


def or_(*subs, rewrite: bool = True) -> IntervalsSource:
    """Intervals.or / DisjunctionIntervalsSource.create (insertion-order
    dedupe in place of the reference's HashSet)."""
    subs = [_as_source(s) for s in subs]
    seen: dict = {}
    for s in subs:
        seen.setdefault(s, None)
    uniq = list(seen)
    if len(uniq) == 1:
        return uniq[0]
    return Or(tuple(uniq), rewrite)


def maxgaps(gaps: int, sub) -> IntervalsSource:
    """Intervals.maxgaps: pulled-up per disjunct at build
    (FilteredIntervalsSource.maxGaps)."""
    sub = _as_source(sub)
    return or_(*[MaxGaps(s, gaps) for s in _split_disjunctions(sub)])


def maxwidth(width: int, sub) -> IntervalsSource:
    return MaxWidth(_as_source(sub), width)


def extend(sub, before: int, after: int) -> IntervalsSource:
    return Extended(_as_source(sub), before, after)


def containing(big, small) -> IntervalsSource:
    """Intervals.containing / ContainingIntervalsSource.build."""
    big, small = _as_source(big), _as_source(small)
    return or_(*_pull_up_one(big, lambda s: Containing((s, small))))


def contained_by(small, big) -> IntervalsSource:
    small, big = _as_source(small), _as_source(big)
    return or_(*_pull_up_one(big, lambda s: ContainedBy((small, s))))


def not_containing(minuend, subtrahend) -> IntervalsSource:
    minuend, subtrahend = _as_source(minuend), _as_source(subtrahend)
    return or_(
        *_pull_up_one(minuend, lambda s: NotContaining(s, subtrahend))
    )


def not_contained_by(minuend, subtrahend) -> IntervalsSource:
    minuend, subtrahend = _as_source(minuend), _as_source(subtrahend)
    return or_(
        *_pull_up_one(subtrahend, lambda s: NotContainedBy(minuend, s))
    )


def before(source, reference) -> IntervalsSource:
    """Intervals.before: source intervals wholly before the reference
    (``Intervals.java:582-585``)."""
    source, reference = _as_source(source), _as_source(reference)
    return contained_by(
        source, Extended(Offset(reference, preceding=True), MAX_INT, 0)
    )


def after(source, reference) -> IntervalsSource:
    source, reference = _as_source(source), _as_source(reference)
    return contained_by(
        source, Extended(Offset(reference, preceding=False), 0, MAX_INT)
    )


def unordered_no_overlaps(a, b) -> IntervalsSource:
    """Intervals.unorderedNoOverlaps = or(ordered(a,b), ordered(b,a))."""
    a, b = _as_source(a), _as_source(b)
    return or_(ordered(a, b), ordered(b, a))


def overlapping(source, reference) -> IntervalsSource:
    return Overlapping((_as_source(source), _as_source(reference)))


def non_overlapping(minuend, subtrahend) -> IntervalsSource:
    return NonOverlapping(_as_source(minuend), _as_source(subtrahend))


def within(source, positions: int, reference) -> IntervalsSource:
    """Intervals.within = containedBy(source, extend(ref, n, n))."""
    return contained_by(
        _as_source(source), Extended(_as_source(reference), positions, positions)
    )


def not_within(minuend, positions: int, subtrahend) -> IntervalsSource:
    """Intervals.notWithin = nonOverlapping(minuend, extend(sub, n, n))."""
    return NonOverlapping(
        _as_source(minuend), Extended(_as_source(subtrahend), positions, positions)
    )


def at_least(min_should_match: int, *subs) -> IntervalsSource:
    """Intervals.atLeast: msm == len -> unordered; msm > len -> no
    match (``Intervals.java:566-578``)."""
    subs = [_as_source(s) for s in subs]
    if min_should_match == len(subs):
        return unordered(*subs)
    if min_should_match > len(subs):
        return NoMatch(f"Too few sources to match minimum of [{min_should_match}]")
    return AtLeast(tuple(subs), min_should_match)


def no_intervals(reason: str = "") -> IntervalsSource:
    return NoMatch(reason)


def fix_field(field: str, source) -> IntervalsSource:
    """Intervals.fixField (``FixedFieldIntervalsSource.java``): the
    wrapped source reads ``field``'s positions regardless of the
    enclosing IntervalQuery's field — useful for mixing analyzers
    across parallel fields. Implemented as a BUILD-TIME rewrite: every
    Term in the subtree becomes the FIELD-QUALIFIED term key, which the
    engine resolves verbatim (an unqualified term resolves against the
    query's field). Restricted to concrete-term subtrees (multi-term
    sources under fixField would need per-field dictionary scoping —
    out of scope, explicit error)."""
    from lucene_spark.search.ast import fielded

    source = _as_source(source)
    if multi_terms(source):
        raise NotImplementedError(
            "fix_field over multi-term interval sources is not supported"
        )

    def walk(s):
        if isinstance(s, PayloadFilteredTerm):
            return PayloadFilteredTerm(fielded(field, s.term), s.filter)
        if isinstance(s, Term):
            return Term(fielded(field, s.term))
        if isinstance(s, (Block, Ordered, Unordered, Containing,
                          ContainedBy, Overlapping, AtLeast)):
            rebuilt = tuple(walk(x) for x in s.subs)
            if isinstance(s, AtLeast):
                return AtLeast(rebuilt, s.msm)
            return type(s)(rebuilt)
        if isinstance(s, Or):
            return Or(tuple(walk(x) for x in s.subs), s.rewrite)
        if isinstance(s, (NotContaining, NotContainedBy, NonOverlapping)):
            return type(s)(walk(s.minuend), walk(s.subtrahend))
        if isinstance(s, MaxGaps):
            return MaxGaps(walk(s.sub), s.max_gaps)
        if isinstance(s, MaxWidth):
            return MaxWidth(walk(s.sub), s.max_width)
        if isinstance(s, Extended):
            return Extended(walk(s.sub), s.before, s.after)
        if isinstance(s, Offset):
            return Offset(walk(s.sub), s.preceding)
        if isinstance(s, Repeating):
            return Repeating(walk(s.sub), s.count)
        return s

    return walk(source)


def prefix(p: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS) -> IntervalsSource:
    """Intervals.prefix: terms starting with ``p``."""
    return MultiTerm("prefix", (str(p),), max_expansions, f"{p}*")


def wildcard(pattern: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS) -> IntervalsSource:
    """Intervals.wildcard: ``*``/``?`` pattern over the dictionary."""
    return MultiTerm("wildcard", (str(pattern),), max_expansions, str(pattern))


def regexp(pattern: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS) -> IntervalsSource:
    """Intervals.regexp: the reference RegExp dialect (anchored,
    ``util/automaton/RegExp.java`` grammar via ``search/lregexp.py``)."""
    return MultiTerm("lregexp", (str(pattern),), max_expansions, str(pattern))


def fuzzy_term(
    term_: str,
    max_edits: int = 2,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    transpositions: bool = True,
) -> IntervalsSource:
    """Intervals.fuzzyTerm: Damerau-Levenshtein by default like
    FuzzyQuery (``FuzzyQuery.java:73-76``)."""
    return MultiTerm(
        "fuzzy",
        (str(term_), int(max_edits), bool(transpositions)),
        max_expansions,
        f"{term_}~{max_edits}",
    )


def term_range(
    lo: "str | None",
    hi: "str | None",
    include_lo: bool = True,
    include_hi: bool = False,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> IntervalsSource:
    """Intervals.range over dictionary order."""
    return MultiTerm(
        "range",
        (lo, hi, bool(include_lo), bool(include_hi)),
        max_expansions,
        f"[{lo} TO {hi}]",
    )


def _as_source(s) -> IntervalsSource:
    if isinstance(s, IntervalsSource):
        return s
    if isinstance(s, str):
        return Term(s)
    raise TypeError(f"not an IntervalsSource: {s!r}")


# --------------------------------------------------------- evaluation


def approx_docs(source: IntervalsSource, docs_of: dict):
    """Doc-level candidate set of ``source`` over per-term sorted doc-id
    arrays — the vectorized mirror of each source's DocIdSetIterator
    approximation (conjunction intersect / disjunction union /
    difference = minuend). ``matches_approx`` is the same predicate at
    one doc; this is the set form the batch engine feeds the per-doc
    evaluator with."""
    import numpy as np

    if isinstance(source, (Term, PayloadFilteredTerm)):
        # a payload-filtered leaf approximates as its raw term (the
        # filter runs per position in the iterator, two-phase style)
        return np.asarray(docs_of.get(source.term, np.empty(0, np.int64)))
    if isinstance(source, NoMatch):
        return np.empty(0, np.int64)
    if isinstance(source, _Conjunction):
        subs = [approx_docs(s, docs_of) for s in source.subs]
        out = subs[0]
        for d in subs[1:]:
            out = np.intersect1d(out, d, assume_unique=True)
        return out
    if isinstance(source, (Or, AtLeast)):
        subs = [approx_docs(s, docs_of) for s in source.subs]
        return np.unique(np.concatenate(subs)) if subs else np.empty(0, np.int64)
    if isinstance(source, _Difference):
        return approx_docs(source.minuend, docs_of)
    if isinstance(source, (MaxGaps, MaxWidth, Extended, Offset)):
        return approx_docs(source.sub, docs_of)
    if isinstance(source, Repeating):
        return approx_docs(source.sub, docs_of)
    raise TypeError(f"unknown source {source!r}")


def enumerate_intervals(source: IntervalsSource, pos_of: dict) -> list:
    """All (start, end, gaps) intervals of ``source`` over one doc's
    positions, in the reference's enumeration order. Empty when the
    doc approximation does not match."""
    if not source.matches_approx(pos_of):
        return []
    it = source.iterator(pos_of)
    out: list = []
    while it.next_interval() != NO_MORE:
        out.append((it.start(), it.end(), it.gaps()))
    return out


def interval_freq(source: IntervalsSource, pos_of: dict) -> float:
    """IntervalScorer.ensureFreq: sum of 1/max(length - minExtent + 1,
    1) over the enumerated intervals (float64 accumulation like the
    reference's float-summed double? — the reference accumulates in
    float32 ``freq``; we mirror that in the scoring layer)."""
    import numpy as np

    me = source.min_extent()
    f = np.float32(0.0)
    if not source.matches_approx(pos_of):
        return 0.0
    it = source.iterator(pos_of)
    while it.next_interval() != NO_MORE:
        length = it.end() - it.start() + 1
        # Java: float freq += (double)(1.0 / max(...)) — double add,
        # rounded back to float32 per step
        f = np.float32(np.float64(f) + 1.0 / max(length - me + 1, 1))
    return float(f)


def interval_freq64(source: IntervalsSource, pos_of: dict) -> float:
    """float64 mirror of ``interval_freq`` (the engine's dtype="f64"
    oracle plane, like the BM25 ScorerF64 mirror)."""
    me = source.min_extent()
    f = 0.0
    if not source.matches_approx(pos_of):
        return 0.0
    it = source.iterator(pos_of)
    while it.next_interval() != NO_MORE:
        length = it.end() - it.start() + 1
        f += 1.0 / max(length - me + 1, 1)
    return f


def two_term_shape(source: IntervalsSource):
    """(kind, t1, t2, max_gaps) when ``source`` is Ordered/Unordered over
    exactly two DISTINCT Term subs, optionally wrapped in MaxGaps.
    Feeds ``fast_freq_fn`` — the PER-DOC reference implementation of
    the sweep rules, retained for differential testing (the engine's
    kernels use the across-docs batch sweeps, which generalize these
    shapes to k terms and Or-of-Terms subs). None otherwise."""
    mg = None
    if isinstance(source, MaxGaps):
        mg = source.max_gaps
        source = source.sub
    if isinstance(source, (Ordered, Unordered)) and len(source.subs) == 2:
        a, b = source.subs
        if isinstance(a, Term) and isinstance(b, Term) and a.term != b.term:
            kind = "ordered" if isinstance(source, Ordered) else "unordered"
            return kind, a.term, b.term, mg
    return None


def _single_position_sub(s) -> "tuple | None":
    """The term set of a sub that behaves as ONE single-position
    pseudo-term: a Term, or an Or whose disjuncts are all Terms (a
    disjunction of width-1 intervals enumerates exactly the merged
    position list — none can nest)."""
    if isinstance(s, Term):
        return (s.term,)
    if isinstance(s, Or) and all(isinstance(x, Term) for x in s.subs):
        return tuple(x.term for x in s.subs)
    return None


def _single_position_subs(source) -> "tuple | None":
    """Per-sub term tuples when EVERY sub is single-position and the
    term sets are pairwise DISJOINT (overlap would alias events in the
    packed sweep); None otherwise."""
    subs_terms = []
    seen: set = set()
    for s in source.subs:
        ts = _single_position_sub(s)
        if ts is None or seen & set(ts):
            return None
        seen |= set(ts)
        subs_terms.append(ts)
    return tuple(subs_terms)


def unordered_subs_shape(source: IntervalsSource):
    """(per-sub specs, max_gaps) when ``source`` is Unordered over
    k >= 2 fixed-width subs (Terms, disjoint Or-of-Terms, or Blocks of
    Terms), optionally MaxGaps-wrapped — the shapes the engine
    evaluates with the across-docs sweep: processing sub occurrences
    in ascending start order, the queue enumeration emits exactly the
    FIRST window per distinct left extreme, where the left extreme is
    the min over subs of the latest occurrence's start and the right
    extreme the max of their ends (verified against the golden tables
    — incl. the 3-term nesting case whose third sub IS an Or-of-Terms
    — and a 400-trial random differential mixing term and phrase
    subs). Specs are ("term"|"or"|"block", terms, width); all terms
    pairwise distinct across subs. None otherwise."""
    mg = None
    if isinstance(source, MaxGaps):
        mg = source.max_gaps
        source = source.sub
    if not (isinstance(source, Unordered) and len(source.subs) >= 2):
        return None
    specs = []
    seen: set = set()
    for s in source.subs:
        ts = _single_position_sub(s)
        if ts is not None:
            kind, width = ("term" if isinstance(s, Term) else "or"), 1
        elif isinstance(s, Block) and all(
            isinstance(x, Term) for x in s.subs
        ):
            ts = tuple(x.term for x in s.subs)
            kind, width = "block", len(ts)
        else:
            return None
        if len(set(ts)) != len(ts) or (seen & set(ts)):
            return None
        seen |= set(ts)
        specs.append((kind, ts, width))
    return tuple(specs), mg


def ordered_subs_shape(source: IntervalsSource):
    """(per-sub specs, max_gaps) when ``source`` is Ordered over k >= 2
    subs that are each a Term, a disjoint Or-of-Terms, or a Block of
    Terms (exact phrase) — optionally MaxGaps-wrapped. Each spec is
    ("term"|"or", terms, 1) or ("block", terms, len(terms)): a fixed
    WIDTH per sub is what lets the composed-next sweep work — END(a)
    composes "first sub-interval starting after the previous end"
    through the subs; minimality = the LAST chain start per distinct
    end (next functions are monotone, so ends are non-decreasing in
    the start and equal-end chains nest). All terms pairwise distinct
    across subs (conservative: the differential-validated domain).
    None otherwise."""
    mg = None
    if isinstance(source, MaxGaps):
        mg = source.max_gaps
        source = source.sub
    if not (isinstance(source, Ordered) and len(source.subs) >= 2):
        return None
    specs = []
    seen: set = set()
    for s in source.subs:
        ts = _single_position_sub(s)
        if ts is not None:
            kind, width = ("term" if isinstance(s, Term) else "or"), 1
        elif isinstance(s, Block) and all(
            isinstance(x, Term) for x in s.subs
        ):
            ts = tuple(x.term for x in s.subs)
            kind, width = "block", len(ts)
        else:
            return None
        if len(set(ts)) != len(ts) or (seen & set(ts)):
            return None
        seen |= set(ts)
        specs.append((kind, ts, width))
    return tuple(specs), mg


def tree_shape(source: IntervalsSource):
    """Nested spec for the across-docs TREE sweep
    (``kernels._interval_tree_batch``) — the round-5 vectorization of
    the previously-generic shapes (NOTES.md round-4 "remaining slow
    shape"): combinator TREES of Ordered/Unordered nodes, each
    optionally MaxGaps-wrapped, whose leaves are Terms, disjoint
    Or-of-Terms, or Blocks of Terms.  Each node's minimal-interval
    stream (packed start/end keys) is composed from its subs' streams
    with one sweep per node; a MaxGaps wrap filters the node's stream
    by gaps = width - sum of current sub widths
    (``_OrderedIt``/``_UnorderedIt`` slop bookkeeping above;
    ``FilteredIntervalsSource`` applies the filter to the enumerated
    minimal intervals).  Leaf terms must be pairwise distinct across
    the WHOLE tree (the differential-validated domain — shared terms
    would alias packed events).  Returns the root spec
    ``(kind, payload, max_gaps)`` with kind in
    {"term", "block", "ordered", "unordered"} — payload is the term
    tuple for leaves, the child-spec tuple for combinators — or None
    when the source is outside this family.

    The flat single-level shapes above are tried FIRST by the kernel
    (their sweeps are the long-proven fast paths); this compiler only
    serves what they decline."""
    seen: set = set()

    def compile_node(s):
        mg = None
        if isinstance(s, MaxGaps):
            mg = s.max_gaps
            s = s.sub
            if isinstance(s, MaxGaps):
                return None  # nested filters stay on the generic path
        ts = _single_position_sub(s)
        if ts is not None:
            if len(set(ts)) != len(ts) or (seen & set(ts)):
                return None
            seen.update(ts)
            return ("term", ts, mg)
        if isinstance(s, Block) and len(s.subs) >= 2 and all(
            isinstance(x, Term) for x in s.subs
        ):
            ts = tuple(x.term for x in s.subs)
            if len(set(ts)) != len(ts) or (seen & set(ts)):
                return None
            seen.update(ts)
            return ("block", ts, mg)
        if isinstance(s, (Ordered, Unordered)) and len(s.subs) >= 2:
            kids = []
            for c in s.subs:
                k = compile_node(c)
                if k is None:
                    return None
                kids.append(k)
            kind = "ordered" if isinstance(s, Ordered) else "unordered"
            return (kind, tuple(kids), mg)
        return None

    spec = compile_node(source)
    if spec is None or spec[0] in ("term", "block"):
        return None  # leaf-only roots are already flat-path territory
    return spec


def block_terms_shape(source: IntervalsSource):
    """(terms tuple, max_gaps) when ``source`` is Block over k >= 2
    DISTINCT Term subs (optionally MaxGaps-wrapped — gaps are always 0
    for a block, so max_gaps only gates on >= 0). The enumeration is
    every exact-adjacency occurrence ascending (equal-width intervals
    cannot nest)."""
    mg = None
    if isinstance(source, MaxGaps):
        mg = source.max_gaps
        source = source.sub
    if isinstance(source, Block) and len(source.subs) >= 2:
        subs_terms = _single_position_subs(source)
        if subs_terms is not None:
            return subs_terms, mg
    return None


def fast_freq_fn(source: IntervalsSource, dtype: str):
    """Per-doc freq for the two-term shapes, or None — the reference
    implementation of the cross-adjacent sweep rule kept for
    differential tests (the engine evaluates these shapes with the
    across-docs batch sweeps in ``kernels``).

    For two distinct single-position terms, the lazy minimization
    enumerates EXACTLY the cross-adjacent pairs of the merged position
    sequence (consecutive positions owned by different terms; ordered
    additionally requires the left element to be the first term) — see
    the golden tables in tests/test_intervals.py and the differential
    in tests/test_interval_query.py. Each interval contributes
    1/max(b - a, 1) (minExtent 2), accumulated in the enumeration
    order with the same f32/f64 stepping as ``interval_freq`` /
    ``interval_freq64`` — the fast path is bit-identical, it only
    replaces the per-interval iterator objects with numpy."""
    import numpy as np

    shape = two_term_shape(source)
    if shape is None:
        return None
    kind, t1, t2, mg = shape

    def fn(pos_of: dict) -> float:
        p1 = np.asarray(pos_of.get(t1, ()), dtype=np.int64)
        p2 = np.asarray(pos_of.get(t2, ()), dtype=np.int64)
        if p1.size == 0 or p2.size == 0:
            return 0.0
        merged = np.concatenate((p1, p2))
        owner = np.concatenate(
            (np.zeros(p1.size, np.int8), np.ones(p2.size, np.int8))
        )
        order = np.argsort(merged, kind="stable")
        m = merged[order]
        o = owner[order]
        cross = o[1:] != o[:-1]
        if kind == "ordered":
            cross &= o[:-1] == 0
        a = m[:-1][cross]
        b = m[1:][cross]
        if mg is not None:
            keep = (b - a - 1) <= mg
            a, b = a[keep], b[keep]
        if a.size == 0:
            return 0.0
        terms = 1.0 / np.maximum(b - a, 1).astype(np.float64)
        if dtype == "f32":
            f = np.float32(0.0)
            for t in terms:
                f = np.float32(np.float64(f) + t)
            return float(f)
        f64 = 0.0
        for t in terms:
            f64 += t
        return f64

    return fn


def saturation_score(freq: float, boost: float, pivot: float) -> float:
    """IntervalScoreFunction.SaturationFunction (float32 contract):
    weight * (1 - pivot / (pivot + freq))."""
    import numpy as np

    b = np.float32(boost)
    p = np.float32(pivot)
    f = np.float32(freq)
    return float(b * (np.float32(1.0) - p / (p + f)))


def sigmoid_score(freq: float, boost: float, pivot: float, exp: float) -> float:
    """IntervalScoreFunction.SigmoidFunction: weight * (1 - pivot^a /
    (freq^a + pivot^a)) — double math, one final float32 round (the
    reference casts the double product to float)."""
    import numpy as np

    pivot_pa = float(pivot) ** float(exp)
    v = float(np.float32(boost)) * (
        1.0 - pivot_pa / (float(freq) ** float(exp) + pivot_pa)
    )
    return float(np.float32(v))


def saturation_score64(freq: float, boost: float, pivot: float) -> float:
    return boost * (1.0 - pivot / (pivot + freq))


def sigmoid_score64(freq: float, boost: float, pivot: float, exp: float) -> float:
    pivot_pa = pivot ** exp
    return boost * (1.0 - pivot_pa / (freq ** exp + pivot_pa))
