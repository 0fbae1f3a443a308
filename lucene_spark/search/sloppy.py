"""Sloppy phrase matching — a faithful port of
``search/SloppyPhraseMatcher.java``: the no-repeats fast path, the
repeat-group machinery for phrases that repeat a term, and the
multi-term-repeats variant (MultiPhraseQuery slots sharing terms,
``hasMultiTermRpts``).

Semantics (PhraseScorer.java:84-95 + SloppyPhraseMatcher.java:193-225):
- each term's positions are shifted by its query offset
  (``pp.position = termPos - offset``);
- a priority queue ordered by (position, offset, ord) repeatedly pops
  the minimum; the popped term advances until it passes the new
  minimum, shrinking ``matchLength = end - pos`` greedily; a match is
  emitted when ``matchLength <= slop``;
- with repeated terms, two slots of the same term must sit on
  different document positions: per-doc init advances the rank-r group
  member r times (advanceRepeatGroups, SloppyPhraseMatcher.java:453),
  and every advance resolves collisions by advancing the LESSER of the
  colliding pair then physically re-queuing the moved entries
  (advanceRpts, SloppyPhraseMatcher.java:305-342) — reproduced
  exactly, including the reference PriorityQueue's array heap so that
  entries whose position mutates while queued reorder at the same
  moments they do there (util/PriorityQueue.java add/pop/up/downHeap);
- sloppyFreq = sum over matches of ``1f / (1f + matchLength)``,
  ACCUMULATED IN FLOAT32 (``float freq``) — reproduced exactly.
"""

from __future__ import annotations

import heapq
from bisect import bisect_right

import numpy as np


def sloppy_freq(pos_lists: list, offsets, slop: int) -> float:
    """float32 sloppy frequency of one document (0.0 = no match).

    pos_lists[i]: ascending positions of term i in the doc (non-empty);
    offsets[i]: term i's query position.
    """
    n = len(pos_lists)
    counts = [len(p) for p in pos_lists]
    lists = [
        p.tolist() if isinstance(p, np.ndarray) else list(p)
        for p in pos_lists
    ]
    offs = [int(o) for o in offsets]
    idxs = [0] * n
    pos = [lists[i][0] - offs[i] for i in range(n)]
    end = max(pos)
    heap = [(pos[i], offs[i], i) for i in range(n)]
    heapq.heapify(heap)
    state = {"positioned": True, "ml": None, "end": end}

    def next_match() -> bool:
        # One episode of the reference loop advances the popped pp one
        # element at a time while its shifted position stays <= nxt,
        # shrinking matchLength to end - (last element <= nxt); since
        # positions ascend and ``end`` cannot change during the
        # approach (every approach element is <= nxt <= end), the whole
        # approach is ONE binary search — identical state transitions
        # and f32 emission order, O(log) per episode instead of O(run).
        if not state["positioned"]:
            return False
        p, off, i = heapq.heappop(heap)
        state["ml"] = state["end"] - p
        nxt = heap[0][0]
        while True:
            lst = lists[i]
            start = idxs[i] + 1
            # first index whose SHIFTED position exceeds nxt
            j = bisect_right(lst, nxt + off, start)
            if j > start:
                # approach elements existed: ml = end - last-below
                state["ml"] = state["end"] - (lst[j - 1] - off)
            if j >= counts[i]:
                state["positioned"] = False
                return state["ml"] <= slop
            idxs[i] = j
            pos[i] = lst[j] - off
            if pos[i] > state["end"]:
                state["end"] = pos[i]
            heapq.heappush(heap, (pos[i], off, i))
            if state["ml"] <= slop:
                return True
            p, off, i = heapq.heappop(heap)
            nxt = heap[0][0]
            state["ml"] = state["end"] - p

    if not next_match():
        return 0.0
    one = np.float32(1.0)
    freq = one / (one + np.float32(state["ml"]))
    while next_match():
        freq = np.float32(freq + one / (one + np.float32(state["ml"])))
    return float(freq)


def sloppy_freq_2(pa, pb, off_a: int, off_b: int, slop: int) -> float:
    """Two-term no-repeats sloppy frequency — ``sloppy_freq``
    specialized. With exactly two pps, ``end == max(a, b)`` at every
    pop (the historical max is always one of the two current
    positions), so each episode of the reference loop reduces to:
    snap the lagging list to its last element <= the leader, emit
    matchLength = leader - snapped, step to the first element beyond.
    The candidate sequence — hence the float32 accumulation order — is
    identical to the heap loop (pinned bitwise by the hypothesis
    differential in tests/test_sloppy.py). Requires off_a != off_b
    (always true for a 2-term PhraseQuery; ties in shifted position
    resolve by offset exactly as the (position, offset, ord)
    comparator does).

    ``pa``/``pb``: ascending RAW positions (non-empty);
    ``off_a``/``off_b``: the query offsets."""
    la = pa.tolist() if isinstance(pa, np.ndarray) else list(pa)
    lb = pb.tolist() if isinstance(pb, np.ndarray) else list(pb)
    na, nb = len(la), len(lb)
    ia = ib = 0
    a = la[0] - off_a
    b = lb[0] - off_b
    one = np.float32(1.0)
    freq = np.float32(0.0)
    while True:
        if a < b or (a == b and off_a < off_b):
            j = bisect_right(la, b + off_a, ia)
            ml = b - (la[j - 1] - off_a)
            if ml <= slop:
                freq = np.float32(freq + one / (one + np.float32(ml)))
            if j >= na:
                break
            ia = j
            a = la[j] - off_a
        else:
            j = bisect_right(lb, a + off_b, ib)
            ml = a - (lb[j - 1] - off_b)
            if ml <= slop:
                freq = np.float32(freq + one / (one + np.float32(ml)))
            if j >= nb:
                break
            ib = j
            b = lb[j] - off_b
    return float(freq)


def repeat_groups(terms) -> "list[list[int]] | None":
    """Indices of repeated terms, grouped (None when all distinct) —
    the repeat-group identification of ``SloppyPhraseMatcher``
    (gatherRptGroups)."""
    by_term: dict = {}
    for i, t in enumerate(terms):
        by_term.setdefault(t, []).append(i)
    groups = [g for g in by_term.values() if len(g) > 1]
    return groups or None


class _RefPQ:
    """The reference ``util/PriorityQueue.java`` as an array heap of pp
    ordinals, comparing LIVE (position, offset, ord) at sift time.
    advanceRpts mutates positions of entries while they sit in the
    queue; the reference re-queues them with an explicit pop/re-add
    pass, and whether an un-re-queued stale entry reorders depends on
    the heap's physical layout — mirroring add/pop/upHeap/downHeap
    verbatim keeps that layout (hence pop order) identical."""

    __slots__ = ("heap", "size", "pos", "offs")

    def __init__(self, max_size: int, pos, offs):
        self.heap = [0] * (max_size + 1)  # 1-based, heap[0] unused
        self.size = 0
        self.pos = pos
        self.offs = offs

    def _less(self, a: int, b: int) -> bool:
        # SloppyPhraseMatcher.java:97-109 comparator
        pos, offs = self.pos, self.offs
        if pos[a] == pos[b]:
            if offs[a] == offs[b]:
                return a < b
            return offs[a] < offs[b]
        return pos[a] < pos[b]

    def add(self, element: int) -> None:
        index = self.size + 1
        self.heap[index] = element
        self.size = index
        self._up_heap(index)

    def top(self) -> int:
        return self.heap[1]

    def pop(self) -> int:
        heap = self.heap
        result = heap[1]
        heap[1] = heap[self.size]
        self.size -= 1
        self._down_heap(1)
        return result

    def _up_heap(self, orig: int) -> None:
        heap = self.heap
        i = orig
        node = heap[i]
        j = i >> 1
        while j > 0 and self._less(node, heap[j]):
            heap[i] = heap[j]
            i = j
            j >>= 1
        heap[i] = node

    def _down_heap(self, i: int) -> None:
        heap, size = self.heap, self.size
        node = heap[i]
        j = i << 1
        k = j + 1
        if k <= size and self._less(heap[k], heap[j]):
            j = k
        while j <= size and self._less(heap[j], node):
            heap[i] = heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= size and self._less(heap[k], heap[j]):
                j = k
        heap[i] = node


def multi_repeat_groups(slot_terms) -> "tuple[list | None, bool]":
    """Repeat-group detection for MultiPhraseQuery slots —
    ``repeatingTerms`` + ``repeatingPPs`` + ``gatherRptGroups``
    (``SloppyPhraseMatcher.java:505-560,620-690``). Returns
    (groups, has_multi_term_rpts): groups = lists of slot indices, or
    None when no term appears in two slots. ``slot_terms[i]`` must be
    the slot's terms PRESENT in the segment (absent terms contribute no
    positions, hence no collisions).

    Without multi-term repeats (every repeating slot is single-term)
    grouping per shared term reproduces the reference's positional
    first-doc grouping: same term => same first position => collision;
    distinct single terms never collide at placeFirstPositions. With
    multi-term repeats the reference computes connected components of
    the slot x repeating-term bipartite graph (``unionTermGroups``) to
    catch hidden collisions — reproduced with a union-find over
    repeating terms co-occurring in a slot."""
    cnt: dict = {}
    for slot in slot_terms:
        for t in dict.fromkeys(slot):
            cnt[t] = cnt.get(t, 0) + 1
    rset = {t for t, c in cnt.items() if c >= 2}
    if not rset:
        return None, False
    rpp = [i for i, slot in enumerate(slot_terms) if rset & set(slot)]
    has_mtr = any(len(set(slot_terms[i])) > 1 for i in rpp)
    if not has_mtr:
        by_term: dict = {}
        for i in rpp:
            by_term.setdefault(slot_terms[i][0], []).append(i)
        groups = [g for g in by_term.values() if len(g) > 1]
        return (groups or None), False
    parent = {t: t for t in rset}

    def find(t):
        while parent[t] != t:
            parent[t] = parent[parent[t]]
            t = parent[t]
        return t

    for i in rpp:
        ts = [t for t in dict.fromkeys(slot_terms[i]) if t in rset]
        for b in ts[1:]:
            ra, rb = find(ts[0]), find(b)
            if ra != rb:
                parent[rb] = ra
    by_root: dict = {}
    for i in rpp:
        roots = {find(t) for t in slot_terms[i] if t in rset}
        # slots with rpt terms in two components already unioned them
        by_root.setdefault(roots.pop(), []).append(i)
    return list(by_root.values()), True


def sloppy_freq_repeats(
    pos_lists, offsets, slop: int, groups, mtr: bool = False
) -> float:
    """Sloppy frequency for phrases with REPEATED terms — a faithful
    port of ``SloppyPhraseMatcher``'s repeat machinery. ``mtr=True`` =
    the multi-term-repeats variant (``hasMultiTermRpts``): slots are
    union postings lists and the same term can hide in several slots,
    so per-doc initialization resolves collisions dynamically
    (``advanceRepeatGroups`` case 2) instead of the fixed rank-r
    advancement:

    - per-doc init: all pps to their first position, then each repeat
      group (sorted by query offset) advances its rank-r member r
      times (advanceRepeatGroups), then the queue fills in ord order
      and ``end`` becomes the max shifted position (initComplex);
    - nextMatch pops the min pp and advances it greedily, shrinking
      matchLength, exactly as the no-repeats path
      (SloppyPhraseMatcher.java:193-225);
    - after every advance, collisions (two group members on the same
      raw document position) are resolved by advancing the LESSER pp
      (smaller shifted position, tie: smaller offset) until none
      collide; moved entries that sit in the queue are re-queued by
      popping until each marked rptInd has been seen and re-adding in
      reverse pop order (advanceRpts, SloppyPhraseMatcher.java:305-342
      — including its quirk of clearing a marked bit on ANY popped pp
      with that rptInd, regardless of group);
    - freq accumulates 1f/(1f+matchLength) in float32 per
      PhraseScorer.java:84-95.
    """
    n = len(pos_lists)
    counts = [len(p) for p in pos_lists]
    offs = [int(o) for o in offsets]
    # sortRptGroups: each group sorted by query offset; rptInd = rank
    rgs = [sorted(g, key=lambda i: offs[i]) for g in groups]
    group_of = [-1] * n
    rpt_ind = [0] * n
    for gi, g in enumerate(rgs):
        for r, i in enumerate(g):
            group_of[i] = gi
            rpt_ind[i] = r

    idx = [0] * n
    pos = [0] * n  # shifted: raw - offset
    state = {"end": -(1 << 31)}

    def next_position(i: int) -> bool:
        idx[i] += 1
        if idx[i] >= counts[i]:
            return False
        pos[i] = int(pos_lists[i][idx[i]]) - offs[i]
        return True

    def advance_pp(i: int) -> bool:
        if not next_position(i):
            return False
        if pos[i] > state["end"]:
            state["end"] = pos[i]
        return True

    def tp_pos(i: int) -> int:
        return pos[i] + offs[i]

    def collide(i: int) -> int:
        t = tp_pos(i)
        for j in rgs[group_of[i]]:
            if j != i and tp_pos(j) == t:
                return rpt_ind[j]
        return -1

    def lesser(a: int, b: int) -> int:
        if pos[a] < pos[b] or (pos[a] == pos[b] and offs[a] < offs[b]):
            return a
        return b

    # initComplex: placeFirstPositions + advanceRepeatGroups + fillQueue
    for i in range(n):
        if counts[i] == 0:
            return 0.0
        idx[i] = 0
        pos[i] = int(pos_lists[i][0]) - offs[i]
    if mtr:
        # advanceRepeatGroups case 2 (SloppyPhraseMatcher.java:453-472):
        # collisions are not known statically — resolve each in turn by
        # advancing the lesser pp; if a pp EARLIER in the (offset-
        # sorted) group moved, redo from that group position (incr=0)
        for rg in rgs:
            gi = 0
            while gi < len(rg):
                incr = 1
                pp = rg[gi]
                while True:
                    k = collide(pp)
                    if k < 0:
                        break
                    pp2 = lesser(pp, rg[k])
                    if not advance_pp(pp2):
                        return 0.0  # PPs exhausted
                    if rpt_ind[pp2] < gi:
                        incr = 0
                        break
                gi += incr
    else:
        for rg in rgs:
            for jj in range(1, len(rg)):
                for _ in range(jj):
                    if not next_position(rg[jj]):
                        return 0.0  # PPs exhausted
    pq = _RefPQ(n, pos, offs)
    for i in range(n):  # fillQueue: ord order, raises end
        if pos[i] > state["end"]:
            state["end"] = pos[i]
        pq.add(i)

    def advance_rpts(i: int) -> bool:
        if group_of[i] < 0:
            return True
        rg = rgs[group_of[i]]
        marked: set = set()
        num_bits = len(rg)  # FixedBitSet(rg.length), grown on demand
        k0 = rpt_ind[i]
        pp = i
        while True:
            k = collide(pp)
            if k < 0:
                break
            pp = lesser(pp, rg[k])
            if not advance_pp(pp):
                return False  # exhausted
            if k != k0:
                num_bits = max(num_bits, k + 1)
                marked.add(k)
        # re-queue: pop until every marked rptInd was seen, re-add in
        # reverse pop order (reference clears the bit for ANY popped pp
        # whose rptInd matches — group not checked there)
        if marked:
            stack = []
            while marked and pq.size > 0:
                j = pq.pop()
                stack.append(j)
                if group_of[j] >= 0 and rpt_ind[j] < num_bits:
                    marked.discard(rpt_ind[j])
            for j in reversed(stack):
                pq.add(j)
        return True

    mstate = {"positioned": True, "ml": 1 << 31}

    def next_match() -> bool:
        if not mstate["positioned"]:
            return False
        pp = pq.pop()
        mstate["ml"] = state["end"] - pos[pp]
        nxt = pos[pq.top()]
        while advance_pp(pp):
            if not advance_rpts(pp):
                break  # pps exhausted
            if pos[pp] > nxt:
                pq.add(pp)
                if mstate["ml"] <= slop:
                    return True
                pp = pq.pop()
                nxt = pos[pq.top()]
                mstate["ml"] = state["end"] - pos[pp]
            else:
                ml2 = state["end"] - pos[pp]
                if ml2 < mstate["ml"]:
                    mstate["ml"] = ml2
        mstate["positioned"] = False
        return mstate["ml"] <= slop

    if not next_match():
        return 0.0
    one = np.float32(1.0)
    freq = one / (one + np.float32(mstate["ml"]))
    while next_match():
        freq = np.float32(freq + one / (one + np.float32(mstate["ml"])))
    return float(freq)


def sloppy_match_spans(
    pos_lists, offsets, slop: int, groups=None, mtr: bool = False
):
    """[(start_position, end_position, match_length)] per accepted
    sloppy match, in emission order — the Matches-API twin of
    :func:`sloppy_freq_repeats` with the reference's captureLead
    bookkeeping (``SloppyPhraseMatcher.java:197-260``): leadPosition
    is recorded when a pp is popped and re-recorded at the bottom of
    every minimization step (i.e. BEFORE the advance that ends a
    match); ``startPosition`` = min(leadPosition, every pp's raw
    position), ``endPosition`` = max(leadPosition, every non-lead-ord
    pp's raw position).  Used only by the matches() surface (k docs) —
    the reference's own comment: "this is slow, but Matches is slow
    anyway".  The scoring loops are untouched; a differential test
    pins float32(sum 1/(1+ml)) over the emitted matches to
    sloppy_freq / sloppy_freq_repeats bit-exactly.

    ``groups=None`` runs the plain (no-repeats) matcher — the same
    control flow with the repeat machinery inert."""
    groups = groups or []
    n = len(pos_lists)
    counts = [len(p) for p in pos_lists]
    offs = [int(o) for o in offsets]
    rgs = [sorted(g, key=lambda i: offs[i]) for g in groups]
    group_of = [-1] * n
    rpt_ind = [0] * n
    for gi, g in enumerate(rgs):
        for r, i in enumerate(g):
            group_of[i] = gi
            rpt_ind[i] = r

    idx = [0] * n
    pos = [0] * n
    state = {"end": -(1 << 31)}
    lead = {"ord": -1, "pos": 1 << 31}

    def capture_lead(i: int) -> None:
        lead["ord"] = i
        lead["pos"] = pos[i] + offs[i]

    def next_position(i: int) -> bool:
        idx[i] += 1
        if idx[i] >= counts[i]:
            return False
        pos[i] = int(pos_lists[i][idx[i]]) - offs[i]
        return True

    def advance_pp(i: int) -> bool:
        if not next_position(i):
            return False
        if pos[i] > state["end"]:
            state["end"] = pos[i]
        return True

    def tp_pos(i: int) -> int:
        return pos[i] + offs[i]

    def collide(i: int) -> int:
        t = tp_pos(i)
        for j in rgs[group_of[i]]:
            if j != i and tp_pos(j) == t:
                return rpt_ind[j]
        return -1

    def lesser(a: int, b: int) -> int:
        if pos[a] < pos[b] or (pos[a] == pos[b] and offs[a] < offs[b]):
            return a
        return b

    for i in range(n):
        if counts[i] == 0:
            return []
        idx[i] = 0
        pos[i] = int(pos_lists[i][0]) - offs[i]
    if mtr:
        for rg in rgs:
            gi = 0
            while gi < len(rg):
                incr = 1
                pp = rg[gi]
                while True:
                    k = collide(pp)
                    if k < 0:
                        break
                    pp2 = lesser(pp, rg[k])
                    if not advance_pp(pp2):
                        return []
                    if rpt_ind[pp2] < gi:
                        incr = 0
                        break
                gi += incr
    else:
        for rg in rgs:
            for jj in range(1, len(rg)):
                for _ in range(jj):
                    if not next_position(rg[jj]):
                        return []
    pq = _RefPQ(n, pos, offs)
    for i in range(n):
        if pos[i] > state["end"]:
            state["end"] = pos[i]
        pq.add(i)

    def advance_rpts(i: int) -> bool:
        if group_of[i] < 0:
            return True
        rg = rgs[group_of[i]]
        marked: set = set()
        num_bits = len(rg)
        k0 = rpt_ind[i]
        pp = i
        while True:
            k = collide(pp)
            if k < 0:
                break
            pp = lesser(pp, rg[k])
            if not advance_pp(pp):
                return False
            if k != k0:
                num_bits = max(num_bits, k + 1)
                marked.add(k)
        if marked:
            stack = []
            while marked and pq.size > 0:
                j = pq.pop()
                stack.append(j)
                if group_of[j] >= 0 and rpt_ind[j] < num_bits:
                    marked.discard(rpt_ind[j])
            for j in reversed(stack):
                pq.add(j)
        return True

    mstate = {"positioned": True, "ml": 1 << 31}

    def span():
        sp = min([lead["pos"]] + [tp_pos(i) for i in range(n)])
        ep = lead["pos"]
        for i in range(n):
            if i != lead["ord"]:
                ep = max(ep, tp_pos(i))
        return sp, ep

    def next_match() -> bool:
        if not mstate["positioned"]:
            return False
        pp = pq.pop()
        capture_lead(pp)
        mstate["ml"] = state["end"] - pos[pp]
        nxt = pos[pq.top()]
        while advance_pp(pp):
            if rgs and not advance_rpts(pp):
                break  # pps exhausted
            if pos[pp] > nxt:
                pq.add(pp)
                if mstate["ml"] <= slop:
                    return True
                pp = pq.pop()
                nxt = pos[pq.top()]
                mstate["ml"] = state["end"] - pos[pp]
            else:
                ml2 = state["end"] - pos[pp]
                if ml2 < mstate["ml"]:
                    mstate["ml"] = ml2
            capture_lead(pp)
        mstate["positioned"] = False
        return mstate["ml"] <= slop

    out: list = []
    while next_match():
        sp, ep = span()
        out.append((sp, ep, mstate["ml"]))
    return out
