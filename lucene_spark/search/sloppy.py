"""Sloppy phrase matching — a faithful port of the NO-REPEATS path of
``search/SloppyPhraseMatcher.java`` (the common case; phrases that
repeat a term with slop > 0 are rejected at query-build time — a
documented divergence; slop == 0 handles repeats via the exact
matcher).

Semantics (PhraseScorer.java:86-95 + SloppyPhraseMatcher.java:188-216):
- each term's positions are shifted by its query offset
  (``pp.position = termPos - offset``);
- a priority queue ordered by (position, offset, ord) repeatedly pops
  the minimum; the popped term advances until it passes the new
  minimum, shrinking ``matchLength = end - pos`` greedily; a match is
  emitted when ``matchLength <= slop``;
- sloppyFreq = sum over matches of ``1f / (1f + matchLength)``,
  ACCUMULATED IN FLOAT32 (``float freq``) — reproduced exactly.
"""

from __future__ import annotations

import heapq

import numpy as np


def sloppy_freq(pos_lists: list, offsets, slop: int) -> float:
    """float32 sloppy frequency of one document (0.0 = no match).

    pos_lists[i]: ascending positions of term i in the doc (non-empty);
    offsets[i]: term i's query position.
    """
    n = len(pos_lists)
    counts = [len(p) for p in pos_lists]
    idxs = [0] * n
    pos = [int(pos_lists[i][0]) - int(offsets[i]) for i in range(n)]
    end = max(pos)
    heap = [(pos[i], int(offsets[i]), i) for i in range(n)]
    heapq.heapify(heap)
    state = {"positioned": True, "ml": None, "end": end}

    def advance(i: int) -> bool:
        idxs[i] += 1
        if idxs[i] >= counts[i]:
            return False
        pos[i] = int(pos_lists[i][idxs[i]]) - int(offsets[i])
        if pos[i] > state["end"]:
            state["end"] = pos[i]
        return True

    def next_match() -> bool:
        if not state["positioned"]:
            return False
        p, off, i = heapq.heappop(heap)
        state["ml"] = state["end"] - p
        nxt = heap[0][0]
        while advance(i):
            if pos[i] > nxt:
                heapq.heappush(heap, (pos[i], off, i))
                if state["ml"] <= slop:
                    return True
                p, off, i = heapq.heappop(heap)
                nxt = heap[0][0]
                state["ml"] = state["end"] - p
            else:
                ml2 = state["end"] - pos[i]
                if ml2 < state["ml"]:
                    state["ml"] = ml2
        state["positioned"] = False
        return state["ml"] <= slop

    if not next_match():
        return 0.0
    one = np.float32(1.0)
    freq = one / (one + np.float32(state["ml"]))
    while next_match():
        freq = np.float32(freq + one / (one + np.float32(state["ml"])))
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


def sloppy_freq_repeats(pos_lists, offsets, slop: int, groups) -> float:
    """Sloppy frequency for phrases with REPEATED terms.

    Semantics follow ``SloppyPhraseMatcher``'s repeat machinery
    (collide/lesser/advanceRpts): two occurrences of the same term must
    match DIFFERENT document positions (injective matching); whenever
    two repeat-group members land on the same raw position, the lesser
    one (smaller shifted position, then larger offset) advances.
    Matches accumulate 1f/(1f+matchLength) in float32 like the
    no-repeats path. The greedy advance order is a documented
    re-derivation, not a bit-level port: doc MATCH sets are exact
    (tested against brute-force injective selection); freq values on
    repeated-term phrases may differ from the reference in corner
    cases with overlapping match windows.
    """
    n = len(pos_lists)
    counts = [len(p) for p in pos_lists]
    group_of = [-1] * n
    for gi, g in enumerate(groups):
        for i in g:
            group_of[i] = gi
    # collision-free initial placement: group member with the r-th
    # smallest offset starts at its r-th position (the fixpoint the
    # reference's advance-the-lesser loop converges to)
    j = [0] * n
    for g in groups:
        for r, i in enumerate(sorted(g, key=lambda i: int(offsets[i]))):
            j[i] = r
    if any(j[i] >= counts[i] for i in range(n)):
        return 0.0
    raw = [int(pos_lists[i][j[i]]) for i in range(n)]
    pos = [raw[i] - int(offsets[i]) for i in range(n)]

    def advance_one(i: int) -> bool:
        j[i] += 1
        if j[i] >= counts[i]:
            return False
        raw[i] = int(pos_lists[i][j[i]])
        pos[i] = raw[i] - int(offsets[i])
        return True

    def advance(i: int) -> bool:
        """Advance pp i, then resolve repeat collisions (advanceRpts)."""
        if not advance_one(i):
            return False
        gi = group_of[i]
        if gi < 0:
            return True
        g = groups[gi]
        changed = True
        while changed:
            changed = False
            for a in g:
                for b in g:
                    if a < b and raw[a] == raw[b]:
                        k = (
                            a
                            if (pos[a], -int(offsets[a])) <= (pos[b], -int(offsets[b]))
                            else b
                        )
                        if not advance_one(k):
                            return False
                        changed = True
        return True

    one = np.float32(1.0)
    freq = np.float32(0.0)
    while True:
        i_min = min(range(n), key=lambda i: (pos[i], int(offsets[i])))
        ml = max(pos) - pos[i_min]
        if ml <= slop:
            freq = np.float32(freq + one / (one + np.float32(ml)))
        if not advance(i_min):
            break
    return float(freq)
