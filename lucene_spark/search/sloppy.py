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


def check_no_repeats(terms) -> None:
    if len(set(terms)) != len(terms):
        raise NotImplementedError(
            "sloppy phrases with repeated terms are not supported "
            "(SloppyPhraseMatcher repeat groups; documented divergence)"
        )
