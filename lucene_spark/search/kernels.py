"""Per-segment scoring kernels: exhaustive baseline + block-max pruned top-k.

Implements the dynamic-pruning machinery of SURVEY.md §2.9 in vectorized
numpy (block/window-at-a-time, no per-posting Python):

- Exhaustive: decode-everything brute force — the semantic baseline
  (Catalyst's ORDER BY score LIMIT k analog) used for differential tests.
- Term:   block skipping by impact-derived block-max score
  (``search/ImpactsDISI.java:28-123``).
- OR:     window-at-a-time MAXSCORE over 4096-doc windows
  (``search/MaxScoreBulkScorer.java:28-51``): skip a window when the sum
  of per-term window bounds cannot beat the current threshold.
- AND:    block-max conjunction led by the rarest term
  (``search/BlockMaxConjunctionBulkScorer.java:30-39``): lead blocks are
  skipped on range mismatch or insufficient score bound.
- Phrase: two-phase — doc-level conjunction approximation, then position
  verification (``search/PhraseScorer.java:45-68`` /
  ``ExactPhraseMatcher.java:108-160``); impact bounds from member terms
  are valid because phraseFreq <= any member tf (monotonicity).

Pruning engages only after ``total_hits_threshold`` (default 1000) hits,
like ``IndexSearcher.java:100``; it is rank-safe (bounds are true upper
bounds), so pruned == exhaustive == oracle on every query — asserted by
the differential test suite.

Float contract: leaf scores in the query dtype ('f32' = Lucene float32
semantics); clause sums accumulate in float64 and cast back to f32 once
(``search/WANDScorer.java:553-565``, ``ConjunctionScorer.java:57``).
"""

from __future__ import annotations

import numpy as np

from lucene_spark.search import ast
from lucene_spark.search.segment import SegmentView, TermBlocks

TOTAL_HITS_THRESHOLD = 1000  # IndexSearcher.java:100
WINDOW = 4096  # MaxScoreBulkScorer window / BooleanScorer.java:33-34


def _final_scores(acc64: np.ndarray, dtype: str) -> np.ndarray:
    return acc64.astype(np.float32) if dtype == "f32" else acc64


def top_k_select(docs: np.ndarray, scores: np.ndarray, k: int):
    """Sort by score desc, doc asc (HitQueue.java:76-82), take k."""
    if docs.size == 0:
        return docs, scores
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return docs[order], scores[order]


class _TopK:
    """Bounded top-k accumulator with Lucene's tie-break; tracks total hits
    for the pruning threshold.

    ``seed``: externally shared minCompetitiveScore floor — the
    cross-segment threshold publication of
    ``search/MaxScoreAccumulator.java`` /
    ``TopScoreDocCollectorManager.java:127-132``: another leaf's kth
    score (already nudged one ulp down by ``seed_below`` so equal-score
    lower-doc-id hits stay competitive) lets this kernel prune from the
    first block, before its own heap fills."""

    def __init__(self, k: int, threshold: int, seed: float = -np.inf):
        self.k = k
        self.threshold = threshold
        self.seed = float(seed)
        self.docs = np.empty(0, np.int64)
        self.scores = np.empty(0, np.float64)
        self.hits = 0

    def update(self, docs: np.ndarray, scores64: np.ndarray) -> None:
        self.hits += int(docs.size)
        if docs.size == 0:
            return
        d = np.concatenate([self.docs, docs])
        s = np.concatenate([self.scores, scores64])
        order = np.lexsort((d, -s))[: self.k]
        self.docs, self.scores = d[order], s[order]

    @property
    def theta(self) -> float:
        """Current pruning threshold: kth score once the heap is full AND
        totalHitsThreshold hits were seen; else the shared seed (-inf
        when none)."""
        if self.docs.size >= self.k and self.hits >= self.threshold:
            return max(float(self.scores[-1]), self.seed)
        return self.seed


def seed_below(kth: float, dtype: str) -> float:
    """A rank-safe shared-theta floor from a kth COMPARABLE score (the
    value ranking actually compares: float32-cast under 'f32').

    Blocks with bound <= seed contain only docs whose comparable score
    is strictly below the kth — under 'f32' that means one float32 ulp
    below (float64 accumulations that would round up to the kth's f32
    value must survive, since they tie and can win on doc id)."""
    if dtype == "f32":
        s32 = np.float32(kth)
        return float(np.nextafter(s32, np.float32(-np.inf)))
    return float(np.nextafter(np.float64(kth), -np.inf))


# ---------------------------------------------------------------- exhaustive


def multi_term_union_docs(seg: SegmentView, q: "ast.MultiTermQuery"):
    """LIVE docs containing ANY dictionary term matching the leaf's
    predicate — the constant-score MultiTermQuery rewrite's doc set,
    shared by the exhaustive scorer and the WAND _DocsLeaf adapter.
    The segment view holds the scan's superset of terms; the Python
    matcher (one source of truth, search/multiterm.py) decides
    membership here exactly as on the serving plane."""
    from lucene_spark.search.multiterm import term_key_matcher

    if seg.mt_docs is not None:
        pre = seg.mt_docs.get((q.mode, q.args, q.field))
        if pre is not None:
            # the direct executor's spill guard precomputed this union
            # in bounded term-chunks (searcher._mt_union_docs_chunked)
            return pre[seg.live_mask(pre)].astype(np.int64)
    pred = term_key_matcher(q.mode, q.args, q.field)
    parts = [tb.decode_all()[0] for t, tb in seg.terms.items() if pred(t)]
    docs = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    )
    return docs[seg.live_mask(docs)].astype(np.int64)


def score_exhaustive(
    seg: SegmentView, q: ast.Query, scorers: dict, dtype: str, boost: float = 1.0
):
    """(local doc ids sorted, scores) of ALL matching docs — brute force.

    ``boost`` is the accumulated BoostQuery multiplier on the path from
    the root; it selects the leaf scorer whose float32 weight already
    folds the boost in (never a post-hoc multiply — BoostQuery.java /
    BM25Similarity.java:218 order of operations).
    """
    if isinstance(q, ast.MatchNoDocsQuery):
        return np.empty(0, np.int64), np.empty(0, np.float64)
    if isinstance(q, ast.MatchAllDocsQuery):
        d = np.arange(seg.max_doc, dtype=np.int64)
        d = d[seg.live_mask(d)]
        return d, np.full(d.size, float(np.float32(boost)), np.float64)
    if isinstance(q, ast.FieldExistsQuery):
        if seg.norms_by_field is not None:
            nrm = seg.norms_by_field.get(q.field)
        else:
            nrm = seg.norms if q.field == "" else None
        if nrm is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        d = np.flatnonzero(np.asarray(nrm) > 0).astype(np.int64)
        d = d[seg.live_mask(d)]
        return d, np.full(d.size, float(np.float32(boost)), np.float64)
    if isinstance(q, ast.MultiTermQuery):
        # CONSTANT_SCORE_REWRITE (MultiTermQuery.java)
        docs = multi_term_union_docs(seg, q)
        c = float(np.float32(boost)) if dtype == "f32" else float(boost)
        return docs, np.full(docs.size, c, np.float64)
    if isinstance(q, ast.BoostQuery):
        return score_exhaustive(seg, q.query, scorers, dtype, boost * q.boost)
    if isinstance(q, ast.ConstantScoreQuery):
        docs, _ = score_exhaustive(seg, q.query, scorers, dtype, 1.0)
        b = float(boost) * float(q.boost)
        c = float(np.float32(b)) if dtype == "f32" else b
        return docs, np.full(docs.size, c, np.float64)
    if isinstance(q, ast.TermQuery):
        tb = seg.term_blocks(q.term)
        if tb is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs, tfs = tb.decode_all()
        m = seg.live_mask(docs)
        docs, tfs = docs[m], tfs[m]
        sc = scorers[("t", q.term, boost)] if boost != 1.0 else scorers[("t", q.term)]
        s = sc.score(tfs, tb.norms[docs])
        return docs, s.astype(np.float64)
    if isinstance(q, ast.PhraseQuery):
        docs, freqs = _phrase_doc_freqs(seg, q)
        if docs.size == 0:
            return docs, np.empty(0, np.float64)
        sc = scorers[("p", q.terms, boost)] if boost != 1.0 else scorers[("p", q.terms)]
        s = sc.score(freqs, seg.norms_for_term(q.terms[0])[docs])
        return docs, s.astype(np.float64)
    if isinstance(q, ast.MultiPhraseQuery):
        docs, freqs = _multi_phrase_doc_freqs(seg, q)
        if docs.size == 0:
            return docs, np.empty(0, np.float64)
        s = scorers[("mp", q.slots, boost)].score(freqs, seg.norms_for_term(q.slots[0][0])[docs])
        return docs, s.astype(np.float64)
    if isinstance(q, ast.IntervalQuery):
        return _interval_docs_scores(seg, q, dtype, boost)
    if isinstance(q, ast.BooleanQuery):
        return _score_bool_exhaustive(seg, q, scorers, dtype, boost)
    raise TypeError(f"unsupported query {q!r}")


# test hook: force the generic iterator path (differential tests)
_INTERVAL_FAST_OFF = False


def expand_interval_source(term_keys, src, field: str):
    """Per-segment dictionary expansion of MultiTerm interval leaves
    (``MultiTermIntervalsSource.java``): each leaf becomes a raw
    disjunction over the segment's matching terms in term order
    (rewrite=False — the reference expands at iterator build, AFTER
    disjunction pull-up), erroring past max_expansions; an empty
    expansion becomes NoMatch (the reference's null iterator).
    ``term_keys``: iterable of FIELDED term keys (a segment's scanned
    dictionary superset)."""
    from lucene_spark.search import intervals as iv
    from lucene_spark.search.multiterm import term_key_matcher

    if not iv.multi_terms(src):
        return src
    keys = sorted(term_keys)

    def leaf(mt: "iv.MultiTerm"):
        pred = term_key_matcher(mt.mode, mt.args, field)
        hits = [ast.bare_term(t) for t in keys if pred(t)]
        if len(hits) > mt.max_expansions:
            raise ValueError(
                f"Automaton [{mt.pattern}] expanded to too many terms "
                f"(limit {mt.max_expansions})"
            )
        if not hits:
            return iv.NoMatch(mt.pattern)
        if len(hits) == 1:
            return iv.Term(hits[0])
        return iv.Or(tuple(iv.Term(t) for t in hits), rewrite=False)

    return iv.map_multi_terms(src, leaf)


def _flat_positions_for_docs(tb: TermBlocks, docs: np.ndarray):
    """(doc_rep, pos_flat) for the requested docs — every position of
    every requested doc, doc-major, WITHOUT per-doc slicing (the
    across-docs sibling of ``_positions_for_docs``: one boolean-repeat
    mask per block instead of a Python loop per doc)."""
    out_docs: list = []
    out_pos: list = []
    bidx = np.searchsorted(tb.last_doc, docs, side="left")
    for b in np.unique(bidx):
        sel = docs[bidx == b]
        bd, _ = tb.decode(int(b))
        flat, bounds = tb.decode_positions(int(b))
        tfs = np.diff(bounds)
        j = np.searchsorted(bd, sel)
        want = np.zeros(bd.size, dtype=bool)
        want[j] = True
        out_pos.append(flat[np.repeat(want, tfs)])
        out_docs.append(np.repeat(bd[j], tfs[j]))
    if not out_docs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_docs), np.concatenate(out_pos)

def _interval_score_batch(gdocs, starts, counts, terms64, q, dtype, boost):
    """Grouped interval scoring shared by the batch fast paths: per-doc
    mixed-precision accumulation in enumeration order (step k adds
    every doc's k-th interval: f32 <- f32(f64(f32) + term), exactly the
    scalar stepping) + vectorized saturation/sigmoid."""
    if dtype == "f32":
        acc = np.zeros(gdocs.size, np.float32)
        for k in range(int(counts.max())):
            sel = counts > k
            acc[sel] = (
                acc[sel].astype(np.float64) + terms64[starts[sel] + k]
            ).astype(np.float32)
        b32 = np.float32(boost)
        p32 = np.float32(q.pivot)
        if q.exp is None:
            scores = b32 * (np.float32(1.0) - p32 / (p32 + acc))
        else:
            pivot_pa = float(q.pivot) ** float(q.exp)
            v = float(b32) * (
                1.0 - pivot_pa / (acc.astype(np.float64) ** float(q.exp) + pivot_pa)
            )
            scores = v.astype(np.float32)
        return gdocs, scores.astype(np.float64)
    acc64 = np.zeros(gdocs.size, np.float64)
    for k in range(int(counts.max())):
        sel = counts > k
        acc64[sel] += terms64[starts[sel] + k]
    if q.exp is None:
        scores = boost * (1.0 - q.pivot / (q.pivot + acc64))
    else:
        pivot_pa = q.pivot ** q.exp
        scores = boost * (1.0 - pivot_pa / (acc64 ** q.exp + pivot_pa))
    return gdocs, scores


def _interval_unordered_batch(
    sub_starts, min_extent, mg, q, dtype, boost
):
    """Across-docs sweep for UNORDERED over k fixed-width subs (terms,
    Or-of-Terms, exact phrases): per-sub occurrence (start, end) events
    sorted once by packed start; per-sub latest occurrence via running
    maxima; left extreme = min over subs of the latest STARTS (its doc
    bits also encode coverage — a sub unseen in the current doc leaves
    the minimum in an earlier doc), right extreme = max over subs of
    the latest ENDS; the enumeration keeps the FIRST window per
    distinct left extreme (see intervals.unordered_subs_shape).
    ``sub_starts``: [(packed sorted start keys, width)] per sub."""
    starts = []
    ends = []
    codes = []
    for ci, (sk, w) in enumerate(sub_starts):
        starts.append(sk)
        ends.append(sk + (w - 1))  # low-bit position arithmetic
        codes.append(np.full(sk.size, ci, np.int8))
    key = np.concatenate(starts)
    ekey = np.concatenate(ends)
    code = np.concatenate(codes)
    order = np.argsort(key, kind="stable")  # unique start keys: no ties
    key = key[order]
    ekey = ekey[order]
    code = code[order]
    n = key.size
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    k_subs = len(sub_starts)
    # per-sub running latest occurrence (packed; -1 = never seen)
    lpk = np.full(n, np.iinfo(np.int64).max, np.int64)
    epk = np.full(n, -1, np.int64)
    for ci in range(k_subs):
        mask = code == ci
        np.minimum(
            lpk, np.maximum.accumulate(np.where(mask, key, -1)), out=lpk
        )
        np.maximum(
            epk, np.maximum.accumulate(np.where(mask, ekey, -1)), out=epk
        )
    covered = (lpk >> 32) == (key >> 32)  # min's doc == current doc
    # first window per distinct left extreme
    first = np.ones(n, dtype=bool)
    first[1:] = lpk[1:] != lpk[:-1]
    keep = covered & first
    start = (lpk & 0xFFFFFFFF)[keep]
    end = (epk & 0xFFFFFFFF)[keep]
    doc = (key >> 32)[keep]
    width = end - start + 1
    if mg is not None:
        m = (width - min_extent) <= mg  # gaps = width - sum(sub widths)
        start, end, doc, width = start[m], end[m], doc[m], width[m]
    if doc.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    terms64 = 1.0 / np.maximum(width - min_extent + 1, 1).astype(np.float64)
    gstarts = np.concatenate(([0], np.flatnonzero(np.diff(doc)) + 1))
    counts = np.diff(np.concatenate((gstarts, [doc.size])))
    return _interval_score_batch(
        doc[gstarts], gstarts, counts, terms64, q, dtype, boost
    )


def _interval_ordered_batch(sub_starts, min_extent, mg, q, dtype, boost):
    """Across-docs sweep for ORDERED over k fixed-width subs (terms,
    Or-of-Terms, exact phrases): chains compose "first sub-interval
    STARTING after the previous END" via packed-key searchsorted (one
    vectorized pass per sub); a chain is live while every hop exists
    and the end stays in the start's doc; minimality keeps the LAST
    start per distinct end (next functions are monotone, so ends are
    non-decreasing in the start and equal-end chains nest — see
    intervals.ordered_subs_shape). ``sub_starts``: [(packed sorted
    start keys, width)] per sub, in order."""
    starts0, w0 = sub_starts[0]
    cur = starts0
    if cur.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    valid = np.ones(cur.size, dtype=bool)
    end = cur + (w0 - 1)  # low-bit position arithmetic, same doc
    for nxt, w in sub_starts[1:]:
        if nxt.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        idx = np.searchsorted(nxt, end, side="right")
        ok = idx < nxt.size
        end = np.where(ok, nxt[np.minimum(idx, nxt.size - 1)] + (w - 1), -1)
        valid &= ok
    valid &= (cur >> 32) == (end >> 32)
    a_pk = cur[valid]
    e_pk = end[valid]
    if a_pk.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    keep = np.ones(e_pk.size, dtype=bool)
    keep[:-1] = e_pk[:-1] != e_pk[1:]  # last start per distinct end
    a_pk, e_pk = a_pk[keep], e_pk[keep]
    start = a_pk & 0xFFFFFFFF
    endp = e_pk & 0xFFFFFFFF
    doc = a_pk >> 32
    width = endp - start + 1
    if mg is not None:
        m = (width - min_extent) <= mg
        start, endp, doc, width = start[m], endp[m], doc[m], width[m]
    if doc.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    terms64 = 1.0 / np.maximum(width - min_extent + 1, 1).astype(np.float64)
    gstarts = np.concatenate(([0], np.flatnonzero(np.diff(doc)) + 1))
    counts = np.diff(np.concatenate((gstarts, [doc.size])))
    return _interval_score_batch(
        doc[gstarts], gstarts, counts, terms64, q, dtype, boost
    )


def _block_chain_starts(keys: list) -> np.ndarray:
    """Packed start keys of exact-adjacency chains: starts a whose a+i
    exists in term i's packed keys for every i — one
    searchsorted-equality pass per term (same-doc by construction:
    position arithmetic stays in the low bits)."""
    a = keys[0]
    if a.size == 0:
        return np.empty(0, np.int64)
    valid = np.ones(a.size, dtype=bool)
    for i, nxt in enumerate(keys[1:], start=1):
        if nxt.size == 0:
            return np.empty(0, np.int64)
        want = a + i
        idx = np.searchsorted(nxt, want)
        ok = idx < nxt.size
        idx_c = np.minimum(idx, nxt.size - 1)
        valid &= ok & (nxt[idx_c] == want)
    return a[valid]


def _interval_block_batch(plists, min_extent, mg, q, dtype, boost):
    """Across-docs evaluation for BLOCK (exact adjacency) over k
    distinct terms. Every occurrence is an interval of width k (gaps 0;
    a MaxGaps wrap only gates on max_gaps >= 0), so freq = occurrence
    count."""
    keys = [
        (dd.astype(np.int64) << 32) | pp.astype(np.int64)
        for dd, pp in plists
    ]
    if mg is not None and mg < 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    a = _block_chain_starts(keys)
    if a.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    doc = a >> 32
    terms64 = np.ones(doc.size, np.float64)  # 1/max(k - k + 1, 1)
    gstarts = np.concatenate(([0], np.flatnonzero(np.diff(doc)) + 1))
    counts = np.diff(np.concatenate((gstarts, [doc.size])))
    return _interval_score_batch(
        doc[gstarts], gstarts, counts, terms64, q, dtype, boost
    )


def _sweep_ordered_stream(subs, mg):
    """Minimal-interval STREAM of ORDERED over sub streams — the
    stream-valued generalization of ``_interval_ordered_batch``'s
    composed-next sweep to VARIABLE-width subs: each sub is a packed
    (start keys, end keys) minimal stream (starts and ends both
    strictly increasing — minimality forbids containment), so "first
    sub-interval starting after the previous end" is also the one with
    the smallest end, found by one searchsorted per sub.  Minimality of
    the composed stream keeps the LAST chain start per distinct end;
    a MaxGaps wrap then filters by gaps = width - sum of the chain's
    sub widths (``_OrderedIt`` slop bookkeeping).  Returns (start
    keys, end keys)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    cur, end = subs[0]
    if cur.size == 0:
        return empty
    wsum = end - cur + 1  # same-doc packed keys: low-bit diff
    valid = np.ones(cur.size, dtype=bool)
    for sj, ej in subs[1:]:
        if sj.size == 0:
            return empty
        idx = np.searchsorted(sj, end, side="right")
        ok = idx < sj.size
        idxc = np.minimum(idx, sj.size - 1)
        wsum = wsum + np.where(ok, ej[idxc] - sj[idxc] + 1, 0)
        end = np.where(ok, ej[idxc], -1)
        valid &= ok
    valid &= (cur >> 32) == (end >> 32)
    cur, end, wsum = cur[valid], end[valid], wsum[valid]
    if cur.size == 0:
        return empty
    keep = np.ones(end.size, dtype=bool)
    keep[:-1] = end[:-1] != end[1:]  # last start per distinct end
    cur, end, wsum = cur[keep], end[keep], wsum[keep]
    if mg is not None:
        width = (end & 0xFFFFFFFF) - (cur & 0xFFFFFFFF) + 1
        m = (width - wsum) <= mg
        cur, end = cur[m], end[m]
    return cur, end


def _sweep_unordered_stream(subs, mg):
    """Enumerated STREAM of UNORDERED over sub streams — the
    stream-valued generalization of ``_interval_unordered_batch``'s
    sweep to VARIABLE-width subs, replicating ``_UnorderedIt``'s
    queue physics exactly (the freq contract sums over the ITERATOR's
    emissions, lazy-minimization warts included):

    The queue pops intervals in ascending start order, so at interval
    X's pop every other sub's CURRENT interval is its first with start
    > X.start (all earlier ones were popped), and — because each sub
    stream is minimal, ends increasing — the queue's right extreme is
    the max of the current ends.  Candidate window at X:
    W_X = (X.start, max(X.end, other subs' current ends)), valid only
    when every other sub still has a same-doc current.  The minimize
    loop then SKIPS W_i exactly when the next candidate keeps the same
    right extreme and X_i does not itself define it
    (``UnorderedIntervalsSource.java:86-170``): emit W_i unless
    (W_{i+1} valid and r_{i+1} == r_i and X_i.end != r_i).

    For width-1 subs every candidate's right extreme is the new event
    itself (strictly increasing), the skip never fires, and this
    degenerates to the proven flat sweep.  A MaxGaps wrap filters the
    emissions by gaps = width - sum of current sub widths.  Returns
    (start keys, end keys)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    key = np.concatenate([s for s, _ in subs])
    ekey = np.concatenate([e for _, e in subs])
    code = np.concatenate(
        [np.full(s.size, ci, np.int8) for ci, (s, _) in enumerate(subs)]
    )
    order = np.argsort(key, kind="stable")  # disjoint leaf terms: no ties
    key, ekey, code = key[order], ekey[order], code[order]
    n = key.size
    if n == 0:
        return empty
    r = ekey.copy()  # right extreme, seeded with X's own end
    wsum = ekey - key + 1  # X's own width
    valid = np.ones(n, dtype=bool)
    for ci, (sj, ej) in enumerate(subs):
        other = code != ci
        idx = np.searchsorted(sj, key, side="right")
        ok = idx < sj.size
        idxc = np.minimum(idx, sj.size - 1)
        ns, ne = sj[idxc], ej[idxc]
        avail = ok & ((ns >> 32) == (key >> 32))  # same-doc current
        valid &= avail | ~other
        add = other & avail
        np.maximum(r, np.where(add, ne, -1), out=r)
        wsum += np.where(add, ne - ns + 1, 0)
    # emission: skip W_i when the NEXT candidate (same doc, valid)
    # keeps the right extreme and X_i does not define it
    nxt_valid = np.zeros(n, dtype=bool)
    nxt_valid[:-1] = valid[1:] & ((key[1:] >> 32) == (key[:-1] >> 32))
    nxt_r = np.empty(n, np.int64)
    nxt_r[:-1] = r[1:]
    nxt_r[-1] = -1
    skip = nxt_valid & (nxt_r == r) & (ekey != r)
    emit = valid & ~skip
    start, end, wsum = key[emit], r[emit], wsum[emit]
    if mg is not None:
        width = (end & 0xFFFFFFFF) - (start & 0xFFFFFFFF) + 1
        m = (width - wsum) <= mg
        start, end = start[m], end[m]
    return start, end


def _tree_stream(node, sub_plist):
    """Packed (start keys, end keys) minimal stream of a tree-shape
    node, composed bottom-up (``intervals.tree_shape`` spec grammar).
    ``sub_plist(terms) -> (doc array, pos array)`` supplies the merged
    occurrence list of a leaf's term set, doc-major sorted."""
    kind, payload, mg = node
    if kind == "term":
        dd, pp = sub_plist(payload)
        k = (dd.astype(np.int64) << 32) | pp.astype(np.int64)
        if mg is not None and mg < 0:
            k = k[:0]  # width-1 gaps are 0
        return k, k
    if kind == "block":
        term_keys = []
        for t in payload:
            dd, pp = sub_plist((t,))
            term_keys.append(
                (dd.astype(np.int64) << 32) | pp.astype(np.int64)
            )
        a = _block_chain_starts(term_keys)
        if mg is not None and mg < 0:
            a = a[:0]
        return a, a + (len(payload) - 1)
    kids = [_tree_stream(c, sub_plist) for c in payload]
    if any(s.size == 0 for s, _ in kids):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if kind == "ordered":
        return _sweep_ordered_stream(kids, mg)
    return _sweep_unordered_stream(kids, mg)


def _interval_tree_batch(spec, sub_plist, min_extent, q, dtype, boost):
    """Across-docs evaluation of a combinator TREE
    (``intervals.tree_shape``): compose each node's minimal stream
    bottom-up with the stream sweeps, then score the root stream —
    freq per doc sums 1/max(width - minExtent + 1, 1) in enumeration
    order (ascending starts), the same mixed-precision stepping as the
    flat paths."""
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    s_pk, e_pk = _tree_stream(spec, sub_plist)
    if s_pk.size == 0:
        return empty
    doc = s_pk >> 32
    width = (e_pk & 0xFFFFFFFF) - (s_pk & 0xFFFFFFFF) + 1
    terms64 = 1.0 / np.maximum(width - min_extent + 1, 1).astype(np.float64)
    gstarts = np.concatenate(([0], np.flatnonzero(np.diff(doc)) + 1))
    counts = np.diff(np.concatenate((gstarts, [doc.size])))
    return _interval_score_batch(
        doc[gstarts], gstarts, counts, terms64, q, dtype, boost
    )


def _interval_prepare(seg: SegmentView, q: "ast.IntervalQuery"):
    """(src, tbs, docs_of, cand) — the DOC-LEVEL half of IntervalQuery
    evaluation: source expansion, per-term doc decode, and the
    vectorized approximation.  No ``pos_bin`` is read here; position
    decode happens in ``_interval_eval`` and only for the candidates it
    is given (the impact-pruned leaf hands it per-window survivors)."""
    from lucene_spark.search import intervals as iv

    src = expand_interval_source(seg.terms.keys(), q.source, q.field)
    terms = sorted(src.terms())
    docs_of: dict = {}
    tbs: dict = {}
    for t in terms:
        # a term containing the field separator is already qualified
        # (fix_field rewrite); bare terms resolve against q.field
        tb = seg.term_blocks(
            t if ast.FIELD_SEP in t else ast.fielded(q.field, t)
        )
        if tb is None:
            docs_of[t] = np.empty(0, np.int64)
            continue
        d, _ = tb.decode_all()
        d = d[seg.live_mask(d)]
        docs_of[t] = d
        tbs[t] = tb
    cand = np.asarray(iv.approx_docs(src, docs_of), dtype=np.int64)
    return src, tbs, docs_of, cand


def _interval_docs_scores(seg: SegmentView, q: "ast.IntervalQuery", dtype, boost=1.0):
    """IntervalQuery evaluation over one segment (IntervalWeight /
    IntervalScorer): doc candidates from the source's vectorized
    approximation over per-term doc sets, then the per-doc minimal
    interval enumeration and the saturation/sigmoid score
    (``IntervalScorer.java`` + ``IntervalScoreFunction.java``; see
    ``lucene_spark/search/intervals.py``). Docs whose enumeration is
    empty (filtered sources) are non-matches, like the reference's
    two-phase ``matches()``."""
    src, tbs, docs_of, cand = _interval_prepare(seg, q)
    if cand.size == 0:
        return cand, np.empty(0, np.float64)
    return _interval_eval(src, tbs, docs_of, cand, q, dtype, boost)


def _interval_eval(src, tbs, docs_of, cand, q, dtype, boost):
    """(docs, scores) of the candidate subset ``cand`` — per-doc
    results are independent of the subset (each doc's enumeration sees
    only its own positions), so windowed evaluation over partitions of
    the candidate set is bit-identical to one whole-set pass."""
    from lucene_spark.search import intervals as iv

    if cand.size == 0:
        return cand, np.empty(0, np.float64)
    # single-position-sub shapes (Terms or disjoint Or-of-Terms under
    # ordered/unordered/block, optional maxgaps): across-docs vectorized
    # evaluation — no per-doc Python at all, one packed argsort +
    # grouped accumulation

    def _sub_plist(sub_terms):
        """One sub's merged (doc, pos) arrays over the candidates —
        an Or-of-Terms sub behaves as a single pseudo-term whose
        positions are the union (width-1 intervals cannot nest)."""
        parts = [
            _flat_positions_for_docs(
                tbs[t], np.intersect1d(cand, docs_of[t], assume_unique=True)
            )
            for t in sub_terms
            if t in tbs
        ]
        if not parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        dd = np.concatenate([a for a, _ in parts])
        pp = np.concatenate([b for _, b in parts])
        key = (dd << 32) | pp
        o = np.argsort(key, kind="stable")
        return dd[o], pp[o]

    def _sub_start_keys(specs):
        """[(packed sorted start keys, width)] per fixed-width sub —
        shared by the ordered and unordered sweeps (block subs run the
        adjacency-chain filter per term first)."""
        out = []
        for kind, ts, w in specs:
            if kind == "block":
                term_keys = []
                for t in ts:
                    dd, pp = _flat_positions_for_docs(
                        tbs[t],
                        np.intersect1d(
                            cand, docs_of[t], assume_unique=True
                        ),
                    ) if t in tbs else (
                        np.empty(0, np.int64), np.empty(0, np.int64)
                    )
                    term_keys.append(
                        (dd.astype(np.int64) << 32) | pp.astype(np.int64)
                    )
                out.append((_block_chain_starts(term_keys), w))
            else:
                dd, pp = _sub_plist(ts)
                out.append(
                    ((dd.astype(np.int64) << 32) | pp.astype(np.int64), w)
                )
        return out

    if not _INTERVAL_FAST_OFF:
        ushape = iv.unordered_subs_shape(src)
        if ushape is not None:
            specs, mg = ushape
            return _interval_unordered_batch(
                _sub_start_keys(specs), sum(w for _, _, w in specs),
                mg, q, dtype, boost,
            )
        bshape = iv.block_terms_shape(src)
        if bshape is not None:
            subs_terms, mg = bshape
            plists = [_sub_plist(ts) for ts in subs_terms]
            return _interval_block_batch(
                plists, len(subs_terms), mg, q, dtype, boost
            )
        oshape = iv.ordered_subs_shape(src)
        if oshape is not None:
            specs, mg = oshape
            return _interval_ordered_batch(
                _sub_start_keys(specs), sum(w for _, _, w in specs),
                mg, q, dtype, boost,
            )
        tshape = iv.tree_shape(src)
        if tshape is not None:
            return _interval_tree_batch(
                tshape, _sub_plist, src.min_extent(), q, dtype, boost
            )
    # positions only for (term, candidate∩term) — block-grouped decode
    pay_terms = iv.payload_terms(src)
    per_doc: dict = {int(d): {} for d in cand}
    for t, tb in tbs.items():
        mine = np.intersect1d(cand, docs_of[t], assume_unique=True)
        if mine.size == 0:
            continue
        want_pay = t in pay_terms
        if want_pay and not tb.has_payloads:
            # PayloadFilteredTermIntervalsSource.java:56-62
            raise ValueError(
                "Cannot create a payload-filtered iterator: the index "
                "has no indexed payloads (build with a payload-producing "
                "analyzer, lucene_spark/analysis/payloads.py)"
            )
        pays = _payloads_for_docs(tb, mine) if want_pay else None
        for row, (d, pl) in enumerate(zip(mine, _positions_for_docs(tb, mine))):
            per_doc[int(d)][t] = pl
            if pays is not None:
                per_doc[int(d)][("pay", t)] = pays[row]
    out_docs: list = []
    out_scores: list = []
    for d in cand:
        pos_of = per_doc[int(d)]
        if dtype == "f32":
            f = iv.interval_freq(src, pos_of)
            if f <= 0.0:
                continue
            s = (
                iv.saturation_score(f, boost, q.pivot)
                if q.exp is None
                else iv.sigmoid_score(f, boost, q.pivot, q.exp)
            )
        else:
            f = iv.interval_freq64(src, pos_of)
            if f <= 0.0:
                continue
            s = (
                iv.saturation_score64(f, boost, q.pivot)
                if q.exp is None
                else iv.sigmoid_score64(f, boost, q.pivot, q.exp)
            )
        out_docs.append(int(d))
        out_scores.append(s)
    return (
        np.asarray(out_docs, dtype=np.int64),
        np.asarray(out_scores, dtype=np.float64),
    )


def _clause_score32(seg, q, scorers, dtype, boost=1.0):
    """Clause (docs, per-clause score) with the nested f32 cast applied
    (each nested scorer returns float in the reference)."""
    d, s = score_exhaustive(seg, q, scorers, dtype, boost)
    if dtype == "f32":
        s = s.astype(np.float32).astype(np.float64)
    return d, s


def _score_bool_exhaustive(seg, q: ast.BooleanQuery, scorers, dtype, boost=1.0):
    scored = [_clause_score32(seg, c, scorers, dtype, boost) for c in q.must]
    must_sets = [d for d, _ in scored]
    for c in q.filter:
        d, _ = score_exhaustive(seg, c, scorers, dtype)
        must_sets.append(d)
    should = [_clause_score32(seg, c, scorers, dtype, boost) for c in q.should]
    msm = q.min_should_match
    if must_sets:
        cand = must_sets[0]
        for d in must_sets[1:]:
            cand = np.intersect1d(cand, d, assume_unique=True)
    else:
        if not should:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cand = np.unique(np.concatenate([d for d, _ in should]))
    if should and (msm > 0 or not must_sets):
        need = msm if must_sets else max(msm, 1)
        if need > 0 and cand.size:
            cnt = np.zeros(cand.size, dtype=np.int64)
            for d, _ in should:
                cnt += np.isin(cand, d, assume_unique=True)
            cand = cand[cnt >= need]
    for c in q.must_not:
        d, _ = score_exhaustive(seg, c, scorers, dtype)
        cand = np.setdiff1d(cand, d, assume_unique=True)
    if cand.size == 0:
        return cand.astype(np.int64), np.empty(0, np.float64)
    acc = np.zeros(cand.size, dtype=np.float64)
    for d, s in scored + should:
        if d.size == 0:
            continue
        idx = np.searchsorted(d, cand)
        idx_c = np.minimum(idx, d.size - 1)
        m = d[idx_c] == cand
        acc[m] += s[idx_c[m]]
    return cand, acc


# -------------------------------------------------------------- phrase match


def _positions_for_docs(tb: TermBlocks, docs: np.ndarray) -> list:
    """Per requested doc, its position array (doc must be present)."""
    out: list = [None] * docs.size
    bidx = np.searchsorted(tb.last_doc, docs, side="left")
    for b in np.unique(bidx):
        sel = np.flatnonzero(bidx == b)
        bd, _ = tb.decode(int(b))
        flat, bounds = tb.decode_positions(int(b))
        j = np.searchsorted(bd, docs[sel])
        for row, jj in zip(sel, j):
            out[row] = flat[bounds[jj] : bounds[jj + 1]]
    return out


def _payloads_for_docs(tb: TermBlocks, docs: np.ndarray) -> list:
    """Per requested doc, its per-position payload list (aligned with
    the doc's position array; doc must be present) — the block-grouped
    mirror of ``_positions_for_docs`` over the ``pay_bin`` streams."""
    out: list = [None] * docs.size
    bidx = np.searchsorted(tb.last_doc, docs, side="left")
    for b in np.unique(bidx):
        sel = np.flatnonzero(bidx == b)
        bd, bt = tb.decode(int(b))
        pays = tb.decode_payloads(int(b))
        bounds = np.concatenate(([0], np.cumsum(bt)))
        j = np.searchsorted(bd, docs[sel])
        for row, jj in zip(sel, j):
            out[row] = pays[bounds[jj] : bounds[jj + 1]]
    return out


def _offsets_for_docs(tb: TermBlocks, docs: np.ndarray) -> list:
    """Per requested doc, its (starts, ends) offset arrays aligned with
    the doc's positions (doc must be present) — the block-grouped
    mirror of ``_positions_for_docs`` over the ``off_bin`` streams."""
    out: list = [None] * docs.size
    bidx = np.searchsorted(tb.last_doc, docs, side="left")
    for b in np.unique(bidx):
        sel = np.flatnonzero(bidx == b)
        bd, bt = tb.decode(int(b))
        st, en = tb.decode_offsets(int(b))
        bounds = np.concatenate(([0], np.cumsum(bt)))
        j = np.searchsorted(bd, docs[sel])
        for row, jj in zip(sel, j):
            out[row] = (st[bounds[jj] : bounds[jj + 1]], en[bounds[jj] : bounds[jj + 1]])
    return out


def _phrase_doc_freqs(seg: SegmentView, q: ast.PhraseQuery):
    """Phrase matching: doc-level AND approximation, then position
    verification — exact (slop=0, integer phraseFreq) or sloppy
    (slop>0, float32 sloppyFreq accumulation; PhraseScorer.java:86-95).
    Returns (docs with freq>0, freqs)."""
    tbs = [seg.term_blocks(t) for t in q.terms]
    if any(tb is None for tb in tbs):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs = None
    for tb in tbs:
        d, _ = tb.decode_all()
        docs = d if docs is None else np.intersect1d(docs, d, assume_unique=True)
        if docs.size == 0:
            return docs, np.empty(0, np.int64)
    docs = docs[seg.live_mask(docs)]
    if docs.size == 0:
        return docs, np.empty(0, np.int64)
    if q.slop > 0:
        return _verify_sloppy(seg, q, tbs, docs)
    return _verify_phrase(seg, q, tbs, docs)


def _sloppy_prefilter(tbs, q, docs):
    """Candidate mask: a true sloppy match puts ALL adjusted phrase
    positions inside one window of span <= slop
    (``SloppyPhraseMatcher.java`` matchLength), so every term PAIR must
    have adjusted positions within slop of each other — checked here
    vectorized over all candidate docs with the packed
    ``doc<<32|adjusted_pos`` keys (one band searchsorted per extra
    term). Necessary condition: true matches always survive; the exact
    greedy matcher runs only on survivors."""
    keys = []
    for tb, rel in zip(tbs, q.positions):
        lens, flat = _positions_flat(tb, docs)
        didx = np.repeat(np.arange(docs.size, dtype=np.int64), lens)
        keys.append((didx << 32) | (flat - rel + _POS_OFF))
    alive = np.ones(docs.size, dtype=bool)
    k0 = keys[0]
    slop = int(q.slop)
    for kj in keys[1:]:
        lo = np.searchsorted(kj, k0 - slop)
        hi = np.searchsorted(kj, k0 + slop + 1)
        hit = lo < hi  # this k0 occurrence has a j-partner within slop
        ok = np.zeros(docs.size, dtype=bool)
        ok[np.unique(k0[hit] >> 32)] = True
        alive &= ok
    return alive


def _verify_sloppy(seg, q, tbs, docs):
    from lucene_spark.search.sloppy import (
        repeat_groups,
        sloppy_freq,
        sloppy_freq_repeats,
    )

    if docs.size > 1:
        docs = docs[_sloppy_prefilter(tbs, q, docs)]
        if docs.size == 0:
            return docs, np.empty(0, np.float64)
    groups = repeat_groups(q.terms)
    flats = [_positions_flat(tb, docs) for tb in tbs]
    freqs = np.zeros(docs.size, dtype=np.float64)
    # vectorized singleton fast path: when EVERY term occurs exactly
    # once in the doc (the common case on web-length docs), the greedy
    # matcher emits exactly one candidate match of
    # matchLength = span(shifted positions) — freq is the closed form
    # 1f/(1f + span) when span <= slop, bit-identical to the matcher
    # (single match, so no f32 accumulation-order concern). Invalid
    # with repeat groups (a repeated term's two pps on one position
    # collide to 0 matches), which keep the exact matcher.
    todo = np.arange(docs.size)
    if groups is None and docs.size > 0:
        lens_mat = np.stack([lens for lens, _ in flats])
        single = np.all(lens_mat == 1, axis=0)
        if np.any(single):
            starts = [np.cumsum(lens) - lens for lens, _ in flats]
            shifted = np.stack([
                flat[st[single]] - int(rel)
                for (lens, flat), st, rel in zip(flats, starts, q.positions)
            ])
            span = shifted.max(axis=0) - shifted.min(axis=0)
            ok = span <= int(q.slop)
            f32 = (
                np.float32(1.0)
                / (np.float32(1.0) + span.astype(np.float32))
            )
            out = np.where(ok, f32.astype(np.float64), 0.0)
            freqs[np.flatnonzero(single)] = out
            todo = np.flatnonzero(~single)
    if todo.size:
        from lucene_spark.search.sloppy import sloppy_freq_2

        pos_lists = [
            np.split(flat, np.cumsum(lens)[:-1]) for lens, flat in flats
        ]
        rels = q.positions
        two = (
            groups is None and len(pos_lists) == 2 and rels[0] != rels[1]
        )
        for i in todo:
            pls = [pl[i] for pl in pos_lists]
            if two:
                freqs[i] = sloppy_freq_2(
                    pls[0], pls[1], int(rels[0]), int(rels[1]), q.slop
                )
            elif groups is None:
                freqs[i] = sloppy_freq(pls, rels, q.slop)
            else:
                freqs[i] = sloppy_freq_repeats(pls, rels, q.slop, groups)
    hit = freqs > 0
    return docs[hit], freqs[hit]


_POS_OFF = 1 << 20  # keeps (pos - rel) non-negative in the packed key


def _positions_flat(tb: TermBlocks, docs: np.ndarray, optional: bool = False):
    """(lens, flat): per-doc position counts and the concatenation of
    all requested docs' positions in doc order — the ragged slices are
    gathered with one index-arithmetic pass per block, no per-doc
    Python loop. ``docs`` must be sorted; with ``optional=True`` absent
    docs get length 0 (the MultiPhrase per-slot union case)."""
    lens = np.zeros(docs.size, dtype=np.int64)
    parts: list = []
    bidx = np.searchsorted(tb.last_doc, docs, side="left")
    for b in np.unique(bidx):
        if b >= tb.nblocks:
            continue
        sel = np.flatnonzero(bidx == b)
        bd, _ = tb.decode(int(b))
        flat, bounds = tb.decode_positions(int(b))
        jj = np.searchsorted(bd, docs[sel])
        if optional:
            ok = (jj < bd.size) & (bd[np.minimum(jj, bd.size - 1)] == docs[sel])
            sel, jj = sel[ok], jj[ok]
            if sel.size == 0:
                continue
        lb = bounds[jj + 1] - bounds[jj]
        lens[sel] = lb
        offs = np.concatenate(([0], np.cumsum(lb)))
        idx = np.arange(offs[-1]) + np.repeat(bounds[jj] - offs[:-1], lb)
        parts.append(flat[idx])
    return lens, (np.concatenate(parts) if parts else _EMPTY_POS)


def _verify_phrase(seg, q, tbs, docs):
    """Exact-phrase verification, vectorized across ALL candidate docs:
    each term's occurrences become packed ``doc_index << 32 | (pos -
    rel)`` keys (globally sorted by construction), so the whole
    candidate set needs ONE sorted intersection per phrase term instead
    of one per (doc, term) — phraseFreq per doc is then a bincount of
    the surviving keys."""
    rels = q.positions
    keys = None
    for tb, rel in zip(tbs, rels):
        lens, flat = _positions_flat(tb, docs)
        didx = np.repeat(np.arange(docs.size, dtype=np.int64), lens)
        k = (didx << 32) | (flat - rel + _POS_OFF)
        keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
        if keys.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
    freqs = np.bincount(keys >> 32, minlength=docs.size)
    hit = freqs > 0
    return docs[hit], freqs[hit].astype(np.int64)


_EMPTY_POS = np.empty(0, np.int64)


def _slot_union_keys(tbs, docs, rel: int):
    """Sorted packed ``doc<<32|(pos - rel + _POS_OFF)`` keys of one
    slot's UNION positions over ``docs`` (the UnionPostingsEnum dedup is
    the np.unique across members)."""
    member_keys = []
    for tb in tbs:
        lens, flat = _positions_flat(tb, docs, optional=True)
        didx = np.repeat(np.arange(docs.size, dtype=np.int64), lens)
        member_keys.append((didx << 32) | (flat - rel + _POS_OFF))
    if len(member_keys) > 1:
        return np.unique(np.concatenate(member_keys))
    return member_keys[0]


def _verify_multi_exact(slot_tbs, rels, docs):
    """Exact multi-phrase verification at given candidate ``docs``:
    per-slot union of member positions as packed doc<<32|pos keys, one
    sorted intersection per slot (same vectorization as
    ``_verify_phrase``)."""
    keys = None
    for tbs, rel in zip(slot_tbs, rels):
        k = _slot_union_keys(tbs, docs, rel)
        keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
        if keys.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
    freqs = np.bincount(keys >> 32, minlength=docs.size)
    hit = freqs > 0
    return docs[hit], freqs[hit].astype(np.int64)


def _multi_phrase_doc_freqs(seg: SegmentView, q: ast.MultiPhraseQuery):
    """MultiPhraseQuery matching (``search/MultiPhraseQuery.java`` via
    ``UnionPostingsEnum``): each slot accepts any of its member terms;
    slot positions are the union of member positions. slop == 0 is the
    vectorized exact intersection; slop > 0 runs the SloppyPhraseMatcher
    over the union lists — including slots sharing a term
    (hasMultiTermRpts, ``SloppyPhraseMatcher.java:453-472,575-600``:
    bipartite-component repeat groups, dynamic collision resolution at
    init) — with the same vectorized pairwise-band pre-filter as
    single-term sloppy phrases."""
    slot_tbs: list = []
    slot_present: list = []
    for slot in q.slots:
        pairs = [
            (t, tb)
            for t, tb in ((t, seg.term_blocks(t)) for t in slot)
            if tb is not None
        ]
        if not pairs:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        slot_present.append(tuple(t for t, _ in pairs))
        slot_tbs.append([tb for _, tb in pairs])
    docs = None
    for tbs in slot_tbs:
        d = np.unique(np.concatenate([tb.decode_all()[0] for tb in tbs]))
        docs = d if docs is None else np.intersect1d(docs, d, assume_unique=True)
        if docs.size == 0:
            return docs, np.empty(0, np.int64)
    docs = docs[seg.live_mask(docs)]
    if docs.size == 0:
        return docs, np.empty(0, np.int64)
    rels = q.positions
    if q.slop > 0:
        return _verify_multi_sloppy(slot_tbs, rels, q.slop, docs, slot_present)
    return _verify_multi_exact(slot_tbs, rels, docs)


def _verify_multi_sloppy(slot_tbs, rels, slop: int, docs: np.ndarray,
                         slot_terms=None):
    """Sloppy verification over slot-union positions: the pairwise
    within-slop band pre-filter (necessary condition even with repeats
    — every pp of a true match sits inside the <=slop window), then the
    exact greedy matcher per surviving doc — float32 sloppyFreq.
    ``slot_terms``: per-slot PRESENT terms for repeat-group detection
    (slots sharing a term take the repeat/hasMultiTermRpts machinery)."""
    from lucene_spark.search.sloppy import (
        multi_repeat_groups,
        sloppy_freq,
        sloppy_freq_repeats,
    )

    groups, mtr = (
        multi_repeat_groups(slot_terms) if slot_terms else (None, False)
    )

    slot_keys = [
        _slot_union_keys(tbs, docs, rel) for tbs, rel in zip(slot_tbs, rels)
    ]
    if docs.size > 1 and len(slot_keys) > 1:
        alive = np.ones(docs.size, dtype=bool)
        k0 = slot_keys[0]
        for kj in slot_keys[1:]:
            lo = np.searchsorted(kj, k0 - slop)
            hi = np.searchsorted(kj, k0 + slop + 1)
            hit = lo < hi
            ok = np.zeros(docs.size, dtype=bool)
            ok[np.unique(k0[hit] >> 32)] = True
            alive &= ok
        keep = np.flatnonzero(alive)
        if keep.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        remap = np.full(docs.size, -1, dtype=np.int64)
        remap[keep] = np.arange(keep.size)
        new_keys = []
        for k in slot_keys:
            d = k >> 32
            m = alive[d]
            new_keys.append((remap[d[m]] << 32) | (k[m] & 0xFFFFFFFF))
        slot_keys = new_keys
        docs = docs[keep]
    # per-slot RAW position arrays + per-doc bounds (undo the rel shift
    # so the matcher applies offsets itself)
    slot_pos, slot_bounds = [], []
    for k, rel in zip(slot_keys, rels):
        d = k >> 32
        slot_pos.append((k & 0xFFFFFFFF).astype(np.int64) - _POS_OFF + rel)
        slot_bounds.append(np.searchsorted(d, np.arange(docs.size + 1)))
    lens_mat = np.stack([np.diff(b) for b in slot_bounds])
    freqs = np.zeros(docs.size, dtype=np.float64)
    # singleton fast path (see _verify_sloppy): one union position per
    # slot => the greedy matcher's single candidate match, closed-form
    # 1f/(1f+span); only without repeat groups
    todo = np.flatnonzero(np.all(lens_mat >= 1, axis=0))
    if groups is None and todo.size:
        single = np.all(lens_mat == 1, axis=0)
        sel = np.flatnonzero(single)
        if sel.size:
            shifted = np.stack([
                pos[b[:-1][sel]] - int(rel)
                for pos, b, rel in zip(slot_pos, slot_bounds, rels)
            ])
            span = shifted.max(axis=0) - shifted.min(axis=0)
            ok = span <= int(slop)
            f32 = (
                np.float32(1.0)
                / (np.float32(1.0) + span.astype(np.float32))
            )
            freqs[sel] = np.where(ok, f32.astype(np.float64), 0.0)
            todo = todo[~single[todo]]
    from lucene_spark.search.sloppy import sloppy_freq_2

    two = groups is None and len(slot_pos) == 2 and rels[0] != rels[1]
    for i in todo:
        pls = [
            pos[b[i] : b[i + 1]] for pos, b in zip(slot_pos, slot_bounds)
        ]
        if two:
            freqs[i] = sloppy_freq_2(
                pls[0], pls[1], int(rels[0]), int(rels[1]), slop
            )
        elif groups is None:
            freqs[i] = sloppy_freq(pls, rels, slop)
        else:
            freqs[i] = sloppy_freq_repeats(pls, rels, slop, groups, mtr)
    hit = freqs > 0
    return docs[hit], freqs[hit]


# ------------------------------------------------------------ pruned kernels


def _term_topk(seg, term, scorers, k, threshold, dtype, seed=-np.inf):
    tb = seg.term_blocks(term)
    heap = _TopK(k, threshold, seed)
    if tb is None:
        return heap
    scorer = scorers[("t", term)]
    bmax = tb.block_max_scores(scorer)
    # two-level skipping (Lucene104PostingsFormat.java:347-353): check
    # the 32-block group bound first; only groups that can compete
    # iterate their member blocks
    _, _, g_ndocs, g_bmax, g_starts, g_ends = tb.level1(scorer)
    for g in range(g_starts.size):
        theta = heap.theta
        if g_bmax[g] <= theta:
            heap.hits += int(g_ndocs[g])  # totalHits still counts skips
            continue
        for b in range(int(g_starts[g]), int(g_ends[g])):
            if bmax[b] <= heap.theta:
                heap.hits += int(tb.num_docs[b])
                continue
            d, t = tb.decode(b)
            m = seg.live_mask(d)
            d, t = d[m], t[m]
            s = scorer.score(t, tb.norms[d]).astype(np.float64)
            heap.update(d, s)
    return heap


def _and_topk(seg, terms, scorers, k, threshold, dtype, seed=-np.inf):
    """Block-max conjunction over term clauses, led by the rarest term."""
    heap = _TopK(k, threshold, seed)
    tbs = []
    for t in terms:
        tb = seg.term_blocks(t)
        if tb is None:
            return heap
        tbs.append((tb, scorers[("t", t)]))
    tbs.sort(key=lambda e: e[0].doc_freq)
    lead_tb, lead_sc = tbs[0]
    rest = tbs[1:]
    lead_bm = lead_tb.block_max_scores(lead_sc)
    rest_bm = [(tb, sc, tb.block_max_scores(sc)) for tb, sc in rest]
    # level-1 skip consumption (Lucene104PostingsFormat.java:347-353):
    # one bound check per 32-block LEAD GROUP; only groups that can
    # still compete (range-overlapping every term, group bound > theta)
    # iterate their member blocks
    _, _, _, g_bmax, g_starts, g_ends = lead_tb.level1(lead_sc)
    for g in range(g_starts.size):
        glo = int(lead_tb.first_doc[g_starts[g]])
        ghi = int(lead_tb.last_doc[g_ends[g] - 1])
        gbound = float(g_bmax[g])
        g_ok = True
        for tb, sc, bm in rest_bm:
            b0, b1 = tb.overlapping(glo, ghi)
            if b0 >= b1:
                g_ok = False
                break
            gbound += float(bm[b0:b1].max())
        if not g_ok or gbound <= heap.theta:
            continue
        for b in range(int(g_starts[g]), int(g_ends[g])):
            lo, hi = int(lead_tb.first_doc[b]), int(lead_tb.last_doc[b])
            bound = float(lead_bm[b])
            spans = []
            ok = True
            for tb, sc, bm in rest_bm:
                b0, b1 = tb.overlapping(lo, hi)
                if b0 >= b1:
                    ok = False
                    break
                bound += float(bm[b0:b1].max())
                spans.append((tb, sc, b0, b1))
            if not ok or bound <= heap.theta:
                continue
            d, t = lead_tb.decode(b)
            cand = d[seg.live_mask(d)]
            # follower advance by PROBE: decode only the rest-term
            # blocks that contain a surviving candidate, not the whole
            # overlapping range (leapfrog ConjunctionDISI.java:190-227)
            for tb, sc, b0, b1 in spans:
                p, _ = _probe_blocks(tb, cand)
                cand = cand[p]
                if cand.size == 0:
                    break
            if cand.size == 0:
                continue
            acc = np.zeros(cand.size, dtype=np.float64)
            # lead term tfs
            sel = np.searchsorted(d, cand)
            s = lead_sc.score(t[sel], lead_tb.norms[cand])
            acc += s.astype(np.float64)
            for tb, sc, b0, b1 in spans:
                p, tf = _probe_blocks(tb, cand)
                s = sc.score(tf, tb.norms[cand])
                acc += s.astype(np.float64)
            heap.update(cand, acc)
    return heap


def _phrase_topk(seg, q: ast.PhraseQuery, scorers, k, threshold, dtype, seed=-np.inf):
    """Two-phase pruned phrase: lead = rarest member term; block-max bound
    via phrase scorer over member impacts (valid: phraseFreq <= member tf)."""
    heap = _TopK(k, threshold, seed)
    tbs = [seg.term_blocks(t) for t in q.terms]
    if any(tb is None for tb in tbs):
        return heap
    psc = scorers[("p", q.terms)]
    order = np.argsort([tb.doc_freq for tb in tbs], kind="stable")
    lead = tbs[int(order[0])]
    bms = [tb.block_max_scores(psc) for tb in tbs]
    for b in range(lead.nblocks):
        lo, hi = int(lead.first_doc[b]), int(lead.last_doc[b])
        # bound: min over member terms of their max phrase-scored impact
        bound = np.inf
        ok = True
        for tb, bm in zip(tbs, bms):
            b0, b1 = tb.overlapping(lo, hi)
            if b0 >= b1:
                ok = False
                break
            bound = min(bound, float(bm[b0:b1].max()))
        if not ok or bound <= heap.theta:
            continue
        d, _ = lead.decode(b)
        cand = d[seg.live_mask(d)]
        # per-candidate refinement of the range bound: min across
        # members of the CONTAINING block's max phrase-scored impact
        # (ImpactsDISI.java:28-123 at block granularity) — candidates
        # that cannot beat theta never trigger a follower doc decode
        # or a position read
        theta = heap.theta
        if cand.size and theta > -np.inf:
            slots = [[(tb, bm)] for tb, bm in zip(tbs, bms)]
            cand = cand[_cand_block_bounds(slots, cand, "min") > theta]
        for tb in tbs:
            if tb is lead:
                continue
            if cand.size == 0:
                break
            p, _ = _probe_blocks(tb, cand)
            cand = cand[p]
        if cand.size == 0:
            continue
        docs, freqs = _verify_phrase(seg, q, tbs, cand)
        if docs.size:
            s = psc.score(freqs, tbs[0].norms[docs]).astype(np.float64)
            heap.update(docs, s)
    return heap


# ----------------------------------------------------- general WAND kernel
#
# Leaf adapters generalize the pruned kernels to arbitrary boolean
# shapes (scored OR with minShouldMatch>1, boosted clauses, MUST+SHOULD
# trees, filters, exclusions) — the WANDScorer.java:30-55,553-565 /
# MaxScoreBulkScorer.java:28-51 semantics, window-at-a-time: a 4096-doc
# window is skipped when sum(required bounds) + sum(overlapping
# optional bounds) cannot beat the heap threshold. Bounds are true
# upper bounds, so pruned == exhaustive (rank-safe).


def _probe_blocks(tb: TermBlocks, docs: np.ndarray):
    """(present mask, tf) of sorted candidate ``docs`` against one
    term's postings — decodes ONLY blocks whose doc range contains a
    candidate (the follower advance() of leapfrog intersection / the
    non-essential lookup of ``search/MaxScoreBulkScorer.java``)."""
    pres = np.zeros(docs.size, dtype=bool)
    tfs = np.zeros(docs.size, dtype=np.int64)
    bidx = np.searchsorted(tb.last_doc, docs, side="left")
    for b in np.unique(bidx):
        if b >= tb.nblocks:
            continue
        sel = np.flatnonzero(bidx == b)
        cand = docs[sel]
        # skip the decode when every candidate falls in the gap before
        # this block's first doc (level-0 skip consumption)
        if int(cand[-1]) < int(tb.first_doc[b]):
            continue
        d, t = tb.decode(int(b))
        jj = np.searchsorted(d, cand)
        ok = (jj < d.size) & (d[np.minimum(jj, d.size - 1)] == cand)
        sel, jj = sel[ok], jj[ok]
        if sel.size:
            pres[sel] = True
            tfs[sel] = t[jj]
    return pres, tfs


class _TermLeaf:
    """One term's postings as a window-scorable leaf (boost folded into
    the scorer weight at build time)."""

    __slots__ = ("tb", "scorer", "bm", "doc_freq")

    def __init__(self, tb: TermBlocks, scorer):
        self.tb = tb
        self.scorer = scorer
        self.bm = tb.block_max_scores(scorer)
        self.doc_freq = tb.doc_freq

    def overlaps(self, lo, hi) -> bool:
        b0, b1 = self.tb.overlapping(lo, hi)
        return b0 < b1

    def window_bound(self, lo, hi) -> float:
        b0, b1 = self.tb.overlapping(lo, hi)
        return float(self.bm[b0:b1].max()) if b0 < b1 else 0.0

    def windows(self, nwin: int) -> np.ndarray:
        return _block_windows(self.tb, nwin)

    def window_postings(self, seg, lo, hi, theta=-np.inf):
        b0, b1 = self.tb.overlapping(lo, hi)
        ds, ss = [], []
        for b in range(b0, b1):
            d, t = self.tb.decode(b)
            i0 = int(np.searchsorted(d, lo))
            i1 = int(np.searchsorted(d, hi, side="right"))
            if i0 >= i1:
                continue
            dd = d[i0:i1]
            ds.append(dd)
            ss.append(self.scorer.score(t[i0:i1], self.tb.norms[dd]).astype(np.float64))
        if not ds:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(ds), np.concatenate(ss)

    def window_docs(self, seg, lo, hi, theta=-np.inf) -> np.ndarray:
        d, _ = self.window_postings(seg, lo, hi)
        return d

    def probe(self, seg, docs):
        """(present mask, scores aligned to ``docs``; 0 where absent)."""
        pres, tfs = _probe_blocks(self.tb, docs)
        sc = np.zeros(docs.size, dtype=np.float64)
        if pres.any():
            idx = np.flatnonzero(pres)
            sc[idx] = self.scorer.score(
                tfs[idx], self.tb.norms[docs[idx]]
            ).astype(np.float64)
        return pres, sc


def _lead_window_docs(tbs, lo, hi, keep=None):
    """Docs in [lo, hi] present in EVERY member term: decode only the
    RAREST member's overlapping blocks; every other member is PROBED
    at the surviving candidates (``ConjunctionDISI.java`` follower
    advance — the probe decodes only blocks containing a candidate,
    never a member's full overlapping range).

    ``keep``: optional candidate filter applied to the LEAD docs before
    any follower probe — the impact-pruning hook (block-bound vs theta)
    that keeps non-competitive candidates from triggering follower doc
    decodes and, downstream, position decodes."""
    lead = min(tbs, key=lambda tb: tb.doc_freq)
    b0, b1 = lead.overlapping(lo, hi)
    if b0 >= b1:
        return np.empty(0, np.int64)
    d = np.concatenate([lead.decode(i)[0] for i in range(b0, b1)])
    i0 = int(np.searchsorted(d, lo))
    i1 = int(np.searchsorted(d, hi, side="right"))
    cand = d[i0:i1]
    if keep is not None and cand.size:
        cand = keep(cand)
    for tb in tbs:
        if tb is lead:
            continue
        if cand.size == 0:
            break
        p, _ = _probe_blocks(tb, cand)
        cand = cand[p]
    return cand


class _PhraseLeaf:
    """Exact phrase as a leaf: bound = min over member terms of their
    max phrase-scored impact (valid: phraseFreq <= any member tf);
    matching = doc-level AND then position verification."""

    __slots__ = ("tbs", "psc", "q", "bms", "doc_freq")

    def __init__(self, tbs, psc, q: ast.PhraseQuery):
        self.tbs = tbs
        self.psc = psc
        self.q = q
        self.bms = [tb.block_max_scores(psc) for tb in tbs]
        self.doc_freq = min(tb.doc_freq for tb in tbs)

    def overlaps(self, lo, hi) -> bool:
        for tb in self.tbs:
            b0, b1 = tb.overlapping(lo, hi)
            if b0 >= b1:
                return False
        return True

    def window_bound(self, lo, hi) -> float:
        bound = np.inf
        for tb, bm in zip(self.tbs, self.bms):
            b0, b1 = tb.overlapping(lo, hi)
            if b0 >= b1:
                return 0.0
            bound = min(bound, float(bm[b0:b1].max()))
        return bound

    def windows(self, nwin: int) -> np.ndarray:
        lead = min(self.tbs, key=lambda tb: tb.doc_freq)
        return _block_windows(lead, nwin)

    def _keep(self, theta):
        """Candidate filter for impact-pruned decode: when a theta is
        active, drop lead candidates whose containing-block phrase
        bound cannot beat it — their ``pos_bin`` is never read
        (ImpactsDISI-behind-PhraseScorer at block granularity)."""
        if theta == -np.inf:
            return None
        slots = [[(tb, bm)] for tb, bm in zip(self.tbs, self.bms)]
        mode = "min" if self.q.slop == 0 else "sum"
        return lambda c: c[_cand_block_bounds(slots, c, mode) > theta]

    def window_postings(self, seg, lo, hi, theta=-np.inf):
        # leapfrog: decode only the RAREST member's blocks in the
        # window; every other member is PROBED at the surviving
        # candidates (ConjunctionDISI.java follower advance — probe
        # decodes only blocks that contain a candidate)
        cand = _lead_window_docs(self.tbs, lo, hi, keep=self._keep(theta))
        if cand.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs, freqs = _verify_phrase(seg, self.q, self.tbs, cand)
        if docs.size == 0:
            return docs, np.empty(0, np.float64)
        return docs, self.psc.score(freqs, self.tbs[0].norms[docs]).astype(np.float64)

    def window_docs(self, seg, lo, hi, theta=-np.inf) -> np.ndarray:
        d, _ = self.window_postings(seg, lo, hi, theta)
        return d

    def probe(self, seg, docs):
        cand = docs
        for tb in self.tbs:
            if cand.size == 0:
                break
            p, _ = _probe_blocks(tb, cand)
            cand = cand[p]
        pres = np.zeros(docs.size, dtype=bool)
        sc = np.zeros(docs.size, dtype=np.float64)
        if cand.size:
            dd, ff = _verify_phrase(seg, self.q, self.tbs, cand)
            if dd.size:
                idx = np.searchsorted(docs, dd)
                pres[idx] = True
                sc[idx] = self.psc.score(
                    ff, self.tbs[0].norms[dd]
                ).astype(np.float64)
        return pres, sc


def _pad_bound(b: float) -> float:
    """Inflate a SUBADDITIVITY-derived score bound by a small relative
    margin so float32 rounding can never flip it below a true doc
    score.  The sum bounds below rest on real-arithmetic concavity
    (score(a+b) <= score(a)+score(b) for score(x)=w*x*c/(1+x*c),
    concave with score(0)=0); computed f32 scores sit within a few ulps
    (~1e-7 relative) of the real values, so 1e-5 relative dominates any
    rounding drift while costing no measurable pruning power.  Bounds
    stay true upper bounds -> pruning stays rank-safe."""
    return b + abs(b) * 1e-5


def _cand_block_bounds(slots, cand, combine):
    """Per-candidate score upper bound from the CONTAINING BLOCK's
    impact-derived maxima — the block granularity of
    ``ImpactsDISI.java:28-123`` driving ``PhraseScorer.java:45-68``,
    vectorized across candidates instead of iterated per doc.

    ``slots``: [[(tb, bm), ...], ...] — one member list per phrase
    slot (a plain phrase is one single-member slot per term).  A slot's
    contribution at a candidate is the SUM of its members'
    containing-block maxima (slot union tf <= sum of member tfs;
    members whose doc range does not cover the candidate contribute 0).
    ``combine``: "min" for exact phrases (phraseFreq <= every slot
    count), "sum" for sloppy (sloppyFreq <= total tf, concavity).  A
    candidate missing from ANY slot's doc ranges cannot match at all ->
    bound 0.  Bounds are padded one relative epsilon (_pad_bound) so
    float32 rounding keeps them true upper bounds."""
    out = None
    alive = np.ones(cand.size, dtype=bool)
    for members in slots:
        ssum = np.zeros(cand.size, dtype=np.float64)
        for tb, bm in members:
            if tb.nblocks == 0:
                continue
            bidx = np.searchsorted(tb.last_doc, cand, side="left")
            inb = bidx < tb.nblocks
            safe = np.minimum(bidx, tb.nblocks - 1)
            inb &= tb.first_doc[safe] <= cand
            ssum += np.where(inb, bm[safe], 0.0)
        alive &= ssum > 0.0
        if out is None:
            out = ssum
        elif combine == "min":
            out = np.minimum(out, ssum)
        else:
            out = out + ssum
    out = np.where(alive, out, 0.0)
    return out + np.abs(out) * 1e-5


class _SloppyLeaf:
    """Sloppy phrase (slop>0) as a window-scorable leaf.

    The reference does NOT prune sloppy phrases — SloppyPhraseMatcher
    feeds DUMMY impacts (``SloppyPhraseMatcher.java:119-127``), so its
    ImpactsDISI never skips.  This engine goes further with a bound
    that IS valid for sloppy matching: sloppyFreq = sum over greedy
    matches of 1/(1+matchLength) <= #matches <= sum of member tfs, and
    BM25 is concave in freq with score(0)=0, so

        score(sloppyFreq, n) <= sum_i score(tf_i, n) <= sum_i bmax_i

    (per-member max phrase-scored impact; NOT the exact-phrase min —
    sloppyFreq can exceed the min member tf when a rare term's single
    occurrence pairs with several occurrences of a frequent one).
    The bound is padded one relative epsilon for f32 rounding
    (_pad_bound), keeping pruned == exhaustive bit-identical."""

    __slots__ = ("tbs", "psc", "q", "bms", "doc_freq")

    def __init__(self, tbs, psc, q: ast.PhraseQuery):
        self.tbs = tbs
        self.psc = psc
        self.q = q
        self.bms = [tb.block_max_scores(psc) for tb in tbs]
        self.doc_freq = min(tb.doc_freq for tb in tbs)

    def overlaps(self, lo, hi) -> bool:
        for tb in self.tbs:
            b0, b1 = tb.overlapping(lo, hi)
            if b0 >= b1:
                return False
        return True

    def window_bound(self, lo, hi) -> float:
        bound = 0.0
        for tb, bm in zip(self.tbs, self.bms):
            b0, b1 = tb.overlapping(lo, hi)
            if b0 >= b1:
                return 0.0
            bound += float(bm[b0:b1].max())
        return _pad_bound(bound)

    def windows(self, nwin: int) -> np.ndarray:
        lead = min(self.tbs, key=lambda tb: tb.doc_freq)
        return _block_windows(lead, nwin)

    def _keep(self, theta):
        """Impact-pruning candidate filter (see _PhraseLeaf._keep);
        sloppy bound = per-candidate SUM of member containing-block
        maxima (the same concavity argument as window_bound, one block
        instead of the whole window)."""
        if theta == -np.inf:
            return None
        slots = [[(tb, bm)] for tb, bm in zip(self.tbs, self.bms)]
        return lambda c: c[_cand_block_bounds(slots, c, "sum") > theta]

    def window_postings(self, seg, lo, hi, theta=-np.inf):
        # same leapfrog as _PhraseLeaf: decode the rarest member only,
        # probe the rest at candidates
        cand = _lead_window_docs(self.tbs, lo, hi, keep=self._keep(theta))
        if cand.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs, freqs = _verify_sloppy(seg, self.q, self.tbs, cand)
        if docs.size == 0:
            return docs, np.empty(0, np.float64)
        return docs, self.psc.score(freqs, self.tbs[0].norms[docs]).astype(np.float64)

    def window_docs(self, seg, lo, hi, theta=-np.inf) -> np.ndarray:
        d, _ = self.window_postings(seg, lo, hi, theta)
        return d

    def probe(self, seg, docs):
        cand = docs
        for tb in self.tbs:
            if cand.size == 0:
                break
            p, _ = _probe_blocks(tb, cand)
            cand = cand[p]
        pres = np.zeros(docs.size, dtype=bool)
        sc = np.zeros(docs.size, dtype=np.float64)
        if cand.size:
            dd, ff = _verify_sloppy(seg, self.q, self.tbs, cand)
            if dd.size:
                idx = np.searchsorted(docs, dd)
                pres[idx] = True
                sc[idx] = self.psc.score(
                    ff, self.tbs[0].norms[dd]
                ).astype(np.float64)
        return pres, sc


class _MultiPhraseLeaf:
    """MultiPhraseQuery (exact or sloppy) as a window-scorable leaf.

    Doc approximation: conjunction of per-slot member-doc UNIONS
    (``MultiPhraseQuery.java`` via UnionPostingsEnum).  Window bound by
    the same concavity argument as _SloppyLeaf, applied per slot: a
    slot's union position count <= sum of its members' tfs, so

      exact (slop=0):  freq <= min_s slotCount(s)
                       -> bound = min_s sum_{m in s} bmax_m
      sloppy (slop>0): freq <= sum of all member tfs
                       -> bound = sum over all members' bmax

    both padded one relative epsilon (_pad_bound) for f32 rounding;
    pruned == exhaustive bit-identically."""

    __slots__ = ("slot_tbs", "psc", "q", "slot_bms", "doc_freq",
                 "slot_terms")

    def __init__(self, slot_tbs, psc, q: ast.MultiPhraseQuery,
                 slot_terms=None):
        self.slot_tbs = slot_tbs
        self.psc = psc
        self.q = q
        self.slot_terms = slot_terms
        self.slot_bms = [
            [tb.block_max_scores(psc) for tb in tbs] for tbs in slot_tbs
        ]
        self.doc_freq = min(
            sum(tb.doc_freq for tb in tbs) for tbs in slot_tbs
        )

    def _slot_overlap(self, tbs, lo, hi):
        """Member (tb, b0, b1) spans overlapping [lo, hi] for one slot."""
        spans = []
        for tb in tbs:
            b0, b1 = tb.overlapping(lo, hi)
            if b0 < b1:
                spans.append((tb, b0, b1))
        return spans

    def overlaps(self, lo, hi) -> bool:
        return all(self._slot_overlap(tbs, lo, hi) for tbs in self.slot_tbs)

    def window_bound(self, lo, hi) -> float:
        slot_sums = []
        for tbs, bms in zip(self.slot_tbs, self.slot_bms):
            ssum = 0.0
            any_member = False
            for tb, bm in zip(tbs, bms):
                b0, b1 = tb.overlapping(lo, hi)
                if b0 < b1:
                    any_member = True
                    ssum += float(bm[b0:b1].max())
            if not any_member:
                return 0.0
            slot_sums.append(ssum)
        if self.q.slop > 0:
            return _pad_bound(float(sum(slot_sums)))
        return _pad_bound(min(slot_sums))

    def windows(self, nwin: int) -> np.ndarray:
        lead = min(self.slot_tbs, key=lambda tbs: sum(tb.doc_freq for tb in tbs))
        parts = [_block_windows(tb, nwin) for tb in lead]
        return np.unique(np.concatenate(parts))

    def _window_cand(self, lo, hi, theta=-np.inf):
        """Candidate docs in [lo, hi]: intersection over slots of the
        union of member docs — leapfrog-shaped: only the LEAD slot
        (smallest summed doc_freq) decodes its overlapping blocks;
        every other slot is PROBED (union of member probes) at the
        surviving candidates.  With an active theta, lead candidates
        whose per-slot containing-block bound cannot beat it are
        dropped BEFORE any follower probe or position decode
        (_cand_block_bounds)."""
        lead = min(self.slot_tbs, key=lambda tbs: sum(tb.doc_freq for tb in tbs))
        spans = self._slot_overlap(lead, lo, hi)
        if not spans:
            return np.empty(0, np.int64)
        parts = []
        for tb, b0, b1 in spans:
            d = np.concatenate([tb.decode(i)[0] for i in range(b0, b1)])
            i0 = int(np.searchsorted(d, lo))
            i1 = int(np.searchsorted(d, hi, side="right"))
            if i0 < i1:
                parts.append(d[i0:i1])
        if not parts:
            return np.empty(0, np.int64)
        cand = parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts))
        if theta > -np.inf and cand.size:
            slots = [
                list(zip(tbs, bms))
                for tbs, bms in zip(self.slot_tbs, self.slot_bms)
            ]
            mode = "sum" if self.q.slop > 0 else "min"
            cand = cand[_cand_block_bounds(slots, cand, mode) > theta]
        for tbs in self.slot_tbs:
            if tbs is lead:
                continue
            if cand.size == 0:
                break
            pres_any = np.zeros(cand.size, dtype=bool)
            for tb in tbs:
                p, _ = _probe_blocks(tb, cand)
                pres_any |= p
            cand = cand[pres_any]
        return cand

    def _verify(self, cand):
        rels = self.q.positions
        if self.q.slop > 0:
            return _verify_multi_sloppy(
                self.slot_tbs, rels, self.q.slop, cand, self.slot_terms
            )
        return _verify_multi_exact(self.slot_tbs, rels, cand)

    def window_postings(self, seg, lo, hi, theta=-np.inf):
        cand = self._window_cand(lo, hi, theta)
        if cand.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs, freqs = self._verify(cand)
        if docs.size == 0:
            return docs, np.empty(0, np.float64)
        norms = self.slot_tbs[0][0].norms
        return docs, self.psc.score(freqs, norms[docs]).astype(np.float64)

    def window_docs(self, seg, lo, hi, theta=-np.inf) -> np.ndarray:
        d, _ = self.window_postings(seg, lo, hi, theta)
        return d

    def probe(self, seg, docs):
        cand = docs
        for tbs in self.slot_tbs:
            if cand.size == 0:
                break
            pres_any = np.zeros(cand.size, dtype=bool)
            for tb in tbs:
                p, _ = _probe_blocks(tb, cand)
                pres_any |= p
            cand = cand[pres_any]
        pres = np.zeros(docs.size, dtype=bool)
        sc = np.zeros(docs.size, dtype=np.float64)
        if cand.size:
            dd, ff = self._verify(cand)
            if dd.size:
                idx = np.searchsorted(docs, dd)
                pres[idx] = True
                norms = self.slot_tbs[0][0].norms
                sc[idx] = self.psc.score(ff, norms[dd]).astype(np.float64)
        return pres, sc


class _ConstLeaf:
    """ConstantScoreQuery leaf: membership from the inner leaf, score a
    constant (float32(boost) under f32 semantics)."""

    __slots__ = ("inner", "const", "doc_freq")

    def __init__(self, inner, boost: float, dtype: str):
        self.inner = inner
        self.const = float(np.float32(boost)) if dtype == "f32" else float(boost)
        self.doc_freq = inner.doc_freq

    def overlaps(self, lo, hi) -> bool:
        return self.inner.overlaps(lo, hi)

    def window_bound(self, lo, hi) -> float:
        return self.const if self.inner.overlaps(lo, hi) else 0.0

    def windows(self, nwin: int) -> np.ndarray:
        return self.inner.windows(nwin)

    def window_postings(self, seg, lo, hi, theta=-np.inf):
        d = self.inner.window_docs(seg, lo, hi)
        return d, np.full(d.size, self.const, np.float64)

    def window_docs(self, seg, lo, hi, theta=-np.inf) -> np.ndarray:
        return self.inner.window_docs(seg, lo, hi)

    def probe(self, seg, docs):
        pres, _ = self.inner.probe(seg, docs)
        return pres, np.where(pres, self.const, 0.0)


class _DocsLeaf:
    """A precomputed sorted live-doc set as a constant-score leaf — the
    MultiTermQuery CONSTANT_SCORE_REWRITE inside the pruned boolean
    kernels (``MultiTermQueryConstantScoreWrapper``: the union of the
    matching terms' postings behaves like one bit-set scorer whose
    window bound is the constant)."""

    __slots__ = ("docs", "const", "doc_freq")

    def __init__(self, docs: np.ndarray, boost: float, dtype: str):
        self.docs = docs  # sorted unique local doc ids, live only
        self.const = float(np.float32(boost)) if dtype == "f32" else float(boost)
        self.doc_freq = int(docs.size)

    def _slice(self, lo, hi):
        i0 = int(np.searchsorted(self.docs, lo))
        i1 = int(np.searchsorted(self.docs, hi, side="right"))
        return i0, i1

    def overlaps(self, lo, hi) -> bool:
        i0, i1 = self._slice(lo, hi)
        return i0 < i1

    def window_bound(self, lo, hi) -> float:
        return self.const if self.overlaps(lo, hi) else 0.0

    def windows(self, nwin: int) -> np.ndarray:
        return np.unique(self.docs // WINDOW)

    def window_postings(self, seg, lo, hi, theta=-np.inf):
        i0, i1 = self._slice(lo, hi)
        d = self.docs[i0:i1]
        return d, np.full(d.size, self.const, np.float64)

    def window_docs(self, seg, lo, hi, theta=-np.inf) -> np.ndarray:
        i0, i1 = self._slice(lo, hi)
        return self.docs[i0:i1]

    def probe(self, seg, docs):
        idx = np.searchsorted(self.docs, docs)
        idx_c = np.minimum(idx, max(self.docs.size - 1, 0))
        pres = (
            (idx < self.docs.size) & (self.docs[idx_c] == docs)
            if self.docs.size
            else np.zeros(docs.size, dtype=bool)
        )
        return pres, np.where(pres, self.const, 0.0)


class _IntervalLeaf:
    """IntervalQuery as a LAZY window leaf (replaces the round-4 eager
    precomputed-scores leaf): doc-level candidates and per-candidate
    score UPPER BOUNDS are computed at build from impact metadata only;
    ``pos_bin`` decode and the minimal-interval enumeration run per
    WINDOW, and — when the leaf is the sole scoring clause — only for
    candidates whose containing-block bound beats theta
    (``ImpactsDISI.java:28-123`` driving the conjunction approximation,
    as behind ``PhraseScorer.java:45-68``).

    Bound: per-doc freq sums 1/max(width - minExtent + 1, 1) <= 1 over
    the enumerated minimal intervals; minimal intervals have strictly
    increasing starts and every start is an occurrence of some source
    term, so #intervals <= sum of source-term tfs <= sum of the
    containing blocks' max competitive-impact tfs.  Both score curves
    (saturation, sigmoid) are monotone increasing in freq with
    score(0)=0, so score <= curve(sum of block-max tfs) — padded one
    relative epsilon for the f32 contract (_pad_bound)."""

    __slots__ = (
        "q", "src", "tbs", "docs_of", "cand", "ub", "dtype", "boost",
        "doc_freq", "_done", "_scores",
    )

    def __init__(self, seg, q: "ast.IntervalQuery", dtype, boost):
        from lucene_spark.search import intervals as iv

        self.q, self.dtype, self.boost = q, dtype, float(boost)
        self.src, self.tbs, self.docs_of, self.cand = _interval_prepare(
            seg, q
        )
        cand = self.cand
        fub = np.zeros(cand.size, dtype=np.float64)
        for tb in self.tbs.values():
            if tb.nblocks == 0:
                continue
            mtf = np.fromiter(
                (max(x) if len(x) else 0 for x in tb.impact_tfs),
                dtype=np.float64,
                count=tb.nblocks,
            )
            bidx = np.searchsorted(tb.last_doc, cand, side="left")
            inb = bidx < tb.nblocks
            safe = np.minimum(bidx, tb.nblocks - 1)
            inb &= tb.first_doc[safe] <= cand
            fub += np.where(inb, mtf[safe], 0.0)
        b, p = self.boost, float(q.pivot)
        if q.exp is None:
            ub = b * (1.0 - p / (p + fub))
        else:
            e = float(q.exp)
            ppa = p ** e
            with np.errstate(divide="ignore"):
                ub = b * (1.0 - ppa / (fub ** e + ppa))
        ub = np.where(fub > 0.0, ub, 0.0)
        self.ub = ub + np.abs(ub) * 1e-5
        self.doc_freq = int(cand.size)
        # per-doc memo (sorted docs, score or NaN=non-match): the
        # driver probes a leaf at the docs its own window_docs just
        # verified — enumeration runs once per doc, not twice
        self._done = np.empty(0, np.int64)
        self._scores = np.empty(0, np.float64)

    def _slice(self, lo, hi):
        i0 = int(np.searchsorted(self.cand, lo))
        i1 = int(np.searchsorted(self.cand, hi, side="right"))
        return i0, i1

    def overlaps(self, lo, hi) -> bool:
        i0, i1 = self._slice(lo, hi)
        return i0 < i1

    def window_bound(self, lo, hi) -> float:
        i0, i1 = self._slice(lo, hi)
        return float(self.ub[i0:i1].max()) if i0 < i1 else 0.0

    def windows(self, nwin: int) -> np.ndarray:
        return np.unique(self.cand // WINDOW)

    def _eval(self, sub):
        missing = np.setdiff1d(sub, self._done, assume_unique=True)
        if missing.size:
            dd, ss = _interval_eval(
                self.src, self.tbs, self.docs_of, missing, self.q,
                self.dtype, self.boost,
            )
            full = np.full(missing.size, np.nan, np.float64)
            if dd.size:
                full[np.searchsorted(missing, dd)] = ss
            self._done = np.concatenate([self._done, missing])
            self._scores = np.concatenate([self._scores, full])
            order = np.argsort(self._done, kind="stable")
            self._done = self._done[order]
            self._scores = self._scores[order]
        idx = np.searchsorted(self._done, sub)
        sc = self._scores[idx]
        hit = ~np.isnan(sc)
        return sub[hit], sc[hit]

    def window_postings(self, seg, lo, hi, theta=-np.inf):
        i0, i1 = self._slice(lo, hi)
        sub = self.cand[i0:i1]
        if theta > -np.inf and sub.size:
            sub = sub[self.ub[i0:i1] > theta]
        if sub.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return self._eval(sub)

    def window_docs(self, seg, lo, hi, theta=-np.inf) -> np.ndarray:
        d, _ = self.window_postings(seg, lo, hi, theta)
        return d

    def probe(self, seg, docs):
        pres = np.zeros(docs.size, dtype=bool)
        sc = np.zeros(docs.size, np.float64)
        sub = np.intersect1d(docs, self.cand, assume_unique=True)
        if sub.size:
            dd, ss = self._eval(sub)
            if dd.size:
                idx = np.searchsorted(docs, dd)
                pres[idx] = True
                sc[idx] = ss
        return pres, sc


class _BoolLeaf:
    """A NESTED BooleanQuery as a window-scorable leaf — the reference
    nests WANDScorer/BooleanScorer inside boolean trees
    (``search/WANDScorer.java:30-55``, ``BooleanWeight.java``
    scorerSupplier recursion); this adapter gives inner booleans a true
    window upper bound (sum of must bounds + sum of overlapping should
    bounds) so the OUTER window scan can skip windows the nested clause
    cannot win.

    Float contract: the nested clause's per-doc sum is cast to float32
    under 'f32' dtype before the parent accumulates it — exactly the
    nested-scorer cast of the exhaustive kernel (``_clause_score32``;
    each nested Scorer.score() returns float in the reference) — so
    pruned == exhaustive bit-identically. The window BOUND is padded one
    float32 ulp upward under 'f32' (the cast may round a sum up past the
    float64 bound); bounds stay true upper bounds."""

    __slots__ = ("must", "filters", "should", "excl", "need", "dtype",
                 "doc_freq")

    def __init__(self, must, filters, should, excl, need, dtype):
        self.must = must
        self.filters = filters
        self.should = should
        self.excl = excl
        self.need = need
        self.dtype = dtype
        req = must + filters
        if req:
            self.doc_freq = min(l.doc_freq for l in req)
        else:
            self.doc_freq = sum(l.doc_freq for l in should)

    def overlaps(self, lo, hi) -> bool:
        for l in self.must:
            if not l.overlaps(lo, hi):
                return False
        for l in self.filters:
            if not l.overlaps(lo, hi):
                return False
        n_opt = sum(1 for l in self.should if l.overlaps(lo, hi))
        if self.need > 0 and n_opt < self.need:
            return False
        if not (self.must or self.filters) and n_opt == 0:
            return False
        return True

    def window_bound(self, lo, hi) -> float:
        if not self.overlaps(lo, hi):
            return 0.0
        bound = 0.0
        for l in self.must:
            bound += l.window_bound(lo, hi)
        for l in self.should:
            if l.overlaps(lo, hi):
                bound += l.window_bound(lo, hi)
        if self.dtype == "f32":
            bound = float(np.nextafter(np.float32(bound), np.float32(np.inf)))
        return bound

    def windows(self, nwin: int) -> np.ndarray:
        req = self.must + self.filters
        if req:
            lead = min(req, key=lambda l: l.doc_freq)
            return lead.windows(nwin)
        parts = [l.windows(nwin) for l in self.should]
        return (
            np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        )

    def window_postings(self, seg, lo, hi, theta=-np.inf):
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        acc = np.zeros(WINDOW, dtype=np.float64)
        reqc = np.zeros(WINDOW, dtype=np.int32)
        optc = np.zeros(WINDOW, dtype=np.int32)
        # accumulation order must-then-should mirrors the exhaustive
        # kernel's (scored + should) loop — float64 sums bit-match
        for l in self.must:
            d, s = l.window_postings(seg, lo, hi)
            if d.size == 0:
                return empty
            dw = d - lo
            acc[dw] += s
            reqc[dw] += 1
        for l in self.filters:
            d = l.window_docs(seg, lo, hi)
            if d.size == 0:
                return empty
            reqc[d - lo] += 1
        for l in self.should:
            d, s = l.window_postings(seg, lo, hi)
            if d.size == 0:
                continue
            dw = d - lo
            acc[dw] += s
            optc[dw] += 1
        nreq = len(self.must) + len(self.filters)
        if nreq:
            ok = reqc == nreq
        else:
            ok = optc >= 1
        if self.need > 0:
            ok &= optc >= self.need
        for l in self.excl:
            d = l.window_docs(seg, lo, hi)
            if d.size:
                ok[d - lo] = False
        idx = np.flatnonzero(ok)
        if idx.size == 0:
            return empty
        s = acc[idx]
        if self.dtype == "f32":
            s = s.astype(np.float32).astype(np.float64)
        return idx + lo, s

    def window_docs(self, seg, lo, hi, theta=-np.inf) -> np.ndarray:
        d, _ = self.window_postings(seg, lo, hi)
        return d

    def probe(self, seg, docs):
        """Evaluate the nested clause at the candidate docs only (the
        same clause-order float64 accumulation as window_postings)."""
        acc = np.zeros(docs.size, dtype=np.float64)
        reqok = np.ones(docs.size, dtype=bool)
        for l in self.must:
            p, s = l.probe(seg, docs)
            acc += np.where(p, s, 0.0)
            reqok &= p
        for l in self.filters:
            p, _ = l.probe(seg, docs)
            reqok &= p
        optc = np.zeros(docs.size, dtype=np.int32)
        for l in self.should:
            p, s = l.probe(seg, docs)
            acc += np.where(p, s, 0.0)
            optc += p
        if self.must or self.filters:
            ok = reqok
        else:
            ok = optc >= 1
        if self.need > 0:
            ok &= optc >= self.need
        for l in self.excl:
            p, _ = l.probe(seg, docs)
            ok &= ~p
        sc = np.where(ok, acc, 0.0)
        if self.dtype == "f32":
            sc = sc.astype(np.float32).astype(np.float64)
        return ok, sc


class _EmptyLeaf:
    """A leaf whose term(s) are absent from this segment."""

    doc_freq = 0

    def overlaps(self, lo, hi):
        return False

    def window_bound(self, lo, hi):
        return 0.0

    def windows(self, nwin):
        return np.empty(0, np.int64)

    def window_postings(self, seg, lo, hi, theta=-np.inf):
        return np.empty(0, np.int64), np.empty(0, np.float64)

    def window_docs(self, seg, lo, hi, theta=-np.inf):
        return np.empty(0, np.int64)

    def probe(self, seg, docs):
        return np.zeros(docs.size, dtype=bool), np.zeros(docs.size, np.float64)


_EMPTY_LEAF = _EmptyLeaf()


def _block_windows(tb: TermBlocks, nwin: int) -> np.ndarray:
    """Sorted unique window indices whose doc range a block of ``tb``
    intersects — the level-0-skip-driven window enumeration (only
    covered windows are visited, never the whole doc space)."""
    w0 = tb.first_doc // WINDOW
    w1 = np.minimum(tb.last_doc // WINDOW, nwin - 1)
    parts = [np.arange(int(a), int(b) + 1) for a, b in zip(w0, w1)]
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts))


def _make_leaf(seg: SegmentView, q: ast.Query, scorers: dict, dtype: str, boost: float = 1.0):
    """Leaf adapter for ``q``, or None when q is not leaf-adaptable
    (termless leaves — those shapes fall back to the exhaustive
    kernel). Nested BooleanQuery trees recurse into _BoolLeaf
    (WANDScorer-in-WANDScorer); sloppy phrases and multi-phrases —
    including multi-term-repeat (hasMultiTermRpts) shapes, whose
    slot-sum concavity bound is equally valid with repeats — get
    concavity-bound leaves (_SloppyLeaf/_MultiPhraseLeaf); interval
    queries get the lazy impact-pruned _IntervalLeaf."""
    if isinstance(q, ast.BoostQuery):
        return _make_leaf(seg, q.query, scorers, dtype, boost * q.boost)
    if isinstance(q, ast.BooleanQuery):
        must, filters, should, excl = [], [], [], []
        for c in q.must:
            leaf = _make_leaf(seg, c, scorers, dtype, boost)
            if leaf is None:
                return None
            if leaf is _EMPTY_LEAF:
                return _EMPTY_LEAF
            must.append(leaf)
        for c in q.filter:
            leaf = _make_leaf(seg, c, scorers, dtype, 1.0)
            if leaf is None:
                return None
            if leaf is _EMPTY_LEAF:
                return _EMPTY_LEAF
            filters.append(leaf)
        for c in q.should:
            leaf = _make_leaf(seg, c, scorers, dtype, boost)
            if leaf is None:
                return None
            if leaf is not _EMPTY_LEAF:
                should.append(leaf)
        for c in q.must_not:
            leaf = _make_leaf(seg, c, scorers, dtype, 1.0)
            if leaf is None:
                return None
            if leaf is not _EMPTY_LEAF:
                excl.append(leaf)
        required = must + filters
        need = q.min_should_match if required else max(q.min_should_match, 1)
        if need > len(should):
            return _EMPTY_LEAF  # msm unreachable in this segment
        if not required and not should:
            return _EMPTY_LEAF  # pure-negative / empty nested clause
        return _BoolLeaf(must, filters, should, excl, need, dtype)
    if isinstance(q, ast.TermQuery):
        tb = seg.term_blocks(q.term)
        if tb is None:
            return _EMPTY_LEAF
        key = ("t", q.term, boost) if boost != 1.0 else ("t", q.term)
        sc = scorers.get(key)
        return _TermLeaf(tb, sc) if sc is not None else None
    if isinstance(q, ast.PhraseQuery):
        tbs = [seg.term_blocks(t) for t in q.terms]
        if any(tb is None for tb in tbs):
            return _EMPTY_LEAF
        key = ("p", q.terms, boost) if boost != 1.0 else ("p", q.terms)
        sc = scorers.get(key)
        if sc is None:
            return None
        return _PhraseLeaf(tbs, sc, q) if q.slop == 0 else _SloppyLeaf(tbs, sc, q)
    if isinstance(q, ast.MultiPhraseQuery):
        slot_tbs = []
        slot_present = []
        for slot in q.slots:
            pairs = [
                (t, tb)
                for t, tb in ((t, seg.term_blocks(t)) for t in slot)
                if tb is not None
            ]
            if not pairs:
                return _EMPTY_LEAF
            slot_present.append(tuple(t for t, _ in pairs))
            slot_tbs.append([tb for _, tb in pairs])
        sc = scorers.get(("mp", q.slots, boost))
        if sc is None:
            return None
        return _MultiPhraseLeaf(slot_tbs, sc, q, slot_present)
    if isinstance(q, ast.ConstantScoreQuery):
        inner = _make_leaf(seg, q.query, scorers, dtype, 1.0)
        if inner is None:
            return None
        if inner is _EMPTY_LEAF:
            return _EMPTY_LEAF
        return _ConstLeaf(inner, boost * q.boost, dtype)
    if isinstance(q, ast.MultiTermQuery):
        # CONSTANT_SCORE_REWRITE as a window leaf: union the matching
        # terms' docs once at leaf build (same decode the exhaustive
        # branch pays), then serve windows/probes off the sorted array
        docs = multi_term_union_docs(seg, q)
        if docs.size == 0:
            return _EMPTY_LEAF
        return _DocsLeaf(docs, boost, dtype)
    if isinstance(q, ast.IntervalQuery):
        leaf = _IntervalLeaf(seg, q, dtype, boost)
        if leaf.cand.size == 0:
            return _EMPTY_LEAF
        return leaf
    return None


def _wand_topk(seg, q: ast.BooleanQuery, scorers, k, threshold, dtype, boost=1.0,
               seed=-np.inf):
    """General pruned boolean top-k (WANDScorer/MaxScoreBulkScorer
    analog). Returns a _TopK, or None when some clause is not
    leaf-adaptable (caller falls back to the exhaustive kernel)."""
    heap = _TopK(k, threshold, seed)
    must, should, filters, excl = [], [], [], []
    for c in q.must:
        leaf = _make_leaf(seg, c, scorers, dtype, boost)
        if leaf is None:
            return None
        if leaf is _EMPTY_LEAF:
            return heap  # required term absent -> segment matches nothing
        must.append(leaf)
    for c in q.filter:
        leaf = _make_leaf(seg, c, scorers, dtype, 1.0)
        if leaf is None:
            return None
        if leaf is _EMPTY_LEAF:
            return heap
        filters.append(leaf)
    for c in q.should:
        leaf = _make_leaf(seg, c, scorers, dtype, boost)
        if leaf is None:
            return None
        if leaf is not _EMPTY_LEAF:
            should.append(leaf)
    for c in q.must_not:
        leaf = _make_leaf(seg, c, scorers, dtype, 1.0)
        if leaf is None:
            return None
        if leaf is not _EMPTY_LEAF:
            excl.append(leaf)
    msm = q.min_should_match
    required = must + filters
    need = msm if required else max(msm, 1)
    if need > len(should):
        return heap
    nwin = (seg.max_doc + WINDOW - 1) // WINDOW

    # candidate windows: intersect nothing — the rarest REQUIRED leaf's
    # covered windows (every match must lie there), else the union of
    # optional leaves' covered windows
    if required:
        lead = min(required, key=lambda l: l.doc_freq)
        wins = lead.windows(nwin)
    else:
        parts = [l.windows(nwin) for l in should]
        wins = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)

    nreq = len(required)
    for w in wins:
        lo, hi = int(w) * WINDOW, int(w) * WINDOW + WINDOW - 1
        ok_req = True
        for leaf in required:
            if not leaf.overlaps(lo, hi):
                ok_req = False
                break
        if not ok_req:
            continue
        opt = [l for l in should if l.overlaps(lo, hi)]
        if len(opt) < need:
            continue
        theta = heap.theta
        opt_bounds = [leaf.window_bound(lo, hi) for leaf in opt]
        bound = float(sum(opt_bounds))
        for leaf in must:
            bound += leaf.window_bound(lo, hi)
        if bound <= theta:
            continue
        # float64 accumulation stays in clause order (must then should,
        # query order) so pruned == exhaustive bit-exactly; probed
        # clauses contribute +0.0 where absent (exact identity)
        if required:
            # conjunction-driven window: decode ONLY the rarest
            # required leaf; every other clause (required or optional)
            # is PROBED at the surviving candidates — the follower
            # advance of BlockMaxConjunctionBulkScorer.java:30-39 /
            # ConjunctionDISI leapfrog, never a full decode
            lead = min(required, key=lambda l: l.doc_freq)
            # when the lead is the SOLE scoring clause (one must, no
            # shoulds — filters/excls only restrict membership), its
            # score IS the doc score, so candidates whose
            # containing-block bound cannot beat theta are dropped
            # inside the leaf before any position decode
            # (ImpactsDISI.java:28-123 behind PhraseScorer.java:45-68)
            sole = len(must) == 1 and not opt and lead is must[0]
            cdocs = lead.window_docs(seg, lo, hi, theta if sole else -np.inf)
            for leaf in required:
                if leaf is lead or cdocs.size == 0:
                    continue
                p, _ = leaf.probe(seg, cdocs)
                cdocs = cdocs[p]
            if cdocs.size == 0:
                continue
            # scoring pass in QUERY clause order (must then should) —
            # probes hit the decode cache, so this costs no extra IO
            cacc = np.zeros(cdocs.size, dtype=np.float64)
            for leaf in must:
                p, s = leaf.probe(seg, cdocs)
                cacc = cacc + np.where(p, s, 0.0)
            optc = np.zeros(cdocs.size, dtype=np.int32)
            for leaf in opt:
                p, s = leaf.probe(seg, cdocs)
                cacc = cacc + np.where(p, s, 0.0)
                optc += p
            ok = np.ones(cdocs.size, dtype=bool)
            if need > 0:
                ok &= optc >= need
        else:
            # pure disjunction: MAXSCORE essential/non-essential split
            # (``search/MaxScoreBulkScorer.java:28-51``): the largest
            # ascending-bound prefix whose bounds sum <= theta cannot
            # alone produce a competitive doc — those leaves are only
            # PROBED at candidates found by the essential leaves
            order = np.argsort(np.asarray(opt_bounds), kind="stable")
            non_ess: set = set()
            cum = 0.0
            for i in order:
                if cum + opt_bounds[i] <= theta:
                    cum += opt_bounds[i]
                    non_ess.add(int(i))
                else:
                    break
            ess_posts: dict = {}
            # a lone optional clause is the sole scorer — its block
            # bounds may prune against theta directly
            th1 = theta if len(opt) == 1 and need <= 1 else -np.inf
            for i, leaf in enumerate(opt):
                if i not in non_ess:
                    ess_posts[i] = leaf.window_postings(seg, lo, hi, th1)
            parts = [d for d, _ in ess_posts.values() if d.size]
            if not parts:
                continue
            cdocs = np.unique(np.concatenate(parts))
            cacc = np.zeros(cdocs.size, dtype=np.float64)
            optc = np.zeros(cdocs.size, dtype=np.int32)
            for i, leaf in enumerate(opt):
                if i in ess_posts:
                    d, s = ess_posts[i]
                    if d.size == 0:
                        continue
                    idx = np.searchsorted(cdocs, d)
                    cacc[idx] += s
                    optc[idx] += 1
                else:
                    p, s = leaf.probe(seg, cdocs)
                    cacc = cacc + np.where(p, s, 0.0)
                    optc += p
            ok = optc >= max(need, 1)
        for leaf in excl:
            p, _ = leaf.probe(seg, cdocs)
            ok &= ~p
        cdocs, cacc = cdocs[ok], cacc[ok]
        if cdocs.size == 0:
            continue
        m = seg.live_mask(cdocs)
        heap.update(cdocs[m], cacc[m])
    return heap


# ------------------------------------------------------------------- driver


def _pure_and_terms(q: ast.BooleanQuery):
    if q.should or q.must_not or q.filter:
        return None
    if all(isinstance(c, ast.TermQuery) for c in q.must):
        return [c.term for c in q.must]
    return None


def search_segment(
    seg: SegmentView,
    q: ast.Query,
    scorers: dict,
    k: int,
    pruned: bool = True,
    dtype: str = "f32",
    total_hits_threshold: int = TOTAL_HITS_THRESHOLD,
    seed_theta: float = -np.inf,
):
    """Top-k of one segment: (local doc ids, scores) sorted by
    (score desc, doc asc). Strategy selection mirrors
    ``BooleanScorerSupplier.java:287-418`` (see module docstring).

    ``seed_theta``: shared minCompetitiveScore floor from other
    segments (must come from ``seed_below`` — rank-safe by
    construction; results are bit-identical with or without it)."""
    q = ast.rewrite(q)
    th, sd = total_hits_threshold, seed_theta
    if pruned:
        if isinstance(q, ast.TermQuery):
            heap = _term_topk(seg, q.term, scorers, k, th, dtype, sd)
            return heap.docs, _final_scores(heap.scores, dtype)
        if isinstance(q, ast.PhraseQuery) and q.slop == 0:
            heap = _phrase_topk(seg, q, scorers, k, th, dtype, sd)
            return heap.docs, _final_scores(heap.scores, dtype)
        if isinstance(q, ast.BooleanQuery):
            # pure term-ORs also route through the WAND window kernel:
            # its MAXSCORE essential/non-essential split probes
            # low-bound terms instead of decoding them
            # (MaxScoreBulkScorer.java:28-51)
            and_terms = _pure_and_terms(q)
            if and_terms is not None:
                heap = _and_topk(seg, and_terms, scorers, k, th, dtype, sd)
                return heap.docs, _final_scores(heap.scores, dtype)
            heap = _wand_topk(seg, q, scorers, k, th, dtype, seed=sd)
            if heap is not None:
                return heap.docs, _final_scores(heap.scores, dtype)
        if isinstance(q, ast.BoostQuery):
            # a boosted BOOLEAN root must enter _wand_topk with the boost
            # folded into the clause scorers (not as a _BoolLeaf under a
            # single-must wrapper: that would apply the nested-clause f32
            # cast the exhaustive kernel does NOT apply at the root)
            inner, b = q.query, q.boost
            while isinstance(inner, ast.BoostQuery):
                b *= inner.boost
                inner = inner.query
            if isinstance(inner, ast.BooleanQuery):
                heap = _wand_topk(
                    seg, inner, scorers, k, th, dtype, boost=b, seed=sd
                )
                if heap is not None:
                    return heap.docs, _final_scores(heap.scores, dtype)
        # boosted / constant-score / plain leaf at the root: run it as a
        # single-must WAND window scan (same pruning as _term_topk but
        # with the boost-folded scorer).  Sloppy phrases and
        # multi-phrases route here too: the reference leaves them
        # unpruned (SloppyPhraseMatcher.java:119-127 dummy impacts) but
        # the _SloppyLeaf/_MultiPhraseLeaf concavity bounds are true
        # upper bounds, so this engine prunes them rank-safely.
        if isinstance(
            q,
            (
                ast.BoostQuery,
                ast.ConstantScoreQuery,
                ast.PhraseQuery,
                ast.MultiPhraseQuery,
                ast.TermQuery,
                ast.IntervalQuery,
            ),
        ):
            leaf = _make_leaf(seg, q, scorers, dtype)
            if leaf is not None:
                heap = _wand_topk(
                    seg,
                    ast.BooleanQuery(must=(q,)),
                    scorers,
                    k,
                    th,
                    dtype,
                    seed=sd,
                )
                if heap is not None:
                    return heap.docs, _final_scores(heap.scores, dtype)
    docs, acc = score_exhaustive(seg, q, scorers, dtype)
    docs, acc = top_k_select(docs, acc, k)
    return docs, _final_scores(acc, dtype)
