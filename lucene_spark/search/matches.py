"""Matches API: structured per-hit match spans (positions + offsets).

The reference surface is ``Weight.matches(context, doc)`` returning a
``Matches`` whose per-field ``MatchesIterator`` walks match occurrences
in (startPosition, endPosition) order (``search/Matches.java``,
``search/MatchesIterator.java``, ``search/DisjunctionMatchesIterator.java``)
— the machinery behind field-level highlighting and hit debugging.

Engine model: the ENGINE decides what matches (the doc set comes from
the same kernels every query runs through); this module explains WHERE,
by walking the query AST over a hit's re-analyzed (or term-vector)
token stream — the same stream model as ``highlight.py``, so positions
are identical to the indexed stream by construction. Deployment shape
mirrors the reference's practical use (matches of top-k hits, k-sized
work): ``Searcher.matches`` = one top-k search + one k-sized stored
fetch + k span extractions.

Per family (reference parity and documented derivations):
- TermQuery: one [p, p] span per occurrence, label = the term
  (``TermMatchesIterator``).
- PhraseQuery slop=0: one [base, base+rels[-1]] span per
  position-verified occurrence (the exact-phrase matcher's window).
- Sloppy phrase / sloppy multi-phrase: VERIFIED match windows from the
  span-emitting twin of the faithful SloppyPhraseMatcher port
  (``sloppy.sloppy_match_spans`` — captureLead bookkeeping,
  ``SloppyPhraseMatcher.java:197-260``), repeats and hasMultiTermRpts
  included; a differential pins float32(sum 1/(1+ml)) over the emitted
  windows to the scoring loops bit-exactly.
- MultiPhraseQuery slop=0: verified windows where every slot matches
  one of its alternatives at its query position.
- MultiTermQuery: every token occurrence matching the leaf's predicate,
  label = the matched token (the per-expanded-term iterators of
  ``DisjunctionMatchesIterator.fromTermsEnum``).
- IntervalQuery: the enumerated minimal intervals themselves — spans,
  gaps and all (``IntervalsSource.matches``); payload-filtered sources
  re-derive payloads from the analyzer chain when it produces them.
- BooleanQuery: union of positive-clause spans in (start, end) order;
  MUST_NOT clauses never contribute (``Boolean2ScorerSupplier`` skips
  prohibited clauses in matches()).
"""

from __future__ import annotations

from lucene_spark.search import ast


def _collect_specs(q, field: str):
    """(terms, phrases, matchers, intervals): the highlighter's walk
    (``highlight._collect_match_specs``) MINUS its sloppy/multi-phrase
    term degradation — those families get verified windows here via
    ``_collect_sloppy_specs`` instead."""
    terms: set = set()
    phrases: list = []
    matchers: list = []
    intervals: list = []

    def walk(node):
        if isinstance(node, ast.TermQuery):
            if ast.field_of(node.term) == field:
                terms.add(ast.bare_term(node.term))
        elif isinstance(node, ast.PhraseQuery):
            if any(ast.field_of(t) != field for t in node.terms):
                return
            if node.slop == 0:
                phrases.append(
                    (
                        tuple(ast.bare_term(t) for t in node.terms),
                        tuple(node.positions),
                    )
                )
            # slop>0 handled by _collect_sloppy_specs
        elif isinstance(node, ast.MultiPhraseQuery):
            pass  # handled by _collect_sloppy_specs (exact and sloppy)
        elif isinstance(node, ast.MultiTermQuery):
            if node.field == field:
                from lucene_spark.search.multiterm import bare_matcher

                matchers.append(bare_matcher(node.mode, node.args))
        elif isinstance(node, ast.IntervalQuery):
            if node.field == field:
                intervals.append(node.source)
        elif isinstance(node, ast.BooleanQuery):
            for c in node.must + node.should + node.filter:
                walk(c)  # must_not intentionally skipped
        elif isinstance(node, (ast.BoostQuery, ast.ConstantScoreQuery)):
            walk(node.query)

    walk(ast.rewrite(q))
    return terms, phrases, matchers, intervals


def _phrase_spans(toks, positions, bare, rels):
    """Position-verified exact-phrase occurrences ->
    [(first_token_idx, last_token_idx, start_pos, end_pos)]."""
    out = []
    if not bare:
        return out
    by_pos: dict = {}
    for i, p in enumerate(positions):
        by_pos.setdefault(p, []).append(i)
    lead_rel = rels[0]
    for i, t in enumerate(toks):
        if t != bare[0]:
            continue
        base = positions[i] - lead_rel
        members = [i]
        ok = True
        for term_j, rel_j in zip(bare[1:], rels[1:]):
            found = None
            for j in by_pos.get(base + rel_j, ()):
                if toks[j] == term_j:
                    found = j
                    break
            if found is None:
                ok = False
                break
            members.append(found)
        if ok:
            out.append(
                (min(members), max(members), base, base + rels[-1])
            )
    return out


def _collect_sloppy_specs(q, field: str):
    """Sloppy phrase / multi-phrase specs the highlighter degrades but
    the Matches API verifies: [(slots, rels, slop, groups, mtr, label)]
    with slots = per-position tuples of alternative bare terms."""
    from lucene_spark.search.sloppy import multi_repeat_groups, repeat_groups

    specs: list = []

    def walk(node):
        if isinstance(node, ast.PhraseQuery) and node.slop > 0:
            if any(ast.field_of(t) != field for t in node.terms):
                return
            bare = tuple(ast.bare_term(t) for t in node.terms)
            specs.append(
                (
                    tuple((t,) for t in bare),
                    tuple(node.positions),
                    node.slop,
                    repeat_groups(bare),
                    False,
                    " ".join(bare),
                )
            )
        elif isinstance(node, ast.MultiPhraseQuery):
            slots = tuple(
                tuple(
                    ast.bare_term(t) for t in alts if ast.field_of(t) == field
                )
                for alts in node.slots
            )
            if any(not s for s in slots):
                return
            label = " ".join(
                s[0] if len(s) == 1 else "(" + "|".join(s) + ")"
                for s in slots
            )
            if node.slop > 0:
                groups, mtr = multi_repeat_groups(slots)
                specs.append(
                    (slots, tuple(node.positions), node.slop, groups, mtr, label)
                )
            else:
                specs.append(
                    (slots, tuple(node.positions), 0, None, False, label)
                )
        elif isinstance(node, ast.BooleanQuery):
            for c in node.must + node.should + node.filter:
                walk(c)
        elif isinstance(node, (ast.BoostQuery, ast.ConstantScoreQuery)):
            walk(node.query)

    walk(ast.rewrite(q))
    return specs


def _multi_phrase_exact_spans(toks, positions, slots, rels):
    """Verified exact multi-phrase occurrences -> [(start_pos,
    end_pos)]: at each candidate base, every slot must have one of its
    alternatives at base + rel."""
    out = []
    at_pos: dict = {}
    for i, p in enumerate(positions):
        at_pos.setdefault(p, set()).add(toks[i])
    lead_rel = rels[0]
    lead_alts = set(slots[0])
    seen_bases = set()
    for i, t in enumerate(toks):
        if t not in lead_alts:
            continue
        base = positions[i] - lead_rel
        if base in seen_bases:
            continue
        seen_bases.add(base)
        if all(
            at_pos.get(base + r, set()) & set(alts)
            for alts, r in zip(slots[1:], rels[1:])
        ):
            out.append((base, base + rels[-1]))
    return sorted(out)


def match_spans_stream(toks, positions, starts, ends, q, field="",
                       analyzer=None, text=None, pay_of=None):
    """All match spans of query ``q`` over one doc's token stream ->
    [(start_pos, end_pos, start_off, end_off, label)] sorted by
    (start_pos, end_pos, label) — the DisjunctionMatchesIterator
    emission order with a deterministic label tie-break.

    ``analyzer``/``text``: only consulted for payload-filtered interval
    sources (payloads are re-derived from the chain, like offsets)."""
    terms, phrases, matchers, intervals = _collect_specs(q, field)
    sloppy_specs = _collect_sloppy_specs(q, field)
    spans: list = []

    # first/last token index at each position (stopword holes mean a
    # position can be empty; phrase/interval offsets span boundary
    # tokens)
    first_at: dict = {}
    last_at: dict = {}
    for i, p in enumerate(positions):
        first_at.setdefault(p, i)
        last_at[p] = i

    def pos_span_offsets(sp, ep):
        """(start_off, end_off) of a position span using boundary
        tokens actually present in the emitted stream."""
        lo = None
        hi = None
        for p in range(sp, ep + 1):
            if p in first_at:
                i = first_at[p]
                if lo is None or starts[i] < lo:
                    lo = starts[i]
            if p in last_at:
                i = last_at[p]
                if hi is None or ends[i] > hi:
                    hi = ends[i]
        return (lo if lo is not None else 0, hi if hi is not None else 0)

    if terms:
        for i, t in enumerate(toks):
            if t in terms:
                p = int(positions[i])
                spans.append((p, p, int(starts[i]), int(ends[i]), t))
    if matchers:
        memo: dict = {}
        for i, t in enumerate(toks):
            m = memo.get(t)
            if m is None:
                m = memo[t] = any(f(t) for f in matchers)
            if m:
                p = int(positions[i])
                spans.append((p, p, int(starts[i]), int(ends[i]), t))
    for bare, rels in phrases:
        label = " ".join(bare)
        for i0, i1, sp, ep in _phrase_spans(toks, positions, bare, rels):
            spans.append(
                (int(sp), int(ep), int(starts[i0]), int(ends[i1]), label)
            )
    if sloppy_specs:
        from lucene_spark.search.sloppy import sloppy_match_spans

        pos_by_term: dict = {}
        for t, p in zip(toks, positions):
            pos_by_term.setdefault(t, []).append(int(p))
        for slots, rels, slop, groups, mtr, label in sloppy_specs:
            if slop == 0:
                # exact multi-phrase: direct window verification
                occ = _multi_phrase_exact_spans(toks, positions, slots, rels)
            else:
                # sloppy: verified windows from the matcher twin; each
                # slot's positions = merged member-term positions
                # (UnionPostingsEnum)
                pls = []
                for alts in slots:
                    merged = sorted(
                        p for t in set(alts) for p in pos_by_term.get(t, ())
                    )
                    if not merged:
                        pls = None
                        break
                    pls.append(merged)
                occ = (
                    [
                        (sp, ep)
                        for sp, ep, _ml in sloppy_match_spans(
                            pls, rels, slop, groups, mtr
                        )
                    ]
                    if pls is not None
                    else []
                )
            for sp, ep in occ:
                lo, hi = pos_span_offsets(int(sp), int(ep))
                spans.append((int(sp), int(ep), lo, hi, label))
    if intervals:
        from lucene_spark.search import intervals as iv
        from lucene_spark.search.kernels import expand_interval_source

        pos_of: dict = {}
        for t, p in zip(toks, positions):
            pos_of.setdefault(t, []).append(int(p))
        for source in intervals:
            src = expand_interval_source(set(toks), source, "")
            pay_terms = iv.payload_terms(src)
            if pay_terms and pay_of is not None:
                # postings offset source: payloads come from the index
                pos_of.update(pay_of)
            elif pay_terms:
                if analyzer is None or text is None or not getattr(
                    analyzer, "has_payloads", False
                ):
                    raise ValueError(
                        "payload-filtered interval matches need the "
                        "payload-producing analyzer and source text"
                    )
                pts, pps, ppay = analyzer.tokenize_one_payloads(text)
                for t in pay_terms:
                    pos_of[("pay", t)] = [
                        b for tt, b in zip(pts, ppay) if tt == t
                    ]
            for s, e, _g in iv.enumerate_intervals(src, pos_of):
                lo, hi = pos_span_offsets(s, e)
                spans.append((int(s), int(e), lo, hi, "intervals"))
    # dedupe (a term under two SHOULD clauses emits once, like the
    # disjunction merge) and order by (startPosition, endPosition)
    return sorted(set(spans))


def match_spans(text: str, q, analyzer, field=""):
    """Re-analysis entry point: tokenize ``text`` with offsets (the
    ANALYSIS offset source) and extract match spans."""
    toks, positions, starts, ends = analyzer.tokenize_offsets(text)
    return match_spans_stream(
        toks, positions, starts, ends, q, field=field,
        analyzer=analyzer, text=text,
    )
