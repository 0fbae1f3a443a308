"""Highlighting: best-passage snippets for query matches.

Model: the reference's UnifiedHighlighter in its RE-ANALYSIS offset
mode (``lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/
UnifiedHighlighter.java`` — OffsetSource.ANALYSIS): offsets are NOT
stored in the index; the stored text of each top-k hit is re-run
through the SAME analyzer, giving (term, position, char span) triples
whose positions are identical to the indexed stream, so query position
arithmetic (exact-phrase verification) maps straight onto character
spans. This is the standard strategy when the index stores neither
offsets nor term vectors — the right trade at web scale, where k is
tiny and docs are short relative to index size.

Match extraction walks the query AST: term-like leaves highlight each
occurrence of their (analyzed) terms; exact phrases (slop=0) highlight
only POSITION-VERIFIED occurrences of the full phrase; sloppy/multi
phrases degrade to their member terms (the UnifiedHighlighter's
default MemoryIndex weight-matching is re-derived, not ported —
degradations are documented here, not hidden); MultiTermQuery leaves
(prefix/wildcard/regexp/fuzzy/range/in_set) match tokens by predicate
— the UnifiedHighlighter automata model
(``uhighlight/MultiTermHighlighting.java``), no index-side rewrite
needed. MUST_NOT clauses never highlight.

Passage selection re-derives ``uhighlight/PassageScorer.java`` in a
simplified deterministic form: candidate passages are consecutive
token windows of ``passage_tokens`` emitted tokens; each is scored by
(unique matched terms, matched occurrences, earliest start) and the
top ``max_passages`` are emitted in document order joined by
``ellipsis``. Scale shape: highlighting is O(k) driver/executor work
over the top-k rows only — the corpus is never touched.
"""

from __future__ import annotations

from lucene_spark.search import ast


def _collect_match_specs(q, field: str):
    """(terms, phrases, matchers, intervals): terms = set of bare
    analyzed terms of ``field`` to highlight; phrases = list of (terms
    tuple, positions tuple) for slop=0 position-verified highlighting;
    matchers = bare token predicates from MultiTermQuery leaves (the
    UnifiedHighlighter automata-over-the-token-stream model,
    ``uhighlight/MultiTermHighlighting.java`` extractAutomata — every
    re-analyzed token matching the leaf's pattern highlights);
    intervals = IntervalQuery sources of ``field`` — their enumerated
    spans gate which source-term occurrences highlight (the matches-API
    model; source-term occurrences INSIDE a matched span highlight, a
    documented superset of the reference's exact sub-matches)."""
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
            bare = tuple(ast.bare_term(t) for t in node.terms)
            if node.slop == 0:
                phrases.append((bare, tuple(node.positions)))
            else:
                terms.update(bare)  # documented degradation
        elif isinstance(node, ast.MultiPhraseQuery):
            for alts in node.slots:
                terms.update(
                    ast.bare_term(t)
                    for t in alts
                    if ast.field_of(t) == field
                )
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


def _match_token_indices(toks, positions, terms: set, phrases: list,
                         matchers: list = ()):
    """Indices into the emitted token stream that should be wrapped.
    Phrase occurrences are verified with the same position arithmetic
    as the search kernels (``PhraseQuery`` positions incl. stopword
    holes). ``matchers``: MultiTermQuery token predicates, evaluated
    once per DISTINCT token (memoized — a long doc repeats few unique
    terms)."""
    hit: set = set()
    if terms:
        for i, t in enumerate(toks):
            if t in terms:
                hit.add(i)
    if matchers:
        memo: dict = {}
        for i, t in enumerate(toks):
            m = memo.get(t)
            if m is None:
                m = memo[t] = any(f(t) for f in matchers)
            if m:
                hit.add(i)
    for bare, rels in phrases:
        if not bare:
            continue
        by_pos = {}
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
                hit.update(members)
    return hit


def _interval_token_indices(toks, positions, source) -> set:
    """Token indices highlighted by one IntervalQuery source: expand
    MultiTerm leaves against THIS doc's distinct tokens (the
    automata-over-the-token-stream model), enumerate the matched
    spans, and wrap every source-term occurrence inside a span (the
    matches-API sub-match model, widened to all in-span occurrences —
    documented derivation)."""
    from lucene_spark.search.kernels import expand_interval_source

    hit: set = set()
    src = expand_interval_source(set(toks), source, "")
    pos_of: dict = {}
    for t, p in zip(toks, positions):
        pos_of.setdefault(t, []).append(p)
    from lucene_spark.search.intervals import enumerate_intervals

    spans = enumerate_intervals(src, pos_of)
    if not spans:
        return hit
    src_terms = src.terms()
    for i, (t, p) in enumerate(zip(toks, positions)):
        if t in src_terms and any(s <= p <= e for s, e, _ in spans):
            hit.add(i)
    return hit


def highlight_text(
    text: str,
    q,
    analyzer,
    field: str = "",
    max_passages: int = 2,
    passage_tokens: int = 24,
    pre: str = "<b>",
    post: str = "</b>",
    ellipsis: str = " ... ",
) -> "str | None":
    """Best-passage snippet for one stored document, or None when no
    query term occurs in ``text`` (the UnifiedHighlighter contract:
    callers fall back to a document prefix). ANALYSIS offset source:
    the token stream comes from re-running the analyzer over the
    stored text."""
    toks, positions, starts, ends = analyzer.tokenize_offsets(text)
    return highlight_stream(
        text, toks, positions, starts, ends, q, field=field,
        max_passages=max_passages, passage_tokens=passage_tokens,
        pre=pre, post=post, ellipsis=ellipsis,
    )


def highlight_stream(
    text: str,
    toks,
    positions,
    starts,
    ends,
    q,
    field: str = "",
    max_passages: int = 2,
    passage_tokens: int = 24,
    pre: str = "<b>",
    post: str = "</b>",
    ellipsis: str = " ... ",
) -> "str | None":
    """``highlight_text`` over an EXPLICIT token stream — the shared
    passage engine behind both offset sources (the reference's
    ``uhighlight/FieldOffsetStrategy.java`` role): ANALYSIS passes the
    re-analyzed stream, TERM_VECTORS passes the stream persisted at
    index time (``index/TermVectorsFormat`` analog — see
    ``IndexConfig.vector_fields``). The two are byte-identical by
    construction because the vector store IS the analysis-time stream."""
    terms, phrases, matchers, intervals = _collect_match_specs(q, field)
    if not terms and not phrases and not matchers and not intervals:
        return None
    if not len(toks):
        return None
    hit = _match_token_indices(toks, positions, terms, phrases, matchers)
    for src in intervals:
        hit |= _interval_token_indices(toks, positions, src)
    if not hit:
        return None
    # fixed token windows -> (unique terms, occurrences, -start) score
    n = len(toks)
    windows = []
    for w0 in range(0, n, passage_tokens):
        w1 = min(w0 + passage_tokens, n)
        members = [i for i in range(w0, w1) if i in hit]
        if not members:
            continue
        uniq = len({toks[i] for i in members})
        windows.append(((-uniq, -len(members), w0), (w0, w1, members)))
    windows.sort(key=lambda x: x[0])
    chosen = sorted(
        (w for _, w in windows[:max_passages]), key=lambda w: w[0]
    )
    parts = []
    for w0, w1, members in chosen:
        p0, p1 = starts[w0], ends[w1 - 1]
        frag = []
        cur = p0
        for i in members:
            frag.append(text[cur : starts[i]])
            frag.append(pre)
            frag.append(text[starts[i] : ends[i]])
            frag.append(post)
            cur = ends[i]
        frag.append(text[cur:p1])
        parts.append("".join(frag))
    snippet = ellipsis.join(parts)
    lead = "" if chosen and chosen[0][0] == 0 else "..."
    tail = "" if chosen and chosen[-1][1] == n else "..."
    return f"{lead}{snippet}{tail}"
