"""Parser for the reference query-set syntax.

Covers the shapes of ``lucene/benchmark/conf/query-terms.txt`` /
``query-phrases.txt`` (see SURVEY.md §3.3): bare terms, ``a AND b``,
``x OR y``, parentheses, and ``"quoted phrases"``. Query terms get the
same analysis as indexed text (``QueryParserBase`` runs the analyzer on
each clause), so phrases with stopwords acquire position gaps.
"""

from __future__ import annotations

import re

from lucene_spark.analysis.analyzer import Analyzer
from lucene_spark.search.ast import (
    BooleanQuery,
    BoostQuery,
    FieldExistsQuery,
    MatchNoDocsQuery,
    MultiTermQuery,
    PhraseQuery,
    Query,
    TermQuery,
    fielded,
    rewrite,
)

_TOK = re.compile(r'"[^"]*"|\(|\)|\bAND\b|\bOR\b|\bNOT\b|[^\s()]+')
_FIELD_PREFIX = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$")


def parse(
    query: str,
    analyzer: Analyzer,
    field_analyzers: "dict[str, Analyzer] | None" = None,
) -> Query:
    """``field_analyzers``: per-field analyzer overrides — a fielded
    clause ``f:text`` is analyzed with ``field_analyzers[f]`` when
    present (the PerFieldAnalyzerWrapper behavior of
    ``QueryParserBase.getFieldQuery``: query-time analysis must match
    the field's index-time analyzer, so e.g. a stop-free ``title`` field
    keeps ``title:the`` searchable while the body drops it)."""
    if query.count('"') % 2:
        raise ValueError(f"unbalanced quote in query: {query!r}")
    tokens = _TOK.findall(query)
    an = _FieldAnalyzers(analyzer, field_analyzers)
    q, rest = _parse_or(tokens, 0, an)
    if rest != len(tokens):
        raise ValueError(f"trailing tokens in query: {query!r}")
    return rewrite(q)


class _FieldAnalyzers:
    """Resolver: default analyzer + per-field overrides."""

    def __init__(self, default: Analyzer, overrides=None):
        self.default = default
        self.overrides = dict(overrides or {})

    def for_field(self, field: str) -> Analyzer:
        if isinstance(self.default, _FieldAnalyzers):  # defensive
            return self.default.for_field(field)
        return self.overrides.get(field, self.default)


def _parse_or(toks, i, analyzer):
    left, i = _parse_and(toks, i, analyzer)
    clauses = [left]
    # explicit OR, or adjacency (classic QueryParser default operator = OR)
    while i < len(toks) and toks[i] != ")":
        if toks[i] == "OR":
            i += 1
        right, i = _parse_and(toks, i, analyzer)
        clauses.append(right)
    if len(clauses) == 1:
        return left, i
    return BooleanQuery(should=tuple(clauses), min_should_match=1), i


def _parse_and(toks, i, analyzer):
    left, i = _parse_unit(toks, i, analyzer)
    must = [left]
    must_not: list[Query] = []
    while i < len(toks) and toks[i] in ("AND", "NOT"):
        op = toks[i]
        if op == "AND" and i + 1 < len(toks) and toks[i + 1] == "NOT":
            right, i = _parse_unit(toks, i + 2, analyzer)
            must_not.append(right)
        elif op == "NOT":
            right, i = _parse_unit(toks, i + 1, analyzer)
            must_not.append(right)
        else:
            right, i = _parse_unit(toks, i + 1, analyzer)
            must.append(right)
    if len(must) == 1 and not must_not:
        return must[0], i
    return BooleanQuery(must=tuple(must), must_not=tuple(must_not)), i


def _apply_boost(q: Query, toks, i):
    """Consume a trailing ``^<boost>`` token (classic QueryParser boost
    syntax, ``queryparser/classic/QueryParser.jj``)."""
    if i < len(toks) and toks[i].startswith("^"):
        try:
            b = float(toks[i][1:])
        except ValueError as e:
            raise ValueError(f"bad boost {toks[i]!r}") from e
        return BoostQuery(q, b), i + 1
    return q, i


def _parse_unit(toks, i, analyzer):
    if i >= len(toks):
        raise ValueError("unexpected end of query")
    t = toks[i]
    if t == "(":
        q, i = _parse_or(toks, i + 1, analyzer)
        if i >= len(toks) or toks[i] != ")":
            raise ValueError("missing )")
        return _apply_boost(q, toks, i + 1)
    if t.startswith('"'):
        q = _phrase(t[1:-1], analyzer)
        # "phrase"~slop (classic syntax); then an optional boost
        if i + 1 < len(toks) and toks[i + 1].startswith("~"):
            tail = toks[i + 1][1:]
            boost_txt = None
            if "^" in tail:  # combined "phrase"~2^1.5
                tail, _, boost_txt = tail.partition("^")
            try:
                slop = int(tail)
            except ValueError as e:
                raise ValueError(f"bad slop {toks[i+1]!r}") from e
            if isinstance(q, PhraseQuery) and slop > 0:
                q = PhraseQuery(terms=q.terms, positions=q.positions, slop=slop)
            if boost_txt is not None:
                return BoostQuery(q, float(boost_txt)), i + 2
            i += 1
        return _apply_boost(q, toks, i + 1)
    # inline boost: term^2.5 (the analyzer would split on '^' anyway)
    boost = None
    if "^" in t and not t.startswith("^"):
        base, _, btxt = t.rpartition("^")
        try:
            boost = float(btxt)
            t = base
        except ValueError:
            boost = None
    # fielded clause: field:term (classic QueryParser field syntax,
    # queryparser/classic/QueryParser.jj Clause production) — the field
    # name is NOT analyzed; '' stays the default field
    qfield = ""
    if not t.startswith("fn:"):  # 'fn' is the function prefix, not a field
        m = _FIELD_PREFIX.match(t)
        if m:
            qfield, t = m.group(1), m.group(2)
    # interval functions: fn:NAME(args...) — the StandardQueryParser
    # enhancement syntax (flexible/standard/parser/StandardSyntaxParser.jj
    # IntervalFun productions; nodes in .../nodes/intervalfn/)
    if t.startswith("fn:"):
        from lucene_spark.search.ast import IntervalQuery

        source, i = _parse_interval_fn(t, toks, i, _an(analyzer, qfield))
        q = IntervalQuery(qfield, source)
        if boost is not None:
            q = BoostQuery(q, boost)
        return _apply_boost(q, toks, i)
    # multi-term syntax (classic QueryParser.jj Term production):
    # /regex/, wildcard patterns (* ?), fuzzy term~N, [a TO b] ranges —
    # intercepted BEFORE analysis (the reference analyzeMultitermTerm
    # path: normalize only, never tokenize)
    mt = _multi_term(t, toks, i, qfield, _an(analyzer, qfield))
    if mt is not None:
        q, i = mt
        if boost is not None:
            q = BoostQuery(q, boost)
        return q, i
    # single clause: analyze with the FIELD's analyzer; may expand to
    # several tokens -> phrase-like? Lucene's classic QueryParser turns
    # a multi-token analysis of one whitespace clause into a phrase.
    terms, positions = _an(analyzer, qfield).tokenize_one(t)
    if not terms:
        return MatchNoDocsQuery(), i + 1
    if len(terms) == 1:
        q: Query = TermQuery(fielded(qfield, terms[0]))
    else:
        q = PhraseQuery(
            terms=tuple(fielded(qfield, x) for x in terms),
            positions=tuple(positions),
        )
    if boost is not None:
        q = BoostQuery(q, boost)
    return q, i + 1


_FUZZY = re.compile(r"^(.+?)~(\d*)$")


def _multi_term(t: str, toks, i: int, field: str, an) -> "tuple | None":
    """Recognize one multi-term clause at token ``t`` and return
    (Query, next_token_index), or None when ``t`` is an ordinary term.

    Classic QueryParser shapes (queryparser/classic/QueryParser.jj):
    ``/regex/`` -> RegexpQuery (body passed through verbatim, like the
    reference — regex syntax is never analyzed); ``pat*``/``pa?t`` ->
    Prefix/WildcardQuery; bare ``*`` -> FieldExistsQuery (the parser's
    ``field:*`` rewrite; ``*`` on the default field = every doc with
    indexed text); ``term~``/``term~N`` -> FuzzyQuery (maxEdits N,
    default 2, capped like LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE);
    ``[a TO b]``/``{a TO b}`` (mixable brackets, ``*`` endpoints open)
    -> TermRangeQuery. Pattern text is analyzer-NORMALIZED (lowercased),
    never tokenized. Escapes are not supported; a regex body cannot
    contain whitespace or parens (tokenizer splits there first)."""
    if len(t) >= 2 and t.startswith("/") and t.endswith("/"):
        return MultiTermQuery("regexp", (t[1:-1],), field), i + 1
    if t.startswith(("[", "{")):
        # three-token shape: "[lo" "TO" "hi]" (+ optional ^boost on hi)
        if i + 2 >= len(toks) or toks[i + 1] != "TO":
            raise ValueError(f"bad range syntax at {t!r}")
        tail = toks[i + 2]
        boost = None
        if "^" in tail:
            tail, _, btxt = tail.rpartition("^")
            boost = float(btxt)
        if not tail.endswith(("]", "}")):
            raise ValueError(f"bad range syntax at {toks[i + 2]!r}")
        inc_lo, inc_hi = t[0] == "[", tail[-1] == "]"
        lo_txt, hi_txt = t[1:], tail[:-1]
        lo = None if lo_txt == "*" else an.normalize(lo_txt)
        hi = None if hi_txt == "*" else an.normalize(hi_txt)
        q: Query = MultiTermQuery("range", (lo, hi, inc_lo, inc_hi), field)
        if boost is not None:
            q = BoostQuery(q, boost)
        return q, i + 3
    if t == "*":
        return FieldExistsQuery(field), i + 1
    if "*" in t or "?" in t:
        pat = an.normalize(t)
        if pat.endswith("*") and "*" not in pat[:-1] and "?" not in pat:
            return MultiTermQuery("prefix", (pat[:-1],), field), i + 1
        return MultiTermQuery("wildcard", (pat,), field), i + 1
    m = _FUZZY.match(t)
    if m:
        base = an.normalize(m.group(1))
        max_edits = int(m.group(2)) if m.group(2) else 2
        if max_edits > 2:
            raise ValueError(f"fuzzy maxEdits > 2 unsupported: {t!r}")
        if max_edits == 0:
            return TermQuery(fielded(field, base)), i + 1
        return MultiTermQuery("fuzzy", (base, max_edits), field), i + 1
    return None


def _parse_interval_fn(t: str, toks, i: int, an) -> tuple:
    """One ``fn:NAME(args...)`` interval function starting at token
    ``i`` (whose field-stripped text is ``t``). Returns
    (IntervalsSource, next_token_index). Grammar mirror of
    ``StandardSyntaxParser.jj`` IntervalFun productions (function names
    matched case-insensitively — a superset of the reference's
    camelCase|lowercase token pairs); bare/quoted text arguments are
    ANALYZED like ``Intervals.analyzedText`` (IntervalBuilder:
    no tokens -> no-match, one -> term, many -> phrase with
    stopword-hole extends)."""
    from lucene_spark.search import intervals as iv

    name = t[3:].lower()
    i += 1
    if i >= len(toks) or toks[i] != "(":
        raise ValueError(f"fn:{name} expects '('")
    i += 1

    def number() -> int:
        nonlocal i
        if i >= len(toks):
            raise ValueError(f"fn:{name}: unexpected end of query")
        try:
            n = int(toks[i])
        except ValueError as e:
            raise ValueError(f"fn:{name}: expected a number, got {toks[i]!r}") from e
        i += 1
        return n

    def src():
        nonlocal i
        if i >= len(toks) or toks[i] == ")":
            raise ValueError(f"fn:{name}: expected an interval source")
        s, i2 = _parse_interval_source(toks, i, an)
        i = i2
        return s

    def srcs_plus() -> list:
        out = []
        while i < len(toks) and toks[i] != ")":
            out.append(src())
        if not out:
            raise ValueError(f"fn:{name}: needs at least one source")
        return out

    def text_arg() -> str:
        nonlocal i
        if i >= len(toks) or toks[i] in ("(", ")"):
            raise ValueError(f"fn:{name}: expected a term argument")
        arg = toks[i]
        i += 1
        return arg[1:-1] if arg.startswith('"') else arg

    def opt_number() -> "int | None":
        nonlocal i
        if i < len(toks) and toks[i] != ")":
            try:
                n = int(toks[i])
            except ValueError:
                return None
            i += 1
            return n
        return None

    if name in ("ordered", "unordered", "or", "phrase"):
        subs = srcs_plus()
        ctor = {
            "ordered": iv.ordered, "unordered": iv.unordered,
            "or": iv.or_, "phrase": iv.phrase,
        }[name]
        source = ctor(*subs)
    elif name == "atleast":
        n = number()
        source = iv.at_least(n, *srcs_plus())
    elif name == "maxwidth":
        n = number()
        source = iv.maxwidth(n, src())
    elif name == "maxgaps":
        n = number()
        source = iv.maxgaps(n, src())
    elif name == "unorderednooverlaps":
        source = iv.unordered_no_overlaps(src(), src())
    elif name == "before":
        source = iv.before(src(), src())
    elif name == "after":
        source = iv.after(src(), src())
    elif name == "containing":
        source = iv.containing(src(), src())
    elif name == "notcontaining":
        source = iv.not_containing(src(), src())
    elif name == "containedby":
        source = iv.contained_by(src(), src())
    elif name == "notcontainedby":
        source = iv.not_contained_by(src(), src())
    elif name == "within":
        a = src()
        n = number()
        source = iv.within(a, n, src())
    elif name == "notwithin":
        a = src()
        n = number()
        source = iv.not_within(a, n, src())
    elif name == "overlapping":
        source = iv.overlapping(src(), src())
    elif name == "nonoverlapping":
        source = iv.non_overlapping(src(), src())
    elif name == "extend":
        a = src()
        nb = number()
        na = number()
        source = iv.extend(a, nb, na)
    elif name == "wildcard":
        pat = an.normalize(text_arg())
        mx = opt_number()
        source = iv.wildcard(pat, mx if mx else iv.DEFAULT_MAX_EXPANSIONS)
    elif name == "fuzzyterm":
        term_txt = an.normalize(text_arg())
        me = opt_number()
        mx = opt_number()
        source = iv.fuzzy_term(
            term_txt,
            2 if me is None else me,
            iv.DEFAULT_MAX_EXPANSIONS if mx is None else mx,
        )
    else:
        raise ValueError(f"unknown interval function fn:{name}")
    if i >= len(toks) or toks[i] != ")":
        raise ValueError(f"fn:{name}: missing ')'")
    return source, i + 1


def _parse_interval_source(toks, i: int, an) -> tuple:
    """One interval-source argument: a nested fn:..., a quoted string,
    or a bare token — text arguments go through Intervals.analyzedText
    (IntervalBuilder.analyzeText: 0 tokens -> no-match, 1 -> term,
    many -> phrase; each term extended over preceding stopword holes,
    IntervalBuilder.analyzeTerms precedingSpaces)."""
    from lucene_spark.search import intervals as iv

    t = toks[i]
    if t.startswith("fn:"):
        return _parse_interval_fn(t, toks, i, an)
    if t == "(":
        raise ValueError("interval sources do not take bare parentheses")
    text = t[1:-1] if t.startswith('"') else t
    terms, positions = an.tokenize_one(text)
    if not terms:
        return iv.no_intervals(text), i + 1
    if len(terms) == 1:
        return iv.term(terms[0]), i + 1
    subs = []
    prev = -1
    for tt, p in zip(terms, positions):
        preceding = p - prev - 1
        subs.append(
            iv.extend(iv.term(tt), preceding, 0) if preceding else iv.term(tt)
        )
        prev = p
    return iv.phrase(*subs), i + 1


def _an(analyzer, field: str = "") -> Analyzer:
    """Resolve a _FieldAnalyzers wrapper (or plain Analyzer) to the
    analyzer for ``field``."""
    if isinstance(analyzer, _FieldAnalyzers):
        return analyzer.for_field(field)
    return analyzer


def _phrase(text: str, analyzer) -> Query:
    terms, positions = _an(analyzer).tokenize_one(text)
    if not terms:
        return MatchNoDocsQuery()
    if len(terms) == 1:
        return TermQuery(terms[0])
    # normalize positions to start at the first surviving token's position,
    # preserving gaps (stopword holes) — PhraseQuery.Builder.add semantics
    base = positions[0]
    rel = tuple(p - base for p in positions)
    return PhraseQuery(terms=tuple(terms), positions=rel)
