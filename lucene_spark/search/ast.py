"""Query AST — the logical algebra of SURVEY.md §2.2.

Mirrors the reference's Query classes (``search/TermQuery.java``,
``search/BooleanQuery.java:45-147``, ``search/PhraseQuery.java:76-153``)
as plain dataclasses, plus the Boolean simplification rewrites of
``BooleanQuery.java:269-330`` (empty -> no-match, single-clause
inlining, nested flattening).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    pass


# ---- fielded terms (Term(field, text), index/Term.java:30-48) ----
#
# A term's full identity is the (field, text) pair. We serialize it into
# one string key — "" (bare) for the index's default field, else
# "<field>\x1f<text>" — so postings stay sorted/pruned per field exactly
# like the reference's per-field term dictionaries
# (index/FieldInfos.java per-field accretion; one FST per field), while
# every kernel/scorer keyed by term string works unchanged. \x1f cannot
# appear in analyzer output (not a word character).

FIELD_SEP = "\x1f"


def fielded(field: str, term: str) -> str:
    """Serialize Term(field, text); field '' = the default field."""
    return term if not field else f"{field}{FIELD_SEP}{term}"


def field_of(term: str) -> str:
    i = term.find(FIELD_SEP)
    return "" if i < 0 else term[:i]


def bare_term(term: str) -> str:
    i = term.find(FIELD_SEP)
    return term if i < 0 else term[i + 1 :]


@dataclass(frozen=True)
class TermQuery(Query):
    term: str


@dataclass(frozen=True)
class PhraseQuery(Query):
    # terms with their query positions (holes allowed for stopword gaps:
    # PhraseQuery supports explicit positions; analyzer-produced gaps keep
    # original position indices)
    terms: tuple
    positions: tuple
    slop: int = 0


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with term alternatives per position
    (``search/MultiPhraseQuery.java``): ``slots[k]`` is the tuple of
    acceptable terms at relative position ``positions[k]``. idf is the
    sum over ALL member terms (``MultiPhraseQuery.java:218-237``)."""

    slots: tuple  # tuple[tuple[str, ...], ...]
    positions: tuple
    # slop > 0 = sloppy matching over per-slot UNION positions
    # (UnionPostingsEnum + SloppyPhraseMatcher), incl. slots sharing a
    # term (the hasMultiTermRpts repeat machinery)
    slop: int = 0


@dataclass(frozen=True)
class BoostQuery(Query):
    """Scoring decorator: child scores multiplied by ``boost``
    (float32 multiply at weight creation, ``search/BoostQuery.java``)."""

    query: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Matching docs all score ``boost`` (``search/ConstantScoreQuery.java``)."""

    query: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class BooleanQuery(Query):
    must: tuple = field(default=())
    should: tuple = field(default=())
    must_not: tuple = field(default=())
    filter: tuple = field(default=())
    min_should_match: int = 0


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    pass


@dataclass(frozen=True)
class FieldExistsQuery(Query):
    """Matches every doc with at least one indexed token in ``field``
    (``search/FieldExistsQuery.java`` over norms: a doc has a norm iff
    the field produced terms). Scores a constant 1.0 * boost."""

    field: str = ""


@dataclass(frozen=True)
class NGramPhraseQuery(Query):
    """PhraseQuery over n-gram terms with the reference's rewrite
    (``search/NGramPhraseQuery.java:30-77``): because consecutive
    n-grams overlap by n-1 characters, matching every n-th gram (plus
    the last) implies the full phrase — the rewrite drops the redundant
    middle terms, shrinking the conjunction 1/n."""

    n: int
    terms: tuple
    positions: tuple = ()

    def rewrite_phrase(self) -> "Query":
        terms, positions = self.terms, self.positions or tuple(range(len(self.terms)))
        if len(terms) < 3 or self.n < 2:
            return PhraseQuery(terms=terms, positions=positions)
        # consecutive-position check: the optimization only applies to
        # gap-free gram streams (NGramPhraseQuery.rewrite guard)
        if any(positions[i + 1] - positions[i] != 1 for i in range(len(terms) - 1)):
            return PhraseQuery(terms=terms, positions=positions)
        keep_t, keep_p = [], []
        for i in range(len(terms)):
            if i % self.n == 0 or i == len(terms) - 1:
                keep_t.append(terms[i])
                keep_p.append(positions[i])
        return PhraseQuery(terms=tuple(keep_t), positions=tuple(keep_p))


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class MultiTermQuery(Query):
    """PrefixQuery / WildcardQuery / RegexpQuery / FuzzyQuery /
    TermRangeQuery / TermInSetQuery as ONE constant-score leaf — the
    reference's ``MultiTermQuery`` family under its
    ``CONSTANT_SCORE_REWRITE`` (``search/MultiTermQuery.java``,
    ``PrefixQuery.java``, ``WildcardQuery.java``, ``FuzzyQuery.java``,
    ``TermRangeQuery.java``, ``TermInSetQuery.java``): a doc matches if
    ANY dictionary term matching (mode, args) occurs in it; the leaf
    scores a constant ``boost`` (1.0 unboosted). Term semantics live in
    ``search/multiterm.py`` (one source of truth across planes).

    modes/args: prefix(p) | wildcard(pattern) | regexp(r) |
    fuzzy(term, max_edits) | range(lo, hi[, include_lo, include_hi]) |
    in_set(terms_tuple)."""

    mode: str
    args: tuple
    field: str = ""


@dataclass(frozen=True)
class IntervalQuery(Query):
    """``queries/intervals/IntervalQuery.java``: scores docs by the
    minimal intervals an ``IntervalsSource`` enumerates over ``field``
    (sources built with ``lucene_spark.search.intervals`` factories —
    term/phrase/ordered/unordered/or_/maxgaps/...). Per-doc freq sums
    1/max(length - minExtent + 1, 1) over the enumerated intervals
    (``IntervalScorer.java:43-52``); the score function is the
    saturation curve pivot/(pivot+freq) by default, the sigmoid variant
    when ``exp`` is set (``IntervalScoreFunction.java``; defaults
    pivot=1 per ``IntervalQuery.java:46-48``)."""

    field: str
    source: object  # intervals.IntervalsSource (frozen, hashable)
    pivot: float = 1.0
    exp: "float | None" = None


def rewrite(q: Query) -> Query:
    """Boolean simplifications to fixpoint (BooleanQuery.java:269-330,
    IndexSearcher.rewrite loop at IndexSearcher.java:860)."""
    while True:
        q2 = _rewrite_once(q)
        if q2 == q:
            return q
        q = q2


def _rewrite_once(q: Query) -> Query:
    if isinstance(q, NGramPhraseQuery):
        return q.rewrite_phrase()
    if isinstance(q, MultiTermQuery):
        if q.mode == "in_set" and not q.args[0]:
            return MatchNoDocsQuery()  # TermInSetQuery over {} matches nothing
        return q
    if isinstance(q, PhraseQuery):
        # PhraseQuery.rewrite (PhraseQuery.java): no terms ->
        # MatchNoDocs; ONE term -> TermQuery (the sloppy matcher
        # requires >= 2 position lists)
        if not q.terms:
            return MatchNoDocsQuery()
        if len(q.terms) == 1:
            return TermQuery(q.terms[0])
        return q
    if isinstance(q, MultiPhraseQuery):
        # MultiPhraseQuery.rewrite (MultiPhraseQuery.java:182-195):
        # no slots -> MatchNoDocs; ONE slot -> BooleanQuery of SHOULD
        # TermQuery over the slot's members
        if not q.slots:
            return MatchNoDocsQuery()
        if len(q.slots) == 1:
            return BooleanQuery(
                should=tuple(TermQuery(t) for t in q.slots[0]),
                min_should_match=1,
            )
        # slots sharing a term (hasMultiTermRpts) are handled by the
        # repeat machinery in lucene_spark.search.sloppy
        return q
    if isinstance(q, BoostQuery):
        c = rewrite(q.query)
        if isinstance(c, MatchNoDocsQuery):
            return c
        if q.boost == 1.0:
            return c
        return BoostQuery(c, q.boost)
    if isinstance(q, ConstantScoreQuery):
        c = rewrite(q.query)
        if isinstance(c, MatchNoDocsQuery):
            return c
        return ConstantScoreQuery(c, q.boost)
    if not isinstance(q, BooleanQuery):
        return q
    must = tuple(rewrite(c) for c in q.must)
    should = tuple(rewrite(c) for c in q.should)
    must_not = tuple(rewrite(c) for c in q.must_not)
    filt = tuple(rewrite(c) for c in q.filter)
    # MatchNoDocs propagation
    if any(isinstance(c, MatchNoDocsQuery) for c in must + filt):
        return MatchNoDocsQuery()
    should = tuple(c for c in should if not isinstance(c, MatchNoDocsQuery))
    must_not = tuple(c for c in must_not if not isinstance(c, MatchNoDocsQuery))
    if not must and not should and not filt:
        return MatchNoDocsQuery()  # pure-negative or empty
    if q.min_should_match > len(should) and not (must or filt) :
        return MatchNoDocsQuery()
    # single scoring clause inlining
    if len(must) == 1 and not should and not must_not and not filt:
        return must[0]
    if len(should) == 1 and not must and not must_not and not filt and q.min_should_match <= 1:
        return should[0]
    # flatten nested pure-SHOULD disjunctions / pure-MUST conjunctions
    new_should = []
    for c in should:
        if isinstance(c, BooleanQuery) and c.should and not (c.must or c.must_not or c.filter) and c.min_should_match <= 1:
            new_should.extend(c.should)
        else:
            new_should.append(c)
    new_must = []
    for c in must:
        if isinstance(c, BooleanQuery) and c.must and not (c.should or c.must_not or c.filter):
            new_must.extend(c.must)
        else:
            new_must.append(c)
    return BooleanQuery(
        must=tuple(new_must),
        should=tuple(new_should),
        must_not=must_not,
        filter=filt,
        min_should_match=q.min_should_match,
    )


def has_termless_match(q: Query) -> bool:
    """True if the tree contains a leaf that can match docs WITHOUT any
    postings term (FieldExistsQuery / MatchAllDocsQuery) — those queries
    must still visit every live segment even though the term-pruned
    postings scan yields no rows (``search/FieldExistsQuery.java`` /
    ``MatchAllDocsQuery.java`` iterate norms / all docs, not postings)."""
    if isinstance(q, (FieldExistsQuery, MatchAllDocsQuery)):
        return True
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return has_termless_match(q.query)
    if isinstance(q, BooleanQuery):
        return any(
            has_termless_match(c)
            for c in q.must + q.should + q.must_not + q.filter
        )
    return False


def query_terms(q: Query) -> set:
    """All terms a query touches (for postings pruning)."""
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, (PhraseQuery, NGramPhraseQuery)):
        return set(q.terms)
    if isinstance(q, MultiPhraseQuery):
        return {t for slot in q.slots for t in slot}
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return query_terms(q.query)
    if isinstance(q, IntervalQuery):
        # fix_field terms arrive pre-qualified (contain the separator)
        return {
            t if FIELD_SEP in t else fielded(q.field, t)
            for t in q.source.terms()
        }
    if isinstance(q, BooleanQuery):
        out: set = set()
        for c in q.must + q.should + q.must_not + q.filter:
            out |= query_terms(c)
        return out
    return set()


def map_leaves(q: Query, fn) -> Query:
    """Rebuild a tree with ``fn`` applied to every LEAF node (wrappers
    and boolean structure preserved) — the rewrite-walk shape of
    ``IndexSearcher.rewrite`` / ``MultiTermQuery.RewriteMethod``."""
    if isinstance(q, BoostQuery):
        return BoostQuery(map_leaves(q.query, fn), q.boost)
    if isinstance(q, ConstantScoreQuery):
        return ConstantScoreQuery(map_leaves(q.query, fn), q.boost)
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            must=tuple(map_leaves(c, fn) for c in q.must),
            should=tuple(map_leaves(c, fn) for c in q.should),
            must_not=tuple(map_leaves(c, fn) for c in q.must_not),
            filter=tuple(map_leaves(c, fn) for c in q.filter),
            min_should_match=q.min_should_match,
        )
    return fn(q)


def scoring_boolean_rewrite(q: Query, expander) -> Query:
    """``MultiTermQuery.SCORING_BOOLEAN_REWRITE`` core, shared by the
    Spark and serving planes: ``expander(leaf)`` returns the leaf's
    expanded (fielded) terms; every MultiTermQuery leaf becomes a
    BooleanQuery of SHOULD TermQuery clauses (boost 1 per clause, like
    ``ScoringRewrite.SCORING_BOOLEAN_REWRITE``), empty expansion ->
    MatchNoDocsQuery."""

    def leaf(node):
        if not isinstance(node, MultiTermQuery):
            return node
        terms = expander(node)
        if not terms:
            return MatchNoDocsQuery()
        return BooleanQuery(
            should=tuple(TermQuery(t) for t in terms),
            min_should_match=1,
        )

    return rewrite(map_leaves(q, leaf))


def multi_term_leaves_split(q: Query) -> tuple:
    """``multi_term_leaves`` with provenance: (const_score, interval)
    leaf tuples. Constant-score leaves need only their DOC UNION (the
    direct executor precomputes it under a byte-bounded spill guard);
    interval sources need full postings (positions) in the segment
    view for iterator-build expansion."""
    if isinstance(q, MultiTermQuery):
        return (q,), ()
    if isinstance(q, IntervalQuery):
        return (), multi_term_leaves(q)
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return multi_term_leaves_split(q.query)
    if isinstance(q, BooleanQuery):
        cs: list = []
        iv: list = []
        for c in q.must + q.should + q.must_not + q.filter:
            a, b = multi_term_leaves_split(c)
            cs.extend(a)
            iv.extend(b)
        return tuple(cs), tuple(iv)
    return (), ()


def multi_term_leaves(q: Query) -> tuple:
    """All ``MultiTermQuery`` leaves of a tree, in walk order — these
    need a term PREDICATE on the postings scan instead of a term list
    (the rewrite-against-the-dictionary step of MultiTermQuery.java,
    evaluated where the data is)."""
    if isinstance(q, MultiTermQuery):
        return (q,)
    if isinstance(q, IntervalQuery):
        from lucene_spark.search import intervals as iv

        return tuple(
            MultiTermQuery(s.mode, s.args, q.field)
            for s in iv.multi_terms(q.source)
        )
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return multi_term_leaves(q.query)
    if isinstance(q, BooleanQuery):
        out: list = []
        for c in q.must + q.should + q.must_not + q.filter:
            out.extend(multi_term_leaves(c))
        return tuple(out)
    return ()
