"""MultiTermQuery term matching, shared by every plane.

The reference models PrefixQuery / WildcardQuery / RegexpQuery /
FuzzyQuery / TermRangeQuery / TermInSetQuery as ``MultiTermQuery``
subclasses (``search/MultiTermQuery.java``) whose rewrite enumerates
the matching terms from the term dictionary. This engine keeps ONE
source of truth for "does term t match (mode, args)" — the Python
predicates here — consumed by:

- the segment kernels (``kernels.score_exhaustive``): decide which
  scanned terms belong to a ``ast.MultiTermQuery`` leaf;
- the Spark scan predicate (``Searcher._term_predicate``): a SUPERSET
  filter pushed into the postings scan (sargable modes — prefix /
  range / in_set — reach parquet row-group stats, the .tip/FST-pruning
  analog; wildcard/regexp/fuzzy evaluate JVM-side on the term column);
- the serving plane (``LocalSearcher``): expand against the per-segment
  term dictionary (term_stats parquet) with ``arrow_filters`` pruning
  the read for sargable modes;
- the highlighter (``highlight.py``): match re-analyzed tokens, the
  UnifiedHighlighter's automata-over-token-stream model
  (``uhighlight/MultiTermHighlighting.java``).

Dialect notes (documented constraints, not hidden divergences):
- ``regexp`` uses the host regex engine on each plane (Java on the
  Spark scan, Python in kernels/serving) — patterns must stay in the
  common subset (the reference uses its own RegExp automaton syntax;
  this engine targets the practical intersection). Matching is
  UNANCHORED like Spark ``rlike`` — anchor with ^$ for whole-term.
- ``lregexp`` is the reference dialect itself: the
  ``util/automaton/RegExp.java`` grammar compiled to an automaton
  (``lucene_spark.search.lregexp``), ANCHORED like RegexpQuery, with
  ``&`` intersection, ``<n-m>`` intervals, ``#``/``@``, and the
  deprecated ``~`` complement behind its flag; args =
  (pattern[, flags=ALL]). The scan plane pushes the pattern's literal
  prefix (the ``Operations.getCommonPrefix`` analog); membership is
  decided by the shared automaton matcher on every plane.
- ``fuzzy`` defaults to TRANSPOSITION-AWARE edit distance like the
  reference (``FuzzyQuery.java:73-76`` defaults transpositions=true);
  args = (base, max_edits[, transpositions=True[, variant]]) — pass
  transpositions=False for the plain-Levenshtein opt-out (Spark's
  ``levenshtein()`` semantics). The DEFAULT transposition variant is
  the RESTRICTED Damerau (optimal string alignment: a transposed pair
  cannot be edited again), matching the reference's
  ``LevenshteinAutomata`` parametric tables (``Lev1TParametric
  Description.java``/``Lev2T...`` — transposition as a primitive edit
  on otherwise-untouched adjacent characters). variant="full" selects
  the unrestricted Damerau-Levenshtein (DuckDB's
  ``damerau_levenshtein`` — the oracle-compat mode). The variants
  differ only on max_edits>=2 shapes like "ca"~2 vs "abc"
  (full DL 2, restricted 3).
"""

from __future__ import annotations

import re

from lucene_spark.search.ast import FIELD_SEP, bare_term, field_of, fielded

MODES = ("prefix", "wildcard", "regexp", "fuzzy", "range", "in_set")


def wildcard_regex(pattern: str) -> str:
    """WildcardQuery pattern -> anchored regex source
    (search/WildcardQuery.java:30-63: * = any sequence, ? = any single
    char, everything else literal). The escaping is portable across
    Java and Python regex engines (plain backslash-escape of
    non-word literals)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch.isalnum() or ch == "_":
            out.append(ch)
        else:
            out.append("\\" + ch)
    return f"^{''.join(out)}$"


def levenshtein(a: str, b: str) -> int:
    """Plain edit distance (insert/delete/substitute), the semantics of
    Spark ``F.levenshtein`` / DuckDB ``levenshtein`` — NOT Damerau."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def damerau_levenshtein(a: str, b: str) -> int:
    """FULL Damerau-Levenshtein distance (insert/delete/substitute/
    transpose, transpositions may be edited again) — the alphabet-map
    dynamic program, semantics identical to DuckDB's
    ``damerau_levenshtein`` (the gate oracle). The reference's
    FuzzyQuery automaton (``FuzzyQuery.java:73-76`` transpositions
    default) implements the restricted variant; see the module dialect
    notes."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    maxdist = la + lb
    da: dict = {}
    d = [[maxdist] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)  # last row where b[j-1] appeared in a
            l = db  # last column matched in this row
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transposition
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def osa_levenshtein(a: str, b: str) -> int:
    """RESTRICTED Damerau-Levenshtein distance (optimal string
    alignment: insert/delete/substitute/transpose where a transposed
    pair cannot be edited again) — the transposition semantics of the
    reference's fuzzy automata (``util/automaton/LevenshteinAutomata
    .java:54-55`` "transpositions as a primitive edit", parametric
    tables ``Lev1TParametricDescription.java`` /
    ``Lev2TParametricDescription.java``): each input character
    participates in at most one primitive operation, so e.g.
    osa("ca","abc") = 3 while the full DL is 2 (transpose then insert
    INSIDE the transposed pair is not a primitive-edit alignment)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    prev2: list = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i]
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cb = b[j - 1]
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            if (
                i > 1
                and j > 1
                and ca == b[j - 2]
                and a[i - 2] == cb
                and ca != cb
            ):
                d = min(d, prev2[j - 2] + 1)
            cur.append(d)
        prev2, prev = prev, cur
    return prev[-1]


def bare_matcher(mode: str, args: tuple):
    """Predicate over BARE terms (field already stripped)."""
    if mode == "prefix":
        p = args[0]
        return lambda t: t.startswith(p)
    if mode == "wildcard":
        rx = re.compile(wildcard_regex(args[0]))
        return lambda t: rx.match(t) is not None
    if mode == "regexp":
        rx = re.compile(args[0])
        return lambda t: rx.search(t) is not None
    if mode == "lregexp":
        # the reference RegexpQuery dialect: util/automaton/RegExp.java
        # grammar (incl. & intersection, <n-m> intervals, # @, named
        # <identifier> automata), ANCHORED whole-term matching; args =
        # (pattern[, flags[, automata]]), flags default RegExp.ALL like
        # RegexpQuery's constructor; automata = ((name, sub_pattern),
        # ...) pairs — the AutomatonProvider hook in a hashable,
        # serializable encoding (sub-patterns compile in the same
        # dialect)
        from lucene_spark.search.lregexp import ALL, lucene_regexp_matcher

        flags = int(args[1]) if len(args) > 1 else ALL
        provider = dict(args[2]) if len(args) > 2 and args[2] else None
        return lucene_regexp_matcher(args[0], flags, provider)
    if mode == "fuzzy":
        base, max_edits = args[0], int(args[1])
        transpositions = bool(args[2]) if len(args) > 2 else True
        variant = args[3] if len(args) > 3 else "restricted"
        if variant not in ("restricted", "full"):
            raise ValueError(f"unknown fuzzy variant {variant!r}")
        me = max_edits
        if not transpositions:
            dist = levenshtein
        elif variant == "full":
            dist = damerau_levenshtein
        else:
            dist = osa_levenshtein

        def _fz(t, base=base, me=me, dist=dist):
            # cheap length screen before the DP (each edit op changes
            # length by at most 1 under both variants)
            if abs(len(t) - len(base)) > me:
                return False
            return dist(t, base) <= me

        return _fz
    if mode == "range":
        lo, hi = args[0], args[1]
        inc_lo = bool(args[2]) if len(args) > 2 else True
        inc_hi = bool(args[3]) if len(args) > 3 else False

        def _rg(t, lo=lo, hi=hi, inc_lo=inc_lo, inc_hi=inc_hi):
            if lo is not None and (t < lo or (t == lo and not inc_lo)):
                return False
            if hi is not None and (t > hi or (t == hi and not inc_hi)):
                return False
            return True

        return _rg
    if mode == "in_set":
        s = frozenset(args[0])
        return lambda t: t in s
    raise ValueError(f"unknown multi-term mode {mode!r}")


def term_key_matcher(mode: str, args: tuple, field: str = ""):
    """Predicate over FIELDED term keys (``ast.fielded`` serialization):
    scope to the leaf's field, strip it, then apply the bare matcher —
    the Python mirror of ``Searcher._term_predicate``."""
    bm = bare_matcher(mode, args)
    if field:
        prefix = field + FIELD_SEP
        plen = len(prefix)
        return lambda t: t.startswith(prefix) and bm(t[plen:])
    return lambda t: FIELD_SEP not in t and bm(t)


def arrow_filters(mode: str, args: tuple, field: str = ""):
    """pyarrow filters pruning a term-dictionary read for SARGABLE
    modes (None = read all and post-filter). The returned filter is a
    SUPERSET of the matcher (row-group pruning only — the Python
    predicate still decides)."""
    if mode == "prefix":
        lo = fielded(field, args[0])
        if not lo:
            return None
        hi = lo[:-1] + chr(ord(lo[-1]) + 1) if ord(lo[-1]) < 0x10FFFF else None
        f = [("term", ">=", lo)]
        if hi is not None:
            f.append(("term", "<", hi))
        return f
    if mode == "range":
        lo, hi = args[0], args[1]
        inc_hi = bool(args[3]) if len(args) > 3 else False
        f = []
        if lo is not None:
            f.append(("term", ">=", fielded(field, lo)))
        if hi is not None:
            f.append(("term", "<=" if inc_hi else "<", fielded(field, hi)))
        return f or None
    if mode == "in_set":
        return [("term", "in", [fielded(field, t) for t in args[0]])]
    return None
