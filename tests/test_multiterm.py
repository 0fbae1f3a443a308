"""MultiTermQuery family (PrefixQuery / WildcardQuery / RegexpQuery /
FuzzyQuery / TermRangeQuery / TermInSetQuery) as first-class query-tree
leaves under the CONSTANT_SCORE_REWRITE: parser syntax, one-source
matcher semantics (Python predicate == Spark scan predicate), engine ==
oracle rank identity across planes, and highlighter token matching."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import ast, multiterm
from lucene_spark.search.parser import parse
from lucene_spark.search.searcher import Searcher
from lucene_spark.search.serve import LocalSearcher


# ------------------------------------------------------------- parser


def test_parser_multi_term_shapes():
    cases = {
        "w004*": ast.MultiTermQuery("prefix", ("w004",)),
        "te?m": ast.MultiTermQuery("wildcard", ("te?m",)),
        "w0*2": ast.MultiTermQuery("wildcard", ("w0*2",)),
        "merge~1": ast.MultiTermQuery("fuzzy", ("merge", 1)),
        "merge~": ast.MultiTermQuery("fuzzy", ("merge", 2)),
        "[aa TO bb]": ast.MultiTermQuery("range", ("aa", "bb", True, True)),
        "{aa TO bb}": ast.MultiTermQuery("range", ("aa", "bb", False, False)),
        "[aa TO *]": ast.MultiTermQuery("range", ("aa", None, True, True)),
        "/w0[0-9]+/": ast.MultiTermQuery("regexp", ("w0[0-9]+",)),
        "title:w00*": ast.MultiTermQuery("prefix", ("w00",), field="title"),
        "*": ast.FieldExistsQuery(""),
        "title:*": ast.FieldExistsQuery("title"),
    }
    for s, want in cases.items():
        assert parse(s, ENGLISH) == want, s
    # boosts attach; fuzzy maxEdits=0 degrades to TermQuery
    assert parse("w004*^2", ENGLISH) == ast.BoostQuery(
        ast.MultiTermQuery("prefix", ("w004",)), 2.0
    )
    assert parse("merge~0", ENGLISH) == ast.TermQuery("merge")
    # patterns are normalized (lowercased), never tokenized
    assert parse("W004*", ENGLISH) == ast.MultiTermQuery("prefix", ("w004",))
    with pytest.raises(ValueError):
        parse("merge~3", ENGLISH)
    with pytest.raises(ValueError):
        parse("[aa TO", ENGLISH)


# ----------------------------------------------------------- matchers

VOCAB = [
    "w0040", "w0041", "w0042", "w0049", "w0050", "w004", "w0042x",
    "merge", "merga", "marge", "mergers", "emrge", "scan", "a", "",
]


def _matched(mode, args, field=""):
    from lucene_spark.search.ast import fielded

    pred = multiterm.term_key_matcher(mode, args, field)
    return {t for t in (fielded(field, v) for v in VOCAB) if pred(t)}


def test_matcher_semantics():
    assert _matched("prefix", ("w004",)) == {
        "w0040", "w0041", "w0042", "w0049", "w004", "w0042x"
    }
    assert _matched("wildcard", ("w00?2",)) == {"w0042"}
    assert _matched("wildcard", ("w0*2",)) == {"w0042"}
    assert _matched("regexp", ("^w004[0-9]$",)) == {
        "w0040", "w0041", "w0042", "w0049"
    }
    # unanchored regexp (rlike contract)
    assert "w0042x" in _matched("regexp", ("0042",))
    # Damerau default (FuzzyQuery.java:73-76): the transposition
    # "emrge" is ONE edit; the plain-Levenshtein opt-out excludes it
    assert _matched("fuzzy", ("merge", 1)) == {"merge", "merga", "marge", "emrge"}
    assert _matched("fuzzy", ("merge", 1, False)) == {"merge", "merga", "marge"}
    assert _matched("fuzzy", ("merge", 2)) >= {"merge", "merga", "marge", "mergers"}
    # 2-arg range keeps the historical half-open [lo, hi) contract
    assert _matched("range", ("w0040", "w0049")) == {"w0040", "w0041", "w0042", "w0042x"}
    assert _matched("range", ("w0040", "w0049", True, True)) == {
        "w0040", "w0041", "w0042", "w0042x", "w0049"
    }
    assert _matched("range", ("w0040", "w0049", False, False)) == {
        "w0041", "w0042", "w0042x"
    }
    assert _matched("in_set", (("merge", "scan", "zzz"),)) == {"merge", "scan"}
    # field scoping: fielded keys only, bare keys excluded
    assert _matched("prefix", ("w004",), field="title") == {
        "title\x1fw0040", "title\x1fw0041", "title\x1fw0042",
        "title\x1fw0042x", "title\x1fw0049", "title\x1fw004",
    }
    bare_pred = multiterm.term_key_matcher("prefix", ("w004",))
    assert not bare_pred("title\x1fw0042")


def test_levenshtein_matches_reference_values():
    lev = multiterm.levenshtein
    assert lev("kitten", "sitting") == 3
    assert lev("", "abc") == 3 and lev("abc", "") == 3
    assert lev("ab", "ba") == 2  # PLAIN levenshtein: transposition = 2
    assert lev("merge", "merge") == 0


def test_damerau_levenshtein_matches_duckdb():
    """The Python Damerau implementation must agree with DuckDB's
    ``damerau_levenshtein`` (the gate oracle) — full-DL semantics,
    incl. the edited-after-transposition case the restricted variant
    scores higher."""
    import duckdb

    dl = multiterm.damerau_levenshtein
    assert dl("sacn", "scan") == 1  # the FuzzyQuery.java:73-76 default case
    assert dl("ab", "ba") == 1
    assert dl("CA", "ABC") == 2  # full DL; restricted/OSA would say 3
    assert dl("kitten", "sitting") == 3
    assert dl("", "ab") == 2 and dl("ab", "") == 2
    con = duckdb.connect()
    rng = np.random.default_rng(5)
    alpha = "abcde"
    for _ in range(500):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 8)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 8)))
        want = con.sql(
            f"select damerau_levenshtein('{a}', '{b}')"
        ).fetchone()[0]
        assert dl(a, b) == want, (a, b)


def test_osa_restricted_damerau_semantics():
    """The engine-default fuzzy distance is the RESTRICTED Damerau
    (optimal string alignment — ``LevenshteinAutomata.java:54-55``
    transposition as a primitive edit on otherwise-untouched adjacent
    characters): a transposed pair cannot be edited again."""
    osa = multiterm.osa_levenshtein
    dl = multiterm.damerau_levenshtein
    # agrees with full DL on simple shapes
    assert osa("sacn", "scan") == 1
    assert osa("ab", "ba") == 1
    assert osa("kitten", "sitting") == 3
    assert osa("", "ab") == 2 and osa("ab", "") == 2
    assert osa("merge", "merge") == 0
    # THE divergence family: transpose + edit INSIDE the pair
    assert osa("ca", "abc") == 3 and dl("ca", "abc") == 2
    assert osa("osrw", "row") == 3 and dl("osrw", "row") == 2
    assert osa("osrw", "sort") == 2  # two disjoint transpositions
    assert multiterm.levenshtein("osrw", "sort") == 3
    # OSA always dominates full DL and is dominated by plain lev
    rng = np.random.default_rng(11)
    alpha = "abcd"
    for _ in range(500):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 8)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 8)))
        o = osa(a, b)
        assert dl(a, b) <= o <= multiterm.levenshtein(a, b), (a, b)
        assert osa(b, a) == o, (a, b)  # symmetry


def test_fuzzy_variant_selection():
    """mode=fuzzy args: (base, max_edits[, transpositions[, variant]]);
    default = restricted Damerau (reference parity), variant='full' =
    unrestricted DL (oracle-compat), transpositions=False = plain."""
    assert multiterm.bare_matcher("fuzzy", ("osrw", 2))("sort")
    assert not multiterm.bare_matcher("fuzzy", ("osrw", 2))("row")
    assert multiterm.bare_matcher("fuzzy", ("osrw", 2, True, "full"))("row")
    assert not multiterm.bare_matcher("fuzzy", ("osrw", 2, False))("sort")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multiterm.bare_matcher("fuzzy", ("osrw", 2, True, "nope"))


def test_osa_oracle_sql_matches_python():
    """The recursive-CTE OSA DP shipped as the gate oracle
    (oracle_sql.fuzzy_restricted_match_sql) must agree with the Python
    engine distance on a randomized vocabulary."""
    import duckdb

    from lucene_spark.search import oracle_sql as osql

    from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS

    rng = np.random.default_rng(23)
    alpha = "orstw"
    vocab = sorted(
        (
            {
                "".join(rng.choice(list(alpha), rng.integers(1, 8)))
                for _ in range(200)
            }
            | {"sort", "row", "osrw", "worst"}
        )
        # the oracle tokenizer applies the engine's stop filter
        # (stopwords are never indexed, so fuzzy cannot match them)
        - set(ENGLISH_STOP_WORDS)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT row_number() OVER () - 1 AS doc_id,"
        " t AS text FROM (SELECT unnest(?) AS t)",
        [vocab],
    )
    for base, k in [("osrw", 2), ("sort", 1), ("worst", 2)]:
        got = {r[0] for r in con.execute(
            osql.fuzzy_restricted_match_sql(base, k)
        ).fetchall()}
        pred = multiterm.bare_matcher("fuzzy", (base, k))
        want = {i for i, t in enumerate(vocab) if pred(t)}
        assert got == want, (base, k, got ^ want)


def test_spark_scan_predicate_equals_python_matcher(spark):
    """The Spark Column predicate (scan filter) must select the SAME
    term set as the Python matcher (kernel/serving/highlight) for exact
    modes, and a SUPERSET for fuzzy-with-transpositions (Spark has no
    Damerau function; the Python matcher decides membership)."""
    import pyspark.sql.functions as F

    vocab = sorted(
        {f"w{i:04d}" for i in range(0, 120, 7)}
        | {"merge", "merga", "marge", "emrge", "marze", "scan",
           "title\x1fw0042", "title\x1fmerge"}
    )
    df = spark.createDataFrame([(t,) for t in vocab], "term string")
    s = Searcher.__new__(Searcher)  # _term_predicate needs no state
    cases = [
        ("prefix", ("w00",), ""),
        ("prefix", ("w00",), "title"),
        ("wildcard", ("w0?4*",), ""),
        ("regexp", ("^w0(0|1)14$",), ""),
        ("fuzzy", ("merge", 1), ""),
        ("fuzzy", ("merge", 1, False), ""),
        ("lregexp", ("m.*e&.*a.*",), ""),
        ("range", ("w0007", "w0077"), ""),
        ("range", ("w0007", "w0077", True, True), ""),
        ("range", ("w0007", "w0077", False, False), ""),
        ("in_set", (("merge", "w0014"),), ""),
    ]
    for mode, args, field in cases:
        got_spark = {
            r["term"]
            for r in df.where(
                s._term_predicate(mode, *args, field=field)
            ).collect()
        }
        pred = multiterm.term_key_matcher(mode, args, field)
        got_py = {t for t in vocab if pred(t)}
        if mode == "fuzzy" and (len(args) < 3 or args[2]):
            # superset scan: "emrge" (dl 1) must survive the scan;
            # "marze" (dl 2, lev 2) may pass the scan but the matcher
            # rejects it
            assert got_spark >= got_py, (mode, args, field)
            assert "emrge" in got_py and "marze" not in got_py
        elif mode == "lregexp":
            # literal-prefix superset screen; the automaton decides
            assert got_spark >= got_py, (mode, args, field)
            assert got_py == {"marge", "marze"}
        else:
            assert got_spark == got_py, (mode, args, field)


# ------------------------------------------------- engine vs oracle

MT_QUERIES = [
    "w004*",
    "w00?7",
    "w0042~1",
    "[w0040 TO w0049]",
    "{w0040 TO w0049}",
    "/^w00[0-9]7$/",
    "w004* OR w0007",
    "w0007 AND w004*",
    "w0007 NOT w004*",
    "w0042^2.5 OR w004*",
    "(w004* AND w0007) OR w0011",
]


@pytest.fixture(scope="module")
def mt_pair(tmp_path_factory, spark):
    corpus = make_pages(250)
    d = str(tmp_path_factory.mktemp("mt_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=3, analyzer=ENGLISH))
    return (
        Searcher(spark, d),
        OracleIndex.build(corpus, num_segments=3, analyzer=ENGLISH),
        d,
    )


@pytest.mark.parametrize("query", MT_QUERIES)
def test_mt_engine_matches_oracle(mt_pair, query):
    searcher, oracle, _ = mt_pair
    q = parse(query, ENGLISH)
    expected = oracle.top_k(q, k=400)  # k >= corpus: FULL match set
    got = searcher.search(query, k=400).collect()
    assert len(got) == len(expected), query
    for row, (ed, es, eu) in zip(got, expected):
        assert row["doc_id"] == ed and row["url"] == eu, query
        assert np.float32(row["score"]) == np.float32(es), query
    assert searcher.count(query) == len(expected)


@pytest.mark.parametrize("query", ["w004*", "w0042~1", "w0007 AND w004*"])
def test_mt_serving_plane_parity(mt_pair, query):
    searcher, oracle, d = mt_pair
    ls = LocalSearcher(d, workers=1)
    expected = oracle.top_k(parse(query, ENGLISH), k=50)
    got = ls.search(query, k=50)
    assert [(g[0], np.float32(g[1]), g[2]) for g in got] == [
        (ed, np.float32(es), eu) for ed, es, eu in expected
    ], query
    assert ls.count(query) == len(oracle.top_k(parse(query, ENGLISH), k=400))


def test_mt_constant_score_values(mt_pair):
    searcher, _, _ = mt_pair
    rows = searcher.search("w004*", k=5).collect()
    assert rows and all(r["score"] == 1.0 for r in rows)
    rows2 = searcher.search("w004*^2", k=5).collect()
    assert rows2 and all(r["score"] == 2.0 for r in rows2)


def test_scoring_rewrite(mt_pair):
    """SCORING_BOOLEAN_REWRITE: MTQ leaves become BM25-scored SHOULD
    term clauses; the rewritten tree searches identically to the
    manually-expanded boolean; TopTermsRewrite cap keeps highest-df."""
    searcher, oracle, d = mt_pair
    rq = searcher.scoring_rewrite("w004* OR w0007")
    assert not ast.multi_term_leaves(rq)
    expansion = searcher.expand_terms("prefix", "w004")
    assert expansion  # corpus has w004x terms
    manual = ast.BooleanQuery(
        should=tuple(ast.TermQuery(t) for t in expansion)
        + (ast.TermQuery("w0007"),),
        min_should_match=1,
    )
    got = searcher.search(rq, k=20).collect()
    want = searcher.search(manual, k=20).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    # rewritten matches are BM25-scored (not the constant 1.0)
    assert any(r["score"] not in (1.0, 2.0) for r in got)
    # TopTermsRewrite cap: highest-docFreq terms kept, both planes agree
    capped = searcher.expand_terms("prefix", "w0", max_expansions=3)
    assert len(capped) == 3
    ls = LocalSearcher(d, workers=1)
    assert ls.expand_terms("prefix", "w0", max_expansions=3) == capped
    assert ls.expand_terms("prefix", "w004") == expansion
    assert ls.scoring_rewrite("w004* OR w0007") == rq


# ------------------------------------- pruned kernel (WAND _DocsLeaf)


def _T(t):
    return ast.TermQuery(t)


def _MT(mode, *args, field=""):
    return ast.MultiTermQuery(mode, tuple(args), field)


def _mt_trees():
    B = ast.BooleanQuery
    return [
        B(should=(_T("w0000"), _MT("prefix", "w004")), min_should_match=1),
        B(must=(_T("w0000"),), should=(_MT("prefix", "w004"),)),
        B(must=(_T("w0000"), _MT("range", "w0040", "w0049", True, True))),
        B(must=(_T("w0000"),), must_not=(_MT("prefix", "w004"),)),
        B(
            should=(
                ast.BoostQuery(_MT("wildcard", "w00?2"), 2.0),
                _T("w0007"),
            ),
            min_should_match=1,
        ),
        B(
            should=(_T("w0000"), _MT("fuzzy", "w0042", 1), _T("w0011")),
            min_should_match=2,
        ),
    ]


@pytest.fixture(scope="module")
def li_pair():
    from lucene_spark.search.local import LocalIndex

    corpus = make_pages(400)
    return (
        LocalIndex.build(corpus, num_segments=4, analyzer=ENGLISH),
        OracleIndex.build(corpus, num_segments=4, analyzer=ENGLISH),
    )


def test_mt_wand_path_actually_taken(li_pair):
    """Trees with MultiTermQuery clauses must take the pruned window
    kernel (the _DocsLeaf adapter), not the exhaustive fallback."""
    from lucene_spark.search import kernels
    from lucene_spark.search.scoring import build_scorers

    engine, _ = li_pair
    seg = engine.segments[0]
    for q in _mt_trees():
        qq = ast.rewrite(q)
        scorers = build_scorers(
            qq, engine.global_stats(ast.query_terms(qq)), dtype="f32"
        )
        heap = kernels._wand_topk(seg, qq, scorers, 10, 1000, "f32")
        assert heap is not None, f"fell back to exhaustive: {q}"


@pytest.mark.parametrize("dtype", ["f32", "f64"])
def test_mt_pruned_equals_exhaustive(li_pair, dtype):
    engine, _ = li_pair
    for q in _mt_trees():
        a = engine.search(q, k=10, pruned=True, dtype=dtype)
        b = engine.search(q, k=10, pruned=False, dtype=dtype)
        assert a == b, q
        # pruning forced from the first hit must stay rank-safe
        c = engine.search(q, k=10, pruned=True, dtype=dtype,
                          total_hits_threshold=1)
        assert c == b, q


def test_mt_tree_matches_python_oracle(li_pair):
    engine, oracle = li_pair
    for q in _mt_trees():
        expected = oracle.top_k(q, k=10)
        got = engine.search(q, k=10, pruned=True)
        assert len(got) == len(expected), q
        for (gd, gs, gu), (ed, es, eu) in zip(got, expected):
            assert gd == ed and gu == eu, q
            assert np.float32(gs) == np.float32(es), q


def test_mt_highlight(tmp_path_factory, spark):
    corpus = make_pages(60)
    d = str(tmp_path_factory.mktemp("mt_hl"))
    build_index(
        spark,
        spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ),
        d,
        IndexConfig(num_segments=2, analyzer=ENGLISH, stored_cols=("text",)),
    )
    ls = LocalSearcher(d, workers=1)
    hits = ls.highlight("w004*", k=5, passage_tokens=50)
    assert hits
    for _d, _s, _u, snip in hits:
        # matched tokens wrap in their ORIGINAL surface form (offsets
        # into the stored text), so compare case-insensitively
        assert snip is not None and "<b>w004" in snip.lower()
