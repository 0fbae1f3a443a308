"""Multi-field documents (round-2): per-field postings/norms/stats
(``index/FieldInfos.java`` accretion, ``document/TextField.java:30-41``),
``field:term`` query syntax, per-field BM25 collection statistics
(docCount / sumTotalTermFreq per field — ``index/Terms.java``
getDocCount/getSumTotalTermFreq), cross-field boolean scoring.

Engine (LocalIndex, same kernels as Spark) vs the independent Python
oracle, bit-exact float32."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import ast
from lucene_spark.search.local import LocalIndex
from lucene_spark.search.parser import parse

N_DOCS = 500
FIELDS = (("", "text"), ("title", "title"))


def _with_title(rows):
    """title = first 8 whitespace words of text (deterministic derived
    field — the two-field corpus of the driver gate)."""
    out = []
    for r in rows:
        r = dict(r)
        r["title"] = " ".join((r["text"] or "").split(" ")[:8])
        out.append(r)
    return out


@pytest.fixture(scope="module")
def corpus():
    return _with_title(make_pages(N_DOCS))


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(corpus, num_segments=3, analyzer=ENGLISH, fields=FIELDS)


@pytest.fixture(scope="module")
def engine(corpus):
    return LocalIndex.build(corpus, num_segments=3, analyzer=ENGLISH, fields=FIELDS)


def T(t, f=""):
    return ast.TermQuery(ast.fielded(f, t))


def _match(engine, oracle, q, k=10):
    expected = oracle.top_k(q, k=k)
    got = engine.search(q, k=k, pruned=True)
    assert len(got) == len(expected), (q, got, expected)
    for (gd, gs, gu), (ed, es, eu) in zip(got, expected):
        assert gd == ed and gu == eu, (q, got, expected)
        assert np.float32(gs) == np.float32(es), (q, gs, es)
    return got


def test_field_stats_isolated(engine, oracle):
    """A term's docFreq and the collection stats differ per field."""
    t_body, t_title = ast.fielded("", "w0000"), ast.fielded("title", "w0000")
    df_body = oracle.doc_freq(t_body)
    df_title = oracle.doc_freq(t_title)
    assert df_title < df_body  # titles are 8-word prefixes
    st = engine.global_stats({t_body, t_title})
    assert st.df(t_body) == df_body and st.df(t_title) == df_title
    # per-field collection stats present and distinct
    bdc, bstf = st.collection("")
    tdc, tstf = st.collection("title")
    assert tstf < bstf
    assert oracle.field_stats[""] == (bdc, bstf)
    assert oracle.field_stats["title"] == (tdc, tstf)


def test_title_term_matches_oracle(engine, oracle):
    got = _match(engine, oracle, T("w0000", "title"))
    assert got  # the top-rank term must appear in some title


def test_same_term_scores_differently_per_field(engine):
    """Same text, different field -> different idf/norms -> different
    scores (proves stats are not shared across fields)."""
    a = engine.search(T("w0000", ""), k=5)
    b = engine.search(T("w0000", "title"), k=5)
    assert a and b
    assert [s for _, s, _ in a] != [s for _, s, _ in b]


def test_cross_field_boolean(engine, oracle):
    """title:w0000 OR w0042 — clauses score with their OWN field's
    norms and stats, accumulated per the boolean contract."""
    q = ast.BooleanQuery(
        should=(T("w0000", "title"), T("w0042", "")), min_should_match=1
    )
    _match(engine, oracle, q)
    # must across fields
    q2 = ast.BooleanQuery(must=(T("w0000", "title"), T("w0000", "")))
    _match(engine, oracle, q2)


def test_fielded_phrase(engine, oracle):
    """Exact phrase inside the title field (planted 'w0007 w0042' at
    positions 0-1 of every 37th doc -> always inside the title)."""
    q = ast.PhraseQuery(
        terms=(ast.fielded("title", "w0007"), ast.fielded("title", "w0042")),
        positions=(0, 1),
    )
    got = _match(engine, oracle, q)
    assert got


def test_fielded_wand_pruned_equals_exhaustive(engine):
    shapes = [
        ast.BooleanQuery(
            should=(T("w0000", "title"), T("w0042"), T("w0007", "title")),
            min_should_match=1,
        ),
        ast.BooleanQuery(
            must=(T("w0001"),),
            should=(T("w0042", "title"),),
            must_not=(T("w0999", "title"),),
        ),
        ast.BooleanQuery(
            should=(ast.BoostQuery(T("w0000", "title"), 2.0), T("w0042")),
            min_should_match=1,
        ),
    ]
    for q in shapes:
        a = engine.search(q, k=10, pruned=True, total_hits_threshold=1)
        b = engine.search(q, k=10, pruned=False)
        assert a == b, q


def test_parser_field_syntax(engine, oracle):
    q = parse("title:w0000", ENGLISH)
    assert q == T("w0000", "title")
    _match(engine, oracle, q)
    q2 = parse("title:w0000 OR w0042", ENGLISH)
    assert isinstance(q2, ast.BooleanQuery)
    _match(engine, oracle, q2)
    q3 = parse("title:w0000^2.5", ENGLISH)
    assert q3 == ast.BoostQuery(T("w0000", "title"), 2.5)
    _match(engine, oracle, q3)


def test_single_field_unchanged(corpus):
    """fields=() keeps the exact round-1 single-field contract (legacy
    stats semantics, bare term keys)."""
    e1 = LocalIndex.build(corpus, num_segments=3, analyzer=ENGLISH)
    o1 = OracleIndex.build(corpus, num_segments=3, analyzer=ENGLISH)
    assert e1.field_stats is None and o1.field_stats is None
    _match(e1, o1, T("w0000"))


def test_field_exists_query(engine, oracle):
    """FieldExistsQuery over per-field norms: kernel + oracle agree;
    docs with empty titles (all-stopword prefixes) are excluded."""
    q = ast.FieldExistsQuery("title")
    ed, _ = oracle.score_query(q)
    got = engine.search(q, k=10**6, pruned=False)
    assert {d for d, _, _ in got} == set(int(x) for x in ed)
    assert all(s == 1.0 for _, s, _ in got)
    # boosted
    got2 = engine.search(ast.BoostQuery(q, 2.0), k=10, pruned=False)
    assert all(s == 2.0 for _, s, _ in got2)
    # nonexistent field matches nothing
    assert engine.search(ast.FieldExistsQuery("nope"), k=10) == []


def test_ngram_phrase_rewrite():
    """NGramPhraseQuery rewrite drops redundant middle grams (every
    n-th + last kept) and is match-equivalent to the full phrase on a
    gram-token corpus."""
    from lucene_spark.oracle import OracleIndex as OI

    grams = lambda s, n=2: [s[i : i + n] for i in range(len(s) - n + 1)]
    rows = [
        {"url": f"u{i}", "text": " ".join(grams(w))}
        for i, w in enumerate(
            ["spark", "sparse", "parquet", "sharks", "park", "arcs", "spar"]
        )
    ]
    eng = LocalIndex.build(rows, num_segments=2, analyzer=ENGLISH)
    orc = OI.build(rows, num_segments=2, analyzer=ENGLISH)
    target = grams("spark")  # sp pa ar rk
    q = ast.NGramPhraseQuery(n=2, terms=tuple(target))
    rq = ast.rewrite(q)
    assert isinstance(rq, ast.PhraseQuery)
    assert rq.terms == ("sp", "ar", "rk") and rq.positions == (0, 2, 3)
    full = ast.PhraseQuery(terms=tuple(target), positions=(0, 1, 2, 3))
    a = eng.search(q, k=20)
    b = eng.search(full, k=20)
    assert {d for d, _, _ in a} == {d for d, _, _ in b}
    assert {eng.url_of(d) for d, _, _ in a} == {"u0"}  # only "spark"
    exp = orc.top_k(q, k=20)
    assert [d for d, _, _ in a] == [d for d, _, _ in exp]
