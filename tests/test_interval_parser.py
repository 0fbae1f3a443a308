"""fn: interval-function parser syntax — the StandardQueryParser
enhancement grammar (``flexible/standard/parser/StandardSyntaxParser.jj``
IntervalFun productions; every example below is lifted from the
upstream parser test). Parsed queries must be the same AST the
programmatic API builds, and search end-to-end identically."""

import pytest

from lucene_spark.analysis.analyzer import ENGLISH, Analyzer
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search import ast
from lucene_spark.search import intervals as iv
from lucene_spark.search.parser import parse
from lucene_spark.search.searcher import Searcher
from lucene_spark.search.serve import LocalSearcher

AN = Analyzer(stopwords=frozenset())

# TestStandardQPEnhancements.java checkIntervalQueryNode inputs
REFERENCE_EXAMPLES = [
    "fn:atleast(3 FOO BAR baz)",
    "fn:maxwidth(3 fn:atleast(2 foo bar baz))",
    'fn:atleast(2 "foo" "BAR baz")',
    "fn:maxgaps(2 fn:unordered(foo BAR baz))",
    "fn:ordered(foo BAR baz)",
    "fn:unordered(foo BAR baz)",
    "fn:or(foo baz)",
    "fn:wildcard(foo*)",
    "fn:wildcard(foo* 128)",
    "fn:phrase(abc def fn:or(baz boo))",
    "fn:before(abc fn:ordered(foo bar))",
    "fn:after(abc fn:ordered(foo bar))",
    "fn:containing(big small)",
    "fn:containedBy(small big)",
    "fn:notContaining(minuend subtrahend)",
    "fn:notContainedBy(small big)",
    "fn:within(small 2 fn:ordered(big foo))",
    "fn:notWithin(small 2 fn:ordered(big foo))",
    "fn:overlapping(fn:ordered(big foo) small)",
    "fn:nonOverlapping(fn:ordered(big foo) small)",
    "fn:unorderedNoOverlaps(fn:ordered(big foo) small)",
    "fn:extend(fn:ordered(big foo) 2 5)",
    "fn:fuzzyTerm(dfe)",
    "fn:fuzzyTerm(dfe 2)",
    "fn:fuzzyTerm(dfe 2 128)",
]


def test_reference_examples_parse():
    for s in REFERENCE_EXAMPLES:
        q = parse(s, AN)
        assert isinstance(q, ast.IntervalQuery), s


def test_parse_builds_the_api_ast():
    q = parse("fn:maxgaps(2 fn:ordered(foo bar))", AN)
    assert q == ast.IntervalQuery(
        "", iv.maxgaps(2, iv.ordered(iv.term("foo"), iv.term("bar")))
    )
    q2 = parse("fn:atleast(2 foo bar baz)", AN)
    assert q2.source == iv.at_least(
        2, iv.term("foo"), iv.term("bar"), iv.term("baz")
    )
    # terms are ANALYZED (lowercased)
    assert parse("fn:ordered(FOO Bar)", AN).source == iv.ordered(
        iv.term("foo"), iv.term("bar")
    )
    # quoted multi-token text becomes a phrase source; stopword holes
    # become preceding-space extends (IntervalBuilder.analyzeTerms)
    q3 = parse('fn:phrase("gamma of delta")', ENGLISH)
    assert q3.source == iv.phrase(
        iv.term("gamma"), iv.extend(iv.term("delta"), 1, 0)
    )
    # wildcard/fuzzy map to the multi-term sources
    assert parse("fn:wildcard(foo* 64)", AN).source == iv.wildcard("foo*", 64)
    assert parse("fn:fuzzyTerm(dfe 1)", AN).source == iv.fuzzy_term("dfe", 1)


def test_parse_field_boost_and_composition():
    q = parse("title:fn:ordered(foo bar)", AN)
    assert isinstance(q, ast.IntervalQuery) and q.field == "title"
    qb = parse("fn:ordered(foo bar)^2.5", AN)
    assert isinstance(qb, ast.BoostQuery) and qb.boost == 2.5
    qc = parse("merge AND fn:maxgaps(3 fn:ordered(key order))", ENGLISH)
    assert isinstance(qc, ast.BooleanQuery)
    assert any(isinstance(c, ast.IntervalQuery) for c in qc.must)


def test_parse_errors():
    with pytest.raises(ValueError, match="unknown interval function"):
        parse("fn:bogus(a b)", AN)
    with pytest.raises(ValueError, match="expects '\\('"):
        parse("fn:ordered foo", AN)
    with pytest.raises(ValueError, match="missing '\\)'|unexpected end"):
        parse("fn:ordered(foo bar", AN)
    with pytest.raises(ValueError, match="expected a number"):
        parse("fn:maxgaps(foo bar)", AN)
    with pytest.raises(ValueError, match="at least one source"):
        parse("fn:ordered()", AN)


@pytest.fixture(scope="module")
def fn_idx(spark, tmp_path_factory):
    corpus = make_pages(150)
    d = str(tmp_path_factory.mktemp("fn_idx"))
    build_index(
        spark,
        spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ),
        d,
        IndexConfig(num_segments=3, analyzer=ENGLISH),
    )
    return spark, d


def test_fn_string_equals_api_query(fn_idx):
    spark, d = fn_idx
    s = Searcher(spark, d)
    ls = LocalSearcher(d)
    pairs = [
        (
            "fn:maxgaps(4 fn:ordered(w0007 w0042))",
            ast.IntervalQuery(
                "", iv.maxgaps(4, iv.ordered(iv.term("w0007"), iv.term("w0042")))
            ),
        ),
        (
            "fn:unordered(w0007 fn:or(w0042 w0100))",
            ast.IntervalQuery(
                "",
                iv.unordered(
                    iv.term("w0007"), iv.or_(iv.term("w0042"), iv.term("w0100"))
                ),
            ),
        ),
        (
            "fn:atleast(2 w0007 w0042 w0100)",
            ast.IntervalQuery(
                "",
                iv.at_least(
                    2, iv.term("w0007"), iv.term("w0042"), iv.term("w0100")
                ),
            ),
        ),
    ]
    for text, api in pairs:
        a = [(r["doc_id"], r["score"]) for r in s.search(text, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in s.search(api, k=10).collect()]
        c = [(doc, sc) for doc, sc, _ in ls.search(text, k=10)]
        assert a == b == c and a, text


def test_fn_strings_through_batched_executor(fn_idx):
    """fn: strings ride the batched direct executor (search_many)
    bit-identically to per-query search."""
    spark, d = fn_idx
    s = Searcher(spark, d)
    qs = [
        "w0042",
        "fn:maxgaps(4 fn:ordered(w0007 w0042))",
        "fn:unordered(w0007 fn:or(w0042 w0100))",
    ]
    batch = s.search_many(qs, k=8).collect()
    for i, q in enumerate(qs):
        single = [(r["doc_id"], r["score"]) for r in s.search(q, k=8).collect()]
        got = sorted(
            [(r["doc_id"], r["score"]) for r in batch if str(r["query_id"]) == str(i)],
            key=lambda x: (-x[1], x[0]),
        )
        assert single == got and single, q
