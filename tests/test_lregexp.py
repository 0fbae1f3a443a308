"""Lucene RegExp dialect (lucene_spark.search.lregexp).

Goldens re-derived from the reference's own test corpus:
``core/src/test/org/apache/lucene/search/TestRegexpQuery.java`` indexes
one doc whose terms are the whitespace tokens of
"the quick brown fox jumps over the lazy ??? dog 493432 49344 [foo]
12.3 \\ ς" and asserts hit counts per pattern — reproduced here as
does-any-term-match over the same vocabulary (single doc: count 1 iff
some term matches)."""

import pytest

from lucene_spark.search import multiterm
from lucene_spark.search.lregexp import (
    ALL,
    DEPRECATED_COMPLEMENT,
    NONE,
    literal_prefix,
    lucene_regexp_matcher,
)

# the TestRegexpQuery.java:50-54 document, whitespace-tokenized
VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "???",
    "dog", "493432", "49344", "[foo]", "12.3", "\\", "ς",
]


def hits(pattern, flags=ALL):
    m = lucene_regexp_matcher(pattern, flags)
    return 1 if any(m(t) for t in VOCAB) else 0


def test_reference_goldens():
    # TestRegexpQuery.java:91-132 (hit counts on the single doc)
    assert hits("q.[aeiou]c.*") == 1
    assert hits(".[aeiou]c.*") == 0
    assert hits("q.[aeiou]c") == 0
    assert hits("<420000-600000>") == 1
    assert hits("<493433-600000>") == 0
    assert hits("\\d") == 0
    assert hits("\\d*") == 1
    assert hits("\\d{6}") == 1
    assert hits("[a\\d]{6}") == 1
    assert hits("\\d{2,7}") == 1
    assert hits("\\d{4}") == 0
    assert hits("\\dog") == 0
    assert hits("493\\d32") == 1
    assert hits("\\wox") == 1
    assert hits("493\\w32") == 1
    assert hits("\\?\\?\\?") == 1
    assert hits("\\?\\W\\?") == 1
    assert hits("\\?\\S\\?") == 1
    assert hits("\\[foo\\]") == 1
    assert hits("\\[\\w{3}\\]") == 1
    assert hits("\\S*ck") == 1
    assert hits("[\\d\\.]{3,10}") == 1
    assert hits("\\d{1,3}(\\.(\\d{1,2}))+") == 1
    assert hits("\\\\") == 1
    assert hits("\\\\.*") == 1
    assert hits("4934[314]") == 1  # TestRegexpQuery.java:184
    assert hits("[^a-z]") == 1     # :151 (??? / numbers / backslash)
    assert hits("[^03ad]") == 1    # :152
    with pytest.raises(ValueError):
        hits("\\p")                # :138 invalid escape


def test_operators_and_flags():
    m = lucene_regexp_matcher("ab|cd")
    assert m("ab") and m("cd") and not m("abcd")
    m = lucene_regexp_matcher("f.*&.*x")   # intersection
    assert m("fox") and not m("foo")
    m = lucene_regexp_matcher("~(ab)", ALL | DEPRECATED_COMPLEMENT)
    assert not m("ab") and m("") and m("abc")
    m = lucene_regexp_matcher("a&b", NONE)  # & literal when disabled
    assert m("a&b")
    m = lucene_regexp_matcher("a@")
    assert m("a") and m("aXYZ") and not m("b")
    m = lucene_regexp_matcher("#|x")  # empty language arm
    assert m("x") and not m("")
    # anchored (RegexpQuery contract), unlike the host-dialect mode
    assert not lucene_regexp_matcher("ui")("quick")
    with pytest.raises(ValueError, match="not found"):
        lucene_regexp_matcher("<mysuffixes>")("x")  # no provider bound


def test_decimal_interval_semantics():
    # Automata.makeDecimalInterval: equal digit counts -> fixed width;
    # unequal -> any leading zeros before a width-of-max form
    m = lucene_regexp_matcher("<5-17>")
    assert m("05") and m("17") and m("005") and m("09")
    assert not m("5") and not m("18") and not m("170")
    m = lucene_regexp_matcher("<10-25>")  # equal widths: exactly 2
    assert m("10") and m("25") and not m("010") and not m("9")


def test_literal_prefix_screen():
    assert literal_prefix("merge") == "merge"
    assert literal_prefix("mer.*") == "mer"
    assert literal_prefix("me?rge") == "m"
    assert literal_prefix("ab|cd") == ""  # union invalidates any prefix
    assert literal_prefix("[mn]x") == ""
    assert literal_prefix("m{1,2}x") == ""
    # screen is a superset of the matcher for a random pattern set
    pats = ["mer.*", "ab|cd", "q.[aeiou]c.*", "493\\d32", "f.*&.*x"]
    for p in pats:
        pre = literal_prefix(p)
        m = lucene_regexp_matcher(p)
        for t in VOCAB + ["merge", "mercury"]:
            if m(t):
                assert t.startswith(pre), (p, t, pre)


def test_matcher_mode_wiring():
    pred = multiterm.term_key_matcher("lregexp", ("49\\d*",), "")
    assert pred("493432") and pred("49344") and not pred("12.3")
    # fielded scoping
    predf = multiterm.term_key_matcher("lregexp", ("49\\d*",), "title")
    assert predf("title\x1f49344") and not predf("49344")


def test_hypothesis_common_subset_vs_host_re():
    """On the dialect intersection (literals, ., classes, |, ?, *, +,
    {n,m}, parens — no & ~ < > # @ " and no predefined escapes), the
    automaton must agree with Python re.fullmatch."""
    import re as host_re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    atom = st.one_of(
        st.sampled_from(list("abcde")),
        st.just("."),
        st.sampled_from(["[ab]", "[^ab]", "[a-c]", "[b-e]"]),
    )

    @st.composite
    def pattern(draw, depth=0):
        if depth > 2:
            return draw(atom)
        kind = draw(st.integers(0, 5))
        if kind <= 1:
            return draw(atom)
        if kind == 2:
            return draw(pattern(depth + 1)) + draw(pattern(depth + 1))
        if kind == 3:
            return f"({draw(pattern(depth + 1))})" + draw(
                st.sampled_from(["?", "*", "+", "{2}", "{1,2}", "{0,3}"])
            )
        if kind == 4:
            return (
                f"({draw(pattern(depth + 1))}|{draw(pattern(depth + 1))})"
            )
        return f"({draw(pattern(depth + 1))})"

    @settings(max_examples=300, deadline=None)
    @given(
        pat=pattern(),
        s=st.text(alphabet="abcdef", max_size=6),
    )
    def run(pat, s):
        want = host_re.fullmatch(pat, s) is not None
        got = lucene_regexp_matcher(pat)(s)
        assert got == want, (pat, s, got, want)

    run()


def test_serving_plane_parity():
    """lregexp expansion through LocalSearcher must equal the Spark-free
    kernel path's matcher on the same index (one matcher source)."""
    from lucene_spark.analysis.analyzer import ENGLISH
    from lucene_spark.fixtures import make_pages
    from lucene_spark.search.local import LocalIndex

    engine = LocalIndex.build(make_pages(120), num_segments=2, analyzer=ENGLISH)
    q_ast = __import__(
        "lucene_spark.search.ast", fromlist=["MultiTermQuery"]
    ).MultiTermQuery("lregexp", ("w00.*&.*2",), "")
    docs = engine.search(q_ast, k=1000, pruned=False)
    pred = multiterm.term_key_matcher("lregexp", ("w00.*&.*2",), "")
    assert docs, "expected matches on the w-vocab corpus"
    assert pred("w0042") and not pred("w0043") and not pred("x0042")


def test_named_automaton_provider():
    """<identifier> resolves through the provider hook
    (RegExp.toAutomaton(AutomatonProvider), RegExp.java:737-752):
    dict of sub-patterns or prebuilt automata, or a callable; a miss
    raises 'name' not found like the reference."""
    import pytest

    from lucene_spark.search.lregexp import (
        ALL,
        compile_lucene_regexp,
        lucene_regexp_matcher,
    )

    m = lucene_regexp_matcher("<vowel>+", automata={"vowel": "[aeiou]"})
    assert m("aei") and m("a") and not m("ab") and not m("")
    # prebuilt Auto values work too
    vowel = compile_lucene_regexp("[aeiou]")
    m2 = lucene_regexp_matcher("x<vowel>y", automata={"vowel": vowel})
    assert m2("xay") and not m2("xby")
    # callable provider
    m3 = lucene_regexp_matcher(
        "<digits>", automata=lambda n: "[0-9]+" if n == "digits" else None
    )
    assert m3("123") and not m3("12a")
    # composition with the rest of the grammar (& intersection)
    m4 = lucene_regexp_matcher(
        "<word>&.*z.*", automata={"word": "[a-z]+"}
    )
    assert m4("baz") and not m4("bar") and not m4("z9")
    # a miss raises the reference's message
    with pytest.raises(ValueError, match="'nope' not found"):
        compile_lucene_regexp("<nope>", automata={})
    with pytest.raises(ValueError, match="not found"):
        compile_lucene_regexp("<nope>")


def test_named_automaton_query_surface():
    """args = (pattern, flags, ((name, sub_pattern), ...)) through the
    one matcher source used by every plane."""
    from lucene_spark.search.lregexp import ALL

    pred = multiterm.term_key_matcher(
        "lregexp", ("w<d><d><d><d>", ALL, (("d", "[0-9]"),)), ""
    )
    assert pred("w0042") and not pred("w004x") and not pred("v0042")
