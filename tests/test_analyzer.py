"""Analyzer golden tests — cases ported from the reference's
TestStandardAnalyzer / TestStopFilter behavior (SURVEY.md §5 row 1)."""

import numpy as np

from lucene_spark.analysis.analyzer import (
    Analyzer,
    ENGLISH,
    ENGLISH_STOP_WORDS,
    STANDARD,
    java_lower,
)


def check(analyzer, text, terms, positions=None):
    t, p = analyzer.tokenize_one(text)
    assert t == terms, (t, terms)
    if positions is not None:
        assert p == positions, (p, positions)


def test_alphanumeric():
    check(STANDARD, "testing 1234", ["testing", "1234"], [0, 1])
    check(STANDARD, "B2B", ["b2b"])
    check(STANDARD, "2B", ["2b"])


def test_apostrophes_and_midletters():
    check(STANDARD, "don't DON’T", ["don't", "don’t"])
    check(STANDARD, "wiki.org", ["wiki.org"])
    check(STANDARD, "3.14 1,024", ["3.14", "1,024"])
    # trailing punctuation never joins
    check(STANDARD, "end. stop,", ["end", "stop"])
    # comma between letters splits (MidNum is digits-only)
    check(STANDARD, "a,b", ["a", "b"])


def test_cjk_single_char_tokens():
    check(STANDARD, "中文", ["中", "文"], [0, 1])
    check(STANDARD, "ひらがな", ["ひ", "ら", "が", "な"])
    check(STANDARD, "カタカナ", ["カタカナ"])  # katakana run stays together
    check(STANDARD, "한국어 test", ["한국어", "test"])


def test_max_token_length_drops_but_increments_position():
    # StandardTokenizer.java:152-175 — dropped, position consumed
    long_tok = "x" * 256
    check(STANDARD, f"a {long_tok} b", ["a", "b"], [0, 2])
    keep_tok = "y" * 255
    check(STANDARD, f"a {keep_tok}", ["a", keep_tok], [0, 1])


def test_lowercase_is_codepoint_wise():
    assert java_lower("İstanbul") == "istanbul"  # Java simple mapping, 1:1
    assert java_lower("STRASSE") == "strasse"
    assert java_lower("ẞ") == "ß"
    check(STANDARD, "QUICK Brown", ["quick", "brown"])


def test_stopword_position_holes():
    # StopFilter/FilteringTokenFilter.java:49-58 — survivors keep positions
    check(
        ENGLISH,
        "The quick brown fox of the woods",
        ["quick", "brown", "fox", "woods"],
        [1, 2, 3, 6],
    )
    check(ENGLISH, "the of and", [], [])


def test_stop_set_contents():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    # `new StandardAnalyzer()` has an EMPTY stop set
    assert STANDARD.stopwords == frozenset()


def test_underscores():
    # ExtendNumLet joins; bare underscore runs are not words
    check(STANDARD, "a_b _tag_ ___", ["a_b", "_tag_"], [0, 1])


def test_batch_matches_single(corpus_texts=None):
    texts = corpus_texts or [
        "testing 1234",
        "The quick brown fox of the woods",
        "",
        "don't stop.me 3.14 中文 カタカナ",
        "x" * 300 + " after",
        "İstanbul STRASSE ___ _a_",
    ]
    for analyzer in (STANDARD, ENGLISH, Analyzer(max_token_length=5)):
        doc_idx, terms, pos, counts = analyzer.tokenize_batch(texts)
        for i, tx in enumerate(texts):
            t, p = analyzer.tokenize_one(tx)
            m = doc_idx == i
            assert list(terms[m]) == t
            assert list(pos[m]) == p
            assert counts[i] == len(t)


def test_batch_on_fixture_corpus():
    from lucene_spark.fixtures import make_pages

    texts = [r["text"] for r in make_pages(120)]
    doc_idx, terms, pos, counts = ENGLISH.tokenize_batch(texts)
    assert counts.sum() == len(terms)
    # every emitted term is lowercase and not a stopword
    assert all(t == java_lower(t) for t in terms[:500])
    assert not (set(terms) & ENGLISH_STOP_WORDS)
    # spot-check one doc against the scalar path
    t, p = ENGLISH.tokenize_one(texts[0])
    m = doc_idx == 0
    assert list(terms[m]) == t and list(pos[m]) == p


def test_extraction_contract():
    from lucene_spark.fixtures import extract_text, make_pages

    for r in make_pages(50):
        assert extract_text(r["html"]) == r["text"]  # byte-identical


def test_reference_golden_scripts():
    """Golden cases ported from the reference TestStandardAnalyzer
    (tokenizer only — no lowercase, no stopwords): Armenian with a
    digit-group comma, Greek, Bengali (vowel-sign marks), combining
    diacritics, fullwidth forms, and empty/punct-only inputs."""
    from lucene_spark.analysis.analyzer import Analyzer

    a = Analyzer(lowercase=False)

    def toks(s):
        return a.tokenize_one(s)[0]

    assert toks("Վիքիպեդիայի 13 միլիոն հոդվածները (4,600` հայերեն)") == [
        "Վիքիպեդիայի", "13", "միլիոն", "հոդվածները", "4,600", "հայերեն",
    ]
    assert toks("Γράφεται σε συνεργασία από εθελοντές") == [
        "Γράφεται", "σε", "συνεργασία", "από", "εθελοντές",
    ]
    assert toks("উইকিপিডিয়ার শুরু ১৫ জানুয়ারি, ২০০১ সালে।") == [
        "উইকিপিডিয়ার", "শুরু", "১৫", "জানুয়ারি", "২০০১", "সালে",
    ]
    assert toks("moͤchte") == ["moͤchte"]  # combining mark extends
    assert toks("我是中国人。 １２３４ Ｔｅｓｔｓ") == [
        "我", "是", "中", "国", "人", "１２３４", "Ｔｅｓｔｓ",
    ]
    assert toks("B2B") == ["B2B"] and toks("2B") == ["2B"]
    assert toks("") == [] and toks(".") == [] and toks(" ") == []
