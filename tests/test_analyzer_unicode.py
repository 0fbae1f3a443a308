"""Tokenizer goldens for the round-2 Unicode surface: emoji sequences,
South-East-Asian runs, and WB4 format-char extension.

Cases transcribe the reference's
``core/src/test/.../standard/TestStandardAnalyzer.java`` (testThai,
testLao, testEmoji*, testEmojiTokenization) plus the full generated
Unicode 12.1 corpus
``test-framework/.../standard/EmojiTokenizationTestUnicode_12_1.java``
(= unicode.org emoji-test.txt 12.1: every qualified sequence must
tokenize as exactly one token equal to itself), parsed from the
reference tree when present.
"""

from __future__ import annotations

import os
import re

import pytest

from lucene_spark.analysis.analyzer import _TOKEN_RE, Analyzer

A = Analyzer(lowercase=False)  # pure tokenizer behavior


def toks(text):
    return A.tokenize_one(text)[0]


def test_no_capturing_groups():
    # _doc_tokens uses findall(), which returns groups if any exist
    assert _TOKEN_RE.groups == 0


def test_thai():
    assert toks("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔") == [
        "การที่ได้ต้องแสดงว่างานดี",
        "แล้วเธอจะไปไหน",
        "๑๒๓๔",
    ]


def test_lao():
    assert toks("ສາທາລະນະລັດ ປະຊາທິປະໄຕ ປະຊາຊົນລາວ") == [
        "ສາທາລະນະລັດ",
        "ປະຊາທິປະໄຕ",
        "ປະຊາຊົນລາວ",
    ]


def test_simple_emoji():
    assert toks("💩 💩💩") == ["💩", "💩", "💩"]


def test_emoji_zwj_sequence():
    assert toks("👩‍❤️‍👩") == ["👩‍❤️‍👩"]


def test_emoji_zwj_with_modifier():
    assert toks("👨🏼‍⚕️") == ["👨🏼‍⚕️"]


def test_regional_indicator_pairs():
    assert toks("🇺🇸🇺🇸") == ["🇺🇸", "🇺🇸"]


def test_keycap_variation_sequences():
    assert toks("#️⃣") == ["#️⃣"]
    assert toks("3️⃣") == ["3️⃣"]
    # text presentation: bare '#' + FE0E is no token at all; digit+FE0E
    # is a NUMERIC token including the selector (FE0E is WB:Extend)
    assert toks("#︎") == []
    assert toks("3︎") == ["3︎"]
    # FE0E terminates an emoji token (excluded from its extend set)
    assert toks("⭕︎") == ["⭕"]
    assert toks("⭕︎‍⭕︎") == ["⭕", "‍⭕"]


def test_emoji_tag_sequence():
    assert toks("🏴󠁧󠁢󠁥󠁮󠁧󠁿") == ["🏴󠁧󠁢󠁥󠁮󠁧󠁿"]


def test_emoji_around_words():
    assert toks("poo💩poo") == ["poo", "💩", "poo"]
    assert toks("💩中國💩") == ["💩", "中", "國", "💩"]


def test_format_chars_extend_words():
    # ZWNJ (Persian compounds), ZWJ, and soft hyphen stay inside tokens
    assert toks("می‌خواهم") == ["می‌خواهم"]
    assert toks("ab‍cd") == ["ab‍cd"]
    assert toks("co­operate") == ["co­operate"]


_REF = (
    "/root/reference/lucene/test-framework/src/java/org/apache/lucene/"
    "tests/analysis/standard/EmojiTokenizationTestUnicode_12_1.java"
)


def _decode_java(s: str) -> str:
    out = re.sub(r"\\u([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), s)
    return (
        out.encode("utf-16", "surrogatepass")
        .decode("utf-16")
        if any(0xD800 <= ord(c) < 0xE000 for c in out)
        else out
    )


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference tree absent")
def test_unicode_12_1_emoji_corpus():
    """Every emoji-test.txt sequence is exactly one token equal to
    itself (the reference's EmojiTokenizationTestUnicode_12_1.test)."""
    src = open(_REF, encoding="utf-8").read()
    body = src[src.index("TESTS =") :]
    lits = [
        _decode_java(m.group(1))
        for m in re.finditer(r'"((?:[^"\\]|\\.)*)"', body)
    ]
    pairs = list(zip(lits[::2], lits[1::2]))
    assert len(pairs) > 3000
    bad = []
    for comment, seq in pairs:
        got = toks(seq)
        if got != [seq]:
            bad.append((comment.split("#")[-1].strip(), seq, got))
    assert not bad, (len(bad), bad[:15])


_WBREF = (
    "/root/reference/lucene/test-framework/src/java/org/apache/lucene/"
    "tests/analysis/standard/WordBreakTestUnicode_12_1_0.java"
)


def _decode_java_full(s: str) -> str:
    s = _decode_java(s)
    return (
        s.replace("\\r", "\r")
        .replace("\\n", "\n")
        .replace("\\t", "\t")
        .replace('\\"', '"')
        .replace("\\\\", "\\")
    )


@pytest.mark.skipif(not os.path.exists(_WBREF), reason="reference tree absent")
def test_uax29_wordbreak_corpus():
    """The official UAX#29 WordBreakTest.txt corpus, via the reference's
    generated expectations (WordBreakTestUnicode_12_1_0.java: each input
    lists the exact tokens a conforming tokenizer must emit)."""
    src = open(_WBREF, encoding="utf-8").read()
    cases = re.findall(
        r'assertAnalyzesTo\(analyzer,\s*"((?:[^"\\]|\\.)*)",'
        r"\s*new String\[\] \{([^}]*)\}\);",
        src,
    )
    assert len(cases) > 1500
    bad = []
    for inp, exp in cases:
        text = _decode_java_full(inp)
        expected = [
            _decode_java_full(m.group(1))
            for m in re.finditer(r'"((?:[^"\\]|\\.)*)"', exp)
        ]
        got = toks(text)
        if got != expected:
            bad.append((ascii(text), expected, got))
    assert not bad, (len(bad), bad[:20])


def test_emoji_and_sea_terms_end_to_end():
    """Emoji and SEA tokens flow through the index + query path: index
    docs containing emoji sequences and Thai runs, query them as terms
    and phrases through the same parser/kernels the Spark Searcher
    uses (LocalIndex = same invert + scorers, no Spark overhead)."""
    from lucene_spark.analysis.analyzer import Analyzer as An
    from lucene_spark.search.local import LocalIndex

    rows = [
        {"url": "u1", "text": "happy 💩 day"},
        {"url": "u2", "text": "sad day no emoji"},
        {"url": "u3", "text": "👩‍❤️‍👩 couple photo"},
        {"url": "u4", "text": "การที่ได้ต้อง segmentation test"},
        {"url": "u5", "text": "💩 💩 double poo"},
    ]
    idx = LocalIndex.build(rows, num_segments=2, analyzer=An())
    hits = idx.search("💩", k=10)
    assert {h[2] for h in hits} == {"u1", "u5"}
    assert hits[0][2] == "u5"  # tf=2 ranks first
    assert {h[2] for h in idx.search("👩‍❤️‍👩", k=10)} == {"u3"}
    assert {h[2] for h in idx.search("การที่ได้ต้อง", k=10)} == {"u4"}
    assert {h[2] for h in idx.search('"happy 💩"', k=10)} == {"u1"}
    assert idx.search('"💩 day"', k=10)[0][2] == "u1"
