"""South-East-Asian "Complex_Context" character class.

The reference keeps runs of ``\\p{Line_Break=Complex_Context}`` (SA)
characters together as single ``<SOUTHEAST_ASIAN>`` tokens — Thai, Lao,
Myanmar, Khmer, and the Tai scripts need dictionary segmentation that
UAX#29 deliberately leaves out, so the whole run is one token
(``analysis/standard/StandardTokenizerImpl.jflex:100,255-274``; Unicode
TR14 §SA).

TR14 assigns SA to the *letters, medials, vowel signs, and tone marks*
of those script blocks; their digits are LB=NU (so Thai ๑๒๓๔ stays a
separate NUMERIC token, per the reference's testThai golden) and their
punctuation/currency signs break tokens. unicodedata exposes no
Line_Break property, so the class is derived at import as
{SEA script blocks} ∩ {categories Lo, Lm, Mn, Mc} — exactly the
letters-plus-marks subset TR14 marks SA (digits are Nd, ฿/៛ are Sc,
danda-like signs are Po, all correctly excluded by category).
"""

from __future__ import annotations

import sys
import unicodedata

_SEA_BLOCKS = (
    (0x0E00, 0x0E7F),  # Thai
    (0x0E80, 0x0EFF),  # Lao
    (0x1000, 0x109F),  # Myanmar
    (0x1780, 0x17FF),  # Khmer
    (0x1950, 0x197F),  # Tai Le
    (0x1980, 0x19DF),  # New Tai Lue
    (0x19E0, 0x19FF),  # Khmer Symbols
    (0x1A20, 0x1AAF),  # Tai Tham
    (0xA9E0, 0xA9FF),  # Myanmar Extended-B
    (0xAA60, 0xAA7F),  # Myanmar Extended-A
    (0xAA80, 0xAADF),  # Tai Viet
)
_SEA_CATS = {"Lo", "Lm", "Mn", "Mc"}


def _build() -> str:
    ranges: list = []
    for lo, hi in _SEA_BLOCKS:
        start = prev = None
        for cp in range(lo, hi + 1):
            if unicodedata.category(chr(cp)) in _SEA_CATS:
                if start is None:
                    start = cp
                prev = cp
            elif start is not None:
                ranges.append((start, prev))
                start = None
        if start is not None:
            ranges.append((start, prev))
    out = []
    for a, b in ranges:
        out.append(chr(a) if a == b else f"{chr(a)}-{chr(b)}")
    return "".join(out)


SEA = _build()
del sys, _build
