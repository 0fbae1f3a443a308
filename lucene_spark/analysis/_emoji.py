"""Emoji character-class tables + the TR51 ``emoji_sequence`` regex.

Implements the computation of the reference tokenizer's EMOJI rule
(``analysis/standard/StandardTokenizerImpl.jflex:58-76,161-226``): one
token per Unicode TR51 emoji_sequence —

    emoji_core_or_mod := ( ZWJ* ExtPict ExtZ* FE0F? )
                       | ( ( ZWJ* ModifierBase ExtZ* )? Modifier ExtZ* )
    emoji_sequence    := emoji_core_or_mod
                           ( ( ZWJ emoji_core_or_mod )+ | TagSpec+ TagTerm )?
                       | KeyCapBase ExtZ* FE0F? KeyCap ExtZ*
                       | RI ExtZ* RI ExtZ*

where ``ExtZ`` is WB4's Extend|Format|ZWJ set MINUS the presentation
selectors FE0E/FE0F (the grammar's ``ExtFmtZwjSansPresSel`` — FE0F is
consumed only by the explicit ``FE0F?`` slots, FE0E never, so a
text-presentation selector terminates the emoji token, jflex:50-56).

The reference's EmojiChar is ``Extended_Pictographic | (Emoji minus
RI/keycap-bases/modifiers/©®™〰〽)``; since every member of the second
set is also Extended_Pictographic in Unicode 12, EmojiChar reduces to
the Extended_Pictographic class below.

Ordered-alternation note: Python ``re`` picks the FIRST matching
alternative, not the longest like JFlex's DFA, so the modifier-sequence
branch precedes the bare-pictographic branch (else "👨🏼" would stop
after "👨"), and callers place the emoji branch before NUMERIC (keycap
"3️⃣" vs number "3"; JFlex resolves the tie by rule order too).

Range tables transcribe the public Unicode 12.1 ``emoji-data.txt``
property assignments (Extended_Pictographic deliberately spans reserved
codepoints in the emoji blocks for forward compatibility). Validated
against the reference's generated golden corpus
(``test-framework/.../EmojiTokenizationTestUnicode_12_1.java`` =
unicode.org emoji-test.txt 12.1) in tests/test_analyzer_unicode.py.
"""

from __future__ import annotations

# Extended_Pictographic, Unicode 12.1 emoji-data.txt
EXT_PICT = (
    "©®‼⁉™ℹ↔-↙↩-↪"
    "⌚-⌛⌨⎈⏏⏩-⏳⏸-⏺Ⓜ"
    "▪-▫▶◀◻-◾☀-★☇-☒"
    "☔-⚅⚐-✅✈-✒✔✖✝✡"
    "✨✳-✴❄❇❌❎❓-❕❗"
    "❣-❧➕-➗➡➰➿⤴-⤵"
    "⬅-⬇⬛-⬜⭐⭕〰〽㊗㊙"
    "\U0001f000-\U0001f0ff\U0001f10d-\U0001f10f\U0001f12f"
    "\U0001f16c-\U0001f171\U0001f17e-\U0001f17f\U0001f18e"
    "\U0001f191-\U0001f19a\U0001f1ad-\U0001f1e5\U0001f201-\U0001f20f"
    "\U0001f21a\U0001f22f\U0001f232-\U0001f23a\U0001f23c-\U0001f23f"
    "\U0001f249-\U0001f3fa\U0001f400-\U0001f53d\U0001f546-\U0001f64f"
    "\U0001f680-\U0001f6ff\U0001f774-\U0001f77f\U0001f7d5-\U0001f7ff"
    "\U0001f80c-\U0001f80f\U0001f848-\U0001f84f\U0001f85a-\U0001f85f"
    "\U0001f888-\U0001f88f\U0001f8ae-\U0001f8ff\U0001f90c-\U0001f93a"
    "\U0001f93c-\U0001f945\U0001f947-\U0001fffd"
)

# Emoji_Modifier_Base, Unicode 12.1 emoji-data.txt
MODIFIER_BASE = (
    "☝⛹✊-✍\U0001f385\U0001f3c2-\U0001f3c4\U0001f3c7"
    "\U0001f3ca-\U0001f3cc\U0001f442-\U0001f443\U0001f446-\U0001f450"
    "\U0001f466-\U0001f478\U0001f47c\U0001f481-\U0001f483"
    "\U0001f485-\U0001f487\U0001f48f\U0001f491\U0001f4aa"
    "\U0001f574-\U0001f575\U0001f57a\U0001f590\U0001f595-\U0001f596"
    "\U0001f645-\U0001f647\U0001f64b-\U0001f64f\U0001f6a3"
    "\U0001f6b4-\U0001f6b6\U0001f6c0\U0001f6cc\U0001f90f"
    "\U0001f918-\U0001f91f\U0001f926\U0001f930-\U0001f939"
    "\U0001f93d-\U0001f93e\U0001f9b5-\U0001f9b6\U0001f9b8-\U0001f9b9"
    "\U0001f9bb\U0001f9cd-\U0001f9dd"
)

MODIFIER = "\U0001f3fb-\U0001f3ff"  # Fitzpatrick skin tones
REGIONAL_INDICATOR = "\U0001f1e6-\U0001f1ff"
_ZWJ = "‍"

# ExtFmtZwjSansPresSel: Extend(≈Mn/Mc/Me incl. VS1-14, 20E3, tag chars)
# + Format(common Cf) + ZWJ, minus FE0E/FE0F. Built from the same mark
# table the word rules use, plus Cf format chars and the plane-14 tags.
from lucene_spark.analysis._marks import MARKS as _MARKS  # noqa: E402

_FORMAT_CF = (
    "­‌‎-‏‪-‮⁠-⁤⁦-⁯"
    "﻿\U000e0001\U000e0020-\U000e007f"
)
# marks minus the FE00-FE0F variation-selector run, re-adding FE00-FE0D
_MARKS_SANS_PRESSEL = _MARKS.replace("︀-️", "︀-︍")
EXTZ = f"{_MARKS_SANS_PRESSEL}{_FORMAT_CF}{_ZWJ}"

# Inside a core, the greedy extend run must NOT swallow the ZWJ that
# connects to the next core: Python's first-success alternation would
# then end the sequence two chars early ("👩‍❤️‍👩" → "👩‍")
# because the optional continuation succeeds empty without backtracking
# into the extend run. JFlex's longest-match DFA has no such trap; we
# route every ZWJ through the explicit leading/connector positions
# instead (a trailing dangling ZWJ is skipped rather than kept in the
# token text — the one divergence, invisible to the golden corpus).
_X = f"[{_MARKS_SANS_PRESSEL}{_FORMAT_CF}]*"
_CORE_OR_MOD = (
    f"(?:{_ZWJ}*(?:[{MODIFIER_BASE}]{_X})?[{MODIFIER}]{_X}"
    f"|{_ZWJ}*[{EXT_PICT}]{_X}️?)"
)
_TAG = "[\U000e0020-\U000e007e]+\U000e007f"

# The full emoji_sequence alternation, parenthesised for embedding as
# one branch of the tokenizer's master regex.
# trailing (?:ZWJ ext*)* : a dangling ZWJ not followed by another core
# stays inside the token (jflex ExtZ* includes ZWJ); connector ZWJs are
# consumed by the (ZWJ core)+ branch first, so this only sees terminal
# ones (WordBreakTest golden "⌚‍" -> one token).
EMOJI_SEQ = (
    f"(?:{_CORE_OR_MOD}(?:(?:{_ZWJ}{_CORE_OR_MOD})+|{_TAG})?(?:{_ZWJ}{_X})*"
    f"|[0-9#*]{_X}️?⃣{_X}"
    f"|[{REGIONAL_INDICATOR}]{_X}[{REGIONAL_INDICATOR}]{_X})"
)
