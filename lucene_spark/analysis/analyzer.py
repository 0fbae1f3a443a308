"""Analysis chain: standard tokenizer -> lowercase -> stopwords.

Re-implements the computation of the reference chain
(``analysis/standard/StandardAnalyzer.java:85-96`` =
``StandardTokenizer`` -> ``LowerCaseFilter`` -> ``StopFilter``):

- **Tokenizer**: UAX#29 word-break over web text. The reference uses a
  generated JFlex grammar (``StandardTokenizerImpl.jflex:161-226``); we
  use a precompiled Unicode regex implementing the same word rules for
  the scripts our corpora exercise: alphanumeric runs (letters, digits,
  underscore/ExtendNumLet), medial apostrophes U+0027/U+2019 and periods
  between word chars (MidNumLetQ, WB6/WB7), medial commas between digits
  (MidNum, WB11/WB12), single-character Han/Hiragana tokens, Katakana
  runs. Consciously unsupported vs the full grammar: emoji sequences,
  regional indicators, Thai/Lao segmentation (documented limitation).
- Tokens longer than ``max_token_length`` (default 255,
  ``StandardAnalyzer.java:37``) are dropped but still increment the
  position counter (``StandardTokenizer.java:152-175``).
- **Lowercase**: per-codepoint ``Character.toLowerCase(int)`` semantics
  (``analysis/LowerCaseFilter.java:36-40``) — a 1:1 codepoint map, NOT
  Python's full ``str.lower()`` (which maps U+0130 to two codepoints).
- **Stopwords**: dropped tokens accumulate into the next token's
  position increment — i.e. survivors keep their original positions,
  leaving holes (``analysis/FilteringTokenFilter.java:49-58``). The
  33-word English list is ``EnglishAnalyzer.ENGLISH_STOP_WORDS_SET``
  (``analysis/common/.../en/EnglishAnalyzer.java:43-52``); note
  ``new StandardAnalyzer()`` defaults to an EMPTY stop set
  (``StandardAnalyzer.java:51-53``).

The batch API tokenizes many documents with a single regex pass over a
joined buffer (vectorized — no per-row Python UDF at the Spark layer).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_HAN = "一-鿿㐀-䶿豈-﫿"
_HIRA = "぀-ゟ"
_KATA = "゠-ヿㇰ-ㇿ"
# word char = \w excluding Han/Hiragana/Katakana (those get script rules)
_W = rf"(?:(?![{_HAN}{_HIRA}{_KATA}])\w)"
_TOKEN_RE = re.compile(
    rf"[{_HAN}]|[{_HIRA}]|[{_KATA}]+"
    rf"|{_W}+(?:(?:['’.]|(?<=\d),(?=\d)){_W}+)*",
    re.UNICODE,
)
# runs of only underscores are not UAX#29 words (ExtendNumLet alone)
_ONLY_UNDERSCORE = re.compile(r"_+$")

# Java Character.toLowerCase(int) divergences from 1-char Python lower():
# U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE -> 'i' (simple mapping).
_SPECIAL_LOWER = {0x130: "i"}
_lower_cache: dict[int, str] = {}


def java_lower(s: str) -> str:
    """Per-codepoint lowercase matching Java ``Character.toLowerCase(int)``."""
    if s.isascii():
        return s.lower()
    out = []
    for ch in s:
        cp = ord(ch)
        lo = _lower_cache.get(cp)
        if lo is None:
            lo = _SPECIAL_LOWER.get(cp)
            if lo is None:
                cand = ch.lower()
                lo = cand if len(cand) == 1 else ch
            _lower_cache[cp] = lo
        out.append(lo)
    return "".join(out)


@dataclass(frozen=True)
class Analyzer:
    """StandardAnalyzer-equivalent chain. ``stopwords=frozenset()`` matches
    ``new StandardAnalyzer()``; pass ``ENGLISH_STOP_WORDS`` for the classic
    33-word chain the north star prescribes."""

    stopwords: frozenset = field(default_factory=frozenset)
    max_token_length: int = 255
    lowercase: bool = True

    def tokenize_one(self, text: str) -> tuple[list[str], list[int]]:
        """(terms, positions) for one document — reference path for tests."""
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        for m in _TOKEN_RE.finditer(text):
            tok = m.group()
            if _ONLY_UNDERSCORE.fullmatch(tok):
                continue  # not a word under UAX#29; no position consumed
            if len(tok) > self.max_token_length:
                pos += 1  # dropped but still increments position
                continue
            if self.lowercase:
                tok = java_lower(tok)
            if tok not in self.stopwords:
                terms.append(tok)
                positions.append(pos)
            pos += 1
        return terms, positions

    def normalize(self, term: str) -> str:
        """Query-time normalization = lowercase only
        (StandardAnalyzer.java:98-101)."""
        return java_lower(term) if self.lowercase else term

    def tokenize_batch(
        self, texts: "list[str] | np.ndarray"
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Tokenize a batch of documents with ONE regex pass.

        Returns flat arrays ``(doc_idx int32, terms object, positions int32,
        doc_token_counts int64)`` where ``doc_token_counts[d]`` is the number
        of emitted tokens of document d (== its norm length).

        Documents are joined with U+001E (record separator, never a word
        char) so token spans cannot cross document boundaries.
        """
        texts = ["" if t is None else t for t in texts]
        ndocs = len(texts)
        joined = "\x1e".join(texts)
        # char offset where each doc starts in `joined`
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=ndocs)
        doc_starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]

        raw: list[str] = []
        starts: list[int] = []
        for m in _TOKEN_RE.finditer(joined):
            raw.append(m.group())
            starts.append(m.start())
        if not raw:
            return (
                np.empty(0, np.int32),
                np.empty(0, object),
                np.empty(0, np.int32),
                np.zeros(ndocs, np.int64),
            )
        starts_arr = np.asarray(starts, dtype=np.int64)
        doc_idx = (np.searchsorted(doc_starts, starts_arr, side="right") - 1).astype(
            np.int32
        )
        tok_lens = np.fromiter((len(t) for t in raw), dtype=np.int64, count=len(raw))
        is_word = np.fromiter(
            (not _ONLY_UNDERSCORE.fullmatch(t) for t in raw),
            dtype=bool,
            count=len(raw),
        )
        # positions: running count within each doc over word tokens
        # (doc_idx is nondecreasing because finditer is in order)
        keep_word = is_word
        word_doc = doc_idx[keep_word]
        pos_global = np.arange(word_doc.size, dtype=np.int64)
        doc_first = np.zeros(ndocs, dtype=np.int64)
        first_idx = np.searchsorted(word_doc, np.arange(ndocs))
        # tokens per doc boundaries
        counts_per_doc = np.bincount(word_doc, minlength=ndocs)
        doc_first = np.concatenate(([0], np.cumsum(counts_per_doc)))[:-1]
        positions = (pos_global - doc_first[word_doc]).astype(np.int32)

        words = [raw[i] for i in np.flatnonzero(keep_word)]
        word_lens = tok_lens[keep_word]

        # drop overlong (position already consumed), lowercase, drop stopwords
        keep = word_lens <= self.max_token_length
        if self.lowercase:
            terms_list = [java_lower(words[i]) for i in np.flatnonzero(keep)]
        else:
            terms_list = [words[i] for i in np.flatnonzero(keep)]
        out_doc = word_doc[keep]
        out_pos = positions[keep]
        if self.stopwords:
            sw = self.stopwords
            keep2 = np.fromiter(
                (t not in sw for t in terms_list), dtype=bool, count=len(terms_list)
            )
            terms_list = [t for t, k in zip(terms_list, keep2) if k]
            out_doc = out_doc[keep2]
            out_pos = out_pos[keep2]
        token_counts = np.bincount(out_doc, minlength=ndocs).astype(np.int64)
        terms_arr = np.array(terms_list, dtype=object)
        return out_doc.astype(np.int32), terms_arr, out_pos.astype(np.int32), token_counts


STANDARD = Analyzer()  # empty stop set, like `new StandardAnalyzer()`
ENGLISH = Analyzer(stopwords=ENGLISH_STOP_WORDS)
