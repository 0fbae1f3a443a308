"""Analysis chain: standard tokenizer -> lowercase -> stopwords.

Re-implements the computation of the reference chain
(``analysis/standard/StandardAnalyzer.java:85-96`` =
``StandardTokenizer`` -> ``LowerCaseFilter`` -> ``StopFilter``):

- **Tokenizer**: UAX#29 word-break over web text. The reference uses a
  generated JFlex grammar (``StandardTokenizerImpl.jflex:161-226``); we
  use a precompiled Unicode regex implementing the same rules:
  alphanumeric runs (letters, digits, underscore/ExtendNumLet), medial
  apostrophes U+0027/U+2019 and periods between word chars (MidNumLetQ,
  WB6/WB7), medial commas between digits (MidNum, WB11/WB12),
  single-character Han/Hiragana tokens, Katakana runs, TR51 emoji
  sequences (``_emoji.py``: ZWJ/modifier/keycap/flag/tag sequences, one
  token each, highest priority like the grammar's first rule),
  South-East-Asian Complex_Context runs kept whole (``_sea.py``;
  Thai/Lao/Myanmar/Khmer/Tai, jflex:255-274), and WB4 extension of
  word tokens by combining marks + format chars + ZWJ/ZWNJ (so
  Persian ZWNJ compounds and "3\\uFE0E" stay single tokens).
  Remaining divergences from the JFlex DFA: ordered-alternation
  tie-breaks where JFlex longest-match would prefer a LONGER
  NUMERIC over a keycap-emoji prefix (e.g. ``3️⃣45``), and Hebrew
  gershayim/double-quote joins (WB7b/c) — both documented, neither on
  the golden corpora.
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

_HAN = (
    "々〇〡-〩〸-〻㐀-䶿一-鿿"
    "豈-﫿\U00020000-\U0002fa1f\U00030000-\U0003134f"
)
_HIRA = "ぁ-゚ゝ-ゟ\U0001b001-\U0001b11f\U0001b150-\U0001b152"
# WB:Katakana (kana repeat marks, sound marks, halfwidth, circled,
# squared-word blocks; 30FB/FF65 middle dots are NOT Katakana)
_KATA = (
    "〱-〵゛-゜゠-ヺー-ヿㇰ-ㇿ"
    "㋐-㋾㌀-㍗ｦ-ﾟ\U0001b000"
)
from lucene_spark.analysis._emoji import EMOJI_SEQ as _EMOJI_SEQ  # noqa: E402
from lucene_spark.analysis._emoji import _FORMAT_CF  # noqa: E402
from lucene_spark.analysis._marks import MARKS as _MARKS  # noqa: E402
from lucene_spark.analysis._sea import SEA as _SEA  # noqa: E402

# ---- UAX#29 word-break classes (WordBreakProperty.txt) ----------------
# WB4 extenders: combining marks (Extend), format chars (Format), ZWJ --
# every grammar element below is "char + extender run", the jflex Ex
# convention (StandardTokenizerImpl.jflex:85-100)
_EXT = rf"{_MARKS}{_FORMAT_CF}‍"
_E = f"[{_EXT}]*"
_ENL = "_‿⁀⁔︳︴﹍-﹏＿"  # ExtendNumLet
_HEB = (  # WB:Hebrew_Letter
    "א-תׯיִײַ-ﬨשׁ-זּטּ-לּ"
    "מּנּ-סּףּ-פּצּ-ﭏ"
)
_MIDLET = ":··՟״‧︓﹕："  # MidLetter
_MIDNUMLET = ".’․﹒．"  # MidNumLet (incl. U+2019)
_MIDNUM = (  # MidNum
    ",;;։،؍٫٬߸⁄︐︔"
    "﹐﹔，；"
)
# ALetter approximation: word chars that are not digits, connectors, or
# any separately-ruled script class (Han/Hiragana/Katakana/SEA/Hebrew)
_LET = rf"(?:(?![\d{_ENL}{_HAN}{_HIRA}{_KATA}{_SEA}{_HEB}])\w)"

# ---- the WORD/NUMERIC rule (StandardTokenizerImpl.jflex:225-252) ------
# WB5-WB13b with the Hebrew quote rules: a Hebrew letter may chain
# gershayim double-quote joins (WB7b/c) and keep one trailing single
# quote (WB7a); '.'/':'-class medials need AHLetter on both sides,
# ','/';'-class medials need Numeric on both sides, ExtendNumLet runs
# bridge everything (WB13a/b). Python re is first-match, not
# longest-match like the jflex DFA, so element order inside each
# alternation is chosen to reproduce the longest parse.
_ENLx = f"(?:[{_ENL}]{_E})"
_HEB_ELEM = f'[{_HEB}]{_E}(?:"{_E}[{_HEB}]{_E})*(?:\'{_E})?'
_LETELEM = f"(?:{_HEB_ELEM}|{_LET}{_E})"
_DELEM = rf"\d{_E}(?:(?:{_ENLx}+|[{_MIDNUM}{_MIDNUMLET}']{_E})?\d{_E})*"
_LRUN = f"{_LETELEM}(?:(?:{_ENLx}+|[{_MIDLET}{_MIDNUMLET}']{_E})?{_LETELEM})*"
_CORE = f"(?:{_DELEM}|{_LRUN})+"
_KATRUN = f"[{_KATA}]{_E}(?:{_ENLx}*[{_KATA}]{_E})*"
_WORDRULE = (
    f"{_ENLx}*(?:{_KATRUN}|{_CORE})"
    f"(?:{_ENLx}+(?:{_KATRUN}|{_CORE}))*{_ENLx}*"
)

_TOKEN_RE = re.compile(
    rf"{_EMOJI_SEQ}"
    rf"|[{_HAN}]{_E}|[{_HIRA}]{_E}"
    rf"|[{_SEA}](?:[{_SEA}{_EXT}])*"
    rf"|{_WORDRULE}",
    re.UNICODE,
)
# runs of only underscores are not UAX#29 words (ExtendNumLet alone)
_ONLY_UNDERSCORE = re.compile(r"_+$")

# ASCII specialization of _TOKEN_RE (identical matches on ASCII input:
# emoji/script branches can never fire, ASCII has no extenders, and the
# classes reduce to letter [A-Za-z] / digit [0-9] / ENL '_' with
# letter-medials ['.:] and digit-medials ['.,;]). Shape chosen for the
# regex engine, not the grammar: one [0-9A-Za-z_]+ atom swallows each
# run (letters/digits/connectors join unconditionally under
# WB5/8/9/10/13a/b), and a medial extends the token only when its
# lookbehind/lookahead type-match holds — ~2.5x faster than a literal
# element-for-element transcription of _WORDRULE, fuzz-verified
# equivalent to it (tests/test_property.py). The leading lookahead
# rejects connector-only runs (not words under UAX#29).
_ASCII_TOKEN_RE = re.compile(
    r"(?=_*[0-9A-Za-z])[0-9A-Za-z_]+"
    r"(?:(?:(?<=[A-Za-z])['.:](?=[A-Za-z])|(?<=[0-9])['.,;](?=[0-9]))[0-9A-Za-z_]+)*"
)

# a doc is "simple" if its tokens are plain [0-9A-Za-z_] runs — no
# medial apostrophe/period/comma/colon/semicolon joins possible. Simple
# ASCII docs take the fully-vectorized (object-free) numpy tokenizer.
_COMPLEX_ASCII = re.compile(r"[0-9A-Za-z_]['.,:;][0-9A-Za-z_]")

_WORD_BYTE = np.zeros(256, dtype=bool)
for _c in range(256):
    _WORD_BYTE[_c] = chr(_c).isascii() and (chr(_c).isalnum() or chr(_c) == "_")

# polynomial-hash weights for the vectorized term coder (two independent
# bases; a token's key is (h1, h2, len) — collision-checked, and the
# object fallback engages on the ~2^-100 mismatch)
_M64 = (1 << 64) - 1
_POW1 = np.array(
    [pow(1099511628211, i, 1 << 64) for i in range(256)], dtype=np.uint64
)
_POW2 = np.array(
    [pow(2654435761, i, 1 << 64) for i in range(256)], dtype=np.uint64
)

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
    # opt-in: the object-free numpy tokenizer (_vector_tokens). It wins
    # on machines with healthy page-allocation throughput; on VMs where
    # first-touch page faults are slow (this sandbox: ~0.4 GB/s fault-in
    # vs 7.6 GB/s steady-state) the pymalloc-recycled object path is
    # faster, so the default stays False.
    vectorized: bool = False

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

    def tokenize_offsets(
        self, text: str
    ) -> "tuple[list[str], list[int], list[int], list[int]]":
        """(terms, positions, char_starts, char_ends) — tokenize_one
        plus the source character span of every emitted token (the
        OffsetAttribute of the reference's token stream). Used by the
        re-analysis highlighter (``uhighlight/UnifiedHighlighter.java``
        ANALYSIS offset source): positions are identical to the indexed
        stream, so query position arithmetic (phrase verification) maps
        straight onto character spans."""
        terms: list[str] = []
        positions: list[int] = []
        starts: list[int] = []
        ends: list[int] = []
        pos = 0
        for m in _TOKEN_RE.finditer(text):
            tok = m.group()
            if _ONLY_UNDERSCORE.fullmatch(tok):
                continue
            if len(tok) > self.max_token_length:
                pos += 1
                continue
            if self.lowercase:
                tok = java_lower(tok)
            if tok not in self.stopwords:
                terms.append(tok)
                positions.append(pos)
                starts.append(m.start())
                ends.append(m.end())
            pos += 1
        return terms, positions, starts, ends

    def _doc_tokens(self, text: str) -> list:
        """One document's raw lowercased word tokens (fast path: C-level
        ``findall`` on the pre-lowered ASCII text — equivalent because
        ASCII case never changes word-break classes; non-ASCII docs take
        the per-token ``java_lower`` path)."""
        if text.isascii():
            return _ASCII_TOKEN_RE.findall(text.lower() if self.lowercase else text)
        toks = _TOKEN_RE.findall(text)
        if self.lowercase:
            return [java_lower(t) for t in toks]
        return toks

    def _vector_tokens(self, texts: list):
        """Fully-vectorized tokenizer+coder for batches of simple ASCII
        docs (tokens are plain ``[0-9A-Za-z_]`` runs — no medial
        apostrophe/period/comma joins present). No per-token Python
        objects: byte-class masks find token spans, two independent
        polynomial hashes group identical tokens (collision-verified;
        the object path takes over on the astronomically-rare clash).

        Returns ``(doc_idx int32, codes int64, uniq object[],
        counts_raw int64)`` or None when inapplicable.
        """
        joined = "\x1e".join(texts)
        if not joined.isascii() or _COMPLEX_ASCII.search(joined):
            return None
        if self.lowercase:
            joined = joined.lower()
        arr = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
        ndocs = len(texts)
        isw = _WORD_BYTE[arr]
        prev = np.concatenate(([False], isw[:-1]))
        nxt = np.concatenate((isw[1:], [False]))
        starts = np.flatnonzero(isw & ~prev)
        ends = np.flatnonzero(isw & ~nxt) + 1
        ntok = int(starts.size)
        if ntok == 0:
            return (
                np.empty(0, np.int32),
                np.empty(0, np.int64),
                np.empty(0, object),
                np.zeros(ndocs, np.int64),
            )
        lens_tok = (ends - starts).astype(np.int64)
        if int(lens_tok.max()) > 256:
            # the polynomial-hash position weights are only defined for
            # the first 256 chars; beyond that two distinct tokens could
            # silently conflate — take the object path instead (such
            # tokens only survive if max_token_length was raised)
            return None
        doc_lens = np.fromiter(map(len, texts), dtype=np.int64, count=ndocs)
        doc_starts = np.concatenate(([0], np.cumsum(doc_lens + 1)))[:-1]
        doc_idx = (
            np.searchsorted(doc_starts, starts, side="right") - 1
        ).astype(np.int32)

        sel = np.flatnonzero(isw)  # all token bytes, stream order
        tok_first = np.concatenate(([0], np.cumsum(lens_tok)))[:-1]
        rel = np.minimum(
            np.arange(sel.size, dtype=np.int64) - np.repeat(tok_first, lens_tok),
            255,
        )
        vals = arr[sel].astype(np.uint64)
        h1 = np.add.reduceat(vals * _POW1[rel], tok_first)
        h2 = np.add.reduceat(vals * _POW2[rel], tok_first)
        _, first, inv = np.unique(h1, return_index=True, return_inverse=True)
        # collision check: within every h1-group, (h2, len) must agree
        if not (
            np.array_equal(h2, h2[first][inv])
            and np.array_equal(lens_tok, lens_tok[first][inv])
        ):
            return None  # 64-bit clash: fall back to the object path
        uniq = np.array(
            [joined[starts[i] : ends[i]] for i in first], dtype=object
        )
        counts_raw = np.bincount(doc_idx, minlength=ndocs).astype(np.int64)
        return doc_idx, inv.astype(np.int64), uniq, counts_raw

    def tokenize_batch_coded(
        self, texts: "list[str] | np.ndarray"
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Tokenize a batch into integer term codes (the hot path of the
        distributed segment build — object-string work is minimized
        because the inverting sort/group runs on int codes).

        Returns ``(doc_idx int32, codes int64, uniq_terms object[],
        positions int32, doc_token_counts int64)`` with ``uniq_terms``
        SORTED and codes referring to that sorted order.
        """
        import itertools

        texts = ["" if t is None else t for t in texts]
        ndocs = len(texts)
        vec = self._vector_tokens(texts) if (ndocs and self.vectorized) else None
        if vec is not None:
            doc_idx, codes, uniq, counts_raw = vec
            n = codes.size
            if n == 0:
                return (
                    np.empty(0, np.int32),
                    np.empty(0, np.int64),
                    np.empty(0, object),
                    np.empty(0, np.int32),
                    np.zeros(ndocs, np.int64),
                )
        else:
            per_doc = [self._doc_tokens(t) for t in texts]
            counts_raw = np.fromiter(map(len, per_doc), dtype=np.int64, count=ndocs)
            flat = list(itertools.chain.from_iterable(per_doc))
            n = len(flat)
            if n == 0:
                return (
                    np.empty(0, np.int32),
                    np.empty(0, np.int64),
                    np.empty(0, object),
                    np.empty(0, np.int32),
                    np.zeros(ndocs, np.int64),
                )
            doc_idx = np.repeat(np.arange(ndocs, dtype=np.int32), counts_raw)

            # one dict pass assigns provisional integer codes; ALL further
            # per-token logic (word-ness, length cap, stopwords) runs as
            # boolean lookups over the ~|vocab| unique terms, not the ~10^6
            # token stream — the object-string work is O(unique), not O(n)
            code_of: dict = {}
            setd = code_of.setdefault
            codes = np.fromiter(
                (setd(t, len(code_of)) for t in flat), dtype=np.int64, count=n
            )
            uniq = np.array(list(code_of.keys()), dtype=object)
        out = self._coded_tail(doc_idx, codes, uniq, counts_raw, ndocs)
        return out[:5]

    def _coded_tail(self, doc_idx, codes, uniq, counts_raw, ndocs,
                    starts=None, ends=None):
        """Shared tail of the coded tokenizers: per-unique-term masks
        (word-ness, length cap, stopwords), position assignment, keep
        filter, sorted code compaction.  ``starts``/``ends`` (optional
        char spans aligned with the raw token stream) are filtered with
        the same keep mask — the single-pass offsets path."""
        nu = uniq.size
        # pure-underscore runs are not UAX#29 words: no position consumed
        is_word_u = np.fromiter(
            (("_" not in t) or not _ONLY_UNDERSCORE.fullmatch(t) for t in uniq),
            dtype=bool,
            count=nu,
        )
        len_ok_u = np.fromiter(
            (len(t) <= self.max_token_length for t in uniq), dtype=bool, count=nu
        )
        if self.stopwords:
            sw = self.stopwords
            stop_u = np.fromiter((t in sw for t in uniq), dtype=bool, count=nu)
        else:
            stop_u = np.zeros(nu, dtype=bool)

        # positions: running count of WORD tokens within each doc
        # (overlong + stopword tokens consume positions; underscore runs
        # do not)
        is_word_t = is_word_u[codes]
        c = np.cumsum(is_word_t, dtype=np.int64)
        doc_first = np.concatenate(([0], np.cumsum(counts_raw)))[:-1]
        cpad = np.concatenate(([0], c))
        before_doc = cpad[doc_first]  # words strictly before each doc start
        positions = ((c - is_word_t) - before_doc[doc_idx]).astype(np.int32)

        keep = is_word_t & len_ok_u[codes] & ~stop_u[codes]
        doc_idx = doc_idx[keep]
        codes = codes[keep]
        positions = positions[keep]
        token_counts = np.bincount(doc_idx, minlength=ndocs).astype(np.int64)

        # compact the code space to surviving terms, sorted
        used = np.zeros(nu, dtype=bool)
        used[codes] = True
        used_idx = np.flatnonzero(used)
        used_terms = uniq[used_idx]
        order = np.argsort(used_terms, kind="stable")
        remap = np.full(nu, -1, dtype=np.int64)
        remap[used_idx[order]] = np.arange(used_idx.size)
        return (
            doc_idx.astype(np.int32),
            remap[codes],
            used_terms[order],
            positions,
            token_counts,
            starts[keep] if starts is not None else None,
            ends[keep] if ends is not None else None,
        )

    def tokenize_batch_coded_offsets(self, texts: "list[str] | np.ndarray"):
        """``tokenize_batch_coded`` PLUS per-token character spans, in
        ONE tokenization pass (the round-5 single-pass offsets
        tokenizer: a vector-field build no longer re-tokenizes).

        Returns ``(doc_idx, codes, uniq_terms, positions,
        doc_token_counts, starts int32, ends int32)`` where the first
        five are bit-identical to ``tokenize_batch_coded`` and
        starts/ends are the OffsetAttribute spans of the kept tokens in
        the ORIGINAL text (ASCII docs are lowered whole — ASCII case
        never changes length or word-break classes, so spans carry
        over; non-ASCII docs match on the original text and lowercase
        per token, exactly like ``tokenize_offsets``)."""
        texts = ["" if t is None else t for t in texts]
        ndocs = len(texts)
        flat: list = []
        st: list = []
        en: list = []
        counts_raw = np.zeros(ndocs, dtype=np.int64)
        for i, text in enumerate(texts):
            k = 0
            if text.isascii():
                low = text.lower() if self.lowercase else text
                for m in _ASCII_TOKEN_RE.finditer(low):
                    flat.append(m.group())
                    st.append(m.start())
                    en.append(m.end())
                    k += 1
            else:
                for m in _TOKEN_RE.finditer(text):
                    tok = m.group()
                    flat.append(java_lower(tok) if self.lowercase else tok)
                    st.append(m.start())
                    en.append(m.end())
                    k += 1
            counts_raw[i] = k
        n = len(flat)
        if n == 0:
            z32 = np.empty(0, np.int32)
            return (
                z32,
                np.empty(0, np.int64),
                np.empty(0, object),
                z32,
                np.zeros(ndocs, np.int64),
                z32,
                z32,
            )
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int32), counts_raw)
        code_of: dict = {}
        setd = code_of.setdefault
        codes = np.fromiter(
            (setd(t, len(code_of)) for t in flat), dtype=np.int64, count=n
        )
        uniq = np.array(list(code_of.keys()), dtype=object)
        return self._coded_tail(
            doc_idx,
            codes,
            uniq,
            counts_raw,
            ndocs,
            starts=np.asarray(st, dtype=np.int32),
            ends=np.asarray(en, dtype=np.int32),
        )

    def tokenize_batch(
        self, texts: "list[str] | np.ndarray"
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Tokenize a batch of documents.

        Returns flat arrays ``(doc_idx int32, terms object, positions int32,
        doc_token_counts int64)`` where ``doc_token_counts[d]`` is the number
        of emitted tokens of document d (== its norm length).
        """
        doc_idx, codes, uniq, positions, counts = self.tokenize_batch_coded(texts)
        terms_arr = uniq[codes] if codes.size else np.empty(0, object)
        return doc_idx, terms_arr, positions, counts


STANDARD = Analyzer()  # empty stop set, like `new StandardAnalyzer()`
ENGLISH = Analyzer(stopwords=ENGLISH_STOP_WORDS)
