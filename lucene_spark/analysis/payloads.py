"""Payload analysis: delimited per-token payloads (the 4th posting
plane).

Mirrors the reference's payload production chain
(``analysis/common/src/java/org/apache/lucene/analysis/payloads/``):

- :func:`encode_int` / :func:`encode_float` / :func:`decode_int` /
  :func:`decode_float` — ``PayloadHelper.java:24-66`` (4-byte
  big-endian, the ``BitUtil.VH_BE_*`` view handles).
- :class:`DelimitedPayloadAnalyzer` — whitespace tokenizer +
  ``DelimitedPayloadTokenFilter.java:39-74`` semantics: the characters
  before the FIRST delimiter are the token, those after are the
  payload run through the configured encoder; a token without the
  delimiter carries no payload (``payAtt.setPayload(null)``).  Like
  the reference ("make sure your Tokenizer doesn't split on the
  delimiter"), the tokenizer is whitespace-based, not UAX#29.

Indexed payloads ride the postings as per-position ``pay_bin`` streams
(:mod:`lucene_spark.codec.blocks`) and are consumed query-side by
``Intervals.payload_filtered_term``
(``queries/intervals/PayloadFilteredTermIntervalsSource.java``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from lucene_spark.analysis.analyzer import java_lower


def encode_int(value: int) -> bytes:
    """``PayloadHelper.encodeInt`` — 4-byte big-endian."""
    return struct.pack(">i", value)


def decode_int(data: bytes, offset: int = 0) -> int:
    return struct.unpack_from(">i", data, offset)[0]


def encode_float(value: float) -> bytes:
    """``PayloadHelper.encodeFloat`` — IEEE-754 float32 big-endian."""
    return struct.pack(">f", value)


def decode_float(data: bytes, offset: int = 0) -> float:
    return struct.unpack_from(">f", data, offset)[0]


def _identity_encoder(s: str) -> bytes:
    """``IdentityEncoder``: payload characters as UTF-8 bytes."""
    return s.encode("utf-8")


def _integer_encoder(s: str) -> bytes:
    """``IntegerEncoder``: parse the payload characters as an int."""
    return encode_int(int(s))


def _float_encoder(s: str) -> bytes:
    """``FloatEncoder``: parse the payload characters as a float."""
    return encode_float(float(s))


_ENCODERS = {
    "identity": _identity_encoder,
    "int": _integer_encoder,
    "float": _float_encoder,
}


@dataclass(frozen=True)
class DelimitedPayloadAnalyzer:
    """Whitespace tokenizer + DelimitedPayloadTokenFilter (+ optional
    lowercase on the token part).  ``encoder``: "identity" | "int" |
    "float" (the three reference PayloadEncoder implementations).

    Exposes the same duck-typed surface the engine's build and query
    paths use (``tokenize_one`` / ``normalize``), plus
    ``tokenize_one_payloads`` for the payload-aware invert, and
    ``has_payloads = True`` so ``invert_field`` routes the build
    through the payload encoder."""

    delimiter: str = "|"
    encoder: str = "identity"
    lowercase: bool = True
    has_payloads: bool = True
    # no stop filter in the payload chain; present so commit metadata
    # (builder.py stopwords record) treats this like any analyzer
    stopwords: frozenset = frozenset()

    def _encode(self, s: str) -> bytes:
        return _ENCODERS[self.encoder](s)

    def tokenize_one_payloads(self, text: str):
        """(terms, positions, payloads) — payloads aligned per token,
        ``None`` where the token had no delimiter."""
        terms: list[str] = []
        positions: list[int] = []
        payloads: list = []
        for pos, raw in enumerate(text.split()):
            i = raw.find(self.delimiter)  # FIRST delimiter, like the
            # reference's forward buffer scan (DelimitedPayload
            # TokenFilter.java:60-66)
            if i >= 0:
                tok, pay = raw[:i], self._encode(raw[i + 1 :])
            else:
                tok, pay = raw, None
            if self.lowercase:
                tok = java_lower(tok)
            terms.append(tok)
            positions.append(pos)
            payloads.append(pay)
        return terms, positions, payloads

    def tokenize_one(self, text: str):
        """(terms, positions) — payloads stripped; the non-payload
        planes (norms, stored search paths) see the same token
        stream."""
        terms, positions, _ = self.tokenize_one_payloads(text)
        return terms, positions

    def tokenize_offsets(self, text: str):
        """(terms, positions, char_starts, char_ends).  Like the
        reference, the payload filter does not touch OffsetAttribute —
        each span covers the whole raw ``term|payload`` token as the
        whitespace tokenizer emitted it."""
        terms, positions, _ = self.tokenize_one_payloads(text)
        starts: list = []
        ends: list = []
        off = 0
        for raw in text.split():
            s = text.index(raw, off)
            starts.append(s)
            ends.append(s + len(raw))
            off = s + len(raw)
        return terms, positions, starts, ends

    def normalize(self, term: str) -> str:
        return java_lower(term) if self.lowercase else term
