"""Deterministic synthetic `pages` corpus + reference query set.

Implements the FIXTURES.md contract (seed=42, no external data):
- pages(url, warc_ts, html, text, lang) with Zipf vocabulary text,
  ~40% stopword rate, LogNormal token lengths, planted phrases,
  mixed casing, unicode edge rows.
- queries(query_id, kind, query, k): term / AND / OR / phrase mix
  incl. stopword-gap phrases and zero-hit queries.

The `html` column wraps text in a fixed envelope; extract_text() strips
it — the "byte-identical extracted text per url" contract.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np

SEED = 42
VOCAB_SIZE = 5000
STOPWORDS_33 = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()

HTML_PREFIX = b"<html><body>"
HTML_SUFFIX = b"</body></html>"

_UNICODE_EDGE_TEXTS = [
    "testing 1234 B2B 2B quick.brown fox's don’t",
    "中文网页 カタカナ ひらがな test",
    "x" * 256 + " visible after longtoken",
    "café naïve İstanbul STRASSE straße",
    "w0007 w0042 planted unicode row",
]


def vocab() -> list[str]:
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


def extract_text(html: bytes) -> str:
    """The extraction contract: strip the fixed wrapper (FIXTURES.md §1)."""
    assert html.startswith(HTML_PREFIX) and html.endswith(HTML_SUFFIX)
    return html[len(HTML_PREFIX) : len(html) - len(HTML_SUFFIX)].decode("utf-8")


def make_pages(n_docs: int, seed: int = SEED) -> "list[dict]":
    """Deterministic corpus of n_docs rows (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    words = np.array(vocab(), dtype=object)
    stops = np.array(STOPWORDS_33, dtype=object)
    # Zipf(s=1.1) over the 5000-stem vocabulary
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    zipf_p = ranks ** (-1.1)
    zipf_p /= zipf_p.sum()
    base_ts = _dt.datetime(2024, 1, 1)

    rows = []
    n_edge = min(len(_UNICODE_EDGE_TEXTS), max(1, n_docs // 50))
    for i in range(n_docs):
        if i >= n_docs - n_edge:
            text = _UNICODE_EDGE_TEXTS[(n_docs - 1 - i) % len(_UNICODE_EDGE_TEXTS)]
            lang = "xx"
        else:
            length = int(np.clip(rng.lognormal(mean=5.0, sigma=1.0), 1, 5000))
            toks = rng.choice(words, size=length, p=zipf_p)
            # interleave stopwords at ~40% token rate
            sw_mask = rng.random(length) < 0.40
            sw_choice = rng.choice(stops, size=length)
            toks = np.where(sw_mask, sw_choice, toks)
            # ~10% casing perturbation (lowercase filter coverage)
            case_mask = rng.random(length) < 0.10
            if case_mask.any():
                idx = np.flatnonzero(case_mask)
                for j in idx:
                    toks[j] = toks[j].upper() if (j % 2 == 0) else toks[j].title()
            # planted phrase patterns in known docs
            if i % 37 == 0 and length >= 4:
                toks[0], toks[1] = "w0007", "w0042"
            if i % 53 == 0 and length >= 6:
                toks[2], toks[3], toks[4] = "w0100", "of", "w0200"
            text = " ".join(toks.tolist())
            lang = "en"
        url = f"https://site{i % 1000}.example/p/{i}"
        rows.append(
            {
                "url": url,
                "warc_ts": base_ts + _dt.timedelta(seconds=i * 137),
                "html": HTML_PREFIX + text.encode("utf-8") + HTML_SUFFIX,
                "text": text,
                "lang": lang,
            }
        )
    return rows


def make_queries(seed: int = SEED) -> "list[dict]":
    """Reference query mix (FIXTURES.md §2): 20 term, 20 AND, 20 OR,
    15 phrase (3 with stopword gaps), 5 zero-hit."""
    rng = np.random.default_rng(seed + 1)
    qs: list[dict] = []
    qid = 0

    def add(kind: str, query: str, k: int = 10) -> None:
        nonlocal qid
        qs.append({"query_id": qid, "kind": kind, "query": query, "k": k})
        qid += 1

    # terms spanning high/mid/low docFreq (Zipf rank buckets)
    term_pool = (
        [f"w{i:04d}" for i in (0, 1, 2, 5, 9)]
        + [f"w{i:04d}" for i in (20, 45, 80, 150, 300)]
        + [f"w{i:04d}" for i in (700, 1200, 2000, 3000, 4500)]
    )
    for t in term_pool[:15]:
        add("term", t)
    for t in ["w0007", "w0042", "w0100", "w0200", "quick.brown"]:
        add("term", t)
    for _ in range(20):
        k = int(rng.integers(2, 5))
        terms = rng.choice(term_pool, size=k, replace=False)
        add("and", " AND ".join(terms))
    for _ in range(20):
        k = int(rng.integers(2, 5))
        terms = rng.choice(term_pool, size=k, replace=False)
        add("or", " OR ".join(terms))
    phrases = [
        '"w0007 w0042"',
        '"w0100 of w0200"',  # stopword gap
        '"w0100 of w0200"',
        '"the w0000 of"',  # stopword-only edges
        '"w0000 w0001"',
        '"w0001 w0000"',
        '"w0002 w0003"',
        '"w0005 the w0009"',  # stopword gap
        '"w0020 w0045"',
        '"w0000 w0000"',
        '"w0009 w0005"',
        '"w0150 w0300"',
        '"w0042 w0007"',
        '"w0001 w0002 w0003"',
        '"w0000 w0001 w0002"',
    ]
    for p in phrases:
        add("phrase", p)
    # zero-hit queries
    add("term", "zzznothing")
    add("and", "w0000 AND zzznothing")
    add("or", "zzznothing OR qqqmissing")
    add("phrase", '"zzznothing w0000"')
    add("term", "w9999")
    return qs
