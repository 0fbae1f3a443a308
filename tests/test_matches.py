"""Matches API (Weight.matches / MatchesIterator surface) — span
extraction goldens per query family + the Searcher deployment shape."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH, Analyzer
from lucene_spark.search import ast
from lucene_spark.search import intervals as iv
from lucene_spark.search.matches import match_spans

A = Analyzer()  # no stopwords: positions == token indices


def test_term_matches():
    text = "alpha beta alpha gamma"
    q = ast.TermQuery("alpha")
    got = match_spans(text, q, A)
    assert got == [
        (0, 0, 0, 5, "alpha"),
        (2, 2, 11, 16, "alpha"),
    ]


def test_term_matches_offsets_are_char_spans():
    text = "xx  alpha   yy alpha"
    got = match_spans(text, ast.TermQuery("alpha"), A)
    for sp, ep, so, eo, label in got:
        assert text[so:eo] == "alpha"


def test_exact_phrase_verified_spans():
    text = "quick brown fox and quick red fox"
    q = ast.PhraseQuery(terms=("quick", "brown"), positions=(0, 1))
    got = match_spans(text, q, A)
    # only the FIRST "quick" is followed by "brown"
    assert got == [(0, 1, 0, 11, "quick brown")]


def test_phrase_with_stopword_hole():
    # ENGLISH drops "the" but burns position 1: phrase (quick, _, fox)
    text = "quick the fox"
    q = ast.PhraseQuery(terms=("quick", "fox"), positions=(0, 2))
    got = match_spans(text, q, ENGLISH)
    assert got == [(0, 2, 0, 13, "quick fox")]


def test_multiterm_matches_label_expanded_token():
    text = "walk walked walking talked"
    q = ast.MultiTermQuery(mode="prefix", args=("walk",), field="")
    got = match_spans(text, q, A)
    assert [g[4] for g in got] == ["walk", "walked", "walking"]
    assert [g[0] for g in got] == [0, 1, 2]


def test_boolean_union_order_and_must_not_excluded():
    text = "alpha beta gamma alpha"
    q = ast.BooleanQuery(
        should=(ast.TermQuery("beta"), ast.TermQuery("alpha")),
        must_not=(ast.TermQuery("gamma"),),
        min_should_match=1,
    )
    got = match_spans(text, q, A)
    # (startPosition, endPosition) order; gamma (prohibited) absent
    assert [g[4] for g in got] == ["alpha", "beta", "alpha"]
    assert [g[0] for g in got] == [0, 1, 3]


def test_interval_spans_match_enumeration():
    text = "a x x b c"
    src = iv.maxgaps(3, iv.ordered(iv.term("a"), iv.term("b")))
    q = ast.IntervalQuery(field="", source=src)
    got = match_spans(text, q, A)
    assert got == [(0, 3, 0, 7, "intervals")]
    # the span equals the enumerated minimal interval
    toks, positions = A.tokenize_one(text)
    pos_of = {}
    for t, p in zip(toks, positions):
        pos_of.setdefault(t, []).append(p)
    assert iv.enumerate_intervals(src, pos_of) == [(0, 3, 2)]


def test_payload_filtered_interval_matches():
    from lucene_spark.analysis.payloads import DelimitedPayloadAnalyzer

    pa = DelimitedPayloadAnalyzer()
    text = "words|pos:0 other|pos:1 words|pos:5 words|pos:6"
    src = iv.payload_filtered_term(
        "words", lambda b: b is not None and not b.endswith(b"5")
    )
    q = ast.IntervalQuery(field="", source=src)
    got = match_spans(text, q, pa)
    # position 2 carries payload pos:5 -> filtered; 0 and 3 survive
    assert [(g[0], g[1]) for g in got] == [(0, 0), (3, 3)]
    # offsets cover the raw token|payload text (OffsetAttribute
    # untouched by the filter, like the reference)
    sp, ep, so, eo, _ = got[0]
    assert text[so:eo] == "words|pos:0"


def test_dedup_across_clauses():
    text = "alpha beta"
    q = ast.BooleanQuery(
        should=(ast.TermQuery("alpha"), ast.TermQuery("alpha")),
        min_should_match=1,
    )
    got = match_spans(text, q, A)
    assert got == [(0, 0, 0, 5, "alpha")]


def test_searcher_matches_dataframe(spark, tmp_path_factory):
    from lucene_spark.fixtures import make_pages
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.searcher import Searcher

    corpus = make_pages(120)
    d = str(tmp_path_factory.mktemp("matches_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(
        spark, df, d,
        IndexConfig(num_segments=2, analyzer=ENGLISH, stored_cols=("text",)),
    )
    s = Searcher(spark, d)
    rows = s.matches("w0000 AND w0001", k=5).collect()
    assert rows
    texts = {r["url"]: r["text"] for r in corpus}
    top = s.search("w0000 AND w0001", k=5).collect()
    assert [r["url"] for r in rows] == [r["url"] for r in top]
    for r in rows:
        labels = {m["label"] for m in r["matches"]}
        assert labels == {"w0000", "w0001"}  # both MUST clauses matched
        t = texts[r["url"]]
        prev = None
        for m in r["matches"]:
            # emission order (startPosition, endPosition)
            cur = (m["start_pos"], m["end_pos"])
            assert prev is None or cur >= prev
            prev = cur
            # offsets point at the RAW source span; the label is the
            # analyzed term (lowercased)
            assert t[m["start_off"]:m["end_off"]].lower() == m["label"]


# ---------------------------------------------- verified sloppy windows


def test_sloppy_phrase_verified_spans():
    text = "quick x brown and brown y z quick"
    q = ast.PhraseQuery(terms=("quick", "brown"), positions=(0, 1), slop=2)
    got = match_spans(text, q, A)
    # one verified window: quick@0 .. brown@2 (ml=1); the later
    # brown@4/quick@7 pair is out of slop (needs slop >= 4 reversed)
    assert [(g[0], g[1], g[4]) for g in got] == [(0, 2, "quick brown")]
    assert got[0][2] == 0 and text[got[0][2]:got[0][3]] == "quick x brown"


def test_sloppy_multi_phrase_verified_spans():
    text = "hot pease cold pease"
    q = ast.MultiPhraseQuery(
        slots=(("hot", "cold"), ("pease",)), positions=(0, 1), slop=1
    )
    got = match_spans(text, q, A)
    assert [(g[0], g[1]) for g in got] == [(0, 1), (2, 3)]
    assert got[0][4] == "(hot|cold) pease"


def test_exact_multi_phrase_verified_spans():
    text = "hot pease cold pease warm pease"
    q = ast.MultiPhraseQuery(
        slots=(("hot", "cold"), ("pease",)), positions=(0, 1), slop=0
    )
    got = match_spans(text, q, A)
    # "warm pease" has no slot-0 alternative -> only two windows
    assert [(g[0], g[1]) for g in got] == [(0, 1), (2, 3)]


def test_sloppy_span_freq_differential():
    """float32(sum 1/(1+ml)) over the span twin's emitted windows must
    equal the scoring loops bit-exactly — the pin that the Matches
    windows ARE the scored matches. Randomized over repeat shapes
    (incl. repeated terms) and the plain matcher."""
    import random

    from lucene_spark.search.sloppy import (
        repeat_groups,
        sloppy_freq,
        sloppy_freq_repeats,
        sloppy_match_spans,
    )

    rng = random.Random(42)
    vocab = ["a", "b", "c"]
    for trial in range(300):
        n_terms = rng.randint(2, 3)
        terms = [rng.choice(vocab) for _ in range(n_terms)]
        doc = [rng.choice(vocab + ["x", "y"]) for _ in range(rng.randint(4, 14))]
        slop = rng.randint(0, 4)
        pls = []
        ok = True
        for t in terms:
            p = [i for i, w in enumerate(doc) if w == t]
            if not p:
                ok = False
                break
            pls.append(p)
        if not ok:
            continue
        rels = list(range(n_terms))
        groups = repeat_groups(terms)
        spans = sloppy_match_spans(pls, rels, slop, groups)
        f = np.float32(0.0)
        for _sp, _ep, ml in spans:
            f = np.float32(f + np.float32(1.0) / (np.float32(1.0) + np.float32(ml)))
        if groups:
            want = sloppy_freq_repeats(pls, rels, slop, groups)
        else:
            want = sloppy_freq(pls, rels, slop)
        assert np.float32(f) == np.float32(want), (terms, doc, slop, spans)
        # windows must be within-doc and ordered sanely
        for sp, ep, ml in spans:
            assert 0 <= sp <= ep < len(doc) + n_terms
