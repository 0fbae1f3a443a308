"""Stored fields + highlighting: the StoredFieldsFormat analog
(columnar parquet, doc_id-pruned fetches) and the re-analysis
UnifiedHighlighter (``uhighlight/UnifiedHighlighter.java`` ANALYSIS
offset source). Checks: offset exactness, snippet fidelity (tags strip
back to a substring of the source), phrase position-verification,
cross-plane parity, and stored-field carry through merges."""

import re

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH, Analyzer
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search import ast
from lucene_spark.search.highlight import highlight_text
from lucene_spark.search.parser import parse
from lucene_spark.search.searcher import Searcher
from lucene_spark.search.serve import LocalSearcher

TAG = re.compile(r"</?b>")


@pytest.fixture(scope="module")
def stored_idx(spark, tmp_path_factory):
    corpus = make_pages(150)
    d = str(tmp_path_factory.mktemp("hl_idx"))
    build_index(
        spark, spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ), d,
        IndexConfig(num_segments=3, analyzer=ENGLISH, stored_cols=("text",)),
    )
    return spark, d, {r["url"]: r["text"] for r in corpus}


def test_tokenize_offsets_spans_match_terms():
    a = Analyzer(stopwords=frozenset({"the"}))
    text = "The Quick brown FOX, the fox's den (2 foxes)."
    terms, positions, starts, ends = a.tokenize_offsets(text)
    base_terms, base_positions = a.tokenize_one(text)
    assert terms == base_terms and positions == base_positions
    for t, s, e in zip(terms, starts, ends):
        assert text[s:e].lower() == t


def test_highlight_text_term_and_phrase():
    a = Analyzer(stopwords=frozenset({"of"}))
    text = "alpha beta gamma of delta beta epsilon"
    q = parse("beta", a)
    snip = highlight_text(text, q, a, passage_tokens=50)
    assert snip.count("<b>beta</b>") == 2
    assert TAG.sub("", snip).strip(".") in text
    # exact phrase with a stopword hole: only the true occurrence wraps
    q2 = parse('"gamma of delta"', a)
    snip2 = highlight_text(text, q2, a, passage_tokens=50)
    assert "<b>gamma</b>" in snip2 and "<b>delta</b>" in snip2
    assert "<b>beta</b>" not in snip2
    # phrase absent (wrong order): no snippet even though terms occur
    assert highlight_text(text, parse('"delta gamma"', a), a) is None
    # no query term at all
    assert highlight_text(text, parse("zeta", a), a) is None


def test_highlight_must_not_never_highlights():
    a = Analyzer()
    text = "alpha beta alpha"
    q = parse("alpha NOT beta", a)
    snip = highlight_text(text, q, a, passage_tokens=50)
    assert "<b>alpha</b>" in snip and "<b>beta</b>" not in snip


def test_get_documents_round_trip(stored_idx):
    spark, d, texts = stored_idx
    s = Searcher(spark, d)
    rows = s.search("w0042", k=5).collect()
    got = {
        r["url"]: r["text"]
        for r in s.get_documents([r["doc_id"] for r in rows]).collect()
    }
    assert len(got) == len(rows)
    for url, text in got.items():
        assert text == texts[url]
    # serving plane reads the same bytes
    l = LocalSearcher(d)
    ldocs = l.documents([r["doc_id"] for r in rows])
    assert {r["url"]: r["text"] for r in ldocs} == got


def test_highlight_dataframe_surface(stored_idx):
    spark, d, texts = stored_idx
    s = Searcher(spark, d)
    for query in ("w0042", "w0007 AND w0042", '"w0100 of w0200"'):
        hits = s.search(query, k=5).collect()
        out = s.highlight(query, k=5).collect()
        assert [(r["doc_id"], np.float32(r["score"])) for r in out] == [
            (r["doc_id"], np.float32(r["score"])) for r in hits
        ], query
        for r in out:
            assert r["snippet"] is not None, query
            assert "<b>" in r["snippet"], query
            body = TAG.sub("", r["snippet"]).strip(".")
            assert body.split(" ... ")[0] in texts[r["url"]], query


def test_highlight_cross_plane_parity(stored_idx):
    spark, d, _ = stored_idx
    s = Searcher(spark, d)
    l = LocalSearcher(d)
    for query in ("w0042", '"w0007 w0042"'):
        a = [
            (r["doc_id"], np.float32(r["score"]), r["snippet"])
            for r in s.highlight(query, k=8).collect()
        ]
        b = [
            (doc, np.float32(sc), snip)
            for doc, sc, _, snip in l.highlight(query, k=8)
        ]
        assert a == b, query


def test_stored_fields_survive_merge(spark, tmp_path_factory):
    from lucene_spark.index.deletes import delete_docs
    from lucene_spark.index.merge import force_merge

    corpus = make_pages(90)
    d = str(tmp_path_factory.mktemp("hl_mrg"))
    build_index(
        spark, spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ), d,
        IndexConfig(num_segments=3, analyzer=ENGLISH, stored_cols=("text",)),
    )
    s = Searcher(spark, d)
    before = {
        r["url"]: r["snippet"] for r in s.highlight("w0042", k=8).collect()
    }
    delete_docs(spark, d, keys=[corpus[5]["url"]])
    force_merge(spark, d)
    s2 = Searcher(spark, d)
    after = {
        r["url"]: r["snippet"] for r in s2.highlight("w0042", k=8).collect()
    }
    assert after == before  # delete of a non-hit + merge changes nothing
    # squeezed merge renumbers doc ids; stored follows via the url join
    texts = {r["url"]: r["text"] for r in corpus}
    got = s2.get_documents(
        [r["doc_id"] for r in s2.search("w0042", k=8).collect()]
    ).collect()
    for r in got:
        assert r["text"] == texts[r["url"]]


def test_sharded_highlight_matches_local(stored_idx):
    from lucene_spark.search.serve import ShardedSearcher

    spark, d, _ = stored_idx
    l = LocalSearcher(d, workers=1)
    ss = ShardedSearcher(d, shards=2)
    try:
        for query in ("w0042", '"w0007 w0042"'):
            assert ss.highlight(query, k=8) == l.highlight(query, k=8), query
        # full signature parity: dtype accepted, bad field rejected the
        # same way on both planes
        assert ss.highlight("w0042", k=4, dtype="f64") == l.highlight(
            "w0042", k=4, dtype="f64"
        )
        for plane in (ss, l):
            with pytest.raises(KeyError, match="unknown field"):
                plane.highlight("w0042", field="nope")
    finally:
        ss.close()
